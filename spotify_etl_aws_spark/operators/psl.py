"""Public Suffix List (PSL) registrable-domain resolution — the
table-driven upgrade over ``operators/urls.py``'s structural two-part
heuristic.

Per-domain caps and blocklists key on the REGISTRABLE domain; a wrong
suffix split mis-buckets whole hosting providers (every *.github.io
site collapsing into one "github.io" bucket would let a single cap
delete millions of distinct sites — exactly the multi-label PRIVATE
suffixes the heuristic cannot know). The PSL algorithm
(https://publicsuffix.org/list/) over the real rule table fixes that:

- a rule matches a host when the host's trailing labels equal the
  rule's labels (``*`` matches exactly one label);
- an EXCEPTION rule (``!city.kobe.jp``) beats everything: the public
  suffix is the rule minus its leftmost label;
- otherwise the LONGEST matching rule wins; the implicit default rule
  is ``*`` (the bare TLD);
- registrable domain = public suffix + one label.

Spark shape: rule lookups are BROADCAST hash joins against the rules
table — one left join per candidate suffix depth (depth ≤ 6 covers
the longest real PSL rules), all map-side, so the corpus rows never
shuffle and the rule count can be the full ~10k-entry list without a
10k-branch expression chain. ``DEFAULT_PSL_SUBSET`` embeds a
representative slice (ICANN second-level registries + the canonical
wildcard/exception families + common multi-label private suffixes);
the production swap is pure data: feed the full
``public_suffix_list.dat`` text to ``parse_psl`` at the same seam.

Contract notes (deliberate deviations, matching ``urls.py``):
- a host that IS a public suffix passes through unchanged (the PSL
  spec says "no registrable domain"; pass-through keeps caps/
  blocklists total — the suffix becomes its own bucket);
- IPv4 literals pass through (no registry semantics).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Representative PSL slice — swap in the full public_suffix_list.dat
# text here (or pass its contents to parse_psl) for production
# coverage. Format is the real one: comments, exceptions, wildcards,
# and the ICANN/private sections.
DEFAULT_PSL_SUBSET = """\
// ===BEGIN ICANN DOMAINS===
com
org
net
edu
gov
io
ai
dev
app
uk
co.uk
org.uk
ac.uk
gov.uk
me.uk
net.uk
au
com.au
net.au
org.au
edu.au
gov.au
jp
co.jp
or.jp
ne.jp
ac.jp
go.jp
*.kobe.jp
!city.kobe.jp
br
com.br
net.br
org.br
gov.br
cn
com.cn
net.cn
org.cn
gov.cn
in
co.in
net.in
org.in
gen.in
mx
com.mx
org.mx
tr
com.tr
ar
com.ar
sg
com.sg
hk
com.hk
za
co.za
kr
co.kr
nz
co.nz
il
co.il
tw
com.tw
ck
*.ck
!www.ck
// ===END ICANN DOMAINS===
// ===BEGIN PRIVATE DOMAINS===
github.io
gitlab.io
blogspot.com
herokuapp.com
netlify.app
vercel.app
web.app
firebaseapp.com
s3.amazonaws.com
*.compute.amazonaws.com
*.compute-1.amazonaws.com
elasticbeanstalk.com
azurewebsites.net
cloudfront.net
fastly.net
wordpress.com
tumblr.com
neocities.org
readthedocs.io
// ===END PRIVATE DOMAINS===
"""


def parse_psl(
    text: str, include_private: bool = True
) -> list[tuple[str, bool, bool]]:
    """PSL text -> [(suffix, is_wildcard, is_exception)] rules.

    ``suffix`` is stored WITHOUT the ``*.``/``!`` markers: a wildcard
    rule keeps its base (``*.ck`` -> ``("ck", True, False)``), an
    exception keeps the full rule (``!www.ck`` ->
    ``("www.ck", False, True)``). ``include_private=False`` stops at
    the ICANN section (the standard toggle for pipelines that want
    organizational rather than hosting-level bucketing)."""
    rules: list[tuple[str, bool, bool]] = []
    in_private = False
    for line in text.splitlines():
        line = line.strip()
        if not line:
            continue
        if line.startswith("//"):
            if "BEGIN PRIVATE DOMAINS" in line:
                in_private = True
            continue
        if in_private and not include_private:
            continue
        # rules are case-insensitive; hosts are lowercased upstream
        line = line.lower().split()[0]
        if line.startswith("!"):
            rules.append((line[1:], False, True))
        elif line.startswith("*."):
            rules.append((line[2:], True, False))
        else:
            rules.append((line, False, False))
    return rules


def psl_rules_df(
    spark: SparkSession,
    psl_text: str = DEFAULT_PSL_SUBSET,
    include_private: bool = True,
) -> DataFrame:
    """Rules as a (suffix, is_wild, is_exc, is_norm) DataFrame, one
    row per distinct suffix key (a key can be both a normal rule and a
    wildcard base — e.g. ``ck`` via ``ck`` + ``*.ck`` — so kinds are
    OR-aggregated)."""
    rules = parse_psl(psl_text, include_private)
    if not rules:
        raise ValueError("empty PSL rule set")
    df = spark.createDataFrame(
        rules, "suffix string, is_wild boolean, is_exc boolean"
    )
    return df.groupBy("suffix").agg(
        F.max("is_wild").alias("is_wild"),
        F.max("is_exc").alias("is_exc"),
        F.max((~F.col("is_wild")) & (~F.col("is_exc"))).alias("is_norm"),
    )


def _tail_labels(labels: Column, n: Column, k: int) -> Column:
    """Last ``k`` labels joined with '.', or NULL when the host has
    fewer than ``k`` labels (never a shorter accidental match)."""
    return F.when(
        n >= k, F.concat_ws(".", F.slice(labels, n - k + 1, k))
    )


def with_registrable_domain(
    df: DataFrame,
    rules: DataFrame,
    host_col: str = "host",
    out_col: str = "domain",
    max_depth: int = 6,
) -> DataFrame:
    """Add ``out_col`` = PSL registrable domain of ``host_col``.

    One broadcast left join per candidate suffix depth (1..max_depth)
    resolves each depth's rule flags; the winner is then a pure
    column expression implementing the PSL precedence (exception >
    longest match > default ``*``). All joins are broadcast (the rules
    table is ~10k rows); the data side never shuffles."""
    host = F.lower(F.col(host_col))
    labels = F.split(host, r"\.")
    n = F.size(labels)

    out = df
    for k in range(1, max_depth + 1):
        cand = _tail_labels(labels, n, k).alias(f"__psl_c{k}")
        rk = rules.select(
            F.col("suffix").alias(f"__psl_c{k}"),
            F.col("is_wild").alias(f"__psl_w{k}"),
            F.col("is_exc").alias(f"__psl_e{k}"),
            F.col("is_norm").alias(f"__psl_n{k}"),
        )
        out = out.withColumn(f"__psl_c{k}", cand).join(
            F.broadcast(rk), f"__psl_c{k}", "left"
        )

    # public-suffix label count per PSL precedence
    t = lambda c: F.coalesce(c, F.lit(False))  # noqa: E731
    # exception rule at depth k => public suffix is k-1 labels
    exc_len = F.lit(None).cast("int")
    for k in range(max_depth, 0, -1):
        exc_len = F.when(t(F.col(f"__psl_e{k}")) & (n >= k), F.lit(k - 1)).otherwise(
            exc_len
        )
    # longest normal/wildcard match; default rule '*' gives 1
    match_len = F.lit(1)
    for k in range(1, max_depth + 1):
        match_len = F.greatest(
            match_len,
            F.when(t(F.col(f"__psl_n{k}")) & (n >= k), F.lit(k)).otherwise(1),
            # wildcard base at depth k covers one extra label
            F.when(t(F.col(f"__psl_w{k}")) & (n >= k + 1), F.lit(k + 1)).otherwise(
                1
            ),
        )
    ps_len = F.coalesce(exc_len, match_len)
    reg = F.when(host.rlike(r"^\d{1,3}(\.\d{1,3}){3}$"), host).when(
        n <= ps_len, host
    ).otherwise(F.concat_ws(".", F.slice(labels, n - ps_len, ps_len + 1)))

    out = out.withColumn(out_col, reg)
    return out.drop(
        *[f"__psl_{p}{k}" for k in range(1, max_depth + 1) for p in "cwen"]
    )
