"""URL/domain curation operators (north-star, SURVEY.md §2.11c) — the
crawl-side hygiene steps between WARC ingestion (``sources/warc.py``)
and the text ladder, as run by the C4/RefinedWeb-class pipelines:

- ``with_url_parts``: canonicalized URL + host + registrable domain +
  path, all JVM-side (``parse_url`` + array ops over host labels).
  Canonicalization lowercases scheme/host, drops fragments, default
  ports, and tracking query parameters (utm_* / fbclid / gclid) — so
  the same page crawled via different share links dedups exactly.
- ``domain_caps``: at most N documents per registrable domain
  (deterministic hash order), the anti-boilerplate cap every web
  corpus applies so a single forum cannot dominate training.
- ``blocklist_filter``: drop blocked registrable domains via a
  broadcast anti-join — document rows never shuffle.

The registrable-domain split defaults to the structural public-suffix
rule (one label of suffix, or two where the TLD runs a second-level
registry: co.uk, com.au, ...) with the common two-part suffixes
embedded — zero joins, right for quick lanes. Production bucketing
passes ``psl_rules`` (``operators/psl.py``): the REAL publicsuffix.org
algorithm — wildcard rules, exceptions, multi-label private suffixes
(github.io, *.compute.amazonaws.com) — table-driven via broadcast
joins, so the full ~10k-rule list is pure data, not code.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# common second-level registry suffixes; swap in the full Public
# Suffix List here for production coverage (it is pure data)
TWO_PART_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "or.jp", "ne.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br", "gov.br",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "co.in", "net.in", "org.in", "gen.in",
    "com.mx", "org.mx", "com.tr", "com.ar", "com.sg", "com.hk",
    "co.za", "co.kr", "co.nz", "co.il", "com.tw",
)

_TRACKING_PARAM_RE = r"^(utm_[a-z]+|fbclid|gclid|msclkid|mc_eid)="


def registrable_domain(host: Column) -> Column:
    """Host -> registrable domain ('a.b.co.uk' -> 'b.co.uk',
    'x.example.com' -> 'example.com'). Hosts with one label (or IPs,
    which have no registry semantics) pass through unchanged."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.slice(labels, n - 1, 2))
    last3 = F.concat_ws(".", F.slice(labels, n - 2, 3))
    return (
        F.when(host.rlike(r"^\d{1,3}(\.\d{1,3}){3}$"), host)  # IPv4 literal
        .when(n <= 2, host)
        .when(last2.isin(*TWO_PART_SUFFIXES) & (n >= 3), last3)
        .otherwise(last2)
    )


def _clean_query(query: Column) -> Column:
    kept = F.filter(
        F.split(query, "&"),
        lambda p: ~p.rlike(_TRACKING_PARAM_RE),
    )
    return F.when(
        query.isNull() | (F.size(kept) == 0), F.lit(None)
    ).otherwise(F.concat_ws("&", kept))


def with_url_parts(
    df: DataFrame, url_col: str = "url", psl_rules: DataFrame | None = None
) -> DataFrame:
    """Add (host, domain, path, url_canonical) columns. Rows whose URL
    does not parse get NULL parts (callers filter on host IS NOT NULL
    as the validity gate). ``psl_rules`` (from
    ``operators.psl.psl_rules_df``) switches ``domain`` to the full
    Public Suffix List resolution — broadcast-joined, still zero
    corpus shuffles."""
    url = F.col(url_col)
    host = F.lower(F.parse_url(url, F.lit("HOST")))
    path = F.parse_url(url, F.lit("PATH"))
    query = _clean_query(F.parse_url(url, F.lit("QUERY")))
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*):", 1))
    # parse_url HOST excludes the port; re-extract it so NON-default
    # ports survive canonicalization (distinct origins must not merge).
    # Work on the authority with userinfo stripped, and anchor the port
    # at the END — digits in user:pass@ or inside IPv6 brackets must
    # never be read as a port
    authority = F.regexp_replace(
        F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1),
        r"^.*@",
        "",
    )
    port = F.regexp_extract(authority, r":(\d+)$", 1)
    default_port = (
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    port_part = F.when(
        (port == "") | default_port, F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    canonical = F.when(
        host.isNull(), F.lit(None)
    ).otherwise(
        F.concat(
            scheme,
            F.lit("://"),
            host,
            port_part,
            # parse_url yields "" (not NULL) for a missing path
            F.when(path.isNull() | (path == ""), F.lit("/")).otherwise(path),
            F.coalesce(F.concat(F.lit("?"), query), F.lit("")),
        )
    )
    out = df.withColumns(
        {
            "host": host,
            "path": path,
            "url_canonical": canonical,
        }
    )
    if psl_rules is not None:
        from .psl import with_registrable_domain

        return with_registrable_domain(out, psl_rules, "host", "domain")
    return out.withColumn("domain", registrable_domain(host))


def domain_caps(
    df: DataFrame,
    max_per_domain: int,
    domain_col: str = "domain",
    id_col: str = "doc_id",
    salt: str = "v1",
    salt_buckets: int | None = None,
) -> DataFrame:
    """Keep at most ``max_per_domain`` documents per domain, chosen by
    deterministic hash order (stable under retries AND corpus growth
    for the kept side: a doc is evicted only when enough lower-hash
    docs exist, never because of arrival order).

    One window shuffle on the domain key. A single mega-domain makes
    that key hot; ``salt_buckets=B`` switches to the two-phase cap:
    phase 1 caps within ``(domain, hash-bucket)`` — B reducers share
    the hot domain, each holding at most ``max_per_domain`` rows —
    and phase 2 re-caps the <= B * cap survivors per domain. The
    result is IDENTICAL to the single-phase cap (the global N
    lowest-hash docs of a domain are each among their own bucket's N
    lowest), so the flag is purely a physical-plan choice."""
    if max_per_domain <= 0:
        raise ValueError(f"max_per_domain must be positive, got {max_per_domain}")
    from pyspark.sql.window import Window

    order = [F.xxhash64(F.lit(salt), F.col(id_col)).asc(), F.col(id_col).asc()]
    stage = df
    if salt_buckets is not None:
        if salt_buckets <= 0:
            raise ValueError(f"salt_buckets must be positive, got {salt_buckets}")
        bucket = F.pmod(F.xxhash64(F.lit("b" + salt), F.col(id_col)), F.lit(salt_buckets))
        w1 = Window.partitionBy(domain_col, bucket).orderBy(*order)
        stage = (
            stage.withColumn("__rn1", F.row_number().over(w1))
            .filter(F.col("__rn1") <= max_per_domain)
            .drop("__rn1")
        )
    w = Window.partitionBy(domain_col).orderBy(*order)
    return (
        stage.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= max_per_domain)
        .drop("__rn")
    )


_ABS_URL_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://"


def host_edges(
    pages: DataFrame,
    url_col: str = "url",
    links_col: str = "out_links",
    domain_level: bool = False,
    keep_self: bool = False,
) -> DataFrame:
    """(src, dst) host-level link edges from crawled pages with an
    ``out_links`` column (``sources/warc.py:read_warc(links=True)``) —
    the edge producer for ``operators/graph.py:pagerank``, mirroring
    the CommonCrawl host-graph construction. All JVM-side: explode the
    hrefs (map-side Generate), resolve protocol-relative ``//host/..``
    targets against http, keep absolute http(s) targets only (a
    page-RELATIVE href stays on its own host by definition, so it can
    never create a cross-host edge), parse hosts, drop self-edges
    (``keep_self=False``) and de-duplicate — one shuffle total, on the
    (src, dst) pair. ``domain_level=True`` collapses hosts to
    registrable domains before the distinct."""
    url = F.col(url_col)
    href = F.explode(F.col(links_col)).alias("__href")
    resolved = F.when(
        F.col("__href").startswith("//"),
        F.concat(F.lit("http:"), F.col("__href")),
    ).when(F.col("__href").rlike(_ABS_URL_RE), F.col("__href"))
    scheme = F.lower(
        F.regexp_extract(F.col("__r"), r"^([A-Za-z][A-Za-z0-9+.-]*):", 1)
    )
    e = (
        pages.filter(F.col(links_col).isNotNull())
        .select(F.lower(F.parse_url(url, F.lit("HOST"))).alias("src"), href)
        .withColumn("__r", resolved)
        .filter(F.col("__r").isNotNull() & scheme.isin("http", "https"))
        .select(
            "src",
            F.lower(F.parse_url(F.col("__r"), F.lit("HOST"))).alias("dst"),
        )
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
    )
    if domain_level:
        e = e.select(
            registrable_domain(F.col("src")).alias("src"),
            registrable_domain(F.col("dst")).alias("dst"),
        )
    if not keep_self:
        e = e.filter(F.col("src") != F.col("dst"))
    return e.distinct()


def with_authority_prior(
    docs: DataFrame,
    ranks: DataFrame,
    key_col: str = "host",
    out_col: str = "authority_prior",
    broadcast_ranks: bool = False,
) -> DataFrame:
    """Join link-authority scores (``pagerank`` output: (node, pr))
    onto documents as a quality prior — the crawl-seed/quality signal
    CC-class pipelines place next to the per-domain caps. Hosts absent
    from the graph get 0.0 (no authority evidence ≠ unknown). A
    left-equi join on the host key; ``broadcast_ranks=True`` ships the
    rank table to the scan — right for sub-million-host graphs, wrong
    at the full ~10⁸-host crawl graph where the hash join (AQE-planned)
    is the scale path."""
    r = ranks.select(
        F.col("node").alias(key_col), F.col("pr").alias(out_col)
    )
    if broadcast_ranks:
        r = F.broadcast(r)
    return docs.join(r, key_col, "left").fillna({out_col: 0.0})


def blocklist_filter(
    df: DataFrame,
    blocked: DataFrame | list[str],
    domain_col: str = "domain",
) -> DataFrame:
    """Drop rows whose registrable domain is on the blocklist — a
    broadcast LEFT ANTI join, so the (small) blocklist ships to the
    scan and corpus rows never move."""
    spark = df.sparkSession
    if isinstance(blocked, list):
        blocked_df = spark.createDataFrame(
            [(d.lower(),) for d in blocked], f"{domain_col} string"
        )
    else:
        blocked_df = blocked.select(F.lower(F.col(domain_col)).alias(domain_col))
    return df.join(F.broadcast(blocked_df), domain_col, "left_anti")
