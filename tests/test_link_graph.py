"""The wired graph lane (round-7): WARC out-link extraction
(`sources/warc.py:html_links` / `read_warc(links=True)`) → host-level
edge building (`operators/urls.py:host_edges`) → PageRank
(`operators/graph.py`) → authority prior joined back onto documents
(`with_authority_prior`) — including a planted link-farm whose target
must out-rank organically-linked hosts."""

from __future__ import annotations

import gzip

import pytest

import pyspark.sql.functions as F

from spotify_etl_aws_spark.operators.graph import pagerank
from spotify_etl_aws_spark.operators.urls import host_edges, with_authority_prior
from spotify_etl_aws_spark.sources.warc import html_links, read_warc

from .test_graph import ref_pagerank
from .test_warc import _http, _record


def test_html_links_extraction_rules():
    page = (
        b"<html><head><script>var a='<a href=\"http://js.example/\">';"
        b"</script></head><body>"
        b'<a href="http://abs.example/p?x=1">abs</a>'
        b"<a href='http://quoted.example/'>single</a>"
        b"<a href=http://bare.example/>bare</a>"
        b'<a href="//proto.example/x">protorel</a>'
        b'<a href="/relative/path">rel</a>'
        b'<a href="http://abs.example/p?x=1">dup</a>'
        b'<a href="http://amp.example/?a=1&amp;b=2">entity</a>'
        b"<a name='anchor-no-href'>none</a>"
        b"</body></html>"
    )
    got = html_links(page)
    # first-seen order, deduplicated, script links excluded
    assert got == [
        "http://abs.example/p?x=1",
        "http://quoted.example/",
        "http://bare.example/",
        "//proto.example/x",
        "/relative/path",
        "http://amp.example/?a=1&b=2",
    ]


def test_host_edges_resolution_and_dedup(spark):
    pages = spark.createDataFrame(
        [
            (
                "http://a.example/page1",
                [
                    "http://b.example/x",          # cross-host edge
                    "https://b.example/y",         # same pair — dedups
                    "//c.example/z",               # protocol-relative
                    "/same/host",                  # relative: no edge
                    "http://a.example/other",      # self-edge: dropped
                    "mailto:someone@d.example",    # not a link edge
                    "javascript:void(0)",
                    "ftp://files.example/f",       # non-http(s): dropped
                ],
            ),
            ("http://sub.a.example/p", ["http://b.example/"]),
            ("http://noproto.example/p", None),  # NULL out_links survive
        ],
        "url string, out_links array<string>",
    )
    got = {
        (r.src, r.dst) for r in host_edges(pages).collect()
    }
    assert got == {
        ("a.example", "b.example"),
        ("a.example", "c.example"),
        ("sub.a.example", "b.example"),
    }
    # registrable-domain level collapses sub.a.example into a.example
    dom = {(r.src, r.dst) for r in host_edges(pages, domain_level=True).collect()}
    assert dom == {("a.example", "b.example"), ("a.example", "c.example")}


def _page(url: str, hrefs: list[str]) -> bytes:
    body = "".join(f'<a href="{h}">l</a>' for h in hrefs)
    # >= 5 prose words so the boilerplate-stripping main-text extractor
    # (incremental_crawl's default) keeps the page
    html = (
        "<html><body><p>page content here with enough prose words to "
        f"clear the extractor</p>{body}</body></html>"
    )
    return _record("response", _http(html.encode()), url)


def test_warc_to_pagerank_link_farm(spark, tmp_path):
    """End-to-end: a 4-host link farm pointing at farm-target must give
    farm-target a higher authority prior than an organically-linked
    host with a single inbound link — and the harvested-graph ranks
    must match the numpy reference exactly."""
    farm = [f"farm{i}.example" for i in range(4)]
    records = b""
    for i, h in enumerate(farm):
        peers = [f"http://{p}/" for p in farm if p != h]
        records += _page(
            f"http://{h}/", peers + ["http://farm-target.example/"]
        )
    records += _page(
        "http://organic.example/", ["http://plain-target.example/"]
    )
    d = tmp_path / "crawl"
    d.mkdir()
    (d / "shard.warc.gz").write_bytes(gzip.compress(records))

    pages = read_warc(spark, str(d / "*.warc.gz"), links=True)
    assert "out_links" in pages.columns
    edges = host_edges(pages)
    e_local = [(r.src, r.dst) for r in edges.collect()]
    ranks = pagerank(edges, iterations=6)
    got = {r.node: r.pr for r in ranks.collect()}
    want = ref_pagerank(e_local, iterations=6)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-12

    docs = pages.filter(F.col("url").isNotNull()).select(
        F.lower(F.parse_url("url", F.lit("HOST"))).alias("host"), "text"
    )
    primed = with_authority_prior(docs, ranks, broadcast_ranks=True)
    prior = {r.host: r.authority_prior for r in primed.collect()}
    # the farm inflates its target above the organically-linked host
    assert got["farm-target.example"] > got["plain-target.example"]
    # crawled farm pages carry their own (nonzero) authority
    assert prior["farm0.example"] == pytest.approx(got["farm0.example"])
    # organic.example has no inbound links but is in the graph
    assert prior["organic.example"] == pytest.approx(got["organic.example"])


def test_host_edges_single_shuffle_no_python(spark):
    """Edge building is all JVM (Generate + projections, no UDF, no
    Arrow pass) and shuffles exactly once — the pair-dedup Exchange."""
    pages = spark.createDataFrame(
        [("http://a.example/", ["http://b.example/"])],
        "url string, out_links array<string>",
    )
    plan = (
        host_edges(pages)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1  # distinct only
    assert "Generate explode" in plan  # map-side fan-out
    for bad in ("CartesianProduct", "BroadcastNestedLoop", "Python", "Arrow"):
        assert bad not in plan, bad


def test_incremental_crawl_lands_edges_atomically(spark, tmp_path):
    """incremental_crawl(emit_links=True): each wave's host-level
    edges land under edges/epoch=N in the SAME atomic commit as the
    docs, replays add nothing, and the accumulated edge set feeds
    pagerank — the incremental producer for the periodic authority
    rebuild."""
    import pyspark.sql.functions as F  # noqa: F811

    from spotify_etl_aws_spark.sources.warc import incremental_crawl

    land = tmp_path / "crawl_land"
    land.mkdir()
    out, ckpt = str(tmp_path / "crawl_out"), str(tmp_path / "crawl_ckpt")

    def shard(name, pages):
        recs = b"".join(
            _page(url, hrefs)  # includes enough prose to pass min chars
            for url, hrefs in pages
        )
        (land / name).write_bytes(gzip.compress(recs))

    shard(
        "w1.warc.gz",
        [
            ("http://a.example/", ["http://b.example/", "/self-rel"]),
            ("http://b.example/", ["http://c.example/x"]),
            # blocked domain: neither its doc NOR its authority vote lands
            ("http://spam.example/", ["http://a.example/"]),
        ],
    )
    blocked = ["spam.example"]
    incremental_crawl(
        spark, str(land), out, ckpt, blocked_domains=blocked, emit_links=True
    )
    edges = spark.read.parquet(f"{out}/edges")
    got = {(r.src, r.dst) for r in edges.collect()}
    assert got == {("a.example", "b.example"), ("b.example", "c.example")}
    assert "epoch" in edges.columns

    # replay: nothing new lands on either dataset
    incremental_crawl(
        spark, str(land), out, ckpt, blocked_domains=blocked, emit_links=True
    )
    assert spark.read.parquet(f"{out}/edges").count() == 2
    n_docs = spark.read.parquet(f"{out}/docs").count()

    # wave 2 adds one page; its edges land in a NEW epoch
    shard("w2.warc.gz", [("http://c.example/x", ["http://a.example/"])])
    incremental_crawl(
        spark, str(land), out, ckpt, blocked_domains=blocked, emit_links=True
    )
    edges = spark.read.parquet(f"{out}/edges")
    assert edges.count() == 3
    assert edges.select("epoch").distinct().count() == 2
    assert spark.read.parquet(f"{out}/docs").count() == n_docs + 1

    # the periodic rebuild: union epochs -> distinct -> pagerank
    ranks = pagerank(edges.select("src", "dst"), iterations=4)
    got_pr = {r.node: r.pr for r in ranks.collect()}
    want = ref_pagerank(
        [("a.example", "b.example"), ("b.example", "c.example"),
         ("c.example", "a.example")],
        iterations=4,
    )
    assert set(got_pr) == set(want)
    for v in want:
        assert abs(got_pr[v] - want[v]) < 1e-12


def test_authority_prior_unknown_host_zero(spark):
    docs = spark.createDataFrame(
        [("known.example", "t"), ("unknown.example", "t")], "host string, text string"
    )
    ranks = spark.createDataFrame(
        [("known.example", 0.25)], "node string, pr double"
    )
    got = {
        r.host: r.authority_prior
        for r in with_authority_prior(docs, ranks).collect()
    }
    assert got == {"known.example": 0.25, "unknown.example": 0.0}
