"""WARC source (sources/warc.py): record framing, multi-member gzip,
HTTP envelope split, HTML text extraction, and the Spark binaryFile
lane end-to-end on synthetic crawl files."""

from __future__ import annotations

import gzip

import pytest

from spotify_etl_aws_spark.sources.warc import (
    html_text,
    iter_warc_records,
    read_warc,
    split_http_response,
)


def _record(wtype: str, body: bytes, url: str | None = None) -> bytes:
    heads = [
        "WARC/1.0",
        f"WARC-Type: {wtype}",
        "WARC-Date: 2026-08-14T00:00:00Z",
        "WARC-Record-ID: <urn:uuid:0000>",
    ]
    if url:
        heads.append(f"WARC-Target-URI: {url}")
    heads.append(f"Content-Length: {len(body)}")
    return "\r\n".join(heads).encode() + b"\r\n\r\n" + body + b"\r\n\r\n"


def _http(payload: bytes, ctype: str = "text/html", status: int = 200) -> bytes:
    return (
        f"HTTP/1.1 {status} OK\r\nContent-Type: {ctype}\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode() + payload


_HTML = (
    b"<html><head><title>T</title><style>p{color:red}</style>"
    b"<script>var x = '<p>not text</p>';</script></head>"
    b"<body><h1>Hello &amp; welcome</h1><p>to the crawl</p></body></html>"
)


def _warc_bytes() -> bytes:
    return (
        _record("warcinfo", b"software: test\r\n")
        + _record("request", b"GET / HTTP/1.1\r\n\r\n", "http://a.example/")
        + _record("response", _http(_HTML), "http://a.example/")
        + _record(
            "response",
            _http(b"plain words only", "text/plain"),
            "http://b.example/p",
        )
    )


def test_record_framing_and_multimember_gzip():
    raw = _warc_bytes()
    recs = list(iter_warc_records(raw))
    assert [h["WARC-Type"] for h, _ in recs] == [
        "warcinfo", "request", "response", "response",
    ]
    # one gzip member per record — CommonCrawl's layout
    members = b"".join(
        gzip.compress(_record("response", _http(_HTML), f"http://m{i}/"))
        for i in range(3)
    )
    got = list(iter_warc_records(members))
    assert len(got) == 3
    assert got[2][0]["WARC-Target-URI"] == "http://m2/"


def test_http_split_and_html_text():
    status, ctype, payload = split_http_response(_http(_HTML))
    assert (status, ctype) == (200, "text/html")
    text = html_text(payload)
    assert text == "T Hello & welcome to the crawl"
    assert "not text" not in text and "color:red" not in text
    # non-HTTP body passes through
    assert split_http_response(b"abc") == (0, "", b"abc")


def test_truncated_records_raise():
    with pytest.raises(ValueError, match="truncated WARC header"):
        list(iter_warc_records(b"WARC/1.0\r\nWARC-Type: x"))
    bad = _record("response", b"12345")[:-9]  # cut into the body
    with pytest.raises(ValueError, match="exceeds stream length"):
        list(iter_warc_records(bad))


def test_spark_warc_lane(spark, tmp_path):
    d = tmp_path / "crawl"
    d.mkdir()
    (d / "part-0.warc.gz").write_bytes(gzip.compress(_warc_bytes()))
    # second shard: two single-record gzip members
    (d / "part-1.warc.gz").write_bytes(
        gzip.compress(
            _record("response", _http(_HTML), "http://c.example/x")
        )
        + gzip.compress(
            _record(
                "response",
                _http(b"<html><body>short</body></html>"),
                "http://d.example/y",
            )
        )
    )
    df = read_warc(spark, str(d / "*.warc.gz"))
    rows = {r.url: r for r in df.collect()}
    assert set(rows) == {
        "http://a.example/", "http://b.example/p",
        "http://c.example/x", "http://d.example/y",
    }
    assert rows["http://a.example/"].text == "T Hello & welcome to the crawl"
    assert rows["http://b.example/p"].text == "plain words only"
    assert rows["http://d.example/y"].text == "short"
    assert rows["http://a.example/"].http_status == 200
    assert all(r.warc_file for r in rows.values())
    # request/warcinfo records were filtered inside the kernel
    assert df.count() == 4


def test_warc_to_curation_pipeline(spark, tmp_path):
    """Crawl shards -> read_warc -> build_training_corpus: the
    ingestion seam feeds the ladder directly (url becomes the doc id
    domain; a duplicated page across shards dies at near-dedup)."""
    from pyspark.sql import functions as F

    from spotify_etl_aws_spark.plans.curation import build_training_corpus

    topics = [
        "storage engines and compaction", "query planning and join order",
        "vector search and quantization", "stream processing watermarks",
        "tokenizer training and merges", "parquet footers and pruning",
        "shuffle partitioning and skew",
    ]

    def page_http(i: int) -> bytes:
        words = " ".join(
            f"{(tw := topics[(i + j) % len(topics)].split())[j % len(tw)]}"
            f"{(i * 7 + j * 13) % 97}"
            for j in range(25)
        )
        body = (
            f"<html><body><p>the crawl page number {i} talks about "
            f"{topics[i % len(topics)]}. {words}.</p></body></html>"
        ).encode()
        return _http(body)

    def page(i: int) -> bytes:
        return _record(
            "response", page_http(i), f"http://site{i % 7}.example/p{i}"
        )

    d = tmp_path / "crawl2"
    d.mkdir()
    (d / "s0.warc.gz").write_bytes(
        gzip.compress(b"".join(page(i) for i in range(30)))
    )
    # shard 1 re-crawls page 3's exact content under a different URL
    (d / "s1.warc.gz").write_bytes(
        gzip.compress(
            b"".join(page(i) for i in range(30, 50))
            + _record(
                "response", page_http(3), "http://mirror.example/copy-of-3"
            )
        )
    )
    pages = read_warc(spark, str(d / "*.warc.gz"))
    docs = pages.select(
        F.xxhash64("url").alias("doc_id"), "text"
    )
    out = build_training_corpus(
        spark, docs, None, str(tmp_path / "warc_corpus"),
        quality_cutoff=0.1, pack_budget=512,
    )
    kept = out.select("doc_id").count()
    assert 0 < kept <= 51
    # the mirrored page and its original collapse to one representative
    texts = [r.text for r in out.collect()]
    assert sum("page number 3 " in t for t in texts) == 1


def test_main_text_strips_boilerplate(spark, tmp_path):
    """html_main_text: link-dense navigation and short footers drop,
    prose paragraphs survive — and the flag threads through read_warc."""
    from spotify_etl_aws_spark.sources.warc import html_main_text

    page = (
        b"<html><head><title>T</title></head><body>"
        b"<nav><a href='/'>home</a> <a href='/a'>about</a> "
        b"<a href='/c'>contact</a> <a href='/p'>pricing</a></nav>"
        b"<p>the actual article body talks about storage engines and "
        b"query planning in considerable depth over many words</p>"
        b"<p>a second real paragraph continues the argument with more "
        b"detail about shuffle partitioning and skew handling</p>"
        b"<div><a href='/t1'>related one</a> <a href='/t2'>related "
        b"two</a> <a href='/t3'>related three</a></div>"
        b"<footer>copyright</footer></body></html>"
    )
    main = html_main_text(page)
    assert "actual article body" in main
    assert "second real paragraph" in main
    assert "home" not in main and "related one" not in main
    assert "copyright" not in main and "T" not in main.split()

    d = tmp_path / "crawlmain"
    d.mkdir()
    (d / "m.warc.gz").write_bytes(
        gzip.compress(_record("response", _http(page), "http://m.example/"))
    )
    df = read_warc(spark, str(d / "*.warc.gz"), main_text=True)
    row = df.collect()[0]
    assert "actual article body" in row.text and "home" not in row.text


def test_incremental_crawl_exactly_once(spark, tmp_path):
    """Streaming crawl ingestion: WARC shards land in waves, each
    shard parsed exactly once across runs; replays don't duplicate;
    blocked domains never land; output chains into the incremental
    curation shape."""
    from spotify_etl_aws_spark.sources.warc import incremental_crawl

    land = tmp_path / "crawl_land"
    land.mkdir()
    out, ckpt = str(tmp_path / "crawl_out"), str(tmp_path / "crawl_ckpt")

    def shard(name, lo, hi, blocked=0):
        recs = []
        for i in range(lo, hi):
            body = (
                f"<html><body><p>crawled article number {i} with enough "
                f"prose words to clear the main text extractor filter "
                f"threshold comfortably</p></body></html>"
            ).encode()
            recs.append(
                _record("response", _http(body), f"https://s{i % 5}.example.org/a{i}")
            )
        for j in range(blocked):
            body = b"<html><body><p>blocked page with plenty of words to pass the extractor threshold here</p></body></html>"
            recs.append(
                _record("response", _http(body), f"https://bad.example.net/x{j}")
            )
        (land / name).write_bytes(gzip.compress(b"".join(recs)))

    shard("w1.warc.gz", 0, 20, blocked=3)
    incremental_crawl(
        spark, str(land), out, ckpt, blocked_domains=["example.net"]
    )
    docs_path = f"{out}/docs"
    first = spark.read.parquet(docs_path)
    n1 = first.count()
    assert n1 == 20  # blocked domain rows never landed
    assert {r.domain for r in first.select("domain").distinct().collect()} == {
        "example.org"
    }

    # re-run with nothing new: no new rows
    incremental_crawl(
        spark, str(land), out, ckpt, blocked_domains=["example.net"]
    )
    assert spark.read.parquet(docs_path).count() == n1

    # wave 2 appends only the new shard's pages
    shard("w2.warc.gz", 20, 35)
    incremental_crawl(
        spark, str(land), out, ckpt, blocked_domains=["example.net"]
    )
    final = spark.read.parquet(docs_path)
    assert final.count() == 35
    assert final.select("doc_id").distinct().count() == 35
    # epoch is a partition column (the idempotent-sink contract)
    assert "epoch" in final.columns

    # wave 3 RE-CRAWLS a wave-1 URL: per-fetch ids stay unique (no
    # doc_id collision across epochs) while url_hash ties the fetches
    recs = _record(
        "response",
        _http(
            b"<html><body><p>recrawled article number 0 with enough "
            b"prose words to clear the main text extractor filter "
            b"threshold comfortably again</p></body></html>"
        ),
        "https://s0.example.org/a0",
    ).replace(b"2026-08-14T00:00:00Z", b"2026-08-15T09:30:00Z")
    import time as _time

    _time.sleep(1.1)  # a later mtime so the source sees the new file
    (land / "w3.warc.gz").write_bytes(gzip.compress(recs))
    incremental_crawl(
        spark, str(land), out, ckpt, blocked_domains=["example.net"]
    )
    final = spark.read.parquet(docs_path)
    assert final.count() == 36
    assert final.select("doc_id").distinct().count() == 36
    from pyspark.sql import functions as F

    refetches = final.filter(
        F.col("url_canonical") == "https://s0.example.org/a0"
    )
    assert refetches.count() == 2
    assert refetches.select("url_hash").distinct().count() == 1


def test_latest_fetch_per_url_and_epoch_compaction(spark, tmp_path):
    """Composes the crawl maintenance pair: latest_fetch_per_url
    collapses re-crawls to the newest version, and compact_dataset
    bin-packs the epoch-accumulated small files with the partition
    layout (and rows) intact."""
    from pyspark.sql import functions as F

    from spotify_etl_aws_spark.sources.sinks import compact_dataset
    from spotify_etl_aws_spark.sources.warc import latest_fetch_per_url

    rows = [
        # url A fetched three times; url B once
        (1, 100, "old text a", "https://a/", "a", "f1", "2026-08-01T00:00:00Z", 0),
        (2, 100, "mid text a", "https://a/", "a", "f2", "2026-08-05T00:00:00Z", 1),
        (3, 100, "new text a", "https://a/", "a", "f3", "2026-08-09T00:00:00Z", 2),
        (4, 200, "only text b", "https://b/", "b", "f1", "2026-08-02T00:00:00Z", 0),
    ]
    schema = (
        "doc_id bigint, url_hash bigint, text string, url_canonical string, "
        "domain string, warc_file string, warc_date string, epoch int"
    )
    docs = spark.createDataFrame(rows, schema)
    latest = {r.url_hash: r.text for r in latest_fetch_per_url(docs).collect()}
    assert latest == {100: "new text a", 200: "only text b"}

    # epoch-accumulated small files -> compaction keeps rows + layout
    path = str(tmp_path / "docs")
    for e in range(3):
        docs.filter(F.col("epoch") == e).coalesce(1).write.mode(
            "append"
        ).partitionBy("epoch").parquet(path)
    stats = compact_dataset(spark, path, partition_cols=["epoch"])
    back = spark.read.parquet(path)
    assert back.count() == 4
    assert stats["files_after"] <= stats["files_before"]
    assert {r.epoch for r in back.select("epoch").distinct().collect()} == {0, 1, 2}
    # the maintenance pair composes: compacted data still collapses
    assert latest_fetch_per_url(back).count() == 2


def test_latest_fetch_orders_parsed_timestamps():
    """Review fix: mixed-precision/offset WARC dates order by TIME, not
    string; the window keys on the URL, not its 64-bit hash."""
    import pytest  # noqa: F401 — parity with module imports

    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    rows = [
        # fractional-second fetch IS the latest despite '.' < 'Z'
        (1, 100, "old", "https://a/", "a", "f", "2026-08-15T09:30:00Z", 0),
        (2, 100, "new", "https://a/", "a", "f", "2026-08-15T09:30:00.900Z", 0),
        # offset form: 11:00+02:00 == 09:00Z, older than 10:00Z
        (3, 200, "newer", "https://b/", "b", "f", "2026-08-15T10:00:00Z", 0),
        (4, 200, "older", "https://b/", "b", "f", "2026-08-15T11:00:00+02:00", 0),
    ]
    schema = (
        "doc_id bigint, url_hash bigint, text string, url_canonical string, "
        "domain string, warc_file string, warc_date string, epoch int"
    )
    from spotify_etl_aws_spark.sources.warc import latest_fetch_per_url

    got = {
        r.url_canonical: r.text
        for r in latest_fetch_per_url(spark.createDataFrame(rows, schema)).collect()
    }
    assert got == {"https://a/": "new", "https://b/": "newer"}


def test_lenient_record_resync_and_counter():
    """Lenient mode (the Spark-kernel posture): a corrupt record in the
    DECOMPRESSED stream costs one record + one counter tick; the
    records after it still parse. Strict mode still raises (above)."""
    good1 = _record("response", _http(_HTML), "http://a.example/")
    garbage = b"NOT A WARC HEADER AT ALL\r\njunk: here\r\n\r\nstray body"
    good2 = _record(
        "response", _http(b"still here", "text/plain"), "http://b.example/p"
    )
    stats: dict[str, int] = {}
    recs = list(
        iter_warc_records(
            good1 + garbage + b"\r\n\r\n" + good2, strict=False, stats=stats
        )
    )
    urls = [h.get("WARC-Target-URI") for h, _ in recs]
    assert urls == ["http://a.example/", "http://b.example/p"]
    assert stats["bad_records"] >= 1


def test_lenient_gunzip_skips_corrupt_member():
    """A corrupt gzip MEMBER (flipped bytes mid-stream) costs that
    member, not the file: surrounding members still decompress and
    their records parse."""
    m1 = gzip.compress(_record("response", _http(_HTML), "http://a.example/"))
    bad = bytearray(
        gzip.compress(_record("response", _http(b"x" * 200, "text/plain"), "http://bad.example/"))
    )
    bad[15:25] = b"\x00" * 10  # corrupt the deflate stream
    m3 = gzip.compress(
        _record("response", _http(b"tail words", "text/plain"), "http://c.example/t")
    )
    stats: dict[str, int] = {}
    recs = list(
        iter_warc_records(m1 + bytes(bad) + m3, strict=False, stats=stats)
    )
    urls = [h.get("WARC-Target-URI") for h, _ in recs]
    assert "http://a.example/" in urls
    assert "http://c.example/t" in urls
    assert "http://bad.example/" not in urls
    assert stats["bad_records"] >= 1


def test_spark_lane_quarantines_bad_records(spark, tmp_path):
    """The read_warc kernel must not fail a file over one corrupt
    record — the survivors land with the per-file bad_records counter,
    and a clean file's rows carry bad_records == 0."""
    d = tmp_path / "crawl"
    d.mkdir()
    corrupt = (
        _record("response", _http(_HTML), "http://a.example/")
        + b"GARBAGE NOT WARC\r\n\r\nmore junk"
        + b"\r\n\r\n"
        + _record("response", _http(b"ok text", "text/plain"), "http://b.example/p")
    )
    (d / "bad.warc.gz").write_bytes(gzip.compress(corrupt))
    (d / "good.warc.gz").write_bytes(
        gzip.compress(
            _record("response", _http(b"clean file", "text/plain"), "http://c.example/")
        )
    )
    rows = {r.url: r for r in read_warc(spark, str(d / "*.warc.gz")).collect()}
    assert set(rows) == {
        "http://a.example/", "http://b.example/p", "http://c.example/",
    }
    assert rows["http://a.example/"].bad_records >= 1
    assert rows["http://b.example/p"].bad_records >= 1
    assert rows["http://c.example/"].bad_records == 0


def test_read_warc_split_matches_per_file_read(spark, tmp_path):
    """Splittable ingest (read_warc_split): a single multi-hundred-MB
    WARC must fan out over >1 task (byte-range splits + gzip-member
    resync) and produce EXACTLY the rows the per-file reader produces.
    Bodies are incompressible (random hex) so the compressed shard is
    genuinely large."""
    import random

    from spotify_etl_aws_spark.sources.warc import (
        _gzip_member_splits,
        read_warc_split,
    )

    rng = random.Random(42)
    d = tmp_path / "bigcrawl"
    d.mkdir()
    n_rec = 2400
    with open(d / "big.warc.gz", "wb") as f:
        for i in range(n_rec):
            body = rng.randbytes(48 * 1024).hex().encode()  # ~96 KB text
            f.write(
                gzip.compress(
                    _record(
                        "response",
                        _http(body, "text/plain"),
                        f"http://site{i}.example/",
                    ),
                    compresslevel=1,
                )
            )
    size = (d / "big.warc.gz").stat().st_size
    assert size > 100 * 1024 * 1024  # genuinely multi-hundred-MB raw
    splits = _gzip_member_splits([(str(d / "big.warc.gz"), size)], 8 * 1024 * 1024)
    assert len(splits) > 1  # ONE file fans out over many tasks

    split_df = read_warc_split(
        spark, str(d / "*.warc.gz"), min_text_chars=1, split_mb=8
    )
    got = {
        r.url: r.text
        for r in split_df.select("url", "text").collect()
    }
    assert len(got) == n_rec
    # spot-check content against the per-file reader on the same shard
    want = {
        r.url: r.text
        for r in read_warc(spark, str(d / "*.warc.gz"))
        .select("url", "text")
        .collect()
    }
    assert got == want
    # >1 task actually executed: the split table is repartitioned wide
    assert split_df.rdd.getNumPartitions() > 1


def test_read_warc_split_handles_uncompressed_warc(spark, tmp_path):
    """Review fix: a plain (non-gzip) .warc must not be silently
    dropped by the split reader — the split owning offset 0 parses the
    whole file, matching read_warc."""
    from spotify_etl_aws_spark.sources.warc import read_warc_split

    d = tmp_path / "mixed"
    d.mkdir()
    (d / "plain.warc").write_bytes(_warc_bytes())
    (d / "zipped.warc.gz").write_bytes(
        gzip.compress(
            _record("response", _http(b"gz text", "text/plain"), "http://z.example/")
        )
    )
    split_urls = {
        r.url
        for r in read_warc_split(spark, str(d / "*")).select("url").collect()
    }
    file_urls = {
        r.url for r in read_warc(spark, str(d / "*")).select("url").collect()
    }
    assert split_urls == file_urls
    assert "http://a.example/" in split_urls  # from the plain file
    assert "http://z.example/" in split_urls


def test_fully_corrupt_file_emits_diagnostic_row(spark, tmp_path):
    """Review fix: a file whose every record is bad must surface its
    bad_records count on a NULL-url diagnostic row, not vanish."""
    d = tmp_path / "corrupt"
    d.mkdir()
    (d / "allbad.warc.gz").write_bytes(
        gzip.compress(b"NOT WARC AT ALL\r\n\r\njust junk bytes")
    )
    rows = read_warc(spark, str(d / "*.warc.gz")).collect()
    assert len(rows) == 1
    assert rows[0].url is None
    assert rows[0].bad_records >= 1
    # content consumers filter the contract way
    assert (
        read_warc(spark, str(d / "*.warc.gz"))
        .filter("url IS NOT NULL")
        .count()
        == 0
    )


def test_split_reader_counts_corrupt_members_and_files(spark, tmp_path):
    """Second-review fix: the split lane surfaces corruption like the
    per-file lane — a verified-but-non-WARC member counts, and a file
    with NO valid member emits the diagnostic row from split 0."""
    from spotify_etl_aws_spark.sources.warc import read_warc_split

    d = tmp_path / "c"
    d.mkdir()
    # file 1: valid member + verified member with non-WARC content
    (d / "mixed.warc.gz").write_bytes(
        gzip.compress(
            _record("response", _http(b"good", "text/plain"), "http://g.example/")
        )
        + gzip.compress(b"this member is valid gzip but not a WARC record")
    )
    # file 2: nothing valid at all behind a .gz name
    (d / "allbad.warc.gz").write_bytes(b"junk that is not even gzip data")
    rows = read_warc_split(spark, str(d / "*.warc.gz")).collect()
    by_file = {}
    for r in rows:
        by_file.setdefault(r.warc_file.rsplit("/", 1)[-1], []).append(r)
    assert [r.url for r in by_file["mixed.warc.gz"]] == ["http://g.example/"]
    assert by_file["mixed.warc.gz"][0].bad_records >= 1
    assert by_file["allbad.warc.gz"][0].url is None
    assert by_file["allbad.warc.gz"][0].bad_records >= 1


def test_plain_warc_splits_across_tasks(spark, tmp_path):
    """Second-review fix: an oversized UNCOMPRESSED .warc fans out on
    record boundaries instead of being parsed whole by split 0 — rows
    identical to the per-file reader."""
    from spotify_etl_aws_spark.sources.warc import read_warc_split

    d = tmp_path / "plain"
    d.mkdir()
    n_rec = 400
    with open(d / "big.warc", "wb") as f:
        for i in range(n_rec):
            body = (f"record {i} " * 500).encode()
            f.write(
                _record("response", _http(body, "text/plain"), f"http://p{i}.example/")
            )
    size = (d / "big.warc").stat().st_size
    assert size > 2_000_000
    got = {
        r.url: r.text
        for r in read_warc_split(
            spark, str(d / "*.warc"), split_mb=1
        ).select("url", "text").collect()
    }
    want = {
        r.url: r.text
        for r in read_warc(spark, str(d / "*.warc")).select("url", "text").collect()
    }
    assert len(got) == n_rec
    assert got == want


def test_gz_with_damaged_head_recovers_members(spark, tmp_path):
    """Second-review fix: a .gz whose first bytes are damaged must
    still take the member-scan lane (extension routing) and recover
    every intact member past the damage."""
    from spotify_etl_aws_spark.sources.warc import read_warc_split

    d = tmp_path / "dmg"
    d.mkdir()
    good = gzip.compress(
        _record("response", _http(b"survivor", "text/plain"), "http://s.example/")
    )
    (d / "dmg.warc.gz").write_bytes(b"\x00\x00JUNKHEAD" + good)
    rows = read_warc_split(spark, str(d / "*.warc.gz")).collect()
    urls = [r.url for r in rows]
    assert "http://s.example/" in urls
