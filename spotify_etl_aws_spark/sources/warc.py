"""WARC (Web ARChive) source — the container CommonCrawl ships, i.e.
the actual on-disk format of a 100 TB pre-training corpus.

The reference ingests REST JSON (`/root/reference/ingestion/ingestion/
raw/raw.py`); a web-scale corpus instead lands as ``*.warc.gz`` files:
a multi-member gzip stream where each member holds one WARC/1.0 record
(version line, CRLF header block, Content-Length-framed body). Both
layers are stdlib-parseable — no library seam needed:

- ``iter_warc_records`` walks a (possibly multi-member gzip) WARC
  byte stream and yields (headers, body) per record;
- ``read_warc`` is the Spark lane: ``binaryFile`` scan over the WARC
  files -> one ``mapInPandas`` pass that parses records, strips the
  HTTP response envelope, and extracts visible text from HTML ->
  (warc_file, url, warc_date, content_type, http_status, n_bytes,
  text, bad_records). Parallelism is per-FILE (CommonCrawl shards its
  crawl into ~1 GB files precisely so file-granular workers saturate
  a cluster);
- ``read_warc_split`` adds SUB-file parallelism for oversized shards:
  byte-range splits + gzip-member resync (scan for the gzip magic,
  verify by decompression + ``WARC/`` prefix), so a single 10 GB WARC
  fans out across tasks instead of straggling on one core.

``html_text`` is a deliberately simple tag-stripper (script/style
dropped, tags removed, entities unescaped). Production pipelines use a
DOM-aware extractor (trafilatura/resiliparse) — that swap is the same
one-function seam as the media codecs; everything around it (record
framing, envelope split, Spark plumbing) is the real thing.
"""

from __future__ import annotations

import gzip
import html as _html
import io
import os
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CRLF2 = b"\r\n\r\n"


def iter_warc_records(
    data,
    strict: bool = True,
    stats: dict[str, int] | None = None,
    start: int = 0,
    stop_before: int | None = None,
) -> Iterator[tuple[dict[str, str], bytes]]:
    """Yield (headers, body) for every record in a WARC byte stream.
    Accepts raw or gzip input (bytes or an mmap); multi-member gzip
    (one member per record, the CommonCrawl layout) decompresses as
    one stream via stdlib gzip's concatenated-member support.

    ``strict=True`` (the library/API default) raises on malformed
    framing — truncated header block, bad version line, missing
    Content-Length, body past end-of-stream. The Spark kernels pass
    ``strict=False`` instead: real CommonCrawl shards do contain
    occasional corrupt records, and one of them must cost ONE record
    (counted in ``stats['bad_records']``, resyncing to the next
    ``\\r\\nWARC/`` boundary), not the whole file — and under a
    checkpointed incremental stream, not a permanently wedged retry
    loop.

    ``start``/``stop_before`` bound the walk for RAW (uncompressed)
    byte-range splits: records STARTING in [start, stop_before) are
    yielded whole (bodies may extend past), a ``start`` inside a
    record resyncs forward to the next ``\\r\\nWARC/`` boundary —
    the split-ownership rule of ``read_warc_split``. Not valid for
    gzip input (member offsets, not byte offsets, split those)."""
    if data[: 2] == b"\x1f\x8b":
        if start or stop_before is not None:
            raise ValueError("start/stop_before require raw (non-gzip) input")
        if strict:
            data = gzip.GzipFile(fileobj=io.BytesIO(bytes(data))).read()
        else:
            # a corrupt gzip member must cost one member, not the file:
            # walk members individually and resync past bad ones
            data = _lenient_gunzip(data, stats)
    n = len(data)
    stop = n if stop_before is None else min(stop_before, n)
    pos = start
    if start > 0:
        # mid-stream entry: position at the first record boundary at or
        # after start (a record starting exactly at `start` has its
        # preceding CRLF at start-2, hence the back-off)
        nxt = data.find(b"\r\nWARC/", max(start - 2, 0))
        if nxt < 0:
            return
        pos = nxt + 2

    def bad(msg: str, resync_from: int) -> int:
        """strict: raise; lenient: count and return the next plausible
        record start (or n to stop)."""
        if strict:
            raise ValueError(msg)
        if stats is not None:
            stats["bad_records"] = stats.get("bad_records", 0) + 1
        nxt = data.find(b"\r\nWARC/", resync_from)
        return nxt + 2 if nxt >= 0 else n

    while pos < stop:
        # skip inter-record blank lines
        while pos < n and data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= stop:
            break
        head_end = data.find(_CRLF2, pos)
        if head_end < 0:
            pos = bad("truncated WARC header block", n)
            continue
        head = data[pos:head_end].decode("utf-8", "replace")
        lines = head.split("\r\n")
        if not lines[0].startswith("WARC/"):
            pos = bad(f"bad WARC version line: {lines[0]!r}", pos + 1)
            continue
        headers: dict[str, str] = {"WARC-Version": lines[0]}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            headers[k.strip()] = v.strip()
        try:
            length = int(headers["Content-Length"])
        except (KeyError, ValueError):
            if strict:
                raise ValueError("WARC record missing Content-Length") from None
            pos = bad("WARC record missing Content-Length", head_end)
            continue
        body_start = head_end + len(_CRLF2)
        if body_start + length > n:
            pos = bad("WARC body exceeds stream length", n)
            continue
        yield headers, data[body_start : body_start + length]
        pos = body_start + length


def _lenient_gunzip(data: bytes, stats: dict[str, int] | None) -> bytes:
    """Concatenated-member gunzip that skips corrupt members (counted
    in ``stats['bad_records']``) by resyncing to the next gzip magic —
    the decompression-layer twin of the record-level resync."""
    import zlib

    chunk = 1 << 20
    out = bytearray()
    mv = memoryview(data)  # chunked feed: unused_data stays <= chunk,
    pos, n = 0, len(data)  # so the walk is linear in file size
    while pos < n:
        d = zlib.decompressobj(31)
        p = pos
        member = bytearray()
        try:
            while not d.eof and p < n:
                member += d.decompress(mv[p : p + chunk])
                p += chunk
            if not d.eof:
                raise zlib.error("truncated gzip member")
        except zlib.error:
            if stats is not None:
                stats["bad_records"] = stats.get("bad_records", 0) + 1
            nxt = data.find(_GZ_MAGIC, pos + 1)
            if nxt < 0:
                break
            pos = nxt
            continue
        out += member
        consumed = min(p, n) - pos - len(d.unused_data)
        pos += max(consumed, 1)
    return bytes(out)


def split_http_response(body: bytes) -> tuple[int, str, bytes]:
    """(status, content_type, payload) from an HTTP response envelope
    (the body of a WARC ``response`` record). Non-HTTP bodies come back
    as (0, "", body)."""
    if not body.startswith(b"HTTP/"):
        return 0, "", body
    head_end = body.find(_CRLF2)
    if head_end < 0:
        return 0, "", body
    head = body[:head_end].decode("latin-1")
    lines = head.split("\r\n")
    try:
        status = int(lines[0].split()[1])
    except (IndexError, ValueError):
        return 0, "", body
    ctype = ""
    for line in lines[1:]:
        k, _, v = line.partition(":")
        if k.strip().lower() == "content-type":
            ctype = v.strip()
            break
    return status, ctype, body[head_end + len(_CRLF2) :]


_SCRIPT_RE = re.compile(
    rb"<(script|style|noscript)\b.*?</\1\s*>", re.IGNORECASE | re.DOTALL
)
_TAG_RE = re.compile(rb"<[^>]+>")
_WS_RE = re.compile(r"\s+")
_BLOCK_RE = re.compile(
    rb"</?(?:p|div|li|ul|ol|h[1-6]|table|tr|td|th|section|article|"
    rb"header|footer|nav|aside|blockquote|br|title)\b[^>]*/?>",
    re.IGNORECASE,
)
_ANCHOR_RE = re.compile(rb"<a\b[^>]*>(.*?)</a\s*>", re.IGNORECASE | re.DOTALL)
_HREF_RE = re.compile(
    rb"<a\b[^>]*?\bhref\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s>\"']+))",
    re.IGNORECASE,
)


def html_text(payload: bytes) -> str:
    """Visible text from an HTML payload: script/style blocks dropped,
    tags stripped, entities unescaped, whitespace collapsed. The
    documented swap point for a DOM-aware extractor."""
    no_script = _SCRIPT_RE.sub(b" ", payload)
    stripped = _TAG_RE.sub(b" ", no_script)
    text = stripped.decode("utf-8", "replace")
    return _WS_RE.sub(" ", _html.unescape(text)).strip()


def html_links(payload: bytes) -> list[str]:
    """Out-links of an HTML payload: every ``<a href=...>`` target
    (entity-unescaped, whitespace-trimmed, de-duplicated in first-seen
    order), script/style blocks excluded so templated JS link soup
    never pollutes the graph. Targets are returned AS WRITTEN —
    absolute, protocol-relative or page-relative; host-graph edge
    building (``operators/urls.py:host_edges``) resolves what it needs
    JVM-side. This is the producer feeding ``operators/graph.py:
    pagerank`` — the same anchor walk ``html_blocks`` uses for link
    density, emitting the targets it used to discard."""
    no_script = _SCRIPT_RE.sub(b" ", payload)
    seen: dict[str, None] = {}
    for m in _HREF_RE.finditer(no_script):
        raw = next(g for g in m.groups() if g is not None)
        href = _html.unescape(raw.decode("utf-8", "replace")).strip()
        if href:
            seen.setdefault(href)
    return list(seen)


def html_blocks(payload: bytes) -> list[tuple[str, float]]:
    """Block segmentation with per-block link density — the signal the
    jusText/boilerpipe family classifies on. Splits on block-level
    tags, then per block reports (visible text, fraction of its
    characters that sit inside <a> anchors)."""
    no_script = _SCRIPT_RE.sub(b" ", payload)
    out: list[tuple[str, float]] = []
    for seg in _BLOCK_RE.split(no_script):
        link_chars = sum(
            len(_TAG_RE.sub(b" ", m)) for m in _ANCHOR_RE.findall(seg)
        )
        text = _WS_RE.sub(
            " ", _html.unescape(_TAG_RE.sub(b" ", seg).decode("utf-8", "replace"))
        ).strip()
        if not text:
            continue
        density = min(1.0, link_chars / max(1, len(text)))
        out.append((text, density))
    return out


def html_main_text(
    payload: bytes, max_link_density: float = 0.4, min_words: int = 5
) -> str:
    """Boilerplate-stripped article text (jusText-lite): keep blocks
    that read like prose (>= ``min_words`` words, link density <=
    ``max_link_density``); navbars, footers and link farms — short,
    link-dense blocks — drop. A DOM-aware extractor (trafilatura /
    resiliparse) swaps in at this same one-function seam."""
    kept = [
        t
        for t, density in html_blocks(payload)
        if len(t.split()) >= min_words and density <= max_link_density
    ]
    return " ".join(kept)


WARC_SCHEMA = (
    "warc_file string, url string, warc_date string, content_type string, "
    "http_status int, n_bytes bigint, text string, bad_records bigint"
)
WARC_LINKS_SCHEMA = WARC_SCHEMA + ", out_links array<string>"


def read_warc(
    spark: SparkSession,
    path: str,
    record_types: tuple[str, ...] = ("response",),
    min_text_chars: int = 1,
    main_text: bool = False,
    links: bool = False,
) -> DataFrame:
    """WARC files -> one row per kept record with extracted text.
    ``path`` is any ``binaryFile`` glob (e.g. ``dir/*.warc.gz``).
    Record-type filtering (default: HTTP ``response`` records only,
    CommonCrawl's content carrier) and the HTML→text extraction happen
    inside the one Arrow pass; raw WARC bytes never leave the task
    that scanned them. ``main_text=True`` swaps the all-visible-text
    extractor for the boilerplate-stripping ``html_main_text``.

    ``bad_records`` is the file's quarantined-record count, replicated
    on each of the file's rows: per-file totals are
    ``groupBy(warc_file).agg(max(bad_records))`` — never ``sum``,
    which would multiply the count by the row count. A file whose
    every record is bad emits one NULL-url diagnostic row (filter
    ``url IS NOT NULL`` for content).

    ``links=True`` adds an ``out_links array<string>`` column — the
    page's ``<a href>`` targets from the SAME parse pass (no second
    scan of the raw bytes), feeding the host link graph
    (``operators/urls.py:host_edges`` → ``operators/graph.py:
    pagerank``)."""
    extract = html_main_text if main_text else html_text
    files = spark.read.format("binaryFile").load(path)
    gen = _warc_kernel(record_types, min_text_chars, extract, links)
    return files.select("path", "content").mapInPandas(
        gen, schema=WARC_LINKS_SCHEMA if links else WARC_SCHEMA
    )


def _extract_rows(
    fname: str,
    raw: bytes,
    record_types,
    min_text_chars: int,
    extract,
    links: bool = False,
) -> list[tuple]:
    """Parse one WARC byte stream into output rows, LENIENTLY: a
    malformed record (bad framing — counted by the iterator — or a
    body whose envelope/extract step throws) is quarantined into the
    per-file ``bad_records`` counter instead of failing the task; a
    checkpointed AvailableNow stream would otherwise retry the same
    bad shard forever. The counter rides on every surviving row of the
    file (aggregate per file with ``max``, never ``sum`` — the value
    is replicated); a unit with bad records and NO survivors emits one
    NULL-url diagnostic row carrying the count, so corruption is never
    silent exactly when it is worst."""
    stats: dict[str, int] = {}
    rows = _extract_rows_core(
        fname, raw, record_types, min_text_chars, extract, stats, links
    )
    n_bad = stats.get("bad_records", 0)
    if not rows and n_bad:
        diag = (fname, None, None, None, None, None, None, n_bad)
        return [diag + (None,) if links else diag]
    if links:  # core rows carry out_links last; bad_records goes before it
        return [tuple(r[:-1]) + (n_bad, r[-1]) for r in rows]
    return [tuple(r) + (n_bad,) for r in rows]


def _extract_rows_core(
    fname: str,
    raw: bytes,
    record_types,
    min_text_chars: int,
    extract,
    stats: dict[str, int],
    links: bool = False,
) -> list[list]:
    return _rows_from_records(
        fname,
        iter_warc_records(raw, strict=False, stats=stats),
        record_types,
        min_text_chars,
        extract,
        stats,
        links,
    )


def _rows_from_records(
    fname: str,
    records,
    record_types,
    min_text_chars: int,
    extract,
    stats: dict[str, int],
    links: bool = False,
) -> list[list]:
    rows = []
    for hdr, body in records:
        try:
            if hdr.get("WARC-Type") not in record_types:
                continue
            status, ctype, payload = split_http_response(body)
            is_html = "html" in ctype or not ctype
            text = (
                extract(payload)
                if is_html
                else payload.decode("utf-8", "replace").strip()
            )
            if len(text) < min_text_chars:
                continue
            row = [
                fname,
                hdr.get("WARC-Target-URI", ""),
                hdr.get("WARC-Date", ""),
                ctype,
                status,
                len(body),
                text,
            ]
            if links:
                # rides last in the core row; _extract_rows slots
                # bad_records before it to match WARC_LINKS_SCHEMA
                row.append(html_links(payload) if is_html else [])
            rows.append(row)
        except Exception:
            stats["bad_records"] = stats.get("bad_records", 0) + 1
    return rows


_WARC_COLUMNS = [
    "warc_file", "url", "warc_date", "content_type",
    "http_status", "n_bytes", "text", "bad_records",
]


def _warc_kernel(record_types, min_text_chars, extract, links: bool = False):
    cols = _WARC_COLUMNS + (["out_links"] if links else [])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fname, raw in zip(pdf["path"], pdf["content"]):
                rows.extend(
                    _extract_rows(
                        fname, bytes(raw), record_types, min_text_chars,
                        extract, links,
                    )
                )
            yield pd.DataFrame(rows, columns=cols)

    return gen


_GZ_MAGIC = b"\x1f\x8b\x08"


def _gzip_member_splits(
    files: list[tuple[str, int]], split_bytes: int
) -> list[tuple[str, int, int]]:
    """(path, start, end) byte-range splits over compressed WARC
    files. Ranges are advisory: a task owns every gzip MEMBER whose
    first byte lies in [start, end), including members that extend
    past ``end`` — the same ownership rule as Hadoop text splits."""
    splits = []
    for path, size in files:
        n = max(1, -(-size // split_bytes))
        step = -(-size // n)
        for i in range(n):
            splits.append((path, i * step, min(size, (i + 1) * step)))
    return splits


def _parse_split(
    path: str,
    start: int,
    end: int,
    record_types,
    min_text_chars: int,
    extract,
) -> list[tuple]:
    """Parse the gzip members owned by one byte-range split of a
    ``*.warc.gz`` file (CommonCrawl layout: one member per record, so
    any byte offset is a safe split point — members are found by
    scanning for the gzip magic and VERIFYING by decompression +
    ``WARC/`` prefix; a false magic inside compressed data fails
    either check and costs one resync step, never a wrong record).

    Uses mmap'd random access on a local/POSIX path — the one
    open-a-byte-range seam to swap for an object-store ranged GET
    (S3 ``Range:`` header) in a cloud deployment."""
    import mmap
    import zlib

    local = path[5:] if path.startswith("file:") else path
    rows: list[tuple] = []
    stats: dict[str, int] = {}
    members_found = 0
    with open(local, "rb") as f, mmap.mmap(
        f.fileno(), 0, access=mmap.ACCESS_READ
    ) as mm:
        size = len(mm)
        pos = start
        while pos < end:
            # candidate must START before end; the 3-byte pattern may
            # straddle the boundary, so the search window extends 2 past
            idx = mm.find(_GZ_MAGIC, pos, min(end + len(_GZ_MAGIC) - 1, size))
            if idx < 0 or idx >= end:
                break
            d = zlib.decompressobj(31)
            out = bytearray()
            p = idx
            try:
                while not d.eof and p < size:
                    out += d.decompress(mm[p : p + (1 << 20)])
                    p += 1 << 20
                if not d.eof:
                    raise zlib.error("truncated gzip member")
            except zlib.error:
                pos = idx + 1  # false magic OR corrupt member — resync
                continue
            member = bytes(out)
            if not member.startswith(b"WARC/"):
                # a VERIFIED gzip member (magic + valid deflate + CRC)
                # whose content is not a WARC record is corruption, not
                # a false magic hit — count it like any bad record
                stats["bad_records"] = stats.get("bad_records", 0) + 1
                pos = idx + 1
                continue
            members_found += 1
            consumed = min(p, size) - idx - len(d.unused_data)
            rows.extend(
                _extract_rows_core(
                    path, member, record_types, min_text_chars, extract, stats
                )
            )
            pos = idx + max(consumed, 1)
        if start == 0 and members_found == 0 and size > 0:
            # the offset-0 owner found NO valid member in its whole
            # range: whatever corrupted this file (truncated members,
            # damaged head, non-WARC content behind a .gz name) must
            # surface, matching read_warc's never-silent contract
            stats["bad_records"] = stats.get("bad_records", 0) + 1
    n_bad = stats.get("bad_records", 0)
    if not rows and n_bad:
        # all-bad split: surface the count on a diagnostic row
        return [(path, None, None, None, None, None, None, n_bad)]
    return [tuple(r) + (n_bad,) for r in rows]


def _parse_plain_split(
    path: str,
    start: int,
    end: int,
    record_types,
    min_text_chars: int,
    extract,
) -> list[tuple]:
    """Byte-range split of an UNCOMPRESSED .warc: records are found by
    resyncing to the ``\\r\\nWARC/`` framing boundary (the bounded
    walk in ``iter_warc_records``), so an oversized plain shard fans
    out across tasks exactly like the gzip lane. Known edge: a record
    whose BODY embeds a full well-formed WARC record (an archived
    WARC) can be re-parsed by the split that starts inside it — the
    sequential reader treats it as content; acceptable for crawl
    hygiene, excluded by the gzip lane's member framing."""
    import mmap

    local = path[5:] if path.startswith("file:") else path
    stats: dict[str, int] = {}
    with open(local, "rb") as f, mmap.mmap(
        f.fileno(), 0, access=mmap.ACCESS_READ
    ) as mm:
        rows = _rows_from_records(
            path,
            iter_warc_records(
                mm, strict=False, stats=stats, start=start, stop_before=end
            ),
            record_types,
            min_text_chars,
            extract,
            stats,
        )
    n_bad = stats.get("bad_records", 0)
    if not rows and n_bad and start == 0:
        return [(path, None, None, None, None, None, None, n_bad)]
    return [tuple(r) + (n_bad,) for r in rows]


def read_warc_split(
    spark: SparkSession,
    path: str,
    record_types: tuple[str, ...] = ("response",),
    min_text_chars: int = 1,
    main_text: bool = False,
    split_mb: int = 64,
) -> DataFrame:
    """``read_warc`` with sub-file parallelism: each WARC file is cut
    into ~``split_mb`` byte ranges and every range parses its own gzip
    members, so ONE oversized crawl shard (a 10 GB WARC) fans out
    across the cluster instead of becoming a single straggler task.

    Listing is a content-pruned ``binaryFile`` scan (paths + lengths
    only — O(#files) driver state, same as any file index), plus a
    2-byte head sniff per file deciding its lane ONCE at split time
    (an object-store deployment turns that into one ranged GET per
    file — the same seam as the task-side ranged reads): gzip files
    split on member boundaries, UNCOMPRESSED .warc files split on the
    ``\\r\\nWARC/`` record framing — both fan an oversized shard out
    across tasks. Keying the lane on the sniffed head, not the first
    split's bytes, means a ``.gz`` with a damaged/junk-prefixed head
    still goes down the member-scan lane and recovers every intact
    member. Output rows and schema are identical to ``read_warc`` on
    the same files (tested), with ``bad_records`` counted per SPLIT —
    for exact per-file totals use ``read_warc``'s per-file counter."""
    extract = html_main_text if main_text else html_text
    files = [
        (r["path"], r["length"])
        for r in spark.read.format("binaryFile")
        .load(path)
        .select("path", "length")
        .collect()
    ]

    def is_gzip_lane(p: str) -> bool:
        # head sniff OR extension: a .gz whose first bytes are damaged
        # must still take the member-scan lane (which recovers every
        # intact member past the damage) — the sniff alone would route
        # it to the raw-record lane and lose the whole file
        if p.endswith(".gz"):
            return True
        local = p[5:] if p.startswith("file:") else p
        with open(local, "rb") as f:
            return f.read(2) == b"\x1f\x8b"

    lanes = {p: is_gzip_lane(p) for p, _ in files}
    splits = [
        (p, s, e, lanes[p])
        for p, s, e in _gzip_member_splits(files, split_mb * 1024 * 1024)
    ]
    sdf = spark.createDataFrame(
        splits, "path string, start long, end long, is_gzip boolean"
    ).repartition(max(len(splits), 1))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p, s, e, gz in zip(
                pdf["path"], pdf["start"], pdf["end"], pdf["is_gzip"]
            ):
                kern = _parse_split if gz else _parse_plain_split
                rows.extend(
                    kern(
                        p, int(s), int(e), record_types, min_text_chars, extract
                    )
                )
            yield pd.DataFrame(rows, columns=_WARC_COLUMNS)

    return sdf.mapInPandas(gen, schema=WARC_SCHEMA)


BINARYFILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)


def incremental_crawl(
    spark: SparkSession,
    crawl_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    blocked_domains: list[str] | None = None,
    record_types: tuple[str, ...] = ("response",),
    min_text_chars: int = 1,
    main_text: bool = True,
    max_files_per_batch: int = 64,
    emit_links: bool = False,
) -> None:
    """The STREAMING lane of crawl ingestion: WARC shards land in
    ``crawl_dir`` and each FILE is parsed exactly once (checkpointed
    AvailableNow binaryFile source, the ``incremental_bronze``
    pattern). Per batch: parse records -> extract main text ->
    canonicalize URLs -> drop blocked domains -> write documents to an
    epoch-keyed idempotent parquet sink under ``out_dir`` — a
    foreachBatch replay overwrites its own partition instead of
    appending duplicates.

    Identity: ``doc_id = xxhash64(url_canonical, warc_date)`` — one id
    per FETCH, so a later re-crawl of the same URL lands as its own
    row (ids stay unique corpus-wide) and ``url_hash`` carries the
    per-URL identity. Unchanged re-crawls collapse downstream at
    ``incremental_curation``'s cross-batch CONTENT dedup; keeping the
    latest fetch per URL instead is one window over ``url_hash``.

    The output directory is ``incremental_curation``-shaped input:
    chain the two and new crawl shards flow to curated corpus with
    exactly-once semantics at both hops. Cross-shard DOMAIN CAPS are
    deliberately not incremental (a cap is a corpus-wide order
    statistic) — apply ``domain_caps`` in the periodic batch rebuild.

    ``emit_links=True`` additionally lands each batch's host-level
    link edges (``operators/urls.py:host_edges`` over the same parse
    pass) under ``edges/epoch=N`` in the SAME atomic commit as the
    docs — the incremental producer for the periodic PageRank
    authority rebuild (``operators/graph.py``): union the epoch edge
    sets, ``distinct()``, iterate. Like the domain caps, the rank
    itself is a corpus-wide statistic and stays a batch job.
    """
    from ..operators.urls import blocklist_filter, with_url_parts

    stream = (
        spark.readStream.format("binaryFile")
        .schema(BINARYFILE_SCHEMA)
        .option("pathGlobFilter", "*.warc.gz")
        .option("maxFilesPerTrigger", str(max_files_per_batch))
        .load(crawl_dir)
    )
    gen = _warc_kernel(
        record_types,
        min_text_chars,
        html_main_text if main_text else html_text,
        links=emit_links,
    )

    def land_batch(batch_df: DataFrame, epoch_id: int) -> None:
        pages = batch_df.select("path", "content").mapInPandas(
            gen, schema=WARC_LINKS_SCHEMA if emit_links else WARC_SCHEMA
        )
        docs = with_url_parts(pages).filter(F.col("host").isNotNull())
        if blocked_domains:
            docs = blocklist_filter(docs, blocked_domains)
        out = docs.select(
            F.xxhash64("url_canonical", "warc_date").alias("doc_id"),
            F.xxhash64("url_canonical").alias("url_hash"),
            "text",
            "url_canonical",
            "domain",
            "warc_file",
            "warc_date",
        ).dropDuplicates(["doc_id"])
        # atomic-visibility epoch commit: stage -> rename -> marker,
        # so a crash mid-write never exposes a half-written epoch —
        # and with emit_links, docs and edges become visible TOGETHER
        from .sinks import commit_epoch

        writes = {
            f"docs/epoch={epoch_id}": (
                lambda p: out.write.mode("overwrite").parquet(p)
            )
        }
        if emit_links:
            from ..operators.urls import host_edges

            # edges derive from the BLOCKLIST-FILTERED docs frame (it
            # carries out_links through with_url_parts): a blocked spam
            # domain must not cast authority votes any more than it
            # lands content — though blocked DESTINATIONS still appear
            # as dst nodes (links TO them are real observations)
            edges = host_edges(docs)
            writes[f"edges/epoch={epoch_id}"] = (
                lambda p: edges.write.mode("overwrite").parquet(p)
            )
        commit_epoch(out_dir, epoch_id, writes)

    q = (
        stream.writeStream.foreachBatch(land_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def latest_fetch_per_url(docs: DataFrame) -> DataFrame:
    """Collapse re-crawls: keep the LATEST fetch of each canonical URL
    (window over the URL itself — never the 64-bit hash, whose
    collisions would silently drop every fetch of the losing URL —
    ordered by the PARSED timestamp: WARC dates mix whole-second,
    fractional and offset forms, where string order is not time
    order). The materialization of the docstring note on
    ``incremental_crawl``'s identity contract — run it at batch-
    rebuild time when the corpus should carry one row per page."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("url_canonical").orderBy(
        F.to_timestamp("warc_date").desc(), F.col("doc_id").desc()
    )
    return (
        docs.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
