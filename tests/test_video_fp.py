"""Video clip near-dup (operators/video_fp.py): frame-hash kernel
parity through a REAL animated-GIF round trip, clip-join brute-force
parity, the temporal-alignment contract (shifted clips do NOT match),
and the pigeonhole guard."""

from __future__ import annotations

import itertools
import random

import numpy as np
import pytest

from spotify_etl_aws_spark.operators.gif import encode_gif_animation
from spotify_etl_aws_spark.operators.video_fp import clip_near_pairs, frame_hashes

LEVELS = np.array([0, 51, 102, 153, 204, 255], dtype=np.uint8)


def _clip_from_level_grids(grids) -> bytes:
    """grids: list of (8, 8) arrays of palette LEVEL indices 0..5 ->
    animated GIF of 32x32 frames (web-safe values survive quantization
    exactly)."""
    frames = []
    for g in grids:
        cells = LEVELS[np.asarray(g)]
        px = np.repeat(np.repeat(cells, 4, 0), 4, 1)
        frames.append(np.repeat(px[:, :, None], 3, 2).tobytes())
    return encode_gif_animation(frames, 32, 32)


def _ref_hash(grid) -> int:
    cells = LEVELS[np.asarray(grid)].astype(np.int64)
    bits = cells[:, :-1] > cells[:, 1:]
    w = 1 << np.arange(56, dtype=np.uint64).reshape(8, 7)
    return int((bits.astype(np.uint64) * w).sum())


def _rand_grid(rng):
    return [[rng.randrange(6) for _ in range(8)] for _ in range(8)]


def test_frame_hashes_round_trip(spark):
    rng = random.Random(7)
    rows, expect = [], {}
    for i in range(8):
        grids = [_rand_grid(rng) for _ in range(4)]
        rows.append((i, bytearray(_clip_from_level_grids(grids))))
        for f, g in enumerate(grids):
            expect[(i, f)] = _ref_hash(g)
    df = spark.createDataFrame(rows, "doc_id long, media binary")
    got = {
        (r.doc_id, r.frame_idx): r.fhash for r in frame_hashes(df).collect()
    }
    assert got == expect


def _brute_clip_pairs(clips, d, t):
    out = {}
    for a, b in itertools.combinations(sorted(clips), 2):
        c = sum(
            1
            for fa, fb in zip(clips[a], clips[b])
            if bin(fa ^ fb).count("1") <= d
        )
        if c >= t:
            out[(a, b)] = c
    return out


def test_clip_join_matches_brute_force(spark):
    rng = random.Random(11)
    clips = {}
    for i in range(40):
        fam = i % 7
        fam_rng = random.Random(500 + fam)
        hs = [fam_rng.getrandbits(56) for _ in range(5)]
        # perturb: flip a few bits in some frames, scramble others
        hs = [
            h ^ sum(1 << rng.randrange(56) for _ in range(rng.randrange(3)))
            if rng.random() < 0.7
            else rng.getrandbits(56)
            for h in hs
        ]
        clips[i] = hs
    rows = [
        (i, f, h) for i, hs in clips.items() for f, h in enumerate(hs)
    ]
    df = spark.createDataFrame(rows, "doc_id long, frame_idx long, fhash long")
    for t in (1, 3, 5):
        got = {
            (r.id_a, r.id_b): r.matching_frames
            for r in clip_near_pairs(
                df, frame_distance=4, min_frames=t
            ).collect()
        }
        assert got == _brute_clip_pairs(clips, 4, t), f"t={t}"


def test_temporal_alignment_is_strict(spark):
    # clip B = clip A shifted by one frame: pairwise aligned frames are
    # unrelated randoms -> zero matches even though the SETS of frame
    # hashes are nearly identical
    rng = random.Random(13)
    frames = [rng.getrandbits(56) for _ in range(7)]
    a = frames[:6]
    b = frames[1:]
    rows = [(0, f, h) for f, h in enumerate(a)] + [
        (1, f, h) for f, h in enumerate(b)
    ]
    df = spark.createDataFrame(rows, "doc_id long, frame_idx long, fhash long")
    assert clip_near_pairs(df, min_frames=1).count() == 0


def test_clip_join_rejects_unprovable_threshold(spark):
    df = spark.createDataFrame(
        [(0, 0, 0)], "doc_id long, frame_idx long, fhash long"
    )
    with pytest.raises(ValueError, match="pigeonhole"):
        clip_near_pairs(df, frame_distance=8, bands=4, probe_radius=1)


def test_plan_has_no_cartesian(spark):
    df = spark.createDataFrame(
        [(i, f, i * 31 + f) for i in range(6) for f in range(3)],
        "doc_id long, frame_idx long, fhash long",
    )
    plan = (
        clip_near_pairs(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_clip_join_probe_radius_zero_matches_brute_force(spark):
    # the r=0 branch takes the cheap id_a < id_b path (no orientation
    # normalization) — parity against brute force pins it emits each
    # pair exactly once with the same counts
    rng = random.Random(17)
    clips = {}
    for i in range(30):
        fam_rng = random.Random(900 + i % 5)
        hs = [fam_rng.getrandbits(56) for _ in range(5)]
        hs = [
            h ^ sum(1 << rng.randrange(56) for _ in range(rng.randrange(2)))
            if rng.random() < 0.7
            else rng.getrandbits(56)
            for h in hs
        ]
        clips[i] = hs
    rows = [(i, f, h) for i, hs in clips.items() for f, h in enumerate(hs)]
    df = spark.createDataFrame(rows, "doc_id long, frame_idx long, fhash long")
    got = {
        (r.id_a, r.id_b): r.matching_frames
        for r in clip_near_pairs(
            df, frame_distance=3, min_frames=2, probe_radius=0
        ).collect()
    }
    assert got == _brute_clip_pairs(clips, 3, 2)


def test_frame_hashes_preserves_string_ids(spark):
    rng = random.Random(23)
    grids = [_rand_grid(rng) for _ in range(3)]
    blob = bytearray(_clip_from_level_grids(grids))
    df = spark.createDataFrame([("clip/x", blob)], "doc_id string, media binary")
    out = frame_hashes(df)
    assert dict(out.dtypes)["doc_id"] == "string"
    got = {r.frame_idx: r.fhash for r in out.collect()}
    assert got == {f: _ref_hash(g) for f, g in enumerate(grids)}


def _adjacent_distinct_grid(rng):
    g = []
    for _ in range(8):
        row, prev = [], None
        for _ in range(8):
            v = rng.randrange(6)
            while v == prev:
                v = rng.randrange(6)
            row.append(v)
            prev = v
        g.append(row)
    return g


def test_container_parity_gif_vs_avi_mjpeg(spark):
    """Round-9 verdict item 2: the SAME frame content muxed as an
    animated GIF and as RIFF/AVI Motion-JPEG must fingerprint to
    bit-identical frame hashes and hence identical near-dup pairs —
    the container re-mux scenario video dedup exists for. Grids keep
    adjacent cells distinct (>= 51 luminance margin) so JPEG q90
    round-trip error cannot flip a gradient sign."""
    from spotify_etl_aws_spark.operators.jpeg import encode_jpeg
    from spotify_etl_aws_spark.operators.video import encode_avi_mjpeg

    rng = random.Random(37)
    # 4 families x 3 members; member m scrambles its first m frames,
    # so aligned matching-frame counts are 5 - max(m_a, m_b)
    clips = {}
    for fam in range(4):
        fam_rng = random.Random(700 + fam)
        base = [_adjacent_distinct_grid(fam_rng) for _ in range(5)]
        for m in range(3):
            grids = [
                _adjacent_distinct_grid(rng) if f < m else base[f]
                for f in range(5)
            ]
            clips[fam * 3 + m] = grids
    gif_rows, avi_rows = [], []
    for cid, grids in clips.items():
        frames = [
            np.repeat(
                np.repeat(LEVELS[np.asarray(g)], 4, 0), 4, 1
            )[:, :, None].repeat(3, 2).tobytes()
            for g in grids
        ]
        gif_rows.append((cid, bytearray(encode_gif_animation(frames, 32, 32))))
        avi_rows.append(
            (
                cid,
                bytearray(
                    encode_avi_mjpeg(
                        [encode_jpeg(32, 32, f, quality=90) for f in frames],
                        10,
                        32,
                        32,
                    )
                ),
            )
        )
    out = {}
    for tag, rows in (("gif", gif_rows), ("avi", avi_rows)):
        df = spark.createDataFrame(rows, "doc_id long, media binary")
        fh = frame_hashes(df).cache()
        hashes = {
            (r.doc_id, r.frame_idx): r.fhash for r in fh.collect()
        }
        pairs = {
            (r.id_a, r.id_b): r.matching_frames
            for r in clip_near_pairs(
                fh, frame_distance=4, min_frames=3
            ).collect()
        }
        fh.unpersist()
        out[tag] = (hashes, pairs)
    assert out["gif"][0] == out["avi"][0]  # bit-identical frame hashes
    assert out["gif"][1] == out["avi"][1]  # identical near-dup pairs
    # and the pairs are the planted family structure: members 0-1 share
    # 4 aligned frames, 0-2 and 1-2 share 3 -> all >= min_frames=3
    expect = {}
    for fam in range(4):
        ids = [fam * 3 + m for m in range(3)]
        expect[(ids[0], ids[1])] = 4
        expect[(ids[0], ids[2])] = 3
        expect[(ids[1], ids[2])] = 3
    assert out["gif"][1] == expect
