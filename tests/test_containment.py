"""Asymmetric containment pairs + keep-best near-dedup
(operators/dedup.py:containment_pairs/neardup_keep_best)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spotify_etl_aws_spark.operators.dedup import (
    containment_pairs,
    neardup_keep_best,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the rain "
    "falls gently on the quiet town square every single morning"
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestContainment:
    def test_subset_pair_scores_directionally(self, spark):
        """B embeds A's full text: c(A→B) = 1.0 exactly, c(B→A) < 1,
        and Jaccard sits between them."""
        docs = _docs(
            spark,
            [
                (1, BASE),
                (2, BASE + " and then the market opens with fresh bread"),
                (3, "completely unrelated text about spacecraft telemetry "
                    "systems and orbital mechanics calculations"),
            ],
        )
        out = containment_pairs(docs, threshold=0.7).collect()
        pairs = {(r["doc_a"], r["doc_b"]): r for r in out}
        assert (1, 2) in pairs
        r = pairs[(1, 2)]
        assert r["cont_a_in_b"] == 1.0  # A's shingles all inside B
        assert r["cont_b_in_a"] < 1.0
        assert r["cont_b_in_a"] <= r["jaccard"] + 1e-9 or r["jaccard"] <= 1.0
        assert (1, 3) not in pairs and (2, 3) not in pairs

    def test_jaccard_misses_what_containment_catches(self, spark):
        """The same pair under a Jaccard-0.9 rule would not qualify;
        max-containment 0.9 does — the operator's reason to exist."""
        extra = " ".join(f"w{i}" for i in range(8))
        docs = _docs(spark, [(1, BASE), (2, BASE + " " + extra)])
        out = containment_pairs(docs, threshold=0.9).collect()
        assert len(out) == 1
        r = out[0]
        assert r["cont_a_in_b"] == 1.0
        assert r["jaccard"] < 0.9  # Jaccard alone would have missed it

    def test_threshold_validation(self, spark):
        docs = _docs(spark, [(1, BASE)])
        with pytest.raises(ValueError, match="threshold"):
            containment_pairs(docs, threshold=1.5)


class TestKeepBest:
    def test_best_quality_survives_cluster(self, spark):
        docs = spark.createDataFrame(
            [
                (1, BASE + " one", 0.4),
                (2, BASE + " two", 0.9),
                (3, BASE + " three", 0.7),
                (10, "entirely different text about deep sea creatures "
                     "and the bioluminescent displays they perform", 0.1),
            ],
            "doc_id long, text string, quality double",
        )
        out = neardup_keep_best(docs, "quality", threshold=0.5).collect()
        by_id = {r["doc_id"]: r for r in out}
        # 1-3 cluster together (shared base text) -> best quality (2) kept
        assert by_id[1]["cluster_rep"] == by_id[2]["cluster_rep"] == by_id[3]["cluster_rep"]
        assert by_id[2]["keep"] is True
        assert by_id[1]["keep"] is False and by_id[3]["keep"] is False
        # the singleton keeps itself regardless of its low quality
        assert by_id[10]["keep"] is True
        assert by_id[10]["cluster_rep"] == 10

    def test_tie_breaks_to_smallest_id(self, spark):
        docs = spark.createDataFrame(
            [(5, BASE, 0.5), (6, BASE, 0.5)],
            "doc_id long, text string, quality double",
        )
        out = {r["doc_id"]: r["keep"] for r in
               neardup_keep_best(docs, "quality").collect()}
        assert out == {5: True, 6: False}

    def test_all_rows_returned_once(self, spark):
        docs = spark.createDataFrame(
            [(i, f"{BASE} variant {i}", float(i)) for i in range(6)],
            "doc_id long, text string, quality double",
        )
        out = neardup_keep_best(docs, "quality").collect()
        assert sorted(r["doc_id"] for r in out) == list(range(6))


class TestContainmentJoinPrefix:
    def test_finds_tiny_doc_inside_huge_doc(self, spark):
        """THE motivating case: a short document fully quoted inside a
        much larger one. Jaccard is tiny, so MinHash bands are
        unlikely to collide — the exact join must find it regardless."""
        from spotify_etl_aws_spark.operators.dedup import (
            containment_join_prefix,
        )

        small = "the secret launch happens at dawn on the eastern ridge"
        big_filler = " ".join(f"filler{i} word{i} extra{i}" for i in range(60))
        docs = _docs(
            spark,
            [
                (1, small),
                (2, big_filler + " " + small + " " + big_filler[::-1].lower()),
                (3, "entirely unrelated content about maritime navigation "
                    "routes and the seasonal currents that shape them"),
            ],
        )
        out = containment_join_prefix(docs, threshold=0.9).collect()
        pairs = {(r["doc_a"], r["doc_b"]): r for r in out}
        assert (1, 2) in pairs
        r = pairs[(1, 2)]
        assert r["cont_a_in_b"] == 1.0
        assert r["jaccard"] < 0.1  # LSH-on-Jaccard would likely miss this

    def test_matches_brute_force(self, spark):
        """Completeness: identical pairs to a driver-side brute force
        over all document pairs."""
        import itertools
        import random

        from spotify_etl_aws_spark.operators.dedup import (
            containment_join_prefix,
        )
        from spotify_etl_aws_spark.functions.text import tokens  # noqa: F401

        rng = random.Random(11)
        vocab = [f"w{i}" for i in range(40)]
        rows = []
        for i in range(24):
            k = rng.randint(5, 14)
            rows.append((i, " ".join(rng.sample(vocab, k))))
        # plant subset relations
        rows.append((100, rows[0][1] + " zz1 zz2 zz3 zz4 zz5 zz6 zz7 zz8"))
        rows.append((101, rows[1][1]))
        docs = _docs(spark, rows)
        t = 0.75
        got = sorted(
            (r["doc_a"], r["doc_b"])
            for r in containment_join_prefix(docs, threshold=t).collect()
        )

        def shingles(text, n=3):
            w = text.lower().split()
            return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)}

        sets = {i: shingles(txt) for i, txt in rows}
        want = sorted(
            (a, b)
            for a, b in itertools.combinations(sorted(sets), 2)
            if sets[a] and sets[b]
            and len(sets[a] & sets[b]) / min(len(sets[a]), len(sets[b])) >= t
        )
        assert got == want
        assert (0, 100) in got and (1, 101) in got

    def test_validation(self, spark):
        from spotify_etl_aws_spark.operators.dedup import (
            containment_join_prefix,
        )

        docs = _docs(spark, [(1, BASE)])
        with pytest.raises(ValueError, match="threshold"):
            containment_join_prefix(docs, threshold=0.0)
