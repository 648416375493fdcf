"""d2c prefix filtering: losslessness + the candidate-space bound that
justifies it.

The registry fixture is near-uniform (no hot shingles), so the pruning
claim is proven here on a deliberately skewed corpus: every doc shares
one hot 3-gram (the f(f−1)/2 quadratic head d2's full index pays for),
while similarity is carried by rare tails.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_data_warehouse_spark.operators.dedup import (
    prefix_candidates,
    prefix_jaccard_pairs,
    shingle_sets_for,
    _explode_shingles,
)

N_DOCS = 120


@pytest.fixture(scope="module")
def skewed_docs(spark):
    # "alpha beta gamma" is in every doc → one 120-doc bucket in a full
    # inverted index (7140 candidate pairs from that shingle alone).
    # Docs i and i+1 for even i share their rare tail → the true pairs.
    rows = []
    for i in range(N_DOCS):
        tail = " ".join(f"tok{(i // 2):03d}x{j}" for j in range(6))
        rows.append((i, f"alpha beta gamma {tail}"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def full_index_candidates(sets):
    sh = _explode_shingles(sets, F.size("shs").alias("n"))
    a = sh.select("sh", F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    b = sh.select("sh", F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    return (
        a.join(b, "sh")
        .where(F.col("doc_a") < F.col("doc_b"))
        .where(F.least("na", "nb") * 5 >= F.greatest("na", "nb") * 3)
        .dropDuplicates(["doc_a", "doc_b"])
    )


def test_prefix_filter_cuts_the_hot_shingle_head(spark, skewed_docs):
    sets = shingle_sets_for(skewed_docs, hashed=False).localCheckpoint(
        eager=True
    )
    full = full_index_candidates(sets).count()
    pruned = prefix_candidates(sets).count()
    # the hot shingle alone makes C(120,2) = 7140 full-index candidates;
    # frequency-ordered prefixes push it out of every doc's index
    assert full >= 7000
    assert pruned < full / 10, (full, pruned)


def test_prefix_filter_is_lossless(spark, skewed_docs):
    # result must equal the exact threshold set: each even/odd tail pair
    # shares 6+2 of its ~11 shingles... compute truth via brute force
    sets = shingle_sets_for(skewed_docs, hashed=False).collect()
    by_id = {r["doc_id"]: set(r["shs"]) for r in sets}
    truth = set()
    for a in by_id:
        for b in by_id:
            if a < b:
                inter = len(by_id[a] & by_id[b])
                union = len(by_id[a] | by_id[b])
                if inter / union >= 0.6:
                    truth.add((a, b))
    got = {
        (r["doc_a"], r["doc_b"])
        for r in prefix_jaccard_pairs(skewed_docs).collect()
    }
    assert truth, "fixture must contain qualifying pairs"
    assert got == truth


def test_bucket_cap_is_lossless_and_bounds_arrays(spark, skewed_docs):
    """A prefix-region shingle hotter than the bucket cap must flow
    through the skew-safe self-join path and still yield the IDENTICAL
    candidate set (d2c's losslessness contract with d2's oracle)."""
    sets = shingle_sets_for(skewed_docs, hashed=False).localCheckpoint(
        eager=True
    )
    uncapped = {
        (r["doc_a"], r["doc_b"])
        for r in prefix_candidates(sets, bucket_cap=1 << 30).collect()
    }
    # cap=3 forces every even the rare-tail buckets (size 2) through the
    # array path while anything bigger self-joins
    capped = {
        (r["doc_a"], r["doc_b"])
        for r in prefix_candidates(sets, bucket_cap=3).collect()
    }
    assert capped == uncapped
    # and with cap=0 EVERY bucket self-joins: still the same candidates
    all_join = {
        (r["doc_a"], r["doc_b"])
        for r in prefix_candidates(sets, bucket_cap=0).collect()
    }
    assert all_join == uncapped


def test_bucket_cap_default_matches_registry_query(spark, skewed_docs):
    """The default-capped generator feeds prefix_jaccard_pairs — verify
    the end-to-end pairs on the skewed corpus stay exact (same truth as
    test_prefix_filter_is_lossless, now under the capped generator)."""
    sets = shingle_sets_for(skewed_docs, hashed=False).collect()
    by_id = {r["doc_id"]: set(r["shs"]) for r in sets}
    truth = set()
    for a in by_id:
        for b in by_id:
            if a < b:
                inter = len(by_id[a] & by_id[b])
                union = len(by_id[a] | by_id[b])
                if inter / union >= 0.6:
                    truth.add((a, b))
    got = {
        (r["doc_a"], r["doc_b"])
        for r in prefix_jaccard_pairs(skewed_docs).collect()
    }
    assert got == truth
