"""Deduplication operators over the `documents` table (north-star
extension: training-data pipeline dedup at 100 TB).

Ladder of fidelity/cost:
- exact dedup (d1): md5 over normalized text → hash groupBy. One shuffle on
  a 16-byte key; at 100 TB this is the cheapest and always-first pass.
- n-gram Jaccard near-dup (d2): word-3-gram shingles → inverted index
  (explode) → candidate pairs via shingle co-occurrence → exact Jaccard.
  The self-join happens on the *shingle* key, so cost is Σ |docs per
  shingle|² — bounded by frequent-shingle capping, not |docs|².
- MinHash + LSH (d3): k portable hash functions over shingle hashes →
  band-bucket join (candidates only where a band collides) → verify with
  estimated Jaccard. The scale path: state per doc is k integers
  regardless of length.
- SimHash (d4): 64-bit weighted-bit fingerprint; near-dups = small Hamming
  distance within LSH-ish bucket on the top bits.

All hashes are the portable polynomial hash (functions/text.py) so the
DuckDB oracle recomputes identical values — no engine-specific hashing in
results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_data_warehouse_spark.functions.text import (
    POLY_P,
    poly_hash,
    poly_hash_sql,
    tokenize,
    tokenize_sql,
)
from real_time_data_warehouse_spark.registry import register
from real_time_data_warehouse_spark.tables import Tables


@register(
    "d1_exact_dedup",
    survey="ext-dedup",
    doc="Exact dedup: md5 of lowercased text → keep min doc_id per cluster, "
        "emit cluster size + keeper flag per doc.",
    oracle="""
        SELECT doc_id,
               md5(lower(text)) AS text_hash,
               CAST(COUNT(*) OVER (PARTITION BY md5(lower(text))) AS BIGINT)
                   AS cluster_size,
               CAST(CASE WHEN doc_id = MIN(doc_id) OVER (
                        PARTITION BY md5(lower(text)))
                    THEN 1 ELSE 0 END AS INT) AS is_keeper
        FROM documents
    """,
)
def d1_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    t = Tables(spark, sf_dir)
    hashed = t.documents.withColumn("text_hash", F.md5(F.lower("text")))
    w = Window.partitionBy("text_hash")
    return hashed.select(
        "doc_id",
        "text_hash",
        F.count("*").over(w).alias("cluster_size"),
        F.when(F.col("doc_id") == F.min("doc_id").over(w), 1)
        .otherwise(0)
        .cast("int")
        .alias("is_keeper"),
    )


# Shared shingling: word 3-grams, hashed with the portable polynomial hash.
_SHINGLE_N = 3

_SHINGLES_SQL = f"""
    SELECT doc_id, unnest(shs) AS sh
    FROM (
        SELECT doc_id,
               list_distinct(list_transform(
                   range(1, len(toks) - {_SHINGLE_N} + 2),
                   i -> {poly_hash_sql("array_to_string(toks[i:i+" + str(_SHINGLE_N - 1) + "], ' ')")}
               )) AS shs
        FROM (SELECT doc_id, {tokenize_sql('text')} AS toks FROM documents) base
        WHERE len(toks) >= {_SHINGLE_N}
    ) shingled
"""


def _doc_shingles(t: Tables) -> DataFrame:
    """doc_id → exploded distinct shingle hashes (word 3-grams)."""
    toks = t.documents.select("doc_id", tokenize("text").alias("toks")).where(
        F.size("toks") >= _SHINGLE_N
    )
    # shingle i = tokens[i..i+n-1] joined by space, hashed.
    shingled = toks.select(
        "doc_id",
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size("toks") - _SHINGLE_N),
                lambda i: poly_hash(
                    F.array_join(F.slice("toks", i + 1, _SHINGLE_N), " ")
                ),
            )
        ).alias("shs"),
    )
    return shingled.select("doc_id", F.explode("shs").alias("sh"))


@register(
    "d2_ngram_jaccard_pairs",
    survey="ext-dedup",
    doc="Near-dup pairs by exact Jaccard over word-3-gram shingle sets: "
        "inverted index on shingle hash → co-occurrence counts → "
        "|A∩B| / (|A|+|B|-|A∩B|) ≥ 0.6. Join key is the shingle, so the "
        "pair space is bounded by shingle frequency, not |docs|².",
    oracle=f"""
        WITH sh AS ({_SHINGLES_SQL}),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
            FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        )
        SELECT p.doc_a, p.doc_b,
               CAST(ROUND(CAST(p.inter AS DOUBLE) /
                    (sa.n + sb.n - p.inter), 4) AS DOUBLE) AS jaccard
        FROM pairs p
        JOIN sizes sa ON p.doc_a = sa.doc_id
        JOIN sizes sb ON p.doc_b = sb.doc_id
        WHERE CAST(p.inter AS DOUBLE) / (sa.n + sb.n - p.inter) >= 0.6
    """,
)
def d2_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    sh = _doc_shingles(t)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "sh")
    b = sh.select(F.col("doc_id").alias("doc_b"), "sh")
    pairs = (
        a.join(b, ["sh"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("inter").cast("double") / (
        F.col("na") + F.col("nb") - F.col("inter")
    )
    return (
        pairs.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .where(jac >= 0.6)
        .select("doc_a", "doc_b", F.round(jac, 4).cast("double").alias("jaccard"))
    )
