"""Similarity search over the `embeddings` table (north-star extension).

Brute-force cosine top-k as the correctness baseline; an LSH-bucketed
variant (random-hyperplane signatures, added in streaming with the dedup
family) as the scale path. Dot products are pure Catalyst array expressions
(``zip_with`` + ``aggregate``) — JVM-side, no Python in the loop.

Numeric discipline: embeddings are float32; both engines cast to DOUBLE
before the reduction so the element values agree exactly, and the output
similarity is rounded to 6 decimals to absorb reduction-order ulps.

Scale notes: brute force is |Q|×|N| — fine when the query set is small and
broadcast; for all-pairs at 100 TB use the LSH/IVF bucket join (candidates
share a bucket key → shuffle on bucket, never the cross product).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_data_warehouse_spark.registry import register
from real_time_data_warehouse_spark.tables import Tables

_N_QUERIES = 10
_TOP_K = 5

# Random-hyperplane LSH: fixed deterministic planes (seed=7) shared by the
# Spark plan and the oracle SQL as literals.
_LSH_PLANES = 6
_EMB_DIM = 64


def _hyperplanes() -> list[list[float]]:
    import numpy as np

    rng = np.random.default_rng(7)
    return [
        [round(float(x), 6) for x in rng.standard_normal(_EMB_DIM)]
        for _ in range(_LSH_PLANES)
    ]


def _bucket_col() -> Column:
    """Hyperplane-LSH bucket id as a Column over `v` (array<double>) —
    shared by s2 and d5 so both queries bucket identically."""
    planes = _hyperplanes()
    return sum(
        F.when(
            dot(F.col("v"), F.array(*[F.lit(x) for x in planes[j]])) > 0,
            F.lit(1 << j),
        ).otherwise(0)
        for j in range(_LSH_PLANES)
    ).cast("int")


def _bucket_sql() -> str:
    """DuckDB twin of _bucket_col over `v` — same plane literals."""
    planes = _hyperplanes()
    plane_lits = ["[" + ", ".join(f"{x}" for x in p) + "]::DOUBLE[]" for p in planes]
    return " + ".join(
        f"(CASE WHEN list_inner_product(v, {plane_lits[j]}) > 0 "
        f"THEN {1 << j} ELSE 0 END)"
        for j in range(_LSH_PLANES)
    )


def _as_double(col: str) -> Column:
    return F.col(col).cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


_ORACLE_COSINE = """
    list_inner_product(qv, nv) /
        (sqrt(list_inner_product(qv, qv)) * sqrt(list_inner_product(nv, nv)))
"""


@register(
    "s1_cosine_topk",
    survey="ext-similarity",
    doc=f"Brute-force cosine top-{_TOP_K}: for each query vector "
        f"(vec_id < {_N_QUERIES}), the {_TOP_K} nearest other vectors. "
        "Query side broadcast; ranking via row_number over the similarity "
        "(deterministic tiebreak on neighbor id).",
    oracle=f"""
        WITH e AS (SELECT vec_id,
                          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                   FROM embeddings),
        scored AS (
            SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
                   list_inner_product(q.v, n.v) /
                       (sqrt(list_inner_product(q.v, q.v)) *
                        sqrt(list_inner_product(n.v, n.v))) AS sim
            FROM e q JOIN e n ON n.vec_id <> q.vec_id
            WHERE q.vec_id < {_N_QUERIES}
        )
        SELECT query_id, neighbor_id, CAST(rnk AS INT) AS rnk,
               CAST(ROUND(sim, 6) AS DOUBLE) AS sim
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY query_id
                ORDER BY sim DESC, neighbor_id) AS rnk
            FROM scored
        ) WHERE rnk <= {_TOP_K}
    """,
)
def s1_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    t = Tables(spark, sf_dir)
    emb = t.embeddings.select("vec_id", _as_double("embedding").alias("v"))
    q = emb.where(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    n = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("nv"))
    scored = (
        F.broadcast(q)
        .crossJoin(n)
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("nv")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= _TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rnk").cast("int").alias("rnk"),
            F.round("sim", 6).cast("double").alias("sim"),
        )
    )


def _s2_oracle() -> str:
    bucket_expr = _bucket_sql()
    return f"""
        WITH e AS (SELECT vec_id,
                          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                   FROM embeddings),
        bucketed AS (SELECT vec_id, v, CAST({bucket_expr} AS INT) AS bucket FROM e),
        scored AS (
            SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
                   list_inner_product(q.v, n.v) /
                       (sqrt(list_inner_product(q.v, q.v)) *
                        sqrt(list_inner_product(n.v, n.v))) AS sim
            FROM bucketed q JOIN bucketed n
              ON q.bucket = n.bucket AND n.vec_id <> q.vec_id
            WHERE q.vec_id < {_N_QUERIES}
        )
        SELECT query_id, neighbor_id, CAST(rnk AS INT) AS rnk,
               CAST(ROUND(sim, 6) AS DOUBLE) AS sim
        FROM (SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rnk
              FROM scored)
        WHERE rnk <= {_TOP_K}
    """


@register(
    "s2_lsh_ann_topk",
    survey="ext-similarity",
    doc=f"ANN top-{_TOP_K} via random-hyperplane LSH ({_LSH_PLANES} planes "
        f"→ {1 << _LSH_PLANES} buckets): sign-of-dot-product signature, "
        "candidates only within the same bucket — the 100 TB path (shuffle "
        "on the bucket key, never a cross product). Approximate by design; "
        "the oracle replicates the same bucketing, so results compare "
        "exactly.",
    oracle=None,  # set below after definition to keep the literal close by
)
def s2_lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    t = Tables(spark, sf_dir)
    emb = t.embeddings.select("vec_id", _as_double("embedding").alias("v"))
    bucketed = emb.withColumn("bucket", _bucket_col())
    q = bucketed.where(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("bucket").alias("qb"),
    )
    n = bucketed.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("nv"),
        F.col("bucket").alias("nb"),
    )
    scored = (
        q.join(n, (F.col("qb") == F.col("nb")) & (F.col("neighbor_id") != F.col("query_id")))
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("nv")).alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= _TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rnk").cast("int").alias("rnk"),
            F.round("sim", 6).cast("double").alias("sim"),
        )
    )


# attach the generated oracle (kept out of the decorator for readability)
from real_time_data_warehouse_spark.registry import QUERY_REGISTRY as _QR  # noqa: E402
import dataclasses as _dc  # noqa: E402

_QR["s2_lsh_ann_topk"] = _dc.replace(_QR["s2_lsh_ann_topk"], oracle=_s2_oracle())


def _d5_oracle() -> str:
    bucket_expr = _bucket_sql()
    return f"""
        WITH e AS (SELECT vec_id,
                          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                   FROM embeddings),
        bucketed AS (SELECT vec_id, v, CAST({bucket_expr} AS INT) AS bucket FROM e)
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               CAST(ROUND(list_inner_product(a.v, b.v) /
                    (sqrt(list_inner_product(a.v, a.v)) *
                     sqrt(list_inner_product(b.v, b.v))), 6) AS DOUBLE) AS cos_sim
        FROM bucketed a JOIN bucketed b
          ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        WHERE list_inner_product(a.v, b.v) /
                  (sqrt(list_inner_product(a.v, a.v)) *
                   sqrt(list_inner_product(b.v, b.v))) >= 0.35
    """


@register(
    "d5_embedding_neardup",
    survey="ext-dedup,ext-similarity",
    doc="Embedding-cosine near-dup detection (the dedup-ladder rung above "
        "lexical methods): candidate pairs from the hyperplane-LSH bucket, "
        "kept at cosine ≥ 0.35 (≈99.9th pct of the random-embedding similarity distribution — chosen so the fixture yields a non-trivial pair set). All-pairs work is bounded by bucket size — "
        "the 100 TB contract: shuffle on bucket, never |V|² pairs.",
    oracle=None,  # attached below (generated from the shared hyperplanes)
)
def d5_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    emb = t.embeddings.select("vec_id", _as_double("embedding").alias("v"))
    bucketed = emb.withColumn("bucket", _bucket_col())
    a = bucketed.select(
        F.col("vec_id").alias("vec_a"), F.col("v").alias("va"), "bucket"
    )
    b = bucketed.select(
        F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"), "bucket"
    )
    sim = cosine(F.col("va"), F.col("vb"))
    return (
        a.join(b, "bucket")
        .where(F.col("vec_a") < F.col("vec_b"))
        .where(sim >= 0.35)
        .select(
            "vec_a", "vec_b", F.round(sim, 6).cast("double").alias("cos_sim")
        )
    )


_QR["d5_embedding_neardup"] = _dc.replace(
    _QR["d5_embedding_neardup"], oracle=_d5_oracle()
)


# --- IVF (inverted-file) ANN -----------------------------------------------
# Deterministic coarse quantizer: the first _IVF_CELLS vectors (vec_id <
# _IVF_CELLS) act as centroids — portable to the oracle without k-means.
_IVF_CELLS = 16
_IVF_PROBES = 2


def _ivf_oracle() -> str:
    return f"""
        WITH e AS (SELECT vec_id,
                          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                   FROM embeddings),
        cents AS (SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id < {_IVF_CELLS}),
        assign AS (
            SELECT vec_id, v, cell FROM (
                SELECT x.vec_id, x.v, c.cell,
                       ROW_NUMBER() OVER (PARTITION BY x.vec_id
                           ORDER BY list_inner_product(x.v, c.cv) /
                                    (sqrt(list_inner_product(x.v, x.v)) *
                                     sqrt(list_inner_product(c.cv, c.cv))) DESC,
                                    c.cell) AS rn
                FROM e x, cents c)
            WHERE rn = 1
        ),
        probes AS (
            SELECT vec_id AS query_id, v AS qv, cell FROM (
                SELECT x.vec_id, x.v, c.cell,
                       ROW_NUMBER() OVER (PARTITION BY x.vec_id
                           ORDER BY list_inner_product(x.v, c.cv) /
                                    (sqrt(list_inner_product(x.v, x.v)) *
                                     sqrt(list_inner_product(c.cv, c.cv))) DESC,
                                    c.cell) AS rn
                FROM e x, cents c
                WHERE x.vec_id < {_N_QUERIES})
            WHERE rn <= {_IVF_PROBES}
        )
        SELECT query_id, neighbor_id, CAST(rnk AS INT) AS rnk,
               CAST(ROUND(sim, 6) AS DOUBLE) AS sim
        FROM (
            SELECT p.query_id, a.vec_id AS neighbor_id,
                   list_inner_product(p.qv, a.v) /
                       (sqrt(list_inner_product(p.qv, p.qv)) *
                        sqrt(list_inner_product(a.v, a.v))) AS sim,
                   ROW_NUMBER() OVER (PARTITION BY p.query_id
                       ORDER BY list_inner_product(p.qv, a.v) /
                                (sqrt(list_inner_product(p.qv, p.qv)) *
                                 sqrt(list_inner_product(a.v, a.v))) DESC,
                                a.vec_id) AS rnk
            FROM probes p JOIN assign a
              ON p.cell = a.cell AND a.vec_id <> p.query_id)
        WHERE rnk <= {_TOP_K}
    """


@register(
    "s3_ivf_ann_topk",
    survey="ext-similarity",
    doc=f"IVF ANN top-{_TOP_K}: {_IVF_CELLS}-cell inverted file "
        f"(deterministic centroids), queries probe the {_IVF_PROBES} "
        "nearest cells. The centroid assignment is a broadcast nested "
        "cross over 16 rows (map-side); search shuffles only on the cell "
        "key — the IVF counterpart of the s2 hyperplane path.",
    oracle=None,  # attached below
)
def s3_ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    t = Tables(spark, sf_dir)
    emb = t.embeddings.select("vec_id", _as_double("embedding").alias("v"))
    cents = emb.where(F.col("vec_id") < _IVF_CELLS).select(
        F.col("vec_id").alias("cell"), F.col("v").alias("cv")
    )
    scored_cells = (
        emb.crossJoin(F.broadcast(cents))
        .select(
            "vec_id", "v", "cell",
            cosine(F.col("v"), F.col("cv")).alias("csim"),
        )
    )
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.col("csim").desc(), F.col("cell")
    )
    ranked = scored_cells.withColumn("rn", F.row_number().over(w_assign))
    assign = ranked.where(F.col("rn") == 1).select("vec_id", "v", "cell")
    probes = (
        ranked.where((F.col("vec_id") < _N_QUERIES) & (F.col("rn") <= _IVF_PROBES))
        .select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), "cell")
    )
    cand = probes.join(
        assign.select(
            F.col("vec_id").alias("neighbor_id"), F.col("v").alias("nv"), "cell"
        ),
        "cell",
    ).where(F.col("neighbor_id") != F.col("query_id"))
    scored = cand.select(
        "query_id", "neighbor_id", cosine(F.col("qv"), F.col("nv")).alias("sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= _TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rnk").cast("int").alias("rnk"),
            F.round("sim", 6).cast("double").alias("sim"),
        )
    )


_QR["s3_ivf_ann_topk"] = _dc.replace(_QR["s3_ivf_ann_topk"], oracle=_ivf_oracle())
