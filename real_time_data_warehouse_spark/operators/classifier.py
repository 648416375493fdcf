"""In-engine supervised training — a batch perceptron quality model.

Modern pipelines gate pretraining data with a cheap linear quality
classifier (the public fastText-filter / DSIR lineage: score docs with
a linear model trained against a labeled signal, keep the top mass).
This operator demonstrates the TRAINING step itself as a first-class
distributed computation — the same fixed-K iterative shape as g1/t17:
per round one full-scan aggregate producing a bounded driver artifact
(the weight vector), with the unrolled-CTE oracle proving the loop
engine-exact.

Why a perceptron and not logistic regression: perceptron updates are
PURE INTEGER (w += Σ y·x over misclassified rows, margin = w·x), so
Spark ≡ DuckDB to the last unit with no transcendental functions —
logistic GD would hinge on exp() agreeing between libm builds, which
the repo's exactness discipline forbids. (Novikoff's convergence
theorem covers the ONLINE per-sample variant; the batch-sum form used
here — the distributed-friendly one — can cycle on raw features,
which is exactly why x2 is centered, see below. The fixed-K loop is
deterministic either way.)

Features are integer document statistics: bias, token count, CENTERED
char count (char count minus the 200-char operating point — the
integer analog of feature standardization; without it the batch
updates overshoot and cycle at ~70% accuracy, with it training
reaches ~99% on the synthetic corpus), distinct-token count. The
training label is a deterministic length rule (y = +1 iff ≥ 200
chars), so both engines derive it identically; a real deployment
would feed labels from an external rater table — the closed form
keeps the oracle self-contained.

Scale: each round is one map-side margin evaluation + a partial→final
integer aggregate (d+1 sums) over the feature frame — no shuffle of
data rows at all (aggregate-to-driver of a d+1-int artifact, the
IVF-centroid pattern); K rounds scan the checkpointed feature frame K
times. Overflow headroom: |w| ≤ K·Σ|x| and margins ≤ |w|·max|x|·d —
≈ 2^45 at 10^8 docs with these features, far under int64.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_data_warehouse_spark.functions.text import tokenize, tokenize_sql
from real_time_data_warehouse_spark.registry import register
from real_time_data_warehouse_spark.tables import Tables

PERC_ITERS = 10
LABEL_MIN_CHARS = 200
_FEATURES = ("bias", "n_tokens", "chars_centered", "n_distinct")


def perceptron_features(documents: DataFrame) -> DataFrame:
    """(doc_id, y, x0..x3): integer features + the rule label."""
    toks = tokenize("text")
    return documents.select(
        "doc_id",
        F.when(F.length("text") >= LABEL_MIN_CHARS, 1)
        .otherwise(-1)
        .cast("bigint")
        .alias("y"),
        F.lit(1).cast("bigint").alias("x0"),
        F.size(toks).cast("bigint").alias("x1"),
        (F.length("text") - F.lit(LABEL_MIN_CHARS))
        .cast("bigint")
        .alias("x2"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("x3"),
    )


def perceptron_train(
    feats: DataFrame, n_iters: int = PERC_ITERS
) -> tuple[list[int], int]:
    """Batch perceptron → (weights, final training-error count)."""
    feats = feats.localCheckpoint(eager=True)
    d = 4
    w = [0] * d

    def margin(weights: list[int]) -> F.Column:
        m = F.lit(0).cast("bigint")
        for j, wj in enumerate(weights):
            m = m + F.lit(wj) * F.col(f"x{j}")
        return m

    for _ in range(n_iters):
        mis = F.col("y") * margin(w) <= 0
        row = feats.agg(
            *[
                F.sum(
                    F.when(mis, F.col("y") * F.col(f"x{j}")).otherwise(0)
                ).alias(f"u{j}")
                for j in range(d)
            ]
        ).collect()[0]
        w = [w[j] + (row[f"u{j}"] or 0) for j in range(d)]
    errors = feats.where(F.col("y") * margin(w) <= 0).count()
    return w, errors


def _c17_oracle(n_iters: int = PERC_ITERS) -> str:
    tok = tokenize_sql("text")
    head = f"""
        WITH f AS MATERIALIZED (
            SELECT doc_id,
                   CAST(CASE WHEN length(text) >= {LABEL_MIN_CHARS}
                        THEN 1 ELSE -1 END AS BIGINT) AS y,
                   CAST(1 AS BIGINT) AS x0,
                   CAST(len({tok}) AS BIGINT) AS x1,
                   CAST(length(text) - {LABEL_MIN_CHARS} AS BIGINT) AS x2,
                   CAST(len(list_distinct({tok})) AS BIGINT) AS x3
            FROM documents
        ),
        it0 AS MATERIALIZED (
            SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS w1,
                   CAST(0 AS BIGINT) AS w2, CAST(0 AS BIGINT) AS w3
        )"""
    mg = "(w.w0*f.x0 + w.w1*f.x1 + w.w2*f.x2 + w.w3*f.x3)"
    steps = []
    for k in range(1, n_iters + 1):
        ups = ", ".join(
            f"w.w{j} + COALESCE(SUM(CASE WHEN f.y * {mg} <= 0 "
            f"THEN f.y * f.x{j} ELSE 0 END), 0) AS w{j}"
            for j in range(4)
        )
        steps.append(f"""
        it{k} AS MATERIALIZED (
            SELECT {ups}
            FROM it{k - 1} w LEFT JOIN f ON TRUE
            GROUP BY w.w0, w.w1, w.w2, w.w3
        )"""
        )
    feat_rows = "\n            UNION ALL ".join(
        f"SELECT '{name}' AS feature, CAST(w{j} AS BIGINT) AS weight"
        f" FROM it{n_iters}"
        for j, name in enumerate(_FEATURES)
    )
    return head + "," + ",".join(steps) + f"""
        {feat_rows}
        UNION ALL
        SELECT 'train_errors' AS feature,
               CAST(COALESCE((SELECT COUNT(*) FROM f CROSS JOIN
                    it{n_iters} w WHERE f.y * {mg} <= 0), 0) AS BIGINT)
                   AS weight
    """


@register(
    "c17_perceptron_quality",
    survey="ext-curation,ext-text",
    doc=f"In-engine training of a linear quality classifier: batch "
        f"perceptron, {PERC_ITERS} fixed rounds over integer document "
        "features (bias, tokens, chars, distinct tokens) against a "
        "deterministic length label — the fastText/DSIR quality-filter "
        "training step as a distributed computation. Pure-integer "
        "updates (no transcendentals), so weights and the final "
        "training-error count are engine-exact; each round is one "
        "full-scan aggregate to a d+1-int driver artifact.",
    oracle=_c17_oracle(),
)
def c17_perceptron_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    w, errors = perceptron_train(perceptron_features(t.documents))
    rows = [(name, w[j]) for j, name in enumerate(_FEATURES)]
    rows.append(("train_errors", errors))
    return spark.createDataFrame(rows, "feature string, weight bigint")
