"""DSIR importance weights — target-vs-corpus bigram-LM log-ratio.

Data Selection via Importance Resampling (Xie et al. 2023, public):
score every document by log p_target(doc) − log p_corpus(doc) under
cheap n-gram LMs, then resample the corpus proportionally to lift the
target-domain distribution. This operator computes the per-document
importance weight — the score c12's quality-weighted sampler would
consume — with the TARGET domain defined as the English slice
(lang = 'en'), a self-contained stand-in for "the domain I want more
of" that a deployment would replace with any doc predicate or an
external exemplar table.

Model: two add-one-smoothed bigram LMs (t16's model family): one
trained on the full corpus, one on the target slice. Per distinct
bigram, each model's NLL is quantized ONCE to integer micro-nats
(floor(ln(num/den)·1e6 + 0.5) — the t9/t16 lattice), so the
per-document fold is a tf-weighted INTEGER sum of (nll_corpus −
nll_target) differences: associative, partitioning-independent,
engine-exact; one final double division. Out-of-target bigrams score
against the smoothing floor ln((cu_t + V_t)/1) with cu_t = 0 for
unseen left-contexts — the LEFT JOINs below, engine-mirrored. If the
target slice is EMPTY (V_t = 0, planted-test territory), the target
model is undefined and every logratio is NULL rather than a fake
ln(0) — both engines gate on V_t > 0.

Scale: identical to t16 — tokens explode map-side and collapse to
per-(doc, bigram) tf before any shuffle; the model tables shuffle
keyed by gram; the target model adds one filtered re-aggregation of
the SAME tf table (no second corpus scan). Positive scores mean
"looks more like the target than like the average corpus" — the
resampling keep-probability is monotone in this column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_data_warehouse_spark.functions.text import tokenize, tokenize_sql
from real_time_data_warehouse_spark.registry import register
from real_time_data_warehouse_spark.tables import Tables

_Q = 1_000_000  # micro-nat lattice (t9/t16 discipline)
TARGET_LANG = "en"


def dsir_logratio_frame(
    documents: DataFrame, target_pred: F.Column
) -> DataFrame:
    """(doc_id, n_bigrams, logratio) for any (doc_id, text) frame and
    target predicate column. logratio = mean over doc bigrams of
    (nll_corpus − nll_target) in nats; NULL for bigram-free docs and
    for an empty target slice."""
    toks = tokenize("text")
    # token array projected ONCE, gram lambda reads the column — the
    # t16 lesson: lambdas defeat CSE, an inline tokenize re-runs the
    # split per gram element (O(len²)/doc); the explode boundary keeps
    # CollapseProject from re-inlining the projection
    tcol = F.col("toks")
    # every token emits one row: token i as w1 with its successor as w2,
    # the LAST token with w2 = NULL. The null-w2 tail rows make the
    # vocabulary derivable from the tf table itself (distinct w1 ==
    # distinct tokens — every token of every doc appears as a w1 exactly
    # once per position), which drops the separate full corpus
    # re-tokenize + explode pass the vocab count used to pay (guide
    # §1.2: fewer passes). They are bigram-inert everywhere else: the
    # model aggregation filters them and the scoring equi-join on w2
    # never matches NULL.
    grams = F.when(
        F.size(tcol) >= 1,
        F.transform(
            F.sequence(F.lit(0), F.size(tcol) - 1),
            lambda i: F.struct(
                F.element_at(tcol, i + 1).alias("w1"),
                F.when(
                    i < F.size(tcol) - 1, F.element_at(tcol, i + 2)
                ).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    base = (
        documents.select(
            "doc_id", target_pred.alias("is_t"), toks.alias("toks")
        )
        .select("doc_id", "is_t", F.explode(grams).alias("g"))
        .select(
            "doc_id",
            "is_t",
            F.col("g.w1").alias("w1"),
            F.col("g.w2").alias("w2"),
        )
    )
    # per-(doc, bigram) tf — feeds corpus model, target model, the
    # vocabulary counts AND the scoring fold; one materialization (t16
    # discipline)
    tf = (
        base.groupBy("doc_id", "is_t", "w1", "w2")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=True)
    )
    # corpus AND target model counts from ONE aggregation pass over tf
    # (guide §2.4 — previously bg_t/hist_t re-aggregated the same table
    # and joined back with two LEFT JOINs): the conditional sum is NULL
    # exactly where the old LEFT JOIN produced NULL (sum over an
    # all-NULL group), so the coalesce sites below see identical inputs.
    bg = tf.where(F.col("w2").isNotNull()).groupBy("w1", "w2").agg(
        F.sum("tf").alias("cb_c"),
        F.sum(F.when(F.col("is_t"), F.col("tf"))).alias("cb_t"),
    )
    hist = bg.groupBy("w1").agg(
        F.sum("cb_c").alias("cu_c"), F.sum("cb_t").alias("cu_t")
    )
    # both vocabulary sizes from the tf table (see the grams note): the
    # same values as the oracle's two unnest subqueries
    vocabs = tf.agg(
        F.countDistinct("w1").alias("v_c"),
        F.countDistinct(F.when(F.col("is_t"), F.col("w1")))
        .cast("bigint")
        .alias("v_t"),
    )

    def nll(cu: F.Column, cb: F.Column, v: F.Column) -> F.Column:
        return F.floor(
            F.log((cu + v).cast("double") / (cb + F.lit(1)).cast("double"))
            * _Q
            + F.lit(0.5)
        ).cast("bigint")

    nlls = (
        bg.join(hist, "w1")
        .crossJoin(F.broadcast(vocabs))  # 1-row (v_c, v_t) frame
        .select(
            "w1",
            "w2",
            nll(F.col("cu_c"), F.col("cb_c"), F.col("v_c")).alias("nll_c"),
            F.when(
                F.col("v_t") > 0,
                nll(
                    F.coalesce("cu_t", F.lit(0)),
                    F.coalesce("cb_t", F.lit(0)),
                    F.col("v_t"),
                ),
            ).alias("nll_t"),
        )
    )
    scored = (
        tf.join(nlls, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("bigint").alias("n_bigrams"),
            (
                F.sum(F.col("tf") * (F.col("nll_c") - F.col("nll_t")))
                .cast("double")
                / F.sum("tf")
                / _Q
            )
            .cast("double")
            .alias("logratio"),
        )
    )
    return (
        documents.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("bigint").alias("n_bigrams"),
            F.col("logratio").cast("double").alias("logratio"),
        )
    )


def _c19_oracle() -> str:
    tok = tokenize_sql("text")
    return f"""
        WITH toked AS (
            SELECT doc_id, (lang = '{TARGET_LANG}') AS is_t, {tok} AS toks
            FROM documents
        ),
        grams AS (
            SELECT doc_id, is_t, g.w1 AS w1, g.w2 AS w2
            FROM (
                SELECT doc_id, is_t,
                       unnest(CASE WHEN len(toks) >= 2 THEN
                           list_transform(range(1, len(toks)),
                               i -> struct_pack(w1 := toks[i],
                                                w2 := toks[i + 1]))
                           ELSE [] END) AS g
                FROM toked
            )
        ),
        tf AS MATERIALIZED (
            SELECT doc_id, is_t, w1, w2, CAST(COUNT(*) AS BIGINT) AS tf
            FROM grams GROUP BY doc_id, is_t, w1, w2
        ),
        bg_c AS MATERIALIZED (
            SELECT w1, w2, CAST(SUM(tf) AS BIGINT) AS cb_c
            FROM tf GROUP BY w1, w2
        ),
        hist_c AS (
            SELECT w1, CAST(SUM(cb_c) AS BIGINT) AS cu_c
            FROM bg_c GROUP BY w1
        ),
        vocab_c AS (
            SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v_c
            FROM (SELECT unnest(toks) AS w FROM toked)
        ),
        bg_t AS MATERIALIZED (
            SELECT w1, w2, CAST(SUM(tf) AS BIGINT) AS cb_t
            FROM tf WHERE is_t GROUP BY w1, w2
        ),
        hist_t AS (
            SELECT w1, CAST(SUM(cb_t) AS BIGINT) AS cu_t
            FROM bg_t GROUP BY w1
        ),
        vocab_t AS (
            SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v_t
            FROM (SELECT unnest(toks) AS w FROM toked WHERE is_t)
        ),
        nlls AS MATERIALIZED (
            SELECT c.w1, c.w2,
                   CAST(floor(ln(CAST(h.cu_c + vc.v_c AS DOUBLE)
                                 / CAST(c.cb_c + 1 AS DOUBLE))
                              * {_Q} + 0.5) AS BIGINT) AS nll_c,
                   CASE WHEN vt.v_t > 0 THEN
                       CAST(floor(ln(CAST(COALESCE(ht.cu_t, 0) + vt.v_t
                                          AS DOUBLE)
                                     / CAST(COALESCE(bt.cb_t, 0) + 1
                                            AS DOUBLE))
                                  * {_Q} + 0.5) AS BIGINT)
                   END AS nll_t
            FROM bg_c c
            JOIN hist_c h ON c.w1 = h.w1
            LEFT JOIN bg_t bt ON c.w1 = bt.w1 AND c.w2 = bt.w2
            LEFT JOIN hist_t ht ON c.w1 = ht.w1
            CROSS JOIN vocab_c vc CROSS JOIN vocab_t vt
        ),
        scored AS (
            SELECT tf.doc_id,
                   CAST(SUM(tf.tf) AS BIGINT) AS n_bigrams,
                   CAST(CAST(SUM(tf.tf * (n.nll_c - n.nll_t)) AS DOUBLE)
                        / SUM(tf.tf) / {_Q} AS DOUBLE) AS logratio
            FROM tf JOIN nlls n ON tf.w1 = n.w1 AND tf.w2 = n.w2
            GROUP BY tf.doc_id
        )
        SELECT d.doc_id,
               CAST(COALESCE(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
               CAST(s.logratio AS DOUBLE) AS logratio
        FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
    """


@register(
    "c19_dsir_importance",
    survey="ext-curation,ext-text",
    doc="DSIR importance weights (Xie 2023): per-doc mean bigram "
        f"(nll_corpus − nll_target) with target = lang '{TARGET_LANG}' "
        "— the score a quality/importance resampler (c12) consumes to "
        "lift a target domain. Two add-one bigram LMs on the t16 "
        "micro-nat lattice; target-OOV grams score against the "
        "smoothing floor via engine-mirrored LEFT JOINs; empty target "
        "slice → NULL scores, never ln(0). Integer folds per doc, one "
        "final division — engine-exact.",
    oracle=_c19_oracle(),
)
def c19_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return dsir_logratio_frame(
        t.documents, F.col("lang") == TARGET_LANG
    )
