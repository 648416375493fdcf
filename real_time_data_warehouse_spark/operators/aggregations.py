"""Windowed & grouped aggregations — SURVEY.md §2.4-2.5 (A1-A10, W1-W9).

The reference's DWS layer is 10 s tumbling event-time windows with
incremental reduces and window-metadata stamping (stt/edt/cur_date) —
DwsTradeSkuOrderWindow.java:271-302 and six siblings. Spark equivalent:
``groupBy(window(et, "10 seconds"), keys).agg(...)`` — the partial
aggregation (map-side combine) that Flink's ReduceFunction does by hand is
what Catalyst plans automatically (HashAggregate partial → shuffle on the
group keys → HashAggregate final).

Scale notes: window+key aggregations shuffle once on the group key; the
count-distinct in A2 is exact here (mirrors the reference's Set-union,
DwsTradeProvinceOrderWindow.java:127-168) with the documented 100 TB
alternative ``approx_count_distinct`` registered as a separate query (A2b)
since its result is sketch-based. Measures aggregate in DECIMAL(18,2)
(functions/money.py) so the result is reduction-order independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_data_warehouse_spark.functions.money import dec, oracle_dec_sum
from real_time_data_warehouse_spark.functions.text import tokenize_cjk_sql
from real_time_data_warehouse_spark.functions.time import oracle_tumble, tumble, window_meta
from real_time_data_warehouse_spark.registry import register
from real_time_data_warehouse_spark.tables import Tables

_W10 = oracle_tumble("ts", 10)

_ORACLE_META = """
       strftime({w}, '%Y-%m-%d %H:%M:%S') AS stt,
       strftime({w} + INTERVAL 10 SECOND, '%Y-%m-%d %H:%M:%S') AS edt,
       strftime({w}, '%Y-%m-%d') AS cur_date
""".format(w=_W10)


@register(
    "a1_windowed_sum",
    survey="A1,W1,W4,W7",
    doc="Keyed 10 s tumbling event-time window, incremental decimal sum + "
        "window-metadata stamping (DwsTradeSkuOrderWindow.java:271-302).",
    oracle=f"""
        SELECT {_ORACLE_META},
               event_type AS sku_group,
               {oracle_dec_sum('value', 'order_amount')},
               CAST(COUNT(*) AS BIGINT) AS order_ct
        FROM events
        GROUP BY {_W10}, event_type
    """,
)
def a1_windowed_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    agg = (
        t.events.groupBy(tumble("ts"), F.col("event_type").alias("sku_group"))
        .agg(
            F.sum(dec("value")).cast("double").alias("order_amount"),
            F.count("*").alias("order_ct"),
        )
    )
    return window_meta(agg)


@register(
    "a2_distinct_count",
    survey="A2",
    doc="Per-key sum + exact distinct count (the reference's Set-union "
        "distinct, DwsTradeProvinceOrderWindow.java:139-168): per customer "
        "nation, order amount + distinct ordering customers.",
    oracle=f"""
        SELECT n.n_name AS province_name,
               {oracle_dec_sum('o.o_totalprice', 'order_amount')},
               CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS order_user_ct
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
    """,
)
def a2_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.orders
        .join(F.broadcast(t.customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("province_name"))
        .agg(
            F.sum(dec("o_totalprice")).cast("double").alias("order_amount"),
            F.countDistinct("o_custkey").alias("order_user_ct"),
        )
    )


@register(
    "a2b_approx_distinct",
    survey="A2",
    doc="100 TB-scale variant of A2: HyperLogLog approx_count_distinct "
        "(rsd 1%). The sketch value itself is engine-specific, so the "
        "driver-checked contract is a BOUNDS oracle: the exact per-key "
        "count (computed in the same aggregate) plus within_bounds = "
        "|approx−exact|/exact ≤ 0.05, which the oracle asserts as literal "
        "TRUE — HLL drift beyond 5% flips the row red instead of getting "
        "a free rows-only pass.",
    oracle="""
        SELECT n.n_name AS province_name,
               CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS order_user_ct_exact,
               TRUE AS within_bounds
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
    """,
)
def a2b_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    agg = (
        t.orders
        .join(F.broadcast(t.customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("province_name"))
        .agg(
            F.approx_count_distinct("o_custkey", 0.01).alias("approx"),
            F.countDistinct("o_custkey").alias("order_user_ct_exact"),
        )
    )
    err = F.abs(F.col("approx") - F.col("order_user_ct_exact")) / F.col(
        "order_user_ct_exact"
    )
    return agg.select(
        "province_name",
        "order_user_ct_exact",
        (err <= 0.05).alias("within_bounds"),
    )


@register(
    "a3_multikey_window",
    survey="A3,W1",
    doc="4-dim keyed windowed reduce (vc/ch/ar/is_new analog: "
        "DwsTrafficVcChArIsNewPageViewWindow.java:125-172) — hourly window "
        "× (event_type, user bucket): pv/dur sums.",
    oracle=f"""
        SELECT strftime({oracle_tumble('ts', 3600)}, '%Y-%m-%d %H:%M:%S') AS stt,
               event_type AS ch,
               CAST(user_id % 4 AS BIGINT) AS ar,
               CAST(COUNT(*) AS BIGINT) AS pv_ct,
               {oracle_dec_sum('value', 'dur_sum')}
        FROM events
        GROUP BY {oracle_tumble('ts', 3600)}, event_type, user_id % 4
    """,
)
def a3_multikey_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.events.groupBy(
            tumble("ts", "1 hour"),
            F.col("event_type").alias("ch"),
            (F.col("user_id") % 4).alias("ar"),
        )
        .agg(
            F.count("*").alias("pv_ct"),
            F.sum(dec("value")).cast("double").alias("dur_sum"),
        )
        .withColumn("stt", F.date_format("window.start", "yyyy-MM-dd HH:mm:ss"))
        .drop("window")
    )


@register(
    "a4_global_window",
    survey="A4,W1",
    doc="Global (non-keyed) tumbling window reduce (windowAll analog, "
        "DwsTrafficHomeDetailPageViewWindow.java:134-158): hourly totals.",
    oracle=f"""
        SELECT strftime({oracle_tumble('ts', 3600)}, '%Y-%m-%d %H:%M:%S') AS stt,
               CAST(COUNT(*) AS BIGINT) AS ev_ct,
               {oracle_dec_sum('value', 'value_sum')}
        FROM events
        GROUP BY {oracle_tumble('ts', 3600)}
    """,
)
def a4_global_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.events.groupBy(tumble("ts", "1 hour"))
        .agg(
            F.count("*").alias("ev_ct"),
            F.sum(dec("value")).cast("double").alias("value_sum"),
        )
        .withColumn("stt", F.date_format("window.start", "yyyy-MM-dd HH:mm:ss"))
        .drop("window")
    )


@register(
    "a5_windowed_uu",
    survey="A5,ST4",
    doc="Cart-add UU per window (DwsTradeCartAddUuWindow.java:99-139): "
        "distinct users per day per event type.",
    oracle="""
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS cur_date,
               event_type,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS uu_ct
        FROM events
        GROUP BY date_trunc('day', ts), event_type
    """,
)
def a5_windowed_uu(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.events.groupBy(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("cur_date"),
            "event_type",
        )
        .agg(F.countDistinct("user_id").alias("uu_ct"))
    )


@register(
    "a6_keyword_count",
    survey="A6,U1,W3",
    doc="Keyword UDTF + windowed count "
        "(DwsTrafficSourceKeywordPageViewWindow.java:50-63): tokenizer "
        "(Catalyst expression, functions/text.py) + explode + group count. "
        "The reference's LATERAL TABLE(ik_analyze(...)) is explode(tokenize).",
    oracle="""
        SELECT t.keyword,
               CAST(COUNT(*) AS BIGINT) AS keyword_ct
        FROM documents d,
             LATERAL (SELECT unnest(list_filter(
                 regexp_split_to_array(lower(d.text), '[^a-z0-9]+'),
                 x -> length(x) > 0)) AS keyword) t
        GROUP BY t.keyword
    """,
)
def a6_keyword_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from real_time_data_warehouse_spark.functions.text import tokenize

    t = Tables(spark, sf_dir)
    return (
        t.documents.select(F.explode(tokenize("text")).alias("keyword"))
        .groupBy("keyword")
        .agg(F.count("*").alias("keyword_ct"))
    )


# Fixed CJK vocabulary for the a6b fixture derivation (the synthetic
# corpus is ASCII; the CJK text is derived deterministically from it so
# both engines tokenize the SAME mixed-script strings).
_CJK_WORDS = ("数据", "仓库", "实时", "流式", "查询", "搜索")
_CJK_LIST_SQL = "['" + "','".join(_CJK_WORDS) + "']"


@register(
    "a6b_cjk_keyword_count",
    survey="A6,U1",
    doc="CJK keyword count — U1 parity for non-ASCII corpora "
        "(KeywordUtil.java:16-41 applies the IK Chinese tokenizer; the "
        "ASCII corpus never exercises that path). Each document derives "
        "a deterministic mixed-script string (two doc_id-selected "
        "Chinese words around an ASCII snippet), tokenize_cjk splits it "
        "— every Han char its own token, ASCII word runs as in a6 — and "
        "the keywords are counted. Pure Catalyst (regexp_extract_all "
        "inside codegen); the oracle runs the RE2 spelling of the same "
        "codepoint-class pattern. Deviation from IK's dictionary "
        "segmentation is documented in functions/text.py.",
    oracle=f"""
        WITH mixed AS (
            SELECT {_CJK_LIST_SQL}[CAST(doc_id % 6 + 1 AS INT)]
                   || ' ' || substr(text, 1, 40) || ' ' ||
                   {_CJK_LIST_SQL}[CAST((doc_id * 3 + 1) % 6 + 1 AS INT)]
                   AS s
            FROM documents
        )
        SELECT t.keyword, CAST(COUNT(*) AS BIGINT) AS keyword_ct
        FROM mixed m,
             LATERAL (SELECT unnest({tokenize_cjk_sql('m.s')})
                      AS keyword) t
        GROUP BY t.keyword
    """,
)
def a6b_cjk_keyword_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from real_time_data_warehouse_spark.functions.text import tokenize_cjk

    t = Tables(spark, sf_dir)
    words = F.array(*[F.lit(w) for w in _CJK_WORDS])
    mixed = t.documents.select(
        F.concat(
            F.element_at(words, (F.col("doc_id") % 6 + 1).cast("int")),
            F.lit(" "),
            F.substring("text", 1, 40),
            F.lit(" "),
            F.element_at(
                words, ((F.col("doc_id") * 3 + 1) % 6 + 1).cast("int")
            ),
        ).alias("s")
    )
    return (
        mixed.select(F.explode(tokenize_cjk("s")).alias("keyword"))
        .groupBy("keyword")
        .agg(F.count("*").alias("keyword_ct"))
    )


def fmm_tokens(t: str, dict_set: frozenset, max_len: int) -> list[str]:
    """Forward maximum matching — IK's core segmentation step: at each
    position take the LONGEST lexicon entry (fallback: one char). A
    module-level function so tests/test_cjk_dict_scale.py can run the
    SAME code against an IK-scale (275k-entry) lexicon, not just the
    fixture dict."""
    out, i, n = [], 0, len(t)
    while i < n:
        for ln in range(min(max_len, n - i), 1, -1):
            w = t[i : i + ln]
            if w in dict_set:
                out.append(w)
                i += ln
                break
        else:
            out.append(t[i])
            i += 1
    return out


def fmm_segment_udf(dict_set: frozenset, max_len: int):
    """Arrow-batched pandas UDF over ``fmm_tokens`` with the lexicon
    captured as a closure constant (broadcast once per executor via
    task-closure serialization — a few MB at IK's 275k-entry scale,
    same broadcast class as the d8 eval-suite index)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _fmm_segment(s):
        return s.map(lambda t: fmm_tokens(t, dict_set, max_len))

    # explicit annotations: the module's `from __future__ import
    # annotations` stringifies inline hints, which pandas_udf's
    # signature inference can't resolve
    _fmm_segment.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(_fmm_segment, "array<string>")



# Demo lexicon for a6c — a fixture-scale stand-in for IK's bundled
# dictionary (main2012.dic, ~275k entries): composites FIRST so the
# longest-match behavior is exercised (数据+仓库 adjacent must merge to
# the 4-char entry, exactly what distinguishes dictionary segmentation
# from a6b's codepoint splitting).
_CJK_DICT = ("数据仓库", "实时查询", *_CJK_WORDS)
_CJK_DICT_SQL = "['" + "','".join(_CJK_DICT) + "']"
_CJK_DICT_MAXLEN = max(len(w) for w in _CJK_DICT)


@register(
    "a6c_cjk_dict_segment",
    survey="A6,U1",
    doc="Dictionary-driven CJK segmentation — the IK-analyzer algorithm "
        "(KeywordUtil.java:16-41 wraps IKSegmenter; its core is forward "
        "maximum matching over a lexicon) rather than a6b's codepoint "
        "splitting: each document derives a deterministic UNSEGMENTED "
        "Han string (three doc_id-selected words + an embedded 4-char "
        "composite, no separators), and an Arrow-batched pandas UDF "
        "greedily matches the LONGEST lexicon entry at each position "
        "(fallback: single char), so adjacent 数据+仓库 merge into the "
        "composite entry exactly as IK's smart mode would. The lexicon "
        "here is a fixture-scale stand-in for IK's shipped dictionary; "
        "the ALGORITHM is the real one. U1's 'rich function' form: the "
        "reference runs a per-record Java library, the Spark twin is a "
        "vectorized pandas UDF (Arrow batches, not row-at-a-time). "
        "Oracle: per-position longest-match jump table + a recursive "
        "CTE walking each document's positions — engine-exact because "
        "both sides do character-based substring matching against the "
        "same lexicon. Scale: the UDF is embarrassingly parallel per "
        "document; the lexicon broadcasts as a closure constant "
        "(IK-scale ~275k entries is a few MB — same broadcast class as "
        "the d8 eval-suite index).",
    oracle=f"""
        WITH RECURSIVE docs AS (
            SELECT doc_id,
                   {_CJK_LIST_SQL}[CAST(doc_id % 6 + 1 AS INT)]
                   || {_CJK_LIST_SQL}[CAST((doc_id * 3 + 1) % 6 + 1 AS INT)]
                   || '数据仓库'
                   || {_CJK_LIST_SQL}[CAST((doc_id * 5 + 2) % 6 + 1 AS INT)]
                   AS txt
            FROM documents
        ),
        dict(w) AS (SELECT unnest({_CJK_DICT_SQL})),
        -- longest lexicon entry starting at each character position
        jump AS (
            SELECT d.doc_id, p.pos,
                   COALESCE(
                       (SELECT w FROM dict
                        WHERE substr(d.txt, CAST(p.pos AS INT),
                                     length(w)) = w
                        ORDER BY length(w) DESC, w LIMIT 1),
                       substr(d.txt, CAST(p.pos AS INT), 1)) AS tok
            FROM docs d,
                 LATERAL (SELECT unnest(range(1, length(d.txt) + 1))
                          AS pos) p
        ),
        walk AS (
            SELECT doc_id, CAST(1 AS BIGINT) AS pos FROM docs
            UNION ALL
            SELECT w.doc_id, w.pos + length(j.tok)
            FROM walk w
            JOIN jump j ON j.doc_id = w.doc_id AND j.pos = w.pos
            JOIN docs d ON d.doc_id = w.doc_id
            WHERE w.pos <= length(d.txt)
        )
        SELECT j.tok AS keyword, CAST(COUNT(*) AS BIGINT) AS keyword_ct
        FROM walk w JOIN jump j ON j.doc_id = w.doc_id AND j.pos = w.pos
        GROUP BY j.tok
    """,
)
def a6c_cjk_dict_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    dict_set = frozenset(_CJK_DICT)
    max_len = _CJK_DICT_MAXLEN

    def _fmm_segment(s):
        return s.map(lambda t: fmm_tokens(t, dict_set, max_len))

    # explicit annotations: the module's `from __future__ import
    # annotations` stringifies inline hints, which pandas_udf's
    # signature inference can't resolve
    _fmm_segment.__annotations__ = {"s": pd.Series, "return": pd.Series}
    fmm_segment = pandas_udf(_fmm_segment, "array<string>")

    t = Tables(spark, sf_dir)
    words = F.array(*[F.lit(w) for w in _CJK_WORDS])
    txt = t.documents.select(
        F.concat(
            F.element_at(words, (F.col("doc_id") % 6 + 1).cast("int")),
            F.element_at(
                words, ((F.col("doc_id") * 3 + 1) % 6 + 1).cast("int")
            ),
            F.lit("数据仓库"),
            F.element_at(
                words, ((F.col("doc_id") * 5 + 2) % 6 + 1).cast("int")
            ),
        ).alias("txt")
    )
    return (
        txt.select(F.explode(fmm_segment("txt")).alias("keyword"))
        .groupBy("keyword")
        .agg(F.count("*").cast("bigint").alias("keyword_ct"))
    )


@register(
    "a10_rollup",
    survey="A10",
    doc="Rollup aggregation (beyond the reference's surface — free in "
        "Spark/Catalyst): returnflag × linestatus hierarchy totals.",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
               CAST(COUNT(*) AS BIGINT) AS line_ct
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def a10_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.lineitem.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_price"),
            F.count("*").alias("line_ct"),
        )
    )


@register(
    "w8_sliding_window",
    survey="W8",
    doc="Sliding event-time window (absent in the reference; Spark-native): "
        "1 h window sliding 30 min, per-window counts. Each event lands in "
        "2 windows.",
    oracle="""
        WITH slides AS (
            SELECT to_timestamp(s.start_s)::TIMESTAMP AS wstart, e.value
            FROM events e,
            LATERAL (SELECT unnest([
                floor((epoch(e.ts) - 3600) / 1800 + 1) * 1800,
                floor((epoch(e.ts) - 3600) / 1800 + 2) * 1800
            ]) AS start_s) s
            WHERE epoch(e.ts) >= s.start_s AND epoch(e.ts) < s.start_s + 3600
        )
        SELECT strftime(wstart, '%Y-%m-%d %H:%M:%S') AS stt,
               CAST(COUNT(*) AS BIGINT) AS ev_ct
        FROM slides GROUP BY wstart
    """,
)
def w8_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.events.groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(F.count("*").alias("ev_ct"))
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("stt"),
            "ev_ct",
        )
    )


@register(
    "w8b_session_window",
    survey="W8,ST6",
    doc="Session event-time window (absent in the reference; Spark-native "
        "session_window with 30 min gap): per-user sessions with event "
        "counts. Oracle: classic gaps-and-islands sessionization.",
    oracle="""
        WITH marked AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN LAG(ts) OVER w IS NULL
                             OR epoch(ts) - epoch(LAG(ts) OVER w) > 1800
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sess AS (
            SELECT user_id, ts,
                   SUM(new_sess) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS sess_id
            FROM marked
        )
        SELECT user_id,
               strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS sess_start,
               CAST(COUNT(*) AS BIGINT) AS ev_ct
        FROM sess GROUP BY user_id, sess_id
    """,
)
def w8b_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.events.groupBy(
            F.session_window("ts", "30 minutes"), F.col("user_id")
        )
        .agg(F.count("*").alias("ev_ct"))
        .select(
            "user_id",
            F.date_format("session_window.start", "yyyy-MM-dd HH:mm:ss")
            .alias("sess_start"),
            "ev_ct",
        )
    )


@register(
    "a10b_cube",
    survey="A10",
    doc="Cube aggregation (all grouping-set combinations of returnflag × "
        "linestatus — beyond the reference, free in Catalyst).",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(COUNT(*) AS BIGINT) AS line_ct
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def a10b_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.lineitem.cube("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.count("*").alias("line_ct"),
        )
    )


@register(
    "w9_over_analytics",
    survey="W9",
    doc="OVER-window analytics (absent in the reference; added for the "
        "serving layer): per-customer order ranking + gap to previous order.",
    oracle="""
        SELECT * FROM (
            SELECT o_custkey AS user_id,
                   o_orderkey AS order_id,
                   ROW_NUMBER() OVER w AS rn,
                   CAST(datediff('day',
                       LAG(o_orderdate) OVER w, o_orderdate) AS INT) AS days_since_prev
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        ) WHERE rn <= 3
    """,
)
def w9_over_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    t = Tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        t.orders.select(
            F.col("o_custkey").alias("user_id"),
            F.col("o_orderkey").alias("order_id"),
            F.row_number().over(w).alias("rn"),
            F.datediff("o_orderdate", F.lag("o_orderdate").over(w))
            .cast("int")
            .alias("days_since_prev"),
        )
        .where(F.col("rn") <= 3)
    )


@register(
    "a12_salted_skew_agg",
    survey="A1,ext-scale",
    doc="Salted two-phase aggregation (functions/skew.py) on a genuinely "
        "skewed key: events.event_type has only 5 distinct values, so a "
        "plain groupBy funnels everything through 5 reducers regardless of "
        "cluster size — the viral-sku straggler. Phase 1 reduces on "
        "(key, salt) across 16× more reducers; phase 2 combines partials. "
        "Measures ride in DECIMAL so the two-phase sum is "
        "reduction-order-independent and the plain-GROUP-BY oracle matches "
        "exactly.",
    oracle=f"""
        SELECT event_type,
               {oracle_dec_sum('value', 'total_value')},
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(MIN(user_id) AS BIGINT) AS min_user,
               CAST(MAX(user_id) AS BIGINT) AS max_user
        FROM events
        GROUP BY event_type
    """,
)
def a12_salted_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from real_time_data_warehouse_spark.functions.skew import salted_agg

    t = Tables(spark, sf_dir)
    out = salted_agg(
        t.events,
        ["event_type"],
        {
            "total_value": (dec("value"), "sum"),
            "n": ("event_id", "count"),
            "min_user": ("user_id", "min"),
            "max_user": ("user_id", "max"),
        },
        salt_buckets=16,
    )
    return out.select(
        "event_type",
        F.col("total_value").cast("double").alias("total_value"),
        F.col("n").cast("bigint").alias("n"),
        F.col("min_user").cast("bigint").alias("min_user"),
        F.col("max_user").cast("bigint").alias("max_user"),
    )


_W10_DELAY_MS = 3_600_000  # 1 h allowed lateness the audit scores against
# The fixture's arrival order (event_id) equals event-time order, so the
# raw stream has zero disorder and the audit's late branch would never
# execute. Deterministic disorder is planted first (the t5 planted-dirt
# discipline): every 13th event's timestamp shifts 6 h earlier. A user's
# consecutive events are ~7 h apart (median), so roughly half the
# shifted events land behind their user's high-water mark — hundreds of
# deterministic late events, some above and some below the 1 h delay.
_W10_DISORDER_MOD = 13
_W10_DISORDER_MS = 21_600_000


@register(
    "w10_late_event_audit",
    survey="W4,W5,ext-scale",
    doc="Watermark / late-data audit (the batch mirror of W4-W5's "
        "allowed-lateness semantics): per user, events replay in arrival "
        "order (event_id) and each event's lateness is measured against "
        "the running max event-time seen so far — an event more than "
        "1 h behind that high-water mark would have been dropped by a "
        "1 h-delay watermark. The fixture is perfectly ordered, so "
        f"disorder is planted deterministically (event_id % "
        f"{_W10_DISORDER_MOD} → ts − {_W10_DISORDER_MS // 3600000} h, "
        "the t5 planted-dirt pattern) and the audit must count exactly "
        "the planted events that cross their user's high-water mark. "
        "Output is the per-event_type audit: events, late events, worst "
        "lateness. The window partitions by user_id (never a global "
        "running max — that serializes the corpus through one reducer "
        "at 100 TB), then ONE partial-agg shuffle on event_type. "
        "Integer millisecond math only — no float risk. This is the "
        "observability query run BEFORE choosing a watermark delay.",
    oracle=f"""
        WITH arrived AS (
            SELECT event_id, user_id, event_type,
                   epoch_ms(ts) - CASE WHEN event_id % {_W10_DISORDER_MOD} = 0
                                       THEN {_W10_DISORDER_MS} ELSE 0 END
                       AS ev_ms
            FROM events
        ),
        marked AS (
            SELECT event_type,
                   greatest(0, COALESCE(
                       MAX(ev_ms) OVER (
                           PARTITION BY user_id ORDER BY event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) - ev_ms) AS lateness_ms
            FROM arrived
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CASE WHEN lateness_ms > {_W10_DELAY_MS}
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
               CAST(MAX(lateness_ms) AS BIGINT) AS max_lateness_ms
        FROM marked
        GROUP BY event_type
    """,
)
def w10_late_event_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    t = Tables(spark, sf_dir)
    ev_ms = F.unix_millis("ts") - F.when(
        F.col("event_id") % _W10_DISORDER_MOD == 0, _W10_DISORDER_MS
    ).otherwise(0)
    arrived = t.events.select(
        "event_id", "user_id", "event_type", ev_ms.alias("ev_ms")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    highwater = F.coalesce(F.max("ev_ms").over(w), F.lit(0))
    marked = arrived.select(
        "event_type",
        F.greatest(F.lit(0), highwater - F.col("ev_ms")).alias(
            "lateness_ms"
        ),
    )
    return marked.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(
            F.when(F.col("lateness_ms") > _W10_DELAY_MS, 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_late"),
        F.max("lateness_ms").cast("bigint").alias("max_lateness_ms"),
    )


# --- a13: sketch-pruned heavy hitters -----------------------------------

# φ = 1/K: a token is a heavy hitter iff count·K > total. The fixture's
# unigram distribution is near-uniform by construction, so K=30 puts the
# threshold at the count median — both branches fire and the result stays
# non-empty across fixture regenerations. The pruning *guarantee* is
# distribution-free (see docstring); tests/test_heavy_hitters.py proves
# the candidate bound on a genuinely zipfian fixture.
_HH_K = 30


def heavy_hitter_candidates(
    stream: DataFrame, key: str, k: int, cap_factor: int = 4
) -> DataFrame:
    """Phase 1 of the two-phase heavy-hitter plan: one zero-shuffle pass
    emitting per-partition candidate keys via BOUNDED-MEMORY batched
    Misra-Gries (capacity m = cap_factor·k counters per partition, NOT
    the partition's full vocabulary).

    Each Arrow batch is counted vectorized (``value_counts``) and merged
    into the summary; when the summary exceeds m keys, the classic MG
    decrement runs in one vectorized step: subtract the (m+1)-th largest
    counter from every counter and drop the non-positive ones (≤ m keys
    survive, since only counters strictly above the cut remain). Every
    decrement round removes ≥ cut·(m+1) total mass while costing any
    single key ≤ cut, and total removable mass is ≤ n_p, so the summary
    undercounts any key by at most n_p/(m+1).

    NO FALSE NEGATIVES, distribution-free: a key with global count
    > N/k holds local count > n_p/k in some partition (pigeonhole), and
    there its counter stays ≥ n_p/k − n_p/(m+1) > 0 for m ≥ k, so it
    survives to the emitted summary. The shuffle that follows therefore
    moves O(m·P) rows instead of the full vocabulary — at 100 TB a
    trillion-token corpus has billions of distinct n-grams, but the
    candidate set stays cluster-tiny and executor memory stays O(m).
    """
    import pandas as pd

    cap = cap_factor * k

    def per_partition(batches):
        summary = pd.Series(dtype="int64")
        for pdf in batches:
            counts = pdf[key].value_counts()
            summary = (
                counts if summary.empty
                else summary.add(counts, fill_value=0).astype("int64")
            )
            if len(summary) > cap:
                cut = summary.nlargest(cap + 1).iloc[-1]
                summary = summary - cut
                summary = summary[summary > 0]
        yield pd.DataFrame({key: summary.index.astype(str)})

    return stream.mapInPandas(per_partition, f"{key} string")


@register(
    "a13_heavy_hitters",
    survey="A2,ext-scale,ext-text",
    doc="Vocabulary heavy hitters (tokens with count > N/30) via the "
        "two-phase sketch-prune plan: a zero-shuffle per-partition "
        "local-threshold pass (Misra-Gries family — no false negatives "
        "by pigeonhole) emits <K candidates per partition; only "
        "candidate keys then take the exact groupBy shuffle, so the "
        "shuffle volume is O(K·partitions) instead of O(|vocab|·"
        "partitions). The exact verify makes the output IDENTICAL to "
        "the plain GROUP BY … HAVING oracle — the sketch only prunes, "
        "never decides. Total-count comparison is exact integer "
        "cross-multiplication (cnt·30 > N).",
    oracle="""
        WITH toks AS (SELECT unnest({t}) AS w FROM documents),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM toks),
        cnt AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt
                FROM toks GROUP BY w)
        SELECT c.w, c.cnt, t.n_total
        FROM cnt c CROSS JOIN tot t
        WHERE c.cnt * {k} > t.n_total
    """.format(t="list_filter(regexp_split_to_array(lower(text), "
               "'[^a-z0-9]+'), x -> length(x) > 0)", k=_HH_K),
)
def a13_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from real_time_data_warehouse_spark.functions.text import tokenize

    t = Tables(spark, sf_dir)
    stream = t.documents.select(F.explode(tokenize("text")).alias("w"))
    # one materialization of the token stream feeds both phases and the
    # total count — a single corpus scan (the t9/s6 discipline)
    stream = stream.localCheckpoint(eager=True)
    cand = heavy_hitter_candidates(stream, "w", _HH_K).distinct()
    tot = stream.agg(F.count("*").cast("bigint").alias("n_total"))
    return (
        stream.join(F.broadcast(cand), "w")  # prune BEFORE the agg shuffle
        .groupBy("w")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .crossJoin(F.broadcast(tot))
        .where(F.col("cnt") * _HH_K > F.col("n_total"))
        .select("w", "cnt", "n_total")
    )


@register(
    "a2c_hll_partial_union",
    survey="A2,ext-scale",
    doc="Mergeable-sketch distinct counting — the pre-aggregation "
        "pattern that makes date-range distinct queries O(days) instead "
        "of O(rows) at 100 TB: build one Datasketches HLL sketch of "
        "user_id PER DAY (the continuous-aggregate state a serving "
        "layer would persist), then answer the all-time question by "
        "hll_union_agg over the daily sketches. Two driver-checkable "
        "claims ride in the row: within_bounds pins the estimate to "
        "±5% of the exact count (the a2b bounds-oracle discipline — "
        "sketch drift flips the row red), and merge_lossless pins "
        "PARTITION-INDEPENDENCE of the merge: daily partials and finer "
        "(day, event_type) partials union to the IDENTICAL estimate "
        "(same lgK ⇒ register-max is associative ⇒ same registers), "
        "which is the property that lets any executor pre-aggregate "
        "any slice. Deliberately NOT pinned: union ≡ one direct "
        "un-unioned sketch — a direct Datasketches sketch keeps the "
        "HIP estimator, which any union discards, so their estimates "
        "legitimately differ once sketches leave coupon mode (observed "
        "at sf0.1; equality at sf0.01 was coupon-mode luck).",
    oracle="""
        SELECT CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
               TRUE AS within_bounds,
               TRUE AS merge_lossless
        FROM events
    """,
)
def a2c_hll_partial_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    ev = t.events.select(
        F.to_date("ts").alias("day"), "event_type", "user_id"
    )
    daily = ev.groupBy("day").agg(F.hll_sketch_agg("user_id").alias("sk"))
    merged = daily.agg(
        F.count("*").cast("bigint").alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg(F.col("sk")))
        .cast("bigint")
        .alias("est_merged"),
    )
    # finer partials: same rows, different partitioning of the merge
    fine = (
        ev.groupBy("day", "event_type")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg(F.col("sk")))
            .cast("bigint")
            .alias("est_fine")
        )
    )
    exact = ev.agg(
        F.countDistinct("user_id").cast("bigint").alias("exact_users")
    )
    out = merged.crossJoin(F.broadcast(fine)).crossJoin(F.broadcast(exact))
    err = F.abs(F.col("est_merged") - F.col("exact_users")).cast("double")
    return out.select(
        "n_days",
        "exact_users",
        (err / F.col("exact_users") <= 0.05).alias("within_bounds"),
        (F.col("est_merged") == F.col("est_fine")).alias("merge_lossless"),
    )


# Count-Min Sketch geometry: d independent hash rows × w buckets. The
# point estimate min_r(cell[r][h_r(k)]) NEVER undercounts (each cell is
# a sum over a superset of k's rows) and overcounts by ≤ e·N/w with
# prob 1−e^−d. The hashes are the portable md5-prefix integers both
# engines compute bit-identically, so the whole sketch — not just the
# claim about it — is oracle-checked.
_CMS_D = 4
_CMS_W = 512
_CMS_TOPK = 20


def _cms_cells(col, r: int):
    """(row, bucket) for key column ``col`` under hash row ``r``."""
    from real_time_data_warehouse_spark.functions.text import md5_hash

    return F.struct(
        F.lit(r).alias("r"),
        (md5_hash(F.concat_ws(":", F.lit(str(r)), col)) % _CMS_W).alias(
            "bucket"
        ),
    )


def _cms_sql_bucket(expr: str) -> str:
    from real_time_data_warehouse_spark.functions.text import md5_hash_sql

    return f"{md5_hash_sql(expr)} % {_CMS_W}"


@register(
    "a19_cms_point_estimates",
    survey="A2,ext-scale",
    doc="Count-Min-Sketch frequency estimation with MERGEABLE partials — "
        "the third sketch family next to a2c's HLL (distinct) and a13's "
        "Misra-Gries (candidates): one events scan explodes each key "
        f"into its {_CMS_D} (row, bucket) cells map-side and partial→"
        f"final-counts them into a fixed {_CMS_D}×{_CMS_W} integer grid "
        "(≤2048 rows total, broadcastable; shards/days merge by plain "
        "cell addition — the property that makes CMS a streaming/"
        "pre-aggregation state). Point estimates for the exact top-"
        f"{_CMS_TOPK} keys are min-over-rows via a broadcast join of "
        "the probe cells against the grid. Hashes are the portable "
        "md5-prefix integers, so exact_ct, cms_est AND overcount are "
        "all hash-compared against DuckDB computing the identical "
        "sketch — overcount ≥ 0 is the CMS no-undercount guarantee, "
        "checked per key, not asserted.",
    oracle=f"""
        WITH rs(r) AS (VALUES (0),(1),(2),(3)),
        cells AS (
            SELECT rs.r AS r,
                   {_cms_sql_bucket(
                       "CAST(rs.r AS VARCHAR) || ':' || "
                       "CAST(e.user_id AS VARCHAR)")} AS bucket,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM events e CROSS JOIN rs
            GROUP BY 1, 2
        ),
        top AS (
            SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_ct
            FROM events GROUP BY user_id
            ORDER BY exact_ct DESC, user_id LIMIT {_CMS_TOPK}
        )
        SELECT t.user_id,
               t.exact_ct,
               CAST(MIN(c.c) AS BIGINT) AS cms_est,
               CAST(MIN(c.c) - t.exact_ct AS BIGINT) AS overcount
        FROM top t CROSS JOIN rs
        JOIN cells c
          ON c.r = rs.r
         AND c.bucket = {_cms_sql_bucket(
             "CAST(rs.r AS VARCHAR) || ':' || CAST(t.user_id AS VARCHAR)")}
        GROUP BY t.user_id, t.exact_ct
    """,
)
def a19_cms_point_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    k = F.col("user_id").cast("string")
    cells = (
        t.events.select(
            F.explode(
                F.array(*[_cms_cells(k, r) for r in range(_CMS_D)])
            ).alias("cell")
        )
        .select("cell.r", "cell.bucket")
        .groupBy("r", "bucket")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    top = (
        t.events.groupBy("user_id")
        .agg(F.count("*").cast("bigint").alias("exact_ct"))
        .orderBy(F.desc("exact_ct"), F.asc("user_id"))
        .limit(_CMS_TOPK)
    )
    probes = top.select(
        "user_id",
        "exact_ct",
        F.explode(
            F.array(*[_cms_cells(k, r) for r in range(_CMS_D)])
        ).alias("cell"),
    ).select("user_id", "exact_ct", "cell.r", "cell.bucket")
    return (
        probes.join(F.broadcast(cells), ["r", "bucket"])
        .groupBy("user_id", "exact_ct")
        .agg(F.min("c").cast("bigint").alias("cms_est"))
        .select(
            "user_id",
            "exact_ct",
            "cms_est",
            (F.col("cms_est") - F.col("exact_ct"))
            .cast("bigint")
            .alias("overcount"),
        )
    )


@register(
    "a15_retention_cohorts",
    survey="A2,A3,ext-scale",
    doc="Retention-cohort matrix — the classic warehouse triangle: each "
        "user's cohort is their first active day, and cell (cohort_day, "
        "day_offset) counts distinct cohort users active exactly that "
        "many days later. Shape: distinct (user, day) reduces the event "
        "stream map-side first; the cohort table is one user-keyed "
        "aggregate joined back on user_id (at 100 TB that join shuffles "
        "the distinct-day rows, already thousands of times smaller than "
        "the events); the final cell count is a second partial→final "
        "aggregate. Everything integer/date-exact.",
    oracle="""
        WITH active AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        ),
        cohort AS (
            SELECT user_id, MIN(day) AS cohort_day FROM active GROUP BY user_id
        )
        SELECT strftime(c.cohort_day, '%Y-%m-%d') AS cohort_day,
               CAST(a.day - c.cohort_day AS BIGINT) AS day_offset,
               CAST(COUNT(*) AS BIGINT) AS n_users
        FROM active a JOIN cohort c USING (user_id)
        GROUP BY c.cohort_day, a.day - c.cohort_day
    """,
)
def a15_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    active = t.events.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    cohort = active.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        active.join(cohort, "user_id")
        .groupBy(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("day", "cohort_day").cast("bigint").alias("day_offset"),
        )
        .agg(F.count("*").cast("bigint").alias("n_users"))
    )


@register(
    "a16_gapfill_locf",
    survey="A1,W1,ext-scale",
    doc="Time-series gap-fill with last-observation-carried-forward — "
        "the hypertable/continuous-aggregate staple (TimescaleDB's "
        "locf/time_bucket_gapfill, declaratively): per user, the daily "
        "closing value (last event of the day by (ts, event_id) — "
        "picked via row_number in BOTH engines, so ties can't diverge) "
        "on a dense day spine from the user's first day to the corpus "
        "max day (bounds broadcast as one row), missing days filled by "
        "F.last(ignorenulls) over the per-user ordered window with an "
        "is_filled marker. Values are copied, never recomputed, so "
        "parity is float-exact. Shape: one reduce to daily closes, a "
        "map-side sequence/explode for the spine, one window per user "
        "partition — no joins wider than the daily table.",
    oracle="""
        WITH ranked AS (
            SELECT user_id, CAST(ts AS DATE) AS day, value,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id, CAST(ts AS DATE)
                       ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ),
        daily AS (
            SELECT user_id, day, value FROM ranked WHERE rn = 1
        ),
        bounds AS (SELECT MAX(day) AS max_day FROM daily),
        spine AS (
            SELECT u.user_id, CAST(s.d AS DATE) AS day
            FROM (SELECT user_id, MIN(day) AS d0 FROM daily GROUP BY user_id) u
            CROSS JOIN bounds b,
            LATERAL (SELECT unnest(generate_series(u.d0, b.max_day,
                                                   INTERVAL 1 DAY)) AS d) s
        )
        SELECT sp.user_id, strftime(sp.day, '%Y-%m-%d') AS day,
               CAST((SELECT d2.value FROM daily d2
                     WHERE d2.user_id = sp.user_id AND d2.day <= sp.day
                     ORDER BY d2.day DESC LIMIT 1) AS DOUBLE) AS value,
               (d.value IS NULL) AS is_filled
        FROM spine sp
        LEFT JOIN daily d ON d.user_id = sp.user_id AND d.day = sp.day
    """,
)
def a16_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    t = Tables(spark, sf_dir)
    wday = Window.partitionBy("user_id", "day").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    daily = (
        t.events.select(
            "user_id", F.to_date("ts").alias("day"), "ts", "event_id", "value"
        )
        .withColumn("rn", F.row_number().over(wday))
        .where(F.col("rn") == 1)
        .select("user_id", "day", "value")
    )
    bounds = daily.agg(F.max("day").alias("max_day"))
    spine = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("d0"))
        .crossJoin(F.broadcast(bounds))
        .select(
            "user_id",
            F.explode(
                F.sequence("d0", "max_day", F.expr("INTERVAL 1 DAY"))
            ).alias("day"),
        )
    )
    wfill = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = spine.join(daily, ["user_id", "day"], "left")
    return joined.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.last("value", ignorenulls=True).over(wfill).cast("double")
        .alias("value"),
        F.col("value").isNull().alias("is_filled"),
    )


@register(
    "a17_spike_detection",
    survey="A1,W8,ext-scale",
    doc="Trailing-window anomaly flags — the monitoring staple on any "
        "metric stream: a user-day is a spike when its value more than "
        "doubles the trailing 7-day daily average. The comparison is "
        "EXACT decimal cross-multiplication (day_value·n_trail > "
        "2·sum_trail — never a float division), daily sums ride in "
        "DECIMAL(18,2), and the trailing frame is RANGE -7..-1 on the "
        "integer day number, so both engines see identical windows and "
        "identical booleans. Days with no trailing baseline emit NULL "
        "(unratable ≠ not-spiking, the t6 discipline). One reduce to "
        "user-days, one per-user window — no self-joins.",
    oracle="""
        WITH daily AS (
            SELECT user_id, CAST(ts AS DATE) AS day,
                   CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                        AS BIGINT) AS day_num,
                   SUM(CAST(value AS DECIMAL(18,2))) AS v
            FROM events GROUP BY user_id, CAST(ts AS DATE)
        ),
        win AS (
            SELECT user_id, day, v,
                   SUM(v) OVER (PARTITION BY user_id ORDER BY day_num
                                RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING)
                       AS sum_trail,
                   COUNT(*) OVER (PARTITION BY user_id ORDER BY day_num
                                  RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING)
                       AS n_trail
            FROM daily
        )
        SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
               CAST(v AS DOUBLE) AS daily_value,
               CAST(n_trail AS BIGINT) AS n_trail,
               CASE WHEN n_trail > 0
                    THEN v * n_trail > 2 * sum_trail END AS is_spike
        FROM win
    """,
)
def a17_spike_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    t = Tables(spark, sf_dir)
    daily = (
        t.events.groupBy(
            "user_id",
            F.to_date("ts").alias("day"),
        )
        .agg(F.sum(dec("value")).alias("v"))
        .withColumn(
            "day_num", F.datediff("day", F.lit("1970-01-01").cast("date"))
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day_num")
        .rangeBetween(-7, -1)
    )
    win = daily.select(
        "user_id",
        "day",
        "v",
        F.sum("v").over(w).alias("sum_trail"),
        F.count("*").over(w).alias("n_trail"),
    )
    return win.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("v").cast("double").alias("daily_value"),
        F.col("n_trail").cast("bigint").alias("n_trail"),
        F.when(
            F.col("n_trail") > 0,
            F.col("v") * F.col("n_trail") > 2 * F.col("sum_trail"),
        ).alias("is_spike"),
    )


# --- a14: Window TopN ------------------------------------------------------

_TOPN_PER_WINDOW = 3


@register(
    "a14_window_topn",
    survey="A9,W1,ext-scale",
    doc=f"Window TopN — Flink SQL's canonical per-window ranking "
        "(the ADS keyword/source rankings the reference's serving layer "
        f"computes per window): within each 1 h tumbling window, the "
        f"top {_TOPN_PER_WINDOW} event types by count with "
        "deterministic (count desc, type asc) tie-break. Plan: one "
        "partial-agg exchange on (window, type), then the rank rides a "
        "second exchange on the window key with WindowGroupLimit "
        "pruning map-side — at scale the ranked exchange carries at "
        "most |windows| x |types| pre-aggregated rows, never raw "
        "events.",
    oracle=f"""
        SELECT strftime(w, '%Y-%m-%d %H:%M:%S') AS stt,
               event_type,
               CAST(cnt AS BIGINT) AS cnt,
               CAST(rn AS INT) AS rnk
        FROM (
            SELECT w, event_type, cnt,
                   ROW_NUMBER() OVER (PARTITION BY w
                       ORDER BY cnt DESC, event_type) AS rn
            FROM (
                SELECT {oracle_tumble('ts', 3600)} AS w,
                       event_type, COUNT(*) AS cnt
                FROM events
                GROUP BY {oracle_tumble('ts', 3600)}, event_type
            )
        ) WHERE rn <= {_TOPN_PER_WINDOW}
    """,
)
def a14_window_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    t = Tables(spark, sf_dir)
    counts = (
        t.events.groupBy(
            tumble("ts", "1 hour").alias("window"), "event_type"
        )
        .agg(F.count("*").alias("cnt"))
        .select(
            F.col("window.start").alias("wstart"), "event_type", "cnt"
        )
    )
    w = Window.partitionBy("wstart").orderBy(
        F.col("cnt").desc(), "event_type"
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _TOPN_PER_WINDOW)
        .select(
            F.date_format("wstart", "yyyy-MM-dd HH:mm:ss").alias("stt"),
            "event_type",
            F.col("cnt").cast("bigint").alias("cnt"),
            F.col("rn").cast("int").alias("rnk"),
        )
    )


# --- w11: CUMULATE window --------------------------------------------------

_CUM_CYCLE_S = 21600  # 6 h cycle
_CUM_STEP_S = 3600  # 1 h step => windows [cycle, cycle+k*step), k=1..6


@register(
    "w11_cumulate_window",
    survey="W8,W1,ext-scale",
    doc="CUMULATE window (Flink 1.17's third window TVF, alongside "
        "TUMBLE/HOP which w1/w8 cover): within each 6 h cycle, "
        "early-fire cumulative windows every hour — window k spans "
        "[cycle_start, cycle_start + k·1 h) and reports the running "
        "event count and DECIMAL value sum, the 'today so far, "
        "refreshed hourly' dashboard shape. Spark form: each event "
        "expands map-side (sequence + explode inside codegen) into the "
        "6−⌊elapsed/step⌋ windows whose end lies after it, then ONE "
        "partial-agg exchange on (cycle, k) — the fan-out is bounded "
        "by cycle/step (6 here), so shuffled rows are ≤6× events with "
        "full map-side combine, and no window ever re-reads earlier "
        "data (the incremental-emit property CUMULATE exists for).",
    oracle=f"""
        SELECT strftime(to_timestamp(cyc)::TIMESTAMP,
                        '%Y-%m-%d %H:%M:%S') AS stt,
               strftime(to_timestamp(cyc + k * {_CUM_STEP_S})::TIMESTAMP,
                        '%Y-%m-%d %H:%M:%S') AS edt,
               CAST(COUNT(*) AS BIGINT) AS event_ct,
               {oracle_dec_sum('value', 'value_sum')}
        FROM (
            SELECT value, cyc,
                   unnest(range(CAST(floor((ep - cyc) / {_CUM_STEP_S})
                                     AS BIGINT) + 1, 7)) AS k
            FROM (
                SELECT value,
                       floor(epoch(ts)) AS ep,
                       CAST(floor(floor(epoch(ts)) / {_CUM_CYCLE_S})
                            * {_CUM_CYCLE_S} AS BIGINT) AS cyc
                FROM events
            )
        )
        GROUP BY cyc, k
    """,
)
def w11_cumulate_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    ep = F.floor(F.col("ts").cast("double")).cast("bigint")
    cyc = (F.floor(ep / _CUM_CYCLE_S) * _CUM_CYCLE_S).cast("bigint")
    k_min = (F.floor((ep - cyc) / _CUM_STEP_S) + 1).cast("bigint")
    expanded = t.events.select(
        "value",
        cyc.alias("cyc"),
        F.explode(F.sequence(k_min, F.lit(6).cast("bigint"))).alias("k"),
    )
    return expanded.groupBy("cyc", "k").agg(
        F.count("*").cast("bigint").alias("event_ct"),
        F.sum(dec("value")).cast("double").alias("value_sum"),
    ).select(
        F.date_format(F.timestamp_seconds("cyc"), "yyyy-MM-dd HH:mm:ss")
        .alias("stt"),
        F.date_format(
            F.timestamp_seconds(F.col("cyc") + F.col("k") * _CUM_STEP_S),
            "yyyy-MM-dd HH:mm:ss",
        ).alias("edt"),
        "event_ct",
        "value_sum",
    )


@register(
    "u3_weighted_mean_udaf",
    survey="U3",
    doc="Custom UDAF demonstration — the one §2 surface with no query "
        "until now (the reference registers no UDAF; SURVEY notes "
        "pandas GROUPED_AGG as the Spark-side mechanism). Per-event_type "
        "weighted mean of value with weight (event_id % 7 + 1), computed "
        "by TWO Arrow-batched GROUPED_AGG pandas UDAFs that fold exact "
        "INTEGER partials (cents x weight, weight) — the partials are "
        "associativity-independent, so the final double division and "
        "round are bit-identical to the oracle's. This is the "
        "API-surface witness for U3, not a hot-path pattern: the same "
        "semantics compile to builtins (see the oracle), and SCALE.md "
        "documents when a real UDAF is actually warranted.",
    oracle="""
        WITH partials AS (
            SELECT event_type,
                   CAST(SUM((event_id % 7 + 1) *
                            CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS wsum_cents,
                   CAST(SUM(event_id % 7 + 1) AS BIGINT) AS w_sum
            FROM events
            GROUP BY event_type
        )
        SELECT event_type, wsum_cents, w_sum,
               CAST(CAST((wsum_cents * 200 + w_sum) // (2 * w_sum)
                         AS DOUBLE)
                    / CAST(10000 AS DOUBLE) AS DOUBLE) AS wavg
        FROM partials
    """,
)
def u3_weighted_mean_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from real_time_data_warehouse_spark.functions.udaf import (
        weight_sum,
        weighted_cents_sum,
    )

    t = Tables(spark, sf_dir)
    weighted = t.events.select(
        "event_type",
        "value",
        (F.col("event_id") % 7 + 1).cast("bigint").alias("w"),
    )
    agg = weighted.groupBy("event_type").agg(
        weighted_cents_sum("value", "w").alias("wsum_cents"),
        weight_sum("w").alias("w_sum"),
    )
    # wavg at 4 dp on the integer lattice: round-half-up(n/d) over
    # BIGINTs is (n*2 + d) div (2*d) — no double division, so the
    # result is bit-identical to the oracle even at true half-ties.
    # Sign safety: BOTH engines truncate integer division toward zero
    # (Spark `div` and DuckDB `//`: -7/2 → -3 in each; verified in
    # tests/test_pipeline_ops.py::test_u3_div_semantics_cross_engine),
    # so the formula stays cross-engine identical for negative
    # wsum_cents too — only the "round-half-UP" reading assumes n ≥ 0
    # (negative n rounds half-toward-zero, identically on both sides).
    return agg.select(
        "event_type",
        "wsum_cents",
        "w_sum",
        (
            F.expr("(wsum_cents * 200 + w_sum) div (2 * w_sum)")
            .cast("double")
            / F.lit(10000.0)
        )
        .cast("double")
        .alias("wavg"),
    )


# --- a18: global running total — distributed two-phase prefix sum ----------

_PREFIX_BUCKETS = 32


@register(
    "a18_running_total",
    survey="ext-scale,W9",
    doc="Global running count + cumulative amount over the full event "
        "stream in (ts, event_id) order — the ledger/balance query "
        "whose naive form (SUM OVER an unpartitioned ORDER BY) funnels "
        "100 TB through ONE sorted partition. Implemented as the "
        f"classic two-phase prefix sum: {_PREFIX_BUCKETS} time-range "
        "buckets each compute their LOCAL prefix in parallel "
        "(partitionBy bucket), the per-bucket totals — a "
        f"{_PREFIX_BUCKETS}-row frame — take the only unpartitioned "
        "window, and the exclusive offsets broadcast back onto the "
        "stream. Amounts accumulate in DECIMAL(18,2) (exact, "
        "associative), so local-prefix + offset ≡ the oracle's "
        "single-threaded running sum bit-for-bit. The bucket-bounds "
        "fetch is one 2-value driver row (the offline-artifact "
        "pattern); at 100 TB bucket count scales with cluster width "
        "and a second phase level handles bucket-count overflow — "
        "depth-2 scan tree, never a global sort.",
    oracle="""
        SELECT event_id,
               CAST(COUNT(*) OVER w AS BIGINT) AS cum_cnt,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
                   AS cum_amount
        FROM events
        WINDOW w AS (ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def a18_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    from real_time_data_warehouse_spark.functions.prefix import (
        bucketed_prefix,
    )

    t = Tables(spark, sf_dir)
    ev = t.events.select("event_id", "ts", "value")
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    if lo is None:  # empty stream → empty ledger, correct schema
        return spark.createDataFrame(
            [], "event_id long, cum_cnt long, cum_amount double"
        )
    span = (hi - lo).total_seconds() + 1.0
    sec = F.col("ts").cast("double") - F.lit(lo).cast("timestamp").cast(
        "double"
    )
    bucket = F.least(
        F.floor(sec / span * _PREFIX_BUCKETS),
        F.lit(_PREFIX_BUCKETS - 1),
    ).cast("int")
    out = bucketed_prefix(
        ev,
        bucket,
        ["ts", "event_id"],
        {
            "cnt": (F.lit(1).cast("bigint"), F.lit(0).cast("bigint")),
            "amt": (dec("value"), F.lit(0).cast("decimal(18,2)")),
        },
        n_buckets=_PREFIX_BUCKETS,
    )
    return out.select(
        "event_id",
        F.col("cum_cnt").cast("bigint").alias("cum_cnt"),
        F.col("cum_amt").cast("double").alias("cum_amount"),
    )


# --- u4: the U1 TableFunction contract through Spark's NATIVE Python UDTF ---
#
# KeywordUtil.java:16-41 is a Flink TableFunction applied with LATERAL
# TABLE(...) (DwsTrafficSourceKeywordPageViewWindow.java:60-79). a6/a6b
# re-express it as codegen explode — the scale path, and the one every
# other row uses. This row executes the SAME contract through Spark's
# first-class UDTF API (spark.udtf.register + SQL LATERAL), the direct
# analog of Flink's @FunctionHint TableFunction registration, so the
# API surface itself is driver-verified, not just the semantics. The
# UDTF is Arrow-batched when the build supports it; the deliberate
# rule "no row-Python in hot paths" stands — a production corpus scan
# stays on a6's explode, and the docstring is the contract making that
# choice explicit.


def _keyword_udtf_cls():
    """Build the UDTF class lazily: the decorator needs no JVM, but
    keeping construction out of import time keeps operator imports
    JVM-free and lets the Arrow kwarg be feature-detected."""
    from pyspark.sql.functions import udtf

    class SplitKeywords:
        def __init__(self) -> None:
            import re

            self._pat = re.compile("[^a-z0-9]+")  # functions.text twin

        def eval(self, text):
            pos = 0
            for tok in self._pat.split((text or "").lower()):
                if tok:
                    pos += 1
                    yield tok, pos

    try:  # Arrow-batched UDTF exchange when this build exposes the kwarg
        return udtf(
            SplitKeywords, returnType="keyword string, pos bigint",
            useArrow=True,
        )
    except TypeError:
        return udtf(SplitKeywords, returnType="keyword string, pos bigint")


@register(
    "u4_python_udtf_keywords",
    survey="U1",
    doc="U1's TableFunction CONTRACT through Spark's native Python UDTF "
        "API: the tokenizer runs as a registered UDTF applied with SQL "
        "LATERAL (spark.udtf.register — the analog of Flink's "
        "TableFunction registration in KeywordUtil.java:16-41), "
        "Arrow-batched where the build supports it, and emits each "
        "keyword WITH its within-document ordinal. The aggregate checks "
        "count AND the ordinal checksum (SUM(pos)) per keyword, so the "
        "row-local iteration order of the UDTF — the part explode-based "
        "twins take from Catalyst — survives distributed execution and "
        "is hash-compared against DuckDB's ordinality twin. a6 is the "
        "codegen scale path for production corpus scans; this row "
        "pins the API parity.",
    oracle="""
        WITH toks AS (
            SELECT unnest(list_filter(
                       regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                       t -> length(t) > 0)) AS keyword,
                   generate_subscripts(list_filter(
                       regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                       t -> length(t) > 0), 1) AS pos
            FROM documents
        )
        SELECT keyword,
               CAST(COUNT(*) AS BIGINT) AS keyword_ct,
               CAST(SUM(pos) AS BIGINT) AS pos_sum
        FROM toks GROUP BY keyword
    """,
)
def u4_python_udtf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    import weakref

    t = Tables(spark, sf_dir)
    # register once per live session: re-registration works but logs a
    # replaced-function WARN on every repeat call, and sweep logs are
    # kept warning-free by contract
    reg = globals().setdefault("_U4_SESSIONS", weakref.WeakSet())
    if spark not in reg:
        spark.udtf.register("rtdw_split_keywords", _keyword_udtf_cls())
        reg.add(spark)
    t.documents.select("text").createOrReplaceTempView("u4_docs")
    return spark.sql(
        """
        SELECT k.keyword,
               CAST(COUNT(*) AS BIGINT) AS keyword_ct,
               CAST(SUM(k.pos) AS BIGINT) AS pos_sum
        FROM u4_docs d, LATERAL rtdw_split_keywords(d.text) k
        GROUP BY k.keyword
        """
    )
