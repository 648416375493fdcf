"""Stateful record-at-a-time operators — SURVEY.md §2.6 (ST1-ST6).

The heart of the reference: keyed ValueState + TTL patterns (dedup by
retraction, first-event-per-day UV, visitor-flag repair, 8-day returning
user). Spark-first mapping: in streaming these are
``withWatermark().dropDuplicates()`` and ``applyInPandasWithState``
(see streaming/stateful.py for the streaming forms); their *batch-equivalent
semantics* — registered here for the oracle — are window functions
(``row_number/min/lag over (partition by key)``), which is exactly the
deterministic definition of what the keyed state computes over a finite
input.

Scale notes: one shuffle on the state key (same as Flink's keyBy); at
100 TB the window functions run as sort-within-partition after a hash
exchange; no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from real_time_data_warehouse_spark.functions.money import oracle_dec_sum
from real_time_data_warehouse_spark.registry import register
from real_time_data_warehouse_spark.tables import Tables


@register(
    "st1_dedup_last_wins",
    survey="ST1,ST2",
    doc="Retraction/dedup: keep the latest record per business key "
        "(DwsTradeSkuOrderWindow.java:190-223 negates-then-replaces; the net "
        "effect over a finite stream is last-write-wins). Key = (user_id, "
        "event_type) as the order_detail id analog.",
    oracle="""
        SELECT user_id, event_type, event_id AS last_event_id,
               CAST(value AS DOUBLE) AS last_value
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY user_id, event_type
                ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ) WHERE rn = 1
    """,
)
def st1_dedup_last_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        t.events.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("last_event_id"),
            F.col("value").cast("double").alias("last_value"),
        )
    )


@register(
    "st3_visitor_state_fix",
    survey="ST3",
    doc="New/old-visitor flag repair (DwdBaseLog.java:121-188): is_new=1 "
        "only on the user's first-ever visit date; later days rewritten "
        "to 0. State = first visit date per mid → min(date) over partition.",
    oracle="""
        SELECT event_id, user_id,
               strftime(date_trunc('day', ts), '%Y-%m-%d') AS visit_date,
               CAST(CASE WHEN date_trunc('day', ts) =
                         MIN(date_trunc('day', ts)) OVER (PARTITION BY user_id)
                    THEN 1 ELSE 0 END AS INT) AS is_new
        FROM events
    """,
)
def st3_visitor_state_fix(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    day = F.date_trunc("day", "ts")
    first_day = F.min(day).over(Window.partitionBy("user_id"))
    return t.events.select(
        "event_id",
        "user_id",
        F.date_format(day, "yyyy-MM-dd").alias("visit_date"),
        F.when(day == first_day, 1).otherwise(0).cast("int").alias("is_new"),
    )


@register(
    "st4_first_per_day_uv",
    survey="ST4,A4",
    doc="First-event-per-day detection → daily UV "
        "(DwsTrafficVcChArIsNewPageViewWindow.java:58-106): keyed "
        "lastVisitDate state emits 1 on date change; batch equivalent "
        "row_number per (user, day) = 1, then daily count.",
    oracle="""
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS cur_date,
               CAST(COUNT(*) AS BIGINT) AS uv_ct
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY user_id, date_trunc('day', ts)
                ORDER BY ts, event_id) AS rn
            FROM events
        ) WHERE rn = 1
        GROUP BY date_trunc('day', ts)
    """,
)
def st4_first_per_day_uv(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    day = F.date_trunc("day", "ts")
    w = Window.partitionBy("user_id", day).orderBy("ts", "event_id")
    firsts = (
        t.events.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    )
    return firsts.groupBy(
        F.date_format(day, "yyyy-MM-dd").alias("cur_date")
    ).agg(F.count("*").alias("uv_ct"))


@register(
    "st5_returning_user",
    survey="ST5",
    doc="UU + returning-user (DwsUserUserLoginWindow.java:80-124): uu on "
        "date change; 'back' when the gap since last login ≥ 8 days. State "
        "= last_login_date per uid → lag(date) over partition. The "
        "streaming form (applyInPandasWithState) lives in "
        "streaming/stateful.py; this is its batch-deterministic twin.",
    oracle="""
        WITH logins AS (
            SELECT user_id, date_trunc('day', ts) AS d,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id, date_trunc('day', ts)
                       ORDER BY ts, event_id) AS rn
            FROM events WHERE event_type IN ('signup', 'click')
        ), daily AS (
            SELECT user_id, d,
                   LAG(d) OVER (PARTITION BY user_id ORDER BY d) AS prev_d
            FROM logins WHERE rn = 1
        )
        SELECT strftime(d, '%Y-%m-%d') AS cur_date,
               CAST(COUNT(*) AS BIGINT) AS uu_ct,
               CAST(SUM(CASE WHEN prev_d IS NOT NULL
                             AND datediff('day', prev_d, d) >= 8
                        THEN 1 ELSE 0 END) AS BIGINT) AS back_ct
        FROM daily GROUP BY d
    """,
)
def st5_returning_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One hash exchange on user_id serves BOTH windows: first-of-day
    # detection via lag(day) over the user partition, then prev-day lookup
    # over the filtered (still user_id-distributed) rows — Spark sees the
    # required distribution already satisfied and plans no second shuffle.
    # (The naive row_number-per-(user,day) + lag-per-user form costs 3
    # exchanges; this costs 2: user_id + the final daily groupBy.)
    t = Tables(spark, sf_dir)
    day = F.date_trunc("day", "ts")
    logins = t.events.where(F.col("event_type").isin("signup", "click"))
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = logins.withColumn("d", day).withColumn(
        "first_of_day",
        F.lag("d").over(w_user).isNull() | (F.lag("d").over(w_user) != F.col("d")),
    )
    daily = marked.where("first_of_day").withColumn(
        "prev_d", F.lag("d").over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
    )
    return daily.groupBy(F.date_format("d", "yyyy-MM-dd").alias("cur_date")).agg(
        F.count("*").alias("uu_ct"),
        F.sum(
            F.when(
                F.col("prev_d").isNotNull()
                & (F.datediff("d", "prev_d") >= 8),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("back_ct"),
    )


@register(
    "st6_session_count",
    survey="ST6",
    doc="Session detection: new session when no prior event within 30 min "
        "(the reference's last_page_id-empty rule, "
        "DwsTrafficVcChArIsNewPageViewWindow.java:86-88, generalized to a "
        "session-gap rule); per-user session counts.",
    oracle="""
        WITH marked AS (
            SELECT user_id, ts,
                   CASE WHEN LAG(ts) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id) IS NULL
                             OR epoch(ts) - epoch(LAG(ts) OVER (
                                 PARTITION BY user_id ORDER BY ts, event_id)) > 1800
                        THEN 1 ELSE 0 END AS is_new_session
            FROM events
        )
        SELECT user_id, CAST(SUM(is_new_session) AS BIGINT) AS session_ct
        FROM marked GROUP BY user_id
    """,
)
def st6_session_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    # timestamp→double keeps the fractional seconds (matches DuckDB epoch());
    # unix_timestamp would truncate and disagree at gap boundaries.
    marked = t.events.withColumn(
        "is_new_session",
        F.when(
            prev_ts.isNull()
            | ((F.col("ts").cast("double") - prev_ts.cast("double")) > 1800),
            1,
        ).otherwise(0),
    )
    return marked.groupBy("user_id").agg(
        F.sum("is_new_session").cast("bigint").alias("session_ct")
    )


@register(
    "st8_scd2_intervals",
    survey="ST1,S8,ext-scale",
    doc="SCD type-2 history from a CDC-style stream: per user, runs of "
        "equal event_type collapse to one VERSION with "
        "[valid_from, valid_to) bounds (valid_to = next version's start, "
        "NULL while current) and a version sequence number. The "
        "reference's dim layer keeps only the LATEST row per key "
        "(HBaseSinkFunction.java upsert semantics); SCD2 is the "
        "warehouse-native history-preserving alternative, built from the "
        "same change stream with two window passes (change-point "
        "detection via lag, interval close via lead) — both on the SAME "
        "(user_id x time) partitioning, so Catalyst plans ONE shuffle "
        "and both windows run in a single sort.",
    oracle="""
        WITH ordered AS (
            SELECT user_id, event_type, ts,
                   LAG(event_type) OVER w AS prev_type
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        changes AS (
            SELECT user_id, event_type, ts AS valid_from
            FROM ordered
            WHERE prev_type IS NULL OR prev_type <> event_type
        )
        SELECT user_id, event_type, valid_from,
               LEAD(valid_from) OVER w2 AS valid_to,
               CAST(ROW_NUMBER() OVER w2 AS INT) AS version,
               CAST(CASE WHEN LEAD(valid_from) OVER w2 IS NULL
                    THEN 1 ELSE 0 END AS INT) AS is_current
        FROM changes
        WINDOW w2 AS (PARTITION BY user_id ORDER BY valid_from)
    """,
)
def st8_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        t.events.withColumn("prev_type", F.lag("event_type").over(w))
        .where(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
        .select("user_id", "event_type", F.col("ts").alias("valid_from"))
    )
    w2 = Window.partitionBy("user_id").orderBy("valid_from")
    return changes.select(
        "user_id",
        "event_type",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        F.row_number().over(w2).cast("int").alias("version"),
        F.when(F.lead("valid_from").over(w2).isNull(), 1)
        .otherwise(0)
        .cast("int")
        .alias("is_current"),
    )


@register(
    "st9_retract_changelog",
    survey="ST1,J2,F9",
    doc="Retract-changelog PRODUCER: the keyed event stream, read as "
        "upserts of (user_id -> value), emitted as Flink-style changelog "
        "rows — '+I' for a key's first value, then a '-U'/'+U' pair per "
        "update (Test02_SQL_JOIN.java:64-71 documents the reference's "
        "retract mechanics; DwsTradeSkuOrderWindow.java:190-223 consumes "
        "them). The repo's standing design maps retract CONSUMPTION to "
        "net-equivalent last-wins dedup (ST1, SURVEY §7.4.1); this "
        "operator is the other direction — producing the changelog a "
        "downstream Flink-compatible consumer would expect, as one "
        "window pass plus a map-side explode (no second shuffle).",
    oracle="""
        WITH x AS (
            SELECT user_id, ts, event_id, value,
                   LAG(value) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS prev
            FROM events
        )
        SELECT user_id, ts, event_id, '+I' AS op,
               CAST(value AS DOUBLE) AS value
        FROM x WHERE prev IS NULL
        UNION ALL
        SELECT user_id, ts, event_id, '-U',
               CAST(prev AS DOUBLE) FROM x WHERE prev IS NOT NULL
        UNION ALL
        SELECT user_id, ts, event_id, '+U',
               CAST(value AS DOUBLE) FROM x WHERE prev IS NOT NULL
    """,
)
def st9_retract_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    rows = t.events.withColumn("prev", F.lag("value").over(w))
    changes = F.when(
        F.col("prev").isNull(),
        F.array(F.struct(F.lit("+I").alias("op"), F.col("value").alias("v"))),
    ).otherwise(
        F.array(
            F.struct(F.lit("-U").alias("op"), F.col("prev").alias("v")),
            F.struct(F.lit("+U").alias("op"), F.col("value").alias("v")),
        )
    )
    return rows.select(
        "user_id", "ts", "event_id", F.explode(changes).alias("c")
    ).select(
        "user_id",
        "ts",
        "event_id",
        F.col("c.op").alias("op"),
        F.col("c.v").cast("double").alias("value"),
    )


@register(
    "st10_changelog_fold",
    survey="ST1,A1,ext-scale",
    doc="Retract-changelog CONSUMER — incremental materialized-view "
        "maintenance: fold st9's '+I'/'-U'/'+U' stream into per-user "
        "state by signed DECIMAL sum (retracts subtract exactly, so "
        "every superseded value telescopes away) and the folded state "
        "must equal the plain last-wins read of the same events. That "
        "equality IS the retract algebra the reference's DWS windows "
        "rely on (DwsTradeSkuOrderWindow.java:190-223): a downstream "
        "view can apply the changelog row-by-row, in any order within a "
        "key, without ever re-reading the base table. DECIMAL(18,2) "
        "makes the cancellation exact — a double fold would leave "
        "1e-13 residue and break the equality. One shuffle (the keyed "
        "fold); changelog expansion stays map-side.",
    oracle="""
        WITH last AS (
            SELECT user_id, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) rn,
                   COUNT(*) OVER (PARTITION BY user_id) AS n_events
            FROM events
        )
        SELECT user_id,
               CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS folded_value,
               CAST(2 * n_events - 1 AS BIGINT) AS n_changelog_ops
        FROM last WHERE rn = 1
    """,
)
def st10_changelog_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    from real_time_data_warehouse_spark.functions.money import dec

    changelog = st9_retract_changelog(spark, sf_dir)
    signed = F.when(F.col("op") == "-U", -dec("value")).otherwise(dec("value"))
    return (
        changelog.groupBy("user_id")
        .agg(
            F.sum(signed).cast("double").alias("folded_value"),
            F.count("*").cast("bigint").alias("n_changelog_ops"),
        )
    )


@register(
    "st11_funnel",
    survey="ST4,ST6,ext-scale",
    doc="Ordered conversion funnel (view → click → purchase, strictly "
        "increasing event time, each stage within 12 h of the previous): "
        "per user, t1 = first view, t2 = first click in (t1, t1+12h], "
        "t3 = first purchase in (t2, t2+12h]; output is users "
        "surviving each stage (the window makes real attrition: "
        "150 → 37 → 7 on the fixture). ONE shuffle: events sort into per-user "
        "arrays (collect_list + array_sort) and the sequential stage "
        "logic runs as a pure-Catalyst aggregate() fold over each "
        "array — no per-stage self-joins re-shuffling the event stream "
        "(the reference's KeyedProcessFunction sequencing, declarative). "
        "The oracle computes the same chain via 3-stage conditional "
        "minima, which is equivalent because the greedy-earliest chain "
        "IS the stage-min chain; stage conditions are strict ts "
        "comparisons, so counts are tie-safe.",
    oracle="""
        WITH s1 AS (
            SELECT user_id,
                   MIN(CASE WHEN event_type = 'view' THEN ts END) AS t1
            FROM events GROUP BY user_id
        ),
        s2 AS (
            SELECT e.user_id, MIN(e.ts) AS t2
            FROM events e JOIN s1 USING (user_id)
            WHERE e.event_type = 'click' AND s1.t1 IS NOT NULL
              AND e.ts > s1.t1 AND e.ts <= s1.t1 + INTERVAL 12 HOUR
            GROUP BY e.user_id
        ),
        s3 AS (
            SELECT e.user_id, MIN(e.ts) AS t3
            FROM events e JOIN s2 USING (user_id)
            WHERE e.event_type = 'purchase'
              AND e.ts > s2.t2 AND e.ts <= s2.t2 + INTERVAL 12 HOUR
            GROUP BY e.user_id
        )
        SELECT * FROM (
            SELECT 'view' AS step, CAST(COUNT(t1) AS BIGINT) AS n_users FROM s1
            UNION ALL
            SELECT 'view>click', CAST(COUNT(t2) AS BIGINT) FROM s2
            UNION ALL
            SELECT 'view>click>purchase', CAST(COUNT(t3) AS BIGINT) FROM s3
        )
    """,
)
def st11_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    evs = t.events.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "event_type"))
        ).alias("seq")
    )
    init = F.struct(
        F.lit(None).cast("timestamp").alias("t1"),
        F.lit(None).cast("timestamp").alias("t2"),
        F.lit(None).cast("timestamp").alias("t3"),
    )

    def step(acc, e):
        take1 = acc["t1"].isNull() & (e["event_type"] == "view")
        take2 = (
            acc["t1"].isNotNull()
            & acc["t2"].isNull()
            & (e["event_type"] == "click")
            & (e["ts"] > acc["t1"])
            & (e["ts"] <= acc["t1"] + F.expr("INTERVAL 12 HOURS"))
        )
        take3 = (
            acc["t2"].isNotNull()
            & acc["t3"].isNull()
            & (e["event_type"] == "purchase")
            & (e["ts"] > acc["t2"])
            & (e["ts"] <= acc["t2"] + F.expr("INTERVAL 12 HOURS"))
        )
        return F.struct(
            F.when(take1, e["ts"]).otherwise(acc["t1"]).alias("t1"),
            F.when(take2, e["ts"]).otherwise(acc["t2"]).alias("t2"),
            F.when(take3, e["ts"]).otherwise(acc["t3"]).alias("t3"),
        )

    stages = evs.select(F.aggregate("seq", init, step).alias("s"))
    counts = stages.agg(
        F.count("s.t1").cast("bigint").alias("n1"),
        F.count("s.t2").cast("bigint").alias("n2"),
        F.count("s.t3").cast("bigint").alias("n3"),
    )
    steps = F.array(
        F.struct(F.lit("view").alias("step"), F.col("n1").alias("n_users")),
        F.struct(F.lit("view>click").alias("step"), F.col("n2").alias("n_users")),
        F.struct(
            F.lit("view>click>purchase").alias("step"),
            F.col("n3").alias("n_users"),
        ),
    )
    return counts.select(F.explode(steps).alias("r")).select(
        F.col("r.step").alias("step"), F.col("r.n_users").alias("n_users")
    )


@register(
    "st12_transition_matrix",
    survey="ST6,W9,ext-scale",
    doc="Clickstream transition matrix — the page-flow / Markov-chain "
        "rollup: per user, order events by (ts, event_id) and count "
        "each (event_type → next event_type) transition, then the "
        "row-normalized transition probability. ONE per-user window "
        "(lead) and one partial→final aggregate; probabilities are "
        "exact-integer ratios under the floor(x·10⁴+0.5) rounding "
        "rule, counts are bigint. The per-user sequencing is the "
        "reference's keyed-state ordering (ST6 session logic) read "
        "declaratively.",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type,
                   LEAD(event_type) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS nxt
            FROM events
        ),
        trans AS (
            SELECT event_type AS src, nxt AS dst,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM seq WHERE nxt IS NOT NULL GROUP BY event_type, nxt
        ),
        tot AS (
            SELECT src, SUM(n) AS n_src FROM trans GROUP BY src
        )
        SELECT t.src, t.dst, t.n,
               CAST(floor(CAST(t.n AS DOUBLE) / tt.n_src * 10000 + 0.5)
                    / 10000 AS DOUBLE) AS p
        FROM trans t JOIN tot tt USING (src)
    """,
)
def st12_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        t.events.select(
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        )
        .where(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count("*").cast("bigint").alias("n"))
        # materialized once: the row-total branch must NOT re-run the
        # window + aggregate lineage a second time (the t9 discipline)
        .localCheckpoint(eager=True)
    )
    tot = trans.groupBy("src").agg(F.sum("n").alias("n_src"))
    return (
        trans.join(F.broadcast(tot), "src")
        .select(
            "src",
            "dst",
            "n",
            (
                F.floor(
                    F.col("n").cast("double") / F.col("n_src") * 10000
                    + F.lit(0.5)
                )
                / 10000
            )
            .cast("double")
            .alias("p"),
        )
    )


# --- st13: gap-based sessionization ---------------------------------------

# 8 h of inactivity closes a session. The reference counts sessions
# statelessly (ST6: last_page_id empty => new session,
# DwsTrafficVcChArIsNewPageViewWindow.java:86-88); gap-based
# sessionization is the warehouse-native generalization when the event
# stream carries no explicit session marker.
SESSION_GAP_S = 28800


@register(
    "st13_sessionization",
    survey="ST6,W8,ext-scale",
    doc=f"Gap-based sessionization: per user, events separated by more "
        f"than {SESSION_GAP_S} s of inactivity start a new session "
        "(lag -> break flag -> running sum = session number: the "
        "island trick); sessions roll up to [start, end], event count "
        "and an exact DECIMAL value sum. The reference's session notion "
        "is a stateless marker (ST6); this is the stateful equivalent "
        "every clickstream warehouse actually ships, and the batch "
        "oracle for the streaming twin in streaming/sessionize.py. "
        "Shape: lag, cumulative sum, and the rollup all share ONE hash "
        "exchange on user_id (the groupBy keys extend the window "
        "partition key, so Catalyst reuses the distribution); per-user "
        "state is one open session row -- the same bound a keyed stream "
        "processor carries.",
    oracle=f"""
        WITH brk AS (
            SELECT user_id, ts, value, event_id,
                   CASE WHEN LAG(ts) OVER w IS NULL
                          OR epoch(ts) - epoch(LAG(ts) OVER w)
                             > {SESSION_GAP_S}
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sess AS (
            SELECT user_id, ts, value,
                   -- event_id tie-break: same total order as brk's
                   -- window and the Spark twin, so duplicate-ts rows
                   -- cannot make the ROWS-frame sum nondeterministic
                   SUM(is_new) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS session_seq
            FROM brk
        )
        SELECT user_id, CAST(session_seq AS INT) AS session_seq,
               MIN(ts) AS session_start, MAX(ts) AS session_end,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               {oracle_dec_sum('value', 'value_sum')}
        FROM sess GROUP BY user_id, session_seq
    """,
)
def st13_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sessionize_events(Tables(spark, sf_dir).events)


def sessionize_events(events: DataFrame) -> DataFrame:
    """(user_id, ts, value, event_id) frame → gap sessions (the st13
    body, exposed so tests can run it on planted/random streams)."""
    from real_time_data_warehouse_spark.functions.money import dec

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # timestamp -> double keeps fractional seconds (matches DuckDB epoch())
    sec = F.col("ts").cast("double")
    brk = events.select(
        "user_id",
        "ts",
        "value",
        "event_id",
        F.when(
            F.lag(sec).over(w).isNull()
            | (sec - F.lag(sec).over(w) > SESSION_GAP_S),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    wcum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = brk.withColumn(
        "session_seq", F.sum("is_new").over(wcum).cast("int")
    )
    return sess.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").cast("bigint").alias("n_events"),
        F.sum(dec("value")).cast("double").alias("value_sum"),
    )
