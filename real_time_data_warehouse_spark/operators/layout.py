"""Data-layout operators (north-star extension, ext-scale): z-order
(Morton) clustering keys and the file-skipping statistics they buy.

At 100 TB the scan is the dominant cost, and the only scan a query
doesn't pay for is the file it never opens. A lakehouse `OPTIMIZE
ZORDER BY (a, b)` rewrite sorts data by the bit-interleaved rank of
both columns so every output file covers a small RECTANGLE of the
(a, b) domain — per-file min/max stats then prune scans filtered on
EITHER column (a 1-D sort gets tight spans on the sort column only;
its per-file spans of the other column cover the whole domain).
z1 computes that layout declaratively: quantize each dimension to 8
bits monotonically via its global range (the same range-bounds pass a
real OPTIMIZE collects), interleave to a 16-bit Morton key, assign
rows to 256 z-files (key >> 8), and emit the per-file min/max stats a
scan planner would prune with. Everything is exact integer arithmetic
inside whole-stage codegen; the only shuffle is the final per-file
stats aggregation, and the range-bounds pass reduces to ONE 4-value
row broadcast back (the c6/a13 scalar-broadcast pattern).

tests/test_layout.py proves the claim that makes z-order worth a
rewrite: every z-file's span is ≤ 1/16 of the domain in BOTH
dimensions simultaneously — impossible for any 1-D sort layout with
the same file count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_data_warehouse_spark.registry import register
from real_time_data_warehouse_spark.tables import Tables

_ZBITS = 8  # per-dimension quantization bits
_ZFILES_SHIFT = 8  # file id = top 8 of the 16 interleaved bits


def morton16(x8: F.Column, y8: F.Column) -> F.Column:
    """Bit-interleave two 8-bit cells to the 16-bit Morton key — a pure
    Catalyst integer expression (x takes the odd bit positions)."""
    z = F.lit(0).cast("bigint")
    for j in range(_ZBITS):
        z = (
            z
            + F.shiftleft(F.shiftright(x8, j).bitwiseAND(1), 2 * j + 1)
            + F.shiftleft(F.shiftright(y8, j).bitwiseAND(1), 2 * j)
        )
    return z


def _morton16_sql(x8: str, y8: str) -> str:
    """DuckDB twin of :func:`morton16`."""
    terms = " + ".join(
        f"((({x8} >> {j}) & 1) << {2 * j + 1}) + ((({y8} >> {j}) & 1) << {2 * j})"
        for j in range(_ZBITS)
    )
    return f"({terms})"


@register(
    "z1_zorder_layout",
    survey="ext-scale",
    doc="Z-order (Morton) clustering of orders by (o_custkey, "
        "o_orderdate): monotone 8-bit quantization of each dimension "
        "against its global range, bit-interleave, 256 z-files from the "
        "high byte, then the per-file min/max pruning stats. Each file's "
        "span is ≤ 1/16 of the domain in BOTH dimensions at once — the "
        "property that lets min/max stats prune scans filtered on either "
        "column, and that no single-column sort layout can provide "
        "(tests/test_layout.py proves both halves). Exact integer "
        "arithmetic end to end; range bounds are one 4-value broadcast.",
    oracle=f"""
        WITH bounds AS (
            SELECT CAST(MIN(o_custkey) AS BIGINT) AS minc,
                   CAST(MAX(o_custkey) AS BIGINT) AS maxc,
                   MIN(o_orderdate) AS mind,
                   CAST(date_diff('day', MIN(o_orderdate), MAX(o_orderdate))
                        AS BIGINT) AS spand
            FROM orders
        ),
        q AS (
            SELECT o.o_custkey,
                   CAST(date_diff('day', b.mind, o.o_orderdate) AS BIGINT) AS day,
                   ((o.o_custkey - b.minc) * 256) // (b.maxc - b.minc + 1) AS x8,
                   (CAST(date_diff('day', b.mind, o.o_orderdate) AS BIGINT) * 256)
                       // (b.spand + 1) AS y8
            FROM orders o CROSS JOIN bounds b
        )
        SELECT CAST({{z}} >> {_ZFILES_SHIFT} AS BIGINT) AS file_id,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(MIN(o_custkey) AS BIGINT) AS min_custkey,
               CAST(MAX(o_custkey) AS BIGINT) AS max_custkey,
               CAST(MIN(day) AS BIGINT) AS min_day,
               CAST(MAX(day) AS BIGINT) AS max_day
        FROM q
        GROUP BY file_id
    """.format(z=_morton16_sql("x8", "y8")),
)
def z1_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return zorder_file_stats(t.orders, "o_custkey", "o_orderdate")


def zorder_file_stats(
    orders: DataFrame, key_col: str, date_col: str
) -> DataFrame:
    bounds = orders.agg(
        F.min(key_col).cast("bigint").alias("minc"),
        F.max(key_col).cast("bigint").alias("maxc"),
        F.min(date_col).alias("mind"),
        F.datediff(F.max(date_col), F.min(date_col))
        .cast("bigint")
        .alias("spand"),
    )
    # DIV: exact integer division in both engines (no double rounding)
    q = orders.crossJoin(F.broadcast(bounds)).select(
        F.col(key_col),
        F.datediff(F.col(date_col), F.col("mind")).cast("bigint").alias("day"),
        F.expr(
            f"CAST((({key_col} - minc) * 256) DIV (maxc - minc + 1) AS BIGINT)"
        ).alias("x8"),
        F.expr(
            f"CAST((datediff({date_col}, mind) * 256) DIV (spand + 1) AS BIGINT)"
        ).alias("y8"),
    )
    z = morton16(F.col("x8"), F.col("y8"))
    return (
        q.select(key_col, "day", F.shiftright(z, _ZFILES_SHIFT).alias("file_id"))
        .groupBy("file_id")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.min(key_col).cast("bigint").alias("min_custkey"),
            F.max(key_col).cast("bigint").alias("max_custkey"),
            F.min("day").cast("bigint").alias("min_day"),
            F.max("day").cast("bigint").alias("max_day"),
        )
    )


# --- z2: optimizer column statistics --------------------------------------

_Z2_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


@register(
    "z2_column_stats",
    survey="ext-scale,ext-curation",
    doc="ANALYZE-TABLE statistics collection over the fact table's "
        "measure columns — row count, null count, exact NDV, min/max "
        "per column in ONE scan (the inputs a cost-based optimizer's "
        "join-reorder/broadcast decisions and a lakehouse's pruning "
        "stats both consume; z1 is the per-file layout half, z2 the "
        "per-column catalog half). The multi-distinct aggregate runs "
        "as Spark's expand + partial aggregation (map-side combine per "
        "column); at 100 TB the documented swap is HLL partials per "
        "column (the a2b/a2c machinery) — same shape, bounded state. "
        "Min/max/ndv are over RAW parquet values (no computed floats), "
        "so cross-engine equality is exact; the wide 1-row aggregate "
        "unpivots map-side.",
    oracle="""
        WITH a AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
                   {metrics}
            FROM lineitem
        )
        {selects}
    """.format(
        metrics=",\n                   ".join(
            f"CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
            f" AS {c}_nulls,\n                   "
            f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS {c}_ndv,\n"
            f"                   CAST(MIN({c}) AS DOUBLE) AS {c}_min,\n"
            f"                   CAST(MAX({c}) AS DOUBLE) AS {c}_max"
            for c in _Z2_COLS
        ),
        selects="\n        UNION ALL\n        ".join(
            f"SELECT '{c}' AS col_name, n_rows, {c}_nulls AS n_nulls, "
            f"{c}_ndv AS ndv, {c}_min AS min_v, {c}_max AS max_v FROM a"
            for c in _Z2_COLS
        ),
    ),
)
def z2_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    aggs = [F.count("*").cast("bigint").alias("n_rows")]
    for c in _Z2_COLS:
        aggs += [
            F.sum(F.col(c).isNull().cast("int")).cast("bigint").alias(f"{c}_nulls"),
            F.count_distinct(F.col(c)).cast("bigint").alias(f"{c}_ndv"),
            F.min(c).cast("double").alias(f"{c}_min"),
            F.max(c).cast("double").alias(f"{c}_max"),
        ]
    wide = t.lineitem.select(*_Z2_COLS).agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("n_rows"),
                F.col(f"{c}_nulls").alias("n_nulls"),
                F.col(f"{c}_ndv").alias("ndv"),
                F.col(f"{c}_min").alias("min_v"),
                F.col(f"{c}_max").alias("max_v"),
            )
            for c in _Z2_COLS
        ]
    )
    return wide.select(F.explode(rows).alias("s")).select("s.*")


# --- z3: compaction / file-coalescing planner ------------------------------

_Z3_TARGET = 262_144  # target bin size: 256 KiB of payload per output file
_Z3_ROW_OVERHEAD = 32  # per-row storage overhead added to the payload proxy


@register(
    "z3_compaction_plan",
    survey="ext-scale",
    doc="Small-file compaction planner (the OPTIMIZE/bin-packing half "
        "that z1's clustering rewrite runs on top of): summarize the "
        "event log into per-(day, hour) micro-files with exact byte "
        "sizes (octet_length payload + fixed row overhead), then "
        "assign each file to an output bin by EXCLUSIVE running bytes "
        f"DIV {_Z3_TARGET} — consecutive files coalesce into "
        "~target-sized writes, a bin never splits a file, and bin "
        "boundaries are a pure function of the ordered prefix sum. "
        "The prefix runs as functions/prefix.py's two-phase form "
        "(local prefixes under a day-bucketed window + one B-row "
        "offset pass) — NO global single-partition sort, the shape "
        "that survives a billion-file catalog where `SUM OVER (ORDER "
        "BY)` funnels everything through one task. All-integer "
        "arithmetic; a real compactor then shuffles by bin_id and "
        "writes one file per bin.",
    oracle=f"""
        WITH files AS (
            SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                   CAST(hour(ts) AS INT) AS hour,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(SUM(octet_length(encode(props))
                            + {_Z3_ROW_OVERHEAD}) AS BIGINT) AS bytes
            FROM events GROUP BY 1, 2
        ),
        c AS (
            SELECT *,
                   CAST(SUM(bytes) OVER (ORDER BY day, hour
                            ROWS UNBOUNDED PRECEDING) AS BIGINT)
                       AS cum_bytes
            FROM files
        )
        SELECT day, hour, n_rows, bytes, cum_bytes,
               CAST((cum_bytes - bytes) // {_Z3_TARGET} AS BIGINT) AS bin_id
        FROM c
    """,
)
def z3_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    files = (
        t.events.select(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias(
                "day"
            ),
            F.hour("ts").cast("int").alias("hour"),
            (F.octet_length("props") + F.lit(_Z3_ROW_OVERHEAD)).alias("b"),
        )
        .groupBy("day", "hour")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum("b").cast("bigint").alias("bytes"),
        )
    )
    return compaction_bins(files)


def compaction_bins(
    files: DataFrame, target: int = _Z3_TARGET
) -> DataFrame:
    """Bin assignment over any (day, hour, n_rows, bytes) file frame —
    the planted-fixture seam (tests/test_pipeline_ops.py)."""
    from real_time_data_warehouse_spark.functions.prefix import (
        bucketed_prefix,
    )

    cum = bucketed_prefix(
        files,
        F.col("day"),
        ["day", "hour"],
        {"bytes": (F.col("bytes"), F.lit(0).cast("bigint"))},
    )
    return cum.select(
        "day",
        "hour",
        "n_rows",
        "bytes",
        F.col("cum_bytes").cast("bigint").alias("cum_bytes"),
        F.expr(f"CAST((cum_bytes - bytes) DIV {target} AS BIGINT)").alias(
            "bin_id"
        ),
    )


# --- z4: snapshot diff — CDC derived from two table generations -----------

_Z4_DEL_MOD = 97  # keys deleted in the new snapshot
_Z4_UPD_MOD = 13  # keys whose totalprice changed
_Z4_INS_MOD = 41  # keys cloned as brand-new inserted rows


def snapshot_diff(
    old: DataFrame, new: DataFrame, key: str, value_cols: list[str]
) -> DataFrame:
    """(old, new) snapshots → the change log a CDC consumer wants:
    one row per changed key with change_type ∈ insert/delete/update.

    The lakehouse primitive for tables WITHOUT a change feed: a single
    co-partitioned full-outer join on the key, classification by null
    side, updates detected by direct column comparison (no row-hash —
    hash functions are engine-specific; column equality is exact and
    null-safe via <=>). At 100 TB both snapshots shuffle once on the
    key — or zero times if both are bucketed on it (the j12 layout);
    unchanged keys are dropped before anything downstream sees them,
    so the output is |changes|, not |table|."""
    o = old.select(
        F.col(key).alias("k"),
        *[F.col(c).alias(f"old_{c}") for c in value_cols],
        F.lit(1).alias("__o"),
    )
    n = new.select(
        F.col(key).alias("k"),
        *[F.col(c).alias(f"new_{c}") for c in value_cols],
        F.lit(1).alias("__n"),
    )
    j = o.join(n, "k", "full_outer")
    same = None
    for c in value_cols:
        eq = F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
        same = eq if same is None else (same & eq)
    change = (
        F.when(F.col("__o").isNull(), "insert")
        .when(F.col("__n").isNull(), "delete")
        .when(~same, "update")
    )
    return (
        j.withColumn("change_type", change)
        .where(F.col("change_type").isNotNull())
        .select(
            F.col("k").alias(key),
            "change_type",
            *[F.col(f"old_{c}") for c in value_cols],
            *[F.col(f"new_{c}") for c in value_cols],
        )
    )


@register(
    "z4_snapshot_diff",
    survey="ext-scale,S2",
    doc="Snapshot diff — CDC derived from two table generations, the "
        "lakehouse answer when a source has no change feed (the batch "
        "complement of the S2 Maxwell envelope: p12 consumes a change "
        "stream, z4 RECONSTRUCTS one): a deterministic second snapshot "
        f"of orders (every {_Z4_DEL_MOD}th key deleted, every "
        f"{_Z4_UPD_MOD}th totalprice bumped by 1.00 exactly in cents, "
        f"every {_Z4_INS_MOD}th cloned to a fresh key past max) is "
        "diffed against the base via ONE co-partitioned full-outer "
        "join; change_type classifies by null side, updates by exact "
        "null-safe column equality (decimal-exact cents arithmetic, no "
        "row hashes, no floats in the comparison). Unchanged keys "
        "drop before the aggregate, so downstream sees |changes|, not "
        "|table|. Output: per-type row counts + key checksum + summed "
        "price delta in exact cents.",
    oracle=f"""
        WITH mx AS (SELECT MAX(o_orderkey) AS m FROM orders),
        newsnap AS (
            SELECT o_orderkey AS k,
                   CAST(CASE WHEN o_orderkey % {_Z4_UPD_MOD} = 0
                        THEN CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) + 100
                        ELSE CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
                        END AS BIGINT) AS cents
            FROM orders WHERE o_orderkey % {_Z4_DEL_MOD} <> 0
            UNION ALL
            SELECT o_orderkey + mx.m AS k,
                   CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
            FROM orders CROSS JOIN mx
            WHERE o_orderkey % {_Z4_INS_MOD} = 0
        ),
        oldsnap AS (
            SELECT o_orderkey AS k,
                   CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
            FROM orders
        ),
        diff AS (
            SELECT COALESCE(o.k, n.k) AS k,
                   CASE WHEN o.k IS NULL THEN 'insert'
                        WHEN n.k IS NULL THEN 'delete'
                        WHEN o.cents <> n.cents THEN 'update'
                        END AS change_type,
                   COALESCE(n.cents, 0) - COALESCE(o.cents, 0) AS dcents
            FROM oldsnap o FULL OUTER JOIN newsnap n ON o.k = n.k
        )
        SELECT change_type,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(k) AS BIGINT) AS key_sum,
               CAST(SUM(dcents) AS BIGINT) AS delta_cents
        FROM diff WHERE change_type IS NOT NULL
        GROUP BY change_type
    """,
)
def z4_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    old = t.orders.select(
        F.col("o_orderkey").alias("key"), cents.alias("cents")
    )
    mx = t.orders.agg(F.max("o_orderkey").alias("m"))
    kept = (
        old.where(F.col("key") % _Z4_DEL_MOD != 0)
        .select(
            "key",
            F.when(
                F.col("key") % _Z4_UPD_MOD == 0, F.col("cents") + 100
            )
            .otherwise(F.col("cents"))
            .alias("cents"),
        )
    )
    inserted = (
        old.where(F.col("key") % _Z4_INS_MOD == 0)
        .crossJoin(F.broadcast(mx))  # one-row max-key scalar
        .select((F.col("key") + F.col("m")).alias("key"), "cents")
    )
    new = kept.unionByName(inserted)
    diff = snapshot_diff(
        old.withColumnRenamed("key", "o_orderkey"),
        new.withColumnRenamed("key", "o_orderkey"),
        "o_orderkey",
        ["cents"],
    )
    return diff.groupBy("change_type").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum("o_orderkey").cast("bigint").alias("key_sum"),
        F.sum(
            F.coalesce("new_cents", F.lit(0))
            - F.coalesce("old_cents", F.lit(0))
        )
        .cast("bigint")
        .alias("delta_cents"),
    )


# --- z5: per-file Bloom-filter index + file-skipping audit ------------------

# Point-lookup indexing geometry: events land in _Z5_FILES ingestion-
# order files (event_id ranges), so a given user's rows scatter across
# ~all files and zone maps (z2) prune NOTHING for "events of user X" —
# this is precisely the workload Bloom file indexes exist for
# (Parquet bloom_filter_enabled / Delta BLOOMFILTER INDEX). The filter
# is sized from the data: _Z5_BPK bits per distinct key in the fullest
# file, rounded UP to a power of two via the all-integer
# 1 << length(bin(n-1)) trick — both engines compute the identical m,
# so the whole index, not a claim about it, is oracle-checked.
_Z5_FILES = 16
_Z5_K = 3  # hash functions per key
_Z5_BPK = 8  # bits per key before power-of-two rounding
_Z5_WORD = 32  # filter stored as 32-bit words inside BIGINTs
_Z5_PROBES = 25  # present probes; the same number of ABSENT keys ride along


@register(
    "z5_bloom_file_skip",
    survey="ext-scale",
    doc="Bloom-filter FILE INDEX + skipping audit (the z2 zone-map "
        f"complement for point lookups): events are split into "
        f"{_Z5_FILES} ingestion-order files, each file builds a Bloom "
        f"filter over its distinct user_ids ({_Z5_K} md5-prefix hashes "
        f"into m bits, m = {_Z5_BPK}·max-distinct-per-file rounded to a "
        f"power of two, stored as bit_or-merged {_Z5_WORD}-bit words — "
        "the per-file index is O(m) words regardless of rows, and "
        "word-wise bit_or makes it MERGEABLE across row groups). The "
        f"probe set is {_Z5_PROBES} hash-selected PRESENT users plus "
        f"{_Z5_PROBES} ABSENT keys (max_uid+1…): present probes prove "
        "no-false-negatives (n_bloom ≥ n_actual per row, re-proved by "
        "the hash comparison), absent probes are the negative-lookup "
        "payoff — n_actual = 0 and n_skipped ≈ all files, with "
        "false_pos the measured fp rate of the sized filter. Every "
        "number is exact integer arithmetic; the grid is tiny and "
        "broadcast; the only data-scale work is one distinct-pairs "
        "shuffle.",
    oracle=f"""
        WITH span AS (
            SELECT CAST(MAX(event_id) + 1 AS BIGINT) AS sp FROM events
        ),
        pairs AS (
            SELECT DISTINCT
                   CAST(least({_Z5_FILES - 1},
                        e.event_id * {_Z5_FILES} // s.sp) AS BIGINT)
                       AS file_id,
                   e.user_id
            FROM events e CROSS JOIN span s
        ),
        mx AS (
            SELECT CAST(MAX(c) AS BIGINT) AS mx
            FROM (SELECT COUNT(*) AS c FROM pairs GROUP BY file_id)
        ),
        geom AS (
            SELECT CAST(1 AS BIGINT)
                   << length(bin({_Z5_BPK} * mx - 1)) AS m_bits
            FROM mx
        ),
        hs(h) AS (VALUES (0), (1), (2)),
        cells AS (
            SELECT p.file_id,
                   pos // {_Z5_WORD} AS word,
                   CAST(bit_or(CAST(1 AS BIGINT)
                        << CAST(pos % {_Z5_WORD} AS INT)) AS BIGINT) AS bits
            FROM (
                SELECT p0.file_id,
                       {{hash}} % g.m_bits AS pos
                FROM pairs p0 CROSS JOIN hs CROSS JOIN geom g
            ) p
            GROUP BY 1, 2
        ),
        probe_users AS (
            SELECT user_id FROM (
                SELECT DISTINCT user_id FROM events
                ORDER BY {{phash}}, user_id
                LIMIT {_Z5_PROBES}
            )
            UNION ALL
            SELECT mu.m + 1 + range FROM range({_Z5_PROBES})
            CROSS JOIN (SELECT CAST(MAX(user_id) AS BIGINT) AS m
                        FROM events) mu
        ),
        files(file_id) AS (
            SELECT CAST(range AS BIGINT) FROM range({_Z5_FILES})
        ),
        probe_pos AS (
            SELECT u.user_id, f.file_id, hs.h,
                   {{uhash}} % g.m_bits AS pos
            FROM probe_users u CROSS JOIN files f
            CROSS JOIN hs CROSS JOIN geom g
        ),
        hits AS (
            SELECT pp.user_id, pp.file_id,
                   CAST(SUM(CASE WHEN c.bits IS NOT NULL AND
                        (c.bits & (CAST(1 AS BIGINT)
                            << CAST(pp.pos % {_Z5_WORD} AS INT))) != 0
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_set
            FROM probe_pos pp
            LEFT JOIN cells c
              ON c.file_id = pp.file_id AND c.word = pp.pos // {_Z5_WORD}
            GROUP BY 1, 2
        ),
        actual AS (
            SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_actual
            FROM pairs JOIN probe_users USING (user_id)
            GROUP BY user_id
        )
        SELECT h.user_id,
               CAST(COALESCE(a.n_actual, 0) AS BIGINT) AS n_actual,
               CAST(SUM(CASE WHEN h.n_set = {_Z5_K} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_bloom,
               CAST({_Z5_FILES} - SUM(CASE WHEN h.n_set = {_Z5_K}
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_skipped,
               CAST(SUM(CASE WHEN h.n_set = {_Z5_K} THEN 1 ELSE 0 END)
                    - COALESCE(a.n_actual, 0) AS BIGINT) AS false_pos
        FROM hits h LEFT JOIN actual a USING (user_id)
        GROUP BY h.user_id, a.n_actual
    """.format(
        hash="CAST(concat('0x', substr(md5(CAST(hs.h AS VARCHAR) || ':' || "
             "CAST(p0.user_id AS VARCHAR)), 1, 8)) AS BIGINT)",
        uhash="CAST(concat('0x', substr(md5(CAST(hs.h AS VARCHAR) || ':' || "
              "CAST(u.user_id AS VARCHAR)), 1, 8)) AS BIGINT)",
        phash="CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 8))"
              " AS BIGINT)",
    ),
)
def z5_bloom_file_skip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from real_time_data_warehouse_spark.functions.text import md5_hash

    t = Tables(spark, sf_dir)
    ev = t.events.select("event_id", "user_id")
    span = ev.agg((F.max("event_id") + 1).cast("bigint").alias("sp"))
    pairs = (
        ev.crossJoin(F.broadcast(span))
        .select(
            # integer `div`, not double `/`: a double quotient landing an
            # ulp under an integer would truncate into the wrong file
            F.expr(
                f"CAST(least({_Z5_FILES - 1}, "
                f"event_id * {_Z5_FILES} div sp) AS BIGINT)"
            ).alias("file_id"),
            "user_id",
        )
        .distinct()
        .localCheckpoint(eager=True)  # feeds cells, geometry AND actual
    )
    geom = (
        pairs.groupBy("file_id")
        .agg(F.count("*").alias("c"))
        .agg(F.max("c").alias("mc"))
        # python F.shiftleft takes only literal bit counts; the SQL
        # builtin accepts a column expression
        .select(
            F.expr(
                "CAST(shiftleft(CAST(1 AS BIGINT), "
                f"length(bin({_Z5_BPK} * mc - 1))) AS BIGINT)"
            ).alias("m_bits")
        )
    )

    def _pos(h_col, key_col):
        return md5_hash(
            F.concat_ws(":", h_col.cast("string"), key_col.cast("string"))
        ) % F.col("m_bits")

    hs = F.explode(F.array(*[F.lit(h) for h in range(_Z5_K)])).alias("h")
    cells = (
        pairs.crossJoin(F.broadcast(geom))
        .select("file_id", "user_id", "m_bits", hs)
        .select(
            "file_id",
            _pos(F.col("h"), F.col("user_id")).alias("pos"),
        )
        .select(
            "file_id",
            (F.col("pos") / _Z5_WORD).cast("bigint").alias("word"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), "
                f"CAST(pos % {_Z5_WORD} AS INT))"
            ).alias("bit"),
        )
        .groupBy("file_id", "word")
        .agg(F.bit_or("bit").cast("bigint").alias("bits"))
    )
    present = (
        ev.select("user_id")
        .distinct()
        .orderBy(md5_hash(F.col("user_id").cast("string")), F.col("user_id"))
        .limit(_Z5_PROBES)
    )
    # the same number of ABSENT keys — the negative-lookup case a Bloom
    # file index exists for (expected n_actual=0, n_skipped≈all files,
    # false_pos = the measured fp rate of the sized filter)
    mx_uid = ev.agg(F.max("user_id").cast("bigint").alias("m"))
    absent = (
        spark.range(_Z5_PROBES)
        .crossJoin(F.broadcast(mx_uid))
        .select((F.col("m") + 1 + F.col("id")).alias("user_id"))
    )
    probe_users = present.unionByName(absent)
    files = spark.range(_Z5_FILES).select(F.col("id").alias("file_id"))
    probe_pos = (
        probe_users.crossJoin(F.broadcast(files))
        .crossJoin(F.broadcast(geom))
        .select("user_id", "file_id", "m_bits", hs)
        .select(
            "user_id",
            "file_id",
            _pos(F.col("h"), F.col("user_id")).alias("pos"),
        )
    )
    hits = (
        probe_pos.join(
            F.broadcast(cells),
            (probe_pos["file_id"] == cells["file_id"])
            # / 32 is a power-of-two divide — exact in doubles, same
            # value as the oracle's integer // 32
            & ((F.col("pos") / _Z5_WORD).cast("bigint") == cells["word"]),
            "left",
        )
        .select(
            "user_id",
            probe_pos["file_id"].alias("file_id"),
            F.when(
                F.col("bits").isNotNull()
                & (
                    F.col("bits").bitwiseAND(
                        F.expr(
                            "shiftleft(CAST(1 AS BIGINT), "
                            f"CAST(pos % {_Z5_WORD} AS INT))"
                        )
                    )
                    != 0
                ),
                1,
            )
            .otherwise(0)
            .alias("set_flag"),
        )
        .groupBy("user_id", "file_id")
        .agg(F.sum("set_flag").cast("bigint").alias("n_set"))
    )
    actual = (
        pairs.join(F.broadcast(probe_users), "user_id")
        .groupBy("user_id")
        .agg(F.count("*").cast("bigint").alias("n_actual"))
    )
    is_hit = F.when(F.col("n_set") == _Z5_K, 1).otherwise(0)
    return (
        hits.groupBy("user_id")
        .agg(F.sum(is_hit).cast("bigint").alias("n_bloom"))
        .join(F.broadcast(actual), "user_id", "left")
        .withColumn(
            "n_actual", F.coalesce("n_actual", F.lit(0)).cast("bigint")
        )
        .select(
            "user_id",
            "n_actual",
            "n_bloom",
            (F.lit(_Z5_FILES) - F.col("n_bloom"))
            .cast("bigint")
            .alias("n_skipped"),
            (F.col("n_bloom") - F.col("n_actual"))
            .cast("bigint")
            .alias("false_pos"),
        )
    )
