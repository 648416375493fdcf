"""Skew mitigation: salted two-phase aggregation.

At 100 TB a handful of hot keys (the reference's equivalent: one viral sku
or province receiving most orders) make one reducer the straggler. AQE's
skew-join splitting (enabled in session.py) covers joins; for *aggregations*
the standard fix is salting: phase 1 aggregates on (key, salt) spreading a
hot key over N reducers, phase 2 combines the partials per key. Correct for
any commutative-associative aggregate; this helper wires the partial/final
pairs for the common ones.

Cost model: adds one extra (cheap, pre-reduced) shuffle — worth it only
when key skew is real. Measure first; see tests/test_properties.py for the
equivalence property.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# agg name → (phase1 fn, phase2 fn) — phase2 combines phase1 partials.
_COMBINE: dict[str, tuple] = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str | Column, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """groupBy(keys).agg(...) computed as a salted two-phase aggregation.

    ``aggs`` maps output alias → (input column, agg name in
    {'sum','count','min','max'}). Example::

        salted_agg(events, ["event_type"],
                   {"total": ("value", "sum"), "n": ("*", "count")})
    """
    for name, (_, kind) in aggs.items():
        if kind not in _COMBINE:
            raise ValueError(f"{name}: unsupported salted agg {kind!r}")

    salt = (F.rand(seed=7) * salt_buckets).cast("int").alias("__salt")
    phase1 = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(
        *[
            _COMBINE[kind][0](F.col(c) if isinstance(c, str) else c).alias(
                f"__p_{name}"
            )
            for name, (c, kind) in aggs.items()
        ]
    )
    return phase1.groupBy(*keys).agg(
        *[
            _COMBINE[kind][1](F.col(f"__p_{name}")).alias(name)
            for name, (_, kind) in aggs.items()
        ]
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    id_col: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """Equi-join for a skewed fact key against a dim too large to
    broadcast: fact rows get a deterministic content-hash salt (no
    rand() — re-runs and engines agree), dim rows replicate across all
    ``salt_buckets`` salts, and the join key widens to (key, __salt) —
    one hot key's rows split across ``salt_buckets`` reducers instead of
    funnelling through one. The dim-side blowup is ×salt_buckets rows,
    which is the deliberate trade: replicate the small-ish side, split
    the hot side."""
    from real_time_data_warehouse_spark.functions.text import md5_hash

    salts = F.array(*[F.lit(i) for i in range(salt_buckets)])
    salted_fact = fact.withColumn(
        "__salt",
        (md5_hash(F.col(id_col).cast("string")) % salt_buckets).cast("int"),
    )
    salted_dim = dim.withColumn("__salt", F.explode(salts))
    return salted_fact.join(salted_dim, [key, "__salt"]).drop("__salt")
