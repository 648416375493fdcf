"""Spark-vs-DuckDB comparison mirroring the driver's t2 check:
row count + schema (column names) + order-insensitive value comparison
with columns sorted by name."""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import duckdb
import pandas as pd
from pyspark.sql import DataFrame


def _norm_cell(v):
    import numpy as np

    if v is None or v is pd.NaT or (isinstance(v, float) and math.isnan(v)):
        return "∅"
    if isinstance(v, np.integer):
        v = int(v)
    elif isinstance(v, np.floating):
        v = float(v)
        if math.isnan(v):
            return "∅"
    elif isinstance(v, np.ndarray):
        v = v.tolist()
    if isinstance(v, float):
        # exact-representation discipline: queries emit doubles derived from
        # decimals/ints, so repr is stable; tiny residue guarded by 12 sf.
        return f"{v:.12g}"
    if isinstance(v, Decimal):
        # STRICT: keep the scale (Decimal('31.40') != 31.4 under the
        # driver's exact hasher). Queries must not surface DecimalType —
        # cast to DOUBLE at exact scale (functions/money.py) — so any
        # Decimal reaching here should fail against a float oracle cell.
        return str(v)
    if isinstance(v, pd.Timestamp | datetime):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, (int, bool, str)):
        return repr(v)
    return repr(v)


def canonical_rows(pdf: pd.DataFrame) -> list[tuple]:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    rows = [tuple(_norm_cell(v) for v in row) for row in pdf.itertuples(index=False)]
    return sorted(rows)


def compare(
    spark_df: DataFrame, con: duckdb.DuckDBPyConnection, oracle: str
) -> tuple[bool, str]:
    s_pdf = spark_df.toPandas()
    d_pdf = con.execute(oracle).fetchdf()
    s_cols, d_cols = sorted(s_pdf.columns), sorted(d_pdf.columns)
    if s_cols != d_cols:
        return False, f"schema mismatch: spark={s_cols} duck={d_cols}"
    if len(s_pdf) != len(d_pdf):
        return False, f"row count mismatch: spark={len(s_pdf)} duck={len(d_pdf)}"
    s_rows, d_rows = canonical_rows(s_pdf), canonical_rows(d_pdf)
    if s_rows != d_rows:
        diffs = [
            f"  spark={a}\n  duck ={b}"
            for a, b in zip(s_rows, d_rows)
            if a != b
        ][:5]
        return False, "value mismatch (first diffs):\n" + "\n".join(diffs)
    return True, "ok"
