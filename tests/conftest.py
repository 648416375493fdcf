from __future__ import annotations

import duckdb
import pytest

from real_time_data_warehouse_spark.session import get_spark
from real_time_data_warehouse_spark.tables import TABLES

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("rtdw-tests", cpus=8)
    yield s
    s.stop()


def make_duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """DuckDB connection with the fixture tables pre-registered as views,
    mirroring the driver's oracle environment. Handles both layouts: the
    driver's single-file tables and Spark-written parquet directories."""
    import os

    con = duckdb.connect()
    for name in TABLES:
        path = f"{sf_dir}/{name}.parquet"
        pattern = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{pattern}')"
        )
    return con


@pytest.fixture(scope="session")
def duck():
    con = make_duck(SF_DIR)
    yield con
    con.close()


def write_stream_file(df, src_dir: str, name: str) -> None:
    """Write *df* as ONE parquet file ``{src_dir}/{name}.parquet`` — a
    single micro-batch for the file-source streams. Sleeps briefly so file
    mtimes order batches deterministically (maxFilesPerTrigger=1 processes
    oldest-first). Shared by every streaming test that crafts sources."""
    import os
    import shutil
    import tempfile
    import time

    os.makedirs(src_dir, exist_ok=True)
    stage = tempfile.mkdtemp(prefix="stage_")
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    part = next(p for p in os.listdir(stage) if p.endswith(".parquet"))
    shutil.move(os.path.join(stage, part), os.path.join(src_dir, f"{name}.parquet"))
    shutil.rmtree(stage, ignore_errors=True)
    time.sleep(1.1)
