"""CLI front door: list/apps are JVM-free; run/explain reuse the session."""

from __future__ import annotations

import subprocess
import sys

from real_time_data_warehouse_spark.__main__ import main


def test_cli_list_subprocess():
    """`list` must work as a real subprocess without starting a JVM."""
    out = subprocess.run(
        [sys.executable, "-m", "real_time_data_warehouse_spark", "list"],
        capture_output=True, text=True, cwd="/root/repo", timeout=120,
    )
    assert out.returncode == 0
    assert "q0_flagship_trade_summary" in out.stdout
    # since a2b gained its bounds oracle, EVERY registry query is
    # oracle-checked — no rows-only free passes left
    assert "(oracle)" in out.stdout and "rows-only" not in out.stdout


def test_cli_apps(capsys):
    assert main(["apps"]) == 0
    out = capsys.readouterr().out
    assert "dws_trade_sku_order" in out and "dim_app" in out


def test_cli_unknown_query(capsys):
    rc = main(["run", "flagship"])
    assert rc == 2
    err = capsys.readouterr().err
    assert "did you mean" in err and "q0_flagship_trade_summary" in err


def test_cli_run_and_explain(spark, capsys):
    assert main(["run", "a9_topk_channel", "--sf-dir", "/root/testdata/sf0.001",
                 "--limit", "3"]) == 0
    out = capsys.readouterr().out
    assert "uv_ct" in out
    assert main(["explain", "j6_dim_chain_join",
                 "--sf-dir", "/root/testdata/sf0.001"]) == 0
    out = capsys.readouterr().out
    assert "BroadcastHashJoin" in out and "shuffles: 0" in out
