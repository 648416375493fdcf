"""CLI entry point: run/inspect engine queries from the shell.

    python -m real_time_data_warehouse_spark list
    python -m real_time_data_warehouse_spark apps
    python -m real_time_data_warehouse_spark run q0_flagship_trade_summary \
        [--sf-dir /root/testdata/sf0.01] [--limit 20]
    python -m real_time_data_warehouse_spark explain j6_dim_chain_join

The reference's users launch apps via `main()` classes; this is the
equivalent front door for every registry query and app topology.
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="real_time_data_warehouse_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list registry queries")
    sub.add_parser("apps", help="list app topologies")

    run = sub.add_parser("run", help="run a query and print rows")
    run.add_argument("name")
    run.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    run.add_argument("--limit", type=int, default=20)

    exp = sub.add_parser("explain", help="print the physical plan")
    exp.add_argument("name")
    exp.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    from real_time_data_warehouse_spark.registry import QUERY_REGISTRY, query_map

    query_map()

    if args.cmd == "list":
        width = max(len(n) for n in QUERY_REGISTRY)
        for name in sorted(QUERY_REGISTRY):
            q = QUERY_REGISTRY[name]
            oracle = "oracle" if q.oracle else "rows-only"
            print(f"{name:<{width}}  [{q.survey}] ({oracle})")
        return 0

    if args.cmd == "apps":
        from real_time_data_warehouse_spark.pipelines import APP_TOPOLOGIES

        for t in APP_TOPOLOGIES:
            print(f"{t.name:<42} {t.layer:>4}  <- {', '.join(t.queries)}")
        return 0

    if args.name not in QUERY_REGISTRY:
        close = [n for n in sorted(QUERY_REGISTRY) if args.name.lower() in n]
        hint = f"; did you mean: {', '.join(close[:5])}" if close else ""
        print(f"error: unknown query {args.name!r}{hint}", file=sys.stderr)
        return 2

    from real_time_data_warehouse_spark.session import get_spark

    spark = get_spark(f"rtdw-{args.cmd}")
    df = QUERY_REGISTRY[args.name].fn(spark, args.sf_dir)
    if args.cmd == "explain":
        from real_time_data_warehouse_spark.plans.audit import (
            broadcast_join_count,
            formatted_plan,
            shuffle_count,
        )

        print(formatted_plan(df))
        print(
            f"-- shuffles: {shuffle_count(df)}, "
            f"broadcast joins: {broadcast_join_count(df)}"
        )
    else:
        df.show(args.limit, truncate=False)
        print(f"-- {args.name} on {args.sf_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
