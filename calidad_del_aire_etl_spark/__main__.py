"""Command-line front door: run, list, or explain any registered query.

    python -m calidad_del_aire_etl_spark list [substring]
    python -m calidad_del_aire_etl_spark run <query> [--sf-dir D] [--limit N]
                                                     [--out PATH] [--csv]
    python -m calidad_del_aire_etl_spark explain <query> [--sf-dir D]
    python -m calidad_del_aire_etl_spark oracle <query>

`run` prints the first --limit rows (default 20) or writes parquet/CSV
to --out; `explain` prints the formatted physical plan (the same view
tools/plan_audit.py audits); `oracle` prints the query's DuckDB twin
SQL. The data directory defaults to $SPARK_GRAFT_SF_DIR or
/root/testdata/sf0.01.
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="calidad_del_aire_etl_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    p_list = sub.add_parser("list", help="list registered queries")
    p_list.add_argument("substring", nargs="?", default="")

    default_sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    p_run = sub.add_parser("run", help="execute a query")
    p_run.add_argument("query")
    p_run.add_argument("--sf-dir", default=default_sf)
    p_run.add_argument("--limit", type=int, default=20)
    p_run.add_argument("--out", default=None, help="write result here instead of printing")
    p_run.add_argument("--csv", action="store_true", help="write CSV (default parquet)")

    p_exp = sub.add_parser("explain", help="print the formatted physical plan")
    p_exp.add_argument("query")
    p_exp.add_argument("--sf-dir", default=default_sf)

    p_orc = sub.add_parser("oracle", help="print the query's DuckDB twin SQL")
    p_orc.add_argument("query")

    a = p.parse_args(argv)
    from . import registry

    qs = registry.queries()

    if a.cmd == "list":
        names = sorted(n for n in qs if a.substring in n)
        oracles = registry.oracle_sql()
        for n in names:
            print(f"{n}{'' if n in oracles else '  (rows-only)'}")
        print(f"-- {len(names)} queries", file=sys.stderr)
        return 0

    if a.cmd == "oracle":
        sql = registry.oracle_sql().get(a.query)
        if sql is None:
            print(f"{a.query}: no oracle (rows-only) or unknown query", file=sys.stderr)
            return 1
        print(sql)
        return 0

    if a.query not in qs:
        print(f"unknown query: {a.query} (try `list`)", file=sys.stderr)
        return 1

    from .session import get_session

    spark = get_session(f"cli:{a.query}")
    df = qs[a.query](spark, a.sf_dir)
    if a.cmd == "explain":
        print(df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        ))
        return 0
    if a.out:
        w = df.write.mode("overwrite")
        (w.option("header", "true").csv(a.out) if a.csv else w.parquet(a.out))
        print(f"wrote {a.out}")
    else:
        df.show(a.limit, truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
