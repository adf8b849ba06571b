"""Local stand-in for the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given sf dir, then compares row count, column names/dtypes,
and an order-insensitive value hash. Usage::

    python tools/compare.py [sf_dir] [query ...]

The comparison core lives in ``calidad_del_aire_etl_spark.oracle`` and
is also exercised by ``tests/test_oracle_parity.py`` on every pytest run.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from calidad_del_aire_etl_spark import oracle  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from calidad_del_aire_etl_spark.session import get_session

    spark = get_session("compare")
    con = oracle.duck_connection(sf_dir)
    # SPARK_GRAFT_TWIN_TIMEOUT=secs interrupts a runaway twin (the
    # quadratic dedup oracles at sf1+); prints TIMEOUT, not FAIL
    twin_timeout = float(os.environ.get("SPARK_GRAFT_TWIN_TIMEOUT", "0") or 0)

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            n, problems = oracle.compare_query(
                spark, con, fn, oracles.get(name), sf_dir,
                twin_timeout=twin_timeout,
            )
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"OK?  {name}: rows-only check, {n} rows")
        elif problems and problems[0].startswith("TIMEOUT"):
            print(f"DNF  {name}: {problems[0]}")
        elif problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            failures += 1
        else:
            print(f"PASS {name}: {n} rows")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
