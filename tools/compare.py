"""Local stand-in for the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given sf dir, then compares row count, column names/dtypes,
and an order-insensitive value hash. Usage::

    python tools/compare.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_frame(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
    return df


def value_hash(df: pd.DataFrame) -> str:
    df = norm_frame(df.copy())
    if len(df) == 0:
        return "empty"
    rows = sorted(
        df.astype(str).apply(lambda r: "\x1f".join(r.values), axis=1).tolist()
    )
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from calidad_del_aire_etl_spark.session import get_session

    spark = get_session("compare")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"OK?  {name}: rows-only check, {len(sdf)} rows")
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        sdf, ddf = norm_frame(sdf), norm_frame(ddf)
        problems = []
        if len(sdf) != len(ddf):
            problems.append(f"rowcount {len(sdf)} vs {len(ddf)}")
        if list(sdf.columns) != list(ddf.columns):
            problems.append(f"cols {list(sdf.columns)} vs {list(ddf.columns)}")
        elif [str(t) for t in sdf.dtypes] != [str(t) for t in ddf.dtypes]:
            problems.append(
                f"dtypes {[str(t) for t in sdf.dtypes]} vs {[str(t) for t in ddf.dtypes]}"
            )
        if not problems and value_hash(sdf) != value_hash(ddf):
            merged = sdf.merge(ddf, how="outer", indicator=True)
            diff = merged[merged["_merge"] != "both"]
            problems.append(f"value-hash mismatch ({len(diff)} differing rows)")
            if len(diff) > 0:
                print(diff.head(6).to_string())
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            failures += 1
        else:
            print(f"PASS {name}: {len(sdf)} rows")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
