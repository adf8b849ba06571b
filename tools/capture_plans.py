"""Capture .explain("formatted") for named queries into plans/r<N>/.

Usage:
  python tools/capture_plans.py r14 before q1 q2 ...   # -> plans/r14/<q>_before.txt
  python tools/capture_plans.py r14 after q1 q2 ...    # -> plans/r14/<q>_after.txt

With no query names, captures every bench HEADLINE query. The suffix is
free-form so scratch captures (e.g. "exp1") don't clobber the committed
before/after evidence.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    rnd, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    from bench import HEADLINE
    from calidad_del_aire_etl_spark import registry
    from calidad_del_aire_etl_spark.session import get_session

    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", rnd
    )
    os.makedirs(outdir, exist_ok=True)
    spark = get_session("capture_plans")
    qs = registry.queries()
    for name in names or HEADLINE:
        try:
            df = qs[name](spark, SF)
            p = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # pragma: no cover
            p = f"ERROR constructing {name}: {type(e).__name__}: {e}"
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"-- {name} @ {SF} --\n")
            fh.write(p)
            if not p.endswith("\n"):
                fh.write("\n")
        print(path)
    spark.stop()


if __name__ == "__main__":
    main()
