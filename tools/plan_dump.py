"""Dump explain("formatted") for queries WITHOUT executing them —
the plan-evidence half of tools/profile_r10.py, usable for capturing
before/after snapshots from any git state regardless of host load.

Usage:
    python tools/plan_dump.py --tag before [--sf DIR] [--out DIR] q1 q2 ...
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--tag", required=True)
    ap.add_argument("--out", default=os.path.join(REPO, "plans", "r10"))
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from energy_consumption_forecasting_spark import get_spark
    from energy_consumption_forecasting_spark.queries import load_all

    spark = get_spark("plan-dump")
    qs, _ = load_all()
    os.makedirs(args.out, exist_ok=True)
    for name in args.names:
        df = qs[name](spark, args.sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(args.out, f"{name}_{args.tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
