"""Stage-level profile of one or more queries (guide §7.1 without the UI).

Runs each query once (after an sf0.001 warm pass) with the Spark UI
enabled, then dumps per-stage metrics from the REST status API:
duration, task count, shuffle read/write bytes, input bytes — the
evidence for "where does the wall-clock go" decisions.

Usage:
    python tools/stage_profile.py [--sf DIR | --sf1] name [name...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--sf1", action="store_true")
    ap.add_argument("--top", type=int, default=25, help="show N slowest stages")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    if args.sf1:
        from scaling_probe import SF1_DIR, _gen_sf1

        _gen_sf1()
        sf_dir = SF1_DIR
    else:
        sf_dir = args.sf

    from energy_consumption_forecasting_spark import get_spark
    from energy_consumption_forecasting_spark.queries import load_all

    spark = get_spark("stage-profile", extra_conf={"spark.ui.enabled": "true"})
    qs, _ = load_all()
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def stages():
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages") as r:
            return json.loads(r.read())

    warm_sf = "/root/testdata/sf0.001"
    for name in args.names:
        spark.sparkContext.setJobDescription(f"warm:{name}")
        qs[name](spark, warm_sf).write.format("noop").mode("overwrite").save()

    for name in args.names:
        before_ids = {s["stageId"] for s in stages()}
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        new = [s for s in stages() if s["stageId"] not in before_ids]
        new.sort(key=lambda s: -(s.get("executorRunTime") or 0))
        total_run = sum(s.get("executorRunTime") or 0 for s in new)
        print(f"\n=== {name}: wall {wall:.2f}s, {len(new)} stages, "
              f"sum executorRunTime {total_run/1000:.2f}s ===")
        print(f"{'stage':>6} {'status':>9} {'tasks':>5} {'run_ms':>8} {'cpu_ms':>8} "
              f"{'in_MB':>7} {'sh_r_MB':>8} {'sh_w_MB':>8}  name")
        for s in new[: args.top]:
            print(
                f"{s['stageId']:>6} {s['status']:>9} {s['numCompleteTasks']:>5} "
                f"{s.get('executorRunTime', 0):>8} "
                f"{int((s.get('executorCpuTime') or 0)/1e6):>8} "
                f"{(s.get('inputBytes') or 0)/1e6:>7.1f} "
                f"{(s.get('shuffleReadBytes') or 0)/1e6:>8.2f} "
                f"{(s.get('shuffleWriteBytes') or 0)/1e6:>8.2f}  "
                f"{(s.get('name') or '')[:60]}"
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
