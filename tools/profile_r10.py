"""Round-10 optimization harness: time queries with the noop sink and
capture their ``explain("formatted")`` plans to plans/r10/.

Mirrors bench.py's discipline (sf0.001 warm-up of the measured queries,
noop sink, System.gc() between reps, median of N) but for an arbitrary
focus set, and writes the physical plan alongside the numbers so every
optimization carries before/after evidence.

Usage:
    python tools/profile_r10.py --tag before --sf /root/testdata/sf0.1 q1 q2 ...
    python tools/profile_r10.py --tag after  --sf1 sim_knn_graph ...
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--sf1", action="store_true", help="use the synthesized sf1 decade")
    ap.add_argument("--tag", default=None, help="plans/r10/<query>_<tag>.txt")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--no-warm", action="store_true")
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

    spark = get_spark("profile-r10")
    qs, _ = load_all()

    warm_sf = "/root/testdata/sf0.001"
    if not args.no_warm:
        for name in args.names:
            spark.sparkContext.setJobDescription(f"warm:{name}")
            qs[name](spark, warm_sf).write.format("noop").mode("overwrite").save()

    plans_dir = os.path.join(REPO, "plans", "r10")
    os.makedirs(plans_dir, exist_ok=True)

    jvm_gc = spark.sparkContext._jvm.System.gc
    samples: dict[str, list[float]] = {n: [] for n in args.names}
    for _ in range(args.reps):
        import gc as _pygc

        _pygc.collect()
        jvm_gc()
        time.sleep(0.5)
        for name in args.names:
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples[name].append(round(time.time() - t0, 3))

    if args.tag:
        for name in args.names:
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                qs[name](spark, sf_dir).explain("formatted")
            path = os.path.join(plans_dir, f"{name}_{args.tag}.txt")
            with open(path, "w") as f:
                f.write(buf.getvalue())

    def med(xs):
        ys = sorted(xs)
        m = len(ys) // 2
        return ys[m] if len(ys) % 2 else (ys[m - 1] + ys[m]) / 2

    out = {
        "sf_dir": sf_dir,
        "loadavg": round(os.getloadavg()[0], 2),
        "queries": {n: {"median": round(med(ts), 3), "samples": ts} for n, ts in samples.items()},
    }
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
