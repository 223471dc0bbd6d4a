"""Two-build interleaved A/B bench (round-8 verdict item 2).

BENCH_r08 showed a ~1.4x uniform wall-clock inflation over r07 that the
builder adjudicated as host drift via a same-host A/B that was not
committed.  This tool pins that adjudication with an artifact: check
out two git refs as read-only worktrees, run a focused query set in
SEPARATE processes (each build imports only its own tree), interleaved
A,B,A,B at the process level so slow host drift hits both builds
equally, and write medians + all samples + loadavg to a committed JSON.

Each process mirrors bench.py's discipline: sf0.001 warm-up of the
measured queries, noop-sink execution, System.gc() between in-process
reps.  A query entry may carry its own sf (sim_knn_graph is probed at
the synthesized sf1).

Usage:
    python tools/bench_ab.py            # r7-HEAD vs r8-HEAD focus set
    python tools/bench_ab.py --out BENCH_r08_ab.json
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STAGE = os.path.join(REPO, ".stage")

# The focus set: the two queries the r8 verdict flagged as moving PAST
# the uniform drift band, plus two untouched drift probes it named as
# evidence the inflation was environmental.
FOCUS = [
    {"name": "a1_daily_mean", "sf": "/root/testdata/sf0.1"},
    {"name": "tpch_q3_shipping_priority", "sf": "/root/testdata/sf0.1"},
    {"name": "sim_mmr_rerank", "sf": "/root/testdata/sf0.1"},
    {"name": "sim_knn_graph", "sf": os.path.join(STAGE, "sf1")},
]

RUNNER = r'''
import json, os, sys, time
root = sys.argv[1]
plan = json.loads(sys.argv[2])
sys.path.insert(0, root)
from energy_consumption_forecasting_spark import get_spark
from energy_consumption_forecasting_spark.queries import load_all

spark = get_spark("bench-ab")
spark.sparkContext.setLogLevel("ERROR")
qs, _ = load_all()
warm_sf = "/root/testdata/sf0.001"
for q in plan:
    qs[q["name"]](spark, warm_sf).write.format("noop").mode("overwrite").save()
for q in plan:
    spark.read.parquet(os.path.join(q["sf"], "lineitem.parquet")).count() \
        if os.path.exists(os.path.join(q["sf"], "lineitem.parquet")) else None
reps = int(os.environ.get("SPARK_GRAFT_AB_REPS", "3"))
out = {q["name"]: [] for q in plan}
jvm_gc = spark.sparkContext._jvm.System.gc
for _ in range(reps):
    jvm_gc()
    for q in plan:
        t0 = time.time()
        qs[q["name"]](spark, q["sf"]).write.format("noop").mode("overwrite").save()
        out[q["name"]].append(round(time.time() - t0, 3))
print("AB_RESULT " + json.dumps({"times": out, "loadavg": os.getloadavg()[0]}))
'''


def _worktree(ref: str) -> str:
    path = os.path.join(STAGE, f"ab_{ref}")
    if not os.path.exists(os.path.join(path, "bench.py")):
        subprocess.run(
            ["git", "worktree", "add", "--detach", path, ref],
            cwd=REPO,
            check=True,
        )
    return path


def _run_build(root: str, plan: list[dict]) -> dict:
    env = dict(os.environ)
    p = subprocess.run(
        [sys.executable, "-c", RUNNER, root, json.dumps(plan)],
        capture_output=True,
        text=True,
        env=env,
    )
    for line in p.stdout.splitlines():
        if line.startswith("AB_RESULT "):
            return json.loads(line[len("AB_RESULT "):])
    raise RuntimeError(
        f"runner produced no result for {root}:\n{p.stdout[-2000:]}\n{p.stderr[-2000:]}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref-a", default="78ce216", help="r7 HEAD")
    ap.add_argument("--ref-b", default="6a427d7", help="r8 HEAD")
    ap.add_argument("--rounds", type=int, default=2,
                    help="process-level interleave rounds per build")
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_r08_ab.json"))
    ap.add_argument(
        "--focus",
        nargs="*",
        default=None,
        help="override the focus set: name@/abs/sf/dir entries "
        "(sf defaults to /root/testdata/sf0.1)",
    )
    args = ap.parse_args()
    global FOCUS
    if args.focus:
        FOCUS = [
            {
                "name": f.split("@", 1)[0],
                "sf": f.split("@", 1)[1] if "@" in f else "/root/testdata/sf0.1",
            }
            for f in args.focus
        ]

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from scaling_probe import _gen_sf1

    _gen_sf1()

    roots = {"a": _worktree(args.ref_a), "b": _worktree(args.ref_b)}
    samples: dict[str, dict[str, list[float]]] = {
        t: {q["name"]: [] for q in FOCUS} for t in roots
    }
    loads: dict[str, list[float]] = {t: [] for t in roots}
    for rnd in range(args.rounds):
        for tag in ("a", "b"):
            res = _run_build(roots[tag], FOCUS)
            for name, ts in res["times"].items():
                samples[tag][name].extend(ts)
            loads[tag].append(round(res["loadavg"], 1))
            print(f"round {rnd} build {tag}: "
                  + " ".join(f"{n}={sorted(v)[len(v)//2]:.2f}s"
                             for n, v in res["times"].items()))

    result = {
        "ref_a": args.ref_a,
        "ref_b": args.ref_b,
        "rounds": args.rounds,
        "interleave": "process-level A,B per round; 3 in-process reps each",
        "loadavg": loads,
        "queries": {},
    }
    for q in FOCUS:
        name = q["name"]
        entry = {}
        for tag in ("a", "b"):
            v = sorted(samples[tag][name])
            entry[tag] = {
                "median": v[len(v) // 2],
                "min": v[0],
                "max": v[-1],
                "samples": samples[tag][name],
            }
        entry["b_over_a"] = round(
            entry["b"]["median"] / max(entry["a"]["median"], 1e-9), 2
        )
        entry["sf"] = q["sf"]
        result["queries"][name] = entry
        print(f"{name}: A {entry['a']['median']:.2f}s vs "
              f"B {entry['b']['median']:.2f}s ({entry['b_over_a']}x)")
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
