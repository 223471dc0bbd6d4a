"""Compare two bench JSON outputs per-query and flag regressions.

Usage:
    python tools/bench_diff.py BENCH_r01.json /tmp/bench_r3.json [--ratio 2.0]

Accepts either the raw one-line bench.py output or the driver's
BENCH_r{N}.json wrapper ({"parsed": {...}}).  Exit code 1 if any query
regressed by more than --ratio, so the check can gate a round script.

Spread-aware (round-6 item 6): when the OLD record carries per-query
"spread" ([min, max] over bench.py's repetitions), a query is flagged
only when the new median exceeds ratio × max(old_median, old_max) —
i.e. the regression must clear the recorded noise band, not just the
single old sample.  Records without spread compare medians directly
(backward compatible with rounds 1-5).
"""

from __future__ import annotations

import argparse
import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d and isinstance(d["parsed"], dict):
        d = d["parsed"]
    if "queries" not in d:
        raise SystemExit(f"{path}: no 'queries' key (bench did not parse?)")
    return d


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--ratio", type=float, default=2.0)
    args = ap.parse_args()
    old, new = load(args.old), load(args.new)
    oq, nq = old["queries"], new["queries"]
    ospread = old.get("spread") or {}

    regressions = []
    print(f"{'query':34s} {'old':>7s} {'new':>7s}  ratio")
    for name, t_new in sorted(nq.items()):
        t_old = oq.get(name)
        if t_old is None:
            print(f"{name:34s} {'—':>7s} {t_new:7.2f}  (new)")
            continue
        r = t_new / t_old if t_old else float("inf")
        # the regression bar: ratio × the WORST recorded old sample
        # (falls back to the old median when no spread was recorded)
        bar = max(t_old, (ospread.get(name) or [t_old, t_old])[1])
        regressed = bar > 0 and t_new > args.ratio * bar
        flag = "  <<< REGRESSION" if regressed else ""
        print(f"{name:34s} {t_old:7.2f} {t_new:7.2f}  {r:4.1f}x{flag}")
        if regressed:
            regressions.append((name, r))
    for name in sorted(set(oq) - set(nq)):
        print(f"{name:34s} {oq[name]:7.2f} {'—':>7s}  (dropped)")

    shared = [n for n in nq if n in oq]
    if shared:
        tot_old = sum(oq[n] for n in shared)
        tot_new = sum(nq[n] for n in shared)
        print(
            f"\nshared {len(shared)} queries: {tot_old:.1f}s -> {tot_new:.1f}s"
            f" ({tot_new / tot_old:4.2f}x)"
        )
    if regressions:
        print(f"\n{len(regressions)} regression(s) past {args.ratio}x:", file=sys.stderr)
        for name, r in regressions:
            print(f"  {name}: {r:.1f}x", file=sys.stderr)
        raise SystemExit(1)


if __name__ == "__main__":
    main()
