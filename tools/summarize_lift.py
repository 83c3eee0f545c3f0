"""Aggregate the few-shot lift matrix (tools/run_fewshot_matrix.py) into
the STATUS.md table: per (k_shot, arm) mean/range over seeds, paired
per-seed deltas (joint - sup), and the sweep rows if present.

Usage:
  python tools/summarize_lift.py /tmp/lift8/results.jsonl
"""

import json
import sys
from collections import defaultdict


def main(path):
    rows = []
    with open(path) as f:
        for line in f:
            d = json.loads(line)
            if d.get("metrics"):
                rows.append(d)

    base = defaultdict(dict)   # (k, knobs) -> {(arm, seed): miou}
    for d in rows:
        c = d["config"]
        knobs = (c.get("lmbda"), c.get("quantile"), c.get("alpha"))
        base[(c["k_shot"], knobs)][(c["arm"], c["seed"])] = \
            d["metrics"]["class_avg_iou"]

    print(f"{'k':>3} {'lmbda':>6} {'q':>5} {'alpha':>6} | "
          f"{'sup (per seed)':>24} | {'joint (per seed)':>24} | "
          f"{'paired delta':>20}")
    for (k, knobs), cell in sorted(base.items()):
        seeds = sorted({s for (_, s) in cell})
        sup = [cell.get(("sup", s)) for s in seeds]
        joint = [cell.get(("joint", s)) for s in seeds]
        fmt = lambda v: " ".join("  -  " if x is None else f"{x:.3f}"
                                 for x in v)
        deltas = [j - s for j, s in zip(joint, sup)
                  if j is not None and s is not None]
        dtxt = " ".join(f"{d:+.3f}" for d in deltas)
        mean = (sum(deltas) / len(deltas)) if deltas else float("nan")
        lm, q, al = knobs
        print(f"{k:>3} {lm:>6} {q:>5} {al:>6} | {fmt(sup):>24} | "
              f"{fmt(joint):>24} | {dtxt:>14} m={mean:+.3f}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/lift8/results.jsonl")
