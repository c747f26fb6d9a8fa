"""Summarize the accuracy-vs-alpha sweep (runs/round3/sweep_*) into a
markdown table: one row per (algorithm, alpha) cell with the epoch-4/49/99
gen-label accuracies and the label-recovery accuracy.

Usage: python scripts/summarize_sweep.py [runs_dir]
"""

import glob
import os
import re
import sys


def parse_run(log_path):
    accs, recovery = {}, None
    for line in open(log_path, errors="replace"):
        m = re.search(r"EPOCH=(\d+), mean generated label accuracy=([\d.]+)", line)
        if m:
            accs[int(m.group(1))] = float(m.group(2))
        m = re.search(r"label recovery accuracy: ([\d.]+)", line)
        if m:
            recovery = float(m.group(1))
    return accs, recovery


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "runs/round3"
    rows = []
    for log in sorted(glob.glob(os.path.join(root, "sweep_*.txt"))):
        name = os.path.basename(log)[:-4]
        m = re.match(r"sweep_(\w+)_a([\d.]+)", name)
        if not m:
            continue
        alg, alpha = m.group(1), float(m.group(2))
        accs, recovery = parse_run(log)
        if not accs:
            print(f"| {alg} | {alpha} | (no evals parsed — check {log}) | | |")
            continue
        last = max(accs)
        peak = max(accs.values())
        rows.append((alg, alpha, accs.get(4), accs.get(49), accs.get(last),
                     peak, recovery))
    rows.sort(key=lambda r: (r[0], -r[1]))
    print("| algorithm | α | acc @ep4 | @ep49 | @ep99 | peak | recovery |")
    print("|---|---|---|---|---|---|---|")
    for alg, alpha, a4, a49, a99, peak, rec in rows:
        fmt = lambda v: "—" if v is None else f"{v:.3f}"
        print(f"| {alg} | {alpha} | {fmt(a4)} | {fmt(a49)} | **{fmt(a99)}** "
              f"| {fmt(peak)} | {fmt(rec)} |")


if __name__ == "__main__":
    main()
