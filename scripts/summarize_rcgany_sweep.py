"""Summarize the round-5 RCGAN+y regime sweep (VERDICT r4 item 4) into a
markdown table: one row per cell with gen-label accuracy at epochs 4/29/54/
79/99 (the anneal is active before epoch ~30 and done by ~80), the best
accuracy, and the label-recovery accuracy.

Usage: python scripts/summarize_rcgany_sweep.py [runs/round5/rcgany_sweep]
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
    root = sys.argv[1] if len(sys.argv) > 1 else "runs/round5/rcgany_sweep"
    print("| cell | ep4 | ep29 | ep54 | ep79 | ep99 | best | recovery |")
    print("|---|---|---|---|---|---|---|---|")
    for log in sorted(glob.glob(os.path.join(root, "*.txt"))):
        name = os.path.basename(log)[:-4]
        accs, rec = parse_run(log)
        if not accs:
            continue
        cells = [accs.get(e, float("nan")) for e in (4, 29, 54, 79, 99)]
        best = max(accs.values())
        rec_s = f"{rec:.3f}" if rec is not None else "—"
        print(
            f"| {name} | " + " | ".join(f"{c:.3f}" for c in cells)
            + f" | **{best:.3f}** | {rec_s} |"
        )


if __name__ == "__main__":
    main()
