"""Render the MNIST RCGAN-U stabilization sweep (VERDICT r3 item 2) from
the committed per-cell eval logs: one line per sweep cell, left panel
gen-label accuracy vs epoch, right panel the permutation-corrected
learned-C recovery error (perm-TV, ``evals/confusion_recovery.py``) vs
epoch.  Reads the trimmed logs archived under
``docs/runs/mnist_rcganu_sweep/<cell>.log``:

    python scripts/plot_rcganu_sweep.py [src_dir] [out.png]
"""

import glob
import os
import re
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
DEFAULT_SRC = os.path.join(ROOT, "docs", "runs", "mnist_rcganu_sweep")
DEFAULT_OUT = os.path.join(ROOT, "docs", "runs", "mnist_rcganu_sweep.png")

ACC_RE = re.compile(r"EPOCH=(\d+), mean generated label accuracy=([\d.]+)")
TV_RE = re.compile(r"EPOCH=(\d+), learned-C recovery: TV=[\d.]+ perm-TV=([\d.]+)")


def parse_cell(path):
    accs, tvs = {}, {}
    for line in open(path, errors="replace"):
        m = ACC_RE.search(line)
        if m:
            accs[int(m.group(1))] = float(m.group(2))
        m = TV_RE.search(line)
        if m:
            tvs[int(m.group(1))] = float(m.group(2))
    return accs, tvs


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_SRC
    out = sys.argv[2] if len(sys.argv) > 2 else DEFAULT_OUT
    cells = {}
    for f in sorted(glob.glob(os.path.join(src, "*.log"))):
        name = os.path.basename(f)[:-4]
        accs, tvs = parse_cell(f)
        if accs:
            cells[name] = (accs, tvs)
    if not cells:
        sys.exit(f"no parseable cell logs under {src}")

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(11, 4.2))
    for name, (accs, tvs) in cells.items():
        ep = sorted(accs)
        lw = 2.4 if name.startswith("best") else 1.4
        ax1.plot(ep, [accs[e] for e in ep], marker="o", ms=3, lw=lw, label=name)
        if tvs:
            ept = sorted(tvs)
            ax2.plot(ept, [tvs[e] for e in ept], marker="o", ms=3, lw=lw, label=name)
    ax1.axhline(0.8, color="gray", ls=":", lw=1)
    ax1.set_xlabel("epoch")
    ax1.set_ylabel("gen-label accuracy (pinned classifier)")
    ax1.set_title("MNIST RCGAN-U stabilization sweep (α=0.3)")
    ax1.set_ylim(0, 1.02)
    ax1.legend(fontsize=7)
    ax2.set_xlabel("epoch")
    ax2.set_ylabel("perm-corrected learned-C TV error")
    ax2.set_title("learned-C recovery trajectory")
    ax2.set_ylim(bottom=0)
    ax2.legend(fontsize=7)
    fig.tight_layout()
    fig.savefig(out, dpi=130)
    print(f"wrote {out} ({len(cells)} cells)")


if __name__ == "__main__":
    main()
