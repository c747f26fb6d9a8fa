"""Metric accumulator + curve dumps — the ``lib.plot`` channel of the
reference (``cifar10/common/plot.py:14-79``): ``plot(name, value)`` per
iteration, ``tick()``, and ``dir_flush`` rendering one JPG per metric plus a
pickled series.  Object-based instead of module-global."""

from __future__ import annotations

import collections
import logging
import os
import pickle

import numpy as np


class MetricLogger:
    def __init__(self):
        self._since_beginning = collections.defaultdict(dict)
        self._since_last_flush = collections.defaultdict(dict)
        self._iter = 0

    def tick(self):
        self._iter += 1

    def plot(self, name: str, value):
        self._since_last_flush[name][self._iter] = float(value)

    def plot_at(self, name: str, value, step: int):
        """Record at an explicit iteration (for host-side buffered metrics
        flushed in blocks)."""
        self._since_last_flush[name][int(step)] = float(value)

    def dir_flush(self, out_dir: str, log_pkl: bool = True, render: bool = True):
        prints = []
        for name, vals in self._since_last_flush.items():
            prints.append(f"{name}: {np.mean(list(vals.values())):.6g}")
            self._since_beginning[name].update(vals)
            if render:
                self._render(name, out_dir)
        logging.info("iter %d\n%s", self._iter, ", ".join(prints))
        self._since_last_flush.clear()
        if log_pkl:
            with open(os.path.join(out_dir, "log.pkl"), "wb") as f:
                pickle.dump(dict(self._since_beginning), f, pickle.HIGHEST_PROTOCOL)
        return prints

    def _render(self, name: str, out_dir: str):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        series = self._since_beginning[name]
        x_vals = np.sort(list(series.keys()))
        y_vals = [series[x] for x in x_vals]
        plt.clf()
        plt.plot(x_vals, y_vals)
        plt.xlabel("iteration")
        plt.ylabel(name)
        plt.savefig(os.path.join(out_dir, f"{name.replace(' ', '_')}.jpg"))

    def latest(self, name: str):
        series = self._since_last_flush.get(name) or self._since_beginning.get(name)
        if not series:
            return None
        return series[max(series)]
