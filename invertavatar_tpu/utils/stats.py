"""Metric accumulation + logging sinks (reference torch_utils/training_stats.py
+ the rank-0 sinks in training_loop.py:432-529).

Counters accumulate [num, sum, sum-of-squares] float32 triples per name
(training_stats.py:36-56). Under the data mesh the triples live on host after
each step (metrics come back as scalars already psum'd by XLA where needed);
cross-host sync is a `psum` of the triples when running multi-host.

Sinks: console status line, `stats.jsonl`, and TensorBoard (optional import).
"""

from __future__ import annotations

import json
import os
import re
import time
from collections import defaultdict
from typing import Dict, Optional

import numpy as np


class Collector:
    def __init__(self, regex: str = ".*", keep_previous: bool = True):
        self._regex = re.compile(regex)
        self._keep = keep_previous
        self._moments: Dict[str, np.ndarray] = defaultdict(lambda: np.zeros(3, np.float64))
        self._cumulative: Dict[str, np.ndarray] = defaultdict(lambda: np.zeros(3, np.float64))

    def report(self, name: str, value) -> None:
        arr = np.asarray(value, np.float64).ravel()
        if arr.size == 0:
            return
        triple = np.array([arr.size, arr.sum(), np.square(arr).sum()])
        self._moments[name] += triple

    def update(self) -> None:
        for name, m in self._moments.items():
            self._cumulative[name] += m
        self._deltas = {k: v.copy() for k, v in self._moments.items()}
        self._moments.clear()

    def sync(self) -> None:
        """Cross-process reduce of the pending [num, sum, sumsq] triples —
        the reference's `training_stats` all_reduce (training_stats.py:236-260).
        No-op in single-process runs; call before `update()` on multi-host."""
        import jax

        if jax.process_count() <= 1 or not self._moments:
            return
        from jax.experimental import multihost_utils

        names = sorted(self._moments)
        stacked = np.stack([self._moments[n] for n in names])  # [N, 3]
        gathered = np.asarray(
            multihost_utils.process_allgather(stacked.astype(np.float32))
        )  # [P, N, 3]
        total = gathered.sum(axis=0).astype(np.float64)
        for i, n in enumerate(names):
            self._moments[n] = total[i]

    def names(self):
        return [n for n in getattr(self, "_deltas", {}) if self._regex.fullmatch(n)]

    def mean(self, name: str) -> float:
        d = getattr(self, "_deltas", {}).get(name)
        if d is None or d[0] == 0:
            return float("nan")
        return float(d[1] / d[0])

    def std(self, name: str) -> float:
        d = getattr(self, "_deltas", {}).get(name)
        if d is None or d[0] == 0:
            return float("nan")
        mean = d[1] / d[0]
        var = max(d[2] / d[0] - mean * mean, 0)
        return float(np.sqrt(var))

    def as_dict(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {"num": float(self._deltas[name][0]), "mean": self.mean(name), "std": self.std(name)}
            for name in self.names()
        }


class StatsLogger:
    """Rank-0 sinks: stats.jsonl + optional tensorboard."""

    def __init__(self, run_dir: str, use_tensorboard: bool = True):
        self.run_dir = run_dir
        os.makedirs(run_dir, exist_ok=True)
        self._jsonl = open(os.path.join(run_dir, "stats.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils import tensorboard

                self._tb = tensorboard.SummaryWriter(run_dir)
            except Exception:
                self._tb = None

    def write(self, collector: Collector, step: int) -> None:
        entry = {name: stats for name, stats in collector.as_dict().items()}
        entry["timestamp"] = time.time()
        entry["step"] = step
        self._jsonl.write(json.dumps(entry) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for name, stats in collector.as_dict().items():
                self._tb.add_scalar(name, stats["mean"], global_step=step)
            self._tb.flush()

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
