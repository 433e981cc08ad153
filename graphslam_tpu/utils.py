"""Observability: timers, counters, structured logging, profiler hooks.

The reference's observability was commented-out ROS_INFO pairs used as ad-hoc
trace points (scanner.cpp:14,19,36,72; graph.cpp:29,65,116 — SURVEY.md §5).
This module is the real version: accumulating wall-clock timers around
pipeline stages, event counters (keyframes, loop closures, solves), and
optional jax.profiler trace capture.
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict
from typing import Dict

import jax
import numpy as np

logger = logging.getLogger("graphslam_tpu")


def sync(tree):
    """Force device completion (on remote-TPU platforms block_until_ready can
    return before the computation lands; a host fetch cannot)."""
    leaves = jax.tree_util.tree_leaves(tree)
    if leaves:
        np.asarray(leaves[0])
    return tree


class Stopwatch:
    """Accumulating per-stage timers: `with sw.time("solve"): ...`."""

    def __init__(self):
        self.total: Dict[str, float] = defaultdict(float)
        self.count: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def time(self, name: str, sync_tree=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_tree is not None:
                sync(sync_tree)
            dt = time.perf_counter() - t0
            self.total[name] += dt
            self.count[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {
                "total_s": self.total[k],
                "count": self.count[k],
                "mean_ms": 1e3 * self.total[k] / max(self.count[k], 1),
            }
            for k in sorted(self.total)
        }

    def log_summary(self):
        for k, v in self.summary().items():
            logger.info(
                "%-20s %6d calls  %8.2f ms/call  %8.3f s total",
                k, v["count"], v["mean_ms"], v["total_s"],
            )


class Counters:
    """SLAM event counters (the ROS_INFO tallies, queryable)."""

    def __init__(self):
        self.values: Dict[str, int] = defaultdict(int)

    def bump(self, name: str, by: int = 1):
        self.values[name] += by

    def as_dict(self) -> Dict[str, int]:
        return dict(self.values)


@contextlib.contextmanager
def profiler_trace(logdir: str):
    """Capture a jax.profiler trace (TensorBoard format) around a block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
