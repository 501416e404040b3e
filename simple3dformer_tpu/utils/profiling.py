"""Profiling / observability hooks (first-class, per SURVEY §5.1).

The reference has only ptflops printouts and tqdm rates; the north-star metric
here is samples/sec/chip, so the framework ships:
  * trace(): context manager around jax.profiler for XLA/TPU traces
  * flops_estimate(): analytic MACs/params report (the ptflops analog) via
    jax.jit(...).lower(...).cost_analysis()
  * Throughput meter with per-epoch samples/sec
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str = "/tmp/jax-trace"):
    """Capture a profiler trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def flops_estimate(fn, *args):
    """Compiler cost analysis for a jittable fn: flops / bytes accessed."""
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns a list per computation
        cost = cost[0]
    return {
        "flops": cost.get("flops"),
        "bytes accessed": cost.get("bytes accessed"),
    }


def param_count(params) -> int:
    return sum(p.size for p in jax.tree_util.tree_leaves(params))


class Throughput:
    """Running samples/sec meter."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.t0 = time.time()
        self.samples = 0

    def add(self, n: int):
        self.samples += n

    @property
    def rate(self) -> float:
        dt = time.time() - self.t0
        return self.samples / dt if dt > 0 else 0.0
