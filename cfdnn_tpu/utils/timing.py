"""Scoped timing + device-utilization accounting.

TPU-native rebuild of the reference timing layer (reference: include/
timing.hpp:14-100 TIMED_SCOPE/TimingStats singleton with per-category
totals and GPU-utilization accounting, include/profiling.hpp NVTX ranges).
On TPU the analogue of "time on device" is time spent inside jitted
computations (categories ending `_jit`); `device_utilization_ratio()` and
`assert_device_dominant()` reproduce the reference's CI gate
(tests/test_gpu_utilization.cpp >= 70%). NVTX ranges map to
jax.profiler.TraceAnnotation for xprof/tensorboard traces.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

import jax


class TimingStats:
    """Global per-category wall-time totals/counts (singleton)."""

    _instance = None

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @classmethod
    def instance(cls) -> "TimingStats":
        if cls._instance is None:
            cls._instance = cls()
        return cls._instance

    def record(self, category: str, seconds: float):
        self.totals[category] += seconds
        self.counts[category] += 1

    def reset(self):
        self.totals.clear()
        self.counts.clear()

    def device_utilization_ratio(self) -> float:
        """Fraction of accounted time in `_jit` categories (device-side)."""
        dev = sum(t for c, t in self.totals.items() if c.endswith("_jit"))
        total = sum(self.totals.values())
        return dev / total if total > 0 else 0.0

    def assert_device_dominant(self, threshold: float = 0.7):
        r = self.device_utilization_ratio()
        if r < threshold:
            raise AssertionError(
                f"device utilization {r:.2%} < required {threshold:.2%}")

    def report(self) -> str:
        lines = ["category                     total(s)   count    mean(ms)"]
        for c in sorted(self.totals, key=self.totals.get, reverse=True):
            t, n = self.totals[c], self.counts[c]
            lines.append(f"{c:<28} {t:9.3f} {n:7d} {1e3 * t / n:11.3f}")
        lines.append(f"device utilization: "
                     f"{self.device_utilization_ratio():.1%}")
        return "\n".join(lines)


@contextlib.contextmanager
def timed_scope(category: str, annotate: bool = True):
    """RAII timer (reference TIMED_SCOPE). Category names ending `_jit`
    count toward device utilization. Also emits a profiler annotation so
    scopes show up in `jax.profiler` traces (the NVTX analogue).

    Records in a finally block — the reference scope is RAII, so an
    exception escaping the scope must still account its time (otherwise
    the utilization gate reads partial data)."""
    ctx = (jax.profiler.TraceAnnotation(category) if annotate
           else contextlib.nullcontext())
    t0 = time.perf_counter()
    try:
        with ctx:
            yield
    finally:
        TimingStats.instance().record(category, time.perf_counter() - t0)


def timed_jit_call(category: str, fn, *args):
    """Call a jitted fn with block_until_ready under a `_jit` scope.

    A call that TRACES+COMPILES (empty jit cache) is booked to
    `<category>_compile` — a host bucket — instead: compilation is host
    work, and counting it as `_jit` would let the 70% device-utilization
    gate pass on compile time alone. Detection uses the jit cache size,
    so pre-warmed functions are unaffected."""
    cat = category if category.endswith("_jit") else category + "_jit"
    try:
        if fn._cache_size() == 0:
            cat = cat.removesuffix("_jit") + "_compile"
    except AttributeError:
        pass
    with timed_scope(cat):
        out = fn(*args)
        jax.block_until_ready(out)
    return out


def marginal_step_seconds(run_long, run_short, n_long: int, n_short: int,
                          reps: int = 3) -> float:
    """Differential wall time per step, cancelling constant per-dispatch
    overhead (on the tunnel-attached TPU a single dispatch carries ~25 ms
    of launch + transfer around the actual device time).

    `run_long`/`run_short` are zero-arg callables that execute n_long /
    n_short steps and block until the result is ready; both must already
    be warmed (compiled + run once). Times each `reps` times interleaved,
    takes the per-length minimum (the least-noise estimator), and returns
    (t_long - t_short) / (n_long - n_short).

    Guard: if timing noise makes the marginal nonpositive (a spike caught
    by the long run but not the short one), fall back to the naive
    t_long / n_long — a strict upper bound — so downstream consumers
    (perf-regression gates, Mcells/s reports) never see a zero or
    negative step time that would silently disable or invert them."""
    import time as _time

    assert n_long > n_short >= 1
    best_l = best_s = float("inf")
    for _ in range(reps):
        t0 = _time.perf_counter()
        run_long()
        best_l = min(best_l, _time.perf_counter() - t0)
        t0 = _time.perf_counter()
        run_short()
        best_s = min(best_s, _time.perf_counter() - t0)
    marginal = (best_l - best_s) / (n_long - n_short)
    if marginal <= 0.0:
        return best_l / n_long
    return marginal
