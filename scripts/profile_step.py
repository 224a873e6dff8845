#!/usr/bin/env python
"""Step-level roofline account of the 128^3 flagship configurations
(round-4 verdict #7: the headline plateaued at 0.185/0.194 ms per step
across rounds with no statement whether that sits at the achievable
floor or merely at the perf-sentinel ratchet).

Method (the fht_profile_512.md method extended to the WHOLE step):
differential-time the n-step scan (bench.py's timing), then capture a
`jax.profiler` device trace of a 10-step run and aggregate per-kernel
device durations — every Pallas kernel carries its wrapper name, the
modal-transform einsums land in XLA fusions. Per-phase analytic floors
printed next to the measurements:

  HBM floor per pass: bytes_moved / 819 GB/s  (v5e HBM)
  thin-halo read amplification: (bx + 2 ng)/bx on the tripled operands

Usage:  python scripts/profile_step.py [N]
Writes the aggregation to stdout; curated into
artifacts/step_profile_128.md.
"""

import collections
import functools
import glob
import gzip
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

HBM_BW = 819e9              # B/s, TPU v5e
PEAK_BF16 = 197e12          # FLOP/s


def _trace_kernels(tdir, n_steps):
    """name -> total device ms / n_steps from a profiler trace dir."""
    tr = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)[0]
    d = json.load(gzip.open(tr))
    tot = collections.defaultdict(float)
    # per-op device occupancies live on the "XLA Ops" thread lane; the
    # "XLA Modules"/"Steps" lanes carry whole-program container spans
    # that would double-count every child
    lanes = {(p["pid"], p["tid"]) for p in d.get("traceEvents", [])
             if p.get("ph") == "M" and p.get("name") == "thread_name"
             and "XLA Ops" in str(p.get("args", {}).get("name", ""))}
    for e in d.get("traceEvents", []):
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if (e.get("pid"), e.get("tid")) not in lanes:
            continue
        tot[e.get("name", "")] += e["dur"] / 1e3 / n_steps
    return tot


def profile_case(tag, cfg, ic, n_steps=1000):
    import jax

    from cfdnn_tpu import Simulation
    from cfdnn_tpu.utils.timing import marginal_step_seconds

    sim = Simulation(cfg)
    state = sim.initialize(ic(cfg, sim.mesh))
    short = max(n_steps // 5, 1)
    state, d = sim.run(state, n_steps)
    jax.block_until_ready(state)
    jax.block_until_ready(sim.run(state, short)[0])
    assert np.isfinite(float(d.ke))
    s = marginal_step_seconds(
        lambda: jax.block_until_ready(sim.run(state, n_steps)[0]),
        lambda: jax.block_until_ready(sim.run(state, short)[0]),
        n_steps, short, 3)
    N = cfg.Nx
    field_mb = N ** 3 * 4 / 1e6
    print(f"\n== {tag} ({N}^3, pallas mode {sim._pallas_predictor_ok}, "
          f"poisson {sim.poisson.name}) ==")
    print(f"measured step: {s * 1e3:.4f} ms "
          f"({N ** 3 / s / 1e6:.0f} Mcells/s); "
          f"one field = {field_mb:.2f} MB, HBM pass (r+w) = "
          f"{2 * field_mb * 1e6 / HBM_BW * 1e3:.4f} ms")

    k = 10
    tdir = f"/tmp/step_trace_{tag}_{N}"
    # pre-compile the k-step executable OUTSIDE the trace: tracing the
    # compile floods the 1M-event cap and drops the device lane
    jax.block_until_ready(sim.run(state, k)[0])
    with jax.profiler.trace(tdir):
        jax.block_until_ready(sim.run(state, k)[0])
    tot = _trace_kernels(tdir, k)
    rows = sorted(tot.items(), key=lambda kv: -kv[1])
    dev_total = sum(tot.values())
    print(f"device-busy total: {dev_total:.4f} ms/step "
          f"(dispatch/gaps = {s * 1e3 - dev_total:.4f} ms)")
    for name, ms in rows[:14]:
        if ms < 0.0005:
            break
        print(f"   {ms:7.4f} ms  {100 * ms / dev_total:5.1f}%  {name}")
    return s, rows, dev_total


def main(N=128):
    import jax

    from cfdnn_tpu import (BCType, Config, ConvectiveScheme,
                           TimeIntegrator, init_taylor_green,
                           perturbed_channel)

    dev = jax.devices()[0]
    print(f"device: {dev}")
    cfg_tgv = Config(
        Nx=N, Ny=N, Nz=N,
        bc_x=BCType.PERIODIC, bc_y=BCType.PERIODIC, bc_z=BCType.PERIODIC,
        y_min=0.0, y_max=2 * np.pi, z_min=0.0, z_max=2 * np.pi,
        nu=1.0 / 1600.0, nu_specified=True, dp_dx=0.0,
        dp_dx_specified=True,
        dt=1e-3, adaptive_dt=False,
        time_integrator=TimeIntegrator.EULER,
        convective_scheme=ConvectiveScheme.SKEW,
        benchmark=True, dtype="float32")
    profile_case("tgv", cfg_tgv, init_taylor_green)

    cfg_ch = Config(
        Nx=N, Ny=N, Nz=N, stretch_y=True,
        nu=1e-4, nu_specified=True, dp_dx=-1e-3, dp_dx_specified=True,
        dt=2e-4, adaptive_dt=False, benchmark=True, dtype="float32")
    profile_case("channel", cfg_ch,
                 lambda c, m: perturbed_channel(c, m, amp=0.05))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128)
