#!/usr/bin/env python
"""Capture a jax.profiler trace of the flagship step (reference:
scripts/run_nsys_profiles.sh + app/profile_* drivers).

  python scripts/profile_tpu.py --N 128 --steps 50 --out artifacts/trace
  # then: tensorboard --logdir artifacts/trace  (or xprof)
"""

import argparse
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--N", type=int, default=128)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--case", choices=["tgv", "channel"], default="tgv")
    ap.add_argument("--out", default="artifacts/trace")
    args = ap.parse_args()

    import jax
    from cfdnn_tpu import (BCType, Config, ConvectiveScheme, Simulation,
                           TimeIntegrator, init_taylor_green,
                           perturbed_channel)
    from cfdnn_tpu.utils.timing import TimingStats, timed_jit_call

    n = args.N
    if args.case == "tgv":
        cfg = Config(Nx=n, Ny=n, Nz=n, bc_x=BCType.PERIODIC,
                     bc_y=BCType.PERIODIC, bc_z=BCType.PERIODIC,
                     y_min=0.0, y_max=2 * np.pi, z_min=0.0, z_max=2 * np.pi,
                     nu=1 / 1600.0, nu_specified=True, dp_dx=0.0,
                     dp_dx_specified=True, dt=1e-3, adaptive_dt=False,
                     convective_scheme=ConvectiveScheme.SKEW,
                     benchmark=True, dtype="float32")
        sim = Simulation(cfg)
        state = init_taylor_green(cfg, sim.mesh)
    else:
        cfg = Config(Nx=n, Ny=n, Nz=n, stretch_y=True,
                     nu=1e-4, nu_specified=True, dp_dx=-1e-3,
                     dp_dx_specified=True, dt=2e-4, adaptive_dt=False,
                     benchmark=True, dtype="float32")
        sim = Simulation(cfg)
        state = perturbed_channel(cfg, sim.mesh, amp=0.05)

    # compile
    state, _ = sim.step(state)
    jax.block_until_ready(state)

    with jax.profiler.trace(args.out):
        for _ in range(args.steps):
            state, d = timed_jit_call("step", sim._step_jit, state)
    print(TimingStats.instance().report())
    print(f"trace written to {args.out}")


if __name__ == "__main__":
    main()
