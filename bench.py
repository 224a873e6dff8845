#!/usr/bin/env python
"""Headline benchmark: 128^3 all-periodic TGV step throughput on one TPU chip.

Mirrors the reference's headline number (H200, FFT Poisson, full step:
1.7 ms/step = 1,267 Mcells/s — docs/POISSON_SOLVER_GUIDE.md:378-384) on the
same configuration: 128^3 periodic box, skew convection, FFT pressure solve,
one projection per step (Euler). Prints ONE JSON line with
cell-updates/sec/chip and the ratio vs the reference baseline.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


BASELINE_MCELLS = 1267.0  # reference H200 128^3 periodic FFT step


def main():
    from cfdnn_tpu import (Config, Simulation, BCType, TimeIntegrator,
                           ConvectiveScheme, init_taylor_green)

    n = 128
    cfg = Config(
        Nx=n, Ny=n, Nz=n,
        bc_x=BCType.PERIODIC, bc_y=BCType.PERIODIC, bc_z=BCType.PERIODIC,
        y_min=0.0, y_max=2 * np.pi, z_min=0.0, z_max=2 * np.pi,
        nu=1.0 / 1600.0, nu_specified=True, dp_dx=0.0, dp_dx_specified=True,
        dt=1e-3, adaptive_dt=False,
        time_integrator=TimeIntegrator.EULER,
        convective_scheme=ConvectiveScheme.SKEW,
        benchmark=True, dtype="float32",
    )
    sim = Simulation(cfg)
    state = init_taylor_green(cfg, sim.mesh)

    # warmup + compile (same static step count as the timed call)
    steps = 100
    state, d = sim.run(state, steps)
    jax.block_until_ready(state)

    # best of 3 repetitions (the shared-TPU tunnel adds timing noise)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        state, d = sim.run(state, steps)
        jax.block_until_ready(state)
        best = min(best, time.perf_counter() - t0)

    ke = float(d.ke)
    assert np.isfinite(ke), "NaN in benchmark run"
    ms_per_step = best * 1e3 / steps
    mcells = n**3 / best * steps / 1e6
    print(json.dumps({
        "metric": "cell_updates_per_sec_chip_128cube_tgv",
        "value": mcells * 1e6,
        "unit": "cells/s",
        "vs_baseline": mcells / BASELINE_MCELLS,
        "ms_per_step": ms_per_step,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
