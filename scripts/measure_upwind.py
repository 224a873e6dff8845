#!/usr/bin/env python
"""The upwind "measure-first" profiling (round-2/3 verdict ask #8).

The reference runs upwind/upwind2 momentum kernels in its GPU hot path
(reference include/solver_kernels.hpp:1863-2198) and upwind k/omega
advection inside the SST transport step. Here:

  * momentum upwind lives in the jnp operator library
    (ops/operators.py _conv_advective) — OUTSIDE the fused Pallas
    predictors, whose eligibility gate requires SKEW/CENTRAL
    (solver.py _pallas_eligible `shared`);
  * SST/k-omega transport advection (turbulence/transport.py) is its
    own single fused jnp pass, also outside the Pallas kernels.

This script measures, on the TPU at 128^3 benchmark tier:

  1. channel RANS step with SST vs turb_model=none
     -> the transport/operator share of a production RANS step;
  2. momentum scheme ladder skew (fused Pallas) vs upwind/upwind2
     (operator fallback) on the laminar channel
     -> what fused upwind momentum kernels would buy.

Decision rule from the verdict: add upwind variants to the fused
predictors only if the operator path exceeds 25% of the step.

Usage:  python scripts/measure_upwind.py [N]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def step_ms(cfg, steps=400, reps=3):
    import jax
    from cfdnn_tpu import Simulation, perturbed_channel
    from cfdnn_tpu.utils.timing import marginal_step_seconds

    sim = Simulation(cfg)
    state = sim.initialize(perturbed_channel(cfg, sim.mesh, amp=0.05))
    short = max(steps // 5, 1)
    out, _ = sim.run(state, steps)
    jax.block_until_ready(out.u)
    jax.block_until_ready(sim.run(state, short)[0].u)
    s = marginal_step_seconds(
        lambda: jax.block_until_ready(sim.run(state, steps)[0].u),
        lambda: jax.block_until_ready(sim.run(state, short)[0].u),
        steps, short, reps)
    return s * 1e3, sim


def main(n=128):
    from cfdnn_tpu import Config
    from cfdnn_tpu.config import ConvectiveScheme, TurbulenceModel

    base = dict(
        Nx=n, Ny=n, Nz=n, stretch_y=True,
        nu=1e-4, nu_specified=True, dp_dx=-1e-3, dp_dx_specified=True,
        dt=2e-4, adaptive_dt=False, benchmark=True, dtype="float32")

    print(f"== RANS transport share ({n}^3 channel, benchmark tier) ==")
    ms_none, sim = step_ms(Config(**base))
    print(f"turb=none (fused={sim._pallas_predictor_ok}): "
          f"{ms_none:.3f} ms/step")
    ms_sst, sim = step_ms(Config(**base, turb_model=TurbulenceModel.SST))
    share = (ms_sst - ms_none) / ms_sst
    print(f"turb=sst  (fused={sim._pallas_predictor_ok}): "
          f"{ms_sst:.3f} ms/step")
    print(f"SST transport+update share of the RANS step: {share:.1%}")

    print(f"\n== momentum scheme ladder ({n}^3 channel, laminar) ==")
    rows = {}
    for scheme in (ConvectiveScheme.SKEW, ConvectiveScheme.CENTRAL,
                   ConvectiveScheme.UPWIND, ConvectiveScheme.UPWIND2):
        ms, sim = step_ms(Config(**base, convective_scheme=scheme))
        rows[scheme.value] = ms
        print(f"{scheme.value:8s} (fused={sim._pallas_predictor_ok}): "
              f"{ms:.3f} ms/step")
    slow = rows["upwind"] / rows["skew"]
    print(f"\nupwind operator-fallback vs fused skew: {slow:.2f}x; "
          f"operator-path share of the upwind step = "
          f"{(rows['upwind'] - rows['skew']) / rows['upwind']:.1%} "
          "(upper bound: assumes a fused upwind kernel would match skew)")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128)
