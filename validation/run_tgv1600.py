#!/usr/bin/env python
"""3D Taylor-Green vortex at Re = 1600 — canonical transition benchmark.

Runs 128^3 (default) to t = 12 and records KE(t) and the dissipation rate
-dKE/dt; the canonical result (Brachet et al. / the standard high-order
workshop case) peaks the dissipation near t ~ 9 with max ~ 0.012-0.014
(slightly lower when under-resolved at 128^3 with O2).

  python validation/run_tgv1600.py --N 128 --order 2
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--N", type=int, default=128)
    ap.add_argument("--order", type=int, default=2)
    ap.add_argument("--T", type=float, default=12.0)
    ap.add_argument("--dtype", default="float32")
    args = ap.parse_args()

    from cfdnn_tpu import (BCType, Config, ConvectiveScheme, Simulation,
                           TimeIntegrator, init_taylor_green)
    N = args.N
    cfg = Config(
        Nx=N, Ny=N, Nz=N,
        x_min=0.0, x_max=2 * np.pi, y_min=0.0, y_max=2 * np.pi,
        z_min=0.0, z_max=2 * np.pi,
        bc_x=BCType.PERIODIC, bc_y=BCType.PERIODIC, bc_z=BCType.PERIODIC,
        nu=1.0 / 1600.0, nu_specified=True, dp_dx=0.0, dp_dx_specified=True,
        dt=1e-2, adaptive_dt=True, CFL_max=0.6,
        time_integrator=TimeIntegrator.RK3,
        convective_scheme=ConvectiveScheme.SKEW,
        space_order=args.order, dtype=args.dtype, perf_mode=True,
        verbose=False,
    )
    sim = Simulation(cfg)
    state = init_taylor_green(cfg, sim.mesh)
    print(f"[tgv1600] {N}^3 O{args.order} {args.dtype} "
          f"poisson={sim.poisson_selection_reason} "
          f"pallas={sim._pallas_predictor_ok}")

    ts, kes = [0.0], [0.125]   # KE(0) = 1/8 for V0=1
    chunk = 20
    t0 = time.perf_counter()
    while float(state.t) < args.T:
        state, d = sim.run(state, chunk)
        ts.append(float(state.t))
        kes.append(float(d.ke))
        if not np.isfinite(kes[-1]):
            print("[tgv1600] NaN!")
            return 1
    wall = time.perf_counter() - t0

    ts, kes = np.asarray(ts), np.asarray(kes)
    eps = -np.gradient(kes, ts)
    ipk = int(np.argmax(eps))
    print(f"[tgv1600] done in {wall:.1f}s; "
          f"dissipation peak eps={eps[ipk]:.5f} at t={ts[ipk]:.2f} "
          f"(canonical ~0.013 at t~9)")
    np.savetxt(f"artifacts/tgv1600_N{N}_O{args.order}.dat",
               np.column_stack([ts, kes, eps]),
               header="t KE eps")
    print(f'QOI_JSON: {{"name": "tgv1600_peak_eps", "value": {eps[ipk]:.6e}}}')
    print(f'QOI_JSON: {{"name": "tgv1600_peak_time", "value": {ts[ipk]:.6e}}}')
    return 0


if __name__ == "__main__":
    sys.exit(main())
