#!/usr/bin/env python
"""LES channel at Re_tau = 180 or 395 (MKM points) — Tier-2 validation run.

Reference-parity driver (reference: tests/test_les_channel_retau.cpp +
the RTX 6000 LES channel case, docs/SOLVER_GUIDE.md:536-541): coarse
wall-resolved LES with an SGS closure must sustain turbulence and land
Re_tau in a band around the target where the no-model run on the same
grid either laminarizes or overshoots.

  python validation/run_les_channel.py --model wale --flow-throughs 15
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--Nx", type=int, default=64)
    ap.add_argument("--Ny", type=int, default=64)
    ap.add_argument("--Nz", type=int, default=64)
    ap.add_argument("--model", default="wale",
                    choices=["smagorinsky", "wale", "vreman", "sigma",
                             "dynamic_smagorinsky"])
    ap.add_argument("--flow-throughs", type=float, default=15.0)
    ap.add_argument("--Re-tau", type=float, default=180.0, dest="re_tau",
                    help="target friction Reynolds number (MKM 180 or 395)")
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--report-every", type=int, default=2000)
    ap.add_argument("--max-steps", type=int, default=0, help="0 = by time")
    args = ap.parse_args()

    from cfdnn_tpu import Config, Simulation, init_turbulent_channel
    from cfdnn_tpu.config import (BCType, ConvectiveScheme, TimeIntegrator,
                                  TurbulenceModel)
    from cfdnn_tpu import diagnostics as diag

    Re_tau = args.re_tau
    if Re_tau not in diag.MKM_BULK_U_PLUS:
        ap.error(f"--Re-tau {Re_tau:g} has no MKM reference point "
                 f"(supported: {sorted(diag.MKM_BULK_U_PLUS)})")
    u_bulk_mkm = diag.MKM_BULK_U_PLUS[Re_tau]
    delta = 1.0
    nu = 1.0 / Re_tau          # u_tau = 1 units
    cfg = Config(
        Nx=args.Nx, Ny=args.Ny, Nz=args.Nz,
        x_min=0.0, x_max=4 * np.pi * delta,
        y_min=-delta, y_max=delta,
        z_min=0.0, z_max=4.0 / 3.0 * np.pi * delta,
        stretch_y=True, stretch_beta=1.8,
        bc_x=BCType.PERIODIC, bc_y=BCType.WALL, bc_z=BCType.PERIODIC,
        nu=nu, nu_specified=True, dp_dx=-1.0, dp_dx_specified=True,
        dt=2e-4, adaptive_dt=True, CFL_max=0.8, dt_safety=0.9,
        time_integrator=TimeIntegrator.RK3,
        convective_scheme=ConvectiveScheme.SKEW,
        turb_model=TurbulenceModel(args.model),
        trip_enabled=True, trip_amplitude=4.0, trip_duration=10.0,
        trip_ramp_off_start=8.0,
        dtype=args.dtype, perf_mode=True, verbose=True,
    )
    sim = Simulation(cfg)
    state = sim.initialize(init_turbulent_channel(cfg, sim.mesh, amp=0.3))
    state = sim.project_initial_velocity(state)

    T_ft = cfg.Lx / u_bulk_mkm
    T_final = args.flow_throughs * T_ft
    print(f"[les-channel] {cfg.Nx}x{cfg.Ny}x{cfg.Nz} model={args.model} "
          f"dtype={args.dtype} T_final={T_final:.2f} "
          f"({args.flow_throughs} flow-throughs), "
          f"poisson={sim.poisson_selection_reason}")

    it = 0
    t0 = time.perf_counter()
    chunk = min(args.report_every, 500)
    while float(state.t) < T_final:
        state, d = sim.run(state, chunk)
        it += chunk
        if args.max_steps and it >= args.max_steps:
            break
        if it % args.report_every < chunk:
            st = diag.channel_statistics(sim, state)
            ke = float(d.ke)
            if not np.isfinite(ke):
                print(f"[les-channel] NaN at step {it}")
                return 1
            wall = time.perf_counter() - t0
            ncell = cfg.Nx * cfg.Ny * cfg.Nz
            nut_max = float(np.max(np.asarray(state.nu_t))) \
                if state.nu_t is not None else 0.0
            print(f"  step {it:7d} t={float(state.t):7.3f} "
                  f"dt={float(d.dt):.2e} ke={ke:.4f} "
                  f"Re_tau={st.Re_tau:6.1f} y+={st.y_plus_1:.2f} "
                  f"nu_t/nu={nut_max / nu:6.1f} "
                  f"[{ncell * it / wall / 1e6:.0f} Mcells/s]")

    st = diag.channel_statistics(sim, state)
    print(f"[les-channel] final: Re_tau={st.Re_tau:.1f} "
          f"(target {Re_tau:.0f}), U_bulk={float(st.U.mean()):.2f} "
          f"(MKM {u_bulk_mkm})")
    fit = diag.log_law_fit(st)
    uc_mkm = diag.MKM_CENTERLINE_U_PLUS.get(Re_tau)
    if uc_mkm is not None and np.isfinite(fit["kappa"]):
        print(f"[les-channel] log-law fit: kappa={fit['kappa']:.3f} "
              f"B={fit['B']:.2f} (n={fit['n_fit_points']}), "
              f"centerline U+={fit['centerline_u_plus']:.2f} "
              f"vs MKM {uc_mkm}")
    suffix = "" if Re_tau == 180.0 else f"_{Re_tau:.0f}"
    print(f'QOI_JSON: {{"name": "les_channel_re_tau{suffix}", '
          f'"value": {st.Re_tau:.6e}}}')
    print(f'QOI_JSON: {{"name": "les_channel_u_bulk{suffix}", '
          f'"value": {float(st.U.mean()):.6e}}}')
    return 0


if __name__ == "__main__":
    sys.exit(main())
