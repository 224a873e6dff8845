#!/usr/bin/env python
"""DNS channel at Re_tau = 180 (MKM benchmark) — Tier-2 validation run.

Reference-parity driver (reference: tests/test_dns_channel_validation.cpp
+ the Tier-2 192x96x192 H200 run settling at Re_tau ~ 284,
docs/TESTING_AND_VALIDATION.md:572): trip-forced transition from a
perturbed laminar profile, explicit high-k filter, RK3 + skew, stretched
walls, statistics + Stage-F realism report at the end.

  python validation/run_channel_retau180.py --Nx 128 --Ny 96 --Nz 96 \
      --flow-throughs 20
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--Nx", type=int, default=128)
    ap.add_argument("--Ny", type=int, default=96)
    ap.add_argument("--Nz", type=int, default=96)
    ap.add_argument("--flow-throughs", type=float, default=20.0)
    ap.add_argument("--Re-tau", type=float, default=180.0, dest="re_tau",
                    help="target friction Reynolds number (MKM point)")
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--report-every", type=int, default=2000)
    ap.add_argument("--max-steps", type=int, default=0, help="0 = by time")
    args = ap.parse_args()

    import jax
    from cfdnn_tpu import Config, Simulation, init_turbulent_channel
    from cfdnn_tpu.config import BCType, ConvectiveScheme, TimeIntegrator
    from cfdnn_tpu import diagnostics as diag

    Re_tau = args.re_tau
    if Re_tau not in diag.MKM_BULK_U_PLUS:
        ap.error(f"--Re-tau {Re_tau:g} has no MKM reference point "
                 f"(supported: {sorted(diag.MKM_BULK_U_PLUS)})")
    u_bulk_mkm = diag.MKM_BULK_U_PLUS[Re_tau]
    tag = f"[retau{Re_tau:.0f}]"
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
        implicit_y_diffusion=True,
        trip_enabled=True, trip_amplitude=4.0, trip_duration=10.0,
        trip_ramp_off_start=8.0,
        filter_strength=0.01, filter_interval=20,
        dtype=args.dtype, perf_mode=True, verbose=True,
    )
    sim = Simulation(cfg)
    state = sim.initialize(init_turbulent_channel(cfg, sim.mesh, amp=0.3))
    state = sim.project_initial_velocity(state)

    # bulk time scale: U_b in u_tau units at this MKM point
    T_ft = cfg.Lx / u_bulk_mkm
    T_final = args.flow_throughs * T_ft
    print(f"{tag} {cfg.Nx}x{cfg.Ny}x{cfg.Nz} dtype={args.dtype} "
          f"T_final={T_final:.2f} ({args.flow_throughs} flow-throughs), "
          f"poisson={sim.poisson_selection_reason}")

    clf = diag.TurbulencePresenceClassifier()
    acc = diag.StatsAccumulator(sim)      # time-averaged Stage-F stats
    T_avg = 0.6 * T_final                 # average over the last ~40%
    it = 0
    t0 = time.perf_counter()
    chunk = min(args.report_every, 500)   # scan-batched stepping
    while float(state.t) < T_final:
        state, d = sim.run(state, chunk)
        it += chunk
        clf.update(sim, state)            # every chunk: fill the window
        if float(state.t) > T_avg:
            acc.update(state)
        if args.max_steps and it >= args.max_steps:
            break
        if it % args.report_every < chunk:
            st = diag.channel_statistics(sim, state)
            ke = float(d.ke)
            if not np.isfinite(ke):
                print(f"{tag} NaN at step {it}")
                return 1
            wall = time.perf_counter() - t0
            ncell = cfg.Nx * cfg.Ny * cfg.Nz
            w_rms = float(np.sqrt(np.mean(np.asarray(state.w) ** 2)))
            print(f"  step {it:7d} t={float(state.t):7.3f} "
                  f"dt={float(d.dt):.2e} ke={ke:.4f} "
                  f"Re_tau={st.Re_tau:6.1f} y+={st.y_plus_1:.2f} "
                  f"w_rms={w_rms:.3f} "
                  f"state={clf.update(sim, state)} "
                  f"[{ncell * it / wall / 1e6:.0f} Mcells/s]")

    rep = diag.realism_report(sim, state)
    print(f"{tag} final Stage-F report (instantaneous snapshot):")
    for k, v in rep.items():
        print(f"    {k}: {v}")
    if acc.n > 0:
        rep_avg = diag.realism_report_averaged(sim, state, acc)
        print(f"{tag} Stage-F report (TIME-AVERAGED over {acc.n} "
              f"snapshots, t > {T_avg:.1f}):")
        for k, v in rep_avg.items():
            print(f"    {k}: {v}")
        rep = rep_avg                      # the averaged report is canonical
    # profile-SHAPE validation: log-law constants + MKM centerline U+
    st_fin = acc.finalize() if acc.n > 0 else diag.channel_statistics(
        sim, state)
    fit = diag.log_law_fit(st_fin)
    uc_mkm = diag.MKM_CENTERLINE_U_PLUS[Re_tau]
    uc_err = abs(fit["centerline_u_plus"] - uc_mkm) / uc_mkm
    print(f"{tag} log-law fit: kappa={fit['kappa']:.3f} "
          f"B={fit['B']:.2f} (n={fit['n_fit_points']}), "
          f"centerline U+={fit['centerline_u_plus']:.2f} "
          f"vs MKM {uc_mkm} ({100 * uc_err:.1f}% off)")
    # near-wall structure: u'+ must peak in the buffer layer (MKM: y+ ~ 15,
    # peak ~ 2.65 at Re_tau 180, slowly growing with Re_tau). Walls are at
    # y = +-delta with delta = 1 in this driver.
    ypc = (1.0 - np.abs(st_fin.y)) * st_fin.Re_tau
    half = len(st_fin.y) // 2
    k_pk = int(np.argmax(st_fin.u_rms[:half]))
    print(f"{tag} u'+ peak: {st_fin.u_rms[k_pk] / st_fin.u_tau:.2f} "
          f"at y+ = {ypc[k_pk]:.1f} (MKM: ~2.65 at y+ ~ 15)")
    suffix = f"{Re_tau:.0f}"
    print(f'QOI_JSON: {{"name": "dns_retau{suffix}_re_tau", '
          f'"value": {rep["Re_tau"]:.6e}}}')
    print(f'QOI_JSON: {{"name": "dns_retau{suffix}_centerline_uplus", '
          f'"value": {fit["centerline_u_plus"]:.6e}}}')
    return 0


if __name__ == "__main__":
    sys.exit(main())
