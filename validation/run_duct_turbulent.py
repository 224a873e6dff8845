#!/usr/bin/env python
"""Turbulent square duct — Prandtl's secondary flow of the second kind.

Tier-2 validation beyond the reference (its duct app validates only the
laminar series solution, app/main_duct.cpp): a marginally-resolved DNS
at Re_tau ~ 300 (Huser & Biringen 1993, J. Fluid Mech. 257) must
produce the turbulence-induced mean secondary flow — eight counter-
rotating corner vortices with cross-flow magnitude ~1-3% of the bulk
velocity — and a statistically diagonal-symmetric mean field. This
exercises the two-wall (FFT1D-role) Poisson path in a production
turbulent run.

Units: u_tau = 1, half-width h = 1. Square-duct force balance
(-dp/dx) A = tau_w P with A/P = h/2 gives dp_dx = -2 for mean
u_tau = 1; nu = 1/Re_tau.

  python validation/run_duct_turbulent.py --N 128 --Nx 192 \
      --flow-throughs 80
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np

# Huser & Biringen 1993 (Re_tau = 300): Re_b = U_b D / nu ~ 10,320
U_BULK_PLUS_HB = 10320.0 / (2.0 * 300.0)   # ~17.2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--Nx", type=int, default=192)
    ap.add_argument("--N", type=int, default=128,
                    help="cross-section cells per side (Ny = Nz)")
    ap.add_argument("--Re-tau", type=float, default=300.0, dest="re_tau")
    ap.add_argument("--flow-throughs", type=float, default=80.0)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--report-every", type=int, default=2000)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from cfdnn_tpu import Config, Simulation, init_turbulent_channel
    from cfdnn_tpu.config import BCType, ConvectiveScheme, TimeIntegrator
    from cfdnn_tpu.ops.operators import f2c_mean

    Re_tau = args.re_tau
    nu = 1.0 / Re_tau
    cfg = Config(
        Nx=args.Nx, Ny=args.N, Nz=args.N,
        x_min=0.0, x_max=2 * np.pi,
        y_min=-1.0, y_max=1.0, z_min=-1.0, z_max=1.0,
        stretch_y=True, stretch_beta=2.0,
        stretch_z=True, stretch_beta_z=2.0,
        bc_x=BCType.PERIODIC, bc_y=BCType.WALL, bc_z=BCType.WALL,
        nu=nu, nu_specified=True, dp_dx=-2.0, dp_dx_specified=True,
        dt=5e-4, adaptive_dt=True, CFL_max=0.8, dt_safety=0.9,
        time_integrator=TimeIntegrator.RK3,
        convective_scheme=ConvectiveScheme.SKEW,
        implicit_y_diffusion=True,
        dtype=args.dtype, perf_mode=True, verbose=True,
    )
    sim = Simulation(cfg)
    # channel-style band-limited roll/streak IC; the z-wall BCs and the
    # initial projection clean up the walls. No trip: at Re_tau = 300 a
    # strong coherent IC transitions on its own.
    state = sim.initialize(init_turbulent_channel(
        cfg, sim.mesh, U_bulk=U_BULK_PLUS_HB, amp=0.35))
    state = sim.project_initial_velocity(state)

    T_ft = cfg.Lx / U_BULK_PLUS_HB
    T_final = args.flow_throughs * T_ft
    T_avg_start = 0.4 * T_final            # average the last 60%
    print(f"[duct-turb] {cfg.Nx}x{cfg.Ny}x{cfg.Nz} Re_tau={Re_tau:g} "
          f"dtype={args.dtype} T_final={T_final:.2f} "
          f"({args.flow_throughs:g} flow-throughs), "
          f"poisson={sim.poisson_selection_reason}")
    dxp = cfg.Lx / cfg.Nx * Re_tau
    y1p = float(sim.mesh.y.d[0]) * 0.5 * Re_tau
    print(f"[duct-turb] dx+={dxp:.1f} y+_first={y1p:.2f} (= z+_first)")

    geom = sim.geom
    wy = np.asarray(sim.mesh.y.d)
    wz = np.asarray(sim.mesh.z.d)
    Wyz = wy[:, None] * wz[None, :]
    Wyz /= Wyz.sum()

    # time averages of the x-averaged cross-section fields
    n_avg = 0
    U_m = V_m = W_m = None
    t = float(state.t)
    it = 0
    t0 = time.time()
    cells = cfg.Nx * cfg.Ny * cfg.Nz
    chunk = 200
    while t < T_final:
        state, d = sim.run(state, chunk)
        it += chunk
        t = float(state.t)
        if not np.isfinite(float(d.ke)):
            print(f"[duct-turb] NaN at step {it}"); sys.exit(1)
        if t > T_avg_start:
            u_c = np.asarray(f2c_mean(state.u, 0, geom.axes[0])).mean(0)
            v_c = np.asarray(f2c_mean(state.v, 1, geom.axes[1])).mean(0)
            w_c = np.asarray(f2c_mean(state.w, 2, geom.axes[2])).mean(0)
            if U_m is None:
                U_m, V_m, W_m = u_c, v_c, w_c
            else:
                U_m += u_c; V_m += v_c; W_m += w_c
            n_avg += 1
        if it % args.report_every < chunk:
            rate = it * cells / (time.time() - t0) / 1e6
            # friction velocity from the y-wall mean shear (du/dy at wall)
            u_xz = np.asarray(f2c_mean(state.u, 0, geom.axes[0])).mean(0)
            dudy_w = u_xz[0, :].mean() / (0.5 * wy[0])
            re_tau_now = np.sqrt(max(nu * dudy_w, 0.0)) / nu
            print(f"  step {it:7d} t={t:7.3f} dt={float(d.dt):.2e} "
                  f"ke={float(d.ke):9.4f} Re_tau~{re_tau_now:6.1f} "
                  f"[{rate:.0f} Mcells/s]", flush=True)

    assert n_avg > 0
    U_m /= n_avg; V_m /= n_avg; W_m /= n_avg
    u_bulk = float((U_m * Wyz).sum())
    sec_mag = np.sqrt(V_m**2 + W_m**2)
    sec_max = float(sec_mag.max())
    sec_frac = sec_max / u_bulk
    # diagonal symmetry of the mean flow: v(y,z) <-> w(z,y)
    corr = float(np.corrcoef(V_m.ravel(), W_m.T.ravel())[0, 1])
    # Re_tau from the averaged y-wall shear (both walls)
    dudy = (U_m[0, :] / (0.5 * wy[0]) + U_m[-1, :] / (0.5 * wy[-1])) / 2.0
    u_tau = float(np.sqrt(nu * dudy.mean()))
    re_tau_meas = u_tau / nu

    elapsed = time.time() - t0
    print(f"\n[duct-turb] RESULTS ({n_avg} samples over the last "
          f"{T_final - T_avg_start:.1f} time units; {elapsed:.0f} s wall, "
          f"{it * cells / elapsed / 1e6:.0f} Mcells/s sustained)")
    print(f"  U_bulk+          = {u_bulk:.2f}   (Huser & Biringen ~17.2)")
    print(f"  Re_tau (y walls) = {re_tau_meas:.1f}   (target {Re_tau:g})")
    print(f"  max secondary    = {sec_max:.4f} = {100 * sec_frac:.2f}% of "
          f"bulk   (published ~1-3%)")
    print(f"  diag symmetry corr(V, W^T) = {corr:.3f}   (gate > 0.5)")

    ok = (0.005 <= sec_frac <= 0.05) and corr > 0.5 \
        and abs(re_tau_meas - Re_tau) / Re_tau < 0.15
    print(f"  all_ok: {ok}")
    print(f'QOI_JSON: {{"name": "duct_secondary_frac", '
          f'"value": {sec_frac:.6e}}}')
    print(f'QOI_JSON: {{"name": "duct_diag_symmetry", '
          f'"value": {corr:.6e}}}')
    print(f'QOI_JSON: {{"name": "duct_re_tau", "value": {re_tau_meas:.6e}}}')
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
