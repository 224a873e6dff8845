"""TGV Re=1600 at 256^3 on TPU: dissipation curve + 3-D energy spectrum.

The canonical validation (Brachet et al. / the reference's TGV QOIs,
reference app/main_taylor_green_3d.cpp:254-289): total-dissipation peak
eps_max ~ 0.013 near t ~ 9. This driver additionally records the
shell-averaged 3-D energy spectrum E(k) at the dissipation peak
(diagnostics.energy_spectrum_3d) and checks the resolved field shows no
high-wavenumber pile-up (aliasing indicator).

    python validation/run_tgv_spectrum.py [N] [dt]

~2 min wall on one v5e chip at 256^3 (f32, RK3 + skew).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(N=256, dt=2e-3):
    import jax

    from cfdnn_tpu import Config, Simulation, init_taylor_green
    from cfdnn_tpu.config import (BCType, ConvectiveScheme, TimeIntegrator)
    from cfdnn_tpu.diagnostics import (energy_spectrum_3d,
                                       spectrum_pileup_ratio)

    L = 2 * np.pi
    cfg = Config(
        Nx=N, Ny=N, Nz=N, x_max=L, y_max=L, z_max=L,
        bc_x=BCType.PERIODIC, bc_y=BCType.PERIODIC, bc_z=BCType.PERIODIC,
        nu=1.0 / 1600.0, nu_specified=True, dp_dx=0.0, dp_dx_specified=True,
        dt=dt, adaptive_dt=False,
        time_integrator=TimeIntegrator.RK3,
        convective_scheme=ConvectiveScheme.SKEW,
        benchmark=True, dtype="float32",
    ).finalize()
    sim = Simulation(cfg)
    state = init_taylor_green(cfg, sim.mesh)

    chunk = 100
    t_end = 12.0
    n_chunks = int(t_end / (dt * chunk))
    ts, kes = [0.0], []
    state0, d = sim.run(state, 1)
    kes.append(float(d.ke))
    t0 = time.time()
    state = state0
    for i in range(n_chunks):
        state, d = sim.run(state, chunk)
        ts.append((i + 1) * chunk * dt)
        kes.append(float(d.ke))
        if not np.isfinite(kes[-1]):
            raise SystemExit(f"NaN at t={ts[-1]}")
    wall = time.time() - t0
    ts, kes = np.array(ts), np.array(kes)
    eps = -np.gradient(kes, ts)
    ipk = int(np.argmax(eps))
    print(f"dissipation peak eps_max={eps[ipk]:.5f} at t={ts[ipk]:.2f} "
          f"(canonical ~0.013 at t~9); wall {wall:.0f}s")

    k, E = energy_spectrum_3d(sim, state)
    ratio = spectrum_pileup_ratio(E)
    print(f"spectrum at t={ts[-1]:.1f}: pileup ratio {ratio:.2e} "
          f"(gate < 0.1), peak shell k={int(k[1:][np.argmax(E[1:])])}")
    out = f"artifacts/tgv{N}_spectrum.dat"
    np.savetxt(out, np.column_stack([k, E]),
               header=f"TGV Re=1600 N={N} t={ts[-1]:.1f}: k  E(k)")
    print(f"spectrum written to {out}")
    assert 0.010 < eps[ipk] < 0.016, eps[ipk]
    assert 7.5 < ts[ipk] < 10.5, ts[ipk]
    assert ratio < 0.1, ratio
    print("TGV spectrum validation PASSED")


if __name__ == "__main__":
    args = sys.argv[1:]
    main(*(int(args[0]),) if args[:1] else (),
         **({"dt": float(args[1])} if args[1:] else {}))
