#!/usr/bin/env python
"""Grid-convergence study on the Poiseuille channel.

Runs the steady channel on a sequence of y-resolutions, measures the
relative L2 error against the exact parabola, and reports the observed
order of accuracy and the Grid Convergence Index (GCI, Roache 1994)
(reference: examples/03_grid_refinement/convergence_analysis.py — same
study, in-process here instead of shelling out per grid).

    python refine.py            # Ny = 16, 32, 64 (~2 min CPU)
    python refine.py --fine     # adds Ny = 128
"""

import argparse

import numpy as np

import jax

# f64 physics gates run on CPU by design (the TPU has no f64 datapath)
jax.config.update("jax_platforms", "cpu")


def run_grid(ny: int) -> float:
    import jax
    if jax.config.jax_enable_x64 is False:
        jax.config.update("jax_enable_x64", True)
    from cfdnn_tpu import (Config, Simulation, init_poiseuille,
                           poiseuille_exact)
    from cfdnn_tpu.config import SimulationMode
    cfg = Config(Nx=4, Ny=ny, Nz=1, nu=0.05, nu_specified=True,
                 dp_dx=-1.0, dp_dx_specified=True, dt=2e-1 / ny,
                 adaptive_dt=False,
                 simulation_mode=SimulationMode.STEADY,
                 tol=1e-10, max_steps=200000, dtype="float64",
                 write_fields=False, verbose=False, num_snapshots=0)
    sim = Simulation(cfg)
    state, _ = sim.solve_steady(init_poiseuille(cfg, sim.mesh,
                                                fraction=0.9))
    from cfdnn_tpu.ops.operators import f2c_mean
    u = np.asarray(f2c_mean(state.u, 0, sim.geom.axes[0]))
    prof = u.mean(axis=(0, 2))
    exact = poiseuille_exact(cfg, sim.mesh.y.centers)
    return float(np.linalg.norm(prof - exact) / np.linalg.norm(exact))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fine", action="store_true", help="add Ny=128")
    args = ap.parse_args()

    grids = [16, 32, 64] + ([128] if args.fine else [])
    errs = []
    print(f"{'Ny':>6} {'relL2':>12} {'order':>8} {'GCI%':>8}")
    for i, ny in enumerate(grids):
        errs.append(run_grid(ny))
        order = gci = float("nan")
        if i > 0:
            order = np.log2(errs[i - 1] / errs[i])
            # GCI with safety factor 1.25 on the fine grid, r=2
            gci = 125.0 * errs[i] / max(2.0 ** order - 1.0, 1e-12)
        print(f"{ny:6d} {errs[i]:12.4e} {order:8.3f} {gci:8.3f}")

    p = np.log2(errs[-2] / errs[-1])
    print(f"\nobserved order of accuracy p = {p:.3f} (theoretical: 2)")
    if 1.8 < p < 2.3:
        print("PASS: second-order spatial convergence confirmed")
    else:
        raise SystemExit(f"FAIL: observed order {p:.3f} outside [1.8, 2.3]")


if __name__ == "__main__":
    main()
