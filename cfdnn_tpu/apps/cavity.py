"""Lid-driven cavity app: the classic all-wall benchmark, driven by the
first-class moving-wall BC (`Config.lid_velocity`).

No reference app exists for this case — the reference reaches the cavity
only inside tests/test_physics_validation_advanced.cpp:464-530 by
rewriting the u ghost row each step. Here it completes the app family as
the only case whose Poisson domain has NO periodic axis (FDM dense
eigenbases on both axes).

validate() measures the u profile through the vertical centerline
against the Ghia, Ghia & Shin (1982) tables (Re=100 and Re=400).

    python -m cfdnn_tpu.apps.cavity                   # Re=100, 64^2
    python -m cfdnn_tpu.apps.cavity --Re 400 --Nx 128 --Ny 128
"""

from __future__ import annotations

import sys

import numpy as np

from ..config import BCType, Config, SimulationMode
from .runner import run_case

GHIA_Y = np.array([0.0547, 0.0625, 0.0703, 0.1016, 0.1719, 0.2813,
                   0.4531, 0.5000, 0.6172, 0.7344, 0.8516, 0.9531,
                   0.9609, 0.9688, 0.9766])
GHIA_U = {
    100: np.array([-0.03717, -0.04192, -0.04775, -0.06434, -0.10150,
                   -0.15662, -0.21090, -0.20581, -0.13641, 0.00332,
                   0.23151, 0.68717, 0.73722, 0.78871, 0.84123]),
    400: np.array([-0.08186, -0.09266, -0.10338, -0.14612, -0.24299,
                   -0.32726, -0.17119, -0.11477, 0.02135, 0.16256,
                   0.29093, 0.55892, 0.61756, 0.68439, 0.75837]),
}


def default_config(Re: float = 100.0) -> Config:
    return Config(
        Nx=64, Ny=64, Nz=1,
        x_min=0.0, x_max=1.0, y_min=0.0, y_max=1.0,
        bc_x=BCType.WALL, bc_y=BCType.WALL, lid_velocity=1.0,
        nu=1.0 / Re, nu_specified=True, dp_dx=0.0, dp_dx_specified=True,
        dt=2e-3, adaptive_dt=True,
        simulation_mode=SimulationMode.STEADY,
        # diag_interval 50: solve_steady syncs two scalars per check, and
        # a remote-tunnel TPU pays ~25 ms per round trip — checking every
        # step costs more than the steps themselves at 64^2
        max_steps=20000, tol=1e-7, output_freq=1000, diag_interval=50,
        dtype="float64",
    )


def validate(sim, state, diags):
    cfg = sim.cfg
    Re = round(1.0 / cfg.nu)
    u = np.asarray(state.u)[cfg.Nx // 2, :, 0]      # face at x = 0.5
    yc = np.asarray(sim.mesh.y.centers)
    out = {"final_ke": float(diags.ke), "div_linf": float(diags.div_linf)}
    if Re in GHIA_U:
        err = float(np.abs(np.interp(GHIA_Y, yc, u) - GHIA_U[Re]).max())
        print(f"[cavity] Re={Re}: max |u - u_Ghia| on the centerline "
              f"= {err:.4f} (reference gate 0.10)")
        out["ghia_max_err"] = err
    else:
        print(f"[cavity] Re={Re}: no Ghia table at this Re; "
              "skipping the profile check")
    return out


def main(argv=None):
    argv = list(sys.argv[1:]) if argv is None else list(argv)
    # Consume --Re here (it selects nu in default_config; leaving it for
    # Config.parse_args would over-specify the Re/nu/dp_dx triad).
    # Accept both documented CLI forms, "--Re 400" and "--Re=400".
    Re, rest = 100.0, []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--Re":
            if i + 1 >= len(argv) or argv[i + 1].startswith("--"):
                raise SystemExit("cavity: --Re needs a value")
            Re = float(argv[i + 1])
            i += 2
            continue
        if a.startswith("--Re="):
            Re = float(a.split("=", 1)[1])
            i += 1
            continue
        rest.append(a)
        i += 1
    return run_case("cavity", default_config(Re), rest, validate=validate)


if __name__ == "__main__":
    main()
