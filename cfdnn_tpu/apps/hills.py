"""Periodic-hills app (reference: app/main_hills.cpp, Breuer et al. 2009
benchmark): channel with the immersed hill profile, periodic in x.

    python -m cfdnn_tpu.apps.hills --Nx 192 --Ny 96
"""

from __future__ import annotations

from ..config import BCType, Config, SimulationMode, TimeIntegrator
from ..ibm import PeriodicHillBody
from .runner import run_case

H = 1.0   # hill height; domain 9h x 3.036h (benchmark geometry)


def default_config() -> Config:
    return Config(
        Nx=144, Ny=64, Nz=1,
        x_min=0.0, x_max=9.0 * H, y_min=0.0, y_max=3.036 * H,
        bc_x=BCType.PERIODIC, bc_y=BCType.WALL,
        nu=1e-3, nu_specified=True, dp_dx=-4e-3, dp_dx_specified=True,
        dt=1e-3, adaptive_dt=True, time_integrator=TimeIntegrator.RK2,
        simulation_mode=SimulationMode.UNSTEADY,
        max_steps=3000, output_freq=200, dtype="float32",
    )


def make_body(cfg, mesh):
    return PeriodicHillBody(H)


def validate(sim, state, diags):
    return {"final_ke": float(diags.ke), "div_linf": float(diags.div_linf)}


def main(argv=None):
    return run_case("hills", default_config(), argv, body=make_body,
                    validate=validate)


if __name__ == "__main__":
    main()
