"""Forward-facing-step app (reference: app/main_step.cpp): channel with an
immersed step body.

    python -m cfdnn_tpu.apps.step --Nx 192 --Ny 64
"""

from __future__ import annotations

from ..config import BCType, Config, SimulationMode, TimeIntegrator
from ..ibm import StepBody
from .runner import run_case


def default_config() -> Config:
    return Config(
        Nx=128, Ny=48, Nz=1,
        x_min=0.0, x_max=4.0, y_min=0.0, y_max=1.0,
        bc_x=BCType.PERIODIC, bc_y=BCType.WALL,
        nu=1e-3, nu_specified=True, dp_dx=-4e-3, dp_dx_specified=True,
        dt=5e-4, adaptive_dt=True, time_integrator=TimeIntegrator.RK2,
        simulation_mode=SimulationMode.UNSTEADY,
        max_steps=3000, output_freq=200, dtype="float32",
    )


def make_body(cfg, mesh):
    # step face at 40% of the domain, height 30% of the channel
    return StepBody(cfg.x_min + 0.4 * cfg.Lx, cfg.y_min + 0.3 * cfg.Ly)


def validate(sim, state, diags):
    return {"final_ke": float(diags.ke), "div_linf": float(diags.div_linf)}


def main(argv=None):
    return run_case("step", default_config(), argv, body=make_body,
                    validate=validate)


if __name__ == "__main__":
    main()
