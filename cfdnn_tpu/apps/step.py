"""Step-flow app (reference: app/main_step.cpp forward-facing step with
direct-forcing IBM).

Two modes:
  default     — forward-facing step in a periodic channel (the reference
                app's geometry: solid {x >= x_step, y <= y_step}).
  --backward  — backward-facing step (sudden expansion) with the
                inflow/outflow pair and a parabolic inlet in the upper
                half: the classic Armaly et al. (1983) laminar
                reattachment benchmark. validate() measures the
                reattachment length x_r/S from the near-wall streamwise
                velocity sign change; at Re_D = 100 (Re based on bulk
                inlet velocity and hydraulic diameter D = 2 h_inlet,
                expansion ratio 2) the accepted value is x_r/S ~ 2.9-3.1
                (Armaly et al. 1983 experiment; Biswas et al. 2004 2-D
                simulations).

    python -m cfdnn_tpu.apps.step --Nx 192 --Ny 64
    python -m cfdnn_tpu.apps.step --backward
"""

from __future__ import annotations

import sys

import numpy as np

from ..config import BCType, Config, SimulationMode, TimeIntegrator
from ..ibm import BackwardStepBody, StepBody
from .runner import run_case

# backward-facing-step geometry (expansion ratio 2, Armaly convention)
S = 1.0            # step height
H_IN = 1.0         # inlet channel height (upper half)
X_STEP = 0.0       # expansion plane
X_IN = -2.0        # short inlet channel upstream of the step
X_OUT = 16.0


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


def backward_config() -> Config:
    """Armaly Re_D = 100: u_max = 1 parabola in the upper half, bulk
    2/3, D = 2 h_in -> nu = (2/3)(2)/100."""
    return Config(
        Nx=216, Ny=32, Nz=1,
        x_min=X_IN, x_max=X_OUT, y_min=0.0, y_max=2.0 * S,
        bc_x=BCType.INFLOW, bc_y=BCType.WALL,
        nu=(2.0 / 3.0) * 2.0 * H_IN / 100.0, nu_specified=True,
        dp_dx=0.0, dp_dx_specified=True,
        dt=5e-3, adaptive_dt=True, time_integrator=TimeIntegrator.RK2,
        simulation_mode=SimulationMode.UNSTEADY,
        max_steps=4000, output_freq=500, dtype="float32",
    )


def make_body(cfg, mesh):
    # step face at 40% of the domain, height 30% of the channel
    return StepBody(cfg.x_min + 0.4 * cfg.Lx, cfg.y_min + 0.3 * cfg.Ly)


def make_backward_body(cfg, mesh):
    return BackwardStepBody(X_STEP, S)


def backward_ic(cfg, mesh):
    """Parabolic u in the inlet channel (upper half), zero in the
    expansion; the inlet face of this IC is the pinned inflow profile."""
    import jax.numpy as jnp
    from ..fields import zero_state
    st = zero_state(cfg)
    yc = np.asarray(mesh.y.centers)
    # u_max = 1 parabola on [S, S + H_IN]
    eta = np.clip((yc - S) / H_IN, 0.0, 1.0)
    prof = 4.0 * eta * (1.0 - eta)
    u = np.broadcast_to(prof[None, :, None],
                        (st.u.shape[0], cfg.Ny, cfg.Nz)).copy()
    return st.replace(u=jnp.asarray(u, st.u.dtype))


def reattachment_length(sim, state) -> float:
    """x_r/S: downstream edge of the floor recirculation, from the sign
    change of u in the first cell row above the bottom wall (the discrete
    analogue of the wall-shear zero crossing)."""
    from ..ops.operators import f2c_mean
    u_c = np.asarray(f2c_mean(state.u, 0, sim.geom.axes[0]))[:, :, 0]
    xc = np.asarray(sim.mesh.x.centers)
    j0 = 0                             # first interior row above the floor
    mask = xc > X_STEP
    u_wall = u_c[mask, j0]
    x_ds = xc[mask]
    neg = np.where(u_wall < 0)[0]
    if len(neg) == 0:
        return 0.0
    # end of the CONTIGUOUS bubble attached to the step — the globally
    # last negative cell could be a detached pocket near the outlet
    # (transient) and would wildly over-report x_r
    k = neg[0]
    for n in neg[1:]:
        if n == k + 1:
            k = n
        else:
            break
    if k + 1 >= len(u_wall):
        return float((x_ds[k] - X_STEP) / S)
    # linear interpolation of the zero crossing
    u0, u1 = u_wall[k], u_wall[k + 1]
    x0, x1 = x_ds[k], x_ds[k + 1]
    xr = x0 + (x1 - x0) * (-u0) / (u1 - u0)
    return float((xr - X_STEP) / S)


def validate_backward(sim, state, diags):
    xr = reattachment_length(sim, state)
    print(f"[step] backward-facing: x_r/S = {xr:.3f} "
          f"(Armaly et al. 1983, Re_D=100: ~3.0)")
    return {"reattach_xr": xr, "div_linf": float(diags.div_linf)}


def validate(sim, state, diags):
    return {"final_ke": float(diags.ke), "div_linf": float(diags.div_linf)}


def main(argv=None):
    argv = list(sys.argv[1:]) if argv is None else list(argv)
    backward = "--backward" in argv
    argv = [a for a in argv if a != "--backward"]
    if backward:
        return run_case("step_backward", backward_config(), argv,
                        body=make_backward_body, ic=backward_ic,
                        validate=validate_backward)
    return run_case("step", default_config(), argv, body=make_body,
                    validate=validate)


if __name__ == "__main__":
    main()
