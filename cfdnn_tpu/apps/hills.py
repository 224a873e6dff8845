"""Periodic-hills app (reference: app/main_hills.cpp, Breuer et al. 2009
benchmark geometry): channel with the immersed hill profile, periodic in x.

validate() measures the lee-side separation bubble from the near-surface
streamwise velocity: separation point x_sep/h (sign change + on the
descending hill flank) and reattachment point x_r/h (last sign change -
in the valley). Breuer et al. (2009, Computers & Fluids 38) document a
steady laminar recirculation bubble in the low-Re regime (Re ~ 100) with
separation just past the crest and reattachment in the valley; the CI
gate checks that structure (bubble exists, separation on the flank,
reattachment mid-valley) rather than a digitized curve value.

    python -m cfdnn_tpu.apps.hills --Nx 192 --Ny 96
"""

from __future__ import annotations

import numpy as np

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


def separation_points(sim, state, body=None):
    """(x_sep/h, x_r/h) from the sign of u in the first fluid cell row
    above the hill surface (discrete wall-shear zero crossings), plus the
    minimum near-surface u (bubble strength)."""
    from ..ops.operators import f2c_mean
    body = body or PeriodicHillBody(H)
    u_c = np.asarray(f2c_mean(state.u, 0, sim.geom.axes[0]))[:, :, 0]
    xc = np.asarray(sim.mesh.x.centers)
    yc = np.asarray(sim.mesh.y.centers)
    dy = float(sim.mesh.y.d[0])
    surf = body.hill_height(xc)
    # first center comfortably above the forcing band (vectorized gather)
    j = np.minimum(np.searchsorted(yc, surf + 1.2 * dy), len(yc) - 1)
    u_near = u_c[np.arange(len(xc)), j]
    neg = u_near < 0
    if not neg.any():
        return 0.0, 0.0, float(u_near.min())
    # PRIMARY bubble = the contiguous negative segment containing the
    # most-negative column (a secondary windward-foot recirculation
    # would otherwise stretch x_r to the wrong flank)
    i_min = int(np.argmin(u_near))
    lo = i_min
    while lo > 0 and neg[lo - 1]:
        lo -= 1
    hi = i_min
    while hi + 1 < len(neg) and neg[hi + 1]:
        hi += 1
    x_sep = float(xc[lo] / H)
    x_r = float(xc[hi] / H)
    return x_sep, x_r, float(u_near.min())


def validate(sim, state, diags):
    x_sep, x_r, u_min = separation_points(sim, state)
    # fluid-only bulk (the solid hill cells are forced to ~0 and would
    # understate Re_b)
    if sim.ibm is not None:
        wu = np.asarray(sim.ibm.w_u)
        u_bulk = float((np.asarray(state.u) * wu).sum() / max(wu.sum(), 1.0))
    else:
        u_bulk = float(np.asarray(state.u).mean())
    re_b = u_bulk * H / sim.cfg.nu
    print(f"[hills] x_sep/h={x_sep:.2f} x_r/h={x_r:.2f} "
          f"u_near_min={u_min:.4f} Re_b~{re_b:.0f}")
    return {"x_sep": x_sep, "x_reattach": x_r, "u_near_min": u_min,
            "div_linf": float(diags.div_linf)}


def make_body(cfg, mesh):
    return PeriodicHillBody(H)


def main(argv=None):
    return run_case("hills", default_config(), argv, body=make_body,
                    validate=validate)


if __name__ == "__main__":
    main()
