"""IBM cylinder-in-crossflow app (reference: app/main_cylinder.cpp:135-240):
periodic channel with an immersed cylinder, Cd/Cl time series, Strouhal
number from the lift-signal zero crossings.

    python -m cfdnn_tpu.apps.cylinder --Nx 256 --Ny 128 --Re 100
"""

from __future__ import annotations

import numpy as np

from ..config import BCType, Config, SimulationMode, TimeIntegrator
from ..ibm import CylinderBody
from .runner import run_case

D = 0.1          # cylinder diameter
CX, CY = 0.5, 0.5


def default_config() -> Config:
    return Config(
        Nx=128, Ny=64, Nz=1,
        x_min=0.0, x_max=2.0, y_min=0.0, y_max=1.0,
        bc_x=BCType.PERIODIC, bc_y=BCType.WALL,
        nu=1e-3, nu_specified=True, dp_dx=-5e-3, dp_dx_specified=True,
        dt=5e-4, adaptive_dt=True,
        time_integrator=TimeIntegrator.RK2,
        simulation_mode=SimulationMode.UNSTEADY,
        max_steps=5000, output_freq=200, dtype="float32",
    )


def make_body(cfg, mesh):
    return CylinderBody(CX, CY, 0.5 * D)


class ForceRecorder:
    """Cd/Cl time series + Strouhal from Cl zero crossings (reference
    app/main_cylinder.cpp Strouhal output)."""

    def __init__(self, sim):
        self.sim = sim
        self.t, self.cd, self.cl = [], [], []

    def __call__(self, it, state, d):
        u_ref = max(abs(float(np.asarray(state.u).mean())), 1e-9)
        denom = 0.5 * u_ref**2 * D
        self.t.append(float(state.t))
        self.cd.append(float(d.fx) / denom)
        self.cl.append(float(d.fy) / denom)

    def strouhal(self):
        if len(self.t) < 16:
            return 0.0
        cl = np.asarray(self.cl)
        t = np.asarray(self.t)
        cl = cl - cl.mean()
        crossings = np.where(np.diff(np.sign(cl)) > 0)[0]
        if len(crossings) < 2:
            return 0.0
        period = (t[crossings[-1]] - t[crossings[0]]) / (len(crossings) - 1)
        u_ref = 1.0
        return D / (period * u_ref) if period > 0 else 0.0


def main(argv=None):
    cfg = default_config()
    rec_holder = {}

    def cb_factory(sim):
        rec = ForceRecorder(sim)
        rec_holder["rec"] = rec
        return rec

    # run_case builds sim internally; use a late-binding callback
    def callback(it, st, d):
        if "rec" not in rec_holder:
            rec_holder["rec"] = ForceRecorder(None)
        rec_holder["rec"](it, st, d)

    def validate(sim, state, diags):
        rec = rec_holder.get("rec")
        out = {"final_ke": float(diags.ke)}
        if rec and rec.cd:
            out["cd_mean_tail"] = float(np.mean(rec.cd[-len(rec.cd) // 4:]))
            out["strouhal"] = rec.strouhal()
            print(f"[cylinder] Cd(tail)={out['cd_mean_tail']:.3f} "
                  f"St={out['strouhal']:.3f}")
        return out

    return run_case("cylinder", cfg, argv, body=make_body,
                    callback=callback, validate=validate)


if __name__ == "__main__":
    main()
