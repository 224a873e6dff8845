"""Endurance / stability-sentinel tests.

Mirrors the reference suite (reference: tests/test_endurance_stability.cpp
— thousands of steps without NaN or energy blow-up; tests/
test_stability_sentinel.cpp — the guard machinery actually fires). Run in
float32 deliberately: the long-horizon roundoff behavior of the f32 TPU
performance path is what these gates protect.
"""

import numpy as np
import pytest

from cfdnn_tpu import Config, Simulation, perturbed_channel
from cfdnn_tpu.config import TimeIntegrator, TurbulenceModel


def _channel_cfg(**kw):
    base = dict(
        Nx=32, Ny=48, Nz=32, stretch_y=True,
        nu=1.0 / 3000.0, nu_specified=True,
        dp_dx=-1e-3, dp_dx_specified=True,
        dt=2e-3, adaptive_dt=True, CFL_max=0.5,
        time_integrator=TimeIntegrator.RK2,
        dtype="float32",
    )
    base.update(kw)
    return Config(**base)


@pytest.mark.slow
def test_endurance_channel_sst_f32():
    """2000 adaptive-dt SST steps in f32: finite, bounded KE, bounded
    post-projection divergence (reference test_endurance_stability)."""
    cfg = _channel_cfg(turb_model=TurbulenceModel.SST)
    sim = Simulation(cfg)
    state = perturbed_channel(cfg, sim.mesh, amp=0.08)
    state, d0 = sim.run(state, 100)
    ke0 = float(d0.ke)
    assert np.isfinite(ke0)
    state, d = sim.run(state, 1900)
    ke = float(d.ke)
    assert np.isfinite(ke), "NaN after 2000 SST steps"
    # bounded: no energy blow-up beyond the forcing's steady budget
    assert ke < 50.0 * max(ke0, 1e-8), f"KE blow-up: {ke0} -> {ke}"
    assert float(d.div_linf) < 1e-2, f"divergence drift: {float(d.div_linf)}"
    assert float(d.dt) > 0.0


@pytest.mark.slow
def test_endurance_tgv_f32_long_horizon():
    """Long f32 TGV decay stays monotonic-ish and finite: the f32 Poisson
    roundoff floor must not accumulate into the velocity field."""
    from cfdnn_tpu import BCType, init_taylor_green
    from cfdnn_tpu.config import ConvectiveScheme
    cfg = Config(
        Nx=32, Ny=32, Nz=32,
        x_max=2 * np.pi, y_min=0.0, y_max=2 * np.pi,
        z_min=0.0, z_max=2 * np.pi,
        bc_x=BCType.PERIODIC, bc_y=BCType.PERIODIC, bc_z=BCType.PERIODIC,
        nu=1.0 / 800.0, nu_specified=True, dp_dx=0.0, dp_dx_specified=True,
        dt=5e-3, adaptive_dt=False,
        time_integrator=TimeIntegrator.RK3,
        convective_scheme=ConvectiveScheme.SKEW,
        dtype="float32",
    )
    sim = Simulation(cfg)
    state = init_taylor_green(cfg, sim.mesh)
    kes = []
    for _ in range(5):
        state, d = sim.run(state, 400)
        kes.append(float(d.ke))
    assert all(np.isfinite(k) for k in kes)
    # viscous decay: each 400-step chunk loses energy (f32 noise floor is
    # orders below the physical dissipation at this nu)
    for a, b in zip(kes, kes[1:]):
        assert b < a * 1.001, f"KE non-decaying in f32: {kes}"


def test_nan_guard_aborts_steady_solve():
    """The sentinel machinery fires: an unstable configuration (dt far
    beyond the CFL limit, adaptive off) must raise, not hang or return
    garbage (reference test_stability_sentinel)."""
    cfg = _channel_cfg(dt=5.0, adaptive_dt=False, diag_interval=10,
                       turb_model=TurbulenceModel.NONE)
    sim = Simulation(cfg)
    state = perturbed_channel(cfg, sim.mesh, amp=0.3)
    with pytest.raises(FloatingPointError):
        sim.solve_steady(state, max_steps=300, tol=0.0)
