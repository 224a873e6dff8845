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


@pytest.mark.slow
def test_endurance_dns_long_horizon():
    """200k-step Re_tau=180 DNS endurance sentinel (round-2 verdict #9:
    the reference's endurance suite had no TPU counterpart at true DNS
    length). Trip-forced transition, adaptive-dt spin-up, then a
    FIXED-dt averaging window so Kahan time integrity is checkable
    against the exact f64 expectation. End gates: Kahan-accumulated
    time exact to ~1e-5 relative, statistically-steady KE over the last
    checkpoints, and the AVERAGED Stage-F realism gates
    (diagnostics.realism_report_averaged).

    TPU-targeted (200k steps of a 96^2x64 DNS is ~1 minute on a v5e;
    CPU would take hours): skipped on CPU unless CFDNN_ENDURANCE_STEPS
    overrides the horizon — setting it small exercises the full gate
    logic as a smoke.
    """
    import os

    import jax

    from cfdnn_tpu import diagnostics as diag
    from cfdnn_tpu import init_turbulent_channel
    from cfdnn_tpu.config import BCType, ConvectiveScheme

    env_steps = os.environ.get("CFDNN_ENDURANCE_STEPS")
    on_cpu = jax.devices()[0].platform == "cpu"
    if on_cpu and not env_steps:
        pytest.skip("long-horizon DNS endurance needs an accelerator "
                    "(set CFDNN_ENDURANCE_STEPS for a scaled CPU smoke)")
    n_total = int(env_steps) if env_steps else 200_000
    spinup = max(n_total // 4, 1)
    window = n_total - spinup
    chunk = max(min(5_000, window // 4), 1)

    delta = 1.0
    # Full-length runs use the CANONICAL all-gates grid (160x96x96,
    # validation/RESULTS.md: every Stage-F gate incl. resolution passes
    # — dx+ 14.1, dz+ 7.9, y+ 0.39) so the endurance artifact asserts
    # the complete gate set with nothing waived (round-4 verdict #5:
    # the previous 96x96x64 sentinel sat at dx+~23 by design and
    # skipped the resolution gates). Scaled smokes keep the small grid.
    Nx, Nz = (96, 64) if env_steps else (160, 96)
    cfg = Config(
        Nx=Nx, Ny=96, Nz=Nz,
        x_min=0.0, x_max=4 * np.pi * delta,
        y_min=-delta, y_max=delta,
        z_min=0.0, z_max=4.0 / 3.0 * np.pi * delta,
        stretch_y=True, stretch_beta=1.8,
        bc_x=BCType.PERIODIC, bc_y=BCType.WALL, bc_z=BCType.PERIODIC,
        nu=1.0 / 180.0, nu_specified=True, dp_dx=-1.0,
        dp_dx_specified=True,
        dt=2e-4, adaptive_dt=True, CFL_max=0.8, dt_safety=0.9,
        time_integrator=TimeIntegrator.RK2,
        convective_scheme=ConvectiveScheme.SKEW,
        trip_enabled=True, trip_amplitude=4.0, trip_duration=10.0,
        trip_ramp_off_start=8.0,
        filter_strength=0.01, filter_interval=20,
        dtype="float32", perf_mode=True,
    )
    sim = Simulation(cfg)
    state = sim.initialize(init_turbulent_channel(cfg, sim.mesh, amp=0.3))
    state = sim.project_initial_velocity(state)

    # ---- adaptive spin-up (trip active) -------------------------------
    state, d = sim.run(state, spinup)
    assert np.isfinite(float(d.ke)), "NaN during spin-up"

    # ---- fixed-dt averaging window ------------------------------------
    import dataclasses as _dc
    dt_fix = float(d.dt)
    cfg_fix = _dc.replace(cfg, dt=dt_fix, adaptive_dt=False)
    sim_fix = Simulation(cfg_fix)
    t0 = float(state.t) + float(state.t_comp)
    acc = diag.StatsAccumulator(sim_fix)
    kes = []
    done = 0
    while done < window:
        n = min(chunk, window - done)
        state, d = sim_fix.run(state, n)
        done += n
        kes.append(float(d.ke))
        acc.update(state)
    assert all(np.isfinite(k) for k in kes), f"NaN in window: {kes}"

    # Kahan-time integrity: f32 naive accumulation over 150k steps of
    # dt~1e-4 drifts at the ~1e-3 relative level; the compensated pair
    # (state.t, state.t_comp) must match the exact n*dt to ~1e-5
    t1 = float(state.t) + float(state.t_comp)
    rel = abs((t1 - t0) - done * dt_fix) / max(done * dt_fix, 1e-30)
    print(f'QOI_JSON: {{"name": "endurance_kahan_rel", '
          f'"value": {rel:.6e}}}')
    print(f'QOI_JSON: {{"name": "endurance_ke_tail", '
          f'"value": {kes[-1]:.6e}}}')
    assert rel < 1e-5, (
        f"Kahan time drift: {(t1 - t0):.8f} vs exact {done * dt_fix:.8f} "
        f"(rel {rel:.2e})")

    # statistically steady KE: last checkpoints within a band (no decay
    # to laminar, no blow-up)
    tail = kes[-4:]
    assert max(tail) < 3.0 * min(tail), f"KE not steady: {tail}"
    assert min(tail) > 0.1 * np.mean(kes), f"flow died: {kes}"

    if not env_steps:
        # full-length run on the canonical grid: the COMPLETE averaged
        # Stage-F gate set must hold, resolution gates included —
        # all_ok with nothing waived (reference Stage-F realism suite,
        # solver.hpp:302-655)
        rep = diag.realism_report_averaged(sim_fix, state, acc)
        print("STAGE_F_REPORT:", {k: (float(v) if hasattr(v, "item")
                                      or isinstance(v, float) else v)
                                  for k, v in rep.items()})
        for gate in ("y_plus_ok", "dx_plus_ok", "dz_plus_ok",
                     "stress_ordering_ok", "momentum_closure_ok",
                     "spectrum_ok"):
            assert rep[gate], (gate, rep)
        assert rep.get("all_ok", True), rep
        assert 150.0 < rep["Re_tau"] < 220.0, rep
        print(f'QOI_JSON: {{"name": "endurance_all_ok", "value": 1.0}}')
