"""Diagnostics-layer tests: energy budget, channel statistics, realism
gates, presence classifier, timing utilities.

Mirrors the reference coverage (reference: tests/test_energy_budget_
channel.cpp, tests/test_turbulence_realism.cpp Stage-F gates,
tests/test_gpu_utilization.cpp timing gate).
"""

import numpy as np
import pytest

from cfdnn_tpu import BCType, Config, Simulation, init_poiseuille, perturbed_channel
from cfdnn_tpu import diagnostics as diag
from cfdnn_tpu.utils.timing import TimingStats, timed_jit_call, timed_scope


def _channel(N=32, **kw):
    base = dict(Nx=16, Ny=N, Nz=8, z_max=1.0,
                nu=1e-3, nu_specified=True, dp_dx=-2e-3, dp_dx_specified=True,
                dt=1e-3, adaptive_dt=False, dtype="float64")
    base.update(kw)
    cfg = Config(**base)
    return Simulation(cfg)


def test_energy_budget_steady_poiseuille():
    """At the steady laminar state, power input == dissipation exactly
    (reference energy-budget closure)."""
    sim = _channel()
    state = init_poiseuille(sim.cfg, sim.mesh, fraction=1.0)
    for _ in range(200):
        state, _ = sim.step(state)
    b = diag.energy_budget(sim, state)
    assert b["ke"] > 0
    assert b["balance_residual"] < 0.05, b


def test_channel_statistics_laminar():
    sim = _channel()
    state = init_poiseuille(sim.cfg, sim.mesh, fraction=1.0)
    st = diag.channel_statistics(sim, state)
    # laminar: fluctuations ~ 0; U symmetric parabola
    assert np.abs(st.uv).max() < 1e-12
    assert st.u_rms.max() < 1e-12
    assert st.u_tau > 0 and st.Re_tau > 0
    np.testing.assert_allclose(st.U, st.U[::-1], rtol=1e-10)


def test_u_tau_matches_analytic():
    """Poiseuille: u_tau = sqrt(-dp_dx delta / rho) exactly at steady state."""
    sim = _channel(N=64)
    state = init_poiseuille(sim.cfg, sim.mesh, fraction=1.0)
    for _ in range(100):
        state, _ = sim.step(state)
    st = diag.channel_statistics(sim, state)
    u_tau_exact = np.sqrt(-sim.cfg.dp_dx * 0.5 * sim.cfg.Ly / sim.cfg.rho)
    # first-cell gradient underestimates the wall slope at O(dy^2)
    assert abs(st.u_tau - u_tau_exact) / u_tau_exact < 0.05


def test_momentum_balance_laminar():
    sim = _channel(N=64)
    state = init_poiseuille(sim.cfg, sim.mesh, fraction=1.0)
    for _ in range(100):
        state, _ = sim.step(state)
    closure = diag.momentum_balance_closure(sim, state)
    assert closure < 0.10, closure


def test_realism_report_fields():
    sim = _channel()
    state = perturbed_channel(sim.cfg, sim.mesh, amp=0.05)
    for _ in range(5):
        state, _ = sim.step(state)
    rep = diag.realism_report(sim, state)
    for key in ("y_plus_ok", "dx_plus_ok", "dz_plus_ok", "u_tau", "Re_tau",
                "momentum_closure", "stress_ordering_ok", "all_ok"):
        assert key in rep
    assert np.isfinite(rep["u_tau"])


def test_presence_classifier_hysteresis():
    sim = _channel()
    clf = diag.TurbulencePresenceClassifier(window=3, hi=1e-3, lo=1e-4)
    laminar = init_poiseuille(sim.cfg, sim.mesh, fraction=1.0)
    for _ in range(4):
        assert clf.update(sim, laminar) == "laminar"
    turb = perturbed_channel(sim.cfg, sim.mesh, amp=0.5)
    for _ in range(3):
        clf.update(sim, turb)
    assert clf.state == "turbulent"
    # brief dip below hi must NOT flip back (hysteresis)
    clf.update(sim, laminar)
    assert clf.state == "turbulent"


def test_spanwise_spectrum_smooth_field():
    sim = _channel()
    state = init_poiseuille(sim.cfg, sim.mesh, fraction=1.0)
    E = diag.spanwise_spectrum(sim, state)
    assert len(E) == sim.mesh.Nz // 2 + 1
    assert np.all(np.isfinite(E))


def test_timing_stats_and_gate():
    stats = TimingStats.instance()
    stats.reset()
    sim = _channel()
    state = init_poiseuille(sim.cfg, sim.mesh, fraction=1.0)
    state, _ = sim.step(state)  # compile outside timing
    for _ in range(3):
        state, _ = timed_jit_call("step", sim._step_jit, state)
    with timed_scope("host_prep"):
        _ = np.zeros(10)
    assert stats.totals["step_jit"] > 0
    assert stats.counts["step_jit"] == 3
    # compute dominated by the jitted step (reference >=70% gate; the
    # threshold here is relaxed to stay robust under loaded CI machines,
    # where the tiny host scope can be descheduled)
    stats.assert_device_dominant(0.5)
    assert "device utilization" in stats.report()
    with pytest.raises(AssertionError):
        stats.assert_device_dominant(1.01)


def test_stats_accumulator_time_average():
    """Time-averaged statistics: mean of snapshots, fluctuations from
    second moments, closure defect computed on averaged stresses."""
    sim = _channel(N=48)
    state = init_poiseuille(sim.cfg, sim.mesh, fraction=1.0)
    from cfdnn_tpu.diagnostics import StatsAccumulator
    acc = StatsAccumulator(sim)
    for _ in range(100):
        state, _ = sim.step(state)
    for _ in range(5):
        state, _ = sim.step(state)
        acc.update(state)
    st = acc.finalize()
    assert st.u_tau > 0 and np.isfinite(st.Re_tau)
    # laminar: time-averaged fluctuations vanish (to the sqrt-cancellation
    # floor of the two-moment formula, ~sqrt(eps)*U)
    assert st.u_rms.max() < 1e-5
    closure = acc.momentum_balance_closure()
    assert closure < 0.10, closure


def test_nan_sentinel_reports_location():
    """CFDNN_NAN_SENTINEL=1 prints per-stage nonfinite counts with exact
    (i,j,k,component) + dt context (reference solver_time.cpp:1339-1377
    per-RK-stage NaN sentinels)."""
    import os
    import subprocess
    import sys
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "from cfdnn_tpu import Config, Simulation, perturbed_channel\n"
        "cfg = Config(Nx=8, Ny=12, Nz=4, nu=0.01, nu_specified=True,\n"
        "             dp_dx=-1e-3, dp_dx_specified=True, dt=1e30,\n"
        "             adaptive_dt=False, dtype='float32')\n"
        "sim = Simulation(cfg)\n"
        "st = perturbed_channel(cfg, sim.mesh, amp=0.5)\n"
        "for _ in range(2):\n"
        "    st, d = sim.step(st)\n"
        "jax.block_until_ready(st.u)\n"
    )
    env = dict(os.environ, CFDNN_NAN_SENTINEL="1", JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, env=env, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    out = r.stdout + r.stderr
    assert "[nan-sentinel]" in out and "first=(" in out, out[-2000:]


def test_energy_spectrum_3d_parseval_and_peak():
    """Shell-summed E(k) equals the mean KE density (Parseval), and the
    TGV initial condition peaks at shell k=2 (|k|=(1,1,1) modes -> rint
    sqrt(3) = 2)."""
    import math

    import jax.numpy as jnp

    from cfdnn_tpu import init_taylor_green
    from cfdnn_tpu.config import BCType
    from cfdnn_tpu.diagnostics import energy_spectrum_3d
    from cfdnn_tpu.turbulence.base import cell_center_velocity

    L = 2 * math.pi
    cfg = Config(Nx=32, Ny=32, Nz=32, x_max=L, y_max=L, z_max=L,
                 bc_y=BCType.PERIODIC, nu=1 / 1600, nu_specified=True,
                 dt=1e-3, adaptive_dt=False, dtype="float64")
    sim = Simulation(cfg)
    state = init_taylor_green(cfg, sim.mesh)
    k, E = energy_spectrum_3d(sim, state)
    cc = cell_center_velocity((state.u, state.v, state.w), sim.geom)
    ke = float(0.5 * sum(jnp.mean(c ** 2) for c in cc))
    assert abs(E.sum() - ke) <= 1e-12 * max(ke, 1e-30)
    assert int(k[np.argmax(E)]) == 2
    # wall-bounded boxes are rejected
    cfg_wall = Config(Nx=8, Ny=8, Nz=8, nu=0.01, nu_specified=True,
                      dt=1e-3, adaptive_dt=False, dtype="float64")
    sim_wall = Simulation(cfg_wall)
    with pytest.raises(ValueError):
        energy_spectrum_3d(sim_wall, init_taylor_green(cfg_wall,
                                                       sim_wall.mesh))


def _reichardt_stats(Re_tau: float, N: int = 192) -> diag.ChannelStats:
    """Synthetic ChannelStats whose mean profile is the Reichardt
    law-of-the-wall (kappa=0.41, asymptotic B ~= 5.63), on a uniform
    center grid in [0, 2] with u_tau = 1, nu = 1/Re_tau."""
    kappa = 0.41
    y_lo, y_hi = 0.0, 2.0
    h = (y_hi - y_lo) / N
    y = y_lo + h * (np.arange(N) + 0.5)
    dist = np.minimum(y - y_lo, y_hi - y)
    lv = 1.0 / Re_tau          # delta = 1, u_tau = 1
    yp = dist / lv
    Up = (np.log(1.0 + kappa * yp) / kappa
          + 7.8 * (1.0 - np.exp(-yp / 11.0) - (yp / 11.0) * np.exp(-yp / 3.0)))
    z = np.zeros(N)
    return diag.ChannelStats(
        y=y, U=Up, u_rms=z, v_rms=z, w_rms=z, uv=z,
        u_tau=1.0, Re_tau=Re_tau, y_plus_1=float(yp[0]),
        dx_plus=0.0, dz_plus=0.0)


def test_log_law_fit_recovers_reichardt_constants():
    st = _reichardt_stats(590.0)
    fit = diag.log_law_fit(st)
    # Reichardt asymptote: slope 1/0.41, intercept ln(0.41)/0.41 + 7.8
    assert fit["n_fit_points"] >= 10
    assert abs(fit["kappa"] - 0.41) < 0.03, fit
    assert abs(fit["B"] - 5.63) < 0.6, fit
    # centerline U+ of the synthetic profile ~ Reichardt at y+ = Re_tau
    assert abs(fit["centerline_u_plus"]
               - (np.log(1 + 0.41 * 590) / 0.41 + 7.8)) < 0.05


def test_log_law_fit_marginal_window_at_180():
    st = _reichardt_stats(180.0)
    fit = diag.log_law_fit(st)
    assert fit["n_fit_points"] >= 3          # window exists even at 180
    assert 0.3 < fit["kappa"] < 0.5
    assert np.isfinite(fit["B"])


def test_log_law_fit_mkm_table_exists():
    assert set(diag.MKM_CENTERLINE_U_PLUS) == {180.0, 395.0, 590.0}


def test_energy_budget_with_turbulence_model():
    """energy_budget with an active closure: nu_eff is a 3-D field, the
    dissipation must be its volume-weighted contraction with S^2 (this
    crashed with TypeError before: float() of a field)."""
    from cfdnn_tpu.config import TurbulenceModel
    cfg = Config(Nx=16, Ny=16, Nz=8, stretch_y=True,
                 nu=1e-3, nu_specified=True, dp_dx=-1e-3,
                 dp_dx_specified=True, dt=1e-3, adaptive_dt=False,
                 dtype="float64", turb_model=TurbulenceModel.SMAGORINSKY)
    sim = Simulation(cfg)
    state = sim.initialize(perturbed_channel(cfg, sim.mesh, amp=0.05))
    state, _ = sim.step(state)
    b = diag.energy_budget(sim, state)
    for k in ("ke", "power_input", "dissipation", "balance_residual"):
        assert np.isfinite(b[k]), (k, b)
    assert b["dissipation"] > 0.0


def test_momentum_closure_includes_modeled_stress():
    """For a converged SST channel the load is carried by nu_t dU/dy;
    the closure defect must account for it (omitting the modeled stress
    reported an O(1) defect on a healthy RANS run)."""
    from cfdnn_tpu.config import TurbulenceModel
    cfg = Config(Nx=4, Ny=64, Nz=1, nu=1.0 / 180.0, nu_specified=True,
                 dp_dx=-1.0, dp_dx_specified=True, dt=1e-3,
                 adaptive_dt=True, CFL_max=0.5, dtype="float64",
                 turb_model=TurbulenceModel.SST)
    sim = Simulation(cfg)
    state = sim.initialize(init_poiseuille(cfg, sim.mesh, fraction=0.05))
    for _ in range(40):
        state, _ = sim.run(state, 500)
    defect = diag.momentum_balance_closure(sim, state)
    assert defect < 0.10, defect


def test_spectral_analysis_script(tmp_path):
    """scripts/spectral_analysis.py (reference scripts/spectral_analysis
    .py parity: VTK -> E(k) post-processing): Parseval to roundoff and
    shell-exact agreement with the in-solver diagnostics spectrum."""
    import importlib.util
    import os
    import numpy as np

    from cfdnn_tpu import BCType, Config, Simulation, init_taylor_green
    from cfdnn_tpu.diagnostics import energy_spectrum_3d
    from cfdnn_tpu.io.vtk import write_vtk

    cfg = Config(Nx=16, Ny=16, Nz=16, bc_y=BCType.PERIODIC,
                 x_max=2 * np.pi, y_max=2 * np.pi, z_max=2 * np.pi,
                 nu=1e-3, nu_specified=True, dp_dx=0.0,
                 dp_dx_specified=True, dt=1e-3, adaptive_dt=False,
                 dtype="float64").finalize()
    sim = Simulation(cfg)
    state = sim.initialize(init_taylor_green(cfg, sim.mesh))
    state, _ = sim.run(state, 3)
    path = str(tmp_path / "tgv.vtk")
    write_vtk(path, state, sim.mesh, sim.geom, cfg)

    spec = importlib.util.spec_from_file_location(
        "spectral_analysis",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "spectral_analysis.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    res = mod.analyze(path)
    assert res["parseval"] < 1e-12
    k, E = energy_spectrum_3d(sim, state)
    dat = np.loadtxt(str(tmp_path / "tgv_spectrum.dat"))
    np.testing.assert_allclose(dat[: len(E), 1], E, rtol=1e-10, atol=1e-18)
