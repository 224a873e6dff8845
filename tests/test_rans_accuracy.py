"""RANS channel accuracy at Re_tau = 180 (reference: tests/test_rans_
accuracy.cpp, tests/test_rans_channel_validation.cpp vs MKM DNS).

SST on a uniform grid (as the reference's RANS tests use): the steady
solution must reproduce the MKM bulk velocity and the log law.
"""

import numpy as np
import pytest

from cfdnn_tpu import Config, Simulation, init_poiseuille
from cfdnn_tpu import diagnostics as diag
from cfdnn_tpu.config import TurbulenceModel


@pytest.mark.slow
def test_sst_channel_mkm(record_qoi):
    cfg = Config(Nx=4, Ny=96, Nz=1,
                 nu=1.0 / 180.0, nu_specified=True,
                 dp_dx=-1.0, dp_dx_specified=True,
                 dt=1e-3, adaptive_dt=True, CFL_max=0.5,
                 dtype="float64", turb_model=TurbulenceModel.SST,
                 benchmark=False)
    sim = Simulation(cfg)
    state = sim.initialize(init_poiseuille(cfg, sim.mesh, fraction=0.05))
    for _ in range(60):
        state, d = sim.run(state, 500)
        assert np.isfinite(float(d.ke))
    st = diag.channel_statistics(sim, state)
    yp = (st.y + 1.0) * st.u_tau / cfg.nu
    Up = st.U / st.u_tau

    record_qoi("sst_channel_re_tau", st.Re_tau)
    record_qoi("sst_channel_u_bulk", float(st.U.mean()))
    # global momentum balance pins u_tau -> Re_tau ~ 180
    assert 160.0 < st.Re_tau < 200.0, st.Re_tau
    # MKM bulk velocity 15.6 u_tau (gate +-10%)
    assert abs(float(st.U.mean()) - 15.6) / 15.6 < 0.10
    # log law U+ = ln(y+)/kappa + 5.0 within 10% over the log layer
    mask = (yp > 30) & (yp < 120)
    ll = np.log(yp[mask]) / 0.41 + 5.0
    err = float(np.abs(Up[mask] - ll).max() / np.abs(ll).max())
    record_qoi("sst_channel_loglaw_err", err)
    assert err < 0.10, f"log-law deviation {err}"
    # nu_t profile scale: peak nu_t+ within the expected SST band
    nut = np.asarray(state.nu_t).mean(axis=(0, 2))
    assert 10.0 < nut.max() * 180.0 < 40.0


@pytest.mark.slow
def test_sst_channel_mkm395(record_qoi):
    """Second MKM point, Re_tau = 395: the SST channel must recover the
    friction Reynolds number from the fixed dp/dx momentum balance and
    the MKM bulk velocity U+ = 17.54 (calibrated: settles at Re_tau 393.3
    / U+ 18.14 after 120k steps, ~30 s on CPU, with the standard Menter
    production P_k = nu_t S^2 — the reference doubles it)."""
    cfg = Config(Nx=4, Ny=128, Nz=1,
                 nu=1.0 / 395.0, nu_specified=True,
                 dp_dx=-1.0, dp_dx_specified=True,
                 dt=1e-3, adaptive_dt=True, CFL_max=0.5,
                 dtype="float64", turb_model=TurbulenceModel.SST)
    sim = Simulation(cfg)
    state = sim.initialize(init_poiseuille(cfg, sim.mesh, fraction=0.05))
    for _ in range(240):
        state, d = sim.run(state, 500)
        assert np.isfinite(float(d.ke))
    st = diag.channel_statistics(sim, state)
    record_qoi("sst_channel_re_tau_395", st.Re_tau)
    record_qoi("sst_channel_u_bulk_395", float(st.U.mean()))
    assert 375.0 < st.Re_tau < 415.0, st.Re_tau
    assert abs(float(st.U.mean()) - 17.54) / 17.54 < 0.05
    yp = (st.y + 1.0) * st.u_tau / cfg.nu
    Up = st.U / st.u_tau
    mask = (yp > 30) & (yp < 300)
    ll = np.log(yp[mask]) / 0.41 + 5.0
    err = float(np.abs(Up[mask] - ll).max() / np.abs(ll).max())
    record_qoi("sst_channel_loglaw_err_395", err)
    assert err < 0.10, err
    # profile-shape fit: on this deliberately coarse uniform grid
    # (dy+ ~ 6) the SST buffer layer extends past y+ = 100, so the
    # standard-window slope reads low (kappa ~ 0.30) — gate the
    # centerline U+ against MKM instead (the level the whole profile
    # integrates to), and the slope loosely.
    fit = diag.log_law_fit(st)
    uc = diag.MKM_CENTERLINE_U_PLUS[395.0]
    assert abs(fit["centerline_u_plus"] - uc) / uc < 0.03, fit
    assert 0.25 < fit["kappa"] < 0.50, fit
