"""LES physics validation on the 3D Taylor-Green vortex.

Mirrors the reference suite (reference: tests/test_les_tgv_dissipation.cpp
— SGS models add dissipation beyond laminar, with sane ordering;
tests/test_les_channel_retau.cpp sanity).
"""

import numpy as np
import pytest

from cfdnn_tpu import BCType, Config, Simulation, init_taylor_green
from cfdnn_tpu.config import ConvectiveScheme, TimeIntegrator, TurbulenceModel


def _tgv_cfg(model, N=32):
    return Config(
        Nx=N, Ny=N, Nz=N,
        x_min=0.0, x_max=2 * np.pi, y_min=0.0, y_max=2 * np.pi,
        z_min=0.0, z_max=2 * np.pi,
        bc_x=BCType.PERIODIC, bc_y=BCType.PERIODIC, bc_z=BCType.PERIODIC,
        nu=1.0 / 1600.0, nu_specified=True, dp_dx=0.0, dp_dx_specified=True,
        dt=5e-3, adaptive_dt=False,
        time_integrator=TimeIntegrator.RK3,
        convective_scheme=ConvectiveScheme.SKEW,
        turb_model=model, dtype="float64", use_pallas="off",
    )


def _run_ke(model, n_steps=200):
    cfg = _tgv_cfg(model)
    sim = Simulation(cfg)
    state = init_taylor_green(cfg, sim.mesh)
    state, d = sim.run(state, n_steps)
    assert np.isfinite(float(d.ke)), model
    return float(d.ke)


@pytest.mark.slow
def test_les_tgv_dissipation_ordering():
    """Every SGS model must dissipate at least as fast as laminar DNS on
    an under-resolved TGV, and all stay stable (reference gate)."""
    ke = {m: _run_ke(m) for m in (
        TurbulenceModel.NONE, TurbulenceModel.SMAGORINSKY,
        TurbulenceModel.WALE, TurbulenceModel.VREMAN,
        TurbulenceModel.SIGMA, TurbulenceModel.DYNAMIC_SMAGORINSKY)}
    lam = ke[TurbulenceModel.NONE]
    for m, v in ke.items():
        if m == TurbulenceModel.NONE:
            continue
        assert v <= lam + 1e-10, (
            f"{m.value}: KE {v} above laminar {lam} — SGS added energy")
    # static Smagorinsky dissipates more than WALE on the early smooth TGV
    # (WALE's Sd-based measure nearly vanishes for this strain topology);
    # Smagorinsky vs Vreman differ only at the 1e-4 level here, so no
    # ordering is asserted between them.
    assert ke[TurbulenceModel.SMAGORINSKY] <= ke[TurbulenceModel.WALE] + 1e-6


def test_tgv_ke_decay_monotonic_enstrophy_rises():
    """Laminar 3D TGV: KE decays monotonically; enstrophy grows during
    vortex stretching before the dissipation peak (classic Re=1600
    behavior, reference TGV QOIs app/main_taylor_green_3d.cpp:254-289)."""
    cfg = _tgv_cfg(TurbulenceModel.NONE, N=24)
    sim = Simulation(cfg)
    state = init_taylor_green(cfg, sim.mesh)
    from cfdnn_tpu.apps.taylor_green_3d import enstrophy
    kes, ens = [], []
    for _ in range(10):
        state, d = sim.run(state, 40)
        kes.append(float(d.ke))
        ens.append(enstrophy(sim, state))
    assert all(b < a + 1e-12 for a, b in zip(kes, kes[1:])), kes
    assert max(ens) > ens[0] * 1.2, (
        f"enstrophy should grow by vortex stretching: {ens}")
