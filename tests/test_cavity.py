"""Moving-wall (lid) BC gates: Couette, Stokes' first problem, and the
Ghia lid-driven cavity benchmark.

Reference: tests/test_physics_validation_advanced.cpp — its cavity leg
(:464-530) reaches this physics only by rewriting the u ghost row every
step; here `Config.lid_velocity` is a first-class tangential-wall value
threaded through the ghost rules (ops/bc.pad_tangential, AxisGeom.tang).
The cavity is also the only case whose Poisson domain has NO periodic
axis — it exercises the FDM dense-eigenbasis path on two wall axes at
once (poisson/fdm.py).
"""

import numpy as np
import pytest
from scipy.special import erfc

from cfdnn_tpu import BCType, Config, Simulation, zero_state

# Ghia, Ghia & Shin (1982), Re=100: u through the vertical centerline.
GHIA_Y = np.array([0.0547, 0.0625, 0.0703, 0.1016, 0.1719, 0.2813,
                   0.4531, 0.5000, 0.6172, 0.7344, 0.8516, 0.9531,
                   0.9609, 0.9688, 0.9766])
GHIA_U = np.array([-0.03717, -0.04192, -0.04775, -0.06434, -0.10150,
                   -0.15662, -0.21090, -0.20581, -0.13641, 0.00332,
                   0.23151, 0.68717, 0.73722, 0.78871, 0.84123])


def test_couette_analytic(record_qoi):
    """Moving-belt channel: periodic x, stationary bottom wall, lid at
    U=1 — steady state is the exact linear Couette profile u = U y/H
    (representable exactly by the O2 operators, so the error is only the
    residual transient, which decays as exp(-pi^2 nu t / H^2))."""
    cfg = Config(Nx=8, Ny=32, Nz=1, y_min=0.0, y_max=1.0,
                 bc_x=BCType.PERIODIC, bc_y=BCType.WALL,
                 nu=0.1, nu_specified=True, dp_dx=0.0,
                 dp_dx_specified=True, dt=2e-3, adaptive_dt=False,
                 lid_velocity=1.0, dtype="float64").finalize()
    sim = Simulation(cfg)
    state, _ = sim.run(sim.initialize(zero_state(cfg)), 8000)  # t=16
    u = np.asarray(state.u).mean(axis=(0, 2))
    yc = np.asarray(sim.mesh.y.centers)
    err = np.abs(u - yc).max()
    record_qoi("couette_max_err", err)
    assert err < 1e-6     # transient at t=16: exp(-pi^2*0.1*16) ~ 1e-7


def test_stokes_first_problem(record_qoi):
    """Impulsively started lid over initially quiescent fluid: before
    the diffusion front reaches the far wall the similarity solution is
    u(d, t) = U erfc(d / (2 sqrt(nu t))) with d the distance below the
    lid (reference test_physics_validation_advanced.cpp:352 runs the
    same transient off its bottom plate)."""
    nu = 1e-3
    cfg = Config(Nx=8, Ny=96, Nz=1, y_min=0.0, y_max=1.0,
                 bc_x=BCType.PERIODIC, bc_y=BCType.WALL,
                 nu=nu, nu_specified=True, dp_dx=0.0,
                 dp_dx_specified=True, dt=5e-3, adaptive_dt=False,
                 lid_velocity=1.0, dtype="float64").finalize()
    sim = Simulation(cfg)
    state, _ = sim.run(sim.initialize(zero_state(cfg)), 800)
    t = float(state.t)
    u = np.asarray(state.u).mean(axis=(0, 2))
    yc = np.asarray(sim.mesh.y.centers)
    d = 1.0 - yc
    exact = erfc(d / (2.0 * np.sqrt(nu * t)))
    # depth 4.8 sqrt(nu t) contains >99.99% of the motion; the far wall
    # is ~14 deltas away so the semi-infinite solution applies
    relL2 = np.sqrt(((u - exact) ** 2).sum() / (exact ** 2).sum())
    record_qoi("stokes_first_relL2", relL2)
    assert relL2 < 0.03


def test_lid_driven_cavity_ghia(record_qoi):
    """Lid-driven cavity Re=100 at 64^2 vs the Ghia/Ghia/Shin (1982)
    table: max |u - u_Ghia| on the vertical centerline < 0.10 (the
    reference's gate, test_physics_validation_advanced.cpp:525); here it
    lands ~0.003, gated at 0.015 to lock the margin in."""
    cfg = Config(Nx=64, Ny=64, Nz=1, x_min=0.0, x_max=1.0,
                 y_min=0.0, y_max=1.0,
                 bc_x=BCType.WALL, bc_y=BCType.WALL,
                 nu=0.01, nu_specified=True, dp_dx=0.0,
                 dp_dx_specified=True, dt=2e-3, adaptive_dt=True,
                 lid_velocity=1.0, dtype="float64").finalize()
    sim = Simulation(cfg)
    assert "FDM" in sim.poisson_selection_reason   # all-wall eigenbasis path
    state = sim.initialize(zero_state(cfg))
    prev = -1.0
    for _ in range(20):
        state, diag = sim.run(state, 500)
        ke = float(diag.ke)
        if abs(ke - prev) < 1e-8 * max(abs(ke), 1e-30):
            break
        prev = ke
    u = np.asarray(state.u)[cfg.Nx // 2, :, 0]     # face at x = 0.5
    yc = np.asarray(sim.mesh.y.centers)
    err = np.abs(np.interp(GHIA_Y, yc, u) - GHIA_U).max()
    record_qoi("cavity_ghia_max_err", err)
    assert err < 0.015
    assert float(diag.div_linf) < 1e-12


GHIA_U_400 = np.array([-0.08186, -0.09266, -0.10338, -0.14612, -0.24299,
                       -0.32726, -0.17119, -0.11477, 0.02135, 0.16256,
                       0.29093, 0.55892, 0.61756, 0.68439, 0.75837])


@pytest.mark.slow
def test_lid_driven_cavity_ghia_re400(record_qoi):
    """Cavity Re=400 at 128^2: the inertia-dominated regime (secondary
    corner eddies, off-center primary vortex) vs the Ghia table —
    measured 0.0031 max centerline-u error."""
    cfg = Config(Nx=128, Ny=128, Nz=1, x_min=0.0, x_max=1.0,
                 y_min=0.0, y_max=1.0,
                 bc_x=BCType.WALL, bc_y=BCType.WALL,
                 nu=1.0 / 400, nu_specified=True, dp_dx=0.0,
                 dp_dx_specified=True, dt=2e-3, adaptive_dt=True,
                 lid_velocity=1.0, dtype="float64").finalize()
    sim = Simulation(cfg)
    state = sim.initialize(zero_state(cfg))
    prev = -1.0
    for _ in range(40):
        state, diag = sim.run(state, 1000)
        ke = float(diag.ke)
        if abs(ke - prev) < 1e-9 * max(abs(ke), 1e-30):
            break
        prev = ke
    u = np.asarray(state.u)[cfg.Nx // 2, :, 0]
    yc = np.asarray(sim.mesh.y.centers)
    err = np.abs(np.interp(GHIA_Y, yc, u) - GHIA_U_400).max()
    record_qoi("cavity_ghia_re400_max_err", err)
    assert err < 0.02


def test_lid_config_validation():
    with pytest.raises(ValueError, match="lid_velocity requires"):
        Config(bc_y=BCType.PERIODIC, lid_velocity=1.0,
               nu=0.1, nu_specified=True, dp_dx=0.0,
               dp_dx_specified=True).finalize()
    with pytest.raises(ValueError, match="implicit_y_diffusion"):
        Config(lid_velocity=1.0, implicit_y_diffusion=True,
               nu=0.1, nu_specified=True, dp_dx=0.0,
               dp_dx_specified=True).finalize()
