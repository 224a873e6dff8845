"""Trip forcing, velocity filter, implicit y-diffusion, force ramp,
bulk controller tests.

Mirrors the reference coverage (reference: tests/test_perturbed_channel.cpp,
the implicit-diffusion stability leg of tests/test_time_integrators.cpp,
trip machinery of solver.cpp:818-950).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from cfdnn_tpu import BCType, Config, Simulation, init_poiseuille
from cfdnn_tpu.forcing import TripForcing, implicit_y_diffusion, velocity_filter
from cfdnn_tpu.ops.tridiag import thomas


def _cfg(**kw):
    base = dict(Nx=16, Ny=32, Nz=8, z_max=1.0,
                nu=1e-3, nu_specified=True, dp_dx=-1e-3, dp_dx_specified=True,
                dt=1e-3, adaptive_dt=False, dtype="float64")
    base.update(kw)
    return Config(**base)


def test_thomas_matches_dense():
    rng = np.random.default_rng(0)
    n = 17
    l = rng.uniform(0.1, 0.5, n)
    u = rng.uniform(0.1, 0.5, n)
    d = 2.0 + l + u
    b = rng.standard_normal((4, n, 3))
    x = np.asarray(thomas(jnp.asarray(l.reshape(1, -1, 1)),
                          jnp.asarray(d.reshape(1, -1, 1)),
                          jnp.asarray(u.reshape(1, -1, 1)),
                          jnp.asarray(b), axis=1))
    A = np.diag(d) + np.diag(u[:-1], 1) + np.diag(l[1:], -1)
    for i in range(4):
        for k in range(3):
            np.testing.assert_allclose(A @ x[i, :, k], b[i, :, k],
                                       rtol=1e-12, atol=1e-12)


def test_trip_forcing_localized_and_ramped():
    cfg = _cfg(trip_enabled=True, trip_duration=2.0, trip_ramp_off_start=1.5)
    sim = Simulation(cfg)
    trip = sim.trip
    assert trip is not None
    state = sim.initial_state()
    star = (state.u, state.v, state.w)
    out = trip.apply(star, 1e-3, jnp.asarray(0.5))
    dv = np.asarray(out[1])
    assert np.abs(dv).max() > 0.0
    # forcing confined to the x-window [0.1, 0.2] Lx
    x_profile = np.abs(dv).max(axis=(1, 2))
    xc = sim.mesh.x.centers
    lo = cfg.x_min + 0.1 * cfg.Lx
    hi = cfg.x_min + 0.2 * cfg.Lx
    outside = (xc < lo - 1e-9) | (xc > hi + 1e-9)
    assert np.all(x_profile[outside] == 0.0)
    # after trip_duration the ramp is exactly zero
    out2 = trip.apply(star, 1e-3, jnp.asarray(2.5))
    assert np.abs(np.asarray(out2[1])).max() == 0.0
    # w forcing present in 3D
    assert np.abs(np.asarray(out[2])).max() > 0.0


def test_trip_step_stable():
    cfg = _cfg(trip_enabled=True, trip_amplitude=1.0)
    sim = Simulation(cfg)
    state = init_poiseuille(cfg, sim.mesh, fraction=1.0)
    for _ in range(10):
        state, d = sim.step(state)
    assert np.isfinite(float(d.ke))
    # spanwise velocity energized by the trip
    assert float(jnp.abs(state.w).max()) > 0.0


def test_velocity_filter_preserves_mean_removes_noise():
    cfg = _cfg(Nz=1)
    sim = Simulation(cfg)
    state = init_poiseuille(cfg, sim.mesh, fraction=1.0)
    rng = np.random.default_rng(1)
    noise = rng.standard_normal(state.u.shape) * 1e-3
    u_noisy = state.u + jnp.asarray(noise)
    comps = (u_noisy, state.v, state.w)
    filtered = velocity_filter(comps, sim.geom, strength=1.0)
    # mean nearly preserved (the y part skips wall rows, so only the
    # periodic x/z parts are exactly conservative)
    assert abs(float(jnp.mean(filtered[0])) - float(jnp.mean(u_noisy))) < 5e-3
    # high-frequency content reduced
    def hf_energy(u):
        un = np.asarray(u)[:, :, 0]
        d2 = un[2:] - 2 * un[1:-1] + un[:-2]
        return np.sum(d2**2)
    assert hf_energy(filtered[0]) < hf_energy(u_noisy)


def test_implicit_y_diffusion_stability():
    """dt far above the explicit y-diffusion limit stays stable with the
    implicit solve on a stretched mesh (the reference's IMEX purpose)."""
    cfg = _cfg(Nz=1, Ny=64, stretch_y=True, stretch_beta=2.5,
               implicit_y_diffusion=True, nu=1e-2, dt=5e-3)
    sim = Simulation(cfg)
    dy_min = float(np.min(sim.mesh.y.d))
    dt_exp_limit = 0.25 * dy_min**2 / cfg.nu
    assert cfg.dt > 5 * dt_exp_limit, "test must exceed the explicit limit"
    state = init_poiseuille(cfg, sim.mesh, fraction=1.0)
    for _ in range(20):
        state, d = sim.step(state)
    assert np.isfinite(float(d.ke))
    assert float(d.ke) < 10.0


def test_implicit_y_diffusion_decay_rate():
    """Pure diffusion of a sine profile decays at the right rate."""
    cfg = _cfg(Nz=1, Ny=64, nu=1e-2)
    sim = Simulation(cfg)
    yc = sim.mesh.y.centers
    u0 = np.sin(np.pi * (yc + 1.0) / 2.0)   # one half-wave, zero at walls
    state = sim.initial_state()
    u = jnp.broadcast_to(jnp.asarray(u0)[None, :, None], state.u.shape)
    dt = 0.05
    out = implicit_y_diffusion((u, state.v, state.w),
                               jnp.asarray(cfg.nu), dt, sim.geom)
    lam = cfg.nu * (np.pi / 2.0) ** 2
    expected = u0 / (1.0 + dt * lam)    # backward-Euler decay factor
    got = np.asarray(out[0])[0, :, 0]
    np.testing.assert_allclose(got, expected, rtol=2e-3)


def test_force_ramp_and_bulk_controller():
    cfg = _cfg(Nz=1, force_ramp_time=0.5)
    sim = Simulation(cfg)
    state = sim.initial_state()
    # at t=0 the ramped force is ~0 => velocity barely moves
    state1, _ = sim.step(state)
    assert float(jnp.abs(state1.u).max()) < 1e-5
    # bulk controller drives the mean velocity toward the target
    cfg2 = _cfg(Nz=1, bulk_velocity_target=0.3)
    sim2 = Simulation(cfg2)
    state = sim2.initial_state()
    for _ in range(5):
        state, _ = sim2.step(state)
    u_bulk = float(jnp.mean(state.u))
    assert abs(u_bulk - 0.3) < 0.05


def test_implicit_y_diffusion_staggered_nu_nonperiodic_x():
    """IMEX y-diffusion with a FIELD nu_eff and non-periodic x: the
    staggered u carries Nx+1 faces vs nu_eff's Nx cells — the solve must
    interpolate nu onto the face grid instead of crashing at trace time."""
    from cfdnn_tpu import Config, Simulation, perturbed_channel
    from cfdnn_tpu.config import BCType, TurbulenceModel
    cfg = Config(Nx=16, Ny=16, Nz=8, x_min=0.0, x_max=4.0, z_max=1.0,
                 bc_x=BCType.INFLOW, bc_y=BCType.WALL, bc_z=BCType.PERIODIC,
                 nu=1e-3, nu_specified=True, dp_dx=-2e-3,
                 dp_dx_specified=True, dt=1e-3, adaptive_dt=False,
                 dtype="float64", implicit_y_diffusion=True,
                 recycling_inflow=True, recycle_filter_tau=0.05,
                 turb_model=TurbulenceModel.SMAGORINSKY)
    sim = Simulation(cfg)
    state = sim.initialize(perturbed_channel(cfg, sim.mesh, amp=0.05))
    state, d = sim.step(state)
    assert np.isfinite(float(d.ke))


def test_implicit_y_diffusion_noop_on_open_y():
    """Open (non-wall) y boundary: the implicit solve must be a no-op —
    its Dirichlet wall-flux rows would add spurious friction there."""
    from cfdnn_tpu import Config, Simulation
    from cfdnn_tpu.config import BCType
    from cfdnn_tpu.forcing import implicit_y_diffusion
    from cfdnn_tpu.ops.grid import Geometry
    from cfdnn_tpu.mesh import Mesh
    import jax.numpy as jnp
    cfg = Config(Nx=8, Ny=8, Nz=8, bc_x=BCType.PERIODIC,
                 bc_y=BCType.OUTFLOW, bc_z=BCType.PERIODIC,
                 y_min=0.0, y_max=1.0, z_max=1.0,
                 nu=1e-3, nu_specified=True, dp_dx=0.0,
                 dp_dx_specified=True, dtype="float64")
    mesh = Mesh.from_config(cfg)
    geom = Geometry.make(mesh, cfg)
    rng = np.random.default_rng(0)
    comps = tuple(jnp.asarray(rng.standard_normal((8, 8, 8)))
                  for _ in range(3))
    out = implicit_y_diffusion(comps, 1e-3, 1e-2, geom)
    for a, b in zip(out, comps):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_implicit_y_diffusion_periodic_face_nu_placement():
    """On a PERIODIC staggered axis the component's face count equals the
    cell count, but face i sits between cells i-1 and i: variable nu must
    be c2f-averaged WITH WRAP, not taken at cell i (half-cell offset).
    Gate: the backward-Euler update at tiny dt matches the conservative
    d/dy(nu_face du/dy) operator built with the correctly placed nu."""
    cfg = _cfg(Nz=1, Ny=32, nu=1e-2, Nx=16)
    sim = Simulation(cfg)
    geom = sim.geom
    state = sim.initial_state()
    rng = np.random.default_rng(7)
    u = jnp.asarray(rng.standard_normal(state.u.shape))
    # nu varying sharply in x so misplacement is O(1) of the signal
    xc = np.asarray(sim.mesh.x.centers)
    nu_eff = jnp.asarray(
        (1e-2 * (1.0 + 0.9 * np.cos(2 * np.pi * xc / cfg.Lx)))[:, None, None]
        * np.ones((1, cfg.Ny, 1)))
    dt = 1e-6
    out = implicit_y_diffusion((u, state.v, state.w), nu_eff, dt, geom)
    got = (np.asarray(out[0]) - np.asarray(u)) / dt
    # reference operator: nu on u's x-faces (wrapped average), then the
    # same wall-Dirichlet y-flux form the solve discretizes
    from cfdnn_tpu.ops.operators import c2f_mean
    nu_f = np.asarray(c2f_mean(nu_eff, 0, geom.axes[0], kind="scalar"))
    un = np.asarray(u)
    d = np.asarray(sim.mesh.y.d)
    yf = np.asarray(sim.mesh.y.faces)
    yc = np.asarray(sim.mesh.y.centers)
    dc = np.diff(np.concatenate([[yf[0]], yc, [yf[-1]]]))  # Ny+1 spacings
    nu_face_y = np.concatenate(
        [nu_f[:, :1], 0.5 * (nu_f[:, :-1] + nu_f[:, 1:]), nu_f[:, -1:]],
        axis=1)
    upad = np.concatenate(
        [-un[:, :1], un, -un[:, -1:]], axis=1)           # no-slip ghosts*
    # * the solve's wall rows use flux (u0 - 0)/dc0, equivalent to a zero
    #   Dirichlet at the wall; emulate with the same one-sided flux:
    flux = nu_face_y * (upad[:, 1:] - upad[:, :-1]) / dc[None, :, None]
    flux[:, 0] = nu_face_y[:, 0] * un[:, 0] / dc[0]
    flux[:, -1] = -nu_face_y[:, -1] * un[:, -1] / dc[-1]
    want = (flux[:, 1:] - flux[:, :-1]) / d[None, :, None]
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)
