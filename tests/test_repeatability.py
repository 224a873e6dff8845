"""Determinism and dimensional-embedding gates (reference:
tests/test_repeatability.cpp, test_tgv_repeatability.cpp,
test_2d_3d_comparison.cpp)."""

import jax.numpy as jnp
import numpy as np

from cfdnn_tpu import BCType, Config, Simulation, init_taylor_green
from cfdnn_tpu.fields import perturbed_channel


def _tgv2d_cfg(Nz=1, **kw):
    base = dict(
        Nx=32, Ny=32, Nz=Nz,
        x_min=0.0, x_max=2 * np.pi, y_min=0.0, y_max=2 * np.pi,
        bc_x=BCType.PERIODIC, bc_y=BCType.PERIODIC,
        nu=1e-2, nu_specified=True, dp_dx=0.0, dp_dx_specified=True,
        dt=2e-3, adaptive_dt=False, dtype="float64")
    if Nz > 1:
        base.update(z_min=0.0, z_max=2 * np.pi, bc_z=BCType.PERIODIC)
    base.update(kw)
    return Config(**base).finalize()


def test_run_repeatability_bitwise():
    """Two identical runs from the same IC produce bitwise-identical
    fields (reference test_repeatability.cpp — its gate is exact
    equality on CPU; XLA executables are deterministic, so the same
    holds here including the reduction-carrying diagnostics)."""
    cfg = _tgv2d_cfg()
    outs = []
    for _ in range(2):
        sim = Simulation(cfg)
        state = sim.initialize(init_taylor_green(cfg, sim.mesh))
        state, d = sim.run(state, 50)
        outs.append((np.asarray(state.u), np.asarray(state.v),
                     float(d.ke), float(d.div_linf)))
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    np.testing.assert_array_equal(outs[0][1], outs[1][1])
    assert outs[0][2] == outs[1][2]
    assert outs[0][3] == outs[1][3]


def test_channel_repeatability_bitwise():
    """Same gate on the wall-bounded stretched-y path (turbulent-ish IC,
    adaptive dt): determinism must survive the CFL reduction + implicit
    y-solve (reference test_repeatability.cpp channel leg)."""
    cfg = Config(Nx=16, Ny=32, Nz=8, stretch_y=True,
                 nu=1e-3, nu_specified=True, dp_dx=-1e-3,
                 dp_dx_specified=True, dt=1e-3, adaptive_dt=True,
                 dtype="float64").finalize()
    outs = []
    for _ in range(2):
        sim = Simulation(cfg)
        state = sim.initialize(perturbed_channel(cfg, sim.mesh, amp=0.05))
        state, d = sim.run(state, 30)
        outs.append((np.asarray(state.u), float(state.t), float(d.ke)))
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    assert outs[0][1] == outs[1][1] and outs[0][2] == outs[1][2]


def test_2d_flow_embedded_in_3d_matches():
    """A z-invariant 2-D flow advanced by the 3-D solver (Nz=8 periodic)
    matches the Nz=1 solve plane-for-plane and stays z-invariant with
    w = 0 (reference test_2d_3d_comparison.cpp)."""
    steps = 60
    cfg2 = _tgv2d_cfg(Nz=1)
    sim2 = Simulation(cfg2)
    s2 = sim2.initialize(init_taylor_green(cfg2, sim2.mesh))
    s2, d2 = sim2.run(s2, steps)

    cfg3 = _tgv2d_cfg(Nz=8)
    sim3 = Simulation(cfg3)
    s3 = sim3.initial_state()
    # embed the 2-D TGV IC uniformly in z
    ic2 = init_taylor_green(cfg2, sim2.mesh)
    u3 = jnp.broadcast_to(ic2.u[:, :, :1], s3.u.shape).astype(s3.u.dtype)
    v3 = jnp.broadcast_to(ic2.v[:, :, :1], s3.v.shape).astype(s3.v.dtype)
    s3 = sim3.initialize(s3.replace(u=u3, v=v3))
    s3, d3 = sim3.run(s3, steps)

    u3n, v3n, w3n = (np.asarray(s3.u), np.asarray(s3.v), np.asarray(s3.w))
    # stays exactly z-invariant (all planes identical) and w ~ 0
    for k in range(1, u3n.shape[2]):
        np.testing.assert_array_equal(u3n[:, :, k], u3n[:, :, 0])
    assert np.max(np.abs(w3n)) < 1e-12
    # plane matches the true 2-D solve
    u2n, v2n = np.asarray(s2.u)[:, :, 0], np.asarray(s2.v)[:, :, 0]
    np.testing.assert_allclose(u3n[:, :, 0], u2n, rtol=0, atol=1e-11)
    np.testing.assert_allclose(v3n[:, :, 0], v2n, rtol=0, atol=1e-11)


def test_scheme_integrator_matrix():
    """Every convective scheme x time integrator combination advances a
    perturbed channel stably (reference test_scheme_combinations.cpp /
    test_scheme_comprehensive.cpp)."""
    from cfdnn_tpu.config import ConvectiveScheme, TimeIntegrator

    for scheme in ConvectiveScheme:
        for integ in TimeIntegrator:
            cfg = Config(Nx=12, Ny=24, Nz=6, stretch_y=True,
                         nu=2e-3, nu_specified=True, dp_dx=-1e-3,
                         dp_dx_specified=True, dt=2e-3, adaptive_dt=True,
                         convective_scheme=scheme, time_integrator=integ,
                         dtype="float64").finalize()
            sim = Simulation(cfg)
            state = sim.initialize(
                perturbed_channel(cfg, sim.mesh, amp=0.05))
            state, d = sim.run(state, 40)
            assert np.isfinite(float(d.ke)), (scheme, integ)
            assert float(d.div_linf) < 1e-10, (scheme, integ)


def test_steady_state_integrator_agreement():
    """The converged steady Poiseuille profile is a property of the
    spatial discretization, not the time integrator: Euler/RK2/RK3 must
    land on the same profile (reference test_time_integrators.cpp)."""
    from cfdnn_tpu import init_poiseuille
    from cfdnn_tpu.config import TimeIntegrator

    profiles = {}
    for integ in TimeIntegrator:
        cfg = Config(Nx=8, Ny=32, Nz=1, nu=0.05, nu_specified=True,
                     dp_dx=-1.0, dp_dx_specified=True, dt=5e-3,
                     adaptive_dt=False, max_steps=20000, tol=1e-10,
                     time_integrator=integ, dtype="float64")
        sim = Simulation(cfg)
        state, d = sim.solve_steady(init_poiseuille(cfg, sim.mesh))
        profiles[integ.value] = np.asarray(state.u)[:, :, 0].mean(axis=0)
    base = profiles["euler"]
    for name, prof in profiles.items():
        # the steady-state criterion is max|u - u_old| < 1e-10 per step,
        # so integrators may park ~1e-7 apart after accumulation
        np.testing.assert_allclose(prof, base, rtol=0, atol=1e-6,
                                   err_msg=name)
