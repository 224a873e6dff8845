"""Pallas fused-kernel parity vs the jnp operator chain (interpret mode on
CPU — the analogue of the reference's CPU/GPU kernel-parity suite,
tests/test_kernel_parity_detailed.cpp / test_cross_backend.cpp)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cfdnn_tpu import BCType, Config, ConvectiveScheme, Simulation, init_taylor_green
from cfdnn_tpu.mesh import Mesh
from cfdnn_tpu.ops import operators as ops
from cfdnn_tpu.ops.grid import Geometry
from cfdnn_tpu.ops.pallas_kernels import fused_predictor, predictor_slab_math


def _setup(N=16):
    cfg = Config(Nx=N, Ny=N, Nz=N, bc_x=BCType.PERIODIC,
                 bc_y=BCType.PERIODIC, bc_z=BCType.PERIODIC,
                 y_min=0.0, y_max=1.0, x_max=1.0, z_max=2.0,
                 nu=3e-3, nu_specified=True, dp_dx=-0.7,
                 dp_dx_specified=True, dtype="float64",
                 convective_scheme=ConvectiveScheme.SKEW)
    mesh = Mesh.from_config(cfg)
    return cfg, mesh, Geometry.make(mesh, cfg)


def test_fused_predictor_matches_operators():
    cfg, mesh, geom = _setup()
    rng = np.random.default_rng(0)
    N = cfg.Nx
    u, v, w = (jnp.asarray(rng.standard_normal((N, N, N))) for _ in range(3))
    dt, nu, fx = 1e-3, cfg.nu, -cfg.dp_dx
    conv = ops.convective((u, v, w), geom, ConvectiveScheme.SKEW)
    diff = ops.diffusive((u, v, w), jnp.float64(nu), geom)
    ref = (u + dt * (-conv[0] + diff[0] + fx),
           v + dt * (-conv[1] + diff[1]),
           w + dt * (-conv[2] + diff[2]))
    got = fused_predictor(u, v, w, dt, hx=geom.x.h, hy=geom.y.h,
                          hz=geom.z.h, nu=nu, fx=fx, bx=4, interpret=True)
    for name, a, b in zip("uvw", ref, got):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=0, atol=1e-13, err_msg=name)


def test_fused_predictor_odd_block_fallback():
    """Nx not divisible by the block: falls back to bx=1 and still matches."""
    cfg, mesh, geom = _setup(N=12)
    rng = np.random.default_rng(1)
    u, v, w = (jnp.asarray(rng.standard_normal((12, 12, 12)))
               for _ in range(3))
    conv = ops.convective((u, v, w), geom, ConvectiveScheme.SKEW)
    diff = ops.diffusive((u, v, w), jnp.float64(cfg.nu), geom)
    ref = u + 1e-3 * (-conv[0] + diff[0] - cfg.dp_dx)
    got = fused_predictor(u, v, w, 1e-3, hx=geom.x.h, hy=geom.y.h,
                          hz=geom.z.h, nu=cfg.nu, fx=-cfg.dp_dx,
                          bx=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref),
                               rtol=0, atol=1e-13)


def test_pallas_step_trajectory_matches_jnp():
    """Full steps with use_pallas on vs off agree to roundoff (the
    cross-backend trajectory test)."""
    base = dict(Nx=16, Ny=16, Nz=16, bc_x=BCType.PERIODIC,
                bc_y=BCType.PERIODIC, bc_z=BCType.PERIODIC,
                y_min=0.0, y_max=2 * np.pi, z_max=2 * np.pi,
                nu=1e-3, nu_specified=True, dp_dx=0.0, dp_dx_specified=True,
                dt=1e-3, adaptive_dt=False, dtype="float64",
                convective_scheme=ConvectiveScheme.SKEW)
    sim_off = Simulation(Config(use_pallas="off", **base))
    sim_on = Simulation(Config(use_pallas="on", **base))
    assert sim_on._pallas_predictor_ok
    s0 = init_taylor_green(sim_off.cfg, sim_off.mesh)
    s_off, s_on = s0, s0
    for _ in range(5):
        s_off, _ = sim_off.step(s_off)
        s_on, _ = sim_on.step(s_on)
    np.testing.assert_allclose(np.asarray(s_on.u), np.asarray(s_off.u),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(s_on.p), np.asarray(s_off.p),
                               rtol=0, atol=1e-12)


def test_pallas_not_eligible_off_fast_path():
    """Configs the fused predictor cannot serve must not take it."""
    from cfdnn_tpu.config import ConvectiveScheme as CS
    base = dict(Nx=16, Ny=16, Nz=16, use_pallas="on",
                nu=1e-3, nu_specified=True, dp_dx=-1e-3,
                dp_dx_specified=True, dtype="float64")
    # upwind2 is fused single-device (round 4) but NOT on the sharded
    # path (ppermute halo plumbing is one-cell skew/central)
    assert Simulation(Config(
        convective_scheme=CS.UPWIND2, **base))._pallas_predictor_ok
    assert not Simulation(Config(
        convective_scheme=CS.UPWIND2, mesh_shape=(8,),
        **base))._pallas_predictor_ok
    # implicit y diffusion changes the RHS (skip_y) — out
    assert not Simulation(Config(
        implicit_y_diffusion=True, **base))._pallas_predictor_ok
    # 2D is out
    assert not Simulation(Config(**{**base, "Nz": 1}))._pallas_predictor_ok
    # wall-bounded IS eligible now (general slab kernel)
    assert Simulation(Config(**base))._pallas_predictor_ok


def test_pallas_wall_channel_trajectory_matches():
    """Wall-y stretched channel: fused-predictor steps == jnp steps."""
    base = dict(Nx=16, Ny=24, Nz=8, stretch_y=True, z_max=1.0,
                nu=1e-3, nu_specified=True, dp_dx=-1e-3,
                dp_dx_specified=True, dt=1e-3, adaptive_dt=False,
                dtype="float64", convective_scheme=ConvectiveScheme.SKEW)
    from cfdnn_tpu import perturbed_channel
    sim_off = Simulation(Config(use_pallas="off", **base))
    sim_on = Simulation(Config(use_pallas="on", **base))
    assert sim_on._pallas_predictor_ok
    s0 = perturbed_channel(sim_off.cfg, sim_off.mesh, amp=0.05)
    s_off, s_on = s0, s0
    for _ in range(4):
        s_off, _ = sim_off.step(s_off)
        s_on, d = sim_on.step(s_on)
    np.testing.assert_allclose(np.asarray(s_on.u), np.asarray(s_off.u),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(s_on.v), np.asarray(s_off.v),
                               rtol=0, atol=1e-12)
    assert float(d.div_linf) < 1e-10


def test_fused_nu_sgs_matches_unfused():
    """LES nu_sgs via the fused slab kernel == the plain jnp pipeline."""
    from cfdnn_tpu import perturbed_channel
    from cfdnn_tpu.config import TurbulenceModel
    base = dict(Nx=16, Ny=12, Nz=8, z_max=1.0, stretch_y=True,
                nu=1e-3, nu_specified=True, dp_dx=-1e-3,
                dp_dx_specified=True, dt=1e-3, adaptive_dt=False,
                dtype="float64")
    for model in (TurbulenceModel.SMAGORINSKY, TurbulenceModel.WALE,
                  TurbulenceModel.VREMAN, TurbulenceModel.SIGMA):
        sim_on = Simulation(Config(use_pallas="on", turb_model=model, **base))
        sim_off = Simulation(Config(use_pallas="off", turb_model=model, **base))
        state = perturbed_channel(sim_on.cfg, sim_on.mesh, amp=0.1)
        nut_on = np.asarray(sim_on.turb.nu_t(state, sim_on))
        nut_off = np.asarray(sim_off.turb.nu_t(state, sim_off))
        # sigma's trigonometric eigensolver (arccos) amplifies roundoff
        # near degenerate singular values -> order-of-evaluation noise
        tol = dict(rtol=1e-5, atol=1e-12) if model == TurbulenceModel.SIGMA \
            else dict(rtol=0, atol=1e-14)
        np.testing.assert_allclose(nut_on, nut_off, err_msg=model.value,
                                   **tol)


def test_fused_germano_pass1_matches_jnp():
    """Fused dynamic-Smagorinsky Germano pass (in-kernel LM/MM plane-sum
    accumulation, ops/pallas_kernels.fused_germano_pass1) == the jnp
    two-pass chain, for wall-y channel AND walled-z duct geometries
    (reference fused GPU pass, src/turbulence_les_dynamic_germano.cpp:
    102 dsmag_pass1_germano)."""
    from cfdnn_tpu import perturbed_channel
    from cfdnn_tpu.config import TurbulenceModel
    for extra in (dict(stretch_y=True),
                  dict(bc_z=BCType.WALL, z_min=-1.0, z_max=1.0)):
        base = dict(Nx=16, Ny=12, Nz=8,
                    nu=1e-3, nu_specified=True, dp_dx=-1e-3,
                    dp_dx_specified=True, dt=1e-3, adaptive_dt=False,
                    dtype="float64",
                    turb_model=TurbulenceModel.DYNAMIC_SMAGORINSKY,
                    **extra)
        sim_on = Simulation(Config(use_pallas="on", **base))
        assert sim_on.turb._fuse == "slab"
        sim_off = Simulation(Config(use_pallas="off", **base))
        state = perturbed_channel(sim_on.cfg, sim_on.mesh, amp=0.1)
        nut_on = np.asarray(sim_on.turb.nu_t(state, sim_on))
        nut_off = np.asarray(sim_off.turb.nu_t(state, sim_off))
        # the in-kernel per-slab partial sums reassociate the x
        # reduction — rtol-level agreement, not bitwise
        np.testing.assert_allclose(nut_on, nut_off, rtol=1e-12,
                                   atol=1e-16, err_msg=str(extra))


def test_fused_predictor_xz_matches_operators():
    """2-D (x,z)-tiled predictor == jnp operators to machine epsilon for
    wall / stretched / periodic y, skew + central, with and without nu_t.
    (Opt-in kernel for grids whose y-z planes overflow the slab budget.)"""
    import jax
    import jax.numpy as jnp
    from cfdnn_tpu.config import BCType
    from cfdnn_tpu.ops import operators as ops
    from cfdnn_tpu.ops.grid import Geometry
    from cfdnn_tpu.ops.pallas_kernels import fused_predictor_general_xz
    from cfdnn_tpu.mesh import Mesh

    for bc_y, stretch in [(BCType.WALL, True), (BCType.PERIODIC, False)]:
        cfg = Config(Nx=16, Ny=24, Nz=32, bc_y=bc_y, stretch_y=stretch,
                     nu=0.01, nu_specified=True, dt=1e-3,
                     adaptive_dt=False, dtype="float64")
        mesh = Mesh.from_config(cfg)
        geom = Geometry.make(mesh, cfg)
        from cfdnn_tpu.fields import init_taylor_green
        st = init_taylor_green(cfg, mesh)
        key = jax.random.PRNGKey(0)
        u = jax.random.normal(key, st.u.shape, jnp.float64) * 0.1
        v = jax.random.normal(key, st.v.shape, jnp.float64) * 0.1
        w = jax.random.normal(key, st.w.shape, jnp.float64) * 0.1
        nu_t = jnp.abs(jax.random.normal(
            key, (cfg.Nx, cfg.Ny, cfg.Nz), jnp.float64)) * 0.01
        for scheme in (ConvectiveScheme.SKEW, ConvectiveScheme.CENTRAL):
            for nut in (None, nu_t):
                comps = (u, v, w)
                nu_eff = (jnp.asarray(0.01, jnp.float64) if nut is None
                          else 0.01 + nut)
                conv = ops.convective(comps, geom, scheme)
                diff = ops.diffusive(comps, nu_eff, geom)
                dt = 1e-3
                ref = [comps[i] + dt * (-conv[i] + diff[i]
                                        + (0.5 if i == 0 else 0.0))
                       for i in range(3)]
                out = fused_predictor_general_xz(
                    u, v, w, dt, geom=geom, scheme=scheme, nu=0.01,
                    fx=0.5, nu_t=nut, interpret=True)
                assert out is not None
                for o, r in zip(out, ref):
                    np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                               rtol=0, atol=1e-14)


def test_fused_divergence_correct_xz_match_operators():
    """5-block (no-corner) xz divergence/correction == jnp operators."""
    import jax
    import jax.numpy as jnp
    from cfdnn_tpu.config import BCType
    from cfdnn_tpu.fields import init_taylor_green
    from cfdnn_tpu.mesh import Mesh
    from cfdnn_tpu.ops import operators as ops
    from cfdnn_tpu.ops.grid import Geometry
    from cfdnn_tpu.ops.pallas_kernels import (fused_correct_xz,
                                              fused_divergence_xz)

    for bc_y, stretch in [(BCType.WALL, True), (BCType.PERIODIC, False)]:
        cfg = Config(Nx=16, Ny=24, Nz=32, bc_y=bc_y, stretch_y=stretch,
                     nu=0.01, nu_specified=True, dt=1e-3,
                     adaptive_dt=False, dtype="float64")
        mesh = Mesh.from_config(cfg)
        geom = Geometry.make(mesh, cfg)
        st = init_taylor_green(cfg, mesh)
        key = jax.random.PRNGKey(0)
        u = jax.random.normal(key, st.u.shape, jnp.float64)
        v = jax.random.normal(key, st.v.shape, jnp.float64)
        w = jax.random.normal(key, st.w.shape, jnp.float64)
        p = jax.random.normal(key, (cfg.Nx, cfg.Ny, cfg.Nz), jnp.float64)
        dref = ops.divergence((u, v, w), geom)
        dxz = fused_divergence_xz(u, v, w, geom=geom, interpret=True)
        np.testing.assert_allclose(np.asarray(dxz), np.asarray(dref),
                                   rtol=0, atol=1e-13)
        cref = ops.correct_velocity((u, v, w), p, 1e-3, geom)
        cxz = fused_correct_xz(u, v, w, p, 1e-3, geom=geom, interpret=True)
        for a, b in zip(cxz, cref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=0, atol=1e-14)


def test_xz_step_trajectory_matches_jnp(monkeypatch):
    """Full steps in forced-xz mode == the jnp path, via a shrunken slab
    budget so a small grid takes the oversized-plane route."""
    from cfdnn_tpu import perturbed_channel
    from cfdnn_tpu.ops import pallas_kernels as pk

    monkeypatch.setattr(pk, "_SLAB_FIT_CELLS", 8)   # force !slab_fits
    base = dict(Nx=16, Ny=12, Nz=32, stretch_y=True,
                nu=1e-3, nu_specified=True, dp_dx=-1e-3,
                dp_dx_specified=True, dt=1e-3, adaptive_dt=False,
                dtype="float64", convective_scheme=ConvectiveScheme.SKEW)
    sim_off = Simulation(Config(use_pallas="off", **base))
    sim_on = Simulation(Config(use_pallas="on", **base))
    assert sim_on._pallas_predictor_ok == "xz"
    s0 = perturbed_channel(sim_off.cfg, sim_off.mesh, amp=0.05)
    s_off, s_on = s0, s0
    for _ in range(4):
        s_off, _ = sim_off.step(s_off)
        s_on, d = sim_on.step(s_on)
    np.testing.assert_allclose(np.asarray(s_on.u), np.asarray(s_off.u),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(s_on.w), np.asarray(s_off.w),
                               rtol=0, atol=1e-12)
    assert float(d.div_linf) < 1e-10


def test_fused_nu_sgs_xz_matches_unfused(monkeypatch):
    """LES nu_sgs via the 2-D-tiled kernel == the plain jnp pipeline,
    forced onto the xz route by a shrunken slab budget."""
    from cfdnn_tpu import perturbed_channel
    from cfdnn_tpu.config import TurbulenceModel
    from cfdnn_tpu.ops import pallas_kernels as pk

    monkeypatch.setattr(pk, "_SLAB_FIT_CELLS", 8)
    base = dict(Nx=16, Ny=12, Nz=32, stretch_y=True,
                nu=1e-3, nu_specified=True, dp_dx=-1e-3,
                dp_dx_specified=True, dt=1e-3, adaptive_dt=False,
                dtype="float64")
    for model in (TurbulenceModel.SMAGORINSKY, TurbulenceModel.WALE):
        sim_on = Simulation(Config(use_pallas="on", turb_model=model,
                                   **base))
        assert sim_on.turb._fuse == "xz"
        sim_off = Simulation(Config(use_pallas="off", turb_model=model,
                                    **base))
        state = perturbed_channel(sim_on.cfg, sim_on.mesh, amp=0.1)
        nut_on = np.asarray(sim_on.turb.nu_t(state, sim_on))
        nut_off = np.asarray(sim_off.turb.nu_t(state, sim_off))
        np.testing.assert_allclose(nut_on, nut_off, rtol=0, atol=1e-14,
                                   err_msg=model.value)


def test_channel_specialized_kernel_parity():
    """fused_predictor_channel (hand-vectorized wall-y specialization,
    1.8x the general kernel's throughput) must match the operator
    library to f64 roundoff on uniform AND stretched y."""
    import jax.numpy as jnp
    import numpy as np

    from cfdnn_tpu import Config, Simulation
    from cfdnn_tpu.config import ConvectiveScheme
    from cfdnn_tpu.ops import operators as ops
    from cfdnn_tpu.ops.pallas_kernels import (channel_slab_eligible,
                                              fused_predictor_channel)

    for scheme in (ConvectiveScheme.SKEW, ConvectiveScheme.CENTRAL):
        for stretch in (False, True):
            cfg = Config(Nx=16, Ny=12, Nz=8, stretch_y=stretch,
                         nu=3e-3, nu_specified=True, dp_dx=-2e-3,
                         dp_dx_specified=True, dt=1e-3, adaptive_dt=False,
                         dtype="float64", convective_scheme=scheme)
            sim = Simulation(cfg)
            assert channel_slab_eligible(sim.geom, sim.cfg)
            rng = np.random.default_rng(0)
            st = sim.initial_state()
            u = jnp.asarray(rng.standard_normal(st.u.shape))
            v = jnp.asarray(rng.standard_normal(st.v.shape))
            w = jnp.asarray(rng.standard_normal(st.w.shape))
            dt, fx = 1e-3, float(-cfg.dp_dx / cfg.rho)
            conv = ops.convective((u, v, w), sim.geom, scheme)
            diff = ops.diffusive((u, v, w), jnp.asarray(cfg.nu), sim.geom)
            ref = (u + dt * (-conv[0] + diff[0] + fx),
                   v + dt * (-conv[1] + diff[1]),
                   w + dt * (-conv[2] + diff[2]))
            got = fused_predictor_channel(u, v, w, dt, geom=sim.geom,
                                          nu=cfg.nu, fx=fx, scheme=scheme,
                                          interpret=True)
            for a, b in zip(got, ref):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=0, atol=1e-13)
            # variable viscosity (LES path): corner-averaged nu
            nut = jnp.asarray(
                np.abs(rng.standard_normal((16, 12, 8))) * 1e-2)
            diff_v = ops.diffusive((u, v, w), cfg.nu + nut, sim.geom)
            ref_v = (u + dt * (-conv[0] + diff_v[0] + fx),
                     v + dt * (-conv[1] + diff_v[1]),
                     w + dt * (-conv[2] + diff_v[2]))
            got_v = fused_predictor_channel(
                u, v, w, dt, geom=sim.geom, nu=cfg.nu, fx=fx,
                scheme=scheme, nu_t=nut, interpret=True)
            for a, b in zip(got_v, ref_v):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=0, atol=1e-13)


def test_fused_predictor_div_matches_operators():
    """fused_predictor_div: star AND div(u*) == jnp operator chain
    (all-periodic). The div must equal ops.divergence of the star the
    solver would otherwise re-read from HBM."""
    from cfdnn_tpu.ops.pallas_kernels import fused_predictor_div

    cfg, mesh, geom = _setup()
    rng = np.random.default_rng(3)
    N = cfg.Nx
    u, v, w = (jnp.asarray(rng.standard_normal((N, N, N))) for _ in range(3))
    dt, nu, fx = 1e-3, cfg.nu, -cfg.dp_dx
    conv = ops.convective((u, v, w), geom, ConvectiveScheme.SKEW)
    diff = ops.diffusive((u, v, w), jnp.float64(nu), geom)
    ref = (u + dt * (-conv[0] + diff[0] + fx),
           v + dt * (-conv[1] + diff[1]),
           w + dt * (-conv[2] + diff[2]))
    ref_div = ops.divergence(ref, geom)
    *star, div = fused_predictor_div(u, v, w, dt, hx=geom.x.h, hy=geom.y.h,
                                     hz=geom.z.h, nu=nu, fx=fx, bx=4,
                                     interpret=True)
    for name, a, b in zip("uvw", ref, star):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=0, atol=1e-13, err_msg=name)
    np.testing.assert_allclose(np.asarray(div), np.asarray(ref_div),
                               rtol=0, atol=1e-11)


def test_fused_predictor_channel_div_matches_operators():
    """fused_predictor_channel_div: star (with v wall faces zeroed, as
    apply_velocity_bc does) AND div(u*) == jnp chain, uniform and
    stretched y, scalar and variable nu."""
    from cfdnn_tpu import Config, Simulation
    from cfdnn_tpu.config import ConvectiveScheme as CS
    from cfdnn_tpu.ops.bc import apply_velocity_bc
    from cfdnn_tpu.ops.pallas_kernels import fused_predictor_channel_div

    for stretch in (False, True):
        cfg = Config(Nx=16, Ny=12, Nz=8, stretch_y=stretch,
                     nu=3e-3, nu_specified=True, dp_dx=-2e-3,
                     dp_dx_specified=True, dt=1e-3, adaptive_dt=False,
                     dtype="float64", convective_scheme=CS.SKEW)
        sim = Simulation(cfg)
        rng = np.random.default_rng(4)
        st = sim.initial_state()
        u = jnp.asarray(rng.standard_normal(st.u.shape))
        v = jnp.asarray(rng.standard_normal(st.v.shape))
        w = jnp.asarray(rng.standard_normal(st.w.shape))
        dt, fx = 1e-3, float(-cfg.dp_dx / cfg.rho)
        for nut in (None,
                    jnp.asarray(np.abs(rng.standard_normal((16, 12, 8)))
                                * 1e-2)):
            nu_eff = cfg.nu if nut is None else cfg.nu + nut
            conv = ops.convective((u, v, w), sim.geom, CS.SKEW)
            diff = ops.diffusive((u, v, w), jnp.asarray(nu_eff), sim.geom)
            ref = (u + dt * (-conv[0] + diff[0] + fx),
                   v + dt * (-conv[1] + diff[1]),
                   w + dt * (-conv[2] + diff[2]))
            ref = apply_velocity_bc(*ref, sim.geom)
            ref_div = ops.divergence(ref, sim.geom)
            *star, div = fused_predictor_channel_div(
                u, v, w, dt, geom=sim.geom, nu=cfg.nu, fx=fx,
                scheme=CS.SKEW, nu_t=nut, interpret=True)
            for name, a, b in zip("uvw", ref, star):
                np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                           rtol=0, atol=1e-13,
                                           err_msg=f"{name} stretch={stretch}")
            np.testing.assert_allclose(np.asarray(div), np.asarray(ref_div),
                                       rtol=0, atol=1e-11,
                                       err_msg=f"div stretch={stretch}")


def test_fuse_div_optin_trajectory_matches(monkeypatch):
    """CFDNN_FUSE_DIV=1: the solver's opt-in fused predictor+divergence
    path produces the same trajectory as the default split pipeline
    (both all-periodic and wall-y channel geometries)."""
    monkeypatch.setenv("CFDNN_FUSE_DIV", "1")
    base = dict(Nx=16, Ny=16, Nz=16, bc_x=BCType.PERIODIC,
                bc_y=BCType.PERIODIC, bc_z=BCType.PERIODIC,
                y_min=0.0, y_max=2 * np.pi, z_max=2 * np.pi,
                nu=1e-3, nu_specified=True, dp_dx=0.0, dp_dx_specified=True,
                dt=1e-3, adaptive_dt=False, dtype="float64",
                convective_scheme=ConvectiveScheme.SKEW)
    sim_on = Simulation(Config(use_pallas="on", **base))
    assert sim_on._fuse_div_ok == "periodic"
    sim_off = Simulation(Config(use_pallas="off", **base))
    s0 = init_taylor_green(sim_off.cfg, sim_off.mesh)
    s_off, s_on = s0, s0
    for _ in range(4):
        s_off, _ = sim_off.step(s_off)
        s_on, d = sim_on.step(s_on)
    np.testing.assert_allclose(np.asarray(s_on.u), np.asarray(s_off.u),
                               rtol=0, atol=1e-12)
    assert float(d.div_linf) < 1e-10

    chan = dict(Nx=16, Ny=24, Nz=8, stretch_y=True, z_max=1.0,
                nu=1e-3, nu_specified=True, dp_dx=-1e-3,
                dp_dx_specified=True, dt=1e-3, adaptive_dt=False,
                dtype="float64", convective_scheme=ConvectiveScheme.SKEW)
    from cfdnn_tpu import perturbed_channel
    sim_onc = Simulation(Config(use_pallas="on", **chan))
    assert sim_onc._fuse_div_ok == "channel"
    sim_offc = Simulation(Config(use_pallas="off", **chan))
    c0 = perturbed_channel(sim_offc.cfg, sim_offc.mesh, amp=0.05)
    c_off, c_on = c0, c0
    for _ in range(4):
        c_off, _ = sim_offc.step(c_off)
        c_on, d = sim_onc.step(c_on)
    np.testing.assert_allclose(np.asarray(c_on.v), np.asarray(c_off.v),
                               rtol=0, atol=1e-12)
    assert float(d.div_linf) < 1e-10


def test_auto_bx_thin_sizing_policy():
    """Slab-sizing policy: thin-halo blocks get bx=4 up to 512^2 planes,
    but HEAVY kernels (the ~30-live-buffer operator-library predictor)
    must drop to bx=1 at 512^2 planes — bx=4 there overflows even the
    raised 100 MB scoped-VMEM cap (Mosaic OOM seen on v5e)."""
    from cfdnn_tpu.ops.pallas_kernels import _auto_bx_thin

    # measured-policy sizes: bx=4 at 128^3, bx=2 at 256^3 (default cap),
    # bx=4 at 512^3 for lean kernels under the raised cap
    assert _auto_bx_thin(4, 128, 128, 128) == 4
    assert _auto_bx_thin(4, 256, 256, 256) == 2
    assert _auto_bx_thin(4, 512, 512, 512) == 4
    # heavy kernels match lean ones at <=256^3 but fall back to bx=1
    # at 512^3 instead of OOMing
    assert _auto_bx_thin(4, 256, 256, 256, heavy=True) == 2
    assert _auto_bx_thin(4, 512, 512, 512, heavy=True) == 1
    # O4 halo (ng=2) shrinks under the same budget (caller re-raises
    # to bx=ng, reproducing the old full-block footprint)
    assert _auto_bx_thin(4, 256, 256, 256, ng=2) == 1
    # non-divisible Nx shrinks the block
    assert _auto_bx_thin(4, 18, 48, 48) == 3


def test_pallas_o4_step_trajectory_matches_jnp():
    """O4 (space_order=4) full steps, fused vs operator path: the O4
    divergence/pressure-gradient stencils reach 2 planes, so the slab
    divergence/correct kernels must carry ng=2 halos (a hardcoded ng=1
    silently wrapped the outermost O4 read to the slab's own opposite
    edge — wrong projection at the edge planes of every slab)."""
    base = dict(Nx=16, Ny=16, Nz=16, bc_x=BCType.PERIODIC,
                bc_y=BCType.PERIODIC, bc_z=BCType.PERIODIC,
                y_min=0.0, y_max=2 * np.pi, z_max=2 * np.pi,
                nu=1e-3, nu_specified=True, dp_dx=0.0, dp_dx_specified=True,
                dt=1e-3, adaptive_dt=False, dtype="float64",
                space_order=4, convective_scheme=ConvectiveScheme.SKEW)
    sim_off = Simulation(Config(use_pallas="off", **base))
    sim_on = Simulation(Config(use_pallas="on", **base))
    assert sim_on._pallas_predictor_ok
    s0 = init_taylor_green(sim_off.cfg, sim_off.mesh)
    s_off, s_on = s0, s0
    for _ in range(5):
        s_off, _ = sim_off.step(s_off)
        s_on, _ = sim_on.step(s_on)
    np.testing.assert_allclose(np.asarray(s_on.u), np.asarray(s_off.u),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(s_on.p), np.asarray(s_off.p),
                               rtol=0, atol=1e-12)


def test_fused_divergence_correct_o4_match_operators():
    """Direct O4 parity of the slab divergence/correct kernels."""
    from cfdnn_tpu.ops import operators as ops
    from cfdnn_tpu.ops.pallas_kernels import fused_correct, fused_divergence
    cfg = Config(Nx=16, Ny=16, Nz=16, bc_x=BCType.PERIODIC,
                 bc_y=BCType.PERIODIC, bc_z=BCType.PERIODIC,
                 y_min=0.0, y_max=2 * np.pi, z_max=2 * np.pi,
                 nu=1e-3, nu_specified=True, dp_dx=0.0,
                 dp_dx_specified=True, dtype="float64", space_order=4)
    sim = Simulation(cfg)
    geom = sim.geom
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.standard_normal((16, 16, 16)))
    v = jnp.asarray(rng.standard_normal((16, 16, 16)))
    w = jnp.asarray(rng.standard_normal((16, 16, 16)))
    p = jnp.asarray(rng.standard_normal((16, 16, 16)))
    # several bx values so slab EDGES land in different places
    for bx in (2, 4, 8):
        d = fused_divergence(u, v, w, geom=geom, bx=bx, interpret=True)
        np.testing.assert_allclose(np.asarray(d),
                                   np.asarray(ops.divergence((u, v, w),
                                                             geom)),
                                   rtol=0, atol=1e-12, err_msg=f"bx={bx}")
        cu, cv, cw = fused_correct(u, v, w, p, 1e-3, geom=geom, bx=bx,
                                   interpret=True)
        ru = u - 1e-3 * ops.pressure_grad_face(p, 0, geom)
        np.testing.assert_allclose(np.asarray(cu), np.asarray(ru),
                                   rtol=0, atol=1e-12, err_msg=f"bx={bx}")


def _xpad_setup(bc_x, N=12, scheme=ConvectiveScheme.SKEW):
    cfg = Config(Nx=N, Ny=N, Nz=N, bc_x=bc_x,
                 bc_y=BCType.PERIODIC, bc_z=BCType.PERIODIC,
                 y_min=0.0, y_max=1.0, x_max=1.5, z_max=2.0,
                 nu=3e-3, nu_specified=True, dp_dx=-0.4,
                 dp_dx_specified=True, dtype="float64",
                 convective_scheme=scheme)
    mesh = Mesh.from_config(cfg)
    return cfg, Geometry.make(mesh, cfg)


@pytest.mark.parametrize("bc_x", [BCType.INFLOW, BCType.OUTFLOW, BCType.WALL])
@pytest.mark.parametrize("with_nut", [False, True])
@pytest.mark.parametrize("scheme", [ConvectiveScheme.SKEW,
                                    ConvectiveScheme.CENTRAL,
                                    ConvectiveScheme.UPWIND])
def test_fused_predictor_xpad_matches_operators(bc_x, with_nut, scheme):
    """Ghost-padded slab predictor on a non-periodic x == the jnp operator
    path with the bc.py pads, for every supported x BC and both schemes
    the solver gate enables, on the faces the solver keeps (boundary
    faces are re-imposed downstream)."""
    from cfdnn_tpu.ops.pallas_kernels import fused_predictor_xpad
    cfg, geom = _xpad_setup(bc_x, scheme=scheme)
    rng = np.random.default_rng(3)
    N = cfg.Nx
    u = jnp.asarray(rng.standard_normal((N + 1, N, N)))
    v = jnp.asarray(rng.standard_normal((N, N, N)))
    w = jnp.asarray(rng.standard_normal((N, N, N)))
    nu_t = (jnp.asarray(0.1 * rng.random((N, N, N))) if with_nut else None)
    dt, fx = 1e-3, -cfg.dp_dx
    nu_eff = (jnp.float64(cfg.nu) if nu_t is None else cfg.nu + nu_t)
    conv = ops.convective((u, v, w), geom, scheme)
    diff = ops.diffusive((u, v, w), nu_eff, geom)
    ref = (u + dt * (-conv[0] + diff[0] + fx),
           v + dt * (-conv[1] + diff[1]),
           w + dt * (-conv[2] + diff[2]))
    got = fused_predictor_xpad(u, v, w, dt, geom=geom,
                               scheme=scheme, nu=cfg.nu,
                               fx=fx, nu_t=nu_t, interpret=True)
    # interior faces/cells only: boundary-normal faces are overwritten by
    # apply_velocity_bc / the convective outlet on both paths
    np.testing.assert_allclose(np.asarray(got[0])[1:-1],
                               np.asarray(ref[0])[1:-1],
                               rtol=0, atol=1e-13, err_msg="u")
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]),
                               rtol=0, atol=1e-13, err_msg="v")
    np.testing.assert_allclose(np.asarray(got[2]), np.asarray(ref[2]),
                               rtol=0, atol=1e-13, err_msg="w")


@pytest.mark.parametrize("scheme", [ConvectiveScheme.SKEW,
                                    ConvectiveScheme.UPWIND])
def test_xpad_step_trajectory_matches_jnp(scheme):
    """Full inflow/outflow steps with use_pallas on vs off agree (the
    external-flow analogue of the periodic trajectory parity test),
    including IBM + convective outlet. Round 5: upwind joined the xpad
    gate (its stencil reaches 1 cell, the width of the ghost ring the
    pad carries)."""
    from cfdnn_tpu.ibm import CylinderBody
    base = dict(Nx=24, Ny=16, Nz=8, bc_x=BCType.INFLOW,
                bc_y=BCType.PERIODIC, bc_z=BCType.PERIODIC,
                x_max=6.0, y_min=-2.0, y_max=2.0, z_max=1.0,
                nu=1e-2, nu_specified=True, dp_dx=0.0, dp_dx_specified=True,
                dt=5e-3, adaptive_dt=False, dtype="float64",
                convective_outflow=True,
                convective_scheme=scheme)
    sims = []
    for up in ("off", "on"):
        sim = Simulation(Config(use_pallas=up, **base))
        sim.set_ibm_forcing(CylinderBody(1.5, 0.0, 0.4))
        sims.append(sim)
    sim_off, sim_on = sims
    assert sim_on._pallas_predictor_ok == "xpad"
    assert sim_off._pallas_predictor_ok is False
    s0 = sim_off.initial_state()
    s0 = s0.replace(u=jnp.ones_like(s0.u))
    s_off, s_on = sim_off.initialize(s0), sim_on.initialize(s0)
    for _ in range(5):
        s_off, _ = sim_off.step(s_off)
        s_on, d = sim_on.step(s_on)
    np.testing.assert_allclose(np.asarray(s_on.u), np.asarray(s_off.u),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(s_on.v), np.asarray(s_off.v),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(s_on.p), np.asarray(s_off.p),
                               rtol=0, atol=1e-11)
    assert float(d.div_linf) < 1e-10


def test_fused_predictor_general_moving_wall():
    """fused_predictor_general honors a moving y_max wall (AxisGeom.tang
    threaded through the operator library inside the kernel) — the gate
    that justifies keeping lid configs on the Pallas fast path while
    channel_slab_eligible (hardcoded no-slip ghosts) rejects them."""
    from cfdnn_tpu.ops.pallas_kernels import (channel_slab_eligible,
                                              fused_predictor_general)
    cfg = Config(Nx=16, Ny=12, Nz=8, bc_x=BCType.PERIODIC,
                 bc_y=BCType.WALL, bc_z=BCType.PERIODIC,
                 y_min=0.0, y_max=1.0, x_max=2.0, z_max=1.0,
                 nu=5e-3, nu_specified=True, dp_dx=0.0,
                 dp_dx_specified=True, lid_velocity=1.3, dtype="float64",
                 convective_scheme=ConvectiveScheme.SKEW).finalize()
    mesh = Mesh.from_config(cfg)
    geom = Geometry.make(mesh, cfg)
    assert geom.axes[1].tang[0] == (0.0, 1.3)
    assert not channel_slab_eligible(geom, cfg)   # no-slip-only kernel
    rng = np.random.default_rng(11)
    u = jnp.asarray(rng.standard_normal((16, 12, 8)))
    v = jnp.asarray(rng.standard_normal((16, 13, 8)))
    w = jnp.asarray(rng.standard_normal((16, 12, 8)))
    dt = 1e-3
    conv = ops.convective((u, v, w), geom, ConvectiveScheme.SKEW)
    diff = ops.diffusive((u, v, w), jnp.float64(cfg.nu), geom)
    ref = tuple(c + dt * (-cv + df)
                for c, cv, df in zip((u, v, w), conv, diff))
    got = fused_predictor_general(u, v, w, dt, geom=geom,
                                  scheme=ConvectiveScheme.SKEW,
                                  nu=cfg.nu, fx=0.0, interpret=True)
    for g, r, name in zip(got, ref, "uvw"):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=0, atol=1e-13, err_msg=name)


@pytest.mark.parametrize("scheme", [ConvectiveScheme.UPWIND,
                                    ConvectiveScheme.UPWIND2])
def test_fused_predictor_upwind_matches_operators(scheme):
    """Upwind momentum in the fused slab kernel == jnp operator path
    (round 4: measured 4.0x operator-fallback penalty motivated adding
    upwind to the fused predictors — artifacts/upwind_measurement.log;
    reference GPU upwind kernels solver_kernels.hpp:1863-2198).
    Walls-y stretched channel geometry, variable nu_t, f64 exact."""
    import jax
    from cfdnn_tpu.ops.pallas_kernels import fused_predictor_general

    cfg = Config(Nx=16, Ny=24, Nz=8, stretch_y=True, z_max=1.0,
                 nu=1e-3, nu_specified=True, dp_dx=-1e-3,
                 dp_dx_specified=True, dtype="float64",
                 convective_scheme=scheme)
    mesh = Mesh.from_config(cfg)
    geom = Geometry.make(mesh, cfg)
    key = jax.random.PRNGKey(3)
    u = jax.random.normal(key, (16, 24, 8), jnp.float64) * 0.1
    v = jax.random.normal(key, (16, 25, 8), jnp.float64) * 0.1
    w = jax.random.normal(key, (16, 24, 8), jnp.float64) * 0.1
    nu_t = jnp.abs(jax.random.normal(key, (16, 24, 8), jnp.float64)) * 0.01
    dt, fx = 1e-3, 0.7
    conv = ops.convective((u, v, w), geom, scheme)
    diff = ops.diffusive((u, v, w), cfg.nu + nu_t, geom)
    ref = (u + dt * (-conv[0] + diff[0] + fx),
           v + dt * (-conv[1] + diff[1]),
           w + dt * (-conv[2] + diff[2]))
    got = fused_predictor_general(u, v, w, dt, geom=geom, scheme=scheme,
                                  nu=cfg.nu, fx=fx, nu_t=nu_t,
                                  interpret=True)
    for name, a, b in zip("uvw", ref, got):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=0, atol=1e-13, err_msg=name)


def test_upwind_trajectory_matches_jnp():
    """Full steps with upwind2 momentum: fused == operator path, and the
    fused path actually activates (the round-3 gate rejected upwind)."""
    from cfdnn_tpu import perturbed_channel
    base = dict(Nx=16, Ny=24, Nz=8, stretch_y=True, z_max=1.0,
                nu=1e-3, nu_specified=True, dp_dx=-1e-3,
                dp_dx_specified=True, dt=1e-3, adaptive_dt=False,
                dtype="float64",
                convective_scheme=ConvectiveScheme.UPWIND2)
    sim_off = Simulation(Config(use_pallas="off", **base))
    sim_on = Simulation(Config(use_pallas="on", **base))
    assert sim_on._pallas_predictor_ok == "slab"
    s0 = perturbed_channel(sim_off.cfg, sim_off.mesh, amp=0.05)
    s_off, s_on = s0, s0
    for _ in range(4):
        s_off, _ = sim_off.step(s_off)
        s_on, d = sim_on.step(s_on)
    np.testing.assert_allclose(np.asarray(s_on.u), np.asarray(s_off.u),
                               rtol=0, atol=1e-12)
    assert float(d.div_linf) < 1e-10


@pytest.mark.parametrize("model", ["sst", "komega"])
def test_fused_transport_advance_matches_math(model):
    """fused_transport_advance (x-slab Pallas, interpret) == the pure
    jnp math (sst_advance_math / komega_advance_math) — the SST
    transport advance measured at 87% of the 128^3 RANS step
    (artifacts/upwind_measurement.log); reference analogue: the fused
    sst_transport_step_gpu kernel."""
    import functools

    import jax
    from cfdnn_tpu.ops.pallas_kernels import fused_transport_advance
    from cfdnn_tpu.turbulence import transport as tr
    from cfdnn_tpu.turbulence.transport import (KOmegaConstants,
                                                SSTConstants,
                                                komega_advance_math,
                                                sst_advance_math)
    from cfdnn_tpu.turbulence.base import wall_distance

    cfg = Config(Nx=16, Ny=24, Nz=8, stretch_y=True, z_max=1.0,
                 nu=1e-3, nu_specified=True, dp_dx=-1e-3,
                 dp_dx_specified=True, dtype="float64")
    mesh = Mesh.from_config(cfg)
    geom = Geometry.make(mesh, cfg)
    c = SSTConstants()
    key = jax.random.PRNGKey(7)
    u = jax.random.normal(key, (16, 24, 8), jnp.float64) * 0.1
    v = jax.random.normal(key, (16, 25, 8), jnp.float64) * 0.1
    w = jax.random.normal(key, (16, 24, 8), jnp.float64) * 0.1
    k = jnp.abs(jax.random.normal(key, (16, 24, 8), jnp.float64)) * 0.01
    om = 1.0 + jnp.abs(jax.random.normal(key, (16, 24, 8), jnp.float64))
    nut = jnp.abs(jax.random.normal(key, (16, 24, 8), jnp.float64)) * 0.01
    y_wall = wall_distance(mesh, cfg, jnp.float64)
    y1 = float(np.min(np.asarray(y_wall)))
    om_wall = min(60.0 * cfg.nu / (c.beta1 * y1 * y1) * 10.0 / 10.0,
                  c.omega_max)
    dt = 1e-3
    if model == "sst":
        c, math, form, ng = (SSTConstants(), sst_advance_math,
                             tr._sst_math_kernel_form, 2)
    else:
        c, math, form, ng = (KOmegaConstants(), komega_advance_math,
                             tr._komega_math_kernel_form, 1)
    ref = math((u, v, w), k, om, nut, geom, cfg.nu, c,
               y_wall, om_wall, dt)
    math_fn = functools.partial(form, nu=cfg.nu, c=c,
                                om_wall=om_wall, skip_y=False)
    got = fused_transport_advance(u, v, w, k, om, nut, dt, geom=geom,
                                  math_fn=math_fn, consts=[y_wall],
                                  n_out=2, ng=ng, interpret=True)
    for i in range(2):
        np.testing.assert_allclose(
            np.asarray(got[i]), np.asarray(ref[i]), rtol=1e-12,
            atol=1e-13, err_msg=f"output {i}")
    if model == "sst":
        # fused advance+closure: the 3rd output must equal the two-pass
        # nu_t evaluated on the clipped/pinned k/omega
        from cfdnn_tpu.turbulence.base import strain_rotation
        math_fn3 = functools.partial(
            tr._sst_math_with_nut_kernel_form, nu=cfg.nu, c=c,
            om_wall=om_wall, has_wall=False)
        got3 = fused_transport_advance(u, v, w, k, om, nut, dt,
                                       geom=geom, math_fn=math_fn3,
                                       consts=[y_wall], n_out=3, ng=2,
                                       interpret=True)
        k_c = jnp.clip(ref[0], c.k_min, c.k_max)
        om_c = jnp.clip(ref[1], c.omega_min, c.omega_max)
        sr = strain_rotation((u, v, w), geom)
        want = tr.sst_nut_math(k_c, om_c, sr.S_mag, y_wall, cfg.nu, c)
        np.testing.assert_allclose(np.asarray(got3[2]), np.asarray(want),
                                   rtol=1e-12, atol=1e-14)


def test_sst_trajectory_fused_matches_jnp():
    """Full SST channel steps: fused transport kernel == jnp path, and
    the fused path actually activates under use_pallas='on'."""
    from cfdnn_tpu import perturbed_channel
    from cfdnn_tpu.config import TurbulenceModel
    base = dict(Nx=16, Ny=24, Nz=8, stretch_y=True, z_max=1.0,
                nu=1e-3, nu_specified=True, dp_dx=-1e-3,
                dp_dx_specified=True, dt=1e-3, adaptive_dt=False,
                dtype="float64", turb_model=TurbulenceModel.SST)
    sim_off = Simulation(Config(use_pallas="off", **base))
    sim_on = Simulation(Config(use_pallas="on", **base))
    assert sim_on.turb._fuse_mode(sim_on) == "interpret"
    assert sim_off.turb._fuse_mode(sim_off) is False
    s0 = sim_off.initialize(
        perturbed_channel(sim_off.cfg, sim_off.mesh, amp=0.05))
    s_off, s_on = s0, s0
    for _ in range(3):
        s_off, _ = sim_off.step(s_off)
        s_on, d = sim_on.step(s_on)
    for f in ("u", "k", "omega", "nu_t"):
        np.testing.assert_allclose(
            np.asarray(getattr(s_on, f)), np.asarray(getattr(s_off, f)),
            rtol=0, atol=1e-12, err_msg=f)
