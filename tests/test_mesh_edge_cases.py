"""Mesh edge cases: extreme aspect ratios, minimal grids, aggressive
stretching, 2D/3D path selection, non-square domains.

Mirrors the reference's tests/test_mesh_edge_cases.cpp scope.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cfdnn_tpu import BCType, Config, Mesh, Simulation
from cfdnn_tpu.poisson.fdm import FDMPoissonSolver
from cfdnn_tpu.poisson.multigrid import MGPoissonSolver


def _cfg(**kw):
    kw.setdefault("dtype", "float64")
    return Config(**kw).finalize()


def _step_ok(cfg, amp=0.01):
    sim = Simulation(cfg)
    st = sim.initial_state()
    rng = np.random.default_rng(0)
    st = st.replace(u=st.u + amp * jnp.asarray(rng.standard_normal(st.u.shape)))
    st = sim.project_initial_velocity(st)
    st, d = sim.step(st)
    assert not bool(d.nan_flag)
    for f in (st.u, st.v, st.w, st.p):
        assert bool(jnp.all(jnp.isfinite(f)))
    return st, d


class TestAspectRatio:
    def test_high_aspect_ratio_100_to_1(self):
        """200x2 cells over a 100:1 domain (reference 100:1 case)."""
        cfg = _cfg(Nx=200, Ny=2, Nz=1, x_min=0.0, x_max=100.0,
                   y_min=0.0, y_max=1.0)
        m = Mesh.from_config(cfg)
        assert m.x.faces.shape == (201,)
        assert m.y.faces.shape == (3,)
        np.testing.assert_allclose(m.x.d, 0.5)
        np.testing.assert_allclose(m.y.d, 0.5)

    def test_high_aspect_ratio_1_to_100(self):
        cfg = _cfg(Nx=2, Ny=200, Nz=1, x_min=0.0, x_max=1.0,
                   y_min=0.0, y_max=100.0)
        m = Mesh.from_config(cfg)
        assert m.x.faces.shape == (3,)
        assert m.y.faces.shape == (201,)
        np.testing.assert_allclose(m.y.d, 0.5)

    def test_poisson_high_aspect_cells(self):
        """FDM on 100:1 cell anisotropy solves to machine precision
        (direct fast-diagonalization is aspect-ratio immune)."""
        cfg = _cfg(Nx=64, Ny=8, Nz=1, x_min=0.0, x_max=64.0,
                   y_min=0.0, y_max=0.08,
                   bc_x=BCType.WALL, bc_y=BCType.WALL)
        mesh = Mesh.from_config(cfg)
        fdm = FDMPoissonSolver(mesh, cfg)
        rng = np.random.default_rng(1)
        rhs = jnp.asarray(rng.standard_normal((64, 8, 1)))
        _, stats = fdm.solve_with_stats(rhs - jnp.mean(rhs))
        # 100:1 anisotropy costs ~3 digits of conditioning even for the
        # direct solve; 1e-8 is still far below any physical tolerance
        assert float(stats.rel_residual) < 1e-8

    def test_mg_moderate_aspect_cells(self):
        """MG keeps converging at 8:1 cell anisotropy (point-Chebyshev
        smoothing degrades with anisotropy; the reference gates 1e-4)."""
        cfg = _cfg(Nx=64, Ny=16, Nz=1, x_min=0.0, x_max=8.0,
                   y_min=0.0, y_max=0.25,
                   bc_x=BCType.WALL, bc_y=BCType.WALL)
        mesh = Mesh.from_config(cfg)
        mg = MGPoissonSolver(mesh, cfg)
        rng = np.random.default_rng(2)
        rhs = jnp.asarray(rng.standard_normal((64, 16, 1)))
        rhs = rhs - jnp.mean(rhs)
        p = mg.solve_adaptive(rhs, tol=1e-6, max_cycles=200)
        rel = float(jnp.linalg.norm(mg.residual(rhs, p))
                    / jnp.linalg.norm(rhs))
        assert rel < 1e-4


class TestSmallGrids:
    def test_minimum_viable_grid_4x4(self):
        cfg = _cfg(Nx=4, Ny=4, Nz=1, dt=1e-3, adaptive_dt=False,
                   nu=0.01, nu_specified=True,
                   dp_dx=-1e-3, dp_dx_specified=True)
        _step_ok(cfg)

    def test_small_grid_8x8_poisson(self):
        cfg = _cfg(Nx=8, Ny=8, Nz=1, bc_x=BCType.WALL, bc_y=BCType.WALL)
        mesh = Mesh.from_config(cfg)
        fdm = FDMPoissonSolver(mesh, cfg)
        rng = np.random.default_rng(3)
        rhs = jnp.asarray(rng.standard_normal((8, 8, 1)))
        _, stats = fdm.solve_with_stats(rhs - jnp.mean(rhs))
        assert float(stats.rel_residual) < 1e-10

    def test_poisson_convergence_4x4_mg(self):
        cfg = _cfg(Nx=4, Ny=4, Nz=1, bc_x=BCType.WALL, bc_y=BCType.WALL)
        mesh = Mesh.from_config(cfg)
        mg = MGPoissonSolver(mesh, cfg)
        rng = np.random.default_rng(4)
        rhs = jnp.asarray(rng.standard_normal((4, 4, 1)))
        rhs = rhs - jnp.mean(rhs)
        p = mg.solve_adaptive(rhs, tol=1e-8, max_cycles=50)
        rel = float(jnp.linalg.norm(mg.residual(rhs, p))
                    / jnp.linalg.norm(rhs))
        assert rel < 1e-3

    def test_minimal_3d_nz2(self):
        cfg = _cfg(Nx=8, Ny=8, Nz=2, dt=1e-3, adaptive_dt=False,
                   nu=0.01, nu_specified=True,
                   dp_dx=-1e-3, dp_dx_specified=True)
        _step_ok(cfg)


class TestStretchedMeshes:
    def test_stretched_mesh_moderate(self):
        cfg = _cfg(Nx=16, Ny=32, Nz=1, stretch_y=True, stretch_beta=2.0,
                   bc_x=BCType.WALL, bc_y=BCType.WALL)
        m = Mesh.from_config(cfg)
        assert np.all(np.diff(m.y.faces) > 0)
        assert m.y.d[0] < m.y.d[16]              # wall clustering
        fdm = FDMPoissonSolver(m, cfg)
        rng = np.random.default_rng(5)
        rhs = jnp.asarray(rng.standard_normal((16, 32, 1)))
        _, stats = fdm.solve_with_stats(rhs - jnp.mean(
            rhs * jnp.asarray(m.y.d)[None, :, None])
            / jnp.mean(jnp.asarray(m.y.d)))
        assert float(stats.rel_residual) < 1e-9

    def test_stretched_mesh_aggressive(self):
        """beta = 5: cell-size ratio is large but faces stay monotone and
        the solver still steps (reference aggressive-stretch case)."""
        cfg = _cfg(Nx=16, Ny=64, Nz=1, stretch_y=True, stretch_beta=5.0,
                   dt=1e-5, adaptive_dt=False,
                   nu=0.01, nu_specified=True,
                   dp_dx=-1e-3, dp_dx_specified=True)
        m = Mesh.from_config(cfg)
        assert np.all(np.diff(m.y.faces) > 0)
        ratio = m.y.d.max() / m.y.d.min()
        assert ratio > 10.0                      # genuinely aggressive
        _step_ok(cfg)


class TestDimensionality:
    def test_2d_vs_3d_code_path(self):
        cfg2 = _cfg(Nx=8, Ny=8, Nz=1)
        cfg3 = _cfg(Nx=8, Ny=8, Nz=8)
        assert cfg2.is_2d and not cfg3.is_2d
        s2 = Simulation(cfg2).initial_state()
        s3 = Simulation(cfg3).initial_state()
        assert s2.u.shape[2] == 1
        assert s3.u.shape[2] == 8
        assert s3.w.shape[2] == 8                # staggered unique z-faces

    def test_non_square_domain(self):
        cfg = _cfg(Nx=40, Ny=8, Nz=1, x_min=0.0, x_max=10.0,
                   y_min=0.0, y_max=1.0, dt=1e-3, adaptive_dt=False,
                   nu=0.01, nu_specified=True,
                   dp_dx=-1e-3, dp_dx_specified=True)
        m = Mesh.from_config(cfg)
        np.testing.assert_allclose(m.x.d, 0.25)
        np.testing.assert_allclose(m.y.d, 0.125)
        _step_ok(cfg)
