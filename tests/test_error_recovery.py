"""Error handling / recovery tests.

Mirrors the reference's tests/test_error_recovery.cpp scope: Poisson
solvers under iteration starvation and singular (nullspace) problems,
NaN/Inf detection in the step, turbulence realizability under adverse
states, and degenerate-input edge cases (zero field, tiny dt).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cfdnn_tpu import BCType, Config, Mesh, Simulation, zero_state
from cfdnn_tpu.poisson.fdm import FDMPoissonSolver
from cfdnn_tpu.poisson.multigrid import MGPoissonSolver


def _cfg(**kw):
    kw.setdefault("dtype", "float64")
    return Config(**kw).finalize()


# ---------------------------------------------------------------------------
# Poisson: iteration starvation and singular problems
# ---------------------------------------------------------------------------

class TestPoissonErrorHandling:
    def test_poisson_limited_iterations(self):
        """One V-cycle at an unreachable tolerance must return a finite
        field that still reduces the residual (graceful degradation, not
        an exception) — reference test_poisson_limited_iterations."""
        cfg = _cfg(Nx=32, Ny=32, Nz=1, bc_x=BCType.WALL, bc_y=BCType.WALL)
        mesh = Mesh.from_config(cfg)
        mg = MGPoissonSolver(mesh, cfg)
        rng = np.random.default_rng(0)
        rhs = jnp.asarray(rng.standard_normal((32, 32, 1)))
        rhs = rhs - jnp.mean(rhs)
        p = mg.solve_adaptive(rhs, tol=1e-300, max_cycles=1)
        assert bool(jnp.all(jnp.isfinite(p)))
        r0 = float(jnp.linalg.norm(rhs))
        r1 = float(jnp.linalg.norm(mg.residual(rhs, p)))
        assert r1 < 0.5 * r0

    def test_poisson_singular_neumann(self):
        """All-Neumann problem with a NON-mean-free RHS: the nullspace
        projection must absorb the incompatibility and return a finite,
        mean-free solution whose compatible part is solved accurately."""
        cfg = _cfg(Nx=16, Ny=16, Nz=1, bc_x=BCType.WALL, bc_y=BCType.WALL)
        mesh = Mesh.from_config(cfg)
        fdm = FDMPoissonSolver(mesh, cfg)
        rng = np.random.default_rng(1)
        rhs = jnp.asarray(rng.standard_normal((16, 16, 1))) + 3.7  # mean != 0
        p = fdm.solve(rhs)
        assert bool(jnp.all(jnp.isfinite(p)))
        assert abs(float(jnp.mean(p))) < 1e-10
        _, stats = fdm.solve_with_stats(rhs)
        assert float(stats.rel_residual) < 1e-10

    def test_poisson_singular_periodic(self):
        """All-periodic (pure nullspace) with incompatible RHS: finite,
        mean-free, residual of the mean-free part at machine precision."""
        cfg = _cfg(Nx=16, Ny=16, Nz=16,
                   bc_x=BCType.PERIODIC, bc_y=BCType.PERIODIC,
                   bc_z=BCType.PERIODIC,
                   y_min=0.0, y_max=2 * np.pi, z_min=0.0, z_max=2 * np.pi)
        mesh = Mesh.from_config(cfg)
        fdm = FDMPoissonSolver(mesh, cfg)
        rng = np.random.default_rng(2)
        rhs = jnp.asarray(rng.standard_normal((16, 16, 16))) - 1.2
        p = fdm.solve(rhs)
        assert bool(jnp.all(jnp.isfinite(p)))
        assert abs(float(jnp.mean(p))) < 1e-10
        _, stats = fdm.solve_with_stats(rhs)
        assert float(stats.rel_residual) < 1e-10

    def test_mg_singular_neumann_mean_free(self):
        """MG path: volume-weighted solvability projection on an
        all-Neumann problem (reference make_rhs_mean_free)."""
        cfg = _cfg(Nx=32, Ny=32, Nz=1, bc_x=BCType.WALL, bc_y=BCType.WALL,
                   stretch_y=True)
        mesh = Mesh.from_config(cfg)
        mg = MGPoissonSolver(mesh, cfg)
        rhs = jnp.ones((32, 32, 1)) * 2.5          # pure nullspace component
        p = mg.solve(rhs)
        assert bool(jnp.all(jnp.isfinite(p)))
        # the compatible part of a constant RHS is zero -> p ~ 0
        assert float(jnp.max(jnp.abs(p))) < 1e-8


# ---------------------------------------------------------------------------
# NaN / Inf detection (reference NaN guard, solver.cpp:3195)
# ---------------------------------------------------------------------------

class TestNaNDetection:
    def _sim(self):
        cfg = _cfg(Nx=16, Ny=16, Nz=1, dt=1e-3, adaptive_dt=False,
                   nu=0.01, nu_specified=True,
                   dp_dx=-1e-3, dp_dx_specified=True)
        return Simulation(cfg)

    def test_nan_detection_velocity(self):
        sim = self._sim()
        st = sim.initial_state()
        st = st.replace(u=st.u.at[5, 5, 0].set(jnp.nan))
        st, d = sim.step(st)
        assert bool(d.nan_flag)

    def test_inf_detection_velocity(self):
        sim = self._sim()
        st = sim.initial_state()
        st = st.replace(v=st.v.at[3, 3, 0].set(jnp.inf))
        st, d = sim.step(st)
        assert bool(d.nan_flag)

    def test_solve_steady_aborts_on_nan(self):
        cfg = _cfg(Nx=16, Ny=16, Nz=1, dt=1e-3, adaptive_dt=False,
                   nu=0.01, nu_specified=True,
                   dp_dx=-1e-3, dp_dx_specified=True,
                   diag_interval=1, max_steps=5)
        sim = Simulation(cfg)
        st = sim.initial_state()
        st = st.replace(u=jnp.full_like(st.u, jnp.nan))
        with pytest.raises(FloatingPointError):
            sim.solve_steady(st)

    def test_watchdog_alerts_on_poor_divergence(self, capsys):
        """Projection watchdog (reference config.hpp:189-199): with an
        impossible div threshold every diag step must print an alert."""
        cfg = _cfg(Nx=16, Ny=16, Nz=1, dt=1e-3, adaptive_dt=False,
                   nu=0.01, nu_specified=True,
                   dp_dx=-1e-3, dp_dx_specified=True,
                   diag_interval=1, max_steps=3, tol=0.0,
                   projection_watchdog=True, div_threshold=1e-300,
                   verbose=True)
        sim = Simulation(cfg)
        st = sim.initial_state()
        # non-trivial field so post-projection divergence is > 0
        rng = np.random.default_rng(3)
        st = st.replace(u=st.u + 0.01 * jnp.asarray(
            rng.standard_normal(st.u.shape)))
        sim.solve_steady(st, max_steps=3)
        assert "[watchdog]" in capsys.readouterr().out


# ---------------------------------------------------------------------------
# Turbulence realizability under adverse states
# ---------------------------------------------------------------------------

class TestRealizability:
    def _sst_sim(self):
        cfg = _cfg(Nx=16, Ny=32, Nz=1, turb_model="sst", stretch_y=True,
                   dt=1e-4, adaptive_dt=False,
                   nu=1e-3, nu_specified=True,
                   dp_dx=-1e-3, dp_dx_specified=True)
        return Simulation(cfg)

    def test_realizability_k_positive(self):
        sim = self._sst_sim()
        st = sim.initial_state()
        st = st.replace(k=jnp.full_like(st.k, -5.0))   # adversarial k < 0
        st, d = sim.step(st)
        assert not bool(d.nan_flag)
        assert float(jnp.min(st.k)) >= 0.0

    def test_realizability_omega_positive(self):
        sim = self._sst_sim()
        st = sim.initial_state()
        st = st.replace(omega=jnp.zeros_like(st.omega))  # omega -> 0 division
        st, d = sim.step(st)
        assert not bool(d.nan_flag)
        assert float(jnp.min(st.omega)) > 0.0

    def test_nu_t_bounded(self):
        """nu_t stays non-negative and below the configured cap even from
        an absurd (k, omega) state (reference nu_t clamp)."""
        sim = self._sst_sim()
        st = sim.initial_state()
        st = st.replace(k=jnp.full_like(st.k, 1e6),
                        omega=jnp.full_like(st.omega, 1e-12))
        st, d = sim.step(st)
        assert not bool(d.nan_flag)
        assert float(jnp.min(st.nu_t)) >= 0.0
        assert float(jnp.max(st.nu_t)) <= sim.cfg.nu_t_max + 1e-12


# ---------------------------------------------------------------------------
# Degenerate inputs
# ---------------------------------------------------------------------------

class TestDegenerateInputs:
    def test_zero_velocity_field(self):
        """A zero field with zero forcing must remain exactly quiescent."""
        cfg = _cfg(Nx=16, Ny=16, Nz=1, dt=1e-3, adaptive_dt=False,
                   nu=0.01, nu_specified=True,
                   dp_dx=0.0, dp_dx_specified=True)
        sim = Simulation(cfg)
        st, d = sim.step(zero_state(cfg))
        assert not bool(d.nan_flag)
        assert float(jnp.max(jnp.abs(st.u))) < 1e-14
        assert float(jnp.max(jnp.abs(st.v))) < 1e-14

    def test_very_small_dt(self):
        """dt = 1e-8: the state must advance without noise blowup and stay
        essentially unchanged over one step."""
        cfg = _cfg(Nx=16, Ny=16, Nz=1, dt=1e-8, adaptive_dt=False,
                   nu=0.01, nu_specified=True,
                   dp_dx=-1e-3, dp_dx_specified=True)
        sim = Simulation(cfg)
        st0 = sim.initial_state()
        rng = np.random.default_rng(4)
        st0 = st0.replace(u=st0.u + 0.1 * jnp.asarray(
            rng.standard_normal(st0.u.shape)))
        st0 = sim.project_initial_velocity(st0)
        st, d = sim.step(st0)
        assert not bool(d.nan_flag)
        assert float(jnp.max(jnp.abs(st.u - st0.u))) < 1e-6
