"""Multigrid Poisson tests: manufactured solutions, convergence factor,
FDM cross-check, stretched-y semi-coarsening, projection integration.

Mirrors the reference MG suite (reference: tests/test_mg_manufactured_
solution.cpp templated over BC combos, tests/test_operator_consistency.cpp,
tests/baselines projection_effectiveness 1e-11 gate).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from cfdnn_tpu import BCType, Config, Simulation
from cfdnn_tpu.config import PoissonSolverType
from cfdnn_tpu.mesh import Mesh
from cfdnn_tpu.ops.grid import Geometry
from cfdnn_tpu.ops import operators as ops
from cfdnn_tpu.poisson.fdm import FDMPoissonSolver
from cfdnn_tpu.poisson.multigrid import MGPoissonSolver


def _setup(Nx=32, Ny=32, Nz=1, stretch_y=False, bc_y=BCType.WALL,
           fixed_cycles=10):
    cfg = Config(Nx=Nx, Ny=Ny, Nz=Nz, stretch_y=stretch_y, bc_y=bc_y,
                 nu=1e-3, nu_specified=True, dp_dx=-1e-3,
                 dp_dx_specified=True, dtype="float64",
                 poisson_fixed_cycles=fixed_cycles)
    mesh = Mesh.from_config(cfg)
    geom = Geometry.make(mesh, cfg)
    return cfg, mesh, geom


def test_mg_matches_fdm_channel():
    """MG and the direct FDM solve agree on the consistent Laplacian."""
    cfg, mesh, geom = _setup(32, 32, fixed_cycles=12)
    rhs = np.random.default_rng(0).standard_normal((32, 32, 1))
    rhs -= rhs.mean()
    mg = MGPoissonSolver(mesh, cfg)
    fdm = FDMPoissonSolver(mesh, cfg)
    p_mg = np.asarray(mg.solve(jnp.asarray(rhs)))
    p_fdm = np.asarray(fdm.solve(jnp.asarray(rhs)))
    scale = np.abs(p_fdm).max()
    assert np.abs(p_mg - p_fdm).max() / scale < 1e-8


def test_mg_residual_reduction_per_cycle():
    """Per-V-cycle residual contraction factor well below 1 (healthy MG)."""
    cfg, mesh, geom = _setup(64, 64, fixed_cycles=1)
    rng = np.random.default_rng(1)
    rhs = rng.standard_normal((64, 64, 1))
    rhs -= rhs.mean()
    mg = MGPoissonSolver(mesh, cfg)
    b = jnp.asarray(rhs)
    x = jnp.zeros_like(b)
    norms = [float(jnp.linalg.norm(mg.residual(b, x).reshape(-1)))]
    for _ in range(6):
        x = mg._vcycle(0, b, x)
        norms.append(float(jnp.linalg.norm(mg.residual(b, x).reshape(-1))))
    factors = [norms[i + 1] / norms[i] for i in range(len(norms) - 1)]
    assert max(factors[1:]) < 0.25, f"MG contraction too slow: {factors}"


def test_mg_manufactured_solution_3d():
    """L p = rhs with known smooth p on a 3D box, mixed BCs."""
    cfg, mesh, geom = _setup(32, 32, 16, fixed_cycles=14)
    X = mesh.x.centers[:, None, None]
    Y = mesh.y.centers[None, :, None]
    Z = mesh.z.centers[None, None, :]
    p_exact = (np.cos(X) * np.cos(np.pi * (Y + 1.0) / 2.0)
               * np.cos(2 * np.pi * Z))
    p_exact -= p_exact.mean()
    lap = np.asarray(ops.laplacian(jnp.asarray(p_exact), geom))
    mg = MGPoissonSolver(mesh, cfg)
    p = np.array(mg.solve(jnp.asarray(lap)))
    p -= p.mean()
    err = np.abs(p - p_exact).max() / np.abs(p_exact).max()
    assert err < 1e-6, f"MG manufactured-solution error {err}"


def test_mg_stretched_y_semicoarsening():
    """Stretched y axis: MG still contracts (semi-coarsening keeps y)."""
    cfg, mesh, geom = _setup(32, 48, stretch_y=True, fixed_cycles=14)
    rng = np.random.default_rng(2)
    rhs = rng.standard_normal((32, 48, 1))
    rhs -= rhs.mean()
    mg = MGPoissonSolver(mesh, cfg)
    b = jnp.asarray(rhs)
    p = mg.solve(b)
    rel = float(jnp.linalg.norm(mg.residual(b, p).reshape(-1))
                / jnp.linalg.norm(b.reshape(-1)))
    assert rel < 1e-6, f"stretched-y MG residual {rel}"


def test_mg_line_solve_null_mode_pinned():
    """Degenerate 1-D all-Neumann line solve: the null-mode coefficient
    must be pinned to zero, not divided by the eigh-roundoff eigenvalue
    (~1e-13), which would amplify a constant rhs by ~1e12. The guard is a
    RELATIVE threshold (absolute 1e-30 can never trigger)."""
    cfg, mesh, geom = _setup(1, 64, stretch_y=True, bc_y=BCType.WALL)
    mg = MGPoissonSolver(mesh, cfg)
    lv = mg.levels[0]
    assert lv.line_axis == 1 and lv.line_Q is not None
    assert not lv.line_shifts          # degenerate: no other-axis shift
    ones = jnp.ones(lv.shape, mg.dtype)     # pure null mode
    x = mg._line_solve_eig(lv, ones)
    # un-pinned: |x| ~ 1/eps_eigh ~ 1e12; pinned: exactly the projected 0
    assert float(jnp.abs(x).max()) < 1e-6


def test_mg_adaptive_mode():
    cfg, mesh, geom = _setup(32, 32)
    rng = np.random.default_rng(3)
    rhs = rng.standard_normal((32, 32, 1))
    rhs -= rhs.mean()
    mg = MGPoissonSolver(mesh, cfg)
    b = jnp.asarray(rhs)
    p = mg.solve_adaptive(b, tol=1e-9, max_cycles=30)
    rel = float(jnp.linalg.norm(mg.residual(b, p).reshape(-1))
                / jnp.linalg.norm(b.reshape(-1)))
    assert rel < 1e-8


def test_projection_with_mg_backend():
    """Full solver step with poisson_solver=mg drives divergence down
    (reference projection_effectiveness gate, relaxed for iterative MG)."""
    cfg = Config(Nx=32, Ny=32, Nz=1, nu=1e-3, nu_specified=True,
                 dp_dx=-1e-3, dp_dx_specified=True, dtype="float64",
                 poisson_solver=PoissonSolverType.MG,
                 poisson_fixed_cycles=10,
                 dt=1e-3, adaptive_dt=False)
    sim = Simulation(cfg)
    assert sim.poisson_selection_reason.startswith("MG")
    from cfdnn_tpu import perturbed_channel
    state = perturbed_channel(cfg, sim.mesh, amp=0.1)
    state, d = sim.step(state)
    assert float(d.div_linf) < 1e-8
    for _ in range(5):
        state, d = sim.step(state)
    assert np.isfinite(float(d.ke))


# ---------------------------------------------------------------------------
# f32 matmul-transform accuracy: iterative refinement (cfg.poisson_refine)
# ---------------------------------------------------------------------------

class TestFDMRefinement:
    """The MXU eigenbasis-matmul transforms lose ~3 digits in float32 (a
    smooth RHS concentrates into few O(N^1.5) modal coefficients, so
    transform roundoff is amplified); cfg.poisson_refine recovers the f32
    floor via stencil-Laplacian iterative refinement. Guards the measured
    TPU regression: 128^3 TGV post-projection div 1.8e-3 -> 1.8e-6."""

    def _solve_div(self, refine):
        cfg = Config(Nx=32, Ny=32, Nz=32, bc_x=BCType.PERIODIC,
                     bc_y=BCType.PERIODIC, bc_z=BCType.PERIODIC,
                     y_min=0.0, y_max=2 * np.pi, z_max=2 * np.pi,
                     nu=1e-3, nu_specified=True, dp_dx=0.0,
                     dp_dx_specified=True, dtype="float32",
                     poisson_refine=refine)
        mesh = Mesh.from_config(cfg)
        geom = Geometry.make(mesh, cfg)
        solver = FDMPoissonSolver(mesh, cfg, transform="matmul", geom=geom)
        rng = np.random.default_rng(7)
        from cfdnn_tpu.fields import velocity_shapes
        comps = tuple(jnp.asarray(rng.standard_normal(s), jnp.float32)
                      for s in velocity_shapes(cfg))
        div0 = ops.divergence(comps, geom)
        p = solver.solve(div0 / 1e-2)
        out = ops.correct_velocity(comps, p, jnp.asarray(1e-2, jnp.float32),
                                   geom)
        return float(jnp.max(jnp.abs(ops.divergence(out, geom)))), \
            float(jnp.max(jnp.abs(div0)))

    def test_refinement_restores_f32_floor(self):
        d_refined, scale = self._solve_div(refine=1)
        # f32 floor: ~1e-6 relative to the pre-projection divergence
        assert d_refined < 3e-5 * scale

    def test_refinement_improves_base_solve(self):
        # on CPU the base einsum is true f32 so the gap is ~2.5x; on TPU
        # (bf16 MXU passes) it is ~1000x — this guards the direction only
        d_base, _ = self._solve_div(refine=0)
        d_refined, _ = self._solve_div(refine=1)
        assert d_refined < 0.6 * d_base


def test_float64_config_enables_x64(tmp_path):
    """Requesting dtype=float64 must actually produce 64-bit arrays —
    Simulation enables jax x64 itself so app runs can't silently truncate
    (regression: --dtype float64 app runs matched f32 bit-for-bit)."""
    import subprocess
    import sys
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "from cfdnn_tpu import Config, Simulation\n"
        "cfg = Config(Nx=8, Ny=8, Nz=4, nu=0.01, nu_specified=True,\n"
        "             dp_dx=-1e-3, dp_dx_specified=True, dtype='float64')\n"
        "sim = Simulation(cfg)\n"
        "st = sim.initial_state()\n"
        "assert str(st.u.dtype) == 'float64', st.u.dtype\n"
        "print('OK')\n"
    )
    env = dict(**__import__('os').environ)
    env.pop("JAX_ENABLE_X64", None)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, env=env, timeout=300)
    assert r.returncode == 0 and "OK" in r.stdout, r.stderr[-2000:]


def test_fht_transform_matches_matmul():
    """Four-step fast-Hartley Poisson (transform="fht") == the dense
    eigenbasis path to machine precision, incl. O4 symbols and mixed
    wall/stretched axes (poisson/fht.py; opt-in — see its PERF NOTE)."""
    import math

    import jax
    import jax.numpy as jnp

    from cfdnn_tpu.config import BCType
    from cfdnn_tpu.mesh import Mesh
    from cfdnn_tpu.ops import operators as ops
    from cfdnn_tpu.ops.grid import Geometry
    from cfdnn_tpu.poisson.fdm import FDMPoissonSolver

    rng = np.random.default_rng(0)
    L = 2 * math.pi
    for dims, bc_y, stretch, order in [
            ((64, 64, 64), BCType.PERIODIC, False, 2),
            ((64, 48, 32), BCType.WALL, True, 2),
            ((64, 64, 64), BCType.PERIODIC, False, 4)]:
        cfg = Config(Nx=dims[0], Ny=dims[1], Nz=dims[2], x_max=L,
                     y_max=L if bc_y == BCType.PERIODIC else 1.0,
                     z_max=L, bc_y=bc_y, stretch_y=stretch,
                     space_order=order, nu=1e-3, nu_specified=True,
                     dt=1e-3, adaptive_dt=False, dtype="float64")
        mesh = Mesh.from_config(cfg)
        geom = Geometry.make(mesh, cfg)
        rhs = jnp.asarray(rng.standard_normal(dims))
        rhs = rhs - jnp.mean(rhs)
        s = FDMPoissonSolver(mesh, cfg, transform="fht", geom=geom)
        assert s.fht_axes, s.name   # the factorized path, not a fallback
        p = s.solve(rhs)
        r = np.asarray(ops.laplacian(p, geom)) - np.asarray(rhs)
        r -= r.mean()
        assert np.abs(r).max() < 5e-12, (dims, bc_y, np.abs(r).max())


def test_fdm_precision_auto_selection():
    """Auto matmul-precision policy: HIGH below 384, HIGHEST at large N
    for physics runs, HIGH with refine=0 for benchmark/perf runs (the
    reference's --benchmark accuracy-relaxation parity; measured matrix
    in docs/POISSON_SOLVER_GUIDE.md)."""
    import numpy as np

    from cfdnn_tpu import BCType, Config
    from cfdnn_tpu.mesh import Mesh
    from cfdnn_tpu.poisson.fdm import FDMPoissonSolver

    from cfdnn_tpu.ops.grid import Geometry

    def solver(n, **kw):
        cfg = Config(Nx=n, Ny=8, Nz=8, bc_x=BCType.PERIODIC,
                     bc_y=BCType.PERIODIC, bc_z=BCType.PERIODIC,
                     y_min=0.0, y_max=2 * np.pi, z_max=2 * np.pi,
                     nu=1e-3, nu_specified=True, dp_dx=0.0,
                     dp_dx_specified=True, dtype="float32", **kw)
        mesh = Mesh.from_config(cfg)
        return FDMPoissonSolver(mesh, cfg, transform="matmul",
                                geom=Geometry.make(mesh, cfg))

    s = solver(64)
    assert s.precision_name == "high" and s.refine == 0
    s = solver(512)
    assert s.precision_name == "highest" and s.refine == 0
    s = solver(512, benchmark=True)
    assert s.precision_name == "high" and s.refine == 0
    s = solver(512, perf_mode=True)
    assert s.precision_name == "high" and s.refine == 0
    # user-forced HIGH at large N still gets the recovery refinement
    s = solver(512, poisson_matmul_precision="high")
    assert s.precision_name == "high" and s.refine == 1
