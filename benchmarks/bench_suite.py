#!/usr/bin/env python
"""Benchmark suite (reference: tests/bench_mg.cpp, bench_fft_vs_mg.cpp,
bench_3d_gpu.cpp, bench_les_ibm_gpu.cpp, app/profile_* drivers).

Runs the named benchmarks on the current default device and prints one
JSON line per benchmark.

  python benchmarks/bench_suite.py [tgv|channel|poisson|les_ibm|all]
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def _time_run(sim, state, steps=1000, reps=3):
    """Differential timing: the n-step loop is one on-device lax.scan;
    time dispatches of `steps` and `steps//5` and report the marginal
    cost so the ~25 ms/call tunnel dispatch + transfer overhead cancels
    exactly (it would otherwise add 25/steps ms/step — 10%+ for the
    sub-ms benches run with short scans)."""
    from cfdnn_tpu.utils.timing import marginal_step_seconds
    short = max(steps // 5, 1)
    state, d = sim.run(state, steps)
    jax.block_until_ready(state)
    jax.block_until_ready(sim.run(state, short)[0])
    assert np.isfinite(float(d.ke))
    return marginal_step_seconds(
        lambda: jax.block_until_ready(sim.run(state, steps)[0]),
        lambda: jax.block_until_ready(sim.run(state, short)[0]),
        steps, short, reps)


def _emit(name, ms, ncells, extra=None):
    rec = {"bench": name, "ms_per_step": ms * 1e3,
           "mcells_per_s": ncells / ms / 1e6,
           "device": str(jax.devices()[0])}
    rec.update(extra or {})
    print(json.dumps(rec))


def bench_tgv(n=128):
    """All-periodic TGV (reference headline: H200 1,267 Mcells/s)."""
    from cfdnn_tpu import (BCType, Config, ConvectiveScheme, Simulation,
                           TimeIntegrator, init_taylor_green)
    cfg = Config(Nx=n, Ny=n, Nz=n, bc_x=BCType.PERIODIC,
                 bc_y=BCType.PERIODIC, bc_z=BCType.PERIODIC,
                 y_min=0.0, y_max=2 * np.pi, z_min=0.0, z_max=2 * np.pi,
                 nu=1 / 1600.0, nu_specified=True, dp_dx=0.0,
                 dp_dx_specified=True, dt=1e-3, adaptive_dt=False,
                 convective_scheme=ConvectiveScheme.SKEW,
                 benchmark=True, dtype="float32")
    sim = Simulation(cfg)
    s = _time_run(sim, init_taylor_green(cfg, sim.mesh))
    _emit(f"tgv_{n}cube_fdm", s, n**3,
          {"poisson": sim.poisson_selection_reason})


def bench_channel(n=128):
    """Wall-bounded channel, stretched y (reference: H200 452 Mcells/s
    with MG+graph; here the FDM eigen path)."""
    from cfdnn_tpu import Config, Simulation, perturbed_channel
    cfg = Config(Nx=n, Ny=n, Nz=n, stretch_y=True,
                 nu=1e-4, nu_specified=True, dp_dx=-1e-3,
                 dp_dx_specified=True, dt=2e-4, adaptive_dt=False,
                 benchmark=True, dtype="float32")
    sim = Simulation(cfg)
    s = _time_run(sim, perturbed_channel(cfg, sim.mesh, amp=0.05))
    _emit(f"channel_{n}cube_fdm", s, n**3,
          {"poisson": sim.poisson_selection_reason})


def bench_poisson(n=128):
    """FDM fft vs matmul vs MG solve (reference bench_fft_vs_mg)."""
    from cfdnn_tpu import BCType, Config
    from cfdnn_tpu.mesh import Mesh
    from cfdnn_tpu.poisson.fdm import FDMPoissonSolver
    from cfdnn_tpu.poisson.multigrid import MGPoissonSolver
    cfg = Config(Nx=n, Ny=n, Nz=n, bc_x=BCType.PERIODIC,
                 bc_y=BCType.PERIODIC, bc_z=BCType.PERIODIC,
                 y_min=0.0, y_max=2 * np.pi, z_min=0.0, z_max=2 * np.pi,
                 nu=1e-3, nu_specified=True, dp_dx=0.0, dp_dx_specified=True,
                 dtype="float32")
    mesh = Mesh.from_config(cfg)
    rhs = jnp.asarray(np.random.default_rng(0)
                      .standard_normal((n, n, n)).astype(np.float32))
    cfg_ch = cfg.with_(bc_y=BCType.WALL, y_min=-1.0, y_max=1.0,
                       stretch_y=True, poisson_fixed_cycles=6)
    mesh_ch = Mesh.from_config(cfg_ch)
    solvers = [
        ("fdm_fft", FDMPoissonSolver(mesh, cfg, transform="fft").solve),
        ("fdm_matmul", FDMPoissonSolver(mesh, cfg, transform="matmul").solve),
        ("mg_6cycles", MGPoissonSolver(mesh_ch, cfg_ch).solve),
    ]
    for name, solve in solvers:
        # Differential timing: scan L1 and L2 solves inside one dispatch
        # each and report the marginal cost. The ~25 ms/dispatch tunnel
        # overhead cancels exactly — it distorted the ~1.3 ms MG solve
        # into 7.4 ms at a naive L=5, and even at L=200 it added ~0.13 ms
        # to the sub-ms FDM solves.
        from cfdnn_tpu.utils.timing import marginal_step_seconds
        L1, L2 = (40, 200) if name.startswith("fdm") else (10, 50)

        def make(L, s=solve):
            @jax.jit
            def f(r):
                def body(c, _):
                    return s(c), None
                out, _ = jax.lax.scan(body, r, None, length=L)
                return out
            return f

        f1, f2 = make(L1), make(L2)
        jax.block_until_ready(f1(rhs))
        jax.block_until_ready(f2(rhs))
        s = marginal_step_seconds(
            lambda: jax.block_until_ready(f2(rhs)),
            lambda: jax.block_until_ready(f1(rhs)),
            L2, L1, reps=3)
        _emit(f"poisson_{name}_{n}cube", s, n**3)


def bench_les_ibm(n=128):
    """LES + IBM cylinder (reference bench_les_ibm_gpu: RTX6000
    58.6 Mcells/s at 256x128x256)."""
    from cfdnn_tpu import Config, Simulation, perturbed_channel
    from cfdnn_tpu.config import TurbulenceModel
    from cfdnn_tpu.ibm import CylinderBody
    cfg = Config(Nx=n, Ny=n // 2, Nz=n, x_max=4.0, z_max=2.0,
                 nu=1e-4, nu_specified=True, dp_dx=-1e-3,
                 dp_dx_specified=True, dt=2e-4, adaptive_dt=False,
                 turb_model=TurbulenceModel.SMAGORINSKY,
                 benchmark=True, dtype="float32")
    sim = Simulation(cfg)
    sim.set_ibm_forcing(CylinderBody(1.0, 0.0, 0.25))
    s = _time_run(sim, perturbed_channel(cfg, sim.mesh, amp=0.05), steps=500)
    _emit(f"les_ibm_{n}x{n//2}x{n}", s, n * (n // 2) * n)


def bench_models(n=64):
    """Per-closure step cost (reference: the RANS campaign table,
    artifacts/profiling_results.md:7-19 — baseline 45 s ... nn_tbnn 129 s
    per 50k steps on an L40S)."""
    from cfdnn_tpu import Config, Simulation, perturbed_channel
    from cfdnn_tpu.config import TurbulenceModel
    from cfdnn_tpu.turbulence.nn_core import MLP
    import tempfile
    import jax as _jax

    tmp = tempfile.mkdtemp()
    for name, dims in (("mlp", [6, 32, 1]), ("tbnn", [5, 64, 4])):
        m = MLP.from_dims(dims, key=_jax.random.PRNGKey(0))
        m.Ws[-1] = 0.01 * m.Ws[-1]
        m.means = jnp.zeros((dims[0],))
        m.stds = jnp.ones((dims[0],))
        m.save(f"{tmp}/{name}")

    for model in TurbulenceModel:
        kw = {}
        if model == TurbulenceModel.NN_MLP:
            kw["nn_weights_path"] = f"{tmp}/mlp"
        elif model == TurbulenceModel.NN_TBNN:
            kw["nn_weights_path"] = f"{tmp}/tbnn"
        cfg = Config(Nx=n, Ny=n, Nz=n, turb_model=model,
                     nu=1e-3, nu_specified=True, dp_dx=-1e-3,
                     dp_dx_specified=True, dt=2e-4, adaptive_dt=False,
                     benchmark=True, dtype="float32", **kw)
        sim = Simulation(cfg)
        s = _time_run(sim, perturbed_channel(cfg, sim.mesh, amp=0.02),
                      steps=200, reps=2)
        _emit(f"model_{model.value}_{n}cube", s, n**3)


def bench_large(n=512, turb_model=None):
    """Production-scale single-chip TGV (one-plane slab kernels under the
    raised scoped-VMEM cap; README 512^3 rows), optionally with an LES
    closure active. NOT in `all`: the Mosaic compile is ~2 min and the
    run needs ~8 GB of HBM headroom."""
    from cfdnn_tpu import (BCType, Config, Simulation, init_taylor_green)
    kw = {} if turb_model is None else {"turb_model": turb_model}
    cfg = Config(Nx=n, Ny=n, Nz=n, bc_y=BCType.PERIODIC,
                 x_max=2 * np.pi, y_max=2 * np.pi, z_max=2 * np.pi,
                 nu=0.000625, nu_specified=True, dt=1e-3,
                 adaptive_dt=False, benchmark=True,
                 dtype="float32", **kw).finalize()
    sim = Simulation(cfg)
    s = _time_run(sim, init_taylor_green(cfg, sim.mesh), steps=20, reps=3)
    tag = "tgv" if turb_model is None else "les"
    _emit(f"{tag}_{n}cube_large", s, n**3,
          {"pallas_mode": str(sim._pallas_predictor_ok)})


def bench_large_channel(n=512):
    """Production-scale single-chip channel (walls + stretched y,
    channel-specialized thin-halo slab kernels; README 512^3 row).
    NOT in `all` for the same compile/HBM reasons as bench_large."""
    from cfdnn_tpu import Config, Simulation, perturbed_channel
    cfg = Config(Nx=n, Ny=n, Nz=n, stretch_y=True,
                 nu=1e-4, nu_specified=True, dp_dx=-1e-3,
                 dp_dx_specified=True, dt=2e-4, adaptive_dt=False,
                 benchmark=True, dtype="float32")
    sim = Simulation(cfg)
    s = _time_run(sim, perturbed_channel(cfg, sim.mesh, amp=0.05),
                  steps=20, reps=3)
    _emit(f"channel_{n}cube_large", s, n**3,
          {"poisson": sim.poisson_selection_reason})


def bench_large_les(n=512):
    """README 512^3 LES row: bench_large with Smagorinsky active."""
    from cfdnn_tpu.config import TurbulenceModel
    bench_large(n, turb_model=TurbulenceModel.SMAGORINSKY)


ALL = {"tgv": bench_tgv, "channel": bench_channel,
       "poisson": bench_poisson, "les_ibm": bench_les_ibm,
       "models": bench_models}
EXTRA = {"large": bench_large, "large_channel": bench_large_channel,
         "large_les": bench_large_les}

if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    for name, fn in ALL.items():
        if which in (name, "all"):
            fn()
    for name, fn in EXTRA.items():
        if which == name:
            fn()
