"""Multi-chip sharding tests on the 8-virtual-device CPU mesh.

Mirrors the reference MPI suite (reference: tests/test_mpi_rank_invariance.cpp
bulk velocity invariant to rank count, tests/test_mpi_poisson.cpp,
tests/test_mpi_halo_step.cpp, tests/test_decomposition.cpp): the z-sharded
jitted step must produce the same physics as the single-device run, with
GSPMD inserting the halo collectives and the all-to-all FFT transposes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfdnn_tpu import BCType, Config, Simulation, perturbed_channel
from cfdnn_tpu.parallel.sharding import (device_mesh, shard_state,
                                         sharded_step, state_shardings)


pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def _cfg(**kw):
    base = dict(Nx=16, Ny=16, Nz=32, stretch_y=True,
                nu=1e-3, nu_specified=True, dp_dx=-1e-3, dp_dx_specified=True,
                dt=1e-3, adaptive_dt=False, dtype="float64")
    base.update(kw)
    return Config(**base)


def test_sharded_step_matches_single_device():
    """Rank-invariance: 8-way z-sharded trajectory == unsharded one."""
    cfg = _cfg()
    sim = Simulation(cfg)
    state0 = perturbed_channel(cfg, sim.mesh, amp=0.05)

    ref = state0
    for _ in range(3):
        ref, ref_d = sim.step(ref)

    mesh = device_mesh(8)
    st = shard_state(state0, mesh)
    step = sharded_step(sim, mesh)
    for _ in range(3):
        st, d = step(st)
    np.testing.assert_allclose(np.asarray(st.u), np.asarray(ref.u),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(st.p), np.asarray(ref.p),
                               rtol=0, atol=1e-12)
    assert abs(float(d.ke) - float(ref_d.ke)) < 1e-12


def test_sharded_poisson_globally_coupled():
    """The sharded FDM solve is global (no Schwarz iteration): residual at
    machine precision across the shard boundaries."""
    cfg = _cfg(Nz=64)
    sim = Simulation(cfg)
    from cfdnn_tpu.ops import operators as ops
    rng = np.random.default_rng(0)
    rhs = jnp.asarray(rng.standard_normal((16, 16, 64)))
    mesh = device_mesh(8)
    from jax.sharding import NamedSharding, PartitionSpec as P
    rhs_sh = jax.device_put(rhs, NamedSharding(mesh, P(None, None, "z")))
    p = jax.jit(sim.poisson.solve)(rhs_sh)
    lap = np.asarray(ops.laplacian(p, sim.geom))
    resid = lap - np.asarray(rhs)
    # residual is a constant (null-mode offset); check flatness
    assert np.abs(resid - resid.mean()).max() < 1e-10


def test_sharded_turbulence_step():
    """Smagorinsky closure under sharding (algebraic family): the
    gradient stencils ride GSPMD halo collectives. (Transport-PDE
    closures — SST/k-omega/EARSM — have their own dedicated mesh-parity
    tests below: test_sharded_transport_*.)"""
    from cfdnn_tpu.config import TurbulenceModel
    cfg = _cfg(turb_model=TurbulenceModel.SMAGORINSKY)
    sim = Simulation(cfg)
    state0 = sim.initialize(perturbed_channel(cfg, sim.mesh, amp=0.05))
    ref, _ = sim.step(state0)
    mesh = device_mesh(8)
    st = shard_state(state0, mesh)
    step = sharded_step(sim, mesh)
    out, d = step(st)
    np.testing.assert_allclose(np.asarray(out.u), np.asarray(ref.u),
                               rtol=0, atol=1e-12)
    assert np.isfinite(float(d.ke))


def test_mesh_shape_respected():
    m = device_mesh(4)
    assert m.shape == {"z": 4}
    with pytest.raises(ValueError):
        device_mesh(100)


def test_mg_backend_rejects_device_mesh():
    """MG is single-device (its dense coarse solve would all-gather under
    GSPMD): a mesh_shape>1 run that lands on the MG backend must fail at
    construction with a clear error, not silently gather every V-cycle
    (reference analogue: Schwarz-MG under MPI, solver.cpp:2329-2346)."""
    cfg = _cfg(mesh_shape=(8,), poisson_solver="mg")
    with pytest.raises(NotImplementedError, match="multigrid"):
        Simulation(cfg)
    # the same shape through AUTO selects the pencil FDM and works
    sim = Simulation(_cfg(mesh_shape=(8,)))
    assert "FDM" in sim.poisson.name


def test_sharded_step_with_poisson_refinement():
    """cfg.poisson_refine inserts a stencil-Laplacian pass inside the FDM
    solve; it must stay rank-invariant under the z-sharded mesh (GSPMD
    halo collectives around the refinement stencil)."""
    cfg = _cfg(poisson_refine=1, dtype="float32")
    sim = Simulation(cfg)
    assert sim.poisson.refine == 1
    state0 = perturbed_channel(cfg, sim.mesh, amp=0.05)

    ref = state0
    for _ in range(3):
        ref, ref_d = sim.step(ref)

    mesh = device_mesh(8)
    st = shard_state(state0, mesh)
    step = sharded_step(sim, mesh)
    for _ in range(3):
        st, d = step(st)
    np.testing.assert_allclose(np.asarray(st.u), np.asarray(ref.u),
                               rtol=0, atol=1e-5)
    assert np.isfinite(float(d.ke))


def test_mesh_shape_config_runs_sharded():
    """Config.mesh_shape=(8,) alone distributes the run: `initialize`
    places the state z-sharded on the device mesh, the jitted step is
    GSPMD-partitioned from the input shardings, and the trajectory matches
    the single-device run (rank invariance via a config knob — the
    reference's mpirun -np N)."""
    cfg1 = _cfg()
    sim1 = Simulation(cfg1)
    state0 = perturbed_channel(cfg1, sim1.mesh, amp=0.05)
    ref = sim1.initialize(state0)
    for _ in range(3):
        ref, ref_d = sim1.step(ref)

    cfg8 = _cfg(mesh_shape=(8,))
    sim8 = Simulation(cfg8)
    assert sim8.device_mesh is not None
    assert not sim8._pallas_predictor_ok   # custom calls don't partition
    st = sim8.initialize(state0)
    shard = st.u.sharding
    assert shard.spec == jax.sharding.PartitionSpec(None, None, "z"), shard
    for _ in range(3):
        st, d = sim8.step(st)
    np.testing.assert_allclose(np.asarray(st.u), np.asarray(ref.u),
                               rtol=0, atol=1e-12)
    assert abs(float(d.ke) - float(ref_d.ke)) < 1e-12


def test_mesh_shape_cli_coercion():
    """--mesh_shape 8 / --mesh_axes z parse into tuples on any app CLI."""
    cfg = Config(nu=1e-3, nu_specified=True, dp_dx=-1.0,
                 dp_dx_specified=True).parse_args(
        ["--mesh_shape", "8", "--mesh_axes", "z"])
    assert cfg.mesh_shape == (8,)
    assert cfg.mesh_axes == ("z",)
    cfg2 = cfg.parse_args(["--mesh_shape=2,4"])
    assert cfg2.mesh_shape == (2, 4)


def test_sharded_dynamic_smagorinsky_step():
    """Dynamic Smagorinsky's plane-averaged Germano identity under
    sharding: the homogeneous-plane means become psums over the z mesh
    axis and must reproduce the single-device Cs^2(y)."""
    from cfdnn_tpu.config import TurbulenceModel
    cfg = _cfg(turb_model=TurbulenceModel.DYNAMIC_SMAGORINSKY,
               mesh_shape=(8,))
    sim8 = Simulation(cfg)
    sim1 = Simulation(_cfg(turb_model=TurbulenceModel.DYNAMIC_SMAGORINSKY))
    state0 = perturbed_channel(sim1.cfg, sim1.mesh, amp=0.05)
    ref, ref_d = sim1.step(sim1.initialize(state0))
    st = sim8.initialize(state0)
    out, d = sim8.step(st)
    np.testing.assert_allclose(np.asarray(out.u), np.asarray(ref.u),
                               rtol=0, atol=1e-12)
    assert abs(float(d.ke) - float(ref_d.ke)) < 1e-12


def test_sharded_recycling_step():
    """Recycling inflow under sharding: the carried inlet-plane state and
    the x-plane extractions/corrections must survive z-sharding."""
    cfg = _cfg(Nx=32, bc_x=BCType.INFLOW, recycling_inflow=True,
               recycle_x=2.0, mesh_shape=(8,))
    sim8 = Simulation(cfg)
    cfg1 = _cfg(Nx=32, bc_x=BCType.INFLOW, recycling_inflow=True,
                recycle_x=2.0)
    sim1 = Simulation(cfg1)
    state0 = perturbed_channel(cfg1, sim1.mesh, amp=0.05)
    ref, ref_d = sim1.step(sim1.initialize(state0))
    out, d = sim8.step(sim8.initialize(state0))
    np.testing.assert_allclose(np.asarray(out.u), np.asarray(ref.u),
                               rtol=0, atol=1e-12)
    assert np.isfinite(float(d.ke))


def test_sharded_checkpoint_roundtrip(tmp_path):
    """Checkpoint save/load of a z-sharded state: arrays written from the
    8-device mesh reload bit-identically (production restart path)."""
    from cfdnn_tpu.io.checkpoint import (latest_checkpoint, load_checkpoint,
                                         save_checkpoint)
    cfg = _cfg(mesh_shape=(8,))
    sim = Simulation(cfg)
    st = sim.initialize(perturbed_channel(cfg, sim.mesh, amp=0.05))
    st, _ = sim.step(st)
    d = str(tmp_path / "ck")
    save_checkpoint(d, st, cfg)
    back = load_checkpoint(latest_checkpoint(d), cfg)
    np.testing.assert_array_equal(np.asarray(back.u), np.asarray(st.u))
    np.testing.assert_array_equal(np.asarray(back.p), np.asarray(st.p))
    assert int(back.step) == int(st.step)


def test_pencil_poisson_matches_unsharded():
    """The explicit pencil-transpose FDM solve (parallel/pencil.py — the
    reference's FFT_MPI dataflow, poisson_solver_fft_mpi.cpp) matches the
    single-device solve to machine precision."""
    cfg1 = _cfg()
    sim1 = Simulation(cfg1)
    cfg8 = _cfg(mesh_shape=(8,))
    sim8 = Simulation(cfg8)
    assert sim8.poisson.name.startswith("PencilFDM")
    rng = np.random.default_rng(0)
    rhs = jnp.asarray(rng.standard_normal((16, 16, 32)))
    from jax.sharding import NamedSharding, PartitionSpec as P
    rhs_sh = jax.device_put(
        rhs, NamedSharding(sim8.device_mesh, P(None, None, "z")))
    p1 = sim1.poisson.solve(rhs)
    p8 = jax.jit(sim8.poisson.solve)(rhs_sh)
    np.testing.assert_allclose(np.asarray(p8), np.asarray(p1),
                               rtol=0, atol=1e-12)


def test_sharded_step_collective_schedule():
    """HLO-inspection gate (VERDICT round-1 item 1): the compiled sharded
    step must move data with neighbor collective-permutes (halos) and
    all-to-alls (pencil transposes) — NEVER by all-gathering a full field
    onto every chip (the scalability killer GSPMD picks by default for
    the z transform)."""
    cfg = _cfg(dtype="float32", mesh_shape=(8,))
    sim = Simulation(cfg)
    st = sim.initialize(perturbed_channel(cfg, sim.mesh, amp=0.05))
    txt = jax.jit(sim._step_impl).lower(st).compile().as_text()
    assert "all-to-all" in txt, "pencil transposes missing from the HLO"
    assert "collective-permute" in txt, "halo exchanges missing"
    assert "all-gather" not in txt, (
        "the sharded step all-gathers a field — the pencil/halo schedule "
        "has regressed to full replication")


def test_sharded_fused_step_matches_single_fused():
    """The multi-chip Pallas fast path (parallel/fused.py: ppermute
    z-halos + slab kernels under shard_map) reproduces the single-device
    fused step — the sharded analogue of the Pallas-vs-jnp parity suite."""
    cfg1 = _cfg(use_pallas="on")
    sim1 = Simulation(cfg1)
    assert sim1._pallas_predictor_ok == "slab"
    cfg8 = _cfg(use_pallas="on", mesh_shape=(8,))
    sim8 = Simulation(cfg8)
    assert sim8._pallas_predictor_ok == "shard"
    state0 = perturbed_channel(cfg1, sim1.mesh, amp=0.05)
    ref = sim1.initialize(state0)
    ref, ref_d = sim1.step(ref)
    st = sim8.initialize(state0)
    st, d = sim8.step(st)
    np.testing.assert_allclose(np.asarray(st.u), np.asarray(ref.u),
                               rtol=0, atol=1e-13)
    np.testing.assert_allclose(np.asarray(st.w), np.asarray(ref.w),
                               rtol=0, atol=1e-13)
    assert abs(float(d.ke) - float(ref_d.ke)) < 1e-13


def test_sharded_fused_les_step_matches_single_fused():
    """Sharded fused LES pipeline (sharded_fused_nu_sgs) parity."""
    from cfdnn_tpu.config import TurbulenceModel
    cfg1 = _cfg(use_pallas="on", turb_model=TurbulenceModel.VREMAN)
    sim1 = Simulation(cfg1)
    cfg8 = _cfg(use_pallas="on", turb_model=TurbulenceModel.VREMAN,
                mesh_shape=(8,))
    sim8 = Simulation(cfg8)
    assert sim8.turb._fuse == "shard"
    state0 = perturbed_channel(cfg1, sim1.mesh, amp=0.05)
    ref, ref_d = sim1.step(sim1.initialize(state0))
    st, d = sim8.step(sim8.initialize(state0))
    np.testing.assert_allclose(np.asarray(st.u), np.asarray(ref.u),
                               rtol=0, atol=1e-13)
    assert abs(float(d.ke) - float(ref_d.ke)) < 1e-13


def test_sharded_nstep_scan_runs():
    """The fused n-step lax.scan (Simulation.run — the benchmark path)
    must compile and execute over the 8-device mesh: the scan carries a
    sharded state through pencil Poisson solves and halo collectives
    (the virtual-device analogue of a scaling smoke run)."""
    cfg = _cfg(dtype="float32", mesh_shape=(8,))
    sim = Simulation(cfg)
    st = sim.initialize(perturbed_channel(cfg, sim.mesh, amp=0.05))
    st, d = sim.run(st, 20)
    assert np.isfinite(float(d.ke))
    assert st.u.sharding.spec == jax.sharding.PartitionSpec(None, None, "z")


def test_fused_shard_path_communication_volume():
    """Communication-volume gate for the PRODUCTION multi-chip path
    (use_pallas="on" -> mode "shard"; under "auto" a CPU compile measures
    the GSPMD fallback instead). The fused step's ICI traffic must be
    one-plane halo ppermutes — O(Nx*Ny*ng) per exchange — plus the two
    pencil all-to-alls, NOT the fallback's full-shard reshard permutes
    (measured 14x the volume at 256^3/8: 82.9 vs 3.9 MB/device/step,
    scripts/analyze_collectives.py)."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    from analyze_collectives import collective_stats

    cfg = _cfg(dtype="float32", mesh_shape=(8,), use_pallas="on",
               bc_y=BCType.WALL)
    sim = Simulation(cfg)
    assert sim._pallas_predictor_ok == "shard"
    st = sim.initialize(perturbed_channel(cfg, sim.mesh, amp=0.05))
    txt = jax.jit(sim._step_impl).lower(st).compile().as_text()
    stats = collective_stats(txt)
    assert "all-gather" not in stats or stats["all-gather"][1] == 0
    assert "all-to-all" in stats, "pencil transposes missing"
    n_perm, vol, _ = stats.get("collective-permute", (0, 0, []))
    # halo ledger: batched (u,v,w) exchange x2 directions for predictor
    # and divergence + 2 correction (+1 diagnostic) = 7 one-plane
    # messages; total bytes <= the equivalent of 20 single-component
    # planes (the pre-batching ledger), each <= Nx*(Ny+1)*ng*4 bytes
    plane = cfg.Nx * (cfg.Ny + 1) * 4
    assert n_perm <= 20, f"{n_perm} permutes — fallback-style resharding?"
    assert vol <= 20 * plane, (
        f"permute volume {vol} B exceeds the one-plane halo ledger "
        f"({20 * plane} B) — full-shard reshards crept into the fused path")


# ---------------------------------------------------------------------------
# Transport-PDE closures + upwind momentum under a device mesh (round-5:
# the reference's fused SST transport and upwind kernels run in its
# DISTRIBUTED hot path — src/turbulence_transport.cpp:605 +
# solver_kernels.hpp:1863-2198 under the MPI z-slab of
# decomposition.hpp:28-105; rounds 1-4 left ours single-device-only)
# ---------------------------------------------------------------------------


def _transport_parity(model, mesh_kw, n=3, scheme=None, atol=1e-13):
    """f64 trajectory parity of a transport-PDE closure (or a momentum
    scheme) between the single-device fused path and a device-mesh fused
    path. Returns the sharded sim for extra assertions."""
    from cfdnn_tpu.config import TurbulenceModel
    kw = dict(Nx=32, Ny=16, Nz=32)
    if model is not None:
        kw["turb_model"] = model
    if scheme is not None:
        kw["convective_scheme"] = scheme
    cfg1 = _cfg(use_pallas="on", **kw)
    sim1 = Simulation(cfg1)
    assert sim1._pallas_predictor_ok == "slab"
    cfgN = _cfg(use_pallas="on", **kw, **mesh_kw)
    simN = Simulation(cfgN)
    state0 = perturbed_channel(cfg1, sim1.mesh, amp=0.05)
    ref = sim1.initialize(state0)
    st = simN.initialize(state0)
    for _ in range(n):
        ref, ref_d = sim1.step(ref)
        st, d = simN.step(st)
    np.testing.assert_allclose(np.asarray(st.u), np.asarray(ref.u),
                               rtol=0, atol=atol)
    if ref.k is not None:
        np.testing.assert_allclose(np.asarray(st.k), np.asarray(ref.k),
                                   rtol=0, atol=atol)
        np.testing.assert_allclose(np.asarray(st.omega),
                                   np.asarray(ref.omega),
                                   rtol=0, atol=atol)
    assert abs(float(d.ke) - float(ref_d.ke)) < 1e-13
    return simN


def test_sharded_transport_sst_matches_single_device():
    """Fused SST transport advance + closure under the (8,) z-slab mesh:
    the ng=2 ppermute halo ring (F1's compound reach) + the unmodified
    slab kernel must reproduce the single-device fused trajectory."""
    from cfdnn_tpu.config import TurbulenceModel
    sim8 = _transport_parity(TurbulenceModel.SST, dict(mesh_shape=(8,)))
    assert sim8._pallas_predictor_ok == "shard"
    assert sim8.turb._fuse_mode(sim8) == "interpret"  # fused, not jnp


def test_sharded_transport_sst_2d_mesh():
    """Fused SST transport under the (2,4) (x,z) pencil mesh: both halo
    families (x AND z rings of width 2) around the fused advance."""
    from cfdnn_tpu.config import TurbulenceModel
    sim2 = _transport_parity(TurbulenceModel.SST,
                             dict(mesh_shape=(2, 4), mesh_axes=("x", "z")))
    assert sim2._pallas_predictor_ok == "shard2d"
    assert sim2.turb._fuse_mode(sim2) == "interpret"


def test_sharded_transport_komega_matches_single_device():
    """Wilcox k-omega (ng=1 ring — diffusivities read only the input
    nu_t) under the z-slab mesh."""
    from cfdnn_tpu.config import TurbulenceModel
    sim8 = _transport_parity(TurbulenceModel.KOMEGA, dict(mesh_shape=(8,)))
    assert sim8.turb.fuse_ng == 1
    assert sim8.turb._fuse_mode(sim8) == "interpret"


def test_sharded_transport_earsm_matches_single_device():
    """EARSM (WJ): the fused SST advance is inherited and must run
    sharded; the anisotropy closure keeps the two-pass GSPMD form."""
    from cfdnn_tpu.config import TurbulenceModel
    sim8 = _transport_parity(TurbulenceModel.EARSM_WJ,
                             dict(mesh_shape=(8,)))
    assert sim8.turb._fuse_mode(sim8) == "interpret"


def test_sharded_upwind_momentum_matches_single_device():
    """upwind/upwind2 momentum under the mesh: the halo ring follows the
    scheme (upwind2's biased stencil reads 2 cells — parallel/fused.
    _halo_ng), the round-4 single-device-only gate is lifted."""
    from cfdnn_tpu.config import ConvectiveScheme
    sim8 = _transport_parity(None, dict(mesh_shape=(8,)),
                             scheme=ConvectiveScheme.UPWIND2)
    assert sim8._pallas_predictor_ok == "shard"
    _transport_parity(None, dict(mesh_shape=(2, 4), mesh_axes=("x", "z")),
                      scheme=ConvectiveScheme.UPWIND)


def test_sharded_fused_germano_matches_jnp():
    """Sharded fused dynamic Smagorinsky (parallel/fused.
    sharded_fused_germano: ng=2 halos + z_crop'd plane sums + psum'd
    LM/MM profiles) == the single-device jnp Germano chain."""
    from cfdnn_tpu.config import TurbulenceModel
    kw = dict(Nx=32, Ny=16, Nz=32,
              turb_model=TurbulenceModel.DYNAMIC_SMAGORINSKY)
    cfg_ref = _cfg(use_pallas="off", **kw)
    sim_ref = Simulation(cfg_ref)
    cfg8 = _cfg(use_pallas="on", mesh_shape=(8,), **kw)
    sim8 = Simulation(cfg8)
    assert sim8.turb._fuse == "shard"
    state0 = perturbed_channel(cfg_ref, sim_ref.mesh, amp=0.05)
    nut_ref = np.asarray(sim_ref.turb.nu_t(state0, sim_ref))
    st8 = sim8.initialize(state0)
    nut8 = np.asarray(sim8.turb.nu_t(st8, sim8))
    np.testing.assert_allclose(nut8, nut_ref, rtol=1e-12, atol=1e-16)
    ref, ref_d = sim_ref.step(state0)
    out, d = sim8.step(st8)
    np.testing.assert_allclose(np.asarray(out.u), np.asarray(ref.u),
                               rtol=0, atol=1e-12)
    assert abs(float(d.ke) - float(ref_d.ke)) < 1e-12


def test_sharded_nn_closure_matches_single_device():
    """NN-MLP closure under the z-slab mesh: the feature pipeline +
    MXU-batched inference ride GSPMD (reference: the campaign's NN rows
    are single-GPU only; here every closure distributes)."""
    import tempfile

    from cfdnn_tpu.config import TurbulenceModel
    from cfdnn_tpu.turbulence.nn_core import MLP

    tmp = tempfile.mkdtemp()
    m = MLP.from_dims([6, 16, 1], key=jax.random.PRNGKey(0))
    m.Ws[-1] = 0.01 * m.Ws[-1]
    m.means = jnp.zeros((6,))
    m.stds = jnp.ones((6,))
    m.save(f"{tmp}/mlp")
    kw = dict(turb_model=TurbulenceModel.NN_MLP,
              nn_weights_path=f"{tmp}/mlp")
    cfg1 = _cfg(**kw)
    sim1 = Simulation(cfg1)
    state0 = perturbed_channel(cfg1, sim1.mesh, amp=0.05)
    ref, ref_d = sim1.step(sim1.initialize(state0))
    sim8 = Simulation(_cfg(**kw, mesh_shape=(8,)))
    out, d = sim8.step(sim8.initialize(state0))
    np.testing.assert_allclose(np.asarray(out.u), np.asarray(ref.u),
                               rtol=0, atol=1e-12)
    assert abs(float(d.ke) - float(ref_d.ke)) < 1e-12


def test_grad_through_sharded_fused_matches_single_device():
    """jax.grad THROUGH the sharded fused step: vjp_via's backward is
    plain jnp, so GSPMD partitions it over the mesh — distributed
    a-posteriori training. Gradients must match the single-device fused
    trace to machine precision."""
    import tempfile

    from cfdnn_tpu.config import TurbulenceModel
    from cfdnn_tpu.ml.adjoint import trajectory_loss
    from cfdnn_tpu.turbulence.nn_core import MLP

    tmp = tempfile.mkdtemp()
    m = MLP.from_dims([6, 16, 1], key=jax.random.PRNGKey(0))
    m.Ws[-1] = 0.01 * m.Ws[-1]
    m.means = jnp.zeros((6,))
    m.stds = jnp.ones((6,))
    m.save(f"{tmp}/mlp")
    kw = dict(use_pallas="on", turb_model=TurbulenceModel.NN_MLP,
              nn_weights_path=f"{tmp}/mlp")

    def grads(sim):
        s0 = sim.initialize(perturbed_channel(sim.cfg, sim.mesh,
                                              amp=0.05))
        loss = trajectory_loss(sim, lambda s: jnp.mean(s.u ** 2), 2)
        v, g = jax.value_and_grad(loss)(sim.turb.mlp, s0)
        return float(v), jax.tree_util.tree_leaves(g)

    sim1 = Simulation(_cfg(**kw))
    assert sim1._pallas_predictor_ok == "slab"
    sim8 = Simulation(_cfg(**kw, mesh_shape=(8,)))
    assert sim8._pallas_predictor_ok == "shard"
    v1, g1 = grads(sim1)
    v8, g8 = grads(sim8)
    assert abs(v1 - v8) < 1e-14 * max(abs(v1), 1.0)
    for a, b in zip(g1, g8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-10, atol=1e-17)


def test_sharded_transport_comm_volume():
    """Comm-volume gate for the sharded fused SST step: the transport
    halo exchange must be ONE batched six-field ppermute pair of ng=2
    rings per advance (not per-field messages, not full-shard
    reshards), on top of the momentum path's one-plane ledger."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    from analyze_collectives import collective_stats
    from cfdnn_tpu.config import TurbulenceModel

    cfg = _cfg(Nx=32, dtype="float32", mesh_shape=(8,), use_pallas="on",
               turb_model=TurbulenceModel.SST)
    sim = Simulation(cfg)
    assert sim._pallas_predictor_ok == "shard"
    assert sim.turb._fuse_mode(sim) == "interpret"
    st = sim.initialize(perturbed_channel(cfg, sim.mesh, amp=0.05))
    txt = jax.jit(sim._step_impl).lower(st).compile().as_text()
    stats = collective_stats(txt)
    assert "all-gather" not in stats or stats["all-gather"][1] == 0
    n_perm, vol, _ = stats.get("collective-permute", (0, 0, []))
    # ledger: the laminar fused step's <= 20 one-plane messages (see
    # test_fused_shard_path_communication_volume) + the transport's one
    # batched pair of ng=2 six-field rings (~6 components of ~(Ny+2)
    # rows) + the predictor's extra nu_t plane
    plane = cfg.Nx * (cfg.Ny + 2) * 4
    budget = 20 * plane + 2 * 6 * 2 * plane + 4 * plane
    assert n_perm <= 26, f"{n_perm} permutes — per-field halo messages?"
    assert vol <= budget, (
        f"permute volume {vol} B exceeds the transport halo ledger "
        f"({budget} B) — full-shard reshards crept into the fused path")


# ---------------------------------------------------------------------------
# 2-D (x, z) pencil decomposition — beyond the reference's 1-D z-slab
# (decomposition.hpp:28-44); maps both halo families onto the 2-D ICI torus
# ---------------------------------------------------------------------------


def test_2d_mesh_step_matches_single_device():
    """(2,4) x,z-pencil trajectory == unsharded one (rank invariance)."""
    cfg1 = _cfg(Nx=32)
    sim1 = Simulation(cfg1)
    state0 = perturbed_channel(cfg1, sim1.mesh, amp=0.05)
    ref = state0
    for _ in range(3):
        ref, ref_d = sim1.step(ref)

    # use_pallas="on" so the shard2d routing is actually exercised (under
    # "auto" on CPU the platform check alone would return False and the
    # assertion would be vacuous). Since round 3 the fused fast path
    # covers the 2-D (x,z) pencil mesh too ("shard2d"); physics parity
    # below is the real gate.
    cfg2 = _cfg(Nx=32, mesh_shape=(2, 4), mesh_axes=("x", "z"),
                use_pallas="on")
    sim2 = Simulation(cfg2)
    assert sim2.poisson.name.startswith("Pencil2DFDM"), sim2.poisson.name
    assert sim2._pallas_predictor_ok == "shard2d"
    st = sim2.initialize(state0)
    for _ in range(3):
        st, d = sim2.step(st)
    np.testing.assert_allclose(np.asarray(st.u), np.asarray(ref.u),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(st.p), np.asarray(ref.p),
                               rtol=0, atol=1e-12)
    assert abs(float(d.ke) - float(ref_d.ke)) < 1e-12


def test_2d_pencil_poisson_matches_unsharded():
    """Pencil2DFDM solve == single-device FDM solve to machine precision
    (the solve stays globally coupled across both shard axes)."""
    cfg1 = _cfg(Nx=32)
    sim1 = Simulation(cfg1)
    cfg2 = _cfg(Nx=32, mesh_shape=(2, 4), mesh_axes=("x", "z"))
    sim2 = Simulation(cfg2)
    rng = np.random.default_rng(0)
    rhs = jnp.asarray(rng.standard_normal((32, 16, 32)))
    from jax.sharding import NamedSharding, PartitionSpec as P
    rhs_sh = jax.device_put(
        rhs, NamedSharding(sim2.device_mesh, P("x", None, "z")))
    p1 = sim1.poisson.solve(rhs)
    p2 = jax.jit(sim2.poisson.solve)(rhs_sh)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p1),
                               rtol=0, atol=1e-12)


def test_2d_mesh_collective_schedule():
    """The compiled 2-D-sharded step must not all-gather a full field."""
    cfg = _cfg(Nx=32, dtype="float32", mesh_shape=(2, 4),
               mesh_axes=("x", "z"))
    sim = Simulation(cfg)
    st = sim.initialize(perturbed_channel(cfg, sim.mesh, amp=0.05))
    txt = jax.jit(sim._step_impl).lower(st).compile().as_text()
    assert "all-to-all" in txt, "2-D pencil transposes missing from HLO"
    assert "collective-permute" in txt, "halo exchanges missing"
    assert "all-gather" not in txt, (
        "the 2-D sharded step all-gathers a field")


def test_2d_mesh_requires_xz_axes():
    with pytest.raises(NotImplementedError):
        Simulation(_cfg(mesh_shape=(2, 4), mesh_axes=("a", "b")))


def test_2d_mesh_les_no_allgather():
    """LES on a 2-D (x,z) pencil mesh routes to the fused 'shard2d' path
    (round 3); the compiled step must stay all-gather-free WITH the fused
    path active — a z-only shard_map here would all-gather x every step
    (the round-2 failure mode this test originally guarded)."""
    from cfdnn_tpu.config import TurbulenceModel
    cfg = _cfg(Nx=32, dtype="float32", mesh_shape=(2, 4),
               mesh_axes=("x", "z"), use_pallas="on",
               turb_model=TurbulenceModel.SMAGORINSKY)
    sim = Simulation(cfg)
    assert sim.turb._fuse == "shard2d"
    st = sim.initialize(perturbed_channel(cfg, sim.mesh, amp=0.05))
    txt = jax.jit(sim._step_impl).lower(st).compile().as_text()
    assert "all-gather" not in txt


def test_sharded_ibm_step_matches_single_device():
    """IBM under sharding (reference: tests/test_mpi_ibm_3d.cpp): the
    cylinder weight-mask forcing + Poisson RHS masking are rank-invariant
    on both the 1-D z-slab and the 2-D (x,z) pencil mesh."""
    from cfdnn_tpu.ibm import CylinderBody

    def build(**kw):
        cfg = _cfg(Nx=32, **kw)
        sim = Simulation(cfg)
        sim.set_ibm_forcing(CylinderBody(0.5 * cfg.Lx,
                                         0.5 * (cfg.y_min + cfg.y_max),
                                         0.15 * cfg.Ly))
        return cfg, sim

    cfg1, sim1 = build()
    state0 = perturbed_channel(cfg1, sim1.mesh, amp=0.05)
    ref = state0
    for _ in range(3):
        ref, _ = sim1.step(ref)

    for mshape, maxes in [((8,), ("z",)), ((2, 4), ("x", "z"))]:
        _, simN = build(mesh_shape=mshape, mesh_axes=maxes)
        st = simN.initialize(state0)
        for _ in range(3):
            st, _ = simN.step(st)
        np.testing.assert_allclose(np.asarray(st.u), np.asarray(ref.u),
                                   rtol=0, atol=1e-12,
                                   err_msg=f"mesh {mshape}")


def test_2d_mesh_duct_walled_z():
    """Walled z under a 2-D mesh: the staggered w carries Nz+1 faces,
    which cannot split evenly — field_spec must leave that dim
    replicated (fallback) rather than fail device_put, and the duct
    trajectory must still match single-device."""
    from cfdnn_tpu import zero_state
    kw = dict(Nx=16, Ny=16, Nz=16, x_max=1.0, y_min=-1.0, y_max=1.0,
              z_min=-1.0, z_max=1.0, bc_y=BCType.WALL, bc_z=BCType.WALL,
              nu=0.05, nu_specified=True, dp_dx=-1.0, dp_dx_specified=True,
              dt=2e-3, adaptive_dt=False, dtype="float64")
    cfg1 = Config(**kw)
    sim1 = Simulation(cfg1)
    cfg2 = Config(**kw, mesh_shape=(2, 4), mesh_axes=("x", "z"))
    sim2 = Simulation(cfg2)
    assert sim2.poisson.name.startswith("Pencil2DFDM")
    s1, s2 = zero_state(cfg1), sim2.initialize(zero_state(cfg2))
    for _ in range(20):
        s1, _ = sim1.step(s1)
        s2, _ = sim2.step(s2)
    np.testing.assert_allclose(np.asarray(s2.u), np.asarray(s1.u),
                               rtol=0, atol=1e-13)
    np.testing.assert_allclose(np.asarray(s2.w), np.asarray(s1.w),
                               rtol=0, atol=1e-13)


def test_2d_mesh_checkpoint_roundtrip(tmp_path):
    """Checkpoint save/load from a 2-D (x,z) pencil mesh: orbax must
    round-trip the P('x',None,'z')-sharded arrays bit-identically."""
    from cfdnn_tpu.io.checkpoint import (latest_checkpoint, load_checkpoint,
                                         save_checkpoint)
    cfg = _cfg(Nx=32, mesh_shape=(2, 4), mesh_axes=("x", "z"))
    sim = Simulation(cfg)
    st = sim.initialize(perturbed_channel(cfg, sim.mesh, amp=0.05))
    st, _ = sim.step(st)
    d = str(tmp_path / "ck2d")
    save_checkpoint(d, st, cfg)
    back = load_checkpoint(latest_checkpoint(d), cfg)
    np.testing.assert_array_equal(np.asarray(back.u), np.asarray(st.u))
    np.testing.assert_array_equal(np.asarray(back.p), np.asarray(st.p))


def test_sharded_resume_reapplies_sharding(tmp_path):
    """load_checkpoint(sim=...) must place the restored arrays back onto
    the run's device mesh (a resume otherwise loads everything onto
    device 0 — OOM for fields that only fit sharded)."""
    from cfdnn_tpu.io.checkpoint import (latest_checkpoint, load_checkpoint,
                                         save_checkpoint)
    cfg = _cfg(mesh_shape=(8,))
    sim = Simulation(cfg)
    st = sim.initialize(perturbed_channel(cfg, sim.mesh, amp=0.05))
    st, _ = sim.step(st)
    save_checkpoint(str(tmp_path / "ck"), st, cfg)
    back = load_checkpoint(latest_checkpoint(str(tmp_path / "ck")), cfg,
                           sim=sim)
    assert back.u.sharding.spec == jax.sharding.PartitionSpec(
        None, None, "z"), back.u.sharding
    np.testing.assert_array_equal(np.asarray(back.u), np.asarray(st.u))


def test_2d_mesh_o4_refine_matches_single_device():
    """O4 schemes + iterative refinement on the 2-D pencil mesh: the O4
    eigen symbols ride the same transposes and the refinement stencil
    crosses both shard axes under GSPMD — trajectory must stay
    bitwise-level with single-device."""
    kw = dict(Nx=32, Ny=16, Nz=32, stretch_y=True, nu=1e-3,
              nu_specified=True, dp_dx=-1e-3, dp_dx_specified=True,
              dt=1e-3, adaptive_dt=False, dtype="float64",
              space_order=4, poisson_refine=1)
    sim1 = Simulation(Config(**kw))
    sim2 = Simulation(Config(**kw, mesh_shape=(2, 4), mesh_axes=("x", "z")))
    assert sim2.poisson.name.startswith("Pencil2DFDM")
    assert sim2.poisson.refine == 1
    s1 = perturbed_channel(sim1.cfg, sim1.mesh, amp=0.05)
    s2 = sim2.initialize(s1)
    for _ in range(3):
        s1, _ = sim1.step(s1)
        s2, _ = sim2.step(s2)
    np.testing.assert_allclose(np.asarray(s2.u), np.asarray(s1.u),
                               rtol=0, atol=1e-13)


def test_2d_pencil_4x2_aspect():
    """(4,2) mesh (transposed aspect vs the (2,4) tests): the z-major
    combined-rank arithmetic must hold for Px > Pz too."""
    cfg1 = _cfg(Nx=32)
    sim1 = Simulation(cfg1)
    cfg2 = _cfg(Nx=32, mesh_shape=(4, 2), mesh_axes=("x", "z"))
    sim2 = Simulation(cfg2)
    assert sim2.poisson.name.startswith("Pencil2DFDM")
    rng = np.random.default_rng(5)
    rhs = jnp.asarray(rng.standard_normal((32, 16, 32)))
    from jax.sharding import NamedSharding, PartitionSpec as P
    rhs_sh = jax.device_put(
        rhs, NamedSharding(sim2.device_mesh, P("x", None, "z")))
    p1 = sim1.poisson.solve(rhs)
    p2 = jax.jit(sim2.poisson.solve)(rhs_sh)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p1),
                               rtol=0, atol=1e-12)


# ---------------------------------------------------------------------------
# 2-D (x, z) FUSED fast path (round-3: parallel/fused.py *_2d wrappers —
# the pencil mesh used to fall back to the GSPMD operator path)
# ---------------------------------------------------------------------------


def test_2d_fused_step_matches_single_fused():
    """shard2d (ppermute x- AND z-halos + slab kernels under shard_map)
    reproduces the single-device fused step at machine precision."""
    cfg1 = _cfg(use_pallas="on")
    sim1 = Simulation(cfg1)
    assert sim1._pallas_predictor_ok == "slab"
    cfg2 = _cfg(use_pallas="on", mesh_shape=(2, 4), mesh_axes=("x", "z"))
    sim2 = Simulation(cfg2)
    assert sim2._pallas_predictor_ok == "shard2d"
    assert sim2.poisson.name.startswith("Pencil2DFDM")
    state0 = perturbed_channel(cfg1, sim1.mesh, amp=0.05)
    ref = sim1.initialize(state0)
    st = sim2.initialize(state0)
    for _ in range(3):
        ref, ref_d = sim1.step(ref)
        st, d = sim2.step(st)
    np.testing.assert_allclose(np.asarray(st.u), np.asarray(ref.u),
                               rtol=0, atol=1e-13)
    np.testing.assert_allclose(np.asarray(st.w), np.asarray(ref.w),
                               rtol=0, atol=1e-13)
    np.testing.assert_allclose(np.asarray(st.p), np.asarray(ref.p),
                               rtol=0, atol=1e-12)
    assert abs(float(d.ke) - float(ref_d.ke)) < 1e-13


def test_2d_fused_les_step_matches_single_fused():
    """shard2d fused LES pipeline (sharded_fused_nu_sgs_2d) parity."""
    from cfdnn_tpu.config import TurbulenceModel
    cfg1 = _cfg(use_pallas="on", turb_model=TurbulenceModel.VREMAN)
    sim1 = Simulation(cfg1)
    cfg2 = _cfg(use_pallas="on", turb_model=TurbulenceModel.VREMAN,
                mesh_shape=(2, 4), mesh_axes=("x", "z"))
    sim2 = Simulation(cfg2)
    assert sim2.turb._fuse == "shard2d"
    state0 = perturbed_channel(cfg1, sim1.mesh, amp=0.05)
    ref, ref_d = sim1.step(sim1.initialize(state0))
    st, d = sim2.step(sim2.initialize(state0))
    np.testing.assert_allclose(np.asarray(st.u), np.asarray(ref.u),
                               rtol=0, atol=1e-13)
    assert abs(float(d.ke) - float(ref_d.ke)) < 1e-13


def test_2d_fused_path_communication_volume():
    """Comm-volume gate for the 2-D fused path: zero all-gather, pencil
    all-to-alls present, and the batched-halo discipline holds on BOTH
    axes — x halos are thin (ny+ish, ng, tz)-planes and z halos one-plane,
    so total permute volume stays within a small multiple of the two
    plane ledgers."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    from analyze_collectives import collective_stats

    cfg = _cfg(dtype="float32", mesh_shape=(2, 4), mesh_axes=("x", "z"),
               use_pallas="on", bc_y=BCType.WALL)
    sim = Simulation(cfg)
    assert sim._pallas_predictor_ok == "shard2d"
    st = sim.initialize(perturbed_channel(cfg, sim.mesh, amp=0.05))
    txt = jax.jit(sim._step_impl).lower(st).compile().as_text()
    stats = collective_stats(txt)
    assert "all-gather" not in stats or stats["all-gather"][1] == 0
    assert "all-to-all" in stats, "pencil transposes missing"
    n_perm, vol, _ = stats.get("collective-permute", (0, 0, []))
    # ledger (measured 14 permutes / 17.4 kB at this config): each halo
    # site pays one batched z-pair (local planes (Nx/px, ~3(Ny+2), ng))
    # and one batched x-pair ((ng, ~3(Ny+2), Nz/pz + 2 ng)); bound at 8
    # exchanges of each family — full-shard resharding would blow
    # through this by an order of magnitude.
    ng = 1
    rows = 3 * (cfg.Ny + 2)                 # batched staggered y extents
    z_plane = (cfg.Nx // 2) * rows * ng * 4
    x_plane = ng * rows * (cfg.Nz // 4 + 2 * ng) * 4
    budget = 8 * (z_plane + x_plane)
    assert n_perm <= 20, f"{n_perm} permutes — resharding crept in?"
    assert vol <= budget, (
        f"2-D permute volume {vol} B exceeds the halo ledger ({budget} B)")
