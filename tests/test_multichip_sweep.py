"""Device-count sweep: the ICI communication model vs measured HLO bytes.

Round-2 verdict: "multi-chip evidence is single-point" — dryrun and byte
accounting only ever ran at n=8. This module compiles the sharded step at
n in {2, 4, 8} (subsets of the 8 virtual CPU devices) and gates the
SCALING of each collective family against the model in
docs/DISTRIBUTION_GUIDE.md:

  collective-permute (z halos):   ~ constant in P   (planes of Nx*Ny*ng)
  all-to-all (pencil transpose):  ~ 1/P per device  (field split on ICI)
  all-gather:                     exactly zero      (replication kills
                                                     weak scaling)

plus one-step execution at each count (the dryrun sweep). Reference
analogue: the rank-sweep MPI tests (tests/test_mpi_rank_invariance.cpp)
run under mpirun at several small rank counts.
"""

import os
import sys

import numpy as np
import pytest

import jax

from cfdnn_tpu import Config, Simulation, perturbed_channel

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "scripts"))
from analyze_collectives import check_sweep, collective_stats  # noqa: E402


def _cfg(n_dev, **kw):
    base = dict(
        Nx=32, Ny=32, Nz=32, stretch_y=True,
        nu=1e-3, nu_specified=True, dp_dx=-1e-3, dp_dx_specified=True,
        dt=1e-3, adaptive_dt=False, dtype="float32",
        mesh_shape=(n_dev,))
    base.update(kw)
    return Config(**base)


def _stats(cfg):
    sim = Simulation(cfg)
    st = sim.initialize(perturbed_channel(cfg, sim.mesh, amp=0.05))
    txt = jax.jit(sim._step_impl).lower(st).compile().as_text()
    return sim, st, collective_stats(txt)


@pytest.fixture(scope="module")
def sweep_rows():
    """Measured per-collective bytes for the fused path at n=2,4,8 and
    the 2-D pencil mesh at n=4,8 (module-scoped: compiled once)."""
    rows = []
    for n in (2, 4, 8):
        cfg = _cfg(n, use_pallas="on")
        sim, st, stats = _stats(cfg)
        assert sim._pallas_predictor_ok == "shard"
        get = lambda op: stats.get(op, (0, 0, []))[1]
        rows.append(dict(n=n, path="fused", cp=get("collective-permute"),
                         ata=get("all-to-all"), ar=get("all-reduce"),
                         ag=get("all-gather")))
        # the dryrun leg: one real step at this device count
        out, d = sim.step(st)
        jax.block_until_ready(out.u)
        assert np.isfinite(float(d.ke)), f"n={n}: step produced NaN"
    for n in (4, 8):
        cfg = _cfg(n, mesh_shape=(2, n // 2), mesh_axes=("x", "z"))
        sim, st, stats = _stats(cfg)
        assert sim.poisson.name.startswith("Pencil2DFDM")
        get = lambda op: stats.get(op, (0, 0, []))[1]
        rows.append(dict(n=n, path="pencil2d",
                         cp=get("collective-permute"),
                         ata=get("all-to-all"), ar=get("all-reduce"),
                         ag=get("all-gather")))
        out, d = sim.step(st)
        jax.block_until_ready(out.u)
        assert np.isfinite(float(d.ke)), f"2-D n={n}: step produced NaN"
    # round-5: the fused SST transport path (batched six-field ng=2
    # ring) must weak-scale like the momentum halos — ~constant
    # permute bytes in P (reference: the distributed transport hot
    # path under the MPI z-slab, turbulence_transport.cpp:605)
    from cfdnn_tpu.config import TurbulenceModel
    for n in (4, 8):
        cfg = _cfg(n, use_pallas="on", turb_model=TurbulenceModel.SST)
        sim, st, stats = _stats(cfg)
        assert sim.turb._fuse_mode(sim) == "interpret"
        get = lambda op: stats.get(op, (0, 0, []))[1]
        rows.append(dict(n=n, path="fused-sst",
                         cp=get("collective-permute"),
                         ata=get("all-to-all"), ar=get("all-reduce"),
                         ag=get("all-gather")))
        out, d = sim.step(st)
        jax.block_until_ready(out.u)
        assert np.isfinite(float(d.ke)), f"SST n={n}: step produced NaN"
    return rows


def test_scaling_model_holds(sweep_rows):
    """check_sweep gates: permute ~const, all-to-all ~1/P, all-gather 0.

    For the 2-D pencil mesh with FIXED Px=2 the x-transpose volume is
    constant and only the z leg scales, so its all-to-all follows
    ~(1 + Pz)/(2 Pz) rather than 1/P — checked separately below.
    """
    rows_1d = [r for r in sweep_rows if r["path"] == "fused"]
    problems = check_sweep(rows_1d)
    assert not problems, "\n".join(problems)


def test_sst_transport_scaling(sweep_rows):
    """The fused-SST step's halo permutes stay ~constant in P and its
    all-to-alls fall ~1/P (the transport ring rides the same
    weak-scaling ledger as the momentum halos); all-gather zero."""
    rows = [r for r in sweep_rows if r["path"] == "fused-sst"]
    problems = check_sweep(rows)
    assert not problems, "\n".join(problems)
    # absolute: the six-field ng=2 transport ring + the momentum
    # ledger — bounded by ~3x the laminar permute volume
    lam = {r["n"]: r["cp"] for r in sweep_rows if r["path"] == "fused"}
    for r in rows:
        assert r["cp"] <= 3.2 * lam[r["n"]], (
            f"n={r['n']}: SST permute volume {r['cp']} B vs laminar "
            f"{lam[r['n']]} B — transport halos blew the ledger")


def test_pencil2d_sweep(sweep_rows):
    """2-D mesh: all-gather stays zero and the z-leg scaling shows up as
    a volume DROP from n=4 to n=8 (Px fixed at 2, Pz doubles)."""
    rows = sorted((r for r in sweep_rows if r["path"] == "pencil2d"),
                  key=lambda r: r["n"])
    assert [r["n"] for r in rows] == [4, 8]
    for r in rows:
        assert r["ag"] == 0, f"2-D n={r['n']}: all-gather {r['ag']} B"
    assert rows[1]["ata"] < rows[0]["ata"], (
        "2-D all-to-all volume did not drop when Pz doubled: "
        f"{rows[0]['ata']} -> {rows[1]['ata']}")


def test_halo_volume_absolute(sweep_rows):
    """The fused path's permute bytes stay within the one-plane halo
    ledger at EVERY device count (extends the n=8-only gate in
    test_sharding.py)."""
    plane = 32 * (32 + 1) * 4
    for r in sweep_rows:
        if r["path"] != "fused":
            continue
        assert r["cp"] <= 20 * plane, (
            f"n={r['n']}: permute volume {r['cp']} B exceeds the "
            f"ledger ({20 * plane} B)")
