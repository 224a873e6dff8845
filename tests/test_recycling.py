"""Recycling-inflow tests.

Mirrors the reference suite (reference: tests/test_recycling_inflow.cpp 12
checks, tests/test_periodic_vs_recycling.cpp): pipeline-stage sanity,
mass-flux control, inlet continuity, fringe localization, step stability.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from cfdnn_tpu import BCType, Config, Simulation, perturbed_channel
from cfdnn_tpu.config import TimeIntegrator


def _cfg(**kw):
    base = dict(
        Nx=32, Ny=16, Nz=8,
        x_min=0.0, x_max=4.0, z_max=1.0,
        bc_x=BCType.INFLOW, bc_y=BCType.WALL, bc_z=BCType.PERIODIC,
        nu=1e-3, nu_specified=True, dp_dx=-2e-3, dp_dx_specified=True,
        dt=1e-3, adaptive_dt=False, dtype="float64",
        recycling_inflow=True, recycle_filter_tau=0.05,
        recycle_target_bulk_u=-1.0,
    )
    base.update(kw)
    return Config(**base)


def test_recycling_requires_3d_periodic_z():
    with pytest.raises(ValueError):
        Simulation(_cfg(Nz=1))
    with pytest.raises(ValueError):
        Simulation(_cfg(bc_z=BCType.WALL))


def test_recycle_process_shift_and_filter():
    sim = Simulation(_cfg(recycle_shift_z=2, recycle_filter_tau=-1.0))
    state = sim.initialize(perturbed_channel(sim.cfg, sim.mesh, amp=0.05))
    comps = (state.u, state.v, state.w)
    inlet = (state.inlet_u, state.inlet_v, state.inlet_w)
    out = sim.recycling.process(comps, inlet)
    # no filter: inlet u = shifted recycle plane + uniform mass offset
    rec = np.asarray(state.u)[sim.recycling.i_rec, :, :]
    shifted = np.roll(rec, 2, axis=-1)
    got = np.asarray(out[0])
    np.testing.assert_allclose(got - got.mean(), shifted - shifted.mean(),
                               atol=1e-12)
    # transverse means removed (v wall faces re-zeroed afterwards, so its
    # mean is only approximately zero) and no-slip preserved
    v_out = np.asarray(out[1])
    assert abs(float(v_out[1:-1].mean())) < 0.02 * np.abs(v_out).max() + 1e-12
    assert np.all(v_out[0] == 0.0) and np.all(v_out[-1] == 0.0)
    assert abs(float(np.asarray(out[2]).mean())) < 1e-12


def test_recycling_mass_flux_target():
    sim = Simulation(_cfg(recycle_target_bulk_u=0.5, recycle_filter_tau=-1.0))
    state = sim.initialize(perturbed_channel(sim.cfg, sim.mesh, amp=0.01))
    comps = (state.u, state.v, state.w)
    # run process repeatedly on a static field: bulk walks toward target
    inlet = (state.inlet_u, state.inlet_v, state.inlet_w)
    for _ in range(3):
        inlet = sim.recycling.process(comps, inlet)
    # one application moves bulk by at most 10% toward target (clamped)
    bulk0 = float(np.sum(np.asarray(state.u)[sim.recycling.i_rec]
                         * np.asarray(sim.recycling.area))
                  / sim.recycling.total_area)
    bulk1 = float(np.sum(np.asarray(inlet[0]) * np.asarray(sim.recycling.area))
                  / sim.recycling.total_area)
    assert abs(bulk1 - 0.5) <= abs(bulk0 - 0.5) + 1e-12


def test_recycling_inlet_continuity():
    """After a full step the inlet-cell divergence is driven to ~0
    (reference correct_inlet_divergence, the key stability fix)."""
    sim = Simulation(_cfg())
    state = sim.initialize(perturbed_channel(sim.cfg, sim.mesh, amp=0.05))
    from cfdnn_tpu.ops import operators as ops
    for _ in range(3):
        state, d = sim.step(state)
    div = np.asarray(ops.divergence((state.u, state.v, state.w), sim.geom))
    # inlet cells exactly div-free; the convective-outlet cell is exempt
    # (its zero-gradient overwrite is non-solenoidal by construction, as in
    # the reference)
    assert np.abs(div[0, :, :]).max() < 1e-10
    assert np.abs(div[1:-1, :, :]).max() < 1e-10


def test_recycling_steps_stable_rk2():
    sim = Simulation(_cfg(time_integrator=TimeIntegrator.RK2))
    state = sim.initialize(perturbed_channel(sim.cfg, sim.mesh, amp=0.05))
    for _ in range(20):
        state, d = sim.step(state)
    assert np.isfinite(float(d.ke))
    from cfdnn_tpu.ops import operators as ops
    div = np.asarray(ops.divergence((state.u, state.v, state.w), sim.geom))
    assert np.abs(div[:-1]).max() < 1e-8   # outlet cell exempt (convective)
    # inlet buffers carried and finite
    assert np.all(np.isfinite(np.asarray(state.inlet_u)))


def test_fringe_blend_localized():
    sim = Simulation(_cfg(recycle_fringe_length=0.5))
    state = sim.initialize(perturbed_channel(sim.cfg, sim.mesh, amp=0.0))
    inlet = (jnp.ones_like(state.inlet_u), state.inlet_v, state.inlet_w)
    comps = (jnp.zeros_like(state.u), state.v, state.w)
    out = sim.recycling.fringe(comps, inlet)
    u = np.asarray(out[0])
    nf = sim.recycling.i_fringe
    assert u[0, 0, 0] > 0.9            # near inlet: ~inlet value
    assert np.all(u[nf:, :, :] == 0.0)  # untouched beyond the fringe


def test_recycling_stage_diagnostics():
    """Stage telemetry (reference solver.hpp:734-805 recycle_diag)."""
    sim = Simulation(_cfg(recycle_target_bulk_u=0.4))
    state = sim.initialize(perturbed_channel(sim.cfg, sim.mesh, amp=0.05))
    d = sim.recycling.stage_diagnostics(
        (state.u, state.v, state.w),
        (state.inlet_u, state.inlet_v, state.inlet_w))
    for key in ("L2_copy", "L2_ar1", "L2_mean", "u_mean_after_corr",
                "u_rms_after_corr", "bulk_offset"):
        assert key in d and np.isfinite(d[key]), key
    assert abs(d["bulk_offset"]) <= 0.1 * 0.4 + 1e-12


def test_periodic_vs_recycling_agreement(record_qoi):
    """The recycling machinery must reproduce the periodic channel
    (reference tests/test_periodic_vs_recycling.cpp, run in its default
    Quick mode): both cases start from the SAME perturbed laminar
    channel; after spin-up the developed-region mean profile must match
    the periodic one within 5% (the reference's actual Quick-mode gate —
    its stress tolerances are relaxed to 100% in Quick mode since the
    deliberately sub-turbulent perturbations are different random
    realizations; see test_periodic_vs_recycling.cpp:593-596). Measured
    here: U agrees to ~0.8%, fluctuation magnitudes same order."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "validation"))
    import periodic_vs_recycling as pvr

    out = pvr.run_quick(Nx=48, Ny=48, Nz=24, t_spin=0.5, t_stats=0.5,
                        verbose=False)
    record_qoi("pvr_U_rel_diff", out["U"])
    record_qoi("pvr_uv_rel_diff", out["uv"])
    assert out["U"] < 0.05, f"mean profile diff {out['U']}"
    assert out["u_rms"] < 1.0 and out["uv"] < 1.0, out


def test_mass_flux_correction_recovers_from_backflow():
    """A transient that reverses the recycle-plane bulk must be corrected
    TOWARD the target (the old bulk-scaling form amplified a negative
    bulk: offset = bulk*(clip(target/bulk)-1) pushes the wrong way)."""
    sim = Simulation(_cfg(recycle_target_bulk_u=1.0))
    rec = sim.recycling
    plane = -0.2 * jnp.ones_like(sim.initialize(
        perturbed_channel(sim.cfg, sim.mesh)).inlet_u)
    bulk = lambda f: float(jnp.sum(f * rec.area) / rec.total_area)
    assert bulk(plane) < 0
    for _ in range(20):
        plane, off = rec._u_correction(plane)
    assert abs(bulk(plane) - 1.0) < 1e-6   # converged to the target
    # per-step offset clamped to 10% of the target
    plane2 = -0.2 * jnp.ones_like(plane)
    plane2, off = rec._u_correction(plane2)
    assert abs(bulk(plane2) - (-0.1)) < 1e-9


def test_shift_interval_rotates_amount():
    """recycle_shift_interval rotates the shift AMOUNT every interval
    steps (its documented meaning, reference config.hpp:216 — the shift
    itself applies every step); 0 keeps the reference's constant
    shift."""
    sim = Simulation(_cfg(recycle_shift_interval=5))
    rec = sim.recycling
    state = sim.initialize(perturbed_channel(sim.cfg, sim.mesh, amp=0.05))
    plane = state.u[rec.i_rec, :, :]
    nz = plane.shape[-1]
    np.testing.assert_array_equal(
        np.asarray(rec._shift(plane, jnp.asarray(0))),
        np.asarray(jnp.roll(plane, rec.shift_k % nz, axis=-1)))
    np.testing.assert_array_equal(
        np.asarray(rec._shift(plane, jnp.asarray(7))),
        np.asarray(jnp.roll(plane, (2 * rec.shift_k) % nz, axis=-1)))
    # default: constant shift every step
    sim0 = Simulation(_cfg())
    np.testing.assert_array_equal(
        np.asarray(sim0.recycling._shift(plane, jnp.asarray(99))),
        np.asarray(jnp.roll(plane, sim0.recycling.shift_k, axis=-1)))


def test_lund_rescaling_pins_inlet_statistics():
    """recycle_rescale (Lund et al. 1998 statistical rescaling, beyond
    the reference's shift/filter/mass-flux machinery): after the
    recycle-station turbulence drifts — amplified fluctuations AND a
    drifted mean — process() still produces an inlet with the captured
    reference z-mean profile and fluctuation RMS, pinning the recycle
    loop gain at 1."""
    cfg = _cfg(recycle_rescale=True, recycle_filter_tau=-1.0,
               recycle_remove_transverse_mean=False, recycle_shift_z=0,
               recycle_target_bulk_u=0.0)
    sim = Simulation(cfg)
    state = sim.initialize(perturbed_channel(cfg, sim.mesh, amp=0.05))
    rec = sim.recycling
    assert rec.rescale_stats is not None

    comps0 = (state.u, state.v, state.w)
    t_mean, _ = rec.rescale_stats[0]

    # drift the field: 3x fluctuations + 0.5 mean offset everywhere
    def drift(f):
        m = jnp.mean(f, axis=-1, keepdims=True)
        return m + 0.5 + 3.0 * (f - m)

    comps = tuple(drift(c) for c in comps0)
    inlet = rec.init_buffers(comps)
    out = rec.process(comps, inlet)

    # mean profile pinned exactly regardless of the clip
    mean = np.asarray(jnp.mean(out[0], axis=-1, keepdims=True))
    np.testing.assert_allclose(mean, np.asarray(t_mean), atol=1e-12)

    # RMS pinned exactly once the clip admits the needed 1/3 factor
    # (the default clip=2 would clamp a 3x drift at scale 1/2)
    sim2 = Simulation(_cfg(recycle_rescale=True, recycle_rescale_clip=10.0,
                           recycle_filter_tau=-1.0,
                           recycle_remove_transverse_mean=False,
                           recycle_shift_z=0, recycle_target_bulk_u=0.0))
    st2 = sim2.initialize(perturbed_channel(sim2.cfg, sim2.mesh, amp=0.05))
    rec2 = sim2.recycling
    comps2 = tuple(drift(c) for c in (st2.u, st2.v, st2.w))
    out2 = rec2.process(comps2, rec2.init_buffers(comps2))
    t_mean2, t_rms2 = rec2.rescale_stats[0]
    mean2 = np.asarray(jnp.mean(out2[0], axis=-1, keepdims=True))
    fluc2 = np.asarray(out2[0]) - mean2
    rms2 = np.sqrt((fluc2 ** 2).mean(axis=-1, keepdims=True))
    np.testing.assert_allclose(rms2, np.asarray(t_rms2), atol=1e-12)

    # off by default: drifted stats pass straight through
    sim3 = Simulation(_cfg(recycle_filter_tau=-1.0, recycle_shift_z=0,
                           recycle_remove_transverse_mean=False))
    st3 = sim3.initialize(perturbed_channel(sim3.cfg, sim3.mesh, amp=0.05))
    assert sim3.recycling.rescale_stats is None


def test_mass_flux_target_auto_capture():
    """recycle_target_bulk_u=-1 (default) captures the IC inlet bulk at
    initialize() — reference parity (solver_recycling.cpp:784-785) —
    and the controller then holds the inlet bulk there; 0 disables."""
    sim = Simulation(_cfg(recycle_filter_tau=-1.0))
    state = sim.initialize(perturbed_channel(sim.cfg, sim.mesh, amp=0.02))
    rec = sim.recycling
    assert rec.target_bulk > 0
    area = np.asarray(rec.area)
    ic_bulk = float((np.asarray(state.inlet_u) * area).sum()
                    / rec.total_area)
    np.testing.assert_allclose(rec.target_bulk, ic_bulk, rtol=1e-6)

    # a uniformly accelerated field gets pulled back toward the target
    comps = (state.u + 0.05 * rec.target_bulk, state.v, state.w)
    out = rec.process(comps, (state.inlet_u, state.inlet_v,
                              state.inlet_w))
    out_bulk = float((np.asarray(out[0]) * area).sum() / rec.total_area)
    np.testing.assert_allclose(out_bulk, rec.target_bulk, rtol=1e-6)

    # 0 = disabled: the drift passes through
    sim0 = Simulation(_cfg(recycle_filter_tau=-1.0,
                           recycle_target_bulk_u=0.0))
    st0 = sim0.initialize(perturbed_channel(sim0.cfg, sim0.mesh, amp=0.02))
    assert sim0.recycling.target_bulk == 0.0
    comps0 = (st0.u + 0.05, st0.v, st0.w)
    out0 = sim0.recycling.process(
        comps0, (st0.inlet_u, st0.inlet_v, st0.inlet_w))
    b_in = float((np.asarray(st0.inlet_u) * area).sum() / rec.total_area)
    b_out = float((np.asarray(out0[0]) * area).sum() / rec.total_area)
    assert abs(b_out - (b_in + 0.05)) < 1e-6


def test_lund_rescaling_step_stable():
    """A full jitted step with recycle_rescale on stays finite (the
    rescale stats are trace-time constants captured in initialize)."""
    sim = Simulation(_cfg(recycle_rescale=True))
    state = sim.initialize(perturbed_channel(sim.cfg, sim.mesh, amp=0.05))
    for _ in range(5):
        state, d = sim.step(state)
    assert np.isfinite(float(d.ke))


def test_recycling_through_flow_anchored_under_body_force():
    """The outlet mass-flux pin anchors a body-forced recycling channel
    at the captured target bulk. The recycled inlet u enters only as
    ghost/fringe data and the inlet FACE is projection-determined, so
    without the outlet anchor the domain is a closed tube: a uniform
    acceleration is divergence-free and the body force drives a runaway
    (measured in the full pvr study: bulk 15.7 -> 27+ under dp_dx=-1).

    Start from a half-strength Poiseuille state so forcing and friction
    are far out of balance (unanchored drift ~ +0.5/time here); the
    anchored bulk must stay at the IC's captured target."""
    cfg = _cfg(nu=0.05, dp_dx=-1.0, dt=2e-3, recycle_filter_tau=-1.0)
    sim = Simulation(cfg)
    ic = perturbed_channel(cfg, sim.mesh, amp=0.02)
    ic = ic.replace(u=0.5 * ic.u, v=0.5 * ic.v, w=0.5 * ic.w)
    st = sim.initialize(ic)
    target = sim.recycling.target_bulk
    assert target > 0
    st, _ = sim.run(st, 300)   # 0.6 time units
    w = np.asarray(sim.mesh.y.d[:, None] * sim.mesh.z.d[None, :])
    mid = np.asarray(st.u)[st.u.shape[0] // 2]
    bulk = float((mid * w).sum() / w.sum())
    # unanchored this drifts ~+9%; anchored it must hold to ~1%
    assert abs(bulk - target) / target < 0.02, (bulk, target)
