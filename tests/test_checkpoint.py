"""Checkpoint/resume round-trip (capability beyond the reference, which has
no restart path — SURVEY 5.4)."""

import numpy as np

from cfdnn_tpu import Config, Simulation, perturbed_channel
from cfdnn_tpu.io.checkpoint import (latest_checkpoint, load_checkpoint,
                                     save_checkpoint)


def test_checkpoint_roundtrip_bitexact(tmp_path):
    cfg = Config(Nx=8, Ny=16, Nz=4, nu=1e-3, nu_specified=True,
                 dp_dx=-1e-3, dp_dx_specified=True, dt=1e-3,
                 adaptive_dt=False, dtype="float64")
    sim = Simulation(cfg)
    state = perturbed_channel(cfg, sim.mesh, amp=0.05)
    for _ in range(5):
        state, _ = sim.step(state)
    d = save_checkpoint(str(tmp_path), state, cfg)
    assert latest_checkpoint(str(tmp_path)) == d

    restored = load_checkpoint(d, cfg)
    np.testing.assert_array_equal(np.asarray(restored.u), np.asarray(state.u))
    np.testing.assert_array_equal(np.asarray(restored.p), np.asarray(state.p))
    assert int(restored.step) == int(state.step)

    # resumed trajectory == continuous trajectory (bit-exact restart)
    cont, _ = sim.step(state)
    resumed, _ = sim.step(restored)
    np.testing.assert_array_equal(np.asarray(cont.u), np.asarray(resumed.u))
