"""Training-toolchain tests (reference: the torch trainers' loss-decrease
behavior + export/reload round trip through the text weight format)."""

import numpy as np
import pytest

from cfdnn_tpu.ml.training import (synthetic_channel_dataset, train_mlp,
                                   train_tbnn)
from cfdnn_tpu.turbulence.nn_core import MLP


@pytest.fixture(scope="module")
def data():
    return synthetic_channel_dataset(n=2000, seed=1)


def test_mlp_training_reduces_loss(data, tmp_path_factory):
    mlp, hist = train_mlp(data["features"], data["nu_t"], hidden=[16],
                          epochs=30, batch=256)
    assert hist[-1] < 0.5 * hist[0]
    # exported model loads and predicts non-negative nu_t (relu head)
    d = tmp_path_factory.mktemp("zoo") / "mlp"
    mlp.save(str(d))
    loaded = MLP.load(str(d))
    import jax.numpy as jnp
    pred = np.asarray(loaded(jnp.asarray(data["features"][:64])))
    assert np.all(pred >= 0.0)
    assert np.all(np.isfinite(pred))


def test_tbnn_training_reduces_loss(data):
    mlp, hist = train_tbnn(data["invariants"], data["basis"], data["b"],
                           hidden=[16, 16], epochs=30, batch=256)
    assert hist[-1] < 0.5 * hist[0]
    assert mlp.output_dim == 4


def test_trained_mlp_runs_in_solver(data, tmp_path):
    """End-to-end: train -> export -> load as an nn_mlp closure -> step."""
    mlp, _ = train_mlp(data["features"], data["nu_t"], hidden=[8],
                       epochs=10, batch=512)
    d = tmp_path / "model"
    mlp.save(str(d))
    from cfdnn_tpu import Config, Simulation, perturbed_channel
    from cfdnn_tpu.config import TurbulenceModel
    cfg = Config(Nx=8, Ny=16, Nz=4, nu=1e-3, nu_specified=True,
                 dp_dx=-1e-3, dp_dx_specified=True, dt=1e-3,
                 adaptive_dt=False, dtype="float64",
                 turb_model=TurbulenceModel.NN_MLP,
                 nn_weights_path=str(d))
    sim = Simulation(cfg)
    state = sim.initialize(perturbed_channel(cfg, sim.mesh, amp=0.01))
    for _ in range(3):
        state, diags = sim.step(state)
    assert np.isfinite(float(diags.ke))


def test_shipped_presets_load():
    """The shipped model-zoo presets resolve via nn_preset."""
    import os
    for preset, model in (("mlp_channel_synthetic", "nn_mlp"),
                          ("tbnn_channel_synthetic", "nn_tbnn")):
        path = os.path.join("data", "models", preset)
        if not os.path.isdir(path):
            pytest.skip("presets not generated yet")
        mlp = MLP.load(path)
        assert mlp.input_dim == (6 if model == "nn_mlp" else 5)
