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


def test_export_pytorch_roundtrip(tmp_path):
    """A PyTorch checkpoint converted by scripts/export_pytorch.py loads
    with nn_core.MLP and reproduces the torch forward pass — weights
    trained in the reference's PyTorch ecosystem are certified equivalent
    here (reference scripts/export_pytorch.py:1-133)."""
    torch = pytest.importorskip("torch")
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    import export_pytorch

    torch.manual_seed(0)
    model = torch.nn.Sequential(
        torch.nn.Linear(5, 16), torch.nn.Tanh(),
        torch.nn.Linear(16, 16), torch.nn.Tanh(),
        torch.nn.Linear(16, 4))
    ckpt = tmp_path / "model.pth"
    torch.save(model.state_dict(), str(ckpt))

    out = tmp_path / "exported"
    export_pytorch.export(str(ckpt), str(out))
    mlp = MLP.load(str(out))
    assert mlp.input_dim == 5 and mlp.output_dim == 4
    assert mlp.activations == ["tanh", "tanh", "linear"]

    x = np.random.default_rng(3).standard_normal((32, 5)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(x)).numpy()
    got = np.asarray(mlp(x))
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-5)


def _write_mcconkey_fixture(d, n=64):
    """Synthetic komega.csv / REF.csv in the McConkey schema."""
    rng = np.random.default_rng(0)
    a = rng.standard_normal(n)
    b = rng.standard_normal(n)
    k = np.abs(rng.standard_normal(n)) + 0.5
    eps = np.abs(rng.standard_normal(n)) + 0.5
    case = ["fp_1200"] * (n // 2) + ["case_0p5"] * (n - n // 2)

    def csv(path, cols):
        names = list(cols)
        with open(path, "w") as fh:
            fh.write(",".join(names) + "\n")
            for i in range(n):
                fh.write(",".join(
                    cols[c][i] if c == "Case" else f"{cols[c][i]:.10e}"
                    for c in names) + "\n")

    zeros = np.zeros(n)
    csv(d / "komega.csv", {
        "Case": case,
        # pure 2-D: S symmetric (shear a), R antisymmetric (rate b)
        "komega_S_11": zeros, "komega_S_12": a, "komega_S_13": zeros,
        "komega_S_22": zeros, "komega_S_23": zeros, "komega_S_33": zeros,
        "komega_R_11": zeros, "komega_R_12": b, "komega_R_13": zeros,
        "komega_R_21": -b, "komega_R_22": zeros, "komega_R_23": zeros,
        "komega_R_31": zeros, "komega_R_32": zeros, "komega_R_33": zeros,
        "komega_k": k, "komega_epsilon": eps,
    })
    csv(d / "REF.csv", {
        "Case": case,
        "REF_b_11": 0.1 * a, "REF_b_12": 0.05 * b, "REF_b_22": -0.1 * a,
    })
    return a, b, k, eps


def test_preprocess_mcconkey_pipeline(tmp_path):
    """The rebuilt preprocessing chain (scripts/preprocess_mcconkey_csv
    .py, reference :1-220) produces the NPZ schema the trainers consume,
    with invariants/basis matching the analytic values for a pure-shear
    2-D state: S=[[0,a],[a,0]], O=[[0,b],[-b,0]], time scale k/eps ->
    inv = (2a'^2, -2b'^2, 0, 0, -2a'^2 b'^2) for the normalized a',b'."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    import preprocess_mcconkey_csv as pp

    a, b, k, eps = _write_mcconkey_fixture(tmp_path)
    rans = pp.read_csv_columns(str(tmp_path / "komega.csv"))
    ref = pp.read_csv_columns(str(tmp_path / "REF.csv"))
    out = tmp_path / "processed" / "channel" / "train" / "data.npz"
    assert pp.process_case(rans, ref, "fp_", str(out))
    data = np.load(str(out))
    n = (len(a) // 2)
    assert data["invariants"].shape == (n, 5)
    assert data["basis"].shape == (n, 4, 3)
    assert data["anisotropy"].shape == (n, 3)

    tt = (k / eps)[:n]
    ah, bh = a[:n] * tt, b[:n] * tt
    inv = data["invariants"]
    np.testing.assert_allclose(inv[:, 0], 2 * ah**2, rtol=1e-5)
    np.testing.assert_allclose(inv[:, 1], -2 * bh**2, rtol=1e-5)
    np.testing.assert_allclose(inv[:, 2], 0.0, atol=1e-6)
    np.testing.assert_allclose(inv[:, 3], 0.0, atol=1e-6)
    np.testing.assert_allclose(inv[:, 4], -2 * ah**2 * bh**2, rtol=1e-5)
    # basis: T1 = S-hat; T2 = SO-OS = [[-2ab, 0], [0, 2ab]] normalized
    np.testing.assert_allclose(data["basis"][:, 0, 1], ah, rtol=1e-5)
    np.testing.assert_allclose(data["basis"][:, 1, 0], -2 * ah * bh,
                               rtol=1e-5)
    # labels pass through
    np.testing.assert_allclose(data["anisotropy"][:, 0], 0.1 * a[:n],
                               rtol=1e-5)


def test_sst_distilled_preset_runs_channel(record_qoi):
    """The mlp_channel_sst preset (trained on physical solver data by
    scripts/distill_sst_channel.py, hold-out R^2 in metadata) must load,
    run the Re_tau=180 channel stably, and produce an eddy viscosity of
    the SST magnitude it was distilled from."""
    import json
    import os

    import jax.numpy as jnp

    from cfdnn_tpu import Config, Simulation, init_poiseuille
    from cfdnn_tpu.config import TurbulenceModel

    root = os.path.join(os.path.dirname(__file__), "..")
    preset = os.path.join(root, "data", "models", "mlp_channel_sst")
    meta = json.load(open(os.path.join(preset, "metadata.json")))
    assert meta["training"]["holdout_r2"] > 0.95

    cfg = Config(Nx=4, Ny=96, Nz=1,
                 nu=1.0 / 180.0, nu_specified=True,
                 dp_dx=-1.0, dp_dx_specified=True,
                 dt=1e-3, adaptive_dt=True, CFL_max=0.5,
                 dtype="float64", turb_model=TurbulenceModel.NN_MLP,
                 nn_weights_path=preset)
    sim = Simulation(cfg)
    state = sim.initialize(init_poiseuille(cfg, sim.mesh, fraction=0.05))
    for _ in range(10):
        state, d = sim.run(state, 200)
        assert np.isfinite(float(d.ke))
    nut = sim.turb.nu_t(state, sim)
    peak_plus = float(jnp.max(nut)) * 180.0
    record_qoi("mlp_sst_preset_nut_peak_plus", peak_plus)
    # SST channel peak nu_t+ sits in 10-40 (test_rans_accuracy gate)
    assert 5.0 < peak_plus < 60.0, peak_plus


def test_earsm_distilled_tbnn_preset_runs_channel(record_qoi):
    """The tbnn_channel_earsm preset (physical EARSM-WJ anisotropy labels,
    scripts/distill_earsm_channel.py) must load, run the Re_tau=180
    channel stably under the full TBNN pipeline (invariants -> G_n ->
    b_ij -> tau_ij, nu_t), and reproduce the log-layer anisotropy sign
    (b_xy < 0 where dU/dy > 0)."""
    import json
    import os

    import jax.numpy as jnp

    from cfdnn_tpu import Config, Simulation, init_poiseuille
    from cfdnn_tpu.config import TurbulenceModel

    root = os.path.join(os.path.dirname(__file__), "..")
    preset = os.path.join(root, "data", "models", "tbnn_channel_earsm")
    meta = json.load(open(os.path.join(preset, "metadata.json")))
    assert meta["training"]["holdout_r2"] > 0.9

    cfg = Config(Nx=4, Ny=96, Nz=1,
                 nu=1.0 / 180.0, nu_specified=True,
                 dp_dx=-1.0, dp_dx_specified=True,
                 dt=1e-3, adaptive_dt=True, CFL_max=0.5,
                 dtype="float64", turb_model=TurbulenceModel.NN_TBNN,
                 nn_weights_path=preset)
    sim = Simulation(cfg)
    state = sim.initialize(init_poiseuille(cfg, sim.mesh, fraction=0.05))
    for _ in range(10):
        state, d = sim.run(state, 200)
        assert np.isfinite(float(d.ke))
    t_xx, t_xy, t_yy = sim.turb.reynolds_stresses(state, sim)
    # log/outer band of the lower half (y in [-0.75, -0.25]): dU/dy > 0
    # => modeled shear stress < 0. The viscous sublayer is excluded —
    # the trained map extrapolates there (near-wall states in-solver
    # drift from the EARSM training trajectory), same caveat as the
    # reference's a-priori-trained models.
    y = np.asarray(sim.mesh.y.centers)
    band = (y > -0.75) & (y < -0.25)
    txy_prof = np.asarray(t_xy).mean(axis=(0, 2))[band]
    record_qoi("tbnn_earsm_preset_txy_band_mean", float(txy_prof.mean()))
    # the rolled-out state carries local wiggles (a-priori-trained model
    # in closed loop), so gate the bulk: strongly negative band mean and
    # a dominantly negative profile
    assert txy_prof.mean() < -0.05, txy_prof.mean()
    assert (txy_prof < 0).mean() > 0.85, txy_prof
    nut = sim.turb.nu_t(state, sim)
    # Gate the BAND MEAN nu_t+, not the peak: the TBNN nu_t is clipped
    # to 10*nu (reference parity, turbulence_nn_tbnn.cpp:860), so
    # max(nut)*180 saturates at exactly 10.0 for any preset whose raw
    # peak exceeds the ceiling — a peak QOI validates the clip constant,
    # not the trained map. The band mean still moves with the preset
    # through its sub-ceiling fraction. (The closure's actual stress is
    # the UNCLIPPED tau_ij path gated above; nu_t is the stabilizing
    # isotropic proxy.) The ceiling fraction is tracked, not gated: at
    # Re_tau=180 the physical log-layer nu_t+ is O(20), so the
    # reference's own 10*nu ceiling binds over much of the band.
    nut_prof = np.asarray(nut).mean(axis=(0, 2))[band]
    nut_band_plus = float(nut_prof.mean()) * 180.0
    record_qoi("tbnn_earsm_preset_nut_band_plus", nut_band_plus)
    assert 0.5 < nut_band_plus < 9.9, nut_band_plus
    record_qoi("tbnn_earsm_preset_nut_clip_frac",
               float((nut_prof * 180.0 > 9.99).mean()))


def test_validate_trained_model_script(tmp_path):
    """scripts/validate_trained_model.py a-priori gates (reference
    scripts/validate_trained_model.py): a model trained on the dataset
    scores near-perfect R^2 on a holdout of it; identity-weight junk
    fails the same gate."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    import validate_trained_model as vtm

    d = synthetic_channel_dataset(n=4000, seed=3)
    mlp, _ = train_mlp(d["features"], d["nu_t"], hidden=[32],
                       epochs=120, batch=512)
    hold = synthetic_channel_dataset(n=2000, seed=4)
    res = vtm.validate_mlp(mlp, {"features": hold["features"],
                                 "nu_t": hold["nu_t"]})
    assert res["r2"] > 0.8, res

    tb, _ = train_tbnn(d["invariants"], d["basis"], d["b"],
                       hidden=[32, 32], epochs=120, batch=512)
    res_tb = vtm.validate_tbnn(tb, {"invariants": hold["invariants"],
                                    "basis": hold["basis"],
                                    "b": hold["b"]})
    assert res_tb["r2"] > 0.5, res_tb
    assert set(res_tb["component_rmse"]) == {"b_xx", "b_xy", "b_yy"}

    # a random-weight model must NOT pass the same gate
    import jax
    junk = MLP.from_dims([6, 8, 1], key=jax.random.PRNGKey(9))
    res_junk = vtm.validate_mlp(junk, {"features": hold["features"],
                                       "nu_t": hold["nu_t"]})
    assert res_junk["r2"] < 0.5


def test_fix_normalization_stats_script(tmp_path):
    """scripts/fix_normalization_stats.py detects and repairs degenerate
    scaling (reference scripts/fix_normalization_stats.py)."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    import fix_normalization_stats as fns

    means = np.array([0.0, 1.0, np.nan])
    stds = np.array([1.0, 0.0, 2.0])
    issues = fns.check(means, stds)
    assert any("non-finite" in s for s in issues)
    assert any("zero stds" in s for s in issues)
    assert fns.check(np.zeros(3), np.ones(3)) == []


def test_safe_extract_blocks_traversal(tmp_path):
    """scripts/safe_extract.py (reference scripts/safe_extract.py Zip
    Slip protection): benign archives extract; entries escaping the
    output dir are refused for both zip and tar."""
    import os
    import sys
    import tarfile
    import zipfile

    import pytest

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    from safe_extract import safe_extract

    # benign zip round-trips
    z = tmp_path / "ok.zip"
    with zipfile.ZipFile(z, "w") as zf:
        zf.writestr("a/b.txt", "hello")
    out = tmp_path / "out"
    assert safe_extract(z, out, verbose=False) == 1
    assert (out / "a" / "b.txt").read_text() == "hello"

    # zip-slip entry refused
    evil = tmp_path / "evil.zip"
    with zipfile.ZipFile(evil, "w") as zf:
        zf.writestr("../escape.txt", "boom")
    with pytest.raises(RuntimeError, match="unsafe"):
        safe_extract(evil, tmp_path / "out2", verbose=False)
    assert not (tmp_path / "escape.txt").exists()

    # tar with an absolute symlink refused
    t = tmp_path / "evil.tar"
    with tarfile.open(t, "w") as tf:
        info = tarfile.TarInfo("link")
        info.type = tarfile.SYMTYPE
        info.linkname = "/etc/passwd"
        tf.addfile(info)
    with pytest.raises(RuntimeError, match="unsafe"):
        safe_extract(t, tmp_path / "out3", verbose=False)

    # tar HARDLINK whose target resolves relative to the extraction ROOT
    # (tarfile semantics) — 'a/b/c' -> '../secret' escapes even though it
    # would be inside out_dir if resolved against the member's parent
    secret = tmp_path / "secret.txt"
    secret.write_text("SECRET")
    t2 = tmp_path / "evil_hardlink.tar"
    with tarfile.open(t2, "w") as tf:
        for d in ("a", "a/b"):
            info = tarfile.TarInfo(d)
            info.type = tarfile.DIRTYPE
            tf.addfile(info)
        info = tarfile.TarInfo("a/b/c")
        info.type = tarfile.LNKTYPE
        info.linkname = "../secret.txt"
        tf.addfile(info)
    out4 = tmp_path / "out4"
    with pytest.raises(RuntimeError, match="unsafe"):
        safe_extract(t2, out4, verbose=False)
    assert not (out4 / "a" / "b" / "c").exists()

    # tar with a FIFO / device member refused
    t3 = tmp_path / "evil_fifo.tar"
    with tarfile.open(t3, "w") as tf:
        info = tarfile.TarInfo("pipe")
        info.type = tarfile.FIFOTYPE
        tf.addfile(info)
    with pytest.raises(RuntimeError, match="unsupported special"):
        safe_extract(t3, tmp_path / "out5", verbose=False)


def test_dns_preset_runs_channel(record_qoi):
    """The mlp_channel_dns180 preset — the DNS-provenance model
    (labels nu_t(y) = -<u'v'>/(dU/dy) from this solver's trip-forced
    Re_tau=180 DNS, a-posteriori fine-tuned through the differentiable
    solver; scripts/distill_dns_channel.py) — must load, run the channel
    stably from a laminar IC, and hold a DNS-magnitude eddy viscosity.
    The full steady closed-loop gate (Re_tau 187.7, mean-profile relL2
    0.022 vs DNS) runs in the training script; this is its fast-tier
    smoke. Reference provenance analogue: the McConkey-DNS presets
    (data/models/README.md:17-23)."""
    import json
    import os

    import jax.numpy as jnp

    from cfdnn_tpu import Config, Simulation, init_poiseuille
    from cfdnn_tpu.config import TurbulenceModel

    root = os.path.join(os.path.dirname(__file__), "..")
    preset = os.path.join(root, "data", "models", "mlp_channel_dns180")
    meta = json.load(open(os.path.join(preset, "metadata.json")))
    assert meta["training"]["provenance"] == "dns"
    assert meta["training"]["holdout_r2"] > 0.95
    assert meta["training"]["closed_loop"]["mean_profile_relL2"] < 0.15
    ft = meta["training"]["aposteriori_finetune"]
    assert ft["loss_end"] < ft["loss_start"]

    delta = 1.0
    cfg = Config(Nx=4, Ny=96, Nz=1,
                 y_min=-delta, y_max=delta,
                 stretch_y=True, stretch_beta=1.8,
                 nu=1.0 / 180.0, nu_specified=True,
                 dp_dx=-1.0, dp_dx_specified=True,
                 dt=1e-3, adaptive_dt=True, CFL_max=0.5,
                 dtype="float64", turb_model=TurbulenceModel.NN_MLP,
                 nn_weights_path=preset)
    sim = Simulation(cfg)
    state = sim.initialize(init_poiseuille(cfg, sim.mesh, fraction=0.05))
    for _ in range(10):
        state, d = sim.run(state, 200)
        assert np.isfinite(float(d.ke))
    nut = sim.turb.nu_t(state, sim)
    peak_plus = float(jnp.max(nut)) * 180.0
    record_qoi("mlp_dns_preset_nut_peak_plus", peak_plus)
    # DNS-label peak nu_t/nu ~ 12.9 (data/dns/channel_retau180.npz)
    assert 4.0 < peak_plus < 40.0, peak_plus


def test_tbnn_dns_preset_runs_channel(record_qoi):
    """The tbnn_channel_dns180 preset — DNS-provenance TBNN (round 5:
    deviatoric diagonal from the DNS anisotropy + the dynamically-
    active b_xy by field inversion at the 10-nu-cap-achievable target
    state, a-posteriori stage through ml/adjoint.fit_closure with
    from-laminar probe selection; scripts/distill_dns_channel.py
    --tbnn-finetune-existing) — must load, run the channel stably, and
    hold a bounded eddy viscosity. Full steady closed-loop gate
    (Re_tau 180.8, relL2 0.080 — the cap-floor is 0.054) runs in the
    training script."""
    import json
    import os

    import jax.numpy as jnp

    from cfdnn_tpu import Config, Simulation, init_poiseuille
    from cfdnn_tpu.config import TurbulenceModel

    root = os.path.join(os.path.dirname(__file__), "..")
    preset = os.path.join(root, "data", "models", "tbnn_channel_dns180")
    meta = json.load(open(os.path.join(preset, "metadata.json")))
    assert meta["training"]["provenance"] == "dns"
    assert meta["training"]["holdout_r2"] > 0.85
    # round-4 verdict #3: gate tightened 0.35 -> 0.12 after the
    # inversion + a-posteriori pipeline landed relL2 = 0.080
    assert meta["training"]["closed_loop"]["mean_profile_relL2"] < 0.12
    ft = meta["training"]["aposteriori_finetune"]
    assert ft["loss_end"] < ft["loss_start"]
    assert ft["selected"] in ("inversion", "polished")

    delta = 1.0
    cfg = Config(Nx=4, Ny=96, Nz=1,
                 y_min=-delta, y_max=delta,
                 stretch_y=True, stretch_beta=1.8,
                 nu=1.0 / 180.0, nu_specified=True,
                 dp_dx=-1.0, dp_dx_specified=True,
                 dt=1e-3, adaptive_dt=True, CFL_max=0.5,
                 dtype="float64", turb_model=TurbulenceModel.NN_TBNN,
                 nn_weights_path=preset)
    sim = Simulation(cfg)
    state = sim.initialize(init_poiseuille(cfg, sim.mesh, fraction=0.05))
    for _ in range(10):
        state, d = sim.run(state, 200)
        assert np.isfinite(float(d.ke))
    nut = sim.turb.nu_t(state, sim)
    peak_plus = float(jnp.max(nut)) * 180.0
    record_qoi("tbnn_dns_preset_nut_peak_plus", peak_plus)
    # The TBNN nu_t extraction caps at 10 nu (reference parity), so a
    # `peak <= 10` upper bound could never fail — assert instead on the
    # saturation FRACTION of the mean profile (advisor round 4: the
    # preset was riding the cap and the old gate was vacuous there) and
    # keep the physical lower bound. Near-wall cells must be far below
    # the cap (nu_t -> 0 at the wall), so full-profile saturation means
    # a broken extraction, not strong turbulence.
    assert peak_plus > 0.5, peak_plus
    nut_prof = np.asarray(nut).mean(axis=(0, 2))
    clip_frac = float((nut_prof * 180.0 > 9.99).mean())
    record_qoi("tbnn_dns_preset_nut_clip_frac", clip_frac)
    assert clip_frac < 0.6, clip_frac
