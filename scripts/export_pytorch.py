#!/usr/bin/env python
"""Convert a PyTorch checkpoint into the text weight format consumed by
cfdnn_tpu.turbulence.nn_core.MLP.load (the reference ecosystem's format:
layer{i}_W.txt / layer{i}_b.txt / input_means.txt / input_stds.txt /
metadata.json — reference scripts/export_pytorch.py:1-133,
data/models/README.md:17-23). Weights trained in the reference's PyTorch
toolchain load here unchanged.

    python scripts/export_pytorch.py model.pth -o data/models/imported \
        [--means means.txt --stds stds.txt] [--activations tanh,tanh,linear]

After writing, the script reloads the directory with nn_core.MLP and
verifies the JAX forward pass matches the torch model on random inputs
(skipped when the checkpoint is a bare state_dict without module info).
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _layer_sort_key(k):
    """Natural sort: numeric path components compare as integers, so
    '10.weight' sorts AFTER '2.weight' (lexical sort scrambled layer
    order for nn.Sequential modules with >= 10 children)."""
    return [int(p) if p.isdigit() else p for p in k.split(".")]


def state_dict_layers(sd):
    """Ordered (W, b) pairs from a torch state_dict: every '*.weight' 2-D
    tensor, naturally sorted by key, paired with its '*.bias'."""
    pairs = []
    for k in sorted(sd.keys(), key=_layer_sort_key):
        if not k.endswith("weight"):
            continue
        W = sd[k].detach().cpu().numpy()
        if W.ndim != 2:
            continue    # conv/batchnorm etc. — not a dense layer
        bk = k[: -len("weight")] + "bias"
        b = (sd[bk].detach().cpu().numpy() if bk in sd
             else np.zeros(W.shape[0]))
        pairs.append((k, W, b))
    return pairs


def export(model_path, out_dir, means_path=None, stds_path=None,
           activations=None):
    import torch

    blob = torch.load(model_path, map_location="cpu", weights_only=False)
    module = None
    if isinstance(blob, dict):
        sd = blob.get("state_dict", blob)
    else:
        module = blob
        sd = blob.state_dict()

    layers = state_dict_layers(sd)
    if not layers:
        raise SystemExit("no dense (2-D weight) layers found in checkpoint")
    os.makedirs(out_dir, exist_ok=True)
    sizes = [layers[0][1].shape[1]]
    for i, (key, W, b) in enumerate(layers):
        # torch Linear stores (out_features, in_features) — exactly the
        # row-major layout MLP.load expects
        np.savetxt(os.path.join(out_dir, f"layer{i}_W.txt"), W,
                   fmt="%.16e")
        np.savetxt(os.path.join(out_dir, f"layer{i}_b.txt"), b,
                   fmt="%.16e")
        if i > 0 and W.shape[1] != sizes[-1]:
            raise SystemExit(
                f"layer{i} ({key}): input width {W.shape[1]} does not "
                f"chain from the previous layer's output {sizes[-1]} — "
                f"layer ordering or a non-MLP checkpoint")
        sizes.append(W.shape[0])
        print(f"layer{i}: {key} {W.shape}")

    n_in = sizes[0]
    for name, path in (("input_means.txt", means_path),
                       ("input_stds.txt", stds_path)):
        tgt = os.path.join(out_dir, name)
        if path:
            arr = np.loadtxt(path).reshape(-1)
        else:
            arr = np.zeros(n_in) if "means" in name else np.ones(n_in)
        if arr.size != n_in:
            raise SystemExit(f"{name}: {arr.size} values, expected {n_in}")
        np.savetxt(tgt, arr, fmt="%.16e")

    acts = ([a.strip() for a in activations.split(",")] if activations
            else ["tanh"] * (len(layers) - 1) + ["linear"])
    if len(acts) != len(layers):
        raise SystemExit(
            f"--activations lists {len(acts)} entries for {len(layers)} "
            f"layers (MLP.load would reject the metadata)")
    meta = {
        "name": os.path.basename(out_dir.rstrip("/")),
        "source": f"pytorch:{os.path.basename(model_path)}",
        "architecture": {"layers": sizes, "activations": acts},
    }
    with open(os.path.join(out_dir, "metadata.json"), "w") as fh:
        json.dump(meta, fh, indent=2)
    print(f"exported {len(layers)} layers -> {out_dir}")
    return module, sizes, acts


def verify(module, out_dir, n_in):
    """Round-trip check: nn_core forward == torch forward."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import torch

    from cfdnn_tpu.turbulence.nn_core import MLP

    mlp = MLP.load(out_dir)
    x = np.random.default_rng(0).standard_normal((64, n_in)).astype(
        np.float32)
    module.eval()   # train-mode dropout/batchnorm would randomize ref
    with torch.no_grad():
        ref = module(torch.from_numpy(x)).numpy()
    # undo the loader's input normalization for the comparison by feeding
    # pre-normalized features through identity stats written above
    got = np.asarray(mlp(x))
    err = np.max(np.abs(got.reshape(ref.shape) - ref))
    print(f"round-trip max |jax - torch| = {err:.3e}")
    if err > 1e-5:
        raise SystemExit("verification FAILED")
    print("verification ok")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model")
    ap.add_argument("-o", "--output", required=True)
    ap.add_argument("--means")
    ap.add_argument("--stds")
    ap.add_argument("--activations",
                    help="comma list per layer, e.g. tanh,tanh,linear")
    args = ap.parse_args()
    module, sizes, acts = export(args.model, args.output, args.means,
                                 args.stds, args.activations)
    if (module is not None and args.means is None and args.stds is None
            and not any(a not in ("tanh", "linear", "relu")
                        for a in acts)):
        try:
            verify(module, args.output, sizes[0])
        except Exception as e:      # activation mismatch etc.
            print(f"verification skipped: {e}")


if __name__ == "__main__":
    main()
