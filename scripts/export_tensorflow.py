#!/usr/bin/env python
"""Convert a TensorFlow/Keras model into the text weight format consumed
by cfdnn_tpu.turbulence.nn_core.MLP.load (reference ecosystem format —
reference scripts/export_tensorflow.py, data/models/README.md:17-23).

    python scripts/export_tensorflow.py model.keras -o data/models/imported

TensorFlow is not part of the pinned environment; the script degrades
with a clear message when it is absent (weights trained in TF ecosystems
are converted wherever TF is installed — the output directory is plain
text and portable).
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_KERAS_ACT = {"tanh": "tanh", "relu": "relu", "sigmoid": "sigmoid",
              "swish": "swish", "gelu": "gelu", "linear": "linear",
              None: "linear"}


def export(model_path, out_dir, means_path=None, stds_path=None):
    try:
        import tensorflow as tf  # noqa: F401
    except ImportError:
        raise SystemExit(
            "tensorflow is not installed in this environment. Run this "
            "converter where TF is available; the text output it writes "
            "is portable and loads here with nn_core.MLP.load.")
    from tensorflow import keras

    model = keras.models.load_model(model_path)
    os.makedirs(out_dir, exist_ok=True)
    sizes, acts = None, []
    i = 0
    for layer in model.layers:
        if not isinstance(layer, keras.layers.Dense):
            continue
        W, b = layer.get_weights()      # keras: (in, out) — transpose
        W = W.T
        np.savetxt(os.path.join(out_dir, f"layer{i}_W.txt"), W,
                   fmt="%.16e")
        np.savetxt(os.path.join(out_dir, f"layer{i}_b.txt"), b,
                   fmt="%.16e")
        if sizes is None:
            sizes = [W.shape[1]]
        sizes.append(W.shape[0])
        act = getattr(layer.activation, "__name__", "linear")
        acts.append(_KERAS_ACT.get(act, act))
        print(f"layer{i}: {layer.name} {W.shape} act={acts[-1]}")
        i += 1
    if i == 0:
        raise SystemExit("no Dense layers found")

    n_in = sizes[0]
    for name, path in (("input_means.txt", means_path),
                       ("input_stds.txt", stds_path)):
        arr = (np.loadtxt(path).reshape(-1) if path
               else (np.zeros(n_in) if "means" in name else np.ones(n_in)))
        np.savetxt(os.path.join(out_dir, name), arr, fmt="%.16e")

    meta = {
        "name": os.path.basename(out_dir.rstrip("/")),
        "source": f"tensorflow:{os.path.basename(model_path)}",
        "architecture": {"layers": sizes, "activations": acts},
    }
    with open(os.path.join(out_dir, "metadata.json"), "w") as fh:
        json.dump(meta, fh, indent=2)
    print(f"exported {i} layers -> {out_dir}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model")
    ap.add_argument("-o", "--output", required=True)
    ap.add_argument("--means")
    ap.add_argument("--stds")
    args = ap.parse_args()
    export(args.model, args.output, args.means, args.stds)


if __name__ == "__main__":
    main()
