#!/usr/bin/env python
"""A-priori validation of a trained closure model against test data
(reference: scripts/validate_trained_model.py — compares NN predictions
with DNS/LES ground truth WITHOUT running the full CFD solver).

  # TBNN: npz with invariants (N,5), basis (N,4,3), anisotropy|b (N,3)
  python scripts/validate_trained_model.py --model data/models/tbnn_x \
      --test_data mcconkey_processed/<case>/train/data.npz

  # scalar-nu_t MLP: npz with features (N,6), nu_t (N,)
  python scripts/validate_trained_model.py --model data/models/mlp_x \
      --test_data holdout.npz

  # no --test_data: evaluates on a synthetic-channel holdout split
  python scripts/validate_trained_model.py --model data/models/mlp_x

Prints MSE/MAE/RMSE (+ per-component RMSE and G-coefficient stats for
TBNN), R^2, and machine-readable QOI_JSON lines; exits nonzero if R^2
falls below --min_r2. 3-D datasets are reduced like the reference does:
6-component anisotropy -> (b_xx, b_xy, b_yy), 10-tensor basis -> T1..T4.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _load_labels(d, *names):
    for n in names:
        if n in d:
            return np.asarray(d[n])
    raise KeyError(f"test data has none of {names} (keys: {list(d)})")


def _r2(pred, truth):
    ss_res = float(np.sum((pred - truth) ** 2))
    ss_tot = float(np.sum((truth - truth.mean()) ** 2))
    return 1.0 - ss_res / max(ss_tot, 1e-300)


def validate_tbnn(mlp, data):
    inv = np.asarray(data["invariants"], np.float64)
    b_true = _load_labels(data, "anisotropy", "b")
    if b_true.shape[1] == 6:               # 3-D labels -> 2-D components
        b_true = b_true[:, [0, 1, 3]]      # b_xx, b_xy, b_yy
    basis = np.asarray(data["basis"], np.float64)
    if basis.shape[1] == 10:               # Pope 10-basis -> 2-D T1..T4
        basis = basis[:, :4, :]
    if basis.shape[2] == 6:                # 3-D tensor components ->
        basis = basis[:, :, [0, 1, 3]]     # (T_xx, T_xy, T_yy)
    G = np.asarray(mlp(inv.astype(np.float32)), np.float64)   # (N, 4)
    b_pred = np.einsum("bn,bnc->bc", G, basis)
    err = b_pred - b_true
    comp = np.sqrt(np.mean(err**2, axis=0))
    return {
        "mse": float(np.mean(err**2)),
        "mae": float(np.mean(np.abs(err))),
        "rmse": float(np.sqrt(np.mean(err**2))),
        "r2": _r2(b_pred, b_true),
        "component_rmse": {"b_xx": float(comp[0]), "b_xy": float(comp[1]),
                           "b_yy": float(comp[2])},
        "G_mean": [float(g) for g in G.mean(axis=0)],
        "G_std": [float(g) for g in G.std(axis=0)],
    }


def validate_mlp(mlp, data):
    X = np.asarray(_load_labels(data, "features", "invariants"), np.float64)
    y_true = _load_labels(data, "nu_t", "labels", "y").reshape(-1)
    y_pred = np.asarray(mlp(X.astype(np.float32)), np.float64).reshape(-1)
    err = y_pred - y_true
    return {
        "mse": float(np.mean(err**2)),
        "mae": float(np.mean(np.abs(err))),
        "rmse": float(np.sqrt(np.mean(err**2))),
        "r2": _r2(y_pred, y_true),
        "rel_l2": float(np.linalg.norm(err) /
                        max(np.linalg.norm(y_true), 1e-300)),
    }


def _synthetic_holdout(model_type, n=5000):
    from cfdnn_tpu.ml.training import synthetic_channel_dataset
    d = synthetic_channel_dataset(n, seed=1)   # seed != trainer default
    if model_type == "nn_tbnn":
        return {"invariants": d["invariants"], "basis": d["basis"],
                "b": d["b"]}
    return {"features": d["features"], "nu_t": d["nu_t"]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True,
                    help="model directory (layer*_W.txt format)")
    ap.add_argument("--test_data", default=None,
                    help=".npz test set; default: synthetic holdout")
    ap.add_argument("--min_r2", type=float, default=None,
                    help="fail (exit 1) if R^2 < this")
    args = ap.parse_args()

    from cfdnn_tpu.turbulence.nn_core import MLP
    mlp = MLP.load(args.model)

    meta_path = os.path.join(args.model, "metadata.json")
    model_type = None
    if os.path.exists(meta_path):
        model_type = json.load(open(meta_path)).get("type")
    if model_type is None:                 # infer from the head width
        model_type = "nn_tbnn" if mlp.output_dim == 4 else "nn_mlp"

    if args.test_data:
        data = np.load(args.test_data)
    else:
        print("no --test_data: using a synthetic-channel holdout")
        data = _synthetic_holdout(model_type)

    name = os.path.basename(os.path.normpath(args.model))
    print(f"model: {name} ({model_type}, "
          f"{mlp.input_dim} -> {mlp.output_dim}, {len(mlp.Ws)} layers)")
    res = (validate_tbnn if model_type == "nn_tbnn" else validate_mlp)(
        mlp, data)

    for k, v in res.items():
        print(f"  {k}: {v}")
    for k in ("mse", "rmse", "r2"):
        print(f'QOI_JSON: {{"name": "apriori_{name}_{k}", '
              f'"value": {res[k]:.6e}}}')
    if args.min_r2 is not None and res["r2"] < args.min_r2:
        print(f"FAIL: R^2 {res['r2']:.4f} < {args.min_r2}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
