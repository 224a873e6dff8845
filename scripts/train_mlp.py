#!/usr/bin/env python
"""Train a scalar-eddy-viscosity MLP and export solver-loadable weights.

Reference-parity CLI for scripts/train_mlp_mcconkey.py: reads a CSV with
feature columns + nu_t label (or generates the synthetic channel dataset),
trains with optax, writes layer*_W.txt / layer*_b.txt / input_{means,stds}
.txt / metadata.json under data/models/<name>/.

  python scripts/train_mlp.py --out data/models/mlp_synthetic --epochs 100
  python scripts/train_mlp.py --csv mydata.csv --label nu_t
"""

import argparse
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--csv", default=None, help="CSV with features + label")
    ap.add_argument("--label", default="nu_t")
    ap.add_argument("--out", default="data/models/mlp_synthetic")
    ap.add_argument("--hidden", type=int, nargs="+", default=[32, 32])
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--n-synth", type=int, default=20000)
    args = ap.parse_args()

    from cfdnn_tpu.ml.training import synthetic_channel_dataset, train_mlp
    from scripts.preprocess_csv import load_feature_csv

    if args.csv:
        X, y = load_feature_csv(args.csv, args.label)
    else:
        data = synthetic_channel_dataset(args.n_synth)
        X, y = data["features"], data["nu_t"]

    mlp, hist = train_mlp(X, y, hidden=args.hidden, epochs=args.epochs,
                          batch=args.batch, lr=args.lr, log=True)
    mlp.save(args.out, metadata={
        "name": args.out.split("/")[-1],
        "type": "nn_mlp",
        "description": "scalar eddy-viscosity MLP (cfdnn_tpu trainer)",
        "final_loss": hist[-1],
        "features": {"type": "scalar_nut_v1"},
    })
    print(f"saved model to {args.out} (final loss {hist[-1]:.3e})")


if __name__ == "__main__":
    main()
