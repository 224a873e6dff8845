#!/usr/bin/env python
"""Train a TBNN anisotropy model and export solver-loadable weights.

Reference-parity CLI for scripts/train_tbnn_mcconkey.py (TBNNModel
5->[64,64,64]->4 with the tensor-basis loss b_pred = einsum(G, T)).

  python scripts/train_tbnn.py --out data/models/tbnn_synthetic
"""

import argparse
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--npz", default=None,
                    help="npz with invariants (N,5), basis (N,4,3), b (N,3)")
    ap.add_argument("--out", default="data/models/tbnn_synthetic")
    ap.add_argument("--hidden", type=int, nargs="+", default=[64, 64, 64])
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--n-synth", type=int, default=20000)
    args = ap.parse_args()

    from cfdnn_tpu.ml.training import synthetic_channel_dataset, train_tbnn

    if args.npz:
        d = np.load(args.npz)
        # preprocess_mcconkey_csv.py writes the labels as "anisotropy"
        inv, basis = d["invariants"], d["basis"]
        b = d["anisotropy"] if "anisotropy" in d else d["b"]
    else:
        data = synthetic_channel_dataset(args.n_synth)
        inv, basis, b = data["invariants"], data["basis"], data["b"]

    mlp, hist = train_tbnn(inv, basis, b, hidden=args.hidden,
                           epochs=args.epochs, batch=args.batch,
                           lr=args.lr, log=True)
    mlp.save(args.out, metadata={
        "name": args.out.split("/")[-1],
        "type": "nn_tbnn",
        "description": "TBNN anisotropy model (cfdnn_tpu trainer)",
        "final_loss": hist[-1],
        "features": {"type": "tbnn_invariants_v1"},
    })
    print(f"saved model to {args.out} (final loss {hist[-1]:.3e})")


if __name__ == "__main__":
    main()
