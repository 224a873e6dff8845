#!/usr/bin/env python
"""Validate a model directory's weight files (reference:
scripts/validate_model_files.py): shapes chain, scaling sizes, finite
values, forward-pass smoke."""

import sys

sys.path.insert(0, ".")

import numpy as np


def validate(path: str) -> bool:
    import jax.numpy as jnp
    from cfdnn_tpu.turbulence.nn_core import MLP
    ok = True
    try:
        mlp = MLP.load(path)
    except Exception as e:
        print(f"FAIL: cannot load {path}: {e}")
        return False
    for i, (W, b) in enumerate(zip(mlp.Ws, mlp.bs)):
        if not (np.all(np.isfinite(W)) and np.all(np.isfinite(b))):
            print(f"FAIL: layer {i} has non-finite values")
            ok = False
        if i > 0 and W.shape[1] != mlp.Ws[i - 1].shape[0]:
            print(f"FAIL: layer {i} in_dim {W.shape[1]} != "
                  f"layer {i-1} out_dim {mlp.Ws[i-1].shape[0]}")
            ok = False
    if mlp.means is not None and mlp.means.shape[0] != mlp.input_dim:
        print("FAIL: scaling size mismatch")
        ok = False
    y = mlp(jnp.ones((4, mlp.input_dim)))
    if not np.all(np.isfinite(np.asarray(y))):
        print("FAIL: forward pass produced non-finite output")
        ok = False
    if ok:
        print(f"OK: {path} ({mlp.input_dim} -> {mlp.output_dim}, "
              f"{len(mlp.Ws)} layers)")
    return ok


if __name__ == "__main__":
    if len(sys.argv) > 1:
        paths = sys.argv[1:]
    else:
        # default: every preset in the shipped zoo
        import glob
        import os
        paths = sorted(
            d for d in glob.glob("data/models/*") if os.path.isdir(d)
        )
    sys.exit(0 if paths and all(validate(p) for p in paths) else 1)
