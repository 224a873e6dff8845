#!/usr/bin/env python
"""Generate small random-weight NN models for testing (reference:
scripts/generate_dummy_weights.py)."""

import argparse
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data/models")
    args = ap.parse_args()
    import jax
    import jax.numpy as jnp
    from cfdnn_tpu.turbulence.nn_core import MLP

    for name, dims in (("mlp_dummy", [6, 16, 1]), ("tbnn_dummy", [5, 16, 4])):
        mlp = MLP.from_dims(dims, key=jax.random.PRNGKey(42))
        mlp.Ws[-1] = 0.01 * mlp.Ws[-1]
        mlp.means = jnp.zeros((dims[0],))
        mlp.stds = jnp.ones((dims[0],))
        path = f"{args.out}/{name}"
        mlp.save(path, metadata={"name": name, "type": "dummy"})
        print("wrote", path)


if __name__ == "__main__":
    main()
