"""Neural-network inference core: dense MLP with text-weight loading.

TPU-native rebuild of the reference DenseLayer/MLP engine (reference:
include/nn_core.hpp:14-191, src/nn_core.cpp): weights live as jnp arrays and
the batched forward is a chain of (cells, din) @ (din, dout) matmuls on the
MXU — the reference's hand-written layer-by-layer batched GEMV with ping-pong
workspaces (nn_core.hpp forward_batch_gpu) collapses to `x @ W.T + b`.

Weight-file format parity (reference data/models/README.md:17-23,
nn_core.hpp:85-90): a directory with `layer{i}_W.txt` (out_dim rows x in_dim
cols), `layer{i}_b.txt` (one bias per line), `input_means.txt`,
`input_stds.txt`, optional `metadata.json` naming per-layer activations.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _act(name: str) -> Callable:
    """Activation by name (reference nn_core.hpp Activation enum)."""
    name = name.lower()
    if name == "linear":
        return lambda x: x
    if name == "relu":
        return jax.nn.relu
    if name == "tanh":
        return jnp.tanh
    if name == "sigmoid":
        return jax.nn.sigmoid
    if name == "swish":
        return jax.nn.swish
    if name == "gelu":
        return jax.nn.gelu
    raise ValueError(f"unknown activation '{name}'")


@dataclasses.dataclass
class MLP:
    """Stateless MLP: pytree of weights + activation names."""

    Ws: List[jnp.ndarray]          # each (out_dim, in_dim)
    bs: List[jnp.ndarray]          # each (out_dim,)
    activations: List[str]         # one per layer (after the matmul)
    means: Optional[jnp.ndarray] = None
    stds: Optional[jnp.ndarray] = None

    @property
    def input_dim(self) -> int:
        return self.Ws[0].shape[1]

    @property
    def output_dim(self) -> int:
        return self.Ws[-1].shape[0]

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """Batched forward: x (N, input_dim) -> (N, output_dim), z-score
        normalized inputs when scaling is loaded (reference scale_input)."""
        if self.means is not None:
            x = (x - self.means) / self.stds
        for W, b, act in zip(self.Ws, self.bs, self.activations):
            x = _act(act)(x @ W.T + b)
        return x

    # -- loading ----------------------------------------------------------

    @classmethod
    def load(cls, directory: str, dtype=jnp.float32) -> "MLP":
        """Load `layer*_W.txt`/`layer*_b.txt` (+ scaling, metadata)."""
        Ws, bs = [], []
        i = 0
        while os.path.exists(os.path.join(directory, f"layer{i}_W.txt")):
            W = np.loadtxt(os.path.join(directory, f"layer{i}_W.txt"), ndmin=2)
            b = np.loadtxt(os.path.join(directory, f"layer{i}_b.txt"), ndmin=1)
            if W.shape[0] != b.shape[0]:
                raise ValueError(
                    f"layer{i}: W rows {W.shape[0]} != b size {b.shape[0]}")
            Ws.append(jnp.asarray(W, dtype))
            bs.append(jnp.asarray(b, dtype))
            i += 1
        if not Ws:
            raise FileNotFoundError(f"no layer0_W.txt under {directory}")
        # activations: metadata.json if present, else tanh hidden + linear out
        acts = ["tanh"] * (len(Ws) - 1) + ["linear"]
        meta_path = os.path.join(directory, "metadata.json")
        if os.path.exists(meta_path):
            with open(meta_path) as fh:
                meta = json.load(fh)
            listed = meta.get("architecture", {}).get("activations")
            if listed:
                acts = [str(a).lower() for a in listed]
                if len(acts) < len(Ws):
                    acts = acts + ["linear"] * (len(Ws) - len(acts))
                elif len(acts) > len(Ws):
                    # a silent zip-truncation would hand the OUTPUT layer
                    # the preceding hidden activation (e.g. an export
                    # listing an input-layer placeholder)
                    raise ValueError(
                        f"metadata lists {len(acts)} activations for "
                        f"{len(Ws)} layers under {directory}")
        means = stds = None
        mpath = os.path.join(directory, "input_means.txt")
        spath = os.path.join(directory, "input_stds.txt")
        if os.path.exists(mpath) and os.path.exists(spath):
            means = jnp.asarray(np.loadtxt(mpath, ndmin=1), dtype)
            stds_np = np.loadtxt(spath, ndmin=1)
            stds = jnp.asarray(np.where(np.abs(stds_np) < 1e-12, 1.0, stds_np),
                               dtype)
        return cls(Ws=Ws, bs=bs, activations=acts, means=means, stds=stds)

    @classmethod
    def from_dims(cls, dims: Sequence[int], hidden_act: str = "tanh",
                  key=None, dtype=jnp.float32) -> "MLP":
        """Random-init MLP (Glorot) for tests/training (reference MLP(dims))."""
        key = key if key is not None else jax.random.PRNGKey(0)
        Ws, bs = [], []
        for din, dout in zip(dims[:-1], dims[1:]):
            key, sub = jax.random.split(key)
            scale = np.sqrt(2.0 / (din + dout))
            Ws.append(scale * jax.random.normal(sub, (dout, din), dtype))
            bs.append(jnp.zeros((dout,), dtype))
        acts = [hidden_act] * (len(Ws) - 1) + ["linear"]
        return cls(Ws=Ws, bs=bs, activations=acts)

    def save(self, directory: str, metadata: Optional[dict] = None):
        """Write the reference's text format (data/models/README.md:17-23)."""
        os.makedirs(directory, exist_ok=True)
        for i, (W, b) in enumerate(zip(self.Ws, self.bs)):
            np.savetxt(os.path.join(directory, f"layer{i}_W.txt"),
                       np.asarray(W), fmt="%.16e")
            np.savetxt(os.path.join(directory, f"layer{i}_b.txt"),
                       np.asarray(b), fmt="%.16e")
        if self.means is not None:
            np.savetxt(os.path.join(directory, "input_means.txt"),
                       np.asarray(self.means), fmt="%.16e")
            np.savetxt(os.path.join(directory, "input_stds.txt"),
                       np.asarray(self.stds), fmt="%.16e")
        meta = dict(metadata or {})   # never mutate the caller's dict
        meta["architecture"] = dict(meta.get("architecture") or {})
        meta["architecture"]["layers"] = (
            [self.input_dim] + [int(W.shape[0]) for W in self.Ws])
        meta["architecture"]["activations"] = self.activations
        with open(os.path.join(directory, "metadata.json"), "w") as fh:
            json.dump(meta, fh, indent=2)


def _mlp_flatten(m: MLP):
    return ((m.Ws, m.bs, m.means, m.stds), tuple(m.activations))


def _mlp_unflatten(acts, children):
    Ws, bs, means, stds = children
    return MLP(Ws=list(Ws), bs=list(bs), activations=list(acts),
               means=means, stds=stds)


# MLP is a pytree: weights/biases/scaling are leaves, activation names are
# static. This is what makes the solver differentiable end-to-end with
# respect to a closure's parameters (ml/adjoint.py) — the reference's
# offline-only training loop (L10) has no analogue of this.
jax.tree_util.register_pytree_node(MLP, _mlp_flatten, _mlp_unflatten)
