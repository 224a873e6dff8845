"""NN-closure training: scalar-nu_t MLP and TBNN.

TPU-native rebuild of the reference training toolchain (reference: scripts/
train_mlp_mcconkey.py, scripts/train_tbnn_mcconkey.py:33-387 TBNNModel with
tensor-basis loss b_pred = einsum(G, T), scripts/export_pytorch.py weight
export): pure JAX + optax instead of torch, exporting to the same text
weight format the solver loads (turbulence/nn_core.py MLP.save/load).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..turbulence.nn_core import MLP, _act


def _forward(params, activations, x):
    """Raw-parameter forward pass, kept arithmetically IDENTICAL to
    MLP.__call__'s layer loop (x @ W.T + b then activation) — the
    trained (W, b) lists are installed verbatim into an MLP, so any
    divergence here would train different semantics than inference."""
    for (W, b), act in zip(params, activations):
        x = _act(act)(x @ W.T + b)
    return x


def _fit(params, loss_fn, data, epochs, batch, lr, seed, log):
    opt = optax.adam(lr)
    opt_state = opt.init(params)
    n = data[0].shape[0]
    rng = np.random.default_rng(seed)

    @jax.jit
    def step(params, opt_state, *batch_data):
        loss, grads = jax.value_and_grad(loss_fn)(params, *batch_data)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    history = []
    for epoch in range(epochs):
        perm = rng.permutation(n)
        losses = []
        for s in range(0, n, batch):
            idx = perm[s:s + batch]
            params, opt_state, loss = step(
                params, opt_state, *(jnp.asarray(d[idx]) for d in data))
            losses.append(loss)   # device scalar: no per-batch host sync
        history.append(float(jnp.mean(jnp.stack(losses))))
        if log and (epoch % max(1, epochs // 10) == 0 or epoch == epochs - 1):
            print(f"  epoch {epoch:4d}: loss {history[-1]:.6e}")
    return params, history


def _normalize(X):
    means = X.mean(axis=0)
    stds = X.std(axis=0)
    stds = np.where(stds < 1e-12, 1.0, stds)
    return (X - means) / stds, means, stds


def train_mlp(features: np.ndarray, nu_t_labels: np.ndarray,
              hidden: Sequence[int] = (32, 32), epochs: int = 200,
              batch: int = 1024, lr: float = 1e-3, seed: int = 0,
              log: bool = False) -> Tuple[MLP, list]:
    """Scalar eddy-viscosity MLP: features (N,6) -> nu_t (N,).

    Matches the reference trainer's shape (train_mlp_mcconkey.py: z-score
    inputs, tanh hidden, relu output for positivity — see
    data/models/mlp_*/metadata.json activations [tanh, tanh, relu]).
    """
    Xn, means, stds = _normalize(features)
    y = nu_t_labels.reshape(-1, 1)
    dims = [features.shape[1], *hidden, 1]
    proto = MLP.from_dims(dims, key=jax.random.PRNGKey(seed))
    activations = ["tanh"] * len(hidden) + ["relu"]   # relu => nu_t >= 0
    params = [(W, b) for W, b in zip(proto.Ws, proto.bs)]

    def loss_fn(params, X, y):
        pred = _forward(params, activations, X)
        return jnp.mean((pred - y) ** 2)

    params, history = _fit(params, loss_fn, (Xn, y),
                           epochs, batch, lr, seed, log)
    mlp = MLP(Ws=[p[0] for p in params], bs=[p[1] for p in params],
              activations=activations,
              means=jnp.asarray(means), stds=jnp.asarray(stds))
    return mlp, history


def train_tbnn(invariants: np.ndarray, basis: np.ndarray,
               b_labels: np.ndarray,
               hidden: Sequence[int] = (64, 64, 64), epochs: int = 200,
               batch: int = 1024, lr: float = 1e-3, seed: int = 0,
               log: bool = False) -> Tuple[MLP, list]:
    """TBNN (Ling et al. 2016): invariants (N,5) + basis (N,4,3) ->
    G (N,4) with the tensor-basis loss |sum_n G_n T^n - b_label|^2
    (reference train_tbnn_mcconkey.py:33-387 b_pred = einsum(G, T))."""
    Xn, means, stds = _normalize(invariants)
    dims = [invariants.shape[1], *hidden, basis.shape[1]]
    proto = MLP.from_dims(dims, key=jax.random.PRNGKey(seed))
    activations = ["tanh"] * len(hidden) + ["linear"]
    params = [(W, b) for W, b in zip(proto.Ws, proto.bs)]

    def loss_fn(params, X, T, b):
        G = _forward(params, activations, X)           # (N, 4)
        b_pred = jnp.einsum("nb,nbc->nc", G, T)        # (N, 3)
        return jnp.mean((b_pred - b) ** 2)

    params, history = _fit(params, loss_fn,
                           (Xn, basis, b_labels), epochs, batch, lr, seed, log)
    mlp = MLP(Ws=[p[0] for p in params], bs=[p[1] for p in params],
              activations=activations,
              means=jnp.asarray(means), stds=jnp.asarray(stds))
    return mlp, history


# ---------------------------------------------------------------------------
# Synthetic channel-flow dataset (for presets/tests without external data)
# ---------------------------------------------------------------------------


def synthetic_channel_dataset(n: int = 20000, nu: float = 1e-3,
                              seed: int = 0) -> Dict[str, np.ndarray]:
    """Generate a physically-plausible channel dataset: mixing-length
    nu_t(y+) labels over sampled strain/rotation/wall-distance states.

    Plays the role of the reference's downloaded McConkey DNS tables
    (scripts/download_mcconkey_data.sh) for smoke training and preset
    generation; real datasets can be fed through the same arrays.
    """
    rng = np.random.default_rng(seed)
    delta, u_ref = 1.0, 1.0
    y = rng.uniform(0.005, 1.0, n)              # wall distance / delta
    S = rng.lognormal(0.0, 1.0, n)              # strain magnitude
    Om = S * rng.uniform(0.5, 1.5, n)           # rotation magnitude
    umag = rng.uniform(0.0, 1.5, n)
    u_tau = 0.05
    y_plus = y * u_tau / nu
    # UNsquared van Driest factor in l_mix: nu_t = l^2 |S| then carries
    # damping^2, matching MixingLengthModel (squaring it here gave the
    # labels damping^4)
    damping = 1.0 - np.exp(-y_plus / 26.0)
    l_mix = np.minimum(0.41 * y * damping, 0.5 * delta)
    nu_t = l_mix**2 * S
    features = np.stack([
        S * delta / u_ref, Om * delta / u_ref, y / delta,
        np.where(S > 1e-10, Om / np.maximum(S, 1e-10), 0.0),
        S * delta**2 / nu, umag / u_ref,
    ], axis=1)

    # TBNN side: 2-D shear states with anisotropy labels from the
    # quadratic model b = -C_mu S* + small nonlinear parts
    tau_t = rng.uniform(0.5, 5.0, n)
    Sxy = 0.5 * S * rng.choice([-1.0, 1.0], n)
    Sxx = 0.1 * S * rng.standard_normal(n)
    Oxy = 0.5 * Om * rng.choice([-1.0, 1.0], n)
    Sxx_n, Sxy_n, Oxy_n = Sxx * tau_t, Sxy * tau_t, Oxy * tau_t
    Syy_n = -Sxx_n
    # Smoothly squash the k/eps-normalized tensor magnitude to |S*| <= 5
    # (scale = cap*tanh(mag/cap)/mag): the raw lognormal strain times
    # tau_t in [0.5, 5] reaches ~30, far outside the O(1-5) range of
    # real normalized channel/hills data (McConkey), and the resulting
    # unbounded b labels dominate the tensor-basis MSE so badly that
    # training cannot generalize (a-priori holdout R^2 was negative
    # before this). tanh (not a hard clip) keeps the tail states present
    # with a monotone mapping, so the trained net still sees near-cap
    # inputs; runtime invariants beyond the range extrapolate through
    # the solver's nu_t clipping, as with any a-priori-trained closure.
    cap = 5.0
    s_mag = np.sqrt(Sxx_n**2 + Syy_n**2 + 2 * Sxy_n**2)
    sc = cap * np.tanh(s_mag / cap) / np.maximum(s_mag, 1e-12)
    Sxx_n, Sxy_n, Syy_n = Sxx_n * sc, Sxy_n * sc, Syy_n * sc
    o_mag = np.sqrt(2.0) * np.abs(Oxy_n)
    Oxy_n = Oxy_n * cap * np.tanh(o_mag / cap) / np.maximum(o_mag, 1e-12)
    inv = np.stack([
        2.0 * (Sxx_n**2 + Syy_n**2 + 2 * Sxy_n**2),
        4.0 * Oxy_n**2,
        Sxx_n**2 + Syy_n**2 + 2 * Sxy_n**2,
        2.0 * Oxy_n**2,
        y / delta,
    ], axis=1)
    T1 = np.stack([Sxx_n, Sxy_n, Syy_n], axis=1)
    T2 = np.stack([-2 * Sxy_n * Oxy_n, (Sxx_n - Syy_n) * Oxy_n,
                   2 * Sxy_n * Oxy_n], axis=1)
    S2xx = Sxx_n**2 + Sxy_n**2
    S2yy = Sxy_n**2 + Syy_n**2
    tr = S2xx + S2yy
    T3 = np.stack([S2xx - 0.5 * tr, Sxy_n * (Sxx_n + Syy_n),
                   S2yy - 0.5 * tr], axis=1)
    T4 = np.zeros_like(T3)
    basis = np.stack([T1, T2, T3, T4], axis=1)   # (N, 4, 3)
    C_mu = 0.09
    G_true = np.stack([
        -C_mu / (1.0 + 0.01 * inv[:, 0]),
        0.01 * np.ones(n), 0.01 * np.ones(n), np.zeros(n)], axis=1)
    b = np.einsum("nb,nbc->nc", G_true, basis)
    return {
        "features": features, "nu_t": nu_t,
        "invariants": inv, "basis": basis, "b": b,
    }
