"""Differentiable-solver utilities: end-to-end (a-posteriori) closure
training through the unrolled time stepper.

The reference's ML toolchain (reference scripts/train_{tbnn,mlp}_
mcconkey.py, L10) is strictly *a-priori*: networks are fit offline to DNS
feature/label pairs and frozen into the solver. Because this framework's
step is a pure jitted function of the state AND the closure parameters
(nn_core.MLP is a registered pytree), the solver itself is differentiable:
`jax.grad` of any trajectory functional with respect to the network weights
back-propagates through projection, transport, and the Poisson solve. This
enables a-posteriori training (fit the closure so the *simulated flow*
matches data), a capability the C++/CUDA reference cannot express.

Memory: each unrolled step is wrapped in `jax.checkpoint` (rematerialize
instead of storing every intermediate), so the backward pass holds one
state per step rather than one per operation.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def rollout(sim, params, state, n_steps: int, remat: bool = True):
    """Advance `n_steps` with the NN closure's parameters swapped for
    `params` (an nn_core.MLP pytree). Traceable and differentiable in both
    `params` and `state`.

    `sim.turb` must be an NN closure exposing `.mlp` (NNMLPModel /
    NNTBNNModel). The swap is a trace-time mutation restored afterwards,
    so the simulation object is unchanged for other callers.
    """
    model = sim.turb
    if not hasattr(model, "mlp"):
        raise ValueError(
            "rollout(params=...) requires an NN closure (nn_mlp / nn_tbnn);"
            f" got {type(model).__name__}")
    saved = model.mlp
    model.mlp = params
    # Round 5: the fused Pallas fast paths STAY ACTIVE inside jax.grad
    # regions — every fused call site (predictor, divergence, correction,
    # transport advance, LES nu_sgs, Germano) is wrapped in
    # solver.vjp_via, whose backward is the VJP of the parity-tested jnp
    # equivalent. A-posteriori training therefore runs the forward at
    # fused kernel speed (previously this function forced the ~3x-slower
    # operator path for the whole unroll). The one fused component
    # without a VJP is the Pallas-FHT Poisson transform (auto-selected
    # only at >= 384^3 f32 on TPU) — a grad at that scale fails loudly
    # with "no AD rule for pallas_call"; set poisson_transform='auto'
    # dense or train below that size.
    try:
        def one(c, _):
            s, _d = sim._step_impl(c, with_diags=False)
            return s, None

        body = jax.checkpoint(one) if remat else one
        state, _ = jax.lax.scan(body, state, None, length=n_steps)
    finally:
        model.mlp = saved
    return state


def trajectory_loss(sim, loss_fn: Callable, n_steps: int,
                    segments: int = 1, remat: bool = True):
    """Build `f(params, state0) -> scalar loss`, differentiable in params.

    loss_fn(state) -> scalar is evaluated after each of `segments` equal
    chunks of n_steps//segments steps and averaged (matching-at-checkpoints
    a-posteriori objectives); segments=1 evaluates only the final state.
    """
    if n_steps % segments:
        raise ValueError("n_steps must divide into segments")
    chunk = n_steps // segments

    def f(params, state0):
        state = state0
        total = jnp.zeros((), sim.dtype)
        for _ in range(segments):
            state = rollout(sim, params, state, chunk, remat=remat)
            total = total + loss_fn(state)
        return total / segments

    return f


def fit_closure(sim, state0, loss_fn: Callable, n_steps: int = 10,
                iters: int = 50, learning_rate: float = 1e-3,
                segments: int = 1, params=None,
                train_normalization: bool = False,
                clip_norm: Optional[float] = None,
                callback: Optional[Callable] = None,
                return_best: bool = False):
    """A-posteriori training loop: optimize the NN closure's weights so the
    simulated trajectory minimizes loss_fn (optax adam), returning
    (trained MLP, loss history).

    By default the input-normalization statistics (means/stds) are FROZEN:
    they are registered pytree leaves of the MLP, and letting adam update
    them silently turns saved "feature statistics" into free parameters
    (changing the meaning of exported metadata and destabilizing
    training). Pass train_normalization=True to opt in.

    `clip_norm` chains optax.clip_by_global_norm before adam — gradients
    through hundreds of unrolled PDE steps grow chaotically with the
    horizon (observed: a 1500-step channel unroll diverged at lr 3e-4
    without clipping), and clipping is the standard BPTT defense.
    """
    import optax

    params = params if params is not None else sim.turb.mlp
    f = trajectory_loss(sim, loss_fn, n_steps, segments=segments)
    vg = jax.jit(jax.value_and_grad(f))
    opt = optax.adam(learning_rate)
    if clip_norm is not None:
        opt = optax.chain(optax.clip_by_global_norm(clip_norm), opt)
    if not train_normalization:
        def zero_stats(g):
            if g.means is None:
                return g
            import dataclasses as _dc
            return _dc.replace(g, means=jnp.zeros_like(g.means),
                               stds=jnp.zeros_like(g.stds))
    opt_state = opt.init(params)
    history = []
    best = (float("inf"), params)
    for it in range(iters):
        loss, grads = vg(params, state0)
        if float(loss) < best[0]:
            best = (float(loss), params)   # loss evaluated PRE-update
        if not train_normalization:
            grads = zero_stats(grads)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        history.append(float(loss))
        if callback:
            callback(it, history[-1], params)
    if return_best:
        # BPTT losses through long PDE unrolls are non-monotone in adam
        # steps (chaotic gradients); return the best EVALUATED iterate
        # instead of wherever the last step landed (may be the initial
        # params — a fine outcome when they were already near-optimal)
        return best[1], history
    return params, history
