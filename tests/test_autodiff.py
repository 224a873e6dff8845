"""Differentiable-solver tests: gradients through the unrolled step.

No reference analogue — the C++ solver cannot be differentiated. These
gates protect the a-posteriori training capability (ml/adjoint.py): the
whole step (predictor, projection/Poisson, NN closure) must be
differentiable with respect to the closure weights, and the gradients
must be *correct* (finite-difference check) and *useful* (a short optax
loop reduces a trajectory loss).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfdnn_tpu import Config, Simulation, init_poiseuille
from cfdnn_tpu.config import TurbulenceModel
from cfdnn_tpu.ml.adjoint import fit_closure, trajectory_loss
from cfdnn_tpu.turbulence.nn_core import MLP


def _mlp_sim():
    mlp = MLP.from_dims([6, 8, 1], key=jax.random.PRNGKey(3),
                        dtype=jnp.float64)
    # keep initial nu_t strictly positive: a negative output is clipped to
    # zero and its gradient dies at the clip boundary
    mlp.Ws[-1] = 0.02 * mlp.Ws[-1]
    mlp.bs[-1] = mlp.bs[-1] + 0.01
    mlp.means = jnp.zeros((6,), jnp.float64)
    mlp.stds = jnp.ones((6,), jnp.float64)
    cfg = Config(
        Nx=12, Ny=24, Nz=1, nu=0.02, nu_specified=True,
        dp_dx=-1.0, dp_dx_specified=True,
        dt=2e-3, adaptive_dt=False, dtype="float64",
        turb_model=TurbulenceModel.NN_MLP, nn_weights_path="unused",
    )
    # build the sim with the in-memory MLP (bypass file loading)
    from cfdnn_tpu.turbulence.nn_models import NNMLPModel
    sim = Simulation(cfg.with_(turb_model=TurbulenceModel.NONE))
    sim.cfg = cfg
    sim.turb = NNMLPModel(cfg, sim.mesh, sim.geom, mlp=mlp)
    return sim, mlp


def test_mlp_is_pytree():
    mlp = MLP.from_dims([4, 5, 2])
    leaves = jax.tree.leaves(mlp)
    assert len(leaves) == 4  # 2 W + 2 b (means/stds None)
    rebuilt = jax.tree.map(lambda x: x, mlp)
    assert isinstance(rebuilt, MLP)
    assert rebuilt.activations == mlp.activations


def test_gradient_matches_finite_difference():
    """d(loss)/d(weight) through 4 unrolled steps (incl. the Poisson solve
    and the NN closure) matches central finite differences."""
    sim, mlp = _mlp_sim()
    state0 = init_poiseuille(sim.cfg, sim.mesh)

    def loss_fn(state):
        return jnp.mean(state.u**2)

    f = trajectory_loss(sim, loss_fn, n_steps=4)
    g = jax.grad(f)(mlp, state0)
    # probe the largest-gradient first-layer weight
    gW = np.asarray(g.Ws[0])
    idx = np.unravel_index(np.argmax(np.abs(gW)), gW.shape)
    an = float(gW[idx])
    assert np.isfinite(an) and abs(an) > 0.0

    eps = 1e-6 * max(1.0, abs(float(mlp.Ws[0][idx])))
    import copy

    def perturbed(sign):
        m = jax.tree.map(lambda x: x, mlp)
        m.Ws = list(m.Ws)
        m.Ws[0] = m.Ws[0].at[idx].add(sign * eps)
        return m

    fp = float(f(perturbed(+1), state0))
    fm = float(f(perturbed(-1), state0))
    fd = (fp - fm) / (2 * eps)
    assert abs(an - fd) <= 1e-4 * max(abs(fd), 1e-12), (an, fd)


def test_gradients_flow_to_every_layer():
    sim, mlp = _mlp_sim()
    state0 = init_poiseuille(sim.cfg, sim.mesh)
    f = trajectory_loss(sim, loss_fn=lambda s: jnp.mean(s.u**2), n_steps=3)
    g = jax.grad(f)(mlp, state0)
    for i, gW in enumerate(g.Ws):
        assert float(jnp.max(jnp.abs(gW))) > 0.0, f"dead layer {i}"


@pytest.mark.slow
def test_aposteriori_training_reduces_loss():
    """Closure identification through the unrolled solver: the target
    trajectory is produced by an 'oracle' set of weights, so zero loss is
    achievable; a short adam loop must close most of the gap
    (a-posteriori training end-to-end)."""
    from cfdnn_tpu.ml.adjoint import rollout
    sim, mlp = _mlp_sim()
    state0 = init_poiseuille(sim.cfg, sim.mesh)

    oracle = jax.tree.map(lambda x: x, mlp)
    oracle.bs = list(oracle.bs)
    oracle.bs[-1] = oracle.bs[-1] + 0.4   # a much more viscous closure
    target = rollout(sim, oracle, state0, 6)
    u_target = target.u

    def loss_fn(state):
        return jnp.mean((state.u - u_target) ** 2)

    trained, hist = fit_closure(sim, state0, loss_fn, n_steps=6, iters=40,
                                learning_rate=3e-2, params=mlp)
    assert all(np.isfinite(h) for h in hist)
    assert hist[-1] < 0.3 * hist[0], hist


def test_grad_through_fused_kernels_matches_jnp():
    """vjp_via (round-5): jax.grad regions keep the fused Pallas forward
    (predictor, divergence, correction, transport advance, LES nu_sgs),
    with the backward defined as the VJP of the parity-tested jnp path.
    The gradients must match the all-jnp trace to machine precision —
    for an NN closure (wrt weights) and for SST transport (wrt state)."""
    import tempfile
    from cfdnn_tpu import perturbed_channel

    tmp = tempfile.mkdtemp()
    m = MLP.from_dims([6, 16, 1], key=jax.random.PRNGKey(0))
    m.Ws[-1] = 0.01 * m.Ws[-1]
    m.means = jnp.zeros((6,))
    m.stds = jnp.ones((6,))
    m.save(f"{tmp}/mlp")

    kw = dict(Nx=16, Ny=16, Nz=16, stretch_y=True,
              nu=1e-3, nu_specified=True, dp_dx=-1e-3,
              dp_dx_specified=True, dt=1e-3, adaptive_dt=False,
              dtype="float64", turb_model=TurbulenceModel.NN_MLP,
              nn_weights_path=f"{tmp}/mlp")

    def grads(use_pallas):
        cfg = Config(**kw, use_pallas=use_pallas)
        sim = Simulation(cfg)
        state = sim.initialize(perturbed_channel(cfg, sim.mesh, amp=0.05))
        loss = trajectory_loss(sim, lambda s: jnp.mean(s.u ** 2), 3)
        val, g = jax.value_and_grad(loss)(sim.turb.mlp, state)
        return float(val), jax.tree_util.tree_leaves(g)

    v_on, g_on = grads("on")
    v_off, g_off = grads("off")
    assert abs(v_on - v_off) < 1e-14 * max(abs(v_off), 1.0)
    for a, b in zip(g_on, g_off):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-10, atol=1e-18)

    # SST transport advance through _run_fused's vjp_via, grad wrt state
    kw2 = dict(kw, turb_model=TurbulenceModel.SST)
    kw2.pop("nn_weights_path")

    def sst_grad(use_pallas):
        cfg = Config(**kw2, use_pallas=use_pallas)
        sim = Simulation(cfg)
        state = sim.initialize(perturbed_channel(cfg, sim.mesh, amp=0.05))

        def loss(u0):
            st = state.replace(u=u0)
            for _ in range(2):
                st, _ = sim._step_impl(st, with_diags=False)
            return jnp.mean(st.u ** 2) + jnp.mean(st.k ** 2)

        return np.asarray(jax.grad(loss)(state.u))

    np.testing.assert_allclose(sst_grad("on"), sst_grad("off"),
                               rtol=1e-10, atol=1e-18)
