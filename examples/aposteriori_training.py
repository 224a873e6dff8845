"""A-posteriori (differentiable-solver) closure training demo.

The reference's ML toolchain (reference scripts/train_mlp_mcconkey.py, L10)
can only fit a closure OFFLINE to precomputed DNS feature/label pairs.
Because this framework's time step is a pure jitted function of both the
flow state and the closure weights, the solver itself is differentiable:
here we recover an "oracle" eddy-viscosity closure purely from observations
of the flow it produces, by back-propagating a trajectory-matching loss
through the unrolled stepper (predictor, Poisson projection, closure).

Runs on CPU in ~2 minutes:

    python examples/aposteriori_training.py
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from cfdnn_tpu import Config, Simulation, init_poiseuille  # noqa: E402
from cfdnn_tpu.config import TurbulenceModel  # noqa: E402
from cfdnn_tpu.ml.adjoint import fit_closure, rollout  # noqa: E402
from cfdnn_tpu.turbulence.nn_core import MLP  # noqa: E402
from cfdnn_tpu.turbulence.nn_models import NNMLPModel  # noqa: E402


def build_sim(mlp):
    cfg = Config(
        Nx=12, Ny=24, Nz=1, nu=0.02, nu_specified=True,
        dp_dx=-1.0, dp_dx_specified=True,
        dt=2e-3, adaptive_dt=False, dtype="float64",
        turb_model=TurbulenceModel.NN_MLP, nn_weights_path="unused",
    )
    sim = Simulation(cfg.with_(turb_model=TurbulenceModel.NONE))
    sim.cfg = cfg
    sim.turb = NNMLPModel(cfg, sim.mesh, sim.geom, mlp=mlp)
    return sim


def fresh_mlp(key, out_bias=0.01):
    mlp = MLP.from_dims([6, 8, 1], key=key, dtype=jnp.float64)
    mlp.Ws[-1] = 0.02 * mlp.Ws[-1]
    mlp.bs[-1] = mlp.bs[-1] + out_bias   # keep initial nu_t > 0
    mlp.means = jnp.zeros((6,), jnp.float64)
    mlp.stds = jnp.ones((6,), jnp.float64)
    return mlp


def main():
    student = fresh_mlp(jax.random.PRNGKey(3))
    sim = build_sim(student)
    state0 = init_poiseuille(sim.cfg, sim.mesh)

    # The "experiment": a much more viscous oracle closure produced the
    # observed trajectory. We only get to see its velocity field.
    oracle = fresh_mlp(jax.random.PRNGKey(3), out_bias=0.4)
    n_steps = 6
    target = rollout(sim, oracle, state0, n_steps)

    def loss_fn(state):
        return jnp.mean((state.u - target.u) ** 2)

    def report(it, loss, _params):
        if it % 10 == 0:
            print(f"  iter {it:3d}  trajectory loss {loss:.3e}")

    print("training the closure through the unrolled solver ...")
    trained, hist = fit_closure(sim, state0, loss_fn, n_steps=n_steps,
                                iters=60, learning_rate=3e-2,
                                params=student, callback=report)
    print(f"loss: {hist[0]:.3e} -> {hist[-1]:.3e} "
          f"({hist[-1] / hist[0]:.1%} of initial)")

    # How close is the recovered eddy viscosity to the oracle's?
    final = rollout(sim, trained, state0, n_steps)
    err = float(jnp.linalg.norm(final.u - target.u)
                / jnp.linalg.norm(target.u))
    print(f"trajectory rel-L2 vs oracle after training: {err:.2e}")
    assert hist[-1] < 0.3 * hist[0], "training failed to converge"


if __name__ == "__main__":
    main()
