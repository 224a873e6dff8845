"""Neural-network turbulence closures: scalar-nu_t MLP and TBNN.

TPU-native rebuild of the reference NN models (reference: include/
turbulence_nn_mlp.hpp + src/turbulence_nn_mlp.cpp:140-280 scalar model;
include/turbulence_nn_tbnn.hpp:15-126 + src/turbulence_nn_tbnn.cpp:311-762
update_full_gpu pipeline). The whole pipeline — gradients, invariant features,
tensor basis, batched MLP inference, anisotropy construction, nu_t
extraction — is a single jitted chain; the MLP layers run as (Ncells, d)
matmuls on the MXU, replacing the reference's hand-written batched GEMV with
ping-pong workspaces (src/turbulence_nn_tbnn.cpp:525-560).
"""

from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp

from .base import TurbulenceModelBase, k_omega_channel_estimate, wall_distance
from .features import (anisotropy_to_stress, scalar_features,
                       tbnn_invariants_and_basis)
from .nn_core import MLP


def _resolve_model_dir(cfg) -> str:
    """Resolve preset/paths (reference --nn_preset / --weights flags,
    data/models/README.md usage)."""
    if cfg.nn_weights_path:
        return cfg.nn_weights_path
    if cfg.nn_preset:
        # package-relative FIRST: a cwd that happens to contain
        # data/models/<preset> must not shadow the shipped preset
        for root in (os.path.join(os.path.dirname(__file__),
                                  "..", "..", "data", "models"),
                     "data/models"):
            cand = os.path.join(root, cfg.nn_preset)
            if os.path.isdir(cand):
                return cand
        raise FileNotFoundError(f"nn_preset '{cfg.nn_preset}' not found")
    raise ValueError(
        "NN turbulence model requires nn_weights_path or nn_preset "
        "(reference: all NN models require explicit selection)")


class NNMLPModel(TurbulenceModelBase):
    """Scalar eddy-viscosity MLP: nu_t = MLP(6 invariant features).

    Features (reference features.hpp:60-66): |S|d/u, |O|d/u, y/d, O/S,
    Re_S, |u|/u. Output clipped to [0, nu_t_max]
    (src/turbulence_nn_mlp.cpp:265-280).
    """

    name = "NN-MLP"

    def __init__(self, cfg, mesh, geom, mlp: Optional[MLP] = None):
        self.mlp = mlp if mlp is not None else MLP.load(
            _resolve_model_dir(cfg), dtype=geom.dtype)
        if self.mlp.input_dim != 6:
            raise ValueError(
                f"nn_mlp expects 6 features, model has {self.mlp.input_dim}")
        self.nu = cfg.nu
        self.delta = 0.5 * cfg.Ly
        self.nu_t_max = cfg.nu_t_max
        self.y_wall = wall_distance(mesh, cfg, geom.dtype)

    def nu_t(self, state, sim):
        comps = (state.u, state.v, state.w)
        feats, _ = scalar_features(comps, sim.geom, self.y_wall, self.nu,
                                   self.delta)
        if self.mlp.Ws[-1].shape[0] != 1:
            raise ValueError(
                f"nn_mlp expects a single nu_t output, model has "
                f"{self.mlp.Ws[-1].shape[0]} outputs")
        out = self.mlp(feats)[:, 0]
        shape = tuple(sim.geom.axes[a].n for a in range(3))
        nut = out.reshape(shape)
        nut = jnp.nan_to_num(nut, nan=0.0, posinf=0.0, neginf=0.0)
        return jnp.clip(nut, 0.0, self.nu_t_max)


class NNTBNNModel(TurbulenceModelBase):
    """TBNN (Ling et al. 2016): invariants -> MLP -> G_n -> b_ij -> nu_t, tau.

    Full pipeline parity with the reference fused GPU kernel
    (src/turbulence_nn_tbnn.cpp:440-610): 5 invariants, 4-tensor 2-D basis,
    per-cell G from the network, tau_ij = 2k(b_ij + delta_ij/3), nu_t from
    the shear component with |.| and the 10-nu cap.
    """

    name = "NN-TBNN"
    provides_reynolds_stresses = True

    def __init__(self, cfg, mesh, geom, mlp: Optional[MLP] = None):
        self.mlp = mlp if mlp is not None else MLP.load(
            _resolve_model_dir(cfg), dtype=geom.dtype)
        if self.mlp.input_dim != 5:
            raise ValueError(
                f"nn_tbnn expects 5 features, model has {self.mlp.input_dim}")
        self.nu = cfg.nu
        self.delta = 0.5 * cfg.Ly
        self.y_wall = wall_distance(mesh, cfg, geom.dtype)

    def initialize(self, state, sim):
        """Algebraic k/omega estimate (reference estimate_k,
        src/turbulence_nn_tbnn.cpp:275-309)."""
        k, om = k_omega_channel_estimate(
            (state.u, state.v, state.w), sim.geom, self.y_wall, self.nu)
        return state.replace(k=k, omega=om)

    def _pipeline(self, state, sim):
        comps = (state.u, state.v, state.w)
        geom = sim.geom
        shape = tuple(geom.axes[a].n for a in range(3))
        # k/omega: re-estimate from the CURRENT velocity every call (the
        # reference calls estimate_k inside update() whenever no transport
        # model provides k, turbulence_nn_tbnn.cpp:677 — a one-time
        # initialize() estimate would freeze the tau normalization and
        # nu_t magnitude at the t=0 transitional level forever)
        k, om = k_omega_channel_estimate(comps, geom, self.y_wall, self.nu)
        k = jnp.clip(k, 1e-10, 100.0)
        om = jnp.clip(om, 1e-10, 1e6)

        feats, basis, sr = tbnn_invariants_and_basis(
            comps, geom, k, om, self.y_wall, self.delta)
        G = self.mlp(feats)
        if G.shape[-1] != 4:
            raise ValueError(
                f"nn_tbnn expects 4 basis coefficients (2-D basis), model "
                f"has {G.shape[-1]} outputs — silently truncating would "
                f"build b_ij from a wrong partial basis sum")
        b = jnp.einsum("nb,nbc->nc", G, basis)
        b_xx = b[:, 0].reshape(shape)
        b_xy = b[:, 1].reshape(shape)
        b_yy = b[:, 2].reshape(shape)

        Sxy, S_mag = sr.S[0][1], sr.S_mag
        nut = jnp.where(
            jnp.abs(Sxy) > 1e-10,
            jnp.abs(-b_xy * k / jnp.where(jnp.abs(Sxy) > 1e-10, Sxy, 1.0)),
            jnp.where(S_mag > 1e-10,
                      k * jnp.sqrt(b_xx**2 + 2.0 * b_xy**2 + b_yy**2)
                      / jnp.maximum(S_mag, 1e-10),
                      0.0))
        nut = jnp.nan_to_num(jnp.clip(nut, 0.0, 10.0 * self.nu))
        tau = anisotropy_to_stress(b_xx, b_xy, b_yy, jnp.maximum(k, 0.0))
        return nut, tau

    def nu_t(self, state, sim):
        return self._pipeline(state, sim)[0]

    def reynolds_stresses(self, state, sim):
        return self._pipeline(state, sim)[1]
