"""Invariant feature computation and tensor basis for NN closures.

TPU-native rebuild of the reference feature layer (reference: include/
features.hpp:60-160, src/features.cpp compute_features_scalar_nut /
compute_features_tbnn / TensorBasis::compute): vectorized over the whole
grid instead of per-cell loops; outputs stack to (Ncells, nfeat) arrays that
feed the MXU-batched MLP directly.
"""

from __future__ import annotations

import jax.numpy as jnp

from .base import cell_center_velocity, strain_rotation
from ..utils.numerics import safe_sqrt

C_MU = 0.09
K_FLOOR = 1e-10


def scalar_features(comps, geom, y_wall, nu: float, delta: float,
                    u_ref: float = 1.0):
    """6 features for the scalar-nu_t MLP (reference features.hpp:60-66,
    data/models metadata `scalar_nut_v1`):
    [ |S| d/u, |O| d/u, y/d, O/S, Re_S = |S| d^2/nu, |u|/u ]."""
    sr = strain_rotation(comps, geom)
    ucc = cell_center_velocity(comps, geom)
    u_mag = safe_sqrt(ucc[0] ** 2 + ucc[1] ** 2 + ucc[2] ** 2)
    S, Om = sr.S_mag, sr.O_mag
    ratio = jnp.where(S > 1e-10, Om / jnp.maximum(S, 1e-10), 0.0)
    shape = S.shape
    yw = jnp.broadcast_to(y_wall, shape)
    feats = jnp.stack([
        (S * delta / u_ref).reshape(-1),
        (Om * delta / u_ref).reshape(-1),
        (yw / delta).reshape(-1),
        ratio.reshape(-1),
        (S * delta**2 / nu).reshape(-1),
        (u_mag / u_ref).reshape(-1),
    ], axis=-1)
    return feats, sr


def tbnn_invariants_and_basis(comps, geom, k, omega, y_wall, delta: float):
    """5 invariants + 4-tensor 2-D basis for TBNN (reference
    features.cpp compute_features_tbnn, TensorBasis::compute).

    Normalization time scale tau = k/eps with eps = C_mu k omega
    (=> tau = 1/(C_mu omega)). Returns (features (N,5),
    basis (N,4,3) with components (xx, xy, yy), sr).
    """
    sr = strain_rotation(comps, geom)
    k_safe = jnp.maximum(k, K_FLOOR)
    eps = jnp.maximum(C_MU * k_safe * omega, 1e-20)
    tau = k_safe / eps

    Sxx = sr.S[0][0] * tau
    Syy = sr.S[1][1] * tau
    Sxy = sr.S[0][1] * tau
    Oxy = sr.O12 * tau

    S_norm2 = 2.0 * (Sxx**2 + Syy**2 + 2.0 * Sxy**2)
    O_norm2 = 2.0 * (2.0 * Oxy**2)
    trS2 = Sxx**2 + Syy**2 + 2.0 * Sxy**2
    trO2 = 2.0 * Oxy**2
    yw = jnp.broadcast_to(y_wall, Sxx.shape)

    feats = jnp.stack([
        S_norm2.reshape(-1),
        O_norm2.reshape(-1),
        trS2.reshape(-1),
        trO2.reshape(-1),
        (yw / delta).reshape(-1),
    ], axis=-1)

    # T1 = S*, T2 = [S*,O*], T3 = dev2(S*^2), T4 = 0 (2-D)
    T1 = (Sxx, Sxy, Syy)
    T2 = (-2.0 * Sxy * Oxy, (Sxx - Syy) * Oxy, 2.0 * Sxy * Oxy)
    S2xx = Sxx**2 + Sxy**2
    S2yy = Sxy**2 + Syy**2
    S2xy = Sxy * (Sxx + Syy)
    tr = S2xx + S2yy
    T3 = (S2xx - 0.5 * tr, S2xy, S2yy - 0.5 * tr)
    zeros = jnp.zeros_like(Sxx)
    T4 = (zeros, zeros, zeros)
    basis = jnp.stack(
        [jnp.stack([c.reshape(-1) for c in T], axis=-1)
         for T in (T1, T2, T3, T4)], axis=1)   # (N, 4, 3)
    return feats, basis, sr


def anisotropy_to_stress(b_xx, b_xy, b_yy, k):
    """tau_ij = 2 k (b_ij + delta_ij/3) (reference TensorBasis::
    anisotropy_to_reynolds_stress, features.hpp:117-123)."""
    third = 1.0 / 3.0
    return (2.0 * k * (b_xx + third),
            2.0 * k * b_xy,
            2.0 * k * (b_yy + third))
