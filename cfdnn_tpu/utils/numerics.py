"""Overflow-safe numerics helpers (reference: include/numerics.hpp:1-30
safe_divide / bounded_ratio, used throughout the turbulence closures)."""

from __future__ import annotations

import jax.numpy as jnp


def safe_tanh(x, cap: float = 30.0):
    """tanh with the argument clamped to +-cap (tanh(30) == 1.0 to 26
    digits). SST/EARSM blending functions feed tanh arguments as large as
    1e18; some accelerator libm emulations compute tanh via exp(2x) and
    return NaN once that overflows, so never pass unbounded arguments."""
    return jnp.tanh(jnp.clip(x, -cap, cap))


def safe_sqrt(x):
    """sqrt(max(x, 0)) whose gradient is 0 (not inf/NaN) at x <= 0.

    d/dx sqrt(x) = 1/(2 sqrt(x)) blows up at x = 0, so reverse-mode AD
    through strain magnitudes NaNs wherever the flow is locally at rest
    (e.g. the channel centerline by symmetry). The double-where pattern
    keeps the forward value exact and pins the subgradient to zero there,
    which is the physically sensible choice for |S|-type quantities.
    """
    pos = x > 0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, x, 1.0)), 0.0)


def safe_divide(num, den, floor: float = 1e-20):
    """num / den with |den| floored away from zero (sign-preserving)."""
    d = jnp.where(jnp.abs(den) < floor,
                  jnp.where(den < 0, -floor, floor), den)
    return num / d


def bounded_ratio(num, den, bound: float = 1e6, floor: float = 1e-20):
    """safe_divide clipped to [-bound, bound] (turbulence-quantity ratios
    like omega/k stay finite at the floors)."""
    return jnp.clip(safe_divide(num, den, floor), -bound, bound)
