"""Batched tridiagonal (Thomas) solve along one axis.

TPU-native replacement for the reference's batched Thomas kernels
(reference: src/solver_time_kernels_implicit.cpp thomas_y_diffusion_* and
the cuSPARSE gtsv usage in the FFT solver, poisson_solver_fft.hpp:119-129):
a `lax.scan` forward elimination + reverse substitution over the solve axis,
batched over all other axes — one fused XLA loop, no per-line kernel
launches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def thomas(lower, diag, upper, rhs, axis: int):
    """Solve tridiagonal systems along `axis`.

    lower/diag/upper broadcast against rhs (full-rank or scalar). A 1-D
    length-n vector is taken ALONG THE SOLVE AXIS — never by trailing-dim
    alignment, which would silently lay the coefficients across the batch
    whenever a trailing dim happens to equal n (e.g. axis=1 on a cubic
    grid). lower[0] and upper[-1] along the solve axis are ignored
    (standard convention).
    """
    n = rhs.shape[axis]
    r = jnp.moveaxis(rhs, axis, 0)

    def prep(c):
        # broadcast only along the SCAN axis; batch dims stay size-1 and
        # broadcast inside the scan arithmetic (materializing three full
        # 3-D coefficient arrays would ~4x the memory traffic of the
        # implicit-y solve for the common (1,Ny,1) coefficients)
        c = jnp.asarray(c)
        if c.ndim == 1 and c.shape[0] == n:
            s = [1] * rhs.ndim
            s[axis] = n
            c = c.reshape(s)
        elif c.ndim != rhs.ndim:
            if c.ndim != 0:
                raise ValueError(
                    f"thomas coefficient of shape {c.shape} is ambiguous "
                    f"against rhs {rhs.shape} (solve axis {axis}, n={n}); "
                    f"pass a scalar, a length-n vector, or a full-rank "
                    f"broadcastable array")
            c = jnp.broadcast_to(c, rhs.shape)
        c = jnp.moveaxis(c, axis, 0)
        if c.shape[0] != n:
            c = jnp.broadcast_to(c, (n,) + c.shape[1:])
        return c

    l_, d_, u_ = prep(lower), prep(diag), prep(upper)

    def fwd(carry, inp):
        cp_prev, dp_prev = carry
        li, di, ui, ri = inp
        denom = di - li * cp_prev
        cp = ui / denom
        dp = (ri - li * dp_prev) / denom
        return (cp, dp), (cp, dp)

    init = (jnp.zeros_like(r[0]), jnp.zeros_like(r[0]))
    _, (cps, dps) = jax.lax.scan(fwd, init, (l_, d_, u_, r))

    def bwd(x_next, inp):
        cp, dp = inp
        xi = dp - cp * x_next
        return xi, xi

    _, xs = jax.lax.scan(bwd, jnp.zeros_like(r[0]), (cps, dps), reverse=True)
    return jnp.moveaxis(xs, 0, axis)
