"""Four-step fast Hartley transform (FHT) on the MXU.

The Hartley basis (cas = cos + sin) diagonalizes symmetric circulants, so
it is a drop-in replacement for the dense periodic eigenbasis matmuls of
the FDM Poisson solver (poisson/fdm.py `_periodic_eig`) — but it
FACTORIZES: with N = N1*N2 the dense N x N cas matmul splits into an
N1 x N1 matmul, an elementwise twiddle (with a k1-flip), and an N2-sized
pair of matmuls, cutting transform flops from 2N per cell to
~2(N1 + 2 N2) per cell (~8x at N = 512, split 32 x 16) in PURE REAL
arithmetic — no complex unpacking, unlike a four-step complex FFT.

Derivation (k = k1 + N1 k2, n = n1 N2 + n2):
  H[k] = sum_{n2} [ cos(2 pi k n2/N) t[k1,n2] + sin(2 pi k n2/N) t~[k1,n2] ]
with t = cas_{N1}-transform over n1 and t~[k1] = t[(N1-k1) mod N1].
Splitting the n2 phase gives the twiddle pair (u_c, u_s) contracted with
cos/sin matrices over n2. The output lives in DIGIT-PERMUTED order
(array index p = k1*N2 + k2 holds true wavenumber k = k1 + N1*k2); the
caller keeps everything permuted and builds the modal symbol in the same
order (`lam_permuted`), so no reordering pass is ever needed. The inverse
is the algebraic adjoint divided by N (Hartley is self-inverse).

Validated to 5e-12 against the dense cas matrix and a direct periodic
Poisson solve in float64.

PERF NOTE (measured, v5e, 512^3 f32 HIGHEST): the FHT solve runs 102 ms
vs 33.6 ms for the dense eigenbasis matmuls — 3x SLOWER despite ~8x
fewer flops. A full split sweep settles WHY: (N1,N2) = (32,16) 95.4 ms,
(64,8) 95.3 ms, (128,4) 105.7 ms, (256,2) 115.3 ms (dense 13.7 ms,
round-2 kernels) — even with the N1 factor exactly MXU-sized (128) the
time barely moves, so the cost is NOT matmul utilization but the
moveaxis/reshape transposes and elementwise twiddle passes, which are
HBM-bandwidth-bound and don't shrink with the factorization. A
flop-saving transform only wins when the baseline is flop-bound; the
dense transform at 512 is already near the MXU roofline while the step
is bandwidth-bound around it. Kept as a correct, tested OPT-IN
(transform="fht") and as the measured justification for the
dense-transform design choice.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


def _split(N: int) -> Optional[Tuple[int, int]]:
    """Pick N = N1*N2 with N1 >= N2, both modest (MXU-friendly)."""
    best = None
    for n2 in range(2, int(np.sqrt(N)) + 1):
        if N % n2 == 0:
            best = (N // n2, n2)
    return best


@dataclasses.dataclass(frozen=True)
class FHTAxis:
    """Constants for one periodic axis of length N = N1*N2."""

    N: int
    N1: int
    N2: int
    H1: jnp.ndarray        # (N1, N1) cas matrix
    C2: jnp.ndarray        # (N2, N2) cos matrix
    S2: jnp.ndarray        # (N2, N2) sin matrix
    cos_tw: jnp.ndarray    # (N1, N2) twiddle cos(2 pi k1 n2 / N)
    sin_tw: jnp.ndarray    # (N1, N2)

    @classmethod
    def make(cls, N: int, dtype) -> Optional["FHTAxis"]:
        sp = _split(N)
        if sp is None:
            return None
        N1, N2 = sp
        k1 = np.arange(N1)
        k2 = np.arange(N2)
        ang1 = 2 * np.pi * np.outer(k1, k1) / N1
        H1 = np.cos(ang1) + np.sin(ang1)
        ang2 = 2 * np.pi * np.outer(k2, k2) / N2
        th = 2 * np.pi * np.outer(k1, k2) / N
        return cls(N=N, N1=N1, N2=N2,
                   H1=jnp.asarray(H1, dtype),
                   C2=jnp.asarray(np.cos(ang2), dtype),
                   S2=jnp.asarray(np.sin(ang2), dtype),
                   cos_tw=jnp.asarray(np.cos(th), dtype),
                   sin_tw=jnp.asarray(np.sin(th), dtype))

    def lam_permuted(self, lam: np.ndarray) -> np.ndarray:
        """Reorder a true-wavenumber symbol vector into the transform's
        digit-permuted layout: out[k1*N2 + k2] = lam[k1 + N1*k2]."""
        return lam.reshape(self.N2, self.N1).T.reshape(-1)


def _flip_k1(t):
    """t[(N1 - k1) mod N1] along axis 0 (static slices, no gather)."""
    return jnp.concatenate([t[:1], t[1:][::-1]], axis=0)


def _bcast(tab, ndim_rest):
    return tab.reshape(tab.shape + (1,) * ndim_rest)


def fht_forward(x, axis: int, t: FHTAxis, precision=None):
    """Hartley transform along `axis` (output digit-permuted)."""
    x = jnp.moveaxis(x, axis, 0)
    rest = x.shape[1:]
    xs = x.reshape((t.N1, t.N2) + rest)                     # [n1, n2, ...]
    pe = xs.dtype
    tt = jnp.einsum("ab,b...->a...", t.H1, xs,
                    precision=precision, preferred_element_type=pe)
    tf = _flip_k1(tt)
    c = _bcast(t.cos_tw, len(rest))
    s = _bcast(t.sin_tw, len(rest))
    u_c = c * tt + s * tf
    u_s = c * tf - s * tt
    X = (jnp.einsum("kc,ac...->ak...", t.C2, u_c,
                    precision=precision, preferred_element_type=pe)
         + jnp.einsum("kc,ac...->ak...", t.S2, u_s,
                      precision=precision, preferred_element_type=pe))
    return jnp.moveaxis(X.reshape((t.N,) + rest), 0, axis)


def fht_inverse(X, axis: int, t: FHTAxis, precision=None):
    """Adjoint of fht_forward divided by N (exact inverse)."""
    X = jnp.moveaxis(X, axis, 0)
    rest = X.shape[1:]
    Xs = X.reshape((t.N1, t.N2) + rest)                     # [k1, k2, ...]
    pe = Xs.dtype
    v_c = jnp.einsum("kc,ak...->ac...", t.C2, Xs,
                     precision=precision, preferred_element_type=pe)
    v_s = jnp.einsum("kc,ak...->ac...", t.S2, Xs,
                     precision=precision, preferred_element_type=pe)
    c = _bcast(t.cos_tw, len(rest))
    s = _bcast(t.sin_tw, len(rest))
    tt = (c * v_c - s * v_s) + _flip_k1(s * v_c + c * v_s)
    xs = jnp.einsum("ab,b...->a...", t.H1, tt,
                    precision=precision, preferred_element_type=pe)
    out = xs.reshape((t.N,) + rest) / t.N
    return jnp.moveaxis(out, 0, axis)
