"""Pallas in-VMEM four-step Hartley transform — the large-N Poisson fast path.

The jnp four-step FHT (poisson/fht.py) is algebraically right but loses to
the dense eigenbasis matmuls on TPU because every moveaxis/reshape/twiddle
stage is a separate HBM round trip (its PERF NOTE pins the cost to
transposes, not flops). This module keeps the same factorized algebra but
maps it to the TPU units inside one Pallas kernel per axis pass:

  N = N1 * N2 with N2 MXU-sized (128 when it divides, 64..256 otherwise)
  and N1 <= 8, so that

  * the N1 stage (cas over the slow digit + the k1-flip) is a handful of
    SCALAR-weighted adds of whole (B, N2) tiles on the VPU — for N1 in
    {1,2,4} every cas weight is +-1, so it is literally adds/subs; the
    flip is free list reindexing. No reshapes, no transposes: the digit
    split n = n1*N2 + n2 makes each n1 group a static lane (or sublane)
    slice of the block.
  * the N2 stage (cos/sin contraction over the fast digit) is ONE fused
    (B, 2*N2) x (2*N2, N2) MXU matmul per k1 group, run as three bf16
    passes (hi/lo splitting) for f32-class accuracy — Mosaic only lowers
    DEFAULT dot precision, which is a single bf16 pass (measured 3e-2
    relative residual at 512^3: unusable), so the compensation is done
    by hand.
  * the twiddle stage is elementwise VPU work with (N2,) row/col tables.

Each axis pass is exactly one HBM read + one HBM write of the field —
a statement about TRAFFIC, not time: at the bf16x6 (HIGHEST) tier the
pass TIME is MXU-bound by the compensation matmuls (2*N2*6 bf16 MACs
per element vs 8 bytes of HBM; the 512^3 device trace in
artifacts/fht_profile_512.md puts the solve at 86% of its 12.6 ms MXU
bound, every pass at 79-95% of per-pass bound). The x3 benchmark tier
sits within 1.4x of max(HBM, MXU). Six products per element is the
floor for the 1e-6 class — the same set XLA's own HIGHEST f32
emulation runs. The modal Poisson inversion
(1/(lam_x+lam_y+lam_z), null modes pinned, per-axis 1/N normalizations
folded in) is FUSED with the last forward axis AND that axis's inverse in
a single "modal" kernel, so a fully periodic solve is 5 passes:

    fwd x | fwd y | [fwd z + scale + inv z] | inv y | inv x

Reference role: the cuFFT pipeline of include/poisson_solver_fft.hpp:18-181
(and the FFT_MPI pencil variant) — here as a TPU-native real-to-real
transform with no complex unpacking and no HBM transposes.

Layout contract (matches ops/pallas_kernels.py): arrays are (x, y, z) with
z on the 128-wide lane dimension. Per axis:
  axis 0 (x): grid (Y/TY, Z/TZ), block (X, TY, TZ), loop over TY rows;
              transform runs over sublanes (row slices + left matmuls)
  axis 1 (y): grid (X, Z/TZ),    block (1, Y, TZ);  same row layout
  axis 2 (z): grid (X, Y/TY),    block (1, TY, Z);  transform over lanes
              (lane slices + right matmuls)
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# Axis constants
# ---------------------------------------------------------------------------


def _split_mxu(N: int) -> Optional[Tuple[int, int]]:
    """Pick N = N1*N2 with N2 MXU-friendly and the scalar stage short."""
    for n2 in (128, 256, 192, 64, 96, 160, 224, 32):
        if N % n2 == 0 and N // n2 <= 8:
            return N // n2, n2
    return None


@dataclasses.dataclass(frozen=True)
class PFHTAxis:
    """Constants for one periodic axis of length N = N1*N2 (N2 fast digit).

    Same digit convention as fht.FHTAxis (n = n1*N2 + n2, output position
    p = k1*N2 + k2 holding true wavenumber k = k1 + N1*k2) but split for
    the MXU: H1 is kept as PYTHON floats (it becomes scalar VPU weights
    inside the kernel), and the cos/sin tables are pre-concatenated and
    hi/lo-split into bf16 pairs for the 3-pass compensated matmul.
    """

    N: int
    N1: int
    N2: int
    H1: tuple                  # N1 x N1 nested tuple of python floats
    csv: tuple                 # (2*N2, N2) bf16 splits (a1, a2, a3): [[C2],[S2]]
    csr: tuple                 # (N2, 2*N2) bf16 splits:  [C2 | S2]
    csv_f: jnp.ndarray         # full-precision variants (f64 exact mode)
    csr_f: jnp.ndarray
    ctw: jnp.ndarray           # (N1, N2) twiddle cos(2 pi k1 n2 / N)
    stw: jnp.ndarray           # (N1, N2)

    @classmethod
    def make(cls, N: int, dtype,
             n2: Optional[int] = None) -> Optional["PFHTAxis"]:
        """`n2` forces the fast-digit size (N % n2 == 0, N/n2 <= 8) —
        the MXU matmul work per element is proportional to N2 (2*N1*N2^2
        MACs per N-line = 2*N*N2), so a smaller legal N2 trades MXU
        flops for more VPU group combines; see scripts/profile_fht.py
        for the measured trade."""
        if n2 is not None:
            sp = (N // n2, n2) if (N % n2 == 0 and N // n2 <= 8) else None
        else:
            sp = _split_mxu(N)
        if sp is None:
            return None
        N1, N2 = sp
        k1 = np.arange(N1)
        k2 = np.arange(N2)
        ang1 = 2 * np.pi * np.outer(k1, k1) / N1
        H1 = np.cos(ang1) + np.sin(ang1)
        # snap the +-1/0 entries exactly (N1 in {1,2,4} is all +-1)
        H1 = np.where(np.abs(H1) < 1e-12, 0.0, H1)
        H1 = np.where(np.abs(H1 - 1) < 1e-12, 1.0, H1)
        H1 = np.where(np.abs(H1 + 1) < 1e-12, -1.0, H1)
        ang2 = 2 * np.pi * np.outer(k2, k2) / N2
        C2 = np.cos(ang2)
        S2 = np.sin(ang2)
        csv = np.concatenate([C2, S2], axis=0)          # (2N2, N2)
        csr = np.concatenate([C2, S2], axis=1)          # (N2, 2N2)
        th = 2 * np.pi * np.outer(k1, k2) / N

        def splits(a):
            """Three cascading bf16 splits: a ~= a1 + a2 + a3 to ~24
            mantissa bits (the table side of the compensated matmuls)."""
            out, r = [], a
            for _ in range(3):
                s = r.astype(jnp.bfloat16)
                out.append(jnp.asarray(s))
                r = r - np.asarray(s, np.float64)
            return tuple(out)

        return cls(N=N, N1=N1, N2=N2,
                   H1=tuple(tuple(float(w) for w in row) for row in H1),
                   csv=splits(csv), csr=splits(csr),
                   csv_f=jnp.asarray(csv, dtype),
                   csr_f=jnp.asarray(csr, dtype),
                   ctw=jnp.asarray(np.cos(th), dtype),
                   stw=jnp.asarray(np.sin(th), dtype))

    def lam_permuted(self, lam: np.ndarray) -> np.ndarray:
        """out[k1*N2 + k2] = lam[k1 + N1*k2] (same as FHTAxis)."""
        return lam.reshape(self.N2, self.N1).T.reshape(-1)


def axis_supported(n: int) -> bool:
    """Can this periodic axis run the Pallas four-step? Needs an
    MXU-friendly factorization and a floor below which the dense matmul
    already wins."""
    return n >= 64 and _split_mxu(n) is not None


# ---------------------------------------------------------------------------
# In-kernel math. `lane=True`: transform digit runs over lanes (axis 2),
# values are (B, N) and matmuls are right-side. `lane=False`: transform
# runs over rows (axes 0/1), values are (N, B) and matmuls are left-side.
# ---------------------------------------------------------------------------


def _scalar_comb(groups, weights):
    """sum_i w_i * groups[i] with w in {0,+-1} as pure adds/subs."""
    acc = None
    for g, w in zip(groups, weights):
        if w == 0.0:
            continue
        term = g if w == 1.0 else (-g if w == -1.0 else g * w)
        acc = term if acc is None else acc + term
    return acc


def _mm(u, tabs, tf, lane, exact, passes):
    """Compensated bf16 matmul against a constant table.

    u (f32) is split into cascading bf16 parts u1+u2(+u3) and the table
    into t1+t2(+t3); `passes`=3 sums the products with combined weight
    >= 2^-16 (u1t1 + u1t2 + u2t1: the bf16x3 / Precision.HIGH class,
    ~1e-4 relative on the full solve) and `passes`=6 down to 2^-24
    (+ u1t3 + u2t2 + u3t1: the bf16x6 / HIGHEST class). Mosaic's only
    lowerable dot precision is DEFAULT (one bf16 pass, ~3e-2 on the
    solve), so the compensation is done by hand. `exact` (f64 interpret
    mode) uses the full-precision table directly.
    """
    f32 = jnp.float32
    if exact:
        return jnp.dot(u, tf) if lane else jnp.dot(tf, u)
    t1, t2, t3 = tabs
    u1 = u.astype(jnp.bfloat16)
    r = u - u1.astype(u.dtype)
    u2 = r.astype(jnp.bfloat16)

    def dot(a, b):
        return (jnp.dot(a, b, preferred_element_type=f32) if lane
                else jnp.dot(b, a, preferred_element_type=f32))

    out = dot(u1, t1) + dot(u1, t2) + dot(u2, t1)
    if passes >= 6:
        u3 = (r - u2.astype(u.dtype)).astype(jnp.bfloat16)
        out = out + dot(u1, t3) + dot(u2, t2) + dot(u3, t1)
    return out.astype(u.dtype)


def _slice_groups(v, N1, N2, lane):
    if lane:
        return [v[:, i * N2:(i + 1) * N2] for i in range(N1)]
    return [v[i * N2:(i + 1) * N2, :] for i in range(N1)]


def _tw(tab, k1, lane):
    row = tab[k1]                         # (N2,)
    return row.reshape(1, -1) if lane else row.reshape(-1, 1)


def _fwd_groups(v, t: PFHTAxis, ctw, stw, tabs, lane, exact, passes):
    """Forward Hartley: returns the N1 output groups (digit-permuted).

    Table orientation: lane-side (B, 2N2) @ csv (2N2, N2); row-side
    csr (N2, 2N2) @ (2N2, B) — csr = csv^T (C2/S2 are symmetric).
    """
    N1, N2 = t.N1, t.N2
    cs3, cs_f = tabs["v" if lane else "r"]
    xs = _slice_groups(v, N1, N2, lane)
    tt = [_scalar_comb(xs, t.H1[k]) for k in range(N1)]
    out = []
    for k1 in range(N1):
        tf = tt[(N1 - k1) % N1]
        c = _tw(ctw, k1, lane)
        s = _tw(stw, k1, lane)
        u_c = c * tt[k1] + s * tf
        u_s = c * tf - s * tt[k1]
        u = (jnp.concatenate([u_c, u_s], axis=1) if lane
             else jnp.concatenate([u_c, u_s], axis=0))
        out.append(_mm(u, cs3, cs_f, lane, exact, passes))
    return out


def _inv_groups(Xg, t: PFHTAxis, ctw, stw, tabs, lane, exact, passes):
    """UNNORMALIZED inverse from the N1 modal groups (adjoint; the 1/N
    factors are folded into the fused modal scale). Opposite table
    orientation to the forward: lane-side (B, N2) @ csr (N2, 2N2)."""
    N1, N2 = t.N1, t.N2
    cs3, cs_f = tabs["r" if lane else "v"]
    a1, a2 = [], []
    for k1 in range(N1):
        # [v_c | v_s] in one fused matmul against [C2 | S2]
        vcs = _mm(Xg[k1], cs3, cs_f, lane, exact, passes)
        if lane:
            v_c, v_s = vcs[:, :N2], vcs[:, N2:]
        else:
            v_c, v_s = vcs[:N2, :], vcs[N2:, :]
        c = _tw(ctw, k1, lane)
        s = _tw(stw, k1, lane)
        a1.append(c * v_c - s * v_s)
        a2.append(s * v_c + c * v_s)
    out = []
    for n1 in range(N1):
        w1 = t.H1[n1]
        w2 = tuple(t.H1[n1][(N1 - k) % N1] for k in range(N1))
        x1 = _scalar_comb(a1, w1)
        x2 = _scalar_comb(a2, w2)
        out.append(x1 + x2)
    return out


# ---------------------------------------------------------------------------
# Tiling policy
# ---------------------------------------------------------------------------


def _tile(n: int, target: int, quantum: int) -> int:
    """Largest divisor of n that is <= target AND a multiple of `quantum`
    (the Mosaic sublane/lane block constraint); n itself (= whole dim,
    always legal) when no such divisor exists."""
    best = 0
    for d in range(quantum, min(n, target) + 1, quantum):
        if n % d == 0:
            best = d
    return best or n


_TILE_BYTES = 1 << 20     # ~1 MB blocks: deep pipeline, small VMEM footprint


def _specs(shape, axis, dtype):
    """(grid, block, index_map) for a per-axis pencil pass.

    Mosaic block constraint: the last two block dims must be multiples of
    (8, 128) or the full array dims — hence the sublane/lane quanta."""
    X, Y, Z = shape
    isz = jnp.dtype(dtype).itemsize
    if axis == 0:
        # block (X, TY, TZ); the kernel loops over the TY sublane rows
        tz = _tile(Z, 128, 128)
        ty = _tile(Y, max(_TILE_BYTES // (X * tz * isz), 8), 8)
        return ((Y // ty, Z // tz), (X, ty, tz),
                lambda j, k: (0, j, k))
    if axis == 1:
        tz = _tile(Z, max(_TILE_BYTES // (Y * isz), 128), 128)
        return (X, Z // tz), (1, Y, tz), lambda i, k: (i, 0, k)
    ty = _tile(Y, max(_TILE_BYTES // (Z * isz), 8), 8)
    return (X, Y // ty), (1, ty, Z), lambda i, j: (i, j, 0)


def _const_spec(tab):
    """Whole-table VMEM spec for the cas/twiddle constants."""
    return pl.BlockSpec(tab.shape, lambda *_: (0,) * tab.ndim,
                        memory_space=pltpu.VMEM)


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _kernel(ref_in, v1, v2, v3, vf, r1, r2, r3, rf, ctw, stw, ref_out, *,
            t, inverse, axis, exact, passes):
    lane = axis == 2
    tw_c, tw_s = ctw[:], stw[:]
    tabs = {"v": ((v1[:], v2[:], v3[:]), vf[:]),
            "r": ((r1[:], r2[:], r3[:]), rf[:])}

    def run(v, out_write):
        if inverse:
            groups = _slice_groups(v, t.N1, t.N2, lane)
            out = _inv_groups(groups, t, tw_c, tw_s, tabs, lane, exact,
                              passes)
        else:
            out = _fwd_groups(v, t, tw_c, tw_s, tabs, lane, exact,
                              passes)
        for k1, g in enumerate(out):
            out_write(k1, g)

    N2 = t.N2
    if axis == 0:
        # Fold the (TY, TZ) minor dims into one batch width instead of a
        # per-row python loop: row-major (X, TY, TZ) -> (X, TY*TZ) is a
        # free reinterpret, and the matmuls run at B = TY*TZ lanes (the
        # device trace showed the per-row variant at ~44-66% MXU
        # efficiency vs ~85% for the single-run axis-1 pass).
        X, TY, TZ = ref_in.shape

        def write(k1, g):
            ref_out[k1 * N2:(k1 + 1) * N2, :, :] = g.reshape(N2, TY, TZ)
        run(ref_in[:].reshape(X, TY * TZ), write)
    elif axis == 1:
        def write(k1, g):
            ref_out[0, k1 * N2:(k1 + 1) * N2, :] = g
        run(ref_in[0], write)
    else:
        def write(k1, g):
            ref_out[0, :, k1 * N2:(k1 + 1) * N2] = g
        run(ref_in[0], write)


def _kernel_modal(ref_in, v1, v2, v3, vf, r1, r2, r3, rf, ctw, stw,
                  lam_rest_ref, lam_ax_ref, ref_out, *, t, axis, exact,
                  thr, norm, passes):
    """Fused [forward + modal inversion + inverse] along the last axis:
    the whole Poisson mode space lives in this one kernel pass."""
    lane = axis == 2
    N1, N2 = t.N1, t.N2
    tw_c, tw_s = ctw[:], stw[:]
    tabs = {"v": ((v1[:], v2[:], v3[:]), vf[:]),
            "r": ((r1[:], r2[:], r3[:]), rf[:])}

    def run(v, lam_rest_row, out_write):
        Xg = _fwd_groups(v, t, tw_c, tw_s, tabs, lane, exact, passes)
        lr = (lam_rest_row.reshape(-1, 1) if lane
              else lam_rest_row.reshape(1, -1))
        scaled = []
        for k1, g in enumerate(Xg):
            la = lam_ax_ref[0, k1 * N2:(k1 + 1) * N2]
            la = la.reshape(1, -1) if lane else la.reshape(-1, 1)
            denom = la + lr
            null = jnp.abs(denom) < thr
            inv = jnp.where(null, 0.0,
                            norm / jnp.where(null, 1.0, denom))
            scaled.append(g * inv)
        out = _inv_groups(scaled, t, tw_c, tw_s, tabs, lane, exact,
                          passes)
        for k1, g in enumerate(out):
            out_write(k1, g)

    if axis == 0:
        # batched minor dims, same as _kernel's axis-0 fold
        X, TY, TZ = ref_in.shape

        def write(k1, g):
            ref_out[k1 * N2:(k1 + 1) * N2, :, :] = g.reshape(N2, TY, TZ)
        run(ref_in[:].reshape(X, TY * TZ),
            lam_rest_ref[:].reshape(TY * TZ), write)
    elif axis == 1:
        def write(k1, g):
            ref_out[0, k1 * N2:(k1 + 1) * N2, :] = g
        run(ref_in[0], lam_rest_ref[0, 0], write)
    else:
        def write(k1, g):
            ref_out[0, :, k1 * N2:(k1 + 1) * N2] = g
        run(ref_in[0], lam_rest_ref[0, 0], write)


def _tables(t: PFHTAxis, exact):
    """Both orientations (v = (2N2, N2), r = (N2, 2N2)) ride along; in
    exact mode the split slots carry the full tables (static signature,
    unused)."""
    if exact:
        return (t.csv_f,) * 4 + (t.csr_f,) * 4 + (t.ctw, t.stw)
    return (t.csv + (t.csv_f,) + t.csr + (t.csr_f,) + (t.ctw, t.stw))


def _exact(dtype):
    return jnp.dtype(dtype) != jnp.float32


def fht_pallas(f, axis: int, t: PFHTAxis, *, inverse=False, passes=3,
               precision=None, interpret=False):
    """One bandwidth-roofline Hartley pass along `axis` of a 3-D array.

    `passes`: 3 = bf16x3 (HIGH-class) compensation, 6 = bf16x6
    (HIGHEST-class). `precision` is accepted for API symmetry but
    ignored (Mosaic lowers only DEFAULT dot precision — accuracy comes
    from the in-kernel compensation)."""
    del precision
    grid, block, imap = _specs(f.shape, axis, f.dtype)
    # interpret mode (CPU tests) still runs the split-compensated path
    # for f32, so the exact algebra shipped to the TPU is what CI gates
    exact = _exact(f.dtype)
    tabs = _tables(t, exact)
    kern = functools.partial(_kernel, t=t, inverse=inverse, axis=axis,
                             exact=exact, passes=passes)
    spec = pl.BlockSpec(block, imap, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(f.shape, f.dtype),
        grid=grid,
        in_specs=[spec] + [_const_spec(a) for a in tabs],
        out_specs=spec,
        interpret=interpret,
    )(f, *tabs)


def fht_pallas_modal(f, axis: int, t: PFHTAxis, lam_axis, lam_rest, *,
                     thr: float, norm: float, passes=3,
                     precision=None, interpret=False):
    """Fused [forward + modal Poisson inversion + inverse] along `axis`.

    lam_axis: (N,) symbol of this axis in DIGIT-PERMUTED order.
    lam_rest: 2-D symbol sum over the other two axes (their modal
    orders), shape = f.shape without `axis`. `norm` multiplies the
    inverse (folds ALL per-axis 1/N Hartley normalizations); `thr` pins
    (near-)null modes to zero exactly as FDMPoissonSolver._inv_lam.
    """
    del precision
    grid, block, imap = _specs(f.shape, axis, f.dtype)
    dt = f.dtype
    exact = _exact(dt)
    tabs = _tables(t, exact)
    lam_axis = jnp.asarray(lam_axis, dt).reshape(1, -1)
    lam_rest = jnp.asarray(lam_rest, dt)
    spec = pl.BlockSpec(block, imap, memory_space=pltpu.VMEM)
    ax_spec = pl.BlockSpec((1, lam_axis.shape[1]), lambda *_: (0, 0),
                           memory_space=pltpu.VMEM)
    if axis == 0:
        # grid (Y/TY, Z/TZ); rest dims (y, z), blocks (TY, TZ)
        rest_spec = pl.BlockSpec((block[1], block[2]),
                                 lambda j, k: (j, k),
                                 memory_space=pltpu.VMEM)
    elif axis == 1:
        # grid (X, Z/TZ); rest dims (x, z) viewed (X, 1, Z) so the
        # (1, 1, tz) block satisfies the sublane constraint
        lam_rest = lam_rest.reshape(lam_rest.shape[0], 1,
                                    lam_rest.shape[1])
        rest_spec = pl.BlockSpec((1, 1, block[2]),
                                 lambda i, k: (i, 0, k),
                                 memory_space=pltpu.VMEM)
    else:
        # grid (X, Y/TY); rest dims (x, y) viewed (X, 1, Y)
        lam_rest = lam_rest.reshape(lam_rest.shape[0], 1,
                                    lam_rest.shape[1])
        rest_spec = pl.BlockSpec((1, 1, block[1]),
                                 lambda i, j: (i, 0, j),
                                 memory_space=pltpu.VMEM)
    kern = functools.partial(_kernel_modal, t=t, axis=axis, exact=exact,
                             thr=thr, norm=norm, passes=passes)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(f.shape, f.dtype),
        grid=grid,
        in_specs=[spec] + [_const_spec(a) for a in tabs]
                 + [rest_spec, ax_spec],
        out_specs=spec,
        interpret=interpret,
    )(f, *tabs, lam_rest, lam_axis)


# ---------------------------------------------------------------------------
# jnp reference (used by FDMPoissonSolver._residual_norm and the parity
# tests; NOT a hot path)
# ---------------------------------------------------------------------------


def reference_forward(x, axis: int, t: PFHTAxis, precision=None):
    """Dense-matrix Hartley along `axis` in the SAME digit-permuted order
    as the Pallas kernels (for modal-space residual checks)."""
    N = t.N
    k1 = np.arange(t.N1)
    k2 = np.arange(t.N2)
    p = (k1[:, None] * t.N2 + k2[None, :]).reshape(-1)      # array order
    k = (k1[:, None] + t.N1 * k2[None, :]).reshape(-1)      # wavenumber
    n = np.arange(N)
    ang = 2 * np.pi * np.outer(k, n) / N
    H = np.cos(ang) + np.sin(ang)                           # row i: mode k[i]
    Hp = np.zeros_like(H)
    Hp[p, :] = H
    M = jnp.asarray(Hp, x.dtype)
    sub = {0: "ab,byz->ayz", 1: "ab,xbz->xaz", 2: "ab,xyb->xya"}[axis]
    return jnp.einsum(sub, M, x, precision=precision,
                      preferred_element_type=x.dtype)
