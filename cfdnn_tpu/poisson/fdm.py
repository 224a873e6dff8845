"""Fast-diagonalization pressure-Poisson solver (the TPU-native workhorse).

Replaces the reference's whole FFT solver family — FFT (3D, include/
poisson_solver_fft.hpp), FFT2D, FFT1D (include/poisson_solver_fft1d.hpp:14-60),
FFT_MPI — and the HYPRE backend, for every tensor-product mesh:

  L = Lx (+) Ly (+) Lz  (Kronecker sum of 1-D discrete Laplacians)

Per axis the transform that diagonalizes the 1-D operator is
  - periodic + uniform  -> real FFT (eigenvalues (2 cos(2 pi k/N) - 2)/h^2)
  - wall/inflow/outflow (uniform OR stretched) -> a precomputed dense
    eigenbasis: the stretched operator L1 = D^-1 S (S symmetric, D = diag(cell
    widths)) is symmetrized as M = D^1/2 L1 D^-1/2, eigendecomposed in float64
    on the host, and applied as a single (N,N) matmul on the MXU.

So a channel solve is rfft(x) . fft(z) . matmul(y) . scale . inverse — a
handful of batched FFTs and MXU matmuls, no iteration, machine-precision
residual. This subsumes the reference's cuFFT+cuSPARSE tridiagonal pipeline
(its per-mode y-tridiagonal solve becomes the y eigen-matmul) and is exactly
consistent with ops.operators.laplacian / pressure_grad_face, so projection
drives the discrete divergence to roundoff.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..config import BCType, Config, pressure_bc_kinds
from ..mesh import Mesh





@dataclasses.dataclass(frozen=True)
class PoissonStats:
    """Per-solve observability (reference PoissonStats, solver.hpp:123-166):
    cycle count, status string, relative residual norms."""

    cycles: int
    status: str                 # DIRECT | FIXED | TOL | MAX_CYCLES
    rel_residual: float


@dataclasses.dataclass
class _AxisTransform:
    kind: str                      # 'fft' | 'eig' | 'fht' | 'none'
    lam: np.ndarray                # eigenvalues (modal Laplacian symbol)
    V: Optional[np.ndarray] = None     # eig: inverse-transform matrix
    Vinv: Optional[np.ndarray] = None  # eig: forward-transform matrix
    fht: Optional[object] = None       # fht: FHTAxis constants


def _periodic_eig(ax, order: int) -> _AxisTransform:
    """Real orthogonal eigenbasis of the periodic circulant Laplacian.

    MXU alternative to the FFT: the symmetric circulant (3- or 5-banded for
    O2/O4) eigen-decomposed in float64; forward/inverse are (N, N) matmuls.
    Same modal symbol as the FFT path to roundoff, but runs on the MXU —
    measured ~6x faster than XLA's TPU FFT lowering at 128^3.
    """
    n, h = ax.n, ax.h
    L = np.zeros((n, n))
    idx = np.arange(n)
    if order >= 4 and n >= 4:
        # O4 staggered gradient G (face i from cells, ops c2f_diff4):
        # (n >= 4 matches the operators' o4_ok gate, ops/grid.py — the
        # wrap collisions at n in {4, 5} accumulate via +=, keeping
        # L = -G^T G the exact discrete composition)
        # [+1, -27, +27, -1]/(24h) at cell offsets (i-2, i-1, i, i+1);
        # the matching divergence is D = -G^T, so L = D G = -G^T G.
        Gm = np.zeros((n, n))
        for i in range(n):
            Gm[i, (i - 2) % n] += 1.0 / (24.0 * h)
            Gm[i, (i - 1) % n] += -27.0 / (24.0 * h)
            Gm[i, i % n] += 27.0 / (24.0 * h)
            Gm[i, (i + 1) % n] += -1.0 / (24.0 * h)
        L = -(Gm.T @ Gm)
        L = 0.5 * (L + L.T)
    else:
        L[idx, idx] = -2.0 / (h * h)
        L[idx, (idx + 1) % n] += 1.0 / (h * h)
        L[idx, (idx - 1) % n] += 1.0 / (h * h)
    lam, Q = np.linalg.eigh(L)
    return _AxisTransform(kind="eig", lam=lam, V=Q, Vinv=Q.T)


def _axis_transform(ax, bc: BCType, kinds: Tuple[str, str],
                    order: int = 2, periodic_matmul: bool = False
                    ) -> _AxisTransform:
    n = ax.n
    if n == 1:
        return _AxisTransform(kind="none", lam=np.zeros(1))
    if bc == BCType.PERIODIC:
        if not ax.uniform:
            raise ValueError("FDM Poisson requires uniform spacing on periodic axes")
        if periodic_matmul:
            return _periodic_eig(ax, order)
        k = np.arange(n)
        if order >= 4 and n >= 4:
            # symbol of the O4 staggered D(G): -s(k)^2 with
            # s = (27 sin(kh/2) - sin(3kh/2)) / (12 h)
            # (reference O4-consistent eigenvalues, poisson_solver_fft.hpp:32-35)
            th = np.pi * k / n
            s = (27.0 * np.sin(th) - np.sin(3.0 * th)) / (12.0 * ax.h)
            lam = -(s * s)
        else:
            lam = (2.0 * np.cos(2.0 * np.pi * k / n) - 2.0) / (ax.h * ax.h)
        return _AxisTransform(kind="fft", lam=lam)
    lo, hi = kinds
    aS, aP, aN = ax.laplacian_metrics(periodic=False, lo=lo, hi=hi)
    L1 = np.diag(aP) + np.diag(aN[:-1], 1) + np.diag(aS[1:], -1)
    d = ax.d
    Dh = np.sqrt(d)
    M = (Dh[:, None] * L1) / Dh[None, :]
    M = 0.5 * (M + M.T)  # clean symmetrization (roundoff)
    lam, Q = np.linalg.eigh(M)
    V = Q / Dh[:, None]            # L1 = V diag(lam) V^-1
    Vinv = Q.T * Dh[None, :]
    return _AxisTransform(kind="eig", lam=lam, V=V, Vinv=Vinv)


class FDMPoissonSolver:
    """Direct tensor-product Poisson solver; jit-traceable `solve(rhs)`."""

    def __init__(self, mesh: Mesh, cfg: Config, dtype=None,
                 transform: str = None, geom=None, pencil: bool = False):
        """transform: 'fft' | 'matmul' | 'fht' | 'pallas_fft' | 'auto'
        for the periodic axes; None reads `cfg.poisson_transform` (the
        CLI-facing knob, reference analogue: the Poisson tuning fields
        of config.hpp:65-234). 'matmul' diagonalizes via real eigenbases
        on the MXU; 'fht' is the factorized fast-Hartley opt-in
        (poisson/fht.py — see its PERF NOTE for why it is not the
        default); 'pallas_fft' the in-VMEM four-step Hartley
        (poisson/pallas_fht.py); 'auto' picks per device/size/tier.
        `geom` (ops.grid.Geometry) enables iterative refinement
        (cfg.poisson_refine) via the consistent stencil Laplacian.
        `pencil`: the solver will be wrapped by a parallel/pencil.py
        transpose solve, which needs length-preserving per-axis
        transforms — 'auto' then never resolves to 'fft' (rfft halves
        the last axis)."""
        if transform is None:
            transform = getattr(cfg, "poisson_transform", "auto")
        if transform not in ("fft", "matmul", "fht", "pallas_fft", "auto"):
            raise ValueError(f"transform={transform!r} — expected one of "
                             "'fft' | 'matmul' | 'fht' | 'pallas_fft' | "
                             "'auto'")
        self.dtype = jnp.dtype(dtype or cfg.poisson_dtype or cfg.dtype)
        self.geom = geom
        import jax as _jax
        _precisions = {
            "default": None,
            "high": _jax.lax.Precision.HIGH,
            "highest": _jax.lax.Precision.HIGHEST,
        }
        big = max(mesh.x.n, mesh.y.n, mesh.z.n) >= 384
        prec = cfg.poisson_matmul_precision
        if prec == "auto":
            # Measured on v5e at 512^3 (f32, smooth RHS): one HIGHEST
            # (bf16x6) solve = 33.7 ms at rel residual 1.36e-4, vs
            # HIGH + 1 refinement = 54.4 ms at 7.7e-5 — refinement's
            # extra digit is not worth 60% more solve time, and HIGHEST
            # alone bounds the error as cond(L)*eps_bf16x6. Below 384 the
            # transforms are bandwidth-bound and HIGH already sits at the
            # f32 floor, so the extra passes would be pure cost.
            #
            # Benchmark/perf mode at large N relaxes to HIGH (bf16x3):
            # full matrix re-measured (v5e, 512^3, f32): HIGH 17.3 ms
            # @ 7.9e-3 rel residual vs HIGHEST 30.7 ms @ 6.9e-5. The
            # reference's own --benchmark mode runs MG at 2 fixed
            # V-cycles (~1e-2-class residual, README.md:728-756), so
            # HIGH matches the accuracy class of the number we compare
            # against while cutting the 512^3 step by ~25%. Physics
            # runs (benchmark=False) keep HIGHEST.
            bench = bool(getattr(cfg, "benchmark", False)
                         or getattr(cfg, "perf_mode", False))
            prec = ("high" if bench else "highest") \
                if (big and self.dtype != jnp.float64) else "high"
            self._bench_relaxed = bench and big
        else:
            self._bench_relaxed = False
        if prec not in _precisions:
            raise ValueError(
                f"poisson_matmul_precision={cfg.poisson_matmul_precision!r}"
                f" — expected one of {sorted(_precisions) + ['auto']}")
        self.precision = _precisions[prec]
        self.precision_name = prec
        self.refine = cfg.poisson_refine
        if self.refine < 0:
            # auto: f64 is already at 1e-14; in f32 the auto-HIGHEST
            # transforms hold large grids at ~1e-4 relative residual
            # without refinement (see above); a user-forced HIGH at large
            # N still gets one refinement pass to recover the lost digits
            if (self.dtype == jnp.float64 or prec == "highest"
                    or self._bench_relaxed):
                # benchmark-relaxed HIGH deliberately accepts the
                # ~8e-3-class residual (reference benchmark-mode parity);
                # a refinement pass would give back the entire saving
                # (measured: 512^3 step 55 -> 77 ms with refine=1)
                self.refine = 0
            else:
                self.refine = 1 if big else 0
        if geom is None:
            self.refine = 0
        import jax
        try:
            plat = jax.devices()[0].platform.lower()
        except Exception:
            plat = "cpu"
        on_tpu = plat.startswith("tpu") or plat == "axon"
        if transform == "auto":
            # matmul (MXU eigenbasis) only on TPUs ("tpu", or "axon" for
            # the tunneled TPU plugin); GPU gets cuFFT via XLA's fft
            # lowering, CPU gets pocketfft — NOT the dense matmuls.
            # At >=384 the dense transforms turn MXU-flop-bound (O(N)
            # work per cell) and the Pallas four-step FHT wins. Needs
            # factorable axis lengths; _build_axis falls back to the
            # dense eigenbasis per axis.
            #
            # Round-4 measurement after the axis-0 minor-dim batching
            # fix (scripts/profile_fht.py, artifacts/fht_profile_512.md):
            # at 512^3 the split kernels now win EVERY tier/BC combo —
            # periodic 2.00x (physics) / 1.50x (benchmark), walls-y
            # 1.57x / 1.36x (the round-3 walls-y benchmark 0.98x loss is
            # gone). At 256^3 the differences are +-0.2 ms either way
            # (0.83x..1.30x), so the cutover stays at `big`.
            if on_tpu and big and self.dtype == jnp.float32:
                transform = "pallas_fft"
            elif on_tpu or pencil:
                transform = "matmul"
            else:
                transform = "fft"
        self._fht_interpret = not on_tpu
        if (transform == "pallas_fft" and on_tpu
                and self.dtype != jnp.float32):
            # Mosaic cannot lower f64 dots, and bf16 inputs would
            # silently skip the compensated-precision path — fail loudly
            # instead of at kernel-compile time (advisor round 3).
            raise ValueError(
                f"transform='pallas_fft' requires float32 on TPU (got "
                f"{self.dtype}); use transform='matmul' (dense eigenbasis"
                ") for f64 physics runs")
        self.transform = transform
        bcs = (cfg.bc_x, cfg.bc_y, cfg.bc_z)

        def _build_axis(a, axd, bc):
            kinds = pressure_bc_kinds(cfg, a)
            if (transform == "pallas_fft" and bc == BCType.PERIODIC
                    and axd.n > 1):
                # Pallas in-VMEM four-step (poisson/pallas_fht.py): MXU
                # split constants + digit-permuted symbol; dense-
                # eigenbasis fallback when the length doesn't factor or
                # is too small to beat the matmul
                from .pallas_fht import PFHTAxis, axis_supported
                fx = (PFHTAxis.make(axd.n, self.dtype)
                      if axis_supported(axd.n) else None)
                if fx is not None:
                    base = _axis_transform(axd, bc, kinds,
                                           order=cfg.space_order,
                                           periodic_matmul=False)
                    return _AxisTransform(kind="fht",
                                          lam=fx.lam_permuted(base.lam),
                                          fht=fx)
                return _axis_transform(axd, bc, kinds,
                                       order=cfg.space_order,
                                       periodic_matmul=True)
            if transform == "fht" and bc == BCType.PERIODIC and axd.n > 1:
                # four-step Hartley: factorized cas matmuls, digit-permuted
                # modal order (poisson/fht.py); falls back to the dense
                # eigenbasis when N is too small or does not factor
                from .fht import FHTAxis
                fx = FHTAxis.make(axd.n, self.dtype) if axd.n >= 32 \
                    else None
                if fx is not None:
                    base = _axis_transform(axd, bc, kinds,
                                           order=cfg.space_order,
                                           periodic_matmul=False)
                    return _AxisTransform(kind="fht",
                                          lam=fx.lam_permuted(base.lam),
                                          fht=fx)
                return _axis_transform(axd, bc, kinds,
                                       order=cfg.space_order,
                                       periodic_matmul=True)
            return _axis_transform(axd, bc, kinds, order=cfg.space_order,
                                   periodic_matmul=(transform == "matmul"))

        self.tr = [
            _build_axis(a, axd, bc)
            for a, (axd, bc) in enumerate(zip((mesh.x, mesh.y, mesh.z), bcs))
        ]
        # rfft on the *last* FFT axis for the real-input bandwidth saving
        self.fft_axes = tuple(i for i, t in enumerate(self.tr) if t.kind == "fft")
        self.eig_axes = tuple(i for i, t in enumerate(self.tr) if t.kind == "eig")
        self.fht_axes = tuple(i for i, t in enumerate(self.tr) if t.kind == "fht")
        shape = [mesh.x.n, mesh.y.n, mesh.z.n]
        # invert, pinning (near-)null modes to zero => mean-free solution
        self.all_neumann = all(
            t.kind != "eig" or pressure_bc_kinds(cfg, a) == ("neumann", "neumann")
            for a, (t, b) in enumerate(zip(self.tr, bcs))
        )
        # every per-axis Laplacian eigenvalue is <= 0, so the extreme of
        # the Kronecker-sum symbol is the sum of per-axis extremes — no
        # need to materialize the N^3 lam_total on the host
        scale = sum(float(np.max(np.abs(t.lam))) for t in self.tr) or 1.0
        # Store the modal symbol factored as three 1-D eigenvalue vectors
        # (combined on the fly inside solve — XLA fuses the broadcast-add
        # into the scaling multiply). A materialized N^3 inv_lam would be
        # baked into the compiled program as a constant (512^3 => a 512 MB
        # HLO that overflows compile-RPC limits) AND cost one full extra
        # HBM read per solve.
        self._null_thr = float(1e-12 * scale)
        lam_vecs = []
        for i, t in enumerate(self.tr):
            v = t.lam
            if self.fft_axes and i == self.fft_axes[-1]:
                v = v[: shape[i] // 2 + 1]
            s = [1, 1, 1]
            s[i] = len(v)
            lam_vecs.append(jnp.asarray(v.reshape(s), self.dtype))
        self._lam_vecs = tuple(lam_vecs)
        self.mats = {
            i: (
                jnp.asarray(self.tr[i].Vinv, self.dtype),
                jnp.asarray(self.tr[i].V, self.dtype),
            )
            for i in self.eig_axes
        }
        self.name = "FDM(" + ",".join(
            t.kind for t in self.tr
        ) + f",{self.transform})"

    # -- helpers ----------------------------------------------------------

    def _lam_total(self):
        """Modal symbol L(kx,ky,kz) assembled from the per-axis vectors
        inside the trace (broadcast-add; fused by XLA — never materialized
        outside the consuming op)."""
        a, b, c = self._lam_vecs
        return a + b + c

    def _inv_lam(self):
        """1/L with (near-)null modes pinned to zero => mean-free solve."""
        L = self._lam_total()
        null = jnp.abs(L) < self._null_thr
        return jnp.where(null, 0.0, 1.0 / jnp.where(null, 1.0, L))

    _EINSUM_SUBS = {0: "ab,byz->ayz", 1: "ab,xbz->xaz", 2: "ab,xyb->xya"}

    def _apply_mat(self, mat, f, axis):
        """(N,N) transform along `axis` of a 3-D (possibly complex) array.

        Direct per-axis einsum (no moveaxis round trip): measured ~17%
        faster over the full 6-matmul solve on TPU."""
        if jnp.iscomplexobj(f):
            return (self._apply_mat(mat, f.real, axis)
                    + 1j * self._apply_mat(mat, f.imag, axis))
        return jnp.einsum(FDMPoissonSolver._EINSUM_SUBS[axis], mat, f,
                          preferred_element_type=mat.dtype,
                          precision=self.precision)

    # -- solve ------------------------------------------------------------

    def solve(self, rhs: jnp.ndarray) -> jnp.ndarray:
        """Direct solve + cfg.poisson_refine iterative-refinement passes.

        The eigenbasis-matmul transforms lose ~3 digits in f32 (smooth RHS
        concentrates into few large modal coefficients, and the MXU runs
        bf16 passes); each refinement re-applies the consistent stencil
        Laplacian (ops.operators.laplacian, exactly D.G) and solves for the
        correction, restoring post-projection divergence to the f32 floor.
        """
        p = self._solve_once(rhs)
        if self.refine:
            from ..ops import operators as _ops
            rhs0 = rhs - jnp.mean(rhs) if self.all_neumann else rhs
            for _ in range(self.refine):
                r = rhs0 - _ops.laplacian(p, self.geom)
                p = p + self._solve_once(r)
        return p

    def _solve_once(self, rhs: jnp.ndarray) -> jnp.ndarray:
        """Solve L p = rhs; the solution is null-mode-free for singular BCs.

        No explicit mean subtraction is needed (the reference's
        make_rhs_mean_free / device mean-subtraction kernels): the pinned
        zero entries of `inv_lam` annihilate the null-mode coefficient of
        the RHS and keep it out of the solution — an entire full-field
        reduction pass saved on each end (global reductions measure ~25x
        an elementwise pass on TPU).
        """
        if self.transform == "pallas_fft" and self.fht_axes:
            return self._solve_once_pallas(rhs)
        from .fht import fht_forward, fht_inverse
        f = rhs.astype(self.dtype)
        for i in self.eig_axes:
            f = self._apply_mat(self.mats[i][0], f, i)
        for i in self.fht_axes:
            f = fht_forward(f, i, self.tr[i].fht, precision=self.precision)
        if self.fft_axes:
            f = jnp.fft.rfftn(f, axes=self.fft_axes)
        f = f * self._inv_lam()
        if self.fft_axes:
            sizes = [rhs.shape[a] for a in self.fft_axes]
            f = jnp.fft.irfftn(f, s=sizes, axes=self.fft_axes)
        for i in self.fht_axes:
            f = fht_inverse(f, i, self.tr[i].fht, precision=self.precision)
        for i in self.eig_axes:
            f = self._apply_mat(self.mats[i][1], f, i)
        return f.astype(rhs.dtype)

    def _solve_once_pallas(self, rhs: jnp.ndarray) -> jnp.ndarray:
        """transform='pallas_fft': bandwidth-roofline per-axis Hartley
        passes, with [forward + modal inversion + inverse] of the LAST
        fht axis fused into one "modal" kernel (poisson/pallas_fht.py).
        Structure for all-periodic N^3:

            fht_x | fht_y | [fht_z + scale + ifht_z] | ifht_y | ifht_x

        = exactly five HBM read+write passes; eig axes (walls/
        stretching) keep their dense MXU matmuls around the fht core.
        The per-axis 1/N Hartley normalizations are folded into the
        fused scale, so the inverse kernels are pure adjoints (no extra
        elementwise pass).
        """
        from .pallas_fht import fht_pallas, fht_pallas_modal
        # compensation depth tracks the dense path's precision tiers:
        # HIGH (benchmark-relaxed) -> bf16x3, HIGHEST (physics) -> bf16x6
        passes = 3 if self.precision_name == "high" else 6
        f = rhs.astype(self.dtype)
        for i in self.eig_axes:
            f = self._apply_mat(self.mats[i][0], f, i)
        last = self.fht_axes[-1]
        for i in self.fht_axes[:-1]:
            f = fht_pallas(f, i, self.tr[i].fht, passes=passes,
                           interpret=self._fht_interpret)
        norm = 1.0
        for i in self.fht_axes:
            norm /= self.tr[i].fht.N
        rest_axes = tuple(a for a in range(3) if a != last)
        lam_rest = (self._lam_vecs[rest_axes[0]]
                    + self._lam_vecs[rest_axes[1]]).squeeze(last)
        f = fht_pallas_modal(
            f, last, self.tr[last].fht,
            self.tr[last].lam, lam_rest,
            thr=self._null_thr, norm=norm, passes=passes,
            interpret=self._fht_interpret)
        for i in reversed(self.fht_axes[:-1]):
            f = fht_pallas(f, i, self.tr[i].fht, inverse=True,
                           passes=passes, interpret=self._fht_interpret)
        for i in self.eig_axes:
            f = self._apply_mat(self.mats[i][1], f, i)
        return f.astype(rhs.dtype)

    def solve_with_stats(self, rhs):
        """solve() + residual observability (one extra operator apply)."""
        p = self.solve(rhs)
        # residual via the modal symbol: L p - rhs (mean-free part)
        r = self._residual_norm(rhs, p)
        return p, PoissonStats(cycles=0, status="DIRECT", rel_residual=r)

    def _residual_norm(self, rhs, p):
        from .fht import fht_forward
        from .pallas_fht import PFHTAxis, reference_forward

        def fwd(f):
            for i in self.eig_axes:
                f = self._apply_mat(self.mats[i][0], f, i)
            for i in self.fht_axes:
                t = self.tr[i].fht
                if isinstance(t, PFHTAxis):
                    # pallas axes: dense jnp reference in the SAME
                    # digit-permuted order (observability path only)
                    f = reference_forward(f, i, t,
                                          precision=self.precision)
                else:
                    f = fht_forward(f, i, t, precision=self.precision)
            if self.fft_axes:
                f = jnp.fft.rfftn(f, axes=self.fft_axes)
            return f

        f = fwd(p.astype(self.dtype))
        g = fwd(rhs.astype(self.dtype))
        null = jnp.abs(self._lam_total()) < self._null_thr
        lam = jnp.where(null, 0.0, self._lam_total())
        # the solver pins null modes by design, so compare on the
        # mean-free subspace: mask g's null component too (else a
        # machine-precision all-Neumann solve of a non-mean-free rhs
        # reports |mean(rhs)| as residual)
        g = jnp.where(null, 0.0, g)
        num = jnp.linalg.norm((lam * f - g).reshape(-1))
        den = jnp.maximum(jnp.linalg.norm(g.reshape(-1)), 1e-300)
        return num / den
