"""LES subgrid-scale models: Smagorinsky, WALE, Vreman, Sigma, dynamic
Smagorinsky.

TPU-native rebuild of the reference LES family (reference: include/
turbulence_les.hpp:24-156, src/turbulence_les.cpp per-cell nu_sgs kernels,
src/turbulence_les_dynamic_{germano,apply}.cpp two-pass Germano pipeline).
Each model is one fused jnp expression: gradient tensor -> nu_sgs, exactly
the fused gradient+nu_sgs GPU kernel the reference hand-writes per model.
The dynamic model's plane averages are plain jnp means over (x,z), which
under GSPMD become the reference's MPI allreduce of plane sums
(src/turbulence_les_dynamic_*.cpp set_decomposition) for free.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..config import BCType
from .base import (TurbulenceModelBase, cell_center_velocity, filter_width,
                   strain_rotation)


class LESModelBase(TurbulenceModelBase):
    """Shared: gradient tensor -> per-cell nu_sgs (subclass hook).

    On TPU (periodic uniform x, use_pallas != off) the whole pipeline runs
    as one fused x-slab Pallas kernel — the reference's per-model fused
    gradient+nu_sgs GPU kernels (turbulence_les.hpp update_gpu)."""

    def __init__(self, cfg, mesh, geom):
        self.cfg = cfg
        from ..ops.pallas_kernels import _auto_bxz, slab_fits
        n_dev = 1
        for d in (cfg.mesh_shape or (1,)):
            n_dev *= int(d)
        structural = (cfg.use_pallas != "off"
                      and geom.axes[0].periodic and geom.axes[0].uniform
                      and geom.axes[0].n >= 8 and geom.axes[2].n > 1)
        if structural and n_dev > 1:
            # multi-chip: slab kernel under shard_map with ppermute
            # halos (parallel/fused.py; GSPMD can't partition the call):
            # 1-D z-slab mesh -> "shard", 2-D (x,z) pencil -> "shard2d"
            # (x AND z halo families on the ICI torus).
            from ..parallel.fused import (sharded_slab_2d_eligible,
                                          sharded_slab_eligible)
            shape = tuple(cfg.mesh_shape or (1,))
            if len(shape) == 1:
                self._fuse = ("shard"
                              if sharded_slab_eligible(geom, cfg, n_dev)
                              else False)
            elif (len(shape) == 2 and sharded_slab_2d_eligible(
                    geom, cfg, int(shape[0]), int(shape[1]))):
                self._fuse = "shard2d"
            else:
                self._fuse = False
        elif structural and slab_fits(geom):
            self._fuse = "slab"
        elif (structural and geom.axes[2].periodic and geom.axes[2].uniform
              and _auto_bxz(geom.axes[0].n, geom.axes[1].n,
                            geom.axes[2].n) is not None):
            self._fuse = "xz"   # oversized y-z planes: 2-D tiling
        else:
            self._fuse = False

    def _nu_sgs(self, sr, delta):
        raise NotImplementedError

    def _model_fn(self, comps, geom):
        sr = strain_rotation(comps, geom)
        return self._nu_sgs(sr, filter_width(geom))

    def nu_t(self, state, sim):
        import jax
        comps = (state.u, state.v, state.w)
        on_cpu = jax.devices()[0].platform == "cpu"
        if self._fuse and (not on_cpu or sim.cfg.use_pallas == "on"):
            def fast(u, v, w):
                c = (u, v, w)
                if self._fuse == "shard":
                    from ..parallel.fused import sharded_fused_nu_sgs
                    return sharded_fused_nu_sgs(
                        *c, geom=sim.geom, mesh=sim.device_mesh,
                        axis_name=sim._mesh_axis,
                        model_fn=self._model_fn, interpret=on_cpu)
                if self._fuse == "shard2d":
                    from ..parallel.fused import sharded_fused_nu_sgs_2d
                    return sharded_fused_nu_sgs_2d(
                        *c, geom=sim.geom, mesh=sim.device_mesh,
                        x_axis=sim._mesh_axes[0],
                        z_axis=sim._mesh_axes[1],
                        model_fn=self._model_fn, interpret=on_cpu)
                if self._fuse == "xz":
                    from ..ops.pallas_kernels import fused_nu_sgs_xz
                    return fused_nu_sgs_xz(*c, geom=sim.geom,
                                           model_fn=self._model_fn,
                                           interpret=on_cpu)
                from ..ops.pallas_kernels import fused_nu_sgs
                return fused_nu_sgs(*c, geom=sim.geom,
                                    model_fn=self._model_fn,
                                    interpret=on_cpu)

            # vjp_via: fused forward inside jax.grad regions, backward
            # through the jnp model_fn (ml/adjoint a-posteriori paths)
            from ..solver import vjp_via
            return vjp_via(
                fast,
                lambda u, v, w: self._model_fn((u, v, w), sim.geom),
            )(*comps)
        return self._model_fn(comps, sim.geom)


class SmagorinskyModel(LESModelBase):
    """nu_sgs = (Cs Delta)^2 |S| (reference turbulence_les.hpp:55-66)."""

    name = "Smagorinsky"

    def __init__(self, cfg, mesh, geom, Cs: float = 0.17):
        super().__init__(cfg, mesh, geom)
        self.Cs = Cs

    def _nu_sgs(self, sr, delta):
        return (self.Cs * delta) ** 2 * sr.S_mag


class WALEModel(LESModelBase):
    """Wall-Adapting Local Eddy viscosity (Nicoud & Ducros 1999).

    nu_sgs = (Cw D)^2 (Sd:Sd)^{3/2} / ((S:S)^{5/2} + (Sd:Sd)^{5/4}),
    Sd_ij = 0.5(g_ik g_kj + g_jk g_ki) - (1/3) d_ij tr(g g)
    (reference turbulence_les.hpp:68-84).
    """

    name = "WALE"

    def __init__(self, cfg, mesh, geom, Cw: float = 0.325):
        super().__init__(cfg, mesh, geom)
        self.Cw = Cw

    def _nu_sgs(self, sr, delta):
        g = sr.G
        # g2 = g.g (matrix square)
        g2 = [[sum(g[i][m] * g[m][j] for m in range(3)) for j in range(3)]
              for i in range(3)]
        tr_g2 = g2[0][0] + g2[1][1] + g2[2][2]
        SdSd = 0.0
        for i in range(3):
            for j in range(3):
                Sd = 0.5 * (g2[i][j] + g2[j][i])
                if i == j:
                    Sd = Sd - tr_g2 / 3.0
                SdSd = SdSd + Sd * Sd
        SS = 0.5 * sr.S_mag**2   # S:S = S_mag^2 / 2
        denom = SS ** 2.5 + SdSd ** 1.25 + 1e-30
        return (self.Cw * delta) ** 2 * SdSd ** 1.5 / denom


class VremanModel(LESModelBase):
    """Vreman (2004): nu_sgs = Cv sqrt(B_beta / (a:a)), a_ij = g_ji,
    beta = Delta^2 a^T a (reference turbulence_les.hpp:86-99)."""

    name = "Vreman"

    def __init__(self, cfg, mesh, geom, Cv: float = 0.07):
        super().__init__(cfg, mesh, geom)
        self.Cv = Cv

    def _nu_sgs(self, sr, delta):
        g = sr.G
        a = [[g[j][i] for j in range(3)] for i in range(3)]  # a_ij = duj/dxi
        aa = sum(a[i][j] * a[i][j] for i in range(3) for j in range(3))
        d2 = delta * delta
        b = [[d2 * sum(a[m][i] * a[m][j] for m in range(3))
              for j in range(3)] for i in range(3)]
        Bb = (b[0][0] * b[1][1] - b[0][1] ** 2
              + b[0][0] * b[2][2] - b[0][2] ** 2
              + b[1][1] * b[2][2] - b[1][2] ** 2)
        Bb = jnp.maximum(Bb, 0.0)
        return self.Cv * jnp.sqrt(Bb / jnp.maximum(aa, 1e-30))


def _sym3_eigvals(m11, m22, m33, m12, m13, m23):
    """Eigenvalues (descending) of a symmetric 3x3 field, analytic
    trigonometric method (vectorized; no lax loops — pure VPU math)."""
    q = (m11 + m22 + m33) / 3.0
    d11, d22, d33 = m11 - q, m22 - q, m33 - q
    p2 = (d11 * d11 + d22 * d22 + d33 * d33
          + 2.0 * (m12 * m12 + m13 * m13 + m23 * m23))
    # dtype-aware floor: a literal 1e-60 underflows to 0 in float32 (the
    # default dtype), making ip = inf and the eigenvalues NaN for cells
    # with exactly zero gradient (quiescent IC, symmetry planes)
    tiny = jnp.asarray(jnp.finfo(jnp.result_type(p2)).tiny * 1e6, p2.dtype)
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, tiny))
    # det(B) with B = (M - qI)/p
    ip = 1.0 / p
    b11, b22, b33 = d11 * ip, d22 * ip, d33 * ip
    b12, b13, b23 = m12 * ip, m13 * ip, m23 * ip
    detB = (b11 * (b22 * b33 - b23 * b23)
            - b12 * (b12 * b33 - b23 * b13)
            + b13 * (b12 * b23 - b22 * b13))
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    # arccos via atan2 (Mosaic TPU has no acos primitive)
    phi = jnp.arctan2(jnp.sqrt(jnp.maximum(1.0 - r * r, 0.0)), r) / 3.0
    e1 = q + 2.0 * p * jnp.cos(phi)
    e3 = q + 2.0 * p * jnp.cos(phi + 2.0 * np.pi / 3.0)
    e2 = 3.0 * q - e1 - e3
    return e1, e2, e3


class SigmaModel(LESModelBase):
    """Sigma model (Nicoud et al. 2011): nu_sgs = (Cs D)^2 s3(s1-s2)(s2-s3)/s1^2
    with s1>=s2>=s3 the singular values of g (reference
    turbulence_les.hpp:101-113)."""

    name = "Sigma"

    def __init__(self, cfg, mesh, geom, Cs: float = 1.35):
        super().__init__(cfg, mesh, geom)
        self.Cs = Cs
        # the trigonometric eigensolver needs arccos, which Mosaic TPU has
        # no primitive for — sigma runs through the (well-fused) XLA path
        self._fuse = False

    def _nu_sgs(self, sr, delta):
        g = sr.G
        # Gram matrix G^T G (SPD); singular values = sqrt(eigvals)
        m = [[sum(g[k][i] * g[k][j] for k in range(3)) for j in range(3)]
             for i in range(3)]
        e1, e2, e3 = _sym3_eigvals(m[0][0], m[1][1], m[2][2],
                                   m[0][1], m[0][2], m[1][2])
        s1 = jnp.sqrt(jnp.maximum(e1, 0.0))
        s2 = jnp.sqrt(jnp.maximum(e2, 0.0))
        s3 = jnp.sqrt(jnp.maximum(e3, 0.0))
        num = s3 * (s1 - s2) * (s2 - s3)
        return (self.Cs * delta) ** 2 * num / jnp.maximum(s1 * s1, 1e-30)


# ---------------------------------------------------------------------------
# Dynamic Smagorinsky
# ---------------------------------------------------------------------------


def _box_filter_batch(fs, geom):
    """3-point box filter of a STACK of fields (F, Nx, Ny, Nz) along each
    non-trivial spatial axis with wall truncation.

    Periodic axes wrap; wall/inflow axes renormalize by the in-domain weight
    (the reference's mlo/mhi masks, src/turbulence_les_dynamic_germano.cpp
    tbf/tbf2d). Separable == the reference's 27-point box filter.

    Batched over fields so each sharded-axis shift is ONE collective-permute
    of F planes instead of F separate one-plane messages (the reference's
    HaloExchange::exchange_batch, include/halo_exchange.hpp:24-76 — message
    count drops ~9x for the Germano pipeline's 9 filtered fields)."""
    f = jnp.stack(fs, axis=0)
    # the truncation weight is identical for every field: filter one
    # (1, Nx, Ny, Nz) plane and broadcast in the final divide
    w = jnp.ones_like(f[:1])
    for sp in range(3):
        ax = geom.axes[sp]
        if ax.n <= 1:
            continue
        axis = sp + 1

        def smooth(x):
            import jax as _jax
            if ax.bc == BCType.PERIODIC:
                lo = jnp.roll(x, 1, axis)
                hi = jnp.roll(x, -1, axis)
            else:
                # static slices, not jnp.take: this code also runs INSIDE
                # the fused Germano Pallas kernel, and Mosaic has no
                # gather lowering (take with a contiguous arange is the
                # same slice anyway)
                n = x.shape[axis]
                zeros_lo = jnp.zeros_like(
                    _jax.lax.slice_in_dim(x, 0, 1, axis=axis))
                lo = jnp.concatenate(
                    [zeros_lo,
                     _jax.lax.slice_in_dim(x, 0, n - 1, axis=axis)],
                    axis=axis)
                hi = jnp.concatenate(
                    [_jax.lax.slice_in_dim(x, 1, n, axis=axis), zeros_lo],
                    axis=axis)
            return lo + x + hi
        f = smooth(f)
        w = smooth(w)
    out = f / w
    return [out[i] for i in range(len(fs))]


def _box_filter(f, geom):
    """Single-field 3-point box filter (see _box_filter_batch)."""
    return _box_filter_batch([f], geom)[0]


class DynamicSmagorinskyModel(LESModelBase):
    """Germano-identity dynamic model with x-z plane-averaged Cs^2(y).

    Rebuild of the reference two-pass GPU pipeline (src/turbulence_les_
    dynamic_germano.cpp dsmag_pass1_germano, _apply.cpp dsmag_pass2_apply):
    L_ij = box(u_i u_j) - box(u_i) box(u_j) at test filter 2 Delta,
    M_ij = 3 Delta^2 |S| S_ij (the reference's same-level approximation),
    Cs^2(y) = clip(<L:M>_{xz} / <M:M>_{xz}, 0, 0.5),
    nu_sgs = Cs^2(y) Delta^2 |S|.
    """

    name = "DynamicSmagorinsky"

    def nu_t(self, state, sim):
        import jax
        geom = sim.geom
        comps = (state.u, state.v, state.w)
        on_cpu = jax.devices()[0].platform == "cpu"
        use_fused = self._fuse and (not on_cpu
                                    or sim.cfg.use_pallas == "on")
        if use_fused and self._fuse in ("slab", "shard"):
            # Pass 1 as ONE fused slab kernel with in-kernel plane-sum
            # accumulation (reference fused GPU pass,
            # src/turbulence_les_dynamic_germano.cpp:102 — round-4
            # verdict #4: the two-pass jnp chain made this the campaign
            # outlier at 0.329 ms/64^3). Pass 2 collapses to the
            # elementwise epilogue below, which XLA fuses into the
            # consumer. ("shard2d"/"xz" keep the jnp chain: the plane
            # sums would need block-dependent x-edge masking there.)
            delta = filter_width(geom)

            def fast(u, v, w):
                c = (u, v, w)
                if self._fuse == "slab":
                    from ..ops.pallas_kernels import fused_germano_pass1
                    smag, lm, mm = fused_germano_pass1(
                        *c, geom=geom, interpret=on_cpu)
                else:
                    from ..parallel.fused import sharded_fused_germano
                    smag, lm, mm = sharded_fused_germano(
                        *c, geom=geom, mesh=sim.device_mesh,
                        axis_name=sim._mesh_axis, interpret=on_cpu)
                cs2 = jnp.where(mm > 1e-30,
                                lm / jnp.where(mm > 1e-30, mm, 1.0), 0.0)
                cs2 = jnp.clip(cs2, 0.0, 0.5)
                return cs2 * delta * delta * smag

            from ..solver import vjp_via
            return vjp_via(
                fast, lambda u, v, w: self._germano_nu_t_jnp(
                    (u, v, w), geom))(*comps)
        return self._germano_nu_t_jnp(comps, geom)

    def _germano_nu_t_jnp(self, comps, geom):
        """The jnp two-pass Germano chain (single source of truth for
        the fused kernel's parity tests and its vjp_via backward)."""
        sr = strain_rotation(comps, geom)
        delta = filter_width(geom)
        S, Sm = sr.S, sr.S_mag
        fac = 3.0 * delta * delta * Sm
        ucc = cell_center_velocity(comps, geom)

        LM = jnp.zeros_like(Sm)
        MM = jnp.zeros_like(Sm)
        pairs = [(i, j) for i in range(3) for j in range(i, 3)]
        filtered = _box_filter_batch(
            list(ucc) + [ucc[i] * ucc[j] for i, j in pairs], geom)
        ubar = filtered[:3]
        uubar = dict(zip(pairs, filtered[3:]))
        for i in range(3):
            for j in range(i, 3):
                wgt = 1.0 if i == j else 2.0
                Lij = uubar[(i, j)] - ubar[i] * ubar[j]
                Mij = fac * S[i][j]
                LM = LM + wgt * Lij * Mij
                MM = MM + wgt * Mij * Mij
        # x-z plane averages (homogeneous dirs); psum across shards via GSPMD
        lm = jnp.sum(LM, axis=(0, 2), keepdims=True)
        mm = jnp.sum(MM, axis=(0, 2), keepdims=True)
        cs2 = jnp.where(mm > 1e-30, lm / jnp.where(mm > 1e-30, mm, 1.0), 0.0)
        cs2 = jnp.clip(cs2, 0.0, 0.5)
        return cs2 * delta * delta * Sm
