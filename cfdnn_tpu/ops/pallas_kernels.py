"""Fused Pallas TPU kernels for the hot path.

The reference hand-fuses its hot loops into dedicated CUDA/OMP kernels
(reference: include/solver_kernels.hpp convective/diffusive face kernels,
src/solver_time_kernels_euler.cpp fused predictor). Here the entire
momentum predictor — skew convection + diffusion + body force + Euler
star update for ALL THREE components — is one Pallas kernel: each velocity
array is read once from HBM per x-slab (plus two halo planes) and each
star component written once, instead of XLA's materialized roll/concat
temporaries.

Kernel family (narrowest-match wins; all parity-gated against the jnp
operator library, which remains the single source of truth):
  - `fused_predictor`           all-periodic uniform O2 skew (TGV DNS)
  - `fused_predictor_channel`   periodic-uniform x/z + WALL y (any
                                stretching), O2 skew/central, scalar nu —
                                the flagship channel configuration
  - `fused_predictor_general`   any y/z BCs, O2/O4, variable nu_t, via
                                the operator library inside the kernel
  - `*_xz` 2-D tilings          y-z planes beyond the slab VMEM fit

Layout: (x, y, z) with z as the 128-lane dimension; the grid tiles x into
slabs, halos come from the two neighbor blocks (periodic wrap in the
index_map).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _Ry(f, n):
    return jnp.roll(f, -n, axis=1)


def _Rz(f, n):
    return jnp.roll(f, -n, axis=2)


def predictor_slab_math(u_e, v_e, w_e, hx, hy, hz, nu, fx, dt):
    """Star update for the interior of x-halo-extended slabs.

    Inputs are (Bx+2, Ny, Nz) with one periodic halo plane on each x side;
    y/z are full periodic extents (in-VMEM rolls). Returns (Bx, Ny, Nz)
    star components. Pure jnp: used inside the Pallas kernel AND directly
    for parity testing against ops.convective/diffusive.

    Math = exactly the jnp operators' periodic-uniform path:
    skew form 0.5*(adv_hi*phi_{+1} - adv_lo*phi_{-1})/h per axis
    (ops.operators._conv_skew) + nu * second differences.
    """
    def X(f, n):
        # x-shift by n relative to the slab interior: n in {-1, 0, 1}
        return jax.lax.slice_in_dim(f, 1 + n, f.shape[0] - 1 + n, axis=0)

    ihx, ihy, ihz = 1.0 / hx, 1.0 / hy, 1.0 / hz

    # ---- u component (x-face staggered) -------------------------------
    u_c = X(u_e, 0)
    # d=0 own axis: phi_c[i]=0.5(u_i+u_{i+1}); u_lo=phi_c[i-1], u_hi=phi_c[i]
    hi_n = X(u_e, 1)
    lo_n = X(u_e, -1)
    conv_u = 0.5 * ((0.5 * (u_c + hi_n)) * hi_n
                    - (0.5 * (lo_n + u_c)) * lo_n) * ihx
    # d=1: advecting v at (x-face, y-face) corners: 0.5(v_{i-1}+v_i) along x
    Ue = 0.5 * (X(v_e, -1) + X(v_e, 0))        # at (xf_i, yf_j)
    conv_u += 0.5 * (_Ry(Ue, 1) * _Ry(u_c, 1) - Ue * _Ry(u_c, -1)) * ihy
    # d=2: advecting w at (x-face, z-face): 0.5(w_{i-1}+w_i)
    We = 0.5 * (X(w_e, -1) + X(w_e, 0))
    conv_u += 0.5 * (_Rz(We, 1) * _Rz(u_c, 1) - We * _Rz(u_c, -1)) * ihz
    lap_u = ((X(u_e, 1) - 2.0 * u_c + X(u_e, -1)) * ihx * ihx
             + (_Ry(u_c, 1) - 2.0 * u_c + _Ry(u_c, -1)) * ihy * ihy
             + (_Rz(u_c, 1) - 2.0 * u_c + _Rz(u_c, -1)) * ihz * ihz)
    star_u = u_c + dt * (-conv_u + nu * lap_u + fx)

    # ---- v component (y-face staggered) -------------------------------
    v_c = X(v_e, 0)
    # d=1 own axis (y): phi_c[j] = 0.5(v_j + v_{j+1})
    hi_n = _Ry(v_c, 1)
    lo_n = _Ry(v_c, -1)
    conv_v = 0.5 * ((0.5 * (v_c + hi_n)) * hi_n
                    - (0.5 * (lo_n + v_c)) * lo_n) * ihy
    # d=0: advecting u at (x-face, y-face): 0.5(u_{j-1}+u_j) along y
    Ue = 0.5 * (_Ry(u_e, -1) + u_e)            # extended in x
    conv_v += 0.5 * (X(Ue, 1) * X(v_e, 1) - X(Ue, 0) * X(v_e, -1)) * ihx
    # d=2: advecting w at (y-face, z-face): 0.5(w_{j-1}+w_j)
    We = 0.5 * (_Ry(X(w_e, 0), -1) + X(w_e, 0))
    conv_v += 0.5 * (_Rz(We, 1) * _Rz(v_c, 1) - We * _Rz(v_c, -1)) * ihz
    lap_v = ((X(v_e, 1) - 2.0 * v_c + X(v_e, -1)) * ihx * ihx
             + (_Ry(v_c, 1) - 2.0 * v_c + _Ry(v_c, -1)) * ihy * ihy
             + (_Rz(v_c, 1) - 2.0 * v_c + _Rz(v_c, -1)) * ihz * ihz)
    star_v = v_c + dt * (-conv_v + nu * lap_v)

    # ---- w component (z-face staggered) -------------------------------
    w_c = X(w_e, 0)
    hi_n = _Rz(w_c, 1)
    lo_n = _Rz(w_c, -1)
    conv_w = 0.5 * ((0.5 * (w_c + hi_n)) * hi_n
                    - (0.5 * (lo_n + w_c)) * lo_n) * ihz
    # d=0: advecting u at (x-face, z-face): 0.5(u_{k-1}+u_k) along z
    Ue = 0.5 * (_Rz(u_e, -1) + u_e)
    conv_w += 0.5 * (X(Ue, 1) * X(w_e, 1) - X(Ue, 0) * X(w_e, -1)) * ihx
    # d=1: advecting v at (y-face, z-face): 0.5(v_{k-1}+v_k)
    Ve = 0.5 * (_Rz(X(v_e, 0), -1) + X(v_e, 0))
    conv_w += 0.5 * (_Ry(Ve, 1) * _Ry(w_c, 1) - Ve * _Ry(w_c, -1)) * ihy
    lap_w = ((X(w_e, 1) - 2.0 * w_c + X(w_e, -1)) * ihx * ihx
             + (_Ry(w_c, 1) - 2.0 * w_c + _Ry(w_c, -1)) * ihy * ihy
             + (_Rz(w_c, 1) - 2.0 * w_c + _Rz(w_c, -1)) * ihz * ihz)
    star_w = w_c + dt * (-conv_w + nu * lap_w)

    return star_u, star_v, star_w


def _predictor_kernel(dt_ref, ul, uc, ur, vl, vc, vr, wl, wc, wr,
                      su, sv, sw, *, hx, hy, hz, nu, fx):
    """Assemble x-halo-extended slabs from the neighbor blocks, compute."""
    def ext(l, c, r):
        return jnp.concatenate([l[-1:], c[:], r[:1]], axis=0)

    dt = dt_ref[0]
    star_u, star_v, star_w = predictor_slab_math(
        ext(ul, uc, ur), ext(vl, vc, vr), ext(wl, wc, wr),
        hx, hy, hz, nu, fx, dt)
    su[:] = star_u
    sv[:] = star_v
    sw[:] = star_w


# ---------------------------------------------------------------------------
# General fused predictor: reuse the jnp operator library INSIDE the kernel
# ---------------------------------------------------------------------------



# The scoped-VMEM ceiling is a COMPILER default (16 MB), not the hardware
# (v5e has 128 MB). The slab kernels raise it via CompilerParams, which
# lets one-plane slabs of y-z planes up to ~640^2 run (512^3 in slab
# mode with bx=1: measured 77.1 ms/step = 1740 Mcells/s, vs 102 for the
# 2-D xz tiling and 171 for the jnp fallback). Block SIZING keeps the
# original 16 MB-calibrated budget — bx=4 at 256^3 measured ~10% slower
# than the tuned bx=1, so bigger blocks are not automatically better.
_SLAB_VMEM_LIMIT = 100 * 1024 * 1024
_SLAB_BUDGET_CELLS = 4 * 128 * 128       # bx sizing (measured-optimal)
_SLAB_FIT_CELLS = 6 * 256 * 256          # eligibility under the raised cap


def _slab_compiler_params(ny, nz):
    """Raise the scoped-VMEM cap ONLY when the working set needs it
    (planes beyond the 16 MB-calibrated budget). Passing the raised cap
    unconditionally measurably hurts small grids: Mosaic schedules
    against the stated budget, and the 128^3 TGV step regressed from
    0.23 to 0.41 ms/step with the 100 MB cap attached."""
    if ny * nz > _SLAB_BUDGET_CELLS:
        return pltpu.CompilerParams(vmem_limit_bytes=_SLAB_VMEM_LIMIT)
    return None


def _auto_bx(bx, Nx, ny, nz, n_halo_blocks=12):
    """Shrink the x-slab so the kernel's VMEM working set fits.

    Budget calibrated to the measured fit at 128^3 with bx=4 (about
    4*128*128 cells per block across ~30 live buffers); also forces
    divisibility of Nx.
    """
    cap = max(1, _SLAB_BUDGET_CELLS // max(ny * nz, 1))
    bx = min(bx, cap)
    while bx > 1 and Nx % bx != 0:
        bx -= 1
    return max(bx, 1)


def _auto_bx_thin(bx, Nx, ny, nz, ng=1, heavy=False):
    """Slab sizing for THIN-HALO blocks (see _thin_specs).

    With ng-plane halo blocks the per-field VMEM footprint is bx+2ng
    planes (not 3bx), so larger slabs fit and the fetch amplification
    (bx+2ng)/bx drops. Measured policy (v5e, f32, 100-iter scans):
      128^3: bx=4 ~= bx=8 (0.17 ms, same as full-block bx=4 — small
             planes already pipelined well);
      256^3: bx=2 under the DEFAULT 16 MB cap is fastest (1.59 vs 1.83
             ms full-block bx=1; bx=4 needs the raised cap and is
             slower, 1.67 — Mosaic schedules against the stated budget);
      512^3: bx=4 under the raised cap: 12.0 vs 15.0 ms at bx=1 (-20%).
    Encoded: cap bx at 4; plane budget 4*256^2 cells under the default
    cap, 6*512^2 under the raised one (planes > _SLAB_BUDGET_CELLS).

    `heavy` marks kernels whose in-kernel live set is ~25-30 buffers
    (the operator-library `fused_predictor_general`): at 512^2 planes
    even the 100 MB cap can't hold a bx=4 slab (scoped-VMEM OOM), so
    their raised-cap budget stays at the 6*256^2 point measured to fit
    — at 512^3 they fall back to bx=1 (the 42.4 ms configuration),
    while ≤256^3 keeps the bx=4 win."""
    plane = max(ny * nz, 1)
    raised = plane > _SLAB_BUDGET_CELLS
    if raised:
        budget = (6 * 256 * 256) if heavy else (6 * 512 * 512)
    else:
        budget = 4 * 256 * 256
    bx = min(bx, 4)
    while bx > 1 and ((bx + 2 * ng) * plane > budget
                      or Nx % bx != 0 or bx % ng != 0):
        bx -= 1
    return max(bx, 1)


def _thin_specs(arr, bx, ng, Nx):
    """[left-halo, center, right-halo] BlockSpecs with ng-plane halo
    blocks: each neighbor fetch is ng planes instead of a full bx-plane
    block, cutting the kernel's HBM read amplification from 3x to
    (bx+2ng)/bx. The halo index_map is in units of the ng-plane block
    (requires ng | bx and ng | Nx; callers fall back to full-block
    neighbor specs otherwise)."""
    blk = (bx,) + arr.shape[1:]
    hblk = (ng,) + arr.shape[1:]
    return [
        pl.BlockSpec(hblk, lambda i: (((i * bx - ng) % Nx) // ng, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(blk, lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(hblk, lambda i: (((i * bx + bx) % Nx) // ng, 0, 0),
                     memory_space=pltpu.VMEM),
    ]


def slab_fits(geom) -> bool:
    """Whether the MINIMUM slab block (bx = ng) fits under the raised
    scoped-VMEM cap. Beyond ~640^2 y-z planes even a one-plane block
    times ~30 live buffers overflows it; the caller then takes the 2-D
    (x,z) tiling or the jnp operator path."""
    ng = 2 if getattr(geom, "space_order", 2) >= 4 else 1
    return ng * geom.axes[1].n * geom.axes[2].n <= _SLAB_FIT_CELLS

def _slab_geometry(geom, bx: int, ng: int = 1):
    """Geometry whose x axis is a fake periodic (bx+2ng)-slab; y/z real.

    The operator functions reach at most `ng` cells in x (1 for O2 central/
    skew, 2 for O4), so values computed at the slab's interior bx planes are
    exact regardless of how the slab-edge ghosts wrap — the 2ng edge planes
    are discarded.
    """
    import dataclasses as _dc
    from ..config import BCType as _BC
    from ..mesh import Axis1D as _Ax
    from .grid import AxisGeom as _AG
    h = geom.x.h
    n = bx + 2 * ng
    ax = _Ax.make(n, 0.0, n * h)
    x_slab = _AG.make(ax, _BC.PERIODIC, 0, geom.dtype)
    return _dc.replace(geom, axes=(x_slab, geom.axes[1], geom.axes[2]))


# geometry arrays that the operator library reads (per axis); Pallas
# forbids closed-over array constants, so these are threaded as inputs
_AXIS_ARRAY_FIELDS = ("d", "inv_d", "dc", "inv_dc", "centers", "faces",
                      "pos_c_pad2", "pos_f_pad2")


def _geom_arrays(geom):
    return [getattr(ax, f) for ax in geom.axes for f in _AXIS_ARRAY_FIELDS]


def _rebuild_geom(geom, vals):
    import dataclasses as _dc
    it = iter(vals)
    axes = []
    for ax in geom.axes:
        kw = {f: next(it) for f in _AXIS_ARRAY_FIELDS}
        axes.append(_dc.replace(ax, **kw))
    return _dc.replace(geom, axes=tuple(axes))


def _general_kernel(dt_ref, *refs, slab_geom, scheme, nu, fx, ng=1,
                    has_nut=False):
    """Predictor on an x-extended slab via the shared operator library
    (ops.convective / ops.diffusive) — single source of truth with the
    unfused path (the reference's CPU/GPU code-sharing paradigm,
    scripts/check_code_sharing.sh)."""
    from . import operators as _ops

    n_geom = 3 * len(_AXIS_ARRAY_FIELDS)
    geom_refs = refs[:n_geom]
    rest = refs[n_geom:]
    if has_nut:
        (ul, uc, ur, vl, vc, vr, wl, wc, wr,
         nl, nc, nr, su, sv, sw) = rest
    else:
        ul, uc, ur, vl, vc, vr, wl, wc, wr, su, sv, sw = rest
    geom_live = _rebuild_geom(slab_geom, [r[:] for r in geom_refs])

    def ext(l, c, r):
        return jnp.concatenate([l[-ng:], c[:], r[:ng]], axis=0)

    dt = dt_ref[0]
    comps = (ext(ul, uc, ur), ext(vl, vc, vr), ext(wl, wc, wr))
    if has_nut:
        nu_eff = jnp.asarray(nu, comps[0].dtype) + ext(nl, nc, nr)
    else:
        nu_eff = jnp.asarray(nu, comps[0].dtype)
    conv = _ops.convective(comps, geom_live, scheme)
    diff = _ops.diffusive(comps, nu_eff, geom_live)
    su[:] = (comps[0] + dt * (-conv[0] + diff[0] + fx))[ng:-ng]
    sv[:] = (comps[1] + dt * (-conv[1] + diff[1]))[ng:-ng]
    sw[:] = (comps[2] + dt * (-conv[2] + diff[2]))[ng:-ng]


def _scheme_ng(scheme) -> int:
    """x-halo reach of the convective scheme inside the slab kernels:
    upwind2's biased stencil reads 2 cells upstream (ops/operators.py
    _conv_advective ng=2); central/skew/upwind reach 1."""
    from ..config import ConvectiveScheme as _CS
    return 2 if scheme == _CS.UPWIND2 else 1


def fused_predictor_general(u, v, w, dt, *, geom, scheme, nu, fx, bx=4,
                            nu_t=None, interpret=False):
    """Fused predictor for ANY y/z BCs (walls, stretched, outflow) with a
    periodic-uniform x axis; x tiled into slabs with `ng` halo planes from
    the neighbor blocks (ng = 2 for O4 stencils and for upwind2's biased
    stencil — round-4: upwind/upwind2 momentum joined the fused path
    after the TPU measurement put the operator fallback at 4.0x fused
    skew, artifacts/upwind_measurement.log; reference GPU upwind
    kernels: solver_kernels.hpp:1863-2198). Covers the channel/duct hot
    path and the O4 DNS path."""
    assert geom.axes[0].periodic, \
        "the fake-periodic slab tiling requires a periodic x axis"
    fields = [u, v, w] if nu_t is None else [u, v, w, nu_t]
    shapes = [jax.ShapeDtypeStruct(a.shape, a.dtype) for a in (u, v, w)]
    ng = max(_stencil_ng(geom), _scheme_ng(scheme))
    return _slab_call(
        _general_kernel, geom, fields, [], shapes, bx, ng,
        interpret, dt=dt, fat=True, heavy=True,
        kernel_kwargs=dict(scheme=scheme, nu=nu, fx=fx,
                           has_nut=nu_t is not None))


def _xpad_geometry(geom):
    """Periodic-uniform clone of a non-periodic uniform x axis with one
    ghost cell per side (n+2 cells): the ghost ring carries the bc.py pad
    values, so the fake-periodic slab kernels reproduce the non-periodic
    operator path exactly on the kept interior."""
    # same fake-periodic-x construction as the slab tiling: bx = all
    # n interior cells, one ghost plane per side
    return _slab_geometry(geom, bx=geom.axes[0].n, ng=1)


def fused_predictor_xpad(u, v, w, dt, *, geom, scheme, nu, fx, bx=4,
                         nu_t=None, interpret=False):
    """Fused predictor for a UNIFORM NON-PERIODIC x axis (the external-flow
    family: inflow/outflow pair, outflow, wall) — the configurations the
    periodic slab kernels cannot take directly (cylinder/airfoil/step apps;
    reference main_cylinder.cpp class).

    Strategy: extend x by ONE ghost plane per side holding exactly the
    bc.py ghost values the jnp operator path pads with (pad_normal /
    pad_tangential / pad_center), run the fake-periodic slab kernel on the
    (Nx+2)-cell domain, and keep the interior. The periodic wrap only
    feeds the two ghost-plane outputs, which are dropped; boundary-face
    values are re-imposed by apply_velocity_bc / the convective outlet
    downstream, exactly as on the jnp path. O2 only: on a non-periodic x
    the jnp path runs O2 x-stencils (AxisGeom.o4_ok), and the padded axis
    must match (measured: the INFLOW cylinder step is ~18x slower per cell
    than the periodic channel on the pure-XLA path — this closes most of
    that gap; see docs/SOLVER_GUIDE.md)."""
    from ..config import BCType as _BC
    x = geom.axes[0]
    assert not x.periodic and x.uniform and geom.space_order == 2
    bcx = x.bc
    # u: staggered, (Nx+1, ...) with boundary faces in-array.
    # Left ghost face (pad_normal): odd reflection 2*u0 - u1 for
    # wall/inflow, zero-gradient copy for outflow. The (Nx+2)-cell
    # periodic representation holds faces [-1, 0 .. Nx]; no right ghost
    # is stored (face Nx is the last left-face slot) — the wrap feeds
    # only discarded outputs.
    if bcx == _BC.OUTFLOW:
        u_lo = u[0:1]
    else:
        u_lo = 2.0 * u[0:1] - u[1:2]
    u_pad = jnp.concatenate([u_lo, u], axis=0)
    # v/w cell-centered in x (pad_tangential): no-slip sign flip at a
    # wall, zero-gradient mirror for inflow/outflow
    s = -1.0 if bcx == _BC.WALL else 1.0
    def cpad(f, sgn):
        return jnp.concatenate([sgn * f[0:1], f, sgn * f[-1:]], axis=0)
    v_pad, w_pad = cpad(v, s), cpad(w, s)
    nu_pad = None if nu_t is None else cpad(nu_t, 1.0)  # pad_center neumann
    star = fused_predictor_general(
        u_pad, v_pad, w_pad, dt, geom=_xpad_geometry(geom), scheme=scheme,
        nu=nu, fx=fx, bx=bx, nu_t=nu_pad, interpret=interpret)
    return star[0][1:], star[1][1:-1], star[2][1:-1]


def _nu_sgs_kernel(*refs, slab_geom, model_fn, ng):
    """Cell-centered nu_sgs from the velocity gradient tensor, computed on
    x-extended slabs via the shared turbulence algebra (the reference's
    fused gradient+nu_sgs GPU kernels, turbulence_les.hpp update_gpu)."""
    n_geom = 3 * len(_AXIS_ARRAY_FIELDS)
    geom_refs = refs[:n_geom]
    ul, uc, ur, vl, vc, vr, wl, wc, wr, out = refs[n_geom:]
    geom_live = _rebuild_geom(slab_geom, [r[:] for r in geom_refs])

    def ext(l, c, r):
        return jnp.concatenate([l[-ng:], c[:], r[:ng]], axis=0)

    comps = (ext(ul, uc, ur), ext(vl, vc, vr), ext(wl, wc, wr))
    out[:] = model_fn(comps, geom_live)[ng:-ng]


def fused_nu_sgs(u, v, w, *, geom, model_fn, bx=4, interpret=False):
    """Run `model_fn(comps, geom) -> nu_sgs(cells)` as a fused x-slab
    Pallas kernel (LES closures: one HBM pass over the velocity instead of
    materialized gradient tensors). Requires periodic uniform x."""
    assert geom.axes[0].periodic, \
        "the fake-periodic slab tiling requires a periodic x axis"
    ny, nz = geom.axes[1].n, geom.axes[2].n
    return _slab_call(
        _nu_sgs_kernel, geom, [u, v, w], [],
        jax.ShapeDtypeStruct((u.shape[0], ny, nz), u.dtype),
        bx, 1, interpret, fat=True, kernel_kwargs=dict(model_fn=model_fn))


def _germano_pass1_kernel(*refs, slab_geom, ng, z_crop=0):
    """Dynamic-Smagorinsky Germano pass 1 on x-extended slabs: strain,
    test-filtered LM/MM products, and their (x,z) plane PARTIAL sums
    accumulated across the sequential grid (reference fused GPU pass,
    src/turbulence_les_dynamic_germano.cpp:102 dsmag_pass1_germano —
    round-4 verdict #4: this was the campaign outlier, a two-pass jnp
    chain while every other closure got a fused kernel).

    ng=2: the box filter reaches 1 cell and its cell-center velocity
    operand another staggered face. `z_crop` masks that many z planes
    off each end of the plane sums (the sharded wrapper's fake-periodic
    z extension; 0 on a real z axis). Outputs: |S| (blocked) + LM/MM
    y-profiles (1, Ny, 1) accumulated via the constant-index revisit."""
    n_geom = 3 * len(_AXIS_ARRAY_FIELDS)
    geom_refs = refs[:n_geom]
    ul, uc, ur, vl, vc, vr, wl, wc, wr, smag_o, lm_o, mm_o = refs[n_geom:]
    geom_live = _rebuild_geom(slab_geom, [r[:] for r in geom_refs])

    def ext(l, c, r):
        return jnp.concatenate([l[-ng:], c[:], r[:ng]], axis=0)

    from ..turbulence.base import (cell_center_velocity, filter_width,
                                   strain_rotation)
    from ..turbulence.les import _box_filter_batch
    comps = (ext(ul, uc, ur), ext(vl, vc, vr), ext(wl, wc, wr))
    sr = strain_rotation(comps, geom_live)
    ucc = cell_center_velocity(comps, geom_live)
    delta = filter_width(geom_live)
    fac = 3.0 * delta * delta * sr.S_mag
    pairs = [(i, j) for i in range(3) for j in range(i, 3)]
    filtered = _box_filter_batch(
        list(ucc) + [ucc[i] * ucc[j] for i, j in pairs], geom_live)
    ubar = filtered[:3]
    uubar = dict(zip(pairs, filtered[3:]))
    LM = jnp.zeros_like(sr.S_mag)
    MM = jnp.zeros_like(sr.S_mag)
    for i, j in pairs:
        wgt = 1.0 if i == j else 2.0
        Lij = uubar[(i, j)] - ubar[i] * ubar[j]
        Mij = fac * sr.S[i][j]
        LM = LM + wgt * Lij * Mij
        MM = MM + wgt * Mij * Mij
    smag_o[:] = sr.S_mag[ng:-ng]
    LMi, MMi = LM[ng:-ng], MM[ng:-ng]
    if z_crop:
        LMi = LMi[:, :, z_crop:-z_crop]
        MMi = MMi[:, :, z_crop:-z_crop]
    lm_p = jnp.sum(LMi, axis=(0, 2), keepdims=True)
    mm_p = jnp.sum(MMi, axis=(0, 2), keepdims=True)
    i0 = pl.program_id(0)

    @pl.when(i0 == 0)
    def _zero():
        lm_o[:] = jnp.zeros_like(lm_o)
        mm_o[:] = jnp.zeros_like(mm_o)

    lm_o[:] += lm_p
    mm_o[:] += mm_p


def fused_germano_pass1(u, v, w, *, geom, bx=4, z_crop=0,
                        interpret=False):
    """Germano identity pass 1 as ONE fused x-slab Pallas pass:
    -> (|S| field, LM y-profile (1,Ny,1), MM y-profile) with the plane
    sums accumulated in-kernel (no LM/MM field materialization). The
    caller finishes with cs2 = clip(<LM>/<MM>) and
    nu_sgs = cs2 delta^2 |S| — a trivial elementwise epilogue XLA fuses
    into the consumer. Requires periodic uniform x."""
    assert geom.axes[0].periodic, \
        "the fake-periodic slab tiling requires a periodic x axis"
    ny, nz = geom.axes[1].n, geom.axes[2].n
    shapes = [jax.ShapeDtypeStruct((u.shape[0], ny, nz), u.dtype)]
    accum = [jax.ShapeDtypeStruct((1, ny, 1), u.dtype)] * 2
    return _slab_call(
        _germano_pass1_kernel, geom, [u, v, w], [], shapes, bx, 2,
        interpret, fat=True, heavy=True,
        kernel_kwargs=dict(z_crop=z_crop), accum_shapes=accum)


def _transport_advance_kernel(dt_ref, *refs, slab_geom, math_fn,
                              n_consts, ng=2):
    """k/omega point-implicit update on an x-extended slab via the
    shared transport algebra (turbulence/transport.py
    sst_advance_math / komega_advance_math — single source of truth
    with the jnp path). The TPU measurement that motivated this kernel:
    the SST transport advance was 87% of the 128^3 RANS step on the
    operator path (artifacts/upwind_measurement.log). Reference
    analogue: the fused sst_transport_step_gpu kernel
    (turbulence_transport.hpp ~:246).

    math_fn(comps, k, om, nu_t, geom, consts, dt) -> tuple of output
    fields (as many as the wrapper declared); scalars/constants are
    closed over by the caller (only ARRAY captures are forbidden in
    Pallas — per-cell constants like wall distance ride in `consts`,
    threaded as whole VMEM arrays)."""
    n_geom = 3 * len(_AXIS_ARRAY_FIELDS)
    geom_refs = refs[:n_geom]
    consts = refs[n_geom:n_geom + n_consts]
    rest = refs[n_geom + n_consts:]
    (ul, uc, ur, vl, vc, vr, wl, wc, wr,
     kl, kc, kr, ol, oc, orr, nl, nc, nr) = rest[:18]
    outs = rest[18:]
    geom_live = _rebuild_geom(slab_geom, [r[:] for r in geom_refs])

    def ext(l, cen, r):
        return jnp.concatenate([l[-ng:], cen[:], r[:ng]], axis=0)

    dt = dt_ref[0]
    comps = (ext(ul, uc, ur), ext(vl, vc, vr), ext(wl, wc, wr))
    k = ext(kl, kc, kr)
    om = ext(ol, oc, orr)
    nu_t = ext(nl, nc, nr)
    fields = math_fn(comps, k, om, nu_t, geom_live,
                     tuple(cr[:] for cr in consts), dt)
    for o, f in zip(outs, fields):
        o[:] = f[ng:-ng]


def fused_transport_advance(u, v, w, k, om, nu_t, dt, *, geom, math_fn,
                            consts, n_out=2, ng=2, bx=4,
                            interpret=False):
    """Two-equation transport advance as ONE fused x-slab Pallas pass
    (upwind advection, central gradients, blending, limited production,
    conservative diffusion, point-implicit destruction — optionally the
    closure nu_t as a third output, reusing the in-kernel strain)
    instead of the many-materialization jnp chain. `math_fn` (see
    _transport_advance_kernel) returns `n_out` cell fields; `consts`
    are per-cell constant arrays (wall distance, omega pin mask, ...)
    broadcast to (1, Ny, Nz) and threaded as whole VMEM inputs. Returns
    a tuple of n_out arrays.

    `ng`: SST needs 2 — its diffusion term reads neighbor nu_eff, whose
    F1 blending itself reaches one cell through the k/omega gradients
    (caught by the interpret parity test at the slab-edge planes with
    ng=1); Wilcox k-omega's diffusivities depend only on the INPUT
    nu_t, so ng=1 suffices there."""
    assert geom.axes[0].periodic, \
        "the fake-periodic slab tiling requires a periodic x axis"
    consts_b = [jnp.asarray(jnp.broadcast_to(a, (1,) + k.shape[1:]),
                            k.dtype) for a in consts]
    shapes = [jax.ShapeDtypeStruct(k.shape, k.dtype)] * n_out
    return _slab_call(
        _transport_advance_kernel, geom, [u, v, w, k, om, nu_t], [],
        shapes, bx, ng, interpret, dt=dt, fat=True, heavy=True,
        kernel_kwargs=dict(math_fn=math_fn, n_consts=len(consts_b)),
        consts=consts_b)


def _divergence_kernel(*refs, slab_geom, ng):
    n_geom = 3 * len(_AXIS_ARRAY_FIELDS)
    geom_refs = refs[:n_geom]
    ul, uc, ur, vl, vc, vr, wl, wc, wr, out = refs[n_geom:]
    geom_live = _rebuild_geom(slab_geom, [r[:] for r in geom_refs])

    def ext(l, c, r):
        return jnp.concatenate([l[-ng:], c[:], r[:ng]], axis=0)

    from . import operators as _ops
    comps = (ext(ul, uc, ur), ext(vl, vc, vr), ext(wl, wc, wr))
    out[:] = _ops.divergence(comps, geom_live)[ng:-ng]


def _correct_kernel(dt_ref, *refs, slab_geom, ng):
    n_geom = 3 * len(_AXIS_ARRAY_FIELDS)
    geom_refs = refs[:n_geom]
    pl_, pc_, pr_, uc, vc, wc, su, sv, sw = refs[n_geom:]
    geom_live = _rebuild_geom(slab_geom, [r[:] for r in geom_refs])
    p_ext = jnp.concatenate([pl_[-ng:], pc_[:], pr_[:ng]], axis=0)
    from . import operators as _ops
    dt = dt_ref[0]
    gx = _ops.pressure_grad_face(p_ext, 0, geom_live)[ng:-ng]
    gy = _ops.pressure_grad_face(p_ext, 1, geom_live)[ng:-ng]
    gz = _ops.pressure_grad_face(p_ext, 2, geom_live)[ng:-ng]
    su[:] = uc[:] - dt * gx
    sv[:] = vc[:] - dt * gy
    sw[:] = wc[:] - dt * gz


def _fat_kernel_params(ny, nz, bx):
    """Compiler params for buffer-heavy kernels (operator-library or
    channel predictors): the thin-halo bx=2 slab at a 256^2 plane
    overflows the default 16 MB scoped-VMEM cap by <1 MB, so raise the
    cap once the plane is large AND a multi-plane slab was chosen.
    Lean kernels (plain predictor, divergence, correct) measured FASTER
    under the default cap at 256^3 (1.59 vs 1.63 ms — Mosaic schedules
    against the stated budget), so only the fat ones pay for the raise."""
    cp = _slab_compiler_params(ny, nz)
    if cp is None and bx > 1 and ny * nz >= 48 * 1024:
        cp = pltpu.CompilerParams(vmem_limit_bytes=_SLAB_VMEM_LIMIT)
    return cp


def _slab_call(kernel, geom, fields_tripled, fields_plain, out_shapes,
               bx, ng, interpret, dt=None, fat=False, heavy=False,
               kernel_kwargs=None, consts=None, accum_shapes=None):
    """Shared pallas_call assembly for ALL the slab-stencil kernels
    (predictor, divergence, correct, nu_sgs): slab sizing + guards, thin
    vs full halo-block specs, geometry threading, tripled operands, SMEM
    dt, out specs. One definition so sizing/guard fixes cannot land in
    one kernel's copy but not another's.

    `accum_shapes`: extra outputs with a CONSTANT block index map (the
    whole array revisited by every grid step) — the TPU grid is
    sequential, so the kernel can zero them at program_id 0 and
    accumulate partial reductions across x-slabs (the Germano plane
    sums). Requires out_shapes to be a list."""
    ref0 = fields_tripled[0] if fields_tripled else fields_plain[0]
    Nx = ref0.shape[0]
    bx = _auto_bx_thin(bx, Nx, geom.axes[1].n, geom.axes[2].n, ng,
                       heavy=heavy)
    if bx < ng:
        bx = ng   # ng=2 needs bx >= 2: an ng-plane halo block cannot be
        # cut from a 1-plane neighbor (same guard as the predictor)
    if Nx % bx:
        raise ValueError(
            f"slab kernel cannot tile Nx={Nx} into bx={bx} blocks "
            f"(odd Nx with O4?) — use an even Nx or use_pallas='off'")
    G = Nx // bx
    thin = (bx % ng == 0 and Nx % ng == 0)
    slab_geom = _slab_geometry(geom, bx, ng)
    garrs = [jnp.asarray(a, ref0.dtype) for a in _geom_arrays(slab_geom)]

    def specs_for(arr):
        if thin:
            return _thin_specs(arr, bx, ng, Nx)
        blk = (bx,) + arr.shape[1:]
        return [pl.BlockSpec(blk, lambda i, o=off: ((i + o) % G, 0, 0),
                             memory_space=pltpu.VMEM)
                for off in (-1, 0, 1)]

    in_specs = []
    operands = []
    if dt is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        operands.append(jnp.reshape(jnp.asarray(dt, ref0.dtype), (1,)))
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in garrs]
    operands += garrs
    # whole-array VMEM constants (x-broadcast fields like wall distance)
    for arr in (consts or []):
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        operands.append(arr)
    for arr in fields_tripled:
        in_specs += specs_for(arr)
        operands += [arr, arr, arr]
    for arr in fields_plain:
        in_specs.append(pl.BlockSpec((bx,) + arr.shape[1:],
                                     lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(arr)
    shapes = out_shapes if isinstance(out_shapes, list) else [out_shapes]
    out_specs = [pl.BlockSpec((bx,) + s.shape[1:], lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM) for s in shapes]
    if accum_shapes:
        assert isinstance(out_shapes, list)
        out_specs += [pl.BlockSpec(s.shape, lambda i: (0, 0, 0),
                                   memory_space=pltpu.VMEM)
                      for s in accum_shapes]
        out_shapes = out_shapes + list(accum_shapes)
    cp = (_fat_kernel_params(geom.axes[1].n, geom.axes[2].n, bx) if fat
          else _slab_compiler_params(geom.axes[1].n, geom.axes[2].n))
    out = pl.pallas_call(
        functools.partial(kernel, slab_geom=slab_geom, ng=ng,
                          **(kernel_kwargs or {})),
        grid=(G,),
        in_specs=in_specs,
        out_specs=out_specs if isinstance(out_shapes, list) else out_specs[0],
        out_shape=out_shapes,
        compiler_params=cp,
        interpret=interpret,
    )(*operands)
    return out


def _stencil_ng(geom) -> int:
    """Halo width of the divergence / pressure-gradient stencils: the
    fake-periodic slab axis re-enables O4 (reach 2) whenever
    space_order >= 4, so ng must follow — a hardcoded ng=1 silently
    wrapped the O4 stencils' outermost read to the slab's own opposite
    edge (wrong values at the edge planes of every slab)."""
    return 2 if geom.space_order >= 4 else 1


def fused_divergence(u, v, w, *, geom, bx=8, interpret=False):
    """Staggered divergence as one slab kernel (periodic uniform x)."""
    assert geom.axes[0].periodic, \
        "the fake-periodic slab tiling requires a periodic x axis"
    ny, nz = geom.axes[1].n, geom.axes[2].n
    return _slab_call(_divergence_kernel, geom, [u, v, w], [],
                      jax.ShapeDtypeStruct((u.shape[0], ny, nz), u.dtype),
                      bx, _stencil_ng(geom), interpret)


def fused_correct(u, v, w, p, dt, *, geom, bx=8, interpret=False):
    """u -= dt grad(p) as one slab kernel (periodic uniform x)."""
    assert geom.axes[0].periodic, \
        "the fake-periodic slab tiling requires a periodic x axis"
    shapes = [jax.ShapeDtypeStruct(a.shape, a.dtype) for a in (u, v, w)]
    return _slab_call(_correct_kernel, geom, [p], [u, v, w], shapes,
                      bx, _stencil_ng(geom), interpret, dt=dt)


# ---------------------------------------------------------------------------
# 2-D (x,z) tiling: large grids whose full y-z planes overflow VMEM
# ---------------------------------------------------------------------------
#
# Above ~384^2 planes the 1-D x-slab kernels cannot fit even one plane
# (slab_fits). When z is ALSO periodic+uniform (the TGV and channel hot
# paths), the same fake-periodic halo trick applies along z: the grid is
# (Gx, Gz), each field contributes 3x3 neighbor blocks (x-offset, z-offset),
# and the kernel assembles a (bx+2ng, ny, bz+2ng) extended tile. Corner
# blocks are required: skew convection composes x- and z-interpolations, so
# the stencil reaches diagonally.
#
# PERF NOTE (512^3 TGV, v5e, warm, benchmark mode): the xz tiling runs
# 102.0 ms/step vs 171.1 for the XLA operator fallback — but the 1-D slab
# kernels under the raised VMEM cap beat both at 55.1 ms/step, so xz is
# only auto-selected beyond the slab fit (~640^2 planes). Costs: ~5 min
# one-time Mosaic compile of the 27-input kernel, 27-block fetch
# amplification, and 128-lane padding of the (bz+2)-lane halo concats.
# (Beware when benchmarking: an unwarmed timing at this size measures the
# compile, not the step.)


def _slab_geometry_xz(geom, bx: int, bz: int, ng: int = 1):
    """Geometry with BOTH x and z replaced by fake periodic slab axes."""
    import dataclasses as _dc
    from ..config import BCType as _BC
    from ..mesh import Axis1D as _Ax
    from .grid import AxisGeom as _AG

    def slab(ax_geom, b, axis):
        h = ax_geom.h
        n = b + 2 * ng
        return _AG.make(_Ax.make(n, 0.0, n * h), _BC.PERIODIC, axis,
                        geom.dtype)

    return _dc.replace(geom, axes=(slab(geom.axes[0], bx, 0), geom.axes[1],
                                   slab(geom.axes[2], bz, 2)))


# The 16 MB scoped-VMEM default is a compiler cap, not the hardware (v5e
# has 128 MB); the xz kernels raise it via CompilerParams and budget
# accordingly (~40 live block buffers + ext temporaries stay under it).
_XZ_VMEM_LIMIT = 100 * 1024 * 1024
_XZ_BUDGET_CELLS = 2 * 512 * 128


def _auto_bxz(Nx, ny, Nz, ng: int = 1):
    """Pick (bx, bz) for the 2-D tiling: bz a divisor of Nz near the
    128-lane width (so blocks stay lane-aligned), then bx as large as the
    per-block budget allows. Returns None if nothing divides cleanly."""
    bz = 0
    for cand in (128, 256, 64, 512, 32):
        if Nz % cand == 0 and cand <= Nz:
            bz = cand
            break
    if bz == 0:
        return None
    cap = max(ng, _XZ_BUDGET_CELLS // max(ny * bz, 1))
    bx = min(8, cap)
    while bx > ng and Nx % bx != 0:
        bx -= 1
    if Nx % bx != 0:
        return None
    return bx, bz


def _ext_xz(rs, ng):
    """Assemble the (bx+2ng, ny, bz+2ng) tile from 9 neighbor blocks laid
    out row-major in (x-offset, z-offset) order."""
    def zcat(a, b, c):
        return jnp.concatenate([a[:, :, -ng:], b[:, :, :], c[:, :, :ng]],
                               axis=2)

    top = zcat(rs[0][:], rs[1][:], rs[2][:])[-ng:]
    mid = zcat(rs[3][:], rs[4][:], rs[5][:])
    bot = zcat(rs[6][:], rs[7][:], rs[8][:])[:ng]
    return jnp.concatenate([top, mid, bot], axis=0)


def _general_kernel_xz(dt_ref, *refs, slab_geom, scheme, nu, fx, ng=1,
                       has_nut=False):
    """2-D-tiled predictor via the shared operator library (same single
    source of truth as _general_kernel; x AND z fake-periodic)."""
    from . import operators as _ops

    n_geom = 3 * len(_AXIS_ARRAY_FIELDS)
    geom_refs = refs[:n_geom]
    rest = refs[n_geom:]
    nf = 4 if has_nut else 3
    blocks = [rest[9 * i: 9 * (i + 1)] for i in range(nf)]
    outs = rest[9 * nf:]
    geom_live = _rebuild_geom(slab_geom, [r[:] for r in geom_refs])

    dt = dt_ref[0]
    comps = tuple(_ext_xz(b, ng) for b in blocks[:3])
    if has_nut:
        nu_eff = jnp.asarray(nu, comps[0].dtype) + _ext_xz(blocks[3], ng)
    else:
        nu_eff = jnp.asarray(nu, comps[0].dtype)
    conv = _ops.convective(comps, geom_live, scheme)
    diff = _ops.diffusive(comps, nu_eff, geom_live)
    rhs = (conv[0], conv[1], conv[2], diff[0], diff[1], diff[2])
    su, sv, sw = outs
    su[:] = (comps[0] + dt * (-rhs[0] + rhs[3] + fx))[ng:-ng, :, ng:-ng]
    sv[:] = (comps[1] + dt * (-rhs[1] + rhs[4]))[ng:-ng, :, ng:-ng]
    sw[:] = (comps[2] + dt * (-rhs[2] + rhs[5]))[ng:-ng, :, ng:-ng]


def fused_predictor_general_xz(u, v, w, dt, *, geom, scheme, nu, fx,
                               nu_t=None, interpret=False):
    """Fused predictor with 2-D (x,z) tiling for grids whose y-z planes
    overflow the 1-D slab budget. Requires periodic-uniform x AND z; any
    y BC (walls/stretched). Returns None if no clean tiling exists."""
    Nx = u.shape[0]
    ny = geom.axes[1].n
    Nz = geom.axes[2].n
    ng = max(2 if geom.space_order >= 4 else 1, _scheme_ng(scheme))
    picked = _auto_bxz(Nx, ny, Nz, ng)
    if picked is None:
        return None
    bx, bz = picked
    Gx, Gz = Nx // bx, Nz // bz
    slab_geom = _slab_geometry_xz(geom, bx, bz, ng)

    def specs_for(arr):
        blk = (bx,) + arr.shape[1:2] + (bz,)
        return [pl.BlockSpec(blk,
                             lambda i, j, oi=oi, oj=oj: ((i + oi) % Gx, 0,
                                                         (j + oj) % Gz),
                             memory_space=pltpu.VMEM)
                for oi in (-1, 0, 1) for oj in (-1, 0, 1)]

    garrs = [jnp.asarray(a, u.dtype) for a in _geom_arrays(slab_geom)]
    fields = (u, v, w) if nu_t is None else (u, v, w, nu_t)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in garrs]
    for arr in fields:
        in_specs += specs_for(arr)
    out_specs = [pl.BlockSpec((bx, arr.shape[1], bz),
                              lambda i, j: (i, 0, j),
                              memory_space=pltpu.VMEM)
                 for arr in (u, v, w)]
    out_shape = [jax.ShapeDtypeStruct(arr.shape, arr.dtype)
                 for arr in (u, v, w)]
    dt_arr = jnp.reshape(jnp.asarray(dt, u.dtype), (1,))
    kernel = functools.partial(_general_kernel_xz, slab_geom=slab_geom,
                               scheme=scheme, nu=nu, fx=fx, ng=ng,
                               has_nut=nu_t is not None)
    operands = [dt_arr] + garrs
    for arr in fields:
        operands += [arr] * 9
    return pl.pallas_call(
        kernel,
        grid=(Gx, Gz),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_XZ_VMEM_LIMIT),
        interpret=interpret,
    )(*operands)


def _nu_sgs_kernel_xz(*refs, slab_geom, model_fn, ng):
    n_geom = 3 * len(_AXIS_ARRAY_FIELDS)
    geom_refs = refs[:n_geom]
    rest = refs[n_geom:]
    blocks = [rest[9 * i: 9 * (i + 1)] for i in range(3)]
    out = rest[27]
    geom_live = _rebuild_geom(slab_geom, [r[:] for r in geom_refs])
    comps = tuple(_ext_xz(b, ng) for b in blocks)
    out[:] = model_fn(comps, geom_live)[ng:-ng, :, ng:-ng]


def fused_nu_sgs_xz(u, v, w, *, geom, model_fn, interpret=False):
    """LES nu_sgs with 2-D (x,z) tiling for oversized planes (the
    cell-centered gradient tensor composes x/z interpolations, so the
    full 3x3 neighborhood is required). Returns None if no tiling."""
    Nx = u.shape[0]
    ny = geom.axes[1].n
    Nz = geom.axes[2].n
    ng = 1
    picked = _auto_bxz(Nx, ny, Nz, ng)
    if picked is None:
        return None
    bx, bz = picked
    Gx, Gz = Nx // bx, Nz // bz
    slab_geom = _slab_geometry_xz(geom, bx, bz, ng)
    garrs = [jnp.asarray(a, u.dtype) for a in _geom_arrays(slab_geom)]

    def specs_for(arr):
        blk = (bx, arr.shape[1], bz)
        return [pl.BlockSpec(blk,
                             lambda i, j, oi=oi, oj=oj: ((i + oi) % Gx, 0,
                                                         (j + oj) % Gz),
                             memory_space=pltpu.VMEM)
                for oi in (-1, 0, 1) for oj in (-1, 0, 1)]

    in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in garrs]
    operands = list(garrs)
    for arr in (u, v, w):
        in_specs += specs_for(arr)
        operands += [arr] * 9
    out_spec = pl.BlockSpec((bx, ny, bz), lambda i, j: (i, 0, j),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_nu_sgs_kernel_xz, slab_geom=slab_geom,
                          model_fn=model_fn, ng=ng),
        grid=(Gx, Gz),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((Nx, ny, Nz), u.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_XZ_VMEM_LIMIT),
        interpret=interpret,
    )(*operands)


# -- xz divergence / correction: axis-aligned stencils -> 5 blocks --------
#
# divergence and the pressure-gradient correction never reach diagonally,
# so the corner blocks of the 3x3 neighborhood are unnecessary: 5 blocks
# per haloed field (x-left, z-left, center, z-right, x-right). The corner
# entries of the assembled tile are filled from the x-neighbor blocks'
# own z-wrap — wrong values, but provably unread by axis-aligned stencils.

_XZ_NC_OFFSETS = ((-1, 0), (0, -1), (0, 0), (0, 1), (1, 0))


def _ext_xz_nc(rs, ng):
    """(bx+2ng, ny, bz+2ng) tile from 5 no-corner neighbor blocks ordered
    as _XZ_NC_OFFSETS: (x-left, z-left, center, z-right, x-right)."""
    xl, zl, cc, zr, xr = (r[:] for r in rs)

    def zwrap(a):
        return jnp.concatenate([a[:, :, -ng:], a, a[:, :, :ng]], axis=2)

    mid = jnp.concatenate([zl[:, :, -ng:], cc, zr[:, :, :ng]], axis=2)
    return jnp.concatenate([zwrap(xl[-ng:]), mid, zwrap(xr[:ng])], axis=0)


def _divergence_kernel_xz(*refs, slab_geom, ng):
    from . import operators as _ops
    n_geom = 3 * len(_AXIS_ARRAY_FIELDS)
    geom_refs = refs[:n_geom]
    rest = refs[n_geom:]
    blocks = [rest[5 * i: 5 * (i + 1)] for i in range(3)]
    out = rest[15]
    geom_live = _rebuild_geom(slab_geom, [r[:] for r in geom_refs])
    comps = tuple(_ext_xz_nc(b, ng) for b in blocks)
    out[:] = _ops.divergence(comps, geom_live)[ng:-ng, :, ng:-ng]


def _correct_kernel_xz(dt_ref, *refs, slab_geom, ng):
    from . import operators as _ops
    n_geom = 3 * len(_AXIS_ARRAY_FIELDS)
    geom_refs = refs[:n_geom]
    rest = refs[n_geom:]
    p_ext = _ext_xz_nc(rest[:5], ng)
    uc, vc, wc, su, sv, sw = rest[5:]
    geom_live = _rebuild_geom(slab_geom, [r[:] for r in geom_refs])
    dt = dt_ref[0]
    gx = _ops.pressure_grad_face(p_ext, 0, geom_live)[ng:-ng, :, ng:-ng]
    gy = _ops.pressure_grad_face(p_ext, 1, geom_live)[ng:-ng, :, ng:-ng]
    gz = _ops.pressure_grad_face(p_ext, 2, geom_live)[ng:-ng, :, ng:-ng]
    su[:] = uc[:] - dt * gx
    sv[:] = vc[:] - dt * gy
    sw[:] = wc[:] - dt * gz


def _slab_call_xz(kernel, geom, fields_haloed, fields_plain, out_shapes,
                  interpret, dt=None):
    """Shared pallas_call assembly for the 5-block (no-corner) xz kernels.
    Returns None when no clean (bx, bz) tiling exists."""
    ref0 = (fields_haloed or fields_plain)[0]
    Nx = ref0.shape[0]
    ny = geom.axes[1].n
    Nz = geom.axes[2].n
    ng = _stencil_ng(geom)
    picked = _auto_bxz(Nx, ny, Nz, ng)
    if picked is None:
        return None
    bx, bz = picked
    Gx, Gz = Nx // bx, Nz // bz
    slab_geom = _slab_geometry_xz(geom, bx, bz, ng)
    garrs = [jnp.asarray(a, ref0.dtype) for a in _geom_arrays(slab_geom)]

    def specs_for(arr):
        blk = (bx, arr.shape[1], bz)
        return [pl.BlockSpec(blk,
                             lambda i, j, oi=oi, oj=oj: ((i + oi) % Gx, 0,
                                                         (j + oj) % Gz),
                             memory_space=pltpu.VMEM)
                for oi, oj in _XZ_NC_OFFSETS]

    in_specs = []
    operands = []
    if dt is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        operands.append(jnp.reshape(jnp.asarray(dt, ref0.dtype), (1,)))
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in garrs]
    operands += garrs
    for arr in fields_haloed:
        in_specs += specs_for(arr)
        operands += [arr] * 5
    for arr in fields_plain:
        in_specs.append(pl.BlockSpec((bx, arr.shape[1], bz),
                                     lambda i, j: (i, 0, j),
                                     memory_space=pltpu.VMEM))
        operands.append(arr)
    shapes = out_shapes if isinstance(out_shapes, list) else [out_shapes]
    out_specs = [pl.BlockSpec((bx, s.shape[1], bz), lambda i, j: (i, 0, j),
                              memory_space=pltpu.VMEM) for s in shapes]
    return pl.pallas_call(
        functools.partial(kernel, slab_geom=slab_geom, ng=ng),
        grid=(Gx, Gz),
        in_specs=in_specs,
        out_specs=out_specs if isinstance(out_shapes, list) else out_specs[0],
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_XZ_VMEM_LIMIT),
        interpret=interpret,
    )(*operands)


def fused_divergence_xz(u, v, w, *, geom, interpret=False):
    """Staggered divergence with 2-D (x,z) tiling (periodic-uniform x,z).
    Returns None when no clean tiling exists."""
    ny, nz = geom.axes[1].n, geom.axes[2].n
    return _slab_call_xz(
        _divergence_kernel_xz, geom, [u, v, w], [],
        jax.ShapeDtypeStruct((u.shape[0], ny, nz), u.dtype), interpret)


def fused_correct_xz(u, v, w, p, dt, *, geom, interpret=False):
    """u -= dt grad(p) with 2-D (x,z) tiling (periodic-uniform x,z).
    Returns None when no clean tiling exists."""
    shapes = [jax.ShapeDtypeStruct(a.shape, a.dtype) for a in (u, v, w)]
    return _slab_call_xz(_correct_kernel_xz, geom, [p], [u, v, w], shapes,
                         interpret, dt=dt)


# ---------------------------------------------------------------------------
# Channel-specialized predictor: periodic-uniform x,z + WALL (stretched) y
# ---------------------------------------------------------------------------
#
# The general kernel routes through the operator library with 24 geometry
# refs and per-term pad concatenations; measured on v5e at 128^3 it runs
# 0.194 ms vs 0.106 for the specialized all-periodic kernel ON THE SAME
# all-periodic geometry — 1.8x pure machinery overhead on the hottest
# kernel of the flagship (channel) configuration. This specialization
# hand-vectorizes the EXACT operator-library math for the channel BCs:
# O2 skew convection + scalar-nu diffusion, x/z periodic uniform, y wall
# with arbitrary stretching. Parity vs ops.convective/diffusive is gated
# to f64 roundoff in tests/test_pallas_kernels.py.


def predictor_slab_math_channel(u_e, v_e, w_e, inv_dy, inv_dyc, inv_dgy,
                                inv2_cy, inv2_fy, hx, hz, nu, fx, dt,
                                scheme=None, nut_e=None):
    """Star update on x-halo-extended slabs for the wall-y channel.

    u_e, w_e: (bx+2, Ny, Nz); v_e: (bx+2, Ny+1, Nz) (y-face staggered,
    wall faces stored). y-geometry vectors (broadcast (1, n, 1)):
      inv_dy  (Ny)    1/cell width
      inv_dyc (Ny+1)  1/center-to-center distance at faces (boundary:
                      half-cell, the folded Poisson metric)
      inv_dgy (Ny+1)  1/ghost-aware center spacing (mirror ghosts) for
                      wall-tangential gradients (ops._inv_dpos_c)
      inv2_cy (Ny)    1/(2-apart ghost-aware center distance): cc_central
      inv2_fy (Ny+1)  1/(2-apart face distance, odd-reflection ghosts)
    Math identical to ops._conv_skew / _conv_advective(CENTRAL) +
    ops.diffusive for this BC set.
    """
    from ..config import ConvectiveScheme as _CS
    skew = scheme is None or scheme == _CS.SKEW
    ihx, ihz = 1.0 / hx, 1.0 / hz

    def X(f, n):
        return jax.lax.slice_in_dim(f, 1 + n, f.shape[0] - 1 + n, axis=0)

    def wall_pad_t(f):
        # pad_tangential WALL: ghosts = -interior (no-slip value 0)
        return jnp.concatenate([-f[:, :1], f, -f[:, -1:]], axis=1)

    def mirror_pad_c(f):
        # pad_center neumann: mirror values
        return jnp.concatenate([f[:, :1], f, f[:, -1:]], axis=1)

    # ---- u component (x-face, y-center, z-center) ---------------------
    u_c = X(u_e, 0)
    hi_n = X(u_e, 1)
    lo_n = X(u_e, -1)
    Ve = 0.5 * (X(v_e, -1) + X(v_e, 0))          # (bx, Ny+1, Nz)
    up = wall_pad_t(u_c)                          # (bx, Ny+2, Nz)
    We = 0.5 * (X(w_e, -1) + X(w_e, 0))
    if skew:
        # d=0 own axis (periodic uniform): phi_c[i] = 0.5(u_i + u_{i+1})
        conv_u = 0.5 * ((0.5 * (u_c + hi_n)) * hi_n
                        - (0.5 * (lo_n + u_c)) * lo_n) * ihx
        # d=1 (wall y): advecting v at (x-face, y-face): 0.5(v_{i-1}+v_i)
        conv_u += 0.5 * (Ve[:, 1:] * up[:, 2:]
                         - Ve[:, :-1] * up[:, :-2]) * inv_dy
        # d=2 (periodic z): advecting w at (x-face, z-face)
        conv_u += 0.5 * (_Rz(We, 1) * _Rz(u_c, 1)
                         - We * _Rz(u_c, -1)) * ihz
    else:
        # CENTRAL advective form: adv (4-pt averaged to phi points) *
        # central derivative (ops._conv_advective)
        conv_u = u_c * (hi_n - lo_n) * (0.5 * ihx)
        V_at_u = 0.5 * (Ve[:, :-1] + Ve[:, 1:])   # (bx, Ny, Nz)
        conv_u += V_at_u * (up[:, 2:] - up[:, :-2]) * inv2_cy
        W_at_u = 0.5 * (We + _Rz(We, 1))
        conv_u += W_at_u * (_Rz(u_c, 1) - _Rz(u_c, -1)) * (0.5 * ihz)
    # diffusion: x,z uniform; y flux form with ghost-aware wall gradient
    # (no-slip) and mirrored flux pad. Variable nu (LES): cell nu on the
    # own-axis faces, 4-pt corner averages on transverse faces, in the
    # library's interpolation order (flux direction first) —
    # ops.diffusive.
    g_uy = (up[:, 1:] - up[:, :-1]) * inv_dgy     # (bx, Ny+1, Nz) faces
    if nut_e is None:
        F = nu * g_uy
        lap_u = (nu * (X(u_e, 1) - 2.0 * u_c + X(u_e, -1)) * ihx * ihx
                 + (F[:, 1:] - F[:, :-1]) * inv_dy
                 + nu * (_Rz(u_c, 1) - 2.0 * u_c
                         + _Rz(u_c, -1)) * ihz * ihz)
    else:
        ne = nu + nut_e                           # (bx+2, Ny, Nz) cells
        # x (own axis): flux at the two neighbor cells of face i
        Fx_hi = X(ne, 0) * (X(u_e, 1) - u_c) * ihx
        Fx_lo = X(ne, -1) * (u_c - X(u_e, -1)) * ihx
        # y: nu at (x-face, y-face): y mirror-avg then x-avg
        nmp = mirror_pad_c(ne)
        n_yf = 0.5 * (nmp[:, :-1] + nmp[:, 1:])   # (bx+2, Ny+1, Nz)
        n_uy = 0.5 * (X(n_yf, -1) + X(n_yf, 0))
        Fy = n_uy * g_uy
        # z: nu at (x-face, z-face): z-avg then x-avg
        n_zf = 0.5 * (_Rz(ne, -1) + ne)
        n_uz = 0.5 * (X(n_zf, -1) + X(n_zf, 0))
        Fz = n_uz * (u_c - _Rz(u_c, -1)) * ihz    # at z-face k
        lap_u = ((Fx_hi - Fx_lo) * ihx
                 + (Fy[:, 1:] - Fy[:, :-1]) * inv_dy
                 + (_Rz(Fz, 1) - Fz) * ihz)
    star_u = u_c + dt * (-conv_u + lap_u + fx)

    # ---- v component (y-face staggered: Ny+1 values incl. walls) ------
    v_c = X(v_e, 0)                               # (bx, Ny+1, Nz)
    npad = jnp.concatenate([2.0 * v_c[:, :1] - v_c[:, 1:2], v_c,
                            2.0 * v_c[:, -1:] - v_c[:, -2:-1]], axis=1)
    # advecting u at (x-face, y-face): wall-pad u, 0.5 y-sum; ext in x
    u_wp = jnp.concatenate([-u_e[:, :1], u_e, -u_e[:, -1:]], axis=1)
    ue_yf = 0.5 * (u_wp[:, :-1] + u_wp[:, 1:])    # (bx+2, Ny+1, Nz)
    # advecting w interpolated to y-faces (already at z-faces)
    wp0 = wall_pad_t(X(w_e, 0))
    w_yf = 0.5 * (wp0[:, :-1] + wp0[:, 1:])       # (bx, Ny+1, Nz)
    if skew:
        # d=1 own axis: phi_c = f2c_mean -> Ny cell values; mirror-pad;
        # CV-face advecting velocity u_lo/u_hi per face; neighbors via
        # odd-reflection normal pad; width = inv_dyc
        phi_c = 0.5 * (v_c[:, :-1] + v_c[:, 1:])  # (bx, Ny, Nz)
        cpad = mirror_pad_c(phi_c)                # (bx, Ny+2, Nz)
        conv_v = 0.5 * (cpad[:, 1:] * npad[:, 2:]
                        - cpad[:, :-1] * npad[:, :-2]) * inv_dyc
        conv_v += 0.5 * (X(ue_yf, 1) * X(v_e, 1)
                         - X(ue_yf, 0) * X(v_e, -1)) * ihx
        conv_v += 0.5 * (_Rz(w_yf, 1) * _Rz(v_c, 1)
                         - w_yf * _Rz(v_c, -1)) * ihz
    else:
        conv_v = v_c * (npad[:, 2:] - npad[:, :-2]) * inv2_fy
        U_at_v = 0.5 * (X(ue_yf, 0) + X(ue_yf, 1))
        conv_v += U_at_v * (X(v_e, 1) - X(v_e, -1)) * (0.5 * ihx)
        W_at_v = 0.5 * (w_yf + _Rz(w_yf, 1))
        conv_v += W_at_v * (_Rz(v_c, 1) - _Rz(v_c, -1)) * (0.5 * ihz)
    # diffusion: own-axis flux form (cell gradients, mirror flux pad,
    # /inv_dyc); x,z uniform
    g_vy = (v_c[:, 1:] - v_c[:, :-1]) * inv_dy    # (bx, Ny, Nz) cells
    if nut_e is None:
        Fv = nu * g_vy
        Fp = mirror_pad_c(Fv)
        lap_v = (nu * (X(v_e, 1) - 2.0 * v_c + X(v_e, -1)) * ihx * ihx
                 + (Fp[:, 1:] - Fp[:, :-1]) * inv_dyc
                 + nu * (_Rz(v_c, 1) - 2.0 * v_c
                         + _Rz(v_c, -1)) * ihz * ihz)
    else:
        ne = nu + nut_e
        Fv = X(ne, 0) * g_vy
        Fp = mirror_pad_c(Fv)
        # x: nu at (x-face, y-face): x-avg first, then y mirror-avg
        nxf = 0.5 * (ne[:-1] + ne[1:])            # (bx+1, Ny, Nz) faces
        nxm = mirror_pad_c(nxf)
        n_vx = 0.5 * (nxm[:, :-1] + nxm[:, 1:])   # (bx+1, Ny+1, Nz)
        gx = (v_e[1:] - v_e[:-1]) * ihx           # at x-faces
        Fx = n_vx * gx
        # z: nu at (y-face, z-face): z-avg first, then y mirror-avg
        n_zf = 0.5 * (_Rz(X(ne, 0), -1) + X(ne, 0))
        nzm = mirror_pad_c(n_zf)
        n_vz = 0.5 * (nzm[:, :-1] + nzm[:, 1:])   # (bx, Ny+1, Nz)
        Fz = n_vz * (v_c - _Rz(v_c, -1)) * ihz
        lap_v = ((Fx[1:] - Fx[:-1]) * ihx
                 + (Fp[:, 1:] - Fp[:, :-1]) * inv_dyc
                 + (_Rz(Fz, 1) - Fz) * ihz)
    star_v = v_c + dt * (-conv_v + lap_v)

    # ---- w component (z-face staggered; y-center like u) --------------
    w_c = X(w_e, 0)
    hi_n = _Rz(w_c, 1)
    lo_n = _Rz(w_c, -1)
    Ue = 0.5 * (_Rz(u_e, -1) + u_e)               # u at (x-face, z-face)
    Ve_w = 0.5 * (_Rz(X(v_e, 0), -1) + X(v_e, 0))  # (bx, Ny+1, Nz)
    wp = wall_pad_t(w_c)
    if skew:
        conv_w = 0.5 * ((0.5 * (w_c + hi_n)) * hi_n
                        - (0.5 * (lo_n + w_c)) * lo_n) * ihz
        conv_w += 0.5 * (X(Ue, 1) * X(w_e, 1)
                         - X(Ue, 0) * X(w_e, -1)) * ihx
        # d=1 (wall y): advecting v at (y-face, z-face): 0.5(v_{k-1}+v_k)
        conv_w += 0.5 * (Ve_w[:, 1:] * wp[:, 2:]
                         - Ve_w[:, :-1] * wp[:, :-2]) * inv_dy
    else:
        conv_w = w_c * (hi_n - lo_n) * (0.5 * ihz)
        U_at_w = 0.5 * (X(Ue, 0) + X(Ue, 1))
        conv_w += U_at_w * (X(w_e, 1) - X(w_e, -1)) * (0.5 * ihx)
        V_at_w = 0.5 * (Ve_w[:, :-1] + Ve_w[:, 1:])
        conv_w += V_at_w * (wp[:, 2:] - wp[:, :-2]) * inv2_cy
    g_wy = (wp[:, 1:] - wp[:, :-1]) * inv_dgy
    if nut_e is None:
        Fw = nu * g_wy
        lap_w = (nu * (X(w_e, 1) - 2.0 * w_c + X(w_e, -1)) * ihx * ihx
                 + (Fw[:, 1:] - Fw[:, :-1]) * inv_dy
                 + nu * (_Rz(w_c, 1) - 2.0 * w_c
                         + _Rz(w_c, -1)) * ihz * ihz)
    else:
        ne = nu + nut_e
        # z (own axis): cell-centered nu on the cell fluxes
        nc = X(ne, 0)
        Fz_c = nc * (_Rz(w_c, 1) - w_c) * ihz     # flux of cell k
        # x: nu at (x-face, z-face): x-avg first, then z-avg
        nxf = 0.5 * (ne[:-1] + ne[1:])            # (bx+1, Ny, Nz)
        n_wx = 0.5 * (_Rz(nxf, -1) + nxf)
        gx = (w_e[1:] - w_e[:-1]) * ihx
        Fx = n_wx * gx
        # y: nu at (y-face, z-face): y mirror-avg first, then z-avg
        nmp = mirror_pad_c(nc)
        n_yf = 0.5 * (nmp[:, :-1] + nmp[:, 1:])   # (bx, Ny+1, Nz)
        n_wy = 0.5 * (_Rz(n_yf, -1) + n_yf)
        Fy = n_wy * g_wy
        lap_w = ((Fx[1:] - Fx[:-1]) * ihx
                 + (Fy[:, 1:] - Fy[:, :-1]) * inv_dy
                 + (Fz_c - _Rz(Fz_c, -1)) * ihz)
    star_w = w_c + dt * (-conv_w + lap_w)

    return star_u, star_v, star_w


def _channel_kernel(dt_ref, *refs, hx, hz, nu, fx, scheme, has_nut):
    inv_dy, inv_dyc, inv_dgy, inv2_cy, inv2_fy = refs[:5]
    rest = refs[5:]
    if has_nut:
        (ul, uc, ur, vl, vc, vr, wl, wc, wr,
         nl, nc, nr, su, sv, sw) = rest
    else:
        ul, uc, ur, vl, vc, vr, wl, wc, wr, su, sv, sw = rest
        nl = nc = nr = None

    def ext(l, c, r):
        return jnp.concatenate([l[-1:], c[:], r[:1]], axis=0)

    dt = dt_ref[0]
    nut_e = ext(nl, nc, nr) if has_nut else None
    s_u, s_v, s_w = predictor_slab_math_channel(
        ext(ul, uc, ur), ext(vl, vc, vr), ext(wl, wc, wr),
        inv_dy[:], inv_dyc[:], inv_dgy[:], inv2_cy[:], inv2_fy[:],
        hx, hz, nu, fx, dt, scheme=scheme, nut_e=nut_e)
    su[:] = s_u
    sv[:] = s_v
    sw[:] = s_w


def channel_slab_eligible(geom, cfg) -> bool:
    """Structural gate for the specialized channel predictor."""
    from ..config import BCType, ConvectiveScheme as CS
    x, y, z = geom.axes
    return (x.periodic and x.uniform and z.periodic and z.uniform
            and y.bc == BCType.WALL and z.n > 1
            and cfg.space_order == 2
            and cfg.convective_scheme in (CS.SKEW, CS.CENTRAL)
            and not cfg.implicit_y_diffusion
            # this kernel's wall ghosts hardcode stationary no-slip
            # (predictor_slab_math_channel wall_pad_t); moving-wall runs
            # take fused_predictor_general, which honors AxisGeom.tang
            and cfg.lid_velocity == 0.0)


def _channel_y_arrays(geom):
    """The five y-geometry vectors, shaped (1, n, 1)."""
    y = geom.axes[1]
    p = y.pos_c_pad                      # (1, Ny+2, 1) mirrored ghosts
    inv_dgy = 1.0 / (p[:, 1:] - p[:, :-1])
    inv2_cy = 1.0 / (p[:, 2:] - p[:, :-2])          # (Ny) cc_central
    pf = y.pos_f_pad                     # (1, Ny+3, 1) odd-refl faces
    inv2_fy = 1.0 / (pf[:, 2:] - pf[:, :-2])        # (Ny+1) ff_central
    return y.inv_d, y.inv_dc, inv_dgy, inv2_cy, inv2_fy


def fused_predictor_channel(u, v, w, dt, *, geom, nu, fx, bx=4,
                            scheme=None, nu_t=None, interpret=False):
    """Specialized fused predictor for the wall-y channel (O2 skew or
    central, scalar or variable nu, periodic-uniform x/z, arbitrary y
    stretching)."""
    Nx = u.shape[0]
    bx = _auto_bx_thin(bx, Nx, geom.axes[1].n, geom.axes[2].n)
    G = Nx // bx

    def specs_for(arr):
        return _thin_specs(arr, bx, 1, Nx)

    ys = [jnp.asarray(a, u.dtype) for a in _channel_y_arrays(geom)]
    fields = (u, v, w) if nu_t is None else (u, v, w, nu_t)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in ys]
    for arr in fields:
        in_specs += specs_for(arr)
    out_specs = [pl.BlockSpec((bx,) + arr.shape[1:], lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
                 for arr in (u, v, w)]
    out_shape = [jax.ShapeDtypeStruct(arr.shape, arr.dtype)
                 for arr in (u, v, w)]
    dt_arr = jnp.reshape(jnp.asarray(dt, u.dtype), (1,))
    kernel = functools.partial(_channel_kernel, hx=geom.x.h, hz=geom.z.h,
                               nu=nu, fx=fx, scheme=scheme,
                               has_nut=nu_t is not None)
    triple = []
    for arr in fields:
        triple += [arr, arr, arr]
    return pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=_fat_kernel_params(u.shape[1], u.shape[2], bx),
        interpret=interpret,
    )(dt_arr, *ys, *triple)


@functools.partial(jax.jit, static_argnames=("hx", "hy", "hz", "nu", "fx",
                                             "bx", "interpret"))
def fused_predictor(u, v, w, dt, *, hx, hy, hz, nu, fx, bx=4,
                    interpret=False):
    """Fused skew+diffusion+force Euler predictor over x-slabs.

    All-periodic uniform O2 path; math identical to the jnp operator
    chain (see predictor_slab_math).
    """
    Nx, Ny, Nz = u.shape
    bx = _auto_bx_thin(bx, Nx, Ny, Nz)
    G = Nx // bx
    blk = (bx, Ny, Nz)

    specs = []
    for _ in range(3):
        specs += _thin_specs(u, bx, 1, Nx)

    dt_arr = jnp.reshape(jnp.asarray(dt, u.dtype), (1,))
    kernel = functools.partial(_predictor_kernel, hx=hx, hy=hy, hz=hz,
                               nu=nu, fx=fx)
    out_shape = [jax.ShapeDtypeStruct(u.shape, u.dtype)] * 3
    out_spec = pl.BlockSpec(blk, lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + specs,
        out_specs=[out_spec] * 3,
        out_shape=out_shape,
        compiler_params=_slab_compiler_params(Ny, Nz),
        interpret=interpret,
    )(dt_arr, u, u, u, v, v, v, w, w, w)


# ---------------------------------------------------------------------------
# Predictor + divergence fusion: div(u*) computed in the SAME kernel pass
# ---------------------------------------------------------------------------
#
# The projection needs div(u*) immediately after the predictor; computing it
# in a separate kernel re-reads all three star components from HBM (~25 MB
# at 128^3 — the step is bandwidth-bound, trace: predictor 0.072 ms +
# divergence in closed_call 0.02+ ms of a 0.197 ms step). Fusing costs one
# extra star plane per slab (the i+1 u-face the cell divergence needs) and
# eliminates the re-read. Valid only when NOTHING modifies u* between the
# predictor and the projection: no trip forcing, no IBM, no recycling, no
# inflow pinning — and the BC application must be either a no-op
# (all-periodic) or the channel wall-face zeroing, which the channel
# variant applies in-kernel. The solver gates on exactly these conditions
# (Simulation._fuse_div_ok).


def _predictor_div_kernel(dt_ref, ul, uc, ur, vl, vc, vr, wl, wc, wr,
                          su, sv, sw, dv, *, hx, hy, hz, nu, fx):
    """All-periodic predictor + staggered cell divergence of the star.

    Asymmetric halo (1 left, 2 right): star is computed on bx+1 planes so
    the divergence of cell i can use the star u-face at i+1; the extra
    plane is recomputed by the right neighbor as its own first plane
    (identical arithmetic => identical f32 values)."""
    def ext(l, c, r):
        return jnp.concatenate([l[-1:], c[:], r[:2]], axis=0)

    dt = dt_ref[0]
    s_u, s_v, s_w = predictor_slab_math(
        ext(ul, uc, ur), ext(vl, vc, vr), ext(wl, wc, wr),
        hx, hy, hz, nu, fx, dt)                    # (bx+1, Ny, Nz)
    u0, v0, w0 = s_u[:-1], s_v[:-1], s_w[:-1]
    su[:] = u0
    sv[:] = v0
    sw[:] = w0
    ihx, ihy, ihz = 1.0 / hx, 1.0 / hy, 1.0 / hz
    dv[:] = ((s_u[1:] - u0) * ihx
             + (_Ry(v0, 1) - v0) * ihy
             + (_Rz(w0, 1) - w0) * ihz)


def fused_predictor_div(u, v, w, dt, *, hx, hy, hz, nu, fx, bx=4,
                        interpret=False):
    """fused_predictor that also returns div(u*) (same pass).

    Returns (star_u, star_v, star_w, div). Requires bx >= 2 (the right
    halo supplies two planes); the caller falls back to the separate
    kernels otherwise."""
    Nx, Ny, Nz = u.shape
    bx = _auto_bx(bx, Nx, Ny, Nz)
    if bx < 2:
        raise ValueError("fused_predictor_div needs bx >= 2")
    G = Nx // bx
    blk = (bx, Ny, Nz)

    def spec(off):
        return pl.BlockSpec(blk, lambda i, o=off: ((i + o) % G, 0, 0),
                            memory_space=pltpu.VMEM)

    specs = []
    for _ in range(3):
        specs += [spec(-1), spec(0), spec(1)]
    dt_arr = jnp.reshape(jnp.asarray(dt, u.dtype), (1,))
    kernel = functools.partial(_predictor_div_kernel, hx=hx, hy=hy, hz=hz,
                               nu=nu, fx=fx)
    out_shape = [jax.ShapeDtypeStruct(u.shape, u.dtype)] * 4
    out_spec = pl.BlockSpec(blk, lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + specs,
        out_specs=[out_spec] * 4,
        out_shape=out_shape,
        compiler_params=_slab_compiler_params(Ny, Nz),
        interpret=interpret,
    )(dt_arr, u, u, u, v, v, v, w, w, w)


def _channel_div_kernel(dt_ref, *refs, hx, hz, nu, fx, scheme, has_nut):
    """Channel predictor + wall-face zeroing of v* + divergence of star.

    The solver's apply_velocity_bc zeroes v's wall faces after the
    predictor; the fused divergence must see exactly that field, so the
    zeroing happens here and the returned star_v already carries it
    (apply_velocity_bc afterwards is idempotent)."""
    inv_dy, inv_dyc, inv_dgy, inv2_cy, inv2_fy = refs[:5]
    rest = refs[5:]
    if has_nut:
        (ul, uc, ur, vl, vc, vr, wl, wc, wr,
         nl, nc, nr, su, sv, sw, dv) = rest
    else:
        (ul, uc, ur, vl, vc, vr, wl, wc, wr,
         su, sv, sw, dv) = rest
        nl = nc = nr = None

    def ext(l, c, r):
        return jnp.concatenate([l[-1:], c[:], r[:2]], axis=0)

    dt = dt_ref[0]
    nut_e = ext(nl, nc, nr) if has_nut else None
    s_u, s_v, s_w = predictor_slab_math_channel(
        ext(ul, uc, ur), ext(vl, vc, vr), ext(wl, wc, wr),
        inv_dy[:], inv_dyc[:], inv_dgy[:], inv2_cy[:], inv2_fy[:],
        hx, hz, nu, fx, dt, scheme=scheme, nut_e=nut_e)  # (bx+1, ...)
    zf = jnp.zeros_like(s_v[:, :1])
    s_v = jnp.concatenate([zf, s_v[:, 1:-1], zf], axis=1)
    u0, v0, w0 = s_u[:-1], s_v[:-1], s_w[:-1]
    su[:] = u0
    sv[:] = v0
    sw[:] = w0
    ihx, ihz = 1.0 / hx, 1.0 / hz
    dv[:] = ((s_u[1:] - u0) * ihx
             + (v0[:, 1:] - v0[:, :-1]) * inv_dy[:]
             + (_Rz(w0, 1) - w0) * ihz)


def fused_predictor_channel_div(u, v, w, dt, *, geom, nu, fx, bx=4,
                                scheme=None, nu_t=None, interpret=False):
    """fused_predictor_channel that also returns div(u*) with v's wall
    faces zeroed in-kernel. Returns (star_u, star_v, star_w, div)."""
    Nx = u.shape[0]
    bx = _auto_bx(bx, Nx, geom.axes[1].n, geom.axes[2].n)
    if bx < 2:
        raise ValueError("fused_predictor_channel_div needs bx >= 2")
    G = Nx // bx

    def specs_for(arr):
        blk = (bx,) + arr.shape[1:]
        return [pl.BlockSpec(blk, lambda i, o=off: ((i + o) % G, 0, 0),
                             memory_space=pltpu.VMEM)
                for off in (-1, 0, 1)]

    ys = [jnp.asarray(a, u.dtype) for a in _channel_y_arrays(geom)]
    fields = (u, v, w) if nu_t is None else (u, v, w, nu_t)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in ys]
    for arr in fields:
        in_specs += specs_for(arr)
    outs = [u, v, w]
    out_specs = [pl.BlockSpec((bx,) + arr.shape[1:], lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
                 for arr in outs]
    out_shape = [jax.ShapeDtypeStruct(arr.shape, arr.dtype)
                 for arr in outs]
    ny, nz = geom.axes[1].n, geom.axes[2].n
    out_specs.append(pl.BlockSpec((bx, ny, nz), lambda i: (i, 0, 0),
                                  memory_space=pltpu.VMEM))
    out_shape.append(jax.ShapeDtypeStruct((Nx, ny, nz), u.dtype))
    dt_arr = jnp.reshape(jnp.asarray(dt, u.dtype), (1,))
    kernel = functools.partial(_channel_div_kernel, hx=geom.x.h,
                               hz=geom.z.h, nu=nu, fx=fx, scheme=scheme,
                               has_nut=nu_t is not None)
    triple = []
    for arr in fields:
        triple += [arr, arr, arr]
    return pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=_fat_kernel_params(u.shape[1], u.shape[2], bx),
        interpret=interpret,
    )(dt_arr, *ys, *triple)
