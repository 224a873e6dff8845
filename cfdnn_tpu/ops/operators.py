"""Staggered-MAC spatial operators (convection, diffusion, divergence,
projection correction, velocity gradients).

TPU-native rebuild of the reference face-kernel library + operator drivers
(reference: include/solver_kernels.hpp:204-2582, src/solver_operators.cpp:
493 compute_convective_term, :869 compute_diffusive_term, :1072
compute_divergence, :1259 correct_velocity). Everything here is pure `jnp` on
unique-DOF staggered arrays; ghosts are materialized via ops.bc pads and XLA
fuses the whole chain. Stretched axes use true coordinate differences (the
reference's uniform-h kernels are recovered exactly on uniform grids).

Component/axis convention: comps = (u, v, w); component c is staggered along
axis c ("s" below); "d" ranges over the three derivative directions.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ..config import BCType, ConvectiveScheme
from .bc import face_pair, pad_center, pad_normal, pad_tangential, sl
from .grid import AxisGeom, Geometry

Array = jnp.ndarray
Vel = Tuple[Array, Array, Array]


# ---------------------------------------------------------------------------
# Primitive interpolation / differentiation helpers
# ---------------------------------------------------------------------------


def _stored_faces(x: Array, axis: int, ax: AxisGeom) -> Array:
    """Slice an (N+1)-face array to the stored-face count (N if periodic)."""
    return sl(x, axis, 0, -1) if ax.periodic else x


def _inv_dpos_c(ax: AxisGeom) -> Array:
    """1/(ghost-aware center spacing) at all N+1 faces.

    Interior faces equal 1/dc; boundary faces use the mirrored-ghost distance
    (so a wall-tangential derivative across the wall face is exact no-slip).
    """
    p = ax.pos_c_pad
    a = ax_of(p)
    return 1.0 / (sl(p, a, 1, None) - sl(p, a, 0, -1))


def ax_of(b: Array) -> int:
    """Axis a broadcast-shaped (1,N,1)-style array varies along."""
    for i, s in enumerate(b.shape):
        if s > 1:
            return i
    return 0


def f2c_mean(f: Array, axis: int, ax: AxisGeom) -> Array:
    lo, hi = face_pair(f, axis, ax.bc)
    return 0.5 * (lo + hi)


def f2c_diff(f: Array, axis: int, ax: AxisGeom) -> Array:
    lo, hi = face_pair(f, axis, ax.bc)
    return (hi - lo) * ax.inv_d


# NOTE on the periodic branches below: ghost-pad concatenates change the
# array extent (N -> N+2), which on a GSPMD-sharded axis forces full-shard
# reshard collective-permutes per stencil application (measured 83 MB/
# device/step at 256^3 over 8 z-shards). The periodic case is therefore
# expressed with same-extent jnp.roll neighbors — identical arithmetic,
# but lowering to one-plane ICI permutes (scripts/analyze_collectives.py).


def c2f_mean(fc: Array, axis: int, ax: AxisGeom, kind: str = "vel",
             wall=(0.0, 0.0)) -> Array:
    """Cell-centered -> stored faces, arithmetic mean (reference 0.5 avgs).

    `wall`: tangential wall velocity pair for kind="vel" (AxisGeom.tang of
    the component being interpolated — nonzero only for a moving wall).
    """
    if ax.bc == BCType.PERIODIC:
        return 0.5 * (_R(fc, -1, axis) + fc)
    pad = (pad_tangential(fc, axis, ax.bc, wall=wall) if kind == "vel"
           else pad_center(fc, axis, ax.bc, kind="neumann"))
    avg = 0.5 * (sl(pad, axis, 0, -1) + sl(pad, axis, 1, None))
    return _stored_faces(avg, axis, ax)


def c2f_diff(fc: Array, axis: int, ax: AxisGeom, kind: str = "vel",
             wall=(0.0, 0.0)) -> Array:
    """Cell-centered -> derivative at stored faces (ghost-aware spacing)."""
    inv_sp = _inv_dpos_c(ax)
    if ax.bc == BCType.PERIODIC:
        a = ax_of(inv_sp)
        return (fc - _R(fc, -1, axis)) * sl(inv_sp, a, 0, -1)
    pad = (pad_tangential(fc, axis, ax.bc, wall=wall) if kind == "vel"
           else pad_center(fc, axis, ax.bc, kind="neumann"))
    g = (sl(pad, axis, 1, None) - sl(pad, axis, 0, -1)) * inv_sp
    return _stored_faces(g, axis, ax)


def cc_central(phi: Array, axis: int, ax: AxisGeom, wall=(0.0, 0.0)) -> Array:
    """Central derivative at centers of a field cell-centered along `axis`."""
    p = ax.pos_c_pad
    a = ax_of(p)
    den = sl(p, a, 2, None) - sl(p, a, 0, -2)
    if ax.bc == BCType.PERIODIC:
        return (_R(phi, 1, axis) - _R(phi, -1, axis)) / den
    pad = pad_tangential(phi, axis, ax.bc, wall=wall)
    return (sl(pad, axis, 2, None) - sl(pad, axis, 0, -2)) / den


def ff_central(phi: Array, axis: int, ax: AxisGeom) -> Array:
    """Central derivative at stored faces of a field staggered along `axis`."""
    p = ax.pos_f_pad
    a = ax_of(p)
    den = sl(p, a, 2, None) - sl(p, a, 0, -2)
    if ax.bc == BCType.PERIODIC:
        return (_R(phi, 1, axis) - _R(phi, -1, axis)) / den
    pad = pad_normal(phi, axis, ax.bc)
    return (sl(pad, axis, 2, None) - sl(pad, axis, 0, -2)) / den


# ---------------------------------------------------------------------------
# O4 periodic-uniform stencils (reference O4 kernel variants,
# include/solver_kernels.hpp O4 convective/diffusive/divergence/correct
# families; active on `o4_ok` axes when space_order=4)
# ---------------------------------------------------------------------------


def _R(f: Array, n: int, axis: int) -> Array:
    """Element i+n of a periodic array."""
    return jnp.roll(f, -n, axis=axis)


def f2c_mean4(F: Array, axis: int, ax: AxisGeom) -> Array:
    """O4 faces->cell i: (9(F_i+F_{i+1}) - (F_{i-1}+F_{i+2}))/16."""
    return (9.0 * (F + _R(F, 1, axis)) - (_R(F, -1, axis) + _R(F, 2, axis))) / 16.0


def f2c_diff4(F: Array, axis: int, ax: AxisGeom) -> Array:
    """O4 staggered d/dx at cell i: (27(F_{i+1}-F_i) - (F_{i+2}-F_{i-1}))/(24h)."""
    return (27.0 * (_R(F, 1, axis) - F)
            - (_R(F, 2, axis) - _R(F, -1, axis))) / (24.0 * ax.h)


def c2f_mean4(f: Array, axis: int, ax: AxisGeom) -> Array:
    """O4 cells->face i: (9(f_{i-1}+f_i) - (f_{i-2}+f_{i+1}))/16."""
    return (9.0 * (_R(f, -1, axis) + f) - (_R(f, -2, axis) + _R(f, 1, axis))) / 16.0


def c2f_diff4(f: Array, axis: int, ax: AxisGeom) -> Array:
    """O4 staggered d/dx at face i: (27(f_i-f_{i-1}) - (f_{i+1}-f_{i-2}))/(24h)."""
    return (27.0 * (f - _R(f, -1, axis))
            - (_R(f, 1, axis) - _R(f, -2, axis))) / (24.0 * ax.h)


def same_diff4(f: Array, axis: int, ax: AxisGeom) -> Array:
    """O4 collocated d/dx: (8(f_{i+1}-f_{i-1}) - (f_{i+2}-f_{i-2}))/(12h)."""
    return (8.0 * (_R(f, 1, axis) - _R(f, -1, axis))
            - (_R(f, 2, axis) - _R(f, -2, axis))) / (12.0 * ax.h)


def same_diff2_4(f: Array, axis: int, ax: AxisGeom) -> Array:
    """O4 collocated d2/dx2: (-f_{i+2}+16f_{i+1}-30f_i+16f_{i-1}-f_{i-2})/(12h^2)."""
    return (-_R(f, 2, axis) + 16.0 * _R(f, 1, axis) - 30.0 * f
            + 16.0 * _R(f, -1, axis) - _R(f, -2, axis)) / (12.0 * ax.h**2)


def _minmod(a: Array, b: Array) -> Array:
    same = a * b > 0.0
    pick = jnp.where(jnp.abs(a) < jnp.abs(b), a, b)
    return jnp.where(same, pick, 0.0)


def _upwind_pair(pad, pos, axis, a):
    """(backward, forward) one-sided derivatives from a 1-ghost pad."""
    num_b = sl(pad, axis, 1, -1) - sl(pad, axis, 0, -2)
    num_f = sl(pad, axis, 2, None) - sl(pad, axis, 1, -1)
    den_b = sl(pos, a, 1, -1) - sl(pos, a, 0, -2)
    den_f = sl(pos, a, 2, None) - sl(pos, a, 1, -1)
    return num_b / den_b, num_f / den_f


def _upwind2_deriv_pair(f_m2, f_m1, f_0, f_p1, f_p2, h_b, h_f):
    """(backward, forward) minmod-limited 2nd-order upwind derivatives,
    as the difference of MUSCL face reconstructions:

      backward: [ (f_0 + s_0/2) - (f_m1 + s_m1/2) ] / h_b
      forward:  [ (f_p1 - s_p1/2) - (f_0 - s_0f/2) ] / h_f

    with minmod-limited cell slopes s. In smooth regions this reduces to
    the consistent Beam-Warming stencil (3f_0 - 4f_m1 + f_m2)/(2h) + O(h^2);
    at extrema the limiter drops it to first-order upwind.

    Role parity with reference convective_*_upwind2 (include/
    solver_kernels.hpp:1863-2198) — but NOT its formula: the reference
    ADDS 0.5*minmod(d0, d-1) to the first-order difference, i.e. it
    applies a face-reconstruction increment as a derivative correction,
    which evaluates to 1.5x the true derivative in smooth monotone
    regions (an inconsistent scheme; see PARITY.md "Known reference
    defects corrected").
    """
    d_m1 = f_m1 - f_m2
    d_0 = f_0 - f_m1
    d_p1 = f_p1 - f_0
    d_p2 = f_p2 - f_p1
    back = (d_0 + 0.5 * (_minmod(d_p1, d_0) - _minmod(d_0, d_m1))) / h_b
    fwd = (d_p1 - 0.5 * (_minmod(d_p2, d_p1) - _minmod(d_p1, d_0))) / h_f
    return back, fwd


def _upwind2_pair(pad2, pos2, axis, a):
    """(backward, forward) limited 2nd-order upwind derivatives from a
    2-ghost pad, with local spacings on stretched axes."""
    f_m2 = sl(pad2, axis, 0, -4)
    f_m1 = sl(pad2, axis, 1, -3)
    f_0 = sl(pad2, axis, 2, -2)
    f_p1 = sl(pad2, axis, 3, -1)
    f_p2 = sl(pad2, axis, 4, None)
    h_b = sl(pos2, a, 2, -2) - sl(pos2, a, 1, -3)
    h_f = sl(pos2, a, 3, -1) - sl(pos2, a, 2, -2)
    return _upwind2_deriv_pair(f_m2, f_m1, f_0, f_p1, f_p2, h_b, h_f)


def _upwind_pair_periodic(f, pos, axis, a):
    """_upwind_pair on same-extent roll neighbors (periodic axes)."""
    f_m1 = _R(f, -1, axis)
    f_p1 = _R(f, 1, axis)
    den_b = sl(pos, a, 1, -1) - sl(pos, a, 0, -2)
    den_f = sl(pos, a, 2, None) - sl(pos, a, 1, -1)
    return (f - f_m1) / den_b, (f_p1 - f) / den_f


def _upwind2_pair_periodic(f, pos2, axis, a):
    """_upwind2_pair on same-extent roll neighbors (periodic axes)."""
    f_m2 = _R(f, -2, axis)
    f_m1 = _R(f, -1, axis)
    f_p1 = _R(f, 1, axis)
    f_p2 = _R(f, 2, axis)
    h_b = sl(pos2, a, 2, -2) - sl(pos2, a, 1, -3)
    h_f = sl(pos2, a, 3, -1) - sl(pos2, a, 2, -2)
    return _upwind2_deriv_pair(f_m2, f_m1, f, f_p1, f_p2, h_b, h_f)


# ---------------------------------------------------------------------------
# Convective term
# ---------------------------------------------------------------------------


def _advecting_velocity(comps: Vel, s: int, d: int, geom: Geometry) -> Array:
    """Component d interpolated to the DOF points of component s (4-pt avg;
    O4 interpolation on O4-capable axes)."""
    if d == s:
        return comps[s]
    if geom.use_o4(d):
        uc = f2c_mean4(comps[d], d, geom.axes[d])
    else:
        uc = f2c_mean(comps[d], d, geom.axes[d])
    if geom.use_o4(s):
        return c2f_mean4(uc, s, geom.axes[s])
    return c2f_mean(uc, s, geom.axes[s], kind="vel",
                    wall=geom.axes[s].tang[d])


def _conv_advective(comps: Vel, s: int, geom: Geometry,
                    scheme: ConvectiveScheme) -> Array:
    # SKEW is handled by _conv_skew (convective() routes it there); the
    # advective form here is NOT energy-conserving, so silently accepting
    # SKEW would mislabel a central scheme as skew
    assert scheme != ConvectiveScheme.SKEW
    phi = comps[s]
    out = jnp.zeros_like(phi)
    for d in range(3):
        ax = geom.axes[d]
        if ax.n == 1:
            continue
        adv = _advecting_velocity(comps, s, d, geom)
        if scheme == ConvectiveScheme.CENTRAL:
            if geom.use_o4(d):
                dphi = same_diff4(phi, d, ax)
            else:
                dphi = (ff_central(phi, d, ax) if d == s
                        else cc_central(phi, d, ax, wall=ax.tang[s]))
        else:
            ng = 2 if scheme == ConvectiveScheme.UPWIND2 else 1
            if d == s:
                pos = ax.pos_f_pad2 if ng == 2 else ax.pos_f_pad
            else:
                pos = ax.pos_c_pad2 if ng == 2 else ax.pos_c_pad
            a = ax_of(pos)
            if ax.bc == BCType.PERIODIC:
                if ng == 2:
                    back, fwd = _upwind2_pair_periodic(phi, pos, d, a)
                else:
                    back, fwd = _upwind_pair_periodic(phi, pos, d, a)
            else:
                pad = (pad_normal(phi, d, ax.bc, ng=ng) if d == s
                       else pad_tangential(phi, d, ax.bc, ng=ng,
                                           wall=ax.tang[s]))
                if ng == 2:
                    back, fwd = _upwind2_pair(pad, pos, d, a)
                else:
                    back, fwd = _upwind_pair(pad, pos, d, a)
            dphi = jnp.where(adv >= 0.0, back, fwd)
        out = out + adv * dphi
    return out


def _periodic_bdiff(F: Array, axis: int, ax: AxisGeom) -> Array:
    """(F_i - F_{i-1}) * inv_dc with wrap — the shared periodic
    backward-difference of _bdiff_stored AND pressure_grad_face (the
    two must stay identical for D.G = L projection consistency)."""
    a = ax_of(ax.inv_dc)
    return (F - _R(F, -1, axis)) * sl(ax.inv_dc, a, 0, -1)


def _bdiff_stored(F: Array, axis: int, ax: AxisGeom) -> Array:
    """(F_i - F_{i-1}) * inv_dc at the stored faces of a cell-centered F
    (neumann ghosts). The shared flux-divergence piece of the
    conservative/skew convection and the diffusion normal term."""
    if ax.bc == BCType.PERIODIC:
        return _periodic_bdiff(F, axis, ax)
    pad = pad_center(F, axis, ax.bc, kind="neumann")
    g = (sl(pad, axis, 1, None) - sl(pad, axis, 0, -1)) * ax.inv_dc
    return _stored_faces(g, axis, ax)


def _conv_skew(comps: Vel, s: int, geom: Geometry) -> Array:
    """Exactly energy-conserving skew form.

    Algebraic reduction of 0.5*(divergence + CV-face-consistent advective):
    for each control-volume face pair of phi,
        N(phi) = (u_f_hi * phi_nb_hi - u_f_lo * phi_nb_lo) / (2 W)
    with u_f the advecting velocity interpolated to the CV face and W the CV
    width. The flux telescopes, so sum_cells V * phi * N(phi) == 0 to
    roundoff for ANY velocity field and stretching — stronger than the
    reference's skew kernels (include/solver_kernels.hpp:1377-1860), whose
    point-valued advecting velocity leaks O(h^2) energy (their
    test_skew_energy_conservation gate passes a fortiori).
    """
    phi = comps[s]
    axs = geom.axes[s]
    out = jnp.zeros_like(phi)
    for d in range(3):
        ax = geom.axes[d]
        if ax.n == 1:
            continue
        if d == s:
            phi_c = f2c_mean(phi, s, axs)                 # u_f at CV faces
            if axs.bc == BCType.PERIODIC:
                u_lo = _R(phi_c, -1, s)
                u_hi = phi_c
                lo_n = _R(phi, -1, s)
                hi_n = _R(phi, 1, s)
            else:
                cpad = pad_center(phi_c, s, axs.bc, kind="neumann")
                u_lo = _stored_faces(sl(cpad, s, 0, -1), s, axs)
                u_hi = _stored_faces(sl(cpad, s, 1, None), s, axs)
                npad = pad_normal(phi, s, axs.bc)
                lo_n = sl(npad, s, 0, -2)
                hi_n = sl(npad, s, 2, None)
            inv_w = _stored_faces(axs.inv_dc, ax_of(axs.inv_dc), axs)
            out = out + 0.5 * (u_hi * hi_n - u_lo * lo_n) * inv_w
        else:
            U_e = c2f_mean(comps[d], s, axs, kind="vel",  # at CV faces (edges)
                           wall=axs.tang[d])
            u_lo, u_hi = face_pair(U_e, d, ax.bc)
            if ax.bc == BCType.PERIODIC:
                lo_n = _R(phi, -1, d)
                hi_n = _R(phi, 1, d)
            else:
                tpad = pad_tangential(phi, d, ax.bc, wall=ax.tang[s])
                lo_n = sl(tpad, d, 0, -2)
                hi_n = sl(tpad, d, 2, None)
            out = out + 0.5 * (u_hi * hi_n - u_lo * lo_n) * ax.inv_d
    return out


def convective(comps: Vel, geom: Geometry,
               scheme: ConvectiveScheme = ConvectiveScheme.CENTRAL) -> Vel:
    """Convective term for each momentum component at its own DOF points.

    central/upwind/upwind2 are advective-form u.grad(phi) (reference:
    include/solver_kernels.hpp:341-428, 1863-2198); skew is the exactly
    energy-conserving telescoping form (see _conv_skew).
    """
    out = []
    for s in range(3):
        if scheme == ConvectiveScheme.SKEW:
            out.append(_conv_skew(comps, s, geom))
        else:
            out.append(_conv_advective(comps, s, geom, scheme))
    return tuple(out)


# ---------------------------------------------------------------------------
# Diffusive term (Laplacian form, variable viscosity)
# ---------------------------------------------------------------------------


def diffusive(comps: Vel, nu_center, geom: Geometry,
              skip_y: bool = False) -> Vel:
    """div(nu grad(phi)) per component with corner-averaged viscosity.

    Matches the reference staggered diffusion kernels (include/
    solver_kernels.hpp:430-567, 2199-2460): nu is taken directly at the cell
    centers aligned with the phi control-volume faces along phi's own axis and
    4-point corner-averaged on the transverse faces. `skip_y` omits the
    y-direction term (used with implicit y-diffusion, reference *_xz kernels).
    """
    out = []
    scalar_nu = jnp.ndim(nu_center) == 0
    for s in range(3):
        phi = comps[s]
        axs = geom.axes[s]
        term = jnp.zeros_like(phi)
        for d in range(3):
            ax = geom.axes[d]
            if ax.n == 1 or (skip_y and d == 1):
                continue
            if scalar_nu and geom.use_o4(d):
                term = term + nu_center * same_diff2_4(phi, d, ax)
                continue
            if d == s:
                g_c = f2c_diff(phi, s, axs)
                nu_c = nu_center
                F = nu_c * g_c
                term = term + _bdiff_stored(F, s, axs)
            else:
                g_f = c2f_diff(phi, d, ax, kind="vel", wall=ax.tang[s])
                if scalar_nu:
                    nu_e = nu_center
                else:
                    nu_e = c2f_mean(
                        c2f_mean(nu_center, d, ax, kind="scalar"),
                        s, axs, kind="scalar")
                F = nu_e * g_f
                lo, hi = face_pair(F, d, ax.bc)
                term = term + (hi - lo) * ax.inv_d
        out.append(term)
    return tuple(out)


# ---------------------------------------------------------------------------
# Divergence / projection pieces
# ---------------------------------------------------------------------------


def divergence(comps: Vel, geom: Geometry) -> Array:
    """Staggered cell divergence (reference: solver_kernels.hpp:275,568)."""
    div = None
    for axis in range(3):
        ax = geom.axes[axis]
        if ax.n == 1:
            continue
        if geom.use_o4(axis):
            t = f2c_diff4(comps[axis], axis, ax)
        else:
            lo, hi = face_pair(comps[axis], axis, ax.bc)
            t = (hi - lo) * ax.inv_d
        div = t if div is None else div + t
    return div


def pressure_grad_face(p: Array, axis: int, geom: Geometry) -> Array:
    """dp/dx_axis at the stored faces of the normal velocity component.

    Uses the Neumann mirror ghost so wall boundary faces get exactly zero
    gradient; interior faces use the same 1/dc spacings as the consistent
    Laplacian metrics — this makes projection exact (D.G = L) on stretched
    grids (reference yLap metrics, include/mesh.hpp:16-182).
    """
    ax = geom.axes[axis]
    if geom.use_o4(axis):
        return c2f_diff4(p, axis, ax)
    if ax.bc == BCType.PERIODIC:
        return _periodic_bdiff(p, axis, ax)
    from .bc import pad_pressure
    pad = pad_pressure(p, axis, ax)
    g = (sl(pad, axis, 1, None) - sl(pad, axis, 0, -1)) * ax.inv_dc
    return _stored_faces(g, axis, ax)


def correct_velocity(comps: Vel, p_corr: Array, dt, geom: Geometry) -> Vel:
    """u <- u* - dt grad(p') (reference: solver_kernels.hpp:298,667-844)."""
    out = []
    for axis in range(3):
        f = comps[axis]
        if geom.axes[axis].n == 1:
            out.append(f)
            continue
        out.append(f - dt * pressure_grad_face(p_corr, axis, geom))
    return tuple(out)


def laplacian(p: Array, geom: Geometry) -> Array:
    """Consistent scalar Laplacian L = D(G(p)) used by the Poisson solvers."""
    lap = None
    for axis in range(3):
        ax = geom.axes[axis]
        if ax.n == 1:
            continue
        g = pressure_grad_face(p, axis, geom)
        if geom.use_o4(axis):
            t = f2c_diff4(g, axis, ax)
        else:
            lo, hi = face_pair(g, axis, ax.bc)
            t = (hi - lo) * ax.inv_d
        lap = t if lap is None else lap + t
    return lap


# ---------------------------------------------------------------------------
# Velocity gradient tensor (for turbulence closures / diagnostics)
# ---------------------------------------------------------------------------


def velocity_gradient(comps: Vel, geom: Geometry):
    """9-component grad(u) at cell centers (reference:
    include/velocity_gradient.hpp:1-31, gpu_kernels.hpp:31-49).

    Returns G[i][j] = d u_i / d x_j, each (Nx,Ny,Nz).
    """
    G = [[None] * 3 for _ in range(3)]
    for i in range(3):
        phi = comps[i]
        axi = geom.axes[i]
        for j in range(3):
            ax = geom.axes[j]
            if ax.n == 1:
                G[i][j] = jnp.zeros(
                    tuple(geom.axes[a].n for a in range(3)), phi.dtype)
                continue
            if i == j:
                G[i][j] = f2c_diff(phi, i, axi)
            else:
                d = cc_central(phi, j, ax, wall=ax.tang[i])  # at phi points
                G[i][j] = f2c_mean(d, i, axi)    # -> cell centers
    return G
