"""Ghost-value materialization and velocity BC application.

Replaces the reference's ghost layers + apply_velocity_bc / fused BC kernels
(reference: src/solver_operators.cpp:43, include/solver_kernels.hpp:44-203,
src/cuda_kernels/halo_pack.cu:17-60): instead of storing ghosts and launching
BC kernels, operators call `pad_*` which build the (N+2)-extended array on the
fly; XLA fuses the concatenation into the consuming stencil.

Ghost rules (2nd order):
  periodic          -> wrap
  cell 'neumann'    -> mirror value          (dp/dn = 0)
  cell 'dirichlet'  -> 2*g - interior        (value g at the wall face)
  tangential no-slip-> -interior             (u = 0 at the wall)
  normal face       -> boundary face stored; ghost = 2*f_bnd - f_next (odd)
  outflow           -> zero-gradient copy
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ..config import BCType
from .grid import Geometry

__all__ = [
    "sl", "pad_center", "pad_tangential", "pad_normal",
    "face_pair", "apply_velocity_bc",
]


def sl(f, axis: int, start, stop=None, step=None):
    """Slice `f` along `axis`."""
    idx = [slice(None)] * f.ndim
    idx[axis] = slice(start, stop, step)
    return f[tuple(idx)]


def _cat(parts, axis):
    return jnp.concatenate(parts, axis=axis)


def _flip(f, axis):
    # Mosaic has no `rev` primitive, so keep the operator library
    # lowerable inside Pallas TPU kernels: size-1 flips are identities,
    # and the ghost-pad flips are at most ng<=2 wide — build those from
    # unit slices + concat (lowerable) instead of jnp.flip (round 4:
    # the ng=2 upwind2 mirror pad crashed Mosaic lowering via `rev`).
    n = f.shape[axis]
    if n <= 1:
        return f
    if n <= 4:
        idx = [slice(None)] * f.ndim
        parts = []
        for i in reversed(range(n)):
            idx[axis] = slice(i, i + 1)
            parts.append(f[tuple(idx)])
        return jnp.concatenate(parts, axis=axis)
    return jnp.flip(f, axis=axis)


def pad_center(f, axis: int, bc: BCType, value: float = 0.0,
               kind: str = "neumann", ng: int = 1):
    """Pad a cell-centered field with `ng` ghosts on each side.

    `kind` selects the wall rule: 'neumann' (mirror) or 'dirichlet' (value at
    the wall face, e.g. k=0). Periodic/outflow follow the BC type directly.
    """
    if bc == BCType.PERIODIC:
        return _cat([sl(f, axis, -ng, None), f, sl(f, axis, 0, ng)], axis)
    lo = _flip(sl(f, axis, 0, ng), axis)       # mirror: [f_{ng-1} .. f_0]
    hi = _flip(sl(f, axis, -ng, None), axis)
    if bc == BCType.OUTFLOW or (bc in (BCType.WALL, BCType.INFLOW) and kind == "neumann"):
        return _cat([lo, f, hi], axis)
    if bc == BCType.INFLOW:
        # an INFLOW axis is an asymmetric inlet/outlet pair (config.py);
        # a single Dirichlet value cannot express it — clamping BOTH ends
        # to `value` would impose the inlet value at the outlet
        raise NotImplementedError(
            "pad_center(kind='dirichlet') on an INFLOW axis: the "
            "inlet/outlet pair needs per-end values; use kind='neumann' "
            "plus an explicit inlet-face overwrite")
    # Dirichlet value at the wall face
    return _cat([2.0 * value - lo, f, 2.0 * value - hi], axis)


def pad_pressure(f, axis: int, ax):
    """1-ghost pad of the pressure with the axis's per-end BC kinds.

    The boundary-face gradient is divided by dc0 (face-to-center spacing),
    so the ghost conceptually sits AT the face: neumann => copy (zero
    gradient); dirichlet => 0 (the face value), giving flux p0/dc0 exactly
    as the Poisson backends' folded metrics (mesh.laplacian_metrics) — the
    projection stays discretely consistent (L = D.G).
    """
    if ax.bc == BCType.PERIODIC:
        return _cat([sl(f, axis, -1, None), f, sl(f, axis, 0, 1)], axis)
    lo = sl(f, axis, 0, 1)
    hi = sl(f, axis, -1, None)
    g_lo = jnp.zeros_like(lo) if ax.p_lo == "dirichlet" else lo
    g_hi = jnp.zeros_like(hi) if ax.p_hi == "dirichlet" else hi
    return _cat([g_lo, f, g_hi], axis)


def pad_tangential(f, axis: int, bc: BCType, ng: int = 1,
                   wall=(0.0, 0.0)):
    """Pad a velocity component along an axis it is cell-centered on.

    `wall`: (lo, hi) tangential wall velocity (AxisGeom.tang[comp]) —
    ghosts are the odd extension about the wall value, 2*value - interior,
    so a nonzero value gives a moving wall (lid) and 0.0 classic no-slip.
    """
    if bc == BCType.PERIODIC:
        return _cat([sl(f, axis, -ng, None), f, sl(f, axis, 0, ng)], axis)
    lo = _flip(sl(f, axis, 0, ng), axis)
    hi = _flip(sl(f, axis, -ng, None), axis)
    if bc == BCType.WALL:
        if wall == (0.0, 0.0):                      # no-slip: value 0 at wall
            return _cat([-lo, f, -hi], axis)
        return _cat([2.0 * wall[0] - lo, f, 2.0 * wall[1] - hi], axis)
    # OUTFLOW / INFLOW default: zero-gradient (inlet profile applied by caller)
    return _cat([lo, f, hi], axis)


def pad_normal(f, axis: int, bc: BCType, ng: int = 1):
    """Pad a velocity component along its own (staggered) axis.

    Periodic: stored faces are 0..N-1, wrap. Wall: faces 0..N stored with the
    boundary faces in-array; ghosts are odd reflections about the boundary
    face (2*f_bnd - f_interior) so interpolation/derivatives across the wall
    see the Dirichlet face value.
    """
    if bc == BCType.PERIODIC:
        return _cat([sl(f, axis, -ng, None), f, sl(f, axis, 0, ng)], axis)
    b_lo = sl(f, axis, 0, 1)
    b_hi = sl(f, axis, -1, None)
    if bc == BCType.OUTFLOW:
        lo = jnp.concatenate([b_lo] * ng, axis=axis)
        hi = jnp.concatenate([b_hi] * ng, axis=axis)
        return _cat([lo, f, hi], axis)
    lo = 2.0 * b_lo - _flip(sl(f, axis, 1, 1 + ng), axis)
    hi = 2.0 * b_hi - _flip(sl(f, axis, -1 - ng, -1), axis)
    return _cat([lo, f, hi], axis)


def face_pair(f, axis: int, bc: BCType) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(lo, hi) faces of every cell from a normal-velocity array.

    lo[i] = face i, hi[i] = face i+1 of cell i; N values each.
    """
    if bc == BCType.PERIODIC:
        return f, jnp.roll(f, -1, axis=axis)
    return sl(f, axis, 0, -1), sl(f, axis, 1, None)


def apply_velocity_bc(u, v, w, geom: Geometry, convective_outlet=False):
    """Re-impose Dirichlet boundary-face values on wall/inflow axes.

    Only normal components store boundary faces; tangential wall conditions
    are enforced through ghosts at operator time. Mirrors the reference's
    apply_velocity_bc (src/solver_operators.cpp:43) minus ghost writes.

    `convective_outlet`: the solver imposes the time-discrete convective
    condition du/dt + U_c du/dx = 0 on the INFLOW pair's outlet face
    itself (Simulation._convective_outlet, which needs dt and the old
    state); skip the zero-gradient overwrite here so that value survives.
    """
    comps = [u, v, w]
    for axis in range(3):
        bc = geom.axes[axis].bc
        if bc == BCType.INFLOW and convective_outlet:
            continue
        if bc == BCType.WALL:
            f = comps[axis]
            idx_lo = [slice(None)] * 3
            idx_lo[axis] = 0
            idx_hi = [slice(None)] * 3
            idx_hi[axis] = -1
            f = f.at[tuple(idx_lo)].set(0.0).at[tuple(idx_hi)].set(0.0)
            comps[axis] = f
        elif bc in (BCType.INFLOW, BCType.OUTFLOW):
            # convective/zero-gradient outlet on the normal component's
            # high face (reference apply_velocity_bc outflow,
            # src/solver_operators.cpp:43); the inflow low face is imposed
            # by the recycling machinery / IC and left untouched here.
            f = comps[axis]
            idx_hi = [slice(None)] * 3
            idx_hi[axis] = -1
            idx_prev = [slice(None)] * 3
            idx_prev[axis] = -2
            f = f.at[tuple(idx_hi)].set(f[tuple(idx_prev)])
            if bc == BCType.OUTFLOW:
                idx_lo = [slice(None)] * 3
                idx_lo[axis] = 0
                idx_next = [slice(None)] * 3
                idx_next[axis] = 1
                f = f.at[tuple(idx_lo)].set(f[tuple(idx_next)])
            comps[axis] = f
    return tuple(comps)
