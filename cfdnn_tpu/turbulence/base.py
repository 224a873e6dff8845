"""Shared turbulence-model infrastructure.

TPU-native rebuild of the reference TurbulenceModel base machinery (reference:
include/turbulence_model.hpp:81-174, include/turbulence_device_view.hpp:12-31):
instead of an abstract class with GPU buffer management, each closure is a small
object with two pure methods traced into the jitted step:

    advance(state, sim, dt) -> state    # transport PDEs (k, omega), if any
    nu_t(state, sim)        -> array    # eddy viscosity at cell centers

plus optional `reynolds_stresses(state, sim)` for models that provide tau_ij
(EARSM/TBNN; in the reference tau_ij is computed for diagnostics only — the
momentum equation always uses nu_eff = nu + nu_t, src/solver.cpp:1309,1332).

All tensor algebra here operates on the 9-component cell-centered velocity
gradient from ops.operators.velocity_gradient and is plain `jnp` — XLA fuses
each model into a handful of HBM-bandwidth-bound passes (the reference needs a
dedicated fused CUDA/OMP kernel per model, e.g. turbulence_les.hpp:24-118).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..config import BCType, Config
from ..mesh import Mesh
from ..ops import operators as ops
from ..utils.numerics import safe_sqrt


Array = jnp.ndarray


class TurbulenceModelBase:
    """Protocol/base for all closures (reference turbulence_model.hpp:81-174)."""

    name = "base"
    uses_transport = False
    provides_reynolds_stresses = False

    def initialize(self, state, sim):
        """Optional state initialization (k/omega estimates)."""
        return state

    def advance(self, state, sim, dt):
        return state

    def nu_t(self, state, sim) -> Optional[Array]:
        raise NotImplementedError

    def advance_and_nu_t(self, state, sim, dt):
        """(advanced state, nu_t) — the per-step turbulence sequence
        (reference solver.cpp:1251-1324 advance_turbulence + update).
        Models may override to fuse the two (SSTTransport emits nu_t
        from the same Pallas pass as the transport advance)."""
        state = self.advance(state, sim, dt)
        return state, self.nu_t(state, sim)

    def reynolds_stresses(self, state, sim):
        return None


# ---------------------------------------------------------------------------
# Strain / rotation tensor algebra (reference: include/velocity_gradient.hpp,
# src/turbulence_les.cpp per-cell kernels)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class StrainRotation:
    """Cell-centered S_ij / Omega_ij components and magnitudes."""

    S: Tuple[Tuple[Array, ...], ...]       # symmetric 3x3 (upper storage used)
    O12: Array                             # Omega_xy
    O13: Array
    O23: Array
    S_mag: Array                           # sqrt(2 S_ij S_ij)
    O_mag: Array                           # sqrt(2 O_ij O_ij)
    G: Tuple[Tuple[Array, ...], ...]       # raw gradient d u_i / d x_j


def strain_rotation(comps, geom) -> StrainRotation:
    G = ops.velocity_gradient(comps, geom)
    S11, S22, S33 = G[0][0], G[1][1], G[2][2]
    S12 = 0.5 * (G[0][1] + G[1][0])
    S13 = 0.5 * (G[0][2] + G[2][0])
    S23 = 0.5 * (G[1][2] + G[2][1])
    O12 = 0.5 * (G[0][1] - G[1][0])
    O13 = 0.5 * (G[0][2] - G[2][0])
    O23 = 0.5 * (G[1][2] - G[2][1])
    SS = (S11 * S11 + S22 * S22 + S33 * S33
          + 2.0 * (S12 * S12 + S13 * S13 + S23 * S23))
    OO = 2.0 * (O12 * O12 + O13 * O13 + O23 * O23)
    S = ((S11, S12, S13), (S12, S22, S23), (S13, S23, S33))
    return StrainRotation(
        S=S, O12=O12, O13=O13, O23=O23,
        S_mag=safe_sqrt(2.0 * SS), O_mag=safe_sqrt(2.0 * OO), G=G,
    )


def cell_center_velocity(comps, geom):
    """(u,v,w) interpolated to cell centers (reference u_center helpers,
    include/fields.hpp:12-222)."""
    from ..ops.operators import f2c_mean

    def center(i):
        ax = geom.axes[i]
        if ax.n > 1:
            return f2c_mean(comps[i], i, ax)
        c = comps[i]
        if c.shape[i] == 2:
            # unit axis with stored boundary faces (e.g. Nz=1, bc_z=WALL):
            # the single cell's center value is the face mean
            c = 0.5 * (jnp.take(c, 0, i) + jnp.take(c, 1, i))
            c = jnp.expand_dims(c, i)
        return jnp.broadcast_to(c, tuple(geom.axes[a].n for a in range(3)))

    return tuple(center(i) for i in range(3))


# ---------------------------------------------------------------------------
# Wall geometry helpers
# ---------------------------------------------------------------------------


def wall_distance(mesh: Mesh, cfg: Config, dtype) -> Array:
    """Distance to the nearest wall, broadcastable (1,Ny,1)/(1,1,Nz) product.

    The reference precomputes wall distance only for y walls
    (include/mesh.hpp wall-distance); we additionally handle z walls (ducts)
    by taking the min. When no wall axis exists, returns the channel
    half-height delta everywhere (algebraic models then see no damping).
    """
    dists = []
    if cfg.bc_y == BCType.WALL:
        dists.append(mesh.wall_distance_y().reshape(1, -1, 1))
    if cfg.bc_z == BCType.WALL and mesh.Nz > 1:
        zc = mesh.z.centers
        dz = np.minimum(zc - mesh.z.lo, mesh.z.hi - zc)
        dists.append(dz.reshape(1, 1, -1))
    if not dists:
        delta = 0.5 * cfg.Ly
        return jnp.full((1, 1, 1), delta, dtype)
    d = dists[0]
    for extra in dists[1:]:
        d = np.minimum(d, extra)
    return jnp.asarray(np.maximum(d, 1e-10), dtype)


def u_tau_wall(comps, geom, nu: float) -> Array:
    """Friction velocity estimate from the mean wall velocity gradient.

    Mirrors the reference's initialize-time estimate (src/turbulence_
    transport.cpp:526-545: u_tau = sqrt(nu <|du/dy|>_wall)); computed from
    the first interior u value and the wall distance of the first cell.
    """
    u = comps[0]
    y = geom.axes[1]
    # distance from wall face to first center
    d_lo = y.centers.reshape(-1)[0] - y.faces.reshape(-1)[0]
    d_hi = y.faces.reshape(-1)[-1] - y.centers.reshape(-1)[-1]
    # shear relative to the wall's OWN tangential velocity
    # (AxisGeom.tang — moving lid / Couette belt): |u|/d at a lid wall
    # would report an O(U_lid/d_hi) phantom shear and poison y+, van
    # Driest damping, and the k/omega estimate (same fix as
    # diagnostics.channel_statistics)
    wall_lo, wall_hi = y.tang[0]
    dudy_lo = jnp.mean(jnp.abs(u[:, 0, :] - wall_lo)) / d_lo
    dudy_hi = jnp.mean(jnp.abs(wall_hi - u[:, -1, :])) / d_hi
    dudy = 0.5 * (dudy_lo + dudy_hi)
    return jnp.maximum(jnp.sqrt(nu * dudy), 1e-6)


def k_omega_channel_estimate(comps, geom, y_wall: Array, nu: float,
                             C_mu: float = 0.09):
    """Algebraic (k, omega) initial estimate for wall-bounded flows.

    k follows the reference TBNN estimate (src/turbulence_nn_tbnn.cpp:275-309:
    k = u_tau^2/sqrt(C_mu) * f_mu^2 with van-Driest-like f_mu); omega uses the
    standard log-layer relation omega = sqrt(k)/(C_mu^0.25 kappa y).
    """
    kappa = 0.41
    u_tau = u_tau_wall(comps, geom, nu)
    y_plus = y_wall * u_tau / (nu + 1e-20)
    f_mu = 1.0 - jnp.exp(-jnp.minimum(y_plus / 26.0, 20.0))
    k = (u_tau**2 / np.sqrt(C_mu)) * f_mu**2
    k = jnp.clip(k, 1e-10, 10.0 * u_tau**2)
    omega = jnp.sqrt(k) / (C_mu**0.25 * kappa * jnp.maximum(y_wall, 1e-10))
    shape = tuple(geom.axes[a].n for a in range(3))
    return (jnp.broadcast_to(k, shape).astype(comps[0].dtype),
            jnp.broadcast_to(omega, shape).astype(comps[0].dtype))


# ---------------------------------------------------------------------------
# LES filter width
# ---------------------------------------------------------------------------


def filter_width(geom) -> Array:
    """Local filter width Delta from the cell volume, (1,Ny,1)-broadcast.

    3D: (dx dy_j dz)^(1/3); 2D: (dx dy_j)^(1/2) — the reference's
    stretched-aware filter width (turbulence_les.hpp filter_width,
    src/turbulence_les_dynamic_apply.cpp tfw/tfw2d).
    """
    x, y, z = geom.axes
    dy = y.d  # (1,Ny,1)
    if z.n > 1:
        # per-cell dz when z is stretched (ducts): the scalar z.h is the
        # FINEST wall spacing and would underestimate Delta in the core
        dz = z.h if z.uniform else z.d
        return (x.h * dy * dz) ** (1.0 / 3.0)
    return jnp.sqrt(x.h * dy)
