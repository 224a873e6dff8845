"""Two-equation k-omega transport models: SST (Menter 1994) and standard
Wilcox k-omega.

TPU-native rebuild of the reference SSTKOmegaTransport / KOmegaTransport
(reference: include/turbulence_transport.hpp:32-281, src/turbulence_
transport.cpp sst_cell_kernel :66-195 and advance_turbulence :605/:1012):
one fused jnp pass computes gradients, F1 blending, limited production,
upwind advection, central diffusion, the cross-diffusion term, and the
point-implicit destruction update for the whole grid. Wall BCs (k = 0,
omega_wall = 60 nu / (beta1 y1^2) x10) enter through ghost values, exactly
the reference's ghost extrapolation (apply_wall_bc_k/_omega :547-604).

The reference kernel is 2-D (x-y); this build extends advection/diffusion/
strain to all non-trivial axes, which reduces to the reference's scheme on
2-D meshes.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..config import BCType
from ..utils.numerics import safe_tanh
from ..ops.bc import sl
from ..ops.operators import _inv_dpos_c, ax_of
from .base import (TurbulenceModelBase, cell_center_velocity,
                   k_omega_channel_estimate, strain_rotation, wall_distance)


@dataclasses.dataclass(frozen=True)
class SSTConstants:
    """Menter SST constants (reference turbulence_transport.hpp:32-66)."""

    sigma_k1: float = 0.85
    sigma_omega1: float = 0.5
    beta1: float = 0.075
    alpha1: float = 5.0 / 9.0
    sigma_k2: float = 1.0
    sigma_omega2: float = 0.856
    beta2: float = 0.0828
    alpha2: float = 0.44
    beta_star: float = 0.09
    a1: float = 0.31
    kappa: float = 0.41
    CD_omega_min: float = 1e-10
    k_min: float = 1e-10
    omega_min: float = 1e-10
    k_max: float = 100.0
    omega_max: float = 1e8


@dataclasses.dataclass(frozen=True)
class KOmegaConstants:
    """Wilcox 1988 constants (reference turbulence_transport.hpp:68-80)."""

    sigma_k: float = 0.5
    sigma_omega: float = 0.5
    beta: float = 0.075
    beta_star: float = 0.09
    alpha: float = 5.0 / 9.0
    k_min: float = 1e-10
    omega_min: float = 1e-10
    k_max: float = 100.0
    omega_max: float = 1e8


# ---------------------------------------------------------------------------
# Scalar-transport operator helpers (ghost-aware, stretched-capable)
# ---------------------------------------------------------------------------


def _neighbors(f, axis, ax, wall_value):
    """Neighbor values (f_{i-1}, f_{i+1}) with ghost-aware boundary
    fixups, SAME extent as f. Periodic wrap; wall => Dirichlet
    `wall_value` at the wall face (ghost = 2 v - interior); else mirror.

    Deliberately roll-based rather than a ghost-pad concatenate: an
    extent change (N -> N+2) on a GSPMD-sharded axis forces full-shard
    reshard collective-permutes per stencil application (measured 4.3
    MB/device/step of ICI for the SST transport alone at 64^3/8 shards),
    while jnp.roll lowers to one-plane neighbor permutes."""
    if ax.bc == BCType.PERIODIC:
        return jnp.roll(f, 1, axis), jnp.roll(f, -1, axis)
    in_lo, in_hi = sl(f, axis, 0, 1), sl(f, axis, -1, None)
    if ax.bc == BCType.WALL and wall_value is not None:
        g_lo = 2.0 * wall_value - in_lo
        g_hi = 2.0 * wall_value - in_hi
    else:  # inflow/outflow or natural: zero-gradient
        g_lo, g_hi = in_lo, in_hi
    # concat-built shifts (not roll + .at[].set: the slice-set lowers to
    # `scatter`, which Mosaic lacks — this code runs inside the fused
    # Pallas transport kernel)
    g_lo = jnp.broadcast_to(g_lo, in_lo.shape)
    g_hi = jnp.broadcast_to(g_hi, in_hi.shape)
    f_m = jnp.concatenate([g_lo, sl(f, axis, 0, -1)], axis)
    f_p = jnp.concatenate([sl(f, axis, 1, None), g_hi], axis)
    return f_m, f_p


def _axis_terms(f_m, f_p, f, axis, ax, vel_c):
    """(upwind advection, central gradient) along axis.

    Same arithmetic as the reference's ghost-padded form (values f_{i-1},
    f_i, f_{i+1} with ghost-aware spacings from pos_c_pad), expressed on
    same-extent neighbor arrays from _neighbors. Diffusion is handled by
    the conservative _diffusion below."""
    pos = ax.pos_c_pad
    a = ax_of(pos)
    den_c = sl(pos, a, 2, None) - sl(pos, a, 0, -2)
    grad_c = (f_p - f_m) / den_c
    # upwind first-order
    den_b = sl(pos, a, 1, -1) - sl(pos, a, 0, -2)
    den_f = sl(pos, a, 2, None) - sl(pos, a, 1, -1)
    back = (f - f_m) / den_b
    fwd = (f_p - f) / den_f
    adv = vel_c * jnp.where(vel_c >= 0.0, back, fwd)
    return adv, grad_c


def _transport_terms(f, geom, vel_cc, wall_value):
    """Sum upwind advection / central gradients over all axes."""
    adv = jnp.zeros_like(f)
    grads = []
    for axis in range(3):
        ax = geom.axes[axis]
        if ax.n <= 1:
            grads.append(jnp.zeros_like(f))
            continue
        wv = wall_value if ax.bc == BCType.WALL else None
        f_m, f_p = _neighbors(f, axis, ax, wv)
        a, g = _axis_terms(f_m, f_p, f, axis, ax, vel_cc[axis])
        adv = adv + a
        grads.append(g)
    return adv, grads


def _diffusion(f, geom, nu_eff, wall_value, skip_y=False):
    """Conservative variable-coefficient diffusion div(nu_eff grad f).

    The nu_eff * lap(f) form drops the grad(nu_eff).grad(f) term, which
    near a wall (nu_t rising steeply from 0) is the same order as the
    retained one — and it disagreed with the IMEX y-solve, which already
    uses face-averaged nu inside the divergence (forcing.py). Face nu is
    the arithmetic neighbor mean, matching implicit_scalar_y_diffusion."""
    out = jnp.zeros_like(f)
    for axis in range(3):
        ax = geom.axes[axis]
        if ax.n <= 1 or (skip_y and axis == 1):
            continue
        wv = wall_value if ax.bc == BCType.WALL else None
        f_m, f_p = _neighbors(f, axis, ax, wv)
        n_m, n_p = _neighbors(nu_eff, axis, ax, None)   # mirror ghosts
        inv_dpos = _inv_dpos_c(ax)
        af = ax_of(inv_dpos)
        g_lo = (f - f_m) * sl(inv_dpos, af, 0, -1) * 0.5 * (n_m + nu_eff)
        g_hi = (f_p - f) * sl(inv_dpos, af, 1, None) * 0.5 * (nu_eff + n_p)
        out = out + (g_hi - g_lo) * ax.inv_d
    return out


def sst_advance_math(comps, k, om, nu_t, geom, nu, c, y_wall, om_wall,
                     dt, skip_y=False, return_sr=False):
    """Pure SST k/omega point-implicit update (everything in advance()
    before the optional IMEX y-solves and the clip/pin epilogue).

    Single source of truth between the jnp operator path and the fused
    Pallas slab kernel (ops/pallas_kernels.fused_sst_advance) — the
    reference's CPU/GPU code-sharing paradigm (sst_cell_kernel,
    src/turbulence_transport.cpp:66-195, compiled for both targets)."""
    k = jnp.maximum(k, c.k_min)
    om = jnp.maximum(om, c.omega_min)
    nu_t = jnp.maximum(nu_t, 0.0)
    y = jnp.maximum(y_wall, 1e-10)

    vel_cc = cell_center_velocity(comps, geom)
    sr = strain_rotation(comps, geom)
    S2 = sr.S_mag**2

    adv_k, gk = _transport_terms(k, geom, vel_cc, 0.0)
    adv_om, gom = _transport_terms(om, geom, vel_cc, om_wall)

    # cross-diffusion and F1 (reference :111-123)
    gkgo = sum(a * b for a, b in zip(gk, gom))
    CD_omega = jnp.maximum(2.0 * c.sigma_omega2 / om * gkgo, c.CD_omega_min)
    sqrt_k = jnp.sqrt(k)
    arg1 = jnp.maximum(sqrt_k / (c.beta_star * om * y),
                       500.0 * nu / (y * y * om))
    arg1 = jnp.minimum(arg1, 4.0 * c.sigma_omega2 * k / (CD_omega * y * y))
    F1 = safe_tanh(arg1**4)

    beta = F1 * c.beta1 + (1.0 - F1) * c.beta2
    alpha = F1 * c.alpha1 + (1.0 - F1) * c.alpha2
    sigma_k = F1 * c.sigma_k1 + (1.0 - F1) * c.sigma_k2
    sigma_om = F1 * c.sigma_omega1 + (1.0 - F1) * c.sigma_omega2

    nu_k = nu + sigma_k * nu_t
    nu_om = nu + sigma_om * nu_t

    # limited production, standard Menter form P_k = nu_t S^2 with
    # S^2 = 2 S_ij S_ij (= S_mag^2 here). DELIBERATE deviation from
    # the reference, which doubles it (P_k = 2 nu_t S2 with S2 already
    # = 2 SijSij, turbulence_transport.cpp:103,136) — a 2x
    # overproduction of k under pure shear.
    P_k = jnp.minimum(nu_t * S2, 10.0 * c.beta_star * k * om)
    CD = jnp.maximum(2.0 * (1.0 - F1) * c.sigma_omega2 / om * gkgo, 0.0)

    # point-implicit destruction (reference :168-186); conservative
    # div(nu grad .) diffusion (see _diffusion)
    diff_k = _diffusion(k, geom, nu_k, 0.0, skip_y=skip_y)
    diff_om = _diffusion(om, geom, nu_om, om_wall, skip_y=skip_y)
    src_k = P_k + diff_k - adv_k
    src_om = alpha * (om / k) * P_k + diff_om - adv_om + CD
    k_new = (k + dt * src_k) / (1.0 + dt * c.beta_star * om)
    om_new = (om + dt * src_om) / (1.0 + dt * beta * om)
    if return_sr:
        return k_new, om_new, nu_k, nu_om, sr
    return k_new, om_new, nu_k, nu_om


def sst_nut_math(k, om, S_mag, y_wall, nu, c):
    """SST strain-limited eddy viscosity (reference :244-305) — shared
    between SSTTransport.nu_t and the fused advance+nu_t kernel."""
    k = jnp.maximum(k, c.k_min)
    om = jnp.maximum(om, c.omega_min)
    y = jnp.maximum(y_wall, 1e-10)
    arg2 = jnp.maximum(2.0 * jnp.sqrt(k) / (c.beta_star * om * y),
                       500.0 * nu / (y * y * om))
    F2 = safe_tanh(arg2**2)
    nut = c.a1 * k / jnp.maximum(c.a1 * om, S_mag * F2)
    return jnp.clip(nut, 0.0, 1000.0 * nu)


def _sst_math_kernel_form(comps, k, om, nu_t, geom, consts, dt, *,
                          nu, c, om_wall, skip_y):
    """sst_advance_math in the fused-kernel calling convention
    (ops/pallas_kernels._transport_advance_kernel math_fn)."""
    out = sst_advance_math(comps, k, om, nu_t, geom, nu, c, consts[0],
                           om_wall, dt, skip_y=skip_y)
    return out[0], out[1]


def _sst_math_with_nut_kernel_form(comps, k, om, nu_t, geom, consts, dt,
                                   *, nu, c, om_wall, has_wall):
    """Fused advance + closure: emits nu_t as a third output, reusing
    the in-kernel strain tensor and replicating the clip/pin epilogue
    on the k/omega the closure sees (the outside epilogue is
    idempotent on the returned raw k_new/om_new)."""
    y_wall = consts[0]
    k_new, om_new, _, _, sr = sst_advance_math(
        comps, k, om, nu_t, geom, nu, c, y_wall, om_wall, dt,
        skip_y=False, return_sr=True)
    k_c = jnp.clip(k_new, c.k_min, c.k_max)
    om_c = jnp.clip(om_new, c.omega_min, c.omega_max)
    if has_wall:
        pin_f, om_visc = consts[1], consts[2]
        om_c = jnp.where(pin_f > 0.5,
                         jnp.broadcast_to(om_visc, om_c.shape), om_c)
    nut = sst_nut_math(k_c, om_c, sr.S_mag, y_wall, nu, c)
    return k_new, om_new, nut


def komega_advance_math(comps, k, om, nu_t, geom, nu, c, y_wall, om_wall,
                        dt, skip_y=False):
    """Pure Wilcox k-omega point-implicit update (pre-IMEX, pre-clip) —
    single source of truth between the jnp path and the fused Pallas
    slab kernel, mirroring sst_advance_math. `y_wall` is accepted for
    calling-convention symmetry (Wilcox needs no wall-distance
    blending)."""
    del y_wall
    k = jnp.maximum(k, c.k_min)
    om = jnp.maximum(om, c.omega_min)
    nu_t = jnp.maximum(nu_t, 0.0)

    vel_cc = cell_center_velocity(comps, geom)
    sr = strain_rotation(comps, geom)
    S2 = sr.S_mag**2

    adv_k, _ = _transport_terms(k, geom, vel_cc, 0.0)
    adv_om, _ = _transport_terms(om, geom, vel_cc, om_wall)

    nu_k = nu + c.sigma_k * nu_t
    nu_om = nu + c.sigma_omega * nu_t
    # standard Wilcox production (see the SST note: the reference
    # doubles it, turbulence_transport.cpp:1082,1085)
    P_k = jnp.minimum(nu_t * S2, 10.0 * c.beta_star * k * om)

    diff_k = _diffusion(k, geom, nu_k, 0.0, skip_y=skip_y)
    diff_om = _diffusion(om, geom, nu_om, om_wall, skip_y=skip_y)
    src_k = P_k + diff_k - adv_k
    src_om = c.alpha * (om / k) * P_k + diff_om - adv_om
    k_new = (k + dt * src_k) / (1.0 + dt * c.beta_star * om)
    om_new = (om + dt * src_om) / (1.0 + dt * c.beta * om)
    return k_new, om_new, nu_k, nu_om


def _komega_math_kernel_form(comps, k, om, nu_t, geom, consts, dt, *,
                             nu, c, om_wall, skip_y):
    out = komega_advance_math(comps, k, om, nu_t, geom, nu, c, consts[0],
                              om_wall, dt, skip_y=skip_y)
    return out[0], out[1]


class SSTTransport(TurbulenceModelBase):
    """SST k-omega transport + SST strain-limited closure."""

    name = "SSTKOmega"
    uses_transport = True

    def __init__(self, cfg, mesh, geom, constants: SSTConstants = SSTConstants()):
        self.c = constants
        self.nu = cfg.nu
        self.y_wall = wall_distance(mesh, cfg, geom.dtype)
        # Wall handling: om_wall Dirichlet ghosts apply on EVERY walled
        # axis (y and/or z — _neighbors keys on ax.bc, and y_wall is the
        # min distance over all walls); the IMEX Thomas solve is
        # y-specific, so it keys on the y wall alone.
        self.has_y_wall = cfg.bc_y == BCType.WALL
        self.has_wall = self.has_y_wall or (cfg.bc_z == BCType.WALL
                                            and mesh.Nz > 1)
        # Menter near-wall treatment: inside the viscous sublayer, omega is
        # pinned to the analytic solution 6 nu / (beta1 y^2). A sequential
        # split of the stiff destruction (point-implicit) and the stiff
        # wall-diffusion (IMEX Thomas) otherwise lands on an unphysical
        # fixed point on strongly stretched grids.
        if self.has_wall:
            first = np.zeros((1, mesh.Ny, 1))
            if self.has_y_wall:
                first[:, 0, :] = first[:, -1, :] = 1.0
            if cfg.bc_z == BCType.WALL and mesh.Nz > 1:
                # only a z-wall makes the mask z-dependent; without one
                # it stays (1, Ny, 1) so the sharded fused transport can
                # carry it replicated (z-invariant) across the mesh
                firstz = np.zeros((1, 1, mesh.Nz))
                firstz[:, :, 0] = firstz[:, :, -1] = 1.0
                first = first + firstz
            pin = first > 0
            if cfg.dp_dx != 0:
                # y+ < 3 sublayer mask only when u_tau is known a priori
                # from the imposed pressure gradient; a bulk-forced run
                # has no u_tau estimate, so pin wall-adjacent cells only
                u_tau_est = float(np.sqrt(abs(cfg.dp_dx) * 0.5 * cfg.Ly
                                          / cfg.rho))
                y_plus = np.asarray(self.y_wall) * u_tau_est / cfg.nu
                pin = np.logical_or(y_plus < 3.0, pin)
            self.om_pin_mask = jnp.asarray(pin)
            self.om_visc = 6.0 * cfg.nu / (constants.beta1
                                           * jnp.maximum(self.y_wall, 1e-12) ** 2)

    def initialize(self, state, sim):
        k, om = k_omega_channel_estimate(
            (state.u, state.v, state.w), sim.geom, self.y_wall, self.nu,
            C_mu=self.c.beta_star)
        return state.replace(k=k, omega=om)

    # -- the fused advance kernel -----------------------------------------

    # compound x/z stencil reach of the fused advance: SST's diffusion
    # reads neighbor nu_eff whose F1 blending itself reaches one cell
    # through the k/omega gradients (see fused_transport_advance)
    fuse_ng = 2

    def _fuse_mode(self, sim):
        """'compiled' | 'interpret' | False — whether advance() runs as
        the fused Pallas slab kernel. Modes: single-device "slab", or
        the multi-chip "shard"/"shard2d" wrappers (round-5:
        parallel/fused.sharded_fused_transport — ppermute halo ring of
        width `fuse_ng`; previously the sharded transport re-paid the
        roll-based GSPMD jnp chain the fused kernel killed, see
        _neighbors' docstring for why that form exists). jax.grad
        regions keep the fused forward: _run_fused wraps the kernel in
        solver.vjp_via with the jnp transport math as the backward."""
        mode = sim._pallas_predictor_ok
        if mode not in ("slab", "shard", "shard2d"):
            return False
        if mode != "slab":
            from ..parallel.fused import sharded_transport_eligible
            if not sharded_transport_eligible(
                    sim.geom, sim.cfg.mesh_shape or (1,), self.fuse_ng):
                return False
        if not hasattr(self, "_fuse_platform"):
            import jax
            try:
                on_cpu = jax.devices()[0].platform == "cpu"
            except Exception:
                on_cpu = True
            self._fuse_platform = "cpu" if on_cpu else "acc"
        if self._fuse_platform == "cpu":
            return "interpret" if sim.cfg.use_pallas == "on" else False
        return "compiled"

    def _run_fused(self, sim, state, nu_t, dt, math_fn, consts, n_out,
                   ng, interpret):
        """Dispatch the fused advance kernel by sim's tiling mode:
        single-device slab, or the shard/shard2d wrappers (ppermute
        halos + the same kernel on the extended local block). Wrapped
        in vjp_via so jax.grad regions (ml/adjoint a-posteriori
        training) keep the fused forward: the backward is the VJP of
        the SAME math_fn applied on the full arrays with the real
        geometry — the jnp transport path, which the kernel is
        parity-tested against."""
        from ..solver import vjp_via
        mode = sim._pallas_predictor_ok

        def fast(u, v, w, k, om, nt, dtt):
            args = (u, v, w, k, om, nt, dtt)
            if mode == "shard":
                from ..parallel.fused import sharded_fused_transport
                return sharded_fused_transport(
                    *args, geom=sim.geom, mesh=sim.device_mesh,
                    axis_name=sim._mesh_axis, math_fn=math_fn,
                    consts=consts, n_out=n_out, ng=ng,
                    interpret=interpret)
            if mode == "shard2d":
                from ..parallel.fused import sharded_fused_transport_2d
                return sharded_fused_transport_2d(
                    *args, geom=sim.geom, mesh=sim.device_mesh,
                    x_axis=sim._mesh_axes[0], z_axis=sim._mesh_axes[1],
                    math_fn=math_fn, consts=consts, n_out=n_out, ng=ng,
                    interpret=interpret)
            from ..ops.pallas_kernels import fused_transport_advance
            return fused_transport_advance(
                *args, geom=sim.geom, math_fn=math_fn, consts=consts,
                n_out=n_out, ng=ng, interpret=interpret)

        consts_b = tuple(
            jnp.asarray(jnp.broadcast_to(a, (1,) + state.k.shape[1:]),
                        state.k.dtype) for a in consts)

        def slow(u, v, w, k, om, nt, dtt):
            return tuple(math_fn((u, v, w), k, om, nt, sim.geom,
                                 consts_b, dtt))

        return vjp_via(fast, slow)(state.u, state.v, state.w, state.k,
                                   state.omega, nu_t, dt)

    def advance(self, state, sim, dt):
        c, geom = self.c, sim.geom
        comps = (state.u, state.v, state.w)
        nu_t = state.nu_t if state.nu_t is not None \
            else jnp.zeros_like(state.k)

        # omega wall Dirichlet value from the first-cell distance
        # (matches reference per-wall y1) — trace-time constant
        om_wall = None
        if self.has_wall:
            y1 = float(np.min(np.asarray(self.y_wall)))
            om_wall = min(10.0 * 6.0 * self.nu / (c.beta1 * y1 * y1),
                          c.omega_max)

        imex = bool(getattr(sim.cfg, "implicit_y_diffusion", False)) \
            and self.has_y_wall
        # the pallas gate excludes implicit_y_diffusion entirely, so a
        # fused advance never coexists with the IMEX solves — but guard
        # anyway (the IMEX path needs nu_k/nu_om from the math)
        fuse = (not imex) and self._fuse_mode(sim)
        if fuse:
            import functools

            math_fn = functools.partial(
                _sst_math_kernel_form, nu=self.nu, c=c, om_wall=om_wall,
                skip_y=False)
            k_new, om_new = self._run_fused(
                sim, state, nu_t, dt, math_fn, [self.y_wall], 2,
                self.fuse_ng, fuse == "interpret")
            nu_k = nu_om = None
        else:
            k_new, om_new, nu_k, nu_om = sst_advance_math(
                comps, state.k, state.omega, nu_t, geom, self.nu, c,
                self.y_wall, om_wall, dt, skip_y=imex)
        if imex:
            from ..forcing import implicit_scalar_y_diffusion
            k_new = implicit_scalar_y_diffusion(k_new, nu_k, dt, geom, 0.0)
            om_new = implicit_scalar_y_diffusion(om_new, nu_om, dt, geom,
                                                 om_wall)

        k_new = jnp.clip(k_new, c.k_min, c.k_max)
        om_new = jnp.clip(om_new, c.omega_min, c.omega_max)
        if self.has_wall:
            om_new = jnp.where(self.om_pin_mask,
                               jnp.broadcast_to(self.om_visc, om_new.shape),
                               om_new)
        return state.replace(k=k_new, omega=om_new)

    # -- closure: nu_t = a1 k / max(a1 om, S F2) (reference :244-305) -----

    def nu_t(self, state, sim):
        sr = strain_rotation((state.u, state.v, state.w), sim.geom)
        return sst_nut_math(state.k, state.omega, sr.S_mag, self.y_wall,
                            self.nu, self.c)

    def advance_and_nu_t(self, state, sim, dt):
        """Fused advance + closure: the Pallas transport kernel emits
        nu_t as a third output, reusing the in-kernel strain tensor —
        the separate nu_t() pass recomputed all nine velocity gradients
        every step. Only when this model's nu_t IS the SST closure (the
        EARSM subclasses override nu_t with anisotropy-based closures,
        which must keep the two-pass form)."""
        c = self.c
        imex = bool(getattr(sim.cfg, "implicit_y_diffusion", False)) \
            and self.has_y_wall
        fuse = (not imex) and self._fuse_mode(sim) \
            and type(self).nu_t is SSTTransport.nu_t
        if not fuse:
            state = self.advance(state, sim, dt)
            return state, self.nu_t(state, sim)

        import functools

        nu_t_in = state.nu_t if state.nu_t is not None \
            else jnp.zeros_like(state.k)
        om_wall = None
        if self.has_wall:
            y1 = float(np.min(np.asarray(self.y_wall)))
            om_wall = min(10.0 * 6.0 * self.nu / (c.beta1 * y1 * y1),
                          c.omega_max)
        consts = [self.y_wall]
        if self.has_wall:
            consts += [self.om_pin_mask.astype(state.k.dtype),
                       self.om_visc]
        math_fn = functools.partial(
            _sst_math_with_nut_kernel_form, nu=self.nu, c=c,
            om_wall=om_wall, has_wall=self.has_wall)
        k_new, om_new, nut = self._run_fused(
            sim, state, nu_t_in, dt, math_fn, consts, 3, self.fuse_ng,
            self._fuse_mode(sim) == "interpret")
        k_new = jnp.clip(k_new, c.k_min, c.k_max)
        om_new = jnp.clip(om_new, c.omega_min, c.omega_max)
        if self.has_wall:
            om_new = jnp.where(self.om_pin_mask,
                               jnp.broadcast_to(self.om_visc,
                                                om_new.shape),
                               om_new)
        return state.replace(k=k_new, omega=om_new), nut


class KOmegaTransport(TurbulenceModelBase):
    """Wilcox 1988 k-omega (reference turbulence_transport.cpp :1012-1122)."""

    name = "KOmega"
    uses_transport = True

    def __init__(self, cfg, mesh, geom, constants: KOmegaConstants = KOmegaConstants()):
        self.c = constants
        self.nu = cfg.nu
        self.y_wall = wall_distance(mesh, cfg, geom.dtype)
        self.has_y_wall = cfg.bc_y == BCType.WALL
        self.has_wall = self.has_y_wall or (cfg.bc_z == BCType.WALL
                                            and mesh.Nz > 1)

    def initialize(self, state, sim):
        k, om = k_omega_channel_estimate(
            (state.u, state.v, state.w), sim.geom, self.y_wall, self.nu,
            C_mu=self.c.beta_star)
        return state.replace(k=k, omega=om)

    # ng=1: Wilcox diffusivities depend only on the INPUT nu_t (no F1
    # chain), so the compound stencil reach stays 1
    fuse_ng = 1
    _fuse_mode = SSTTransport._fuse_mode
    _run_fused = SSTTransport._run_fused

    def advance(self, state, sim, dt):
        c, geom = self.c, sim.geom
        comps = (state.u, state.v, state.w)
        nu_t = state.nu_t if state.nu_t is not None \
            else jnp.zeros_like(state.k)

        om_wall = None
        if self.has_wall:
            y1 = float(np.min(np.asarray(self.y_wall)))
            # Wilcox wall value shares the SST form with beta ~ beta1
            om_wall = min(10.0 * 6.0 * self.nu / (c.beta * y1 * y1),
                          c.omega_max)

        imex = bool(getattr(sim.cfg, "implicit_y_diffusion", False)) \
            and self.has_y_wall
        fuse = (not imex) and self._fuse_mode(sim)
        if fuse:
            import functools

            math_fn = functools.partial(
                _komega_math_kernel_form, nu=self.nu, c=c,
                om_wall=om_wall, skip_y=False)
            k_new, om_new = self._run_fused(
                sim, state, nu_t, dt, math_fn, [self.y_wall], 2,
                self.fuse_ng, fuse == "interpret")
            nu_k = nu_om = None
        else:
            k_new, om_new, nu_k, nu_om = komega_advance_math(
                comps, state.k, state.omega, nu_t, geom, self.nu, c,
                self.y_wall, om_wall, dt, skip_y=imex)
        if imex:
            from ..forcing import implicit_scalar_y_diffusion
            k_new = implicit_scalar_y_diffusion(k_new, nu_k, dt, geom, 0.0)
            om_new = implicit_scalar_y_diffusion(om_new, nu_om, dt, geom,
                                                 om_wall)
        return state.replace(
            k=jnp.clip(k_new, c.k_min, c.k_max),
            omega=jnp.clip(om_new, c.omega_min, c.omega_max))

    def nu_t(self, state, sim):
        c = self.c
        k = jnp.maximum(state.k, c.k_min)
        om = jnp.maximum(state.omega, c.omega_min)
        return jnp.clip(k / om, 0.0, 1000.0 * self.nu)
