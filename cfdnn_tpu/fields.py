"""Flow state as a pytree of device-resident arrays.

Replaces the reference's ScalarField/VectorField/TensorField + GPU persistent
mapping machinery (reference: include/fields.hpp:12-222, src/solver.cpp:3736-
4191): under XLA the arrays simply live on device inside the jitted step, so
there is no pointer bookkeeping, no host/device sync trio, and no ghost
storage — ghosts are materialized inside operators.

Unique-DOF staggered shapes (see mesh.py docstring): a normal-velocity
component has N faces on a periodic axis and N+1 faces (boundary faces stored)
on a wall/inflow/outflow axis.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import BCType, Config, TurbulenceModel
from .mesh import Mesh


def _nfaces(n: int, bc: BCType) -> int:
    return n if bc == BCType.PERIODIC else n + 1


def velocity_shapes(cfg: Config) -> Tuple[Tuple[int, ...], ...]:
    """(u, v, w) array shapes for the unique-DOF staggered layout."""
    Nx, Ny, Nz = cfg.Nx, cfg.Ny, cfg.Nz
    u = (_nfaces(Nx, cfg.bc_x), Ny, Nz)
    v = (Nx, _nfaces(Ny, cfg.bc_y), Nz)
    w = (Nx, Ny, _nfaces(Nz, cfg.bc_z))
    return u, v, w


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class State:
    """Carried simulation state: one pytree in, one pytree out of `step`."""

    u: jax.Array
    v: jax.Array
    w: jax.Array
    p: jax.Array
    t: jax.Array                      # scalar physical time
    step: jax.Array                   # scalar int step counter
    dt_prev: jax.Array                # last dt used (diagnostics/adaptive)
    # Kahan carry for t: in the f32 working dtype, plain t += dt loses the
    # low bits of dt once t/dt > ~2^24 (time freezes at ~1.6e7 steps and
    # drifts long before); the compensated sum keeps t exact to O(eps).
    # Optional so pre-existing checkpoints (no such key) restore cleanly.
    t_comp: Optional[jax.Array] = None
    # Turbulence transport variables (None unless a transport closure is on)
    k: Optional[jax.Array] = None
    omega: Optional[jax.Array] = None
    nu_t: Optional[jax.Array] = None
    # Recycling-inflow carried buffers (None unless recycling is enabled)
    inlet_u: Optional[jax.Array] = None
    inlet_v: Optional[jax.Array] = None
    inlet_w: Optional[jax.Array] = None

    def replace(self, **kw) -> "State":
        return dataclasses.replace(self, **kw)

    @property
    def velocity(self):
        return self.u, self.v, self.w


def _needs_transport(model: TurbulenceModel) -> bool:
    """Models whose state carries (k, omega) arrays: the two-equation
    transport family plus TBNN (which keeps an algebraic k/omega estimate
    for its normalization timescale, reference turbulence_nn_tbnn.cpp
    estimate_k)."""
    return model in (
        TurbulenceModel.SST,
        TurbulenceModel.KOMEGA,
        TurbulenceModel.EARSM_WJ,
        TurbulenceModel.EARSM_GS,
        TurbulenceModel.EARSM_POPE,
        TurbulenceModel.NN_TBNN,
    )


def zero_state(cfg: Config) -> State:
    dtype = jnp.dtype(cfg.dtype)
    su, sv, sw = velocity_shapes(cfg)
    sc = (cfg.Nx, cfg.Ny, cfg.Nz)
    z = lambda s: jnp.zeros(s, dtype)
    kw = {}
    if _needs_transport(cfg.turb_model):
        kw["k"] = jnp.full(sc, 1e-4, dtype)
        kw["omega"] = jnp.full(sc, 1.0, dtype)
    if cfg.turb_model != TurbulenceModel.NONE:
        kw["nu_t"] = jnp.zeros(sc, dtype)
    if cfg.recycling_inflow:
        # carried inlet planes (reference solver_recycling.cpp:321-340
        # buffers; here part of the state pytree)
        kw["inlet_u"] = jnp.zeros((su[1], su[2]), dtype)
        kw["inlet_v"] = jnp.zeros((sv[1], sv[2]), dtype)
        kw["inlet_w"] = jnp.zeros((sw[1], sw[2]), dtype)
    return State(
        u=z(su), v=z(sv), w=z(sw), p=z(sc),
        t=jnp.zeros((), dtype),
        t_comp=jnp.zeros((), dtype),
        step=jnp.zeros((), jnp.int32),
        dt_prev=jnp.asarray(cfg.dt, dtype),
        **kw,
    )


# ---------------------------------------------------------------------------
# Initial conditions (reference: app/main_channel.cpp initial profiles,
# app/main_taylor_green_3d.cpp:31-61 TGV IC)
# ---------------------------------------------------------------------------


def poiseuille_exact(cfg: Config, y: np.ndarray) -> np.ndarray:
    """Analytic steady Poiseuille profile u(y) = -dp_dx/(2 nu) * (delta^2-y^2).

    y measured from the channel centerline; delta = half height.
    """
    delta = 0.5 * cfg.Ly
    yc = y - (cfg.y_min + delta)
    return (-cfg.dp_dx) / (2.0 * cfg.nu * cfg.rho) * (delta**2 - yc**2)


def init_poiseuille(cfg: Config, mesh: Mesh, fraction: float = 0.0) -> State:
    """Channel IC: `fraction` of the analytic parabola (0 = rest start)."""
    st = zero_state(cfg)
    if fraction != 0.0:
        prof = fraction * poiseuille_exact(cfg, mesh.y.centers)
        u = jnp.broadcast_to(
            jnp.asarray(prof, st.u.dtype)[None, :, None], st.u.shape
        )
        st = st.replace(u=u)
    return st


def init_taylor_green(cfg: Config, mesh: Mesh, V0: float = 1.0) -> State:
    """3D Taylor-Green vortex IC on the staggered grid.

    u =  V0 sin(x) cos(y) cos(z); v = -V0 cos(x) sin(y) cos(z); w = 0,
    with each component sampled at its own face locations (reference:
    app/main_taylor_green_3d.cpp:31-61).
    """
    st = zero_state(cfg)
    dtype = st.u.dtype
    xf, xc = mesh.x.faces[: st.u.shape[0]], mesh.x.centers
    yf, yc = mesh.y.faces[: st.v.shape[1]], mesh.y.centers
    zc = mesh.z.centers
    # scale factors so the box [0,2pi]^3 maps to one TGV period
    kx = 2.0 * np.pi / cfg.Lx
    ky = 2.0 * np.pi / cfg.Ly
    kz = 2.0 * np.pi / cfg.Lz

    def A(a):
        return jnp.asarray(a, dtype)

    u = V0 * (
        np.sin(kx * (xf - cfg.x_min))[:, None, None]
        * np.cos(ky * (yc - cfg.y_min))[None, :, None]
        * np.cos(kz * (zc - cfg.z_min))[None, None, :]
    )
    v = -V0 * (
        np.cos(kx * (xc - cfg.x_min))[:, None, None]
        * np.sin(ky * (yf - cfg.y_min))[None, :, None]
        * np.cos(kz * (zc - cfg.z_min))[None, None, :]
    )
    p0 = (V0**2 / 16.0) * (
        (np.cos(2 * kx * (xc - cfg.x_min))[:, None, None]
         + np.cos(2 * ky * (yc - cfg.y_min))[None, :, None])
        * (np.cos(2 * kz * (zc - cfg.z_min))[None, None, :] + 2.0)
    )
    return st.replace(u=A(u), v=A(v), p=A(p0))


def init_turbulent_channel(cfg: Config, mesh: Mesh, U_bulk: float = 15.6,
                           amp: float = 0.1, key=None) -> State:
    """Turbulent-like IC: 1/7-power-law mean profile at the target bulk
    velocity plus strong random perturbations — the standard DNS warm
    start (the laminar parabola at DNS forcing overshoots by ~6x before
    transition; reference DNS drivers start near the turbulent bulk)."""
    st = zero_state(cfg)
    delta = 0.5 * cfg.Ly
    ymid = 0.5 * (cfg.y_min + cfg.y_max)
    eta = np.clip(1.0 - np.abs(mesh.y.centers - ymid) / delta, 1e-6, 1.0)
    prof = U_bulk * (8.0 / 7.0) * eta ** (1.0 / 7.0)
    u = jnp.broadcast_to(jnp.asarray(prof, st.u.dtype)[None, :, None],
                         st.u.shape)
    st = st.replace(u=u)
    if amp > 0.0:
        # Band-limited (low-wavenumber) perturbations: white noise carries
        # its energy at the grid scale and is dissipated within a few steps,
        # so transition never takes hold; coherent large-scale rolls/streaks
        # (random Fourier modes with kx <= 3, kz <= 4, wall-vanishing y
        # envelopes) are the standard DNS trigger.
        rng = np.random.default_rng(11)
        scale = amp * U_bulk
        eta_c = (mesh.y.centers - ymid) / delta        # [-1, 1]
        # slice to the stored-DOF face count (periodic y drops face Ny)
        eta_f = ((mesh.y.faces - ymid) / delta)[: st.v.shape[1]]
        xg_f = mesh.x.faces[: st.u.shape[0]]
        xg_c = mesh.x.centers
        zg_c = mesh.z.centers
        zg_f = mesh.z.faces[: st.w.shape[2]]

        def modes(xs, ys, zs, n_modes=12, env_power=1):
            out = np.zeros((len(xs), len(ys), len(zs)))
            env = (1.0 - ys**2) ** env_power            # vanishes at walls
            for _ in range(n_modes):
                kx = rng.integers(0, 4) * 2 * np.pi / max(cfg.Lx, 1e-12)
                kz = rng.integers(1, 5) * 2 * np.pi / max(cfg.Lz, 1e-12)
                m = rng.integers(1, 4)
                phx, phz = rng.uniform(0, 2 * np.pi, 2)
                out += (np.cos(kx * xs + phx)[:, None, None]
                        * (np.sin(m * np.pi * 0.5 * (ys + 1.0)) * env)[None, :, None]
                        * np.cos(kz * zs + phz)[None, None, :])
            return out / n_modes

        du = scale * modes(xg_f, eta_c, zg_c)
        dv = scale * modes(xg_c, eta_f, zg_c)
        dw = scale * modes(xg_c, eta_c, zg_f)
        v = st.v + jnp.asarray(dv, st.v.dtype)
        if cfg.bc_y == BCType.WALL:
            v = v.at[:, 0, :].set(0.0).at[:, -1, :].set(0.0)
        st = st.replace(u=st.u + jnp.asarray(du, st.u.dtype), v=v,
                        w=st.w + jnp.asarray(dw, st.w.dtype))
    return st


def perturbed_channel(cfg: Config, mesh: Mesh, key=None, amp: Optional[float] = None) -> State:
    """Laminar parabola + random solenoidal-ish perturbations for DNS trips."""
    st = init_poiseuille(cfg, mesh, fraction=1.0)
    amp = cfg.perturbation_amplitude if amp is None else amp
    if amp == 0.0:
        return st
    key = key if key is not None else jax.random.PRNGKey(0)
    ku, kv, kw = jax.random.split(key, 3)
    dtype = st.u.dtype
    umax = float(np.max(np.abs(poiseuille_exact(cfg, mesh.y.centers)))) or 1.0
    scale = amp * umax
    noise = lambda k, s: scale * jax.random.uniform(k, s, dtype, -1.0, 1.0)
    # keep wall-normal faces at zero on walls
    v = noise(kv, st.v.shape)
    if cfg.bc_y == BCType.WALL:
        v = v.at[:, 0, :].set(0.0).at[:, -1, :].set(0.0)
    return st.replace(
        u=st.u + noise(ku, st.u.shape),
        v=v,
        w=st.w + noise(kw, st.w.shape),
    )
