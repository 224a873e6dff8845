"""DNS forcing aids: trip forcing, explicit velocity filter, force ramp,
bulk-velocity controller, implicit y-diffusion.

TPU-native rebuild of the reference's DNS machinery (reference: src/
solver.cpp:818-950 initialize_trip_forcing + :1724-1810 trip application,
:4065 apply_velocity_filter, solver_turbulence_diagnostics.cpp:985-1008
force ramp, src/solver_time.cpp implicit_y_diffusion_step + solver_time_
kernels_implicit.cpp batched Thomas). All envelopes/profiles/modes are
host-precomputed constants baked into the jitted step; time dependence
(ramps) is traced through `state.t`, so the whole step stays one XLA program
with no recompilation over time.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from .config import BCType, Config
from .mesh import Mesh
from .ops.tridiag import thomas


# ---------------------------------------------------------------------------
# Trip forcing (reference solver.cpp:818-950, :1724-1810)
# ---------------------------------------------------------------------------


class TripForcing:
    """Localized body force on v*, w* that trips transition to turbulence.

    f_v = A(t) env_x(x) g(y) sum_m w_m sin(k_m z + phi_m)
    f_w = A(t) env_x(x) g(y) sum_m w_m cos(k_m z + phi_m) * w_scale
    A(t) = amplitude u_tau^2 ramp(t); cosine x-window over the trip strip;
    g(y) = y (1 - y^2) buffer-layer profile; mode weights 1/(m+1).
    """

    def __init__(self, cfg: Config, mesh: Mesh, dtype, seed: int = 12345):
        self.cfg = cfg
        delta = 0.5 * cfg.Ly
        self.u_tau = float(np.sqrt(delta * abs(cfg.dp_dx / cfg.rho)))
        Lx, Lz = cfg.Lx, cfg.Lz
        # "set" = a proper interval (both default to -1.0, so start==end
        # means unset); a >= 0 sentinel test would silently relocate a
        # legitimate strip at negative x (domains with x_min < 0)
        if cfg.trip_x_end > cfg.trip_x_start:
            x0, x1 = cfg.trip_x_start, cfg.trip_x_end
        else:
            x0 = cfg.x_min + 0.1 * Lx
            x1 = cfg.x_min + 0.2 * Lx
        width = max(x1 - x0, 1e-12)

        rng = np.random.RandomState(seed)   # deterministic (reference :836)
        phases = 2.0 * np.pi * rng.rand(cfg.trip_n_modes_z)

        xc = mesh.x.centers
        env = np.where((xc >= x0) & (xc <= x1),
                       0.5 * (1.0 - np.cos(2.0 * np.pi * (xc - x0) / width)),
                       0.0)
        # y profile normalized to [-1, 1] channel coordinates
        ymid = 0.5 * (cfg.y_min + cfg.y_max)
        yn_f = (mesh.y.faces - ymid) / delta
        yn_c = (mesh.y.centers - ymid) / delta
        g_f = yn_f * (1.0 - yn_f**2)
        g_c = yn_c * (1.0 - yn_c**2)

        is3d = mesh.Nz > 1
        n_modes = cfg.trip_n_modes_z
        wsum = sum(1.0 / (m + 1) for m in range(n_modes))
        if is3d:
            zc, zf = mesh.z.centers, mesh.z.faces
            Fz_v = np.zeros_like(zc)
            Fz_w = np.zeros_like(zf)
            for m in range(n_modes):
                kz = 2.0 * np.pi * (m + 1) / Lz
                wm = (1.0 / (m + 1)) / wsum
                Fz_v += wm * np.sin(kz * zc + phases[m])
                Fz_w += wm * np.cos(kz * zf + phases[m])
        else:
            Fz_v = np.ones(1)
            Fz_w = np.zeros(2)

        A = lambda a, shape: jnp.asarray(a.reshape(shape), dtype)
        self.env_x = A(env, (-1, 1, 1))
        nv = mesh.Ny if cfg.bc_y == BCType.PERIODIC else mesh.Ny + 1
        self.g_y_face = A(g_f[:nv], (1, -1, 1))
        self.g_y_center = A(g_c, (1, -1, 1))
        self.Fz_v = A(Fz_v, (1, 1, -1))
        nw = mesh.Nz if cfg.bc_z == BCType.PERIODIC else mesh.Nz + 1
        self.Fz_w = A(Fz_w[:nw] if is3d else Fz_w[:1], (1, 1, -1))
        self.is3d = is3d

    def time_ramp(self, t):
        """1 until ramp_off_start, cosine to 0 at duration, 0 after
        (reference get_trip_time_ramp :941-950)."""
        cfg = self.cfg
        frac = (t - cfg.trip_ramp_off_start) / max(
            cfg.trip_duration - cfg.trip_ramp_off_start, 1e-12)
        ramp = jnp.where(t <= cfg.trip_ramp_off_start, 1.0,
                         0.5 * (1.0 + jnp.cos(jnp.pi * jnp.clip(frac, 0, 1))))
        return jnp.where(t >= cfg.trip_duration, 0.0, ramp)

    def apply(self, star: Tuple, dt, t):
        """Add dt * f_trip to v* (and w* when enabled)."""
        cfg = self.cfg
        A = cfg.trip_amplitude * self.u_tau**2 * self.time_ramp(t)
        u, v, w = star
        v = v + dt * A * self.env_x * self.g_y_face * self.Fz_v
        if self.is3d and cfg.trip_force_w:
            w = w + (dt * A * cfg.trip_w_scale
                     * self.env_x * self.g_y_center * self.Fz_w)
        return (u, v, w)


# ---------------------------------------------------------------------------
# Explicit velocity filter (reference apply_velocity_filter, solver.cpp:4065)
# ---------------------------------------------------------------------------


def velocity_filter(comps, geom, strength: float):
    """u += alpha (Lx + Lz) + alpha/2 Ly with second-difference stencils;
    wall-adjacent rows skipped (reference: asymmetric-stencil avoidance),
    periodic axes wrap."""
    if strength <= 0.0:
        return comps
    alpha = strength * 0.25
    out = []
    for s in range(3):
        f = comps[s]
        acc = jnp.zeros_like(f)
        for axis in range(3):
            ax = geom.axes[axis]
            if ax.n <= 1 or f.shape[axis] < 3:
                continue
            coeff = alpha * 0.5 if axis == 1 else alpha
            if ax.periodic:
                lap = jnp.roll(f, 1, axis) - 2.0 * f + jnp.roll(f, -1, axis)
            else:
                # interior second difference; zero at the two boundary rows
                import jax
                mid = (jax.lax.slice_in_dim(f, 0, f.shape[axis] - 2, axis=axis)
                       - 2.0 * jax.lax.slice_in_dim(f, 1, f.shape[axis] - 1,
                                                    axis=axis)
                       + jax.lax.slice_in_dim(f, 2, f.shape[axis], axis=axis))
                zero = jnp.zeros_like(
                    jax.lax.slice_in_dim(f, 0, 1, axis=axis))
                lap = jnp.concatenate([zero, mid, zero], axis=axis)
            acc = acc + coeff * lap
        out.append(f + acc)
    return tuple(out)


# ---------------------------------------------------------------------------
# Implicit y-diffusion (reference implicit_y_diffusion_step,
# solver_time.cpp:667 + solver_time_kernels_implicit.cpp)
# ---------------------------------------------------------------------------


def implicit_scalar_y_diffusion(f, nu_eff, dt, geom, wall_value=0.0):
    """(I - dt d/dy nu d/dy) f_new = f + dt * wall source, for a
    cell-centered scalar with Dirichlet `wall_value` at both y walls
    (k = 0, omega = omega_wall — the transport IMEX companion of the
    momentum solve; without it the k/omega y-diffusion is explicitly
    unstable at the IMEX-enlarged dt). Applies ONLY when y is a WALL
    axis — the Dirichlet flux rows would silently impose spurious wall
    friction at an open (inflow/outflow) y boundary."""
    from .config import BCType as _BC
    yax = geom.axes[1]
    if yax.periodic or yax.n <= 2 or yax.bc != _BC.WALL:
        return f
    scalar_nu = jnp.ndim(nu_eff) == 0
    inv_d = yax.inv_d
    inv_dc = yax.inv_dc
    if scalar_nu:
        nu_f_lo = nu_f_hi = nu_eff
    else:
        nu_face = jnp.concatenate(
            [nu_eff[:, :1, :], 0.5 * (nu_eff[:, :-1, :] + nu_eff[:, 1:, :]),
             nu_eff[:, -1:, :]], axis=1)
        nu_f_lo = nu_face[:, :-1, :]
        nu_f_hi = nu_face[:, 1:, :]
    g_lo = nu_f_lo * inv_dc[:, :-1, :] * inv_d
    g_hi = nu_f_hi * inv_dc[:, 1:, :] * inv_d
    lower = -dt * g_lo
    upper = -dt * g_hi
    diag = 1.0 + dt * (g_lo + g_hi)
    # inhomogeneous Dirichlet: wall flux (f0 - wall_value)/dc0 adds a known
    # source dt*g*wall_value at the wall rows (Thomas ignores lower[0]/
    # upper[-1], so the unknown coupling is already correct)
    ny = f.shape[1]
    first = jnp.zeros(ny).at[0].set(1.0).reshape(1, -1, 1)
    last = jnp.zeros(ny).at[-1].set(1.0).reshape(1, -1, 1)
    rhs = f + dt * (g_lo * first + g_hi * last) * wall_value
    return thomas(lower, diag, upper, rhs, axis=1)


def implicit_y_diffusion(comps, nu_eff, dt, geom):
    """Solve (I - dt d/dy nu d/dy) u_new = u per component via batched
    Thomas; removes the y-diffusion CFL limit on stretched near-wall cells.

    Wall BCs are folded into the tridiagonal exactly as the explicit ghost
    rules: tangential components see u_ghost = -u_interior (no-slip),
    normal (v) has Dirichlet boundary faces pinned. WALL-y only (an open
    y boundary must keep its explicit zero-gradient ghosts).
    """
    from .config import BCType as _BC
    yax = geom.axes[1]
    if yax.periodic or yax.n <= 2 or yax.bc != _BC.WALL:
        return comps
    scalar_nu = jnp.ndim(nu_eff) == 0

    inv_d = yax.inv_d            # (1,Ny,1)
    inv_dc = yax.inv_dc          # (1,Ny+1,1)
    out = []
    for s in range(3):
        f = comps[s]
        ny = f.shape[1]
        if s == 1:
            # v: boundary faces are Dirichlet (0); solve interior faces
            interior = f[:, 1:-1, :]
            # face j (interior): coefficients couple v[j-1], v[j], v[j+1]
            # d/dy at cells j-1, j of (nu dv/dy), divided by dc at face j
            nu_lo = nu_eff if scalar_nu else nu_eff[:, :-1, :]
            nu_hi = nu_eff if scalar_nu else nu_eff[:, 1:, :]
            a_lo = nu_lo * inv_d[:, :-1, :] * inv_dc[:, 1:-1, :]
            a_hi = nu_hi * inv_d[:, 1:, :] * inv_dc[:, 1:-1, :]
            lower = -dt * a_lo
            upper = -dt * a_hi
            diag = 1.0 + dt * (a_lo + a_hi)
            sol = thomas(lower, diag, upper, interior, axis=1)
            f = f.at[:, 1:-1, :].set(sol)
        else:
            # u/w cell-centered in y: the no-slip wall flux nu u_0 / dc_0
            # is exactly the zero-Dirichlet scalar solve. The component
            # lives at faces along its own axis, so cell-centered nu_eff
            # must be averaged onto that face grid — including the wrap
            # on PERIODIC axes, where the staggered shape coincidentally
            # matches the cell count (u: Nx faces == Nx cells) but face i
            # sits between cells i-1 and i, not at cell i. Matches the
            # explicit operator's nu placement (ops/operators.diffusive).
            nu_s = nu_eff
            if not scalar_nu:
                from .ops.operators import c2f_mean
                nu_s = c2f_mean(nu_eff, s, geom.axes[s], kind="scalar")
            f = implicit_scalar_y_diffusion(f, nu_s, dt, geom,
                                            wall_value=0.0)
        out.append(f)
    return tuple(out)
