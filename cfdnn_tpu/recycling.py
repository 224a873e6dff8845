"""Recycling turbulent inflow (Lund et al. 1998 style).

TPU-native rebuild of the reference recycling machinery (reference: src/
solver_recycling.cpp:175 initialize_recycling_inflow, :466 extract_recycle_
plane, :570 process_recycle_inflow (spanwise shift + AR1 filter + mass-flux
correction + transverse-mean removal), :1029 apply_recycling_inlet_bc, :1205
correct_inlet_divergence, :1354 apply_fringe_blending).

Design: the inlet planes are carried in the state pytree (State.inlet_*)
instead of GPU-mapped side buffers, so the whole pipeline — extraction,
shift (a jnp.roll, which under GSPMD z-sharding becomes the reference's
MPI allgather+shift for free), filtering, correction, inlet imposition,
fringe blending — traces into the single jitted step.

BC structure (reference :191-208): x_lo = inflow with DIRICHLET pressure
(so the projection may adjust the inlet face velocity for continuity),
x_hi = convective outflow with Neumann pressure; z must be periodic.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from .config import BCType, Config
from .mesh import Mesh


class RecyclingInflow:
    """Owns the recycle-station geometry and the per-step pipeline."""

    def __init__(self, cfg: Config, mesh: Mesh, dtype):
        if mesh.Nz <= 1:
            raise ValueError("recycling inflow requires a 3D mesh "
                             "(reference solver_recycling.cpp:181)")
        if cfg.bc_z != BCType.PERIODIC:
            raise ValueError("recycling inflow requires periodic z "
                             "(reference solver_recycling.cpp:186)")
        if cfg.bc_y != BCType.WALL:
            raise ValueError(
                "recycling inflow requires wall y BCs (developing "
                "channel/boundary layer; the inlet continuity stencil "
                "in correct_inlet_divergence assumes Ny+1 v-faces)")
        if mesh.Nx < 10:
            raise ValueError(
                "recycling inflow requires Nx >= 10 so the recycle "
                "station sits >= 5 cells off both ends (reference "
                "solver_recycling.cpp:289); np.clip would otherwise "
                "silently return an invalid station index")
        self.cfg = cfg
        Lx = cfg.Lx
        x_rec = cfg.recycle_x if cfg.recycle_x > 0 else cfg.x_min + 0.8 * Lx
        # face index of the recycle station, >=5 cells off both ends (:289)
        i = int(np.clip(np.searchsorted(mesh.x.faces, x_rec),
                        5, mesh.Nx - 5))
        self.i_rec = i
        self.shift_k = (cfg.recycle_shift_z if cfg.recycle_shift_z >= 0
                        else mesh.Nz // 4)
        self.shift_interval = int(cfg.recycle_shift_interval)
        # AR1 coefficient from filter time scale (:300-306); the static
        # value is the fallback when the caller has no traced dt
        if cfg.recycle_filter_tau > 0:
            self.alpha = float(np.exp(-cfg.dt / cfg.recycle_filter_tau))
        else:
            self.alpha = 0.0
        L_fringe = (cfg.recycle_fringe_length if cfg.recycle_fringe_length > 0
                    else 0.1 * Lx)
        self.i_fringe = int(np.searchsorted(mesh.x.centers,
                                            cfg.x_min + L_fringe))
        xc = mesh.x.centers[: max(self.i_fringe, 1)]
        beta = 0.5 * (1.0 + np.cos(np.pi * (xc - cfg.x_min) / max(L_fringe, 1e-12)))
        self.beta_c = jnp.asarray(beta.reshape(-1, 1, 1), dtype)
        xf = mesh.x.faces[: max(self.i_fringe, 1)]
        beta_f = 0.5 * (1.0 + np.cos(np.pi * np.clip(
            (xf - cfg.x_min) / max(L_fringe, 1e-12), 0, 1)))
        self.beta_f = jnp.asarray(beta_f.reshape(-1, 1, 1), dtype)
        # inlet cell areas dy*dz for the mass-flux bulk (:773-781)
        dA = mesh.y.d[:, None] * mesh.z.d[None, :]
        self.area = jnp.asarray(dA, dtype)
        self.total_area = float(dA.sum())
        self.target_bulk = cfg.recycle_target_bulk_u
        self.dx0 = float(mesh.x.d[0])
        self.inv_dy = jnp.asarray((1.0 / mesh.y.d).reshape(-1, 1), dtype)
        self.inv_dz = float(1.0 / mesh.z.d[0])
        # Lund-rescaling targets (set_rescale_target); None = off
        self.rescale_stats = None

    # -- state initialization ------------------------------------------------

    def init_buffers(self, comps) -> Tuple:
        """Initial inlet planes = recycle-station planes (no shift).

        When recycle_target_bulk_u < 0 (auto), also captures the
        mass-flux controller target from this plane's area-weighted
        bulk — reference parity (solver_recycling.cpp:784-785: "If
        target Q not set, use current bulk velocity as target"). A
        trace-time constant: the caller must rebuild its jits."""
        u, v, w = comps
        inlet = (u[self.i_rec, :, :], v[self.i_rec, :, :],
                 w[self.i_rec, :, :])
        if self.cfg.recycle_target_bulk_u < 0:
            self.target_bulk = float(
                jnp.sum(inlet[0] * self.area) / self.total_area)
        return inlet

    def set_rescale_target(self, comps) -> None:
        """Capture the Lund-rescaling reference statistics (z-mean
        profile + fluctuation RMS profile per component) from the
        CURRENT recycle plane — call at initialize() with a developed
        state. Trace-time constants: the caller must rebuild its jits
        (same convention as the pinned inflow profile).

        NOTE: an instantaneous capture carries the snapshot's frozen
        streak structure in the pinned mean; for production inflow
        prefer set_rescale_profiles with TIME-AVERAGED precursor
        statistics (the Lund method's actual prescription)."""
        stats = []
        for f in comps:
            plane = f[self.i_rec, :, :]
            mean = jnp.mean(plane, axis=-1, keepdims=True)
            rms = jnp.sqrt(jnp.mean((plane - mean) ** 2, axis=-1,
                                    keepdims=True))
            stats.append((jnp.asarray(mean), jnp.asarray(rms)))
        self.rescale_stats = tuple(stats)

    def set_rescale_profiles(self, stats) -> None:
        """Set the Lund-rescaling targets from explicit per-y profiles:
        `stats` is ((mean_u, rms_u), (mean_v, rms_v), (mean_w, rms_w)),
        each of shape (ny_dof, 1) for that component's y-DOF count —
        e.g. time-averaged precursor statistics. Trace-time constants:
        rebuild jits after calling."""
        self.rescale_stats = tuple(
            (jnp.asarray(m), jnp.asarray(r)) for m, r in stats)

    def _rescale(self, plane, comp: int):
        """Pin the z-mean to the target profile and rescale fluctuations
        to the target RMS (Lund et al. 1998 statistical rescaling) —
        loop gain exactly 1 regardless of what the recycle station
        drifts to. Per-y amplification clipped (recycle_rescale_clip)
        so a quiet transient cannot be blown up from noise."""
        if self.rescale_stats is None:
            return plane
        t_mean, t_rms = self.rescale_stats[comp]
        mean = jnp.mean(plane, axis=-1, keepdims=True)
        fluc = plane - mean
        rms = jnp.sqrt(jnp.mean(fluc ** 2, axis=-1, keepdims=True))
        clip = self.cfg.recycle_rescale_clip
        scale = jnp.clip(t_rms / jnp.maximum(rms, 1e-12),
                         1.0 / clip, clip)
        return t_mean + scale * fluc

    # -- per-step pipeline ---------------------------------------------------

    def _shift(self, plane, step):
        """Spanwise decorrelation shift, applied EVERY step (reference
        solver_recycling.cpp:645 k_src = (k + shift_k) % Nz on every
        process call). recycle_shift_interval, per its documented intent
        ("timesteps between shift updates", config.hpp:216 — the
        reference declares but never implements it), ROTATES the shift
        amount every `interval` steps so the inlet decorrelates against
        a slowly varying offset; 0 (the default, matching reference
        behavior) keeps it constant."""
        k = self.shift_k
        if step is not None and self.shift_interval > 0:
            k = (self.shift_k
                 * (1 + step // self.shift_interval)) % plane.shape[-1]
            # the rotation orbit passes through 0 whenever shift_k shares
            # a factor with Nz (e.g. Nz//4 with 4 | Nz) — an unshifted
            # window is exactly the spanwise-locked feedback the shift
            # exists to prevent; substitute the base shift there
            k = jnp.where(k == 0, self.shift_k, k)
        return jnp.roll(plane, k, axis=-1)

    def _alpha_of(self, dt):
        """AR1 coefficient exp(-dt/tau) from the ACTUAL step size when the
        caller passes the traced dt (adaptive-dt runs would otherwise get
        a filter memory baked from the static cfg.dt); falls back to the
        construction-time value."""
        if self.cfg.recycle_filter_tau <= 0:
            return None
        if dt is None:
            return self.alpha
        return jnp.exp(-dt / self.cfg.recycle_filter_tau)

    def _u_correction(self, rec_u):
        """Mass-flux correction: uniform offset toward the target bulk,
        clamped to 10% of the target per step (:785-805). Offsetting by
        clip(target - bulk) — rather than scaling bulk — still corrects
        when a transient leaves the instantaneous bulk near zero or
        negative (scaling would amplify a reversed plane)."""
        if self.target_bulk <= 0:
            return rec_u, None
        bulk = jnp.sum(rec_u * self.area) / self.total_area
        offset = jnp.clip(self.target_bulk - bulk,
                          -0.1 * self.target_bulk, 0.1 * self.target_bulk)
        return rec_u + offset, offset

    def process(self, comps, inlet, dt=None, step=None):
        """Extract + spanwise shift + AR1 filter + mass-flux correction +
        transverse-mean removal. Returns the new inlet planes."""
        u, v, w = comps
        rec_u = self._rescale(self._shift(u[self.i_rec, :, :], step), 0)
        rec_v = self._rescale(self._shift(v[self.i_rec, :, :], step), 1)
        rec_w = self._rescale(self._shift(w[self.i_rec, :, :], step), 2)
        a = self._alpha_of(dt)
        if a is not None:
            rec_u = a * inlet[0] + (1 - a) * rec_u
            rec_v = a * inlet[1] + (1 - a) * rec_v
            rec_w = a * inlet[2] + (1 - a) * rec_w
        rec_u, _ = self._u_correction(rec_u)
        if self.cfg.recycle_remove_transverse_mean:
            rec_v = rec_v - jnp.mean(rec_v)
            rec_w = rec_w - jnp.mean(rec_w)
        if self.cfg.bc_y == BCType.WALL:
            # keep no-slip wall faces exactly zero so the later velocity-BC
            # re-imposition cannot break the inlet-cell continuity
            rec_v = rec_v.at[0, :].set(0.0).at[-1, :].set(0.0)
        return (rec_u, rec_v, rec_w)

    def apply_inlet(self, comps, inlet):
        """Impose v, w at the inlet plane; u is determined by the
        projection + divergence correction (:1029-1090)."""
        u, v, w = comps
        v = v.at[0, :, :].set(inlet[1])
        w = w.at[0, :, :].set(inlet[2])
        return (u, v, w)

    def correct_inlet_divergence(self, comps):
        """u at the inlet face from local continuity of the first cell:
        u0 = u1 + dx (dv/dy + dw/dz) (:1205-1280, the key stability fix)."""
        u, v, w = comps
        dvdy = (v[0, 1:, :] - v[0, :-1, :]) * self.inv_dy
        dwdz = (jnp.roll(w[0, :, :], -1, axis=-1) - w[0, :, :]) * self.inv_dz
        u = u.at[0, :, :].set(u[1, :, :] + self.dx0 * (dvdy + dwdz))
        return (u, v, w)

    def stage_diagnostics(self, comps, inlet, dt=None, step=None):
        """Per-stage L2 telemetry of the recycling pipeline (reference
        recycle stage diagnostics, solver.hpp:734-805): L2 after
        copy+shift, after the AR1 filter, after mean correction, plus the
        mean/rms of the inlet u plane. Built from the SAME helpers as
        process() so the telemetry cannot drift from the real pipeline."""
        u = comps[0]
        rec_u = self._rescale(self._shift(u[self.i_rec, :, :], step), 0)
        L2 = lambda f: jnp.sqrt(jnp.mean(f * f))
        out = {"L2_copy": L2(rec_u)}
        a = self._alpha_of(dt)
        filt = rec_u if a is None else a * inlet[0] + (1 - a) * rec_u
        out["L2_ar1"] = L2(filt)
        out["u_mean_before_corr"] = jnp.mean(filt)
        filt, offset = self._u_correction(filt)
        if offset is not None:
            out["bulk_offset"] = offset
        out["L2_mean"] = L2(filt)
        out["u_mean_after_corr"] = jnp.mean(filt)
        out["u_rms_after_corr"] = jnp.sqrt(
            jnp.maximum(jnp.mean(filt**2) - jnp.mean(filt) ** 2, 0.0))
        return {k: float(v) for k, v in out.items()}

    def fringe(self, comps, inlet):
        """Cosine blend toward the inlet planes over the fringe zone
        (:1354-1420): beta=1 at the inlet, 0 at the fringe end."""
        if self.i_fringe < 1:
            return comps
        u, v, w = comps
        nf = self.i_fringe
        u = u.at[:nf, :, :].set(
            self.beta_f * inlet[0][None, :, :]
            + (1.0 - self.beta_f) * u[:nf, :, :])
        v = v.at[:nf, :, :].set(
            self.beta_c * inlet[1][None, :, :]
            + (1.0 - self.beta_c) * v[:nf, :, :])
        w = w.at[:nf, :, :].set(
            self.beta_c * inlet[2][None, :, :]
            + (1.0 - self.beta_c) * w[:nf, :, :])
        return (u, v, w)
