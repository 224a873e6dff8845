"""Algebraic eddy-viscosity closures: mixing length (baseline) and GEP.

TPU-native rebuild of the reference MixingLengthModel (reference: include/
turbulence_baseline.hpp:8-30, src/turbulence_baseline.cpp mixing_length_cell_
kernel) and TurbulenceGEP (include/turbulence_gep.hpp:8-29, src/turbulence_
gep.cpp gep_cell_kernel — Weatheritt & Sandberg 2016 JFM 807 style fixed
algebraic corrections). Each is a single fused jnp expression over the
cell-centered gradient tensor.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils.numerics import safe_tanh
from .base import TurbulenceModelBase, strain_rotation, u_tau_wall, wall_distance


class MixingLengthModel(TurbulenceModelBase):
    """nu_t = l_mix^2 |S|, l_mix = min(kappa y (1 - e^{-y+/A+}), delta/2).

    Matches the reference kernel (src/turbulence_baseline.cpp:37-78):
    y+ from the instantaneous wall-gradient u_tau, cap nu_t <= 1000 nu, and
    0.5/0.5 under-relaxation against the previous step's nu_t.
    """

    name = "MixingLength"

    def __init__(self, cfg, mesh, geom, kappa=0.41, A_plus=26.0):
        self.kappa = kappa
        self.A_plus = A_plus
        self.delta = 0.5 * cfg.Ly
        self.nu = cfg.nu
        self.y_wall = wall_distance(mesh, cfg, geom.dtype)

    def nu_t(self, state, sim):
        comps = (state.u, state.v, state.w)
        sr = strain_rotation(comps, sim.geom)
        u_tau = u_tau_wall(comps, sim.geom, self.nu)
        y_plus = self.y_wall * u_tau / self.nu
        damping = 1.0 - jnp.exp(-y_plus / self.A_plus)
        l_mix = jnp.minimum(self.kappa * self.y_wall * damping, 0.5 * self.delta)
        nut = jnp.minimum(l_mix**2 * sr.S_mag, 1000.0 * self.nu)
        if state.nu_t is not None:
            nut = 0.5 * nut + 0.5 * state.nu_t  # under-relax feedback loop
        return nut


class GEPModel(TurbulenceModelBase):
    """Weatheritt-Sandberg GEP algebraic correction model.

    Fixed symbolic-regression formulas, no trained weights (reference:
    src/turbulence_gep.cpp:55-100). Variants: 0 = WS2016_Channel,
    1 = WS2016_PeriodicHill, 2 = Simple.
    """

    name = "GEP (Weatheritt-Sandberg)"

    def __init__(self, cfg, mesh, geom, variant: int = 0,
                 kappa=0.41, A_plus=26.0):
        self.variant = variant
        self.kappa = kappa
        self.A_plus = A_plus
        self.nu = cfg.nu
        self.y_wall = wall_distance(mesh, cfg, geom.dtype)

    def nu_t(self, state, sim):
        comps = (state.u, state.v, state.w)
        sr = strain_rotation(comps, sim.geom)
        S, Om = sr.S_mag, sr.O_mag
        y = jnp.maximum(self.y_wall, 1e-10)
        # local y+ proxy y * sqrt(S/nu): near a wall S ~ u_tau^2/nu, so
        # sqrt(nu S) ~ u_tau and this reduces to the true y u_tau / nu.
        # DELIBERATE deviation from the reference's S*y/nu
        # (turbulence_gep.cpp:70, marked "Approximation" there), which is
        # dimensionally y+ * u_tau/nu — inflated by ~Re_tau, saturating
        # the van Driest damping by y+ ~ 0.3 (i.e. no damping at all).
        y_plus = y * jnp.sqrt(S / (self.nu + 1e-20))
        f_damp = (1.0 - jnp.exp(-y_plus / self.A_plus)) ** 2
        ratio = jnp.where(S > 1e-10, Om / jnp.maximum(S, 1e-10), 1.0)
        if self.variant == 0:      # WS2016_Channel
            f_gep = f_damp / (1.0 + 0.1 * ratio**2)
        elif self.variant == 1:    # WS2016_PeriodicHill
            f_gep = safe_tanh(y_plus / 50.0) / (1.0 + 0.2 * ratio**2)
        else:                      # Simple
            f_gep = f_damp
        l = self.kappa * y * f_gep
        return jnp.clip(l * l * S, 0.0, 1000.0 * self.nu)
