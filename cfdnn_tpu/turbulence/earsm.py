"""Explicit Algebraic Reynolds Stress Models on SST k-omega transport.

TPU-native rebuild of the reference EARSM trio (reference: include/
turbulence_earsm.hpp:1-90 WJ/GS/Pope + blending thresholds, src/turbulence_
earsm.cpp compute_G :381-524, earsm_compute_output :729-800, unified cell
kernels :802-990): anisotropy b_ij = sum_n G_n(eta, zeta) T^(n)_ij with the
2-D tensor basis (T1 = S*, T2 = [S*, Omega*], T3 = S*^2 - tr/3), smooth
Re_t-tanh blending of the nonlinear terms, Reynolds stresses
tau_ij = -2 k b_ij, and an equivalent nu_t extracted from the shear
component. Transport of (k, omega) is inherited from SSTTransport.

The reference formulation is 2-D in the x-y plane (it reads only dudx, dudy,
dvdx, dvdy — src/turbulence_earsm.cpp:816-840); this build keeps that
formulation, taking the in-plane components of the 3-D gradient tensor.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..utils.numerics import safe_tanh
from .base import strain_rotation
from .transport import SSTConstants, SSTTransport


@dataclasses.dataclass(frozen=True)
class WJConstants:
    """Wallin-Johansson SSG pressure-strain constants (turbulence_earsm.hpp:52-66)."""

    C1: float = 1.8
    C1_star: float = 0.5
    C2: float = 0.36
    C3: float = 1.25
    C3_star: float = 0.4
    C4: float = 0.4
    C5: float = 1.88

    @property
    def A1(self):
        return 4.0 / 5.0 - self.C2 / 2.0

    @property
    def A2(self):
        return 2.0 - self.C4 / 2.0

    @property
    def A3(self):
        return 2.0 - self.C3 / 2.0

    @property
    def A4(self):
        return 2.0 * self.C5 - 1.0


@dataclasses.dataclass(frozen=True)
class GSConstants:
    """Gatski-Speziale constants (turbulence_earsm.hpp:68-78)."""

    C_mu: float = 0.09
    C1: float = 1.8
    C2: float = 0.6
    eta_max: float = 10.0


class EARSMBase(SSTTransport):
    """Shared EARSM pipeline; subclasses provide (G1, G2, G3)(eta, zeta)."""

    provides_reynolds_stresses = True
    C_MU = 0.09

    def __init__(self, cfg, mesh, geom, constants: SSTConstants = SSTConstants()):
        super().__init__(cfg, mesh, geom, constants)
        self.Re_t_center = 10.0   # EARSMThresholds (turbulence_earsm.hpp:80-90)
        self.Re_t_width = 5.0

    def _G(self, eta, zeta):
        raise NotImplementedError

    def _pipeline(self, state, sim):
        """eta/zeta -> G -> b_ij -> (nu_t, tau). One fused pass."""
        c = self.c
        k = jnp.maximum(state.k, c.k_min)
        om = jnp.maximum(state.omega, c.omega_min)
        sr = strain_rotation((state.u, state.v, state.w), sim.geom)
        # in-plane components (reference 2-D formulation)
        Sxx, Sxy, Syy = sr.S[0][0], sr.S[0][1], sr.S[1][1]
        Oxy = sr.O12
        S_mag = jnp.sqrt(2.0 * (Sxx**2 + Syy**2 + 2.0 * Sxy**2))
        # |Omega| = sqrt(2 O_ij O_ij) = 2|Oxy| in-plane — the same
        # normalization as S_mag and base.strain_rotation (a sqrt(2)|Oxy|
        # variant underestimated zeta, skewing the models toward the
        # irrotational limit; in pure shear eta == zeta must hold)
        O_mag = 2.0 * jnp.abs(Oxy)

        # turbulence time scale tau = k/eps = 1/(C_mu omega) (:269-271)
        tau = 1.0 / (self.C_MU * om)
        eta = jnp.minimum(tau * S_mag, 100.0)
        zeta = jnp.minimum(tau * O_mag, 100.0)

        G1, G2, G3 = self._G(eta, zeta)
        clipG = lambda g: jnp.clip(g, -10.0, 10.0)
        G1, G2, G3 = clipG(G1), clipG(G2), clipG(G3)

        # Re_t blending of nonlinear terms (:897-901)
        Re_t = k / (self.nu * om)
        alpha = 0.5 * (1.0 + safe_tanh((Re_t - self.Re_t_center) / self.Re_t_width))
        G2 = G2 * alpha
        G3 = G3 * alpha

        # normalized tensors and 2-D basis (earsm_compute_output :740-786)
        Ss_xx, Ss_xy, Ss_yy = tau * Sxx, tau * Sxy, tau * Syy
        Os_xy = tau * Oxy
        comm_xx = -2.0 * Ss_xy * Os_xy
        comm_xy = (Ss_xx - Ss_yy) * Os_xy
        comm_yy = 2.0 * Ss_xy * Os_xy
        S2_xx = Ss_xx**2 + Ss_xy**2
        S2_xy = Ss_xy * (Ss_xx + Ss_yy)
        S2_yy = Ss_xy**2 + Ss_yy**2
        tr = S2_xx + S2_yy
        S2_xx, S2_yy = S2_xx - tr / 3.0, S2_yy - tr / 3.0

        b_xx = G1 * Ss_xx + G2 * comm_xx + G3 * S2_xx
        b_xy = G1 * Ss_xy + G2 * comm_xy + G3 * S2_xy
        b_yy = G1 * Ss_yy + G2 * comm_yy + G3 * S2_yy

        # codebase stress protocol tau_ij = 2 k (b_ij + delta_ij/3) —
        # the same convention as the TBNN path
        # (features.anisotropy_to_stress), so consumers comparing
        # <u'v'> profiles read both model families identically
        from .features import anisotropy_to_stress
        tau_xx, tau_xy, tau_yy = anisotropy_to_stress(b_xx, b_xy, b_yy, k)

        # equivalent nu_t from tau_xy = -2 nu_t S_xy (:786-797)
        b_mag = jnp.sqrt(b_xx**2 + 2.0 * b_xy**2 + b_yy**2)
        nut = jnp.where(
            jnp.abs(Sxy) > 1e-10,
            jnp.abs(-b_xy * k / jnp.where(jnp.abs(Sxy) > 1e-10, Sxy, 1.0)),
            jnp.where(S_mag > 1e-10, k * b_mag / jnp.maximum(S_mag, 1e-10), 0.0),
        )
        nut = jnp.nan_to_num(jnp.clip(nut, 0.0, 100.0 * self.nu))
        return nut, (tau_xx, tau_xy, tau_yy)

    def nu_t(self, state, sim):
        return self._pipeline(state, sim)[0]

    def reynolds_stresses(self, state, sim):
        return self._pipeline(state, sim)[1]


class WallinJohanssonEARSM(EARSMBase):
    """WJ 2000 with the exact 2-D closed-form N.

    DELIBERATE deviation from the reference's simplified
    N = -A1/(1 + A3 II_S + A4 II_O) (solve_for_N :349-380): that form
    is ill-posed — at weak strain N -> -A1, the beta1 denominator
    A1 + N -> 0, and G1 blows up POSITIVE to the clip (62 before
    clipping at zero invariants), so nu_t behaves inversely to the
    strain. Here the genuine Wallin-Johansson (JFM 2000) 2-D solution
    of the cubic N^3 - c1' N^2 - (2.7 II_S + 2 II_O) N + 2 c1' II_O = 0
    is used, which is well-posed for all invariants (N >= c1'/3 > 0,
    Q = N^2 - 2 II_O >= N^2 > 0). Log-layer check: at P/eps = 1 pure
    shear this gives b_xy ~= -0.147 (WJ a_12 ~= -0.3) and an
    equivalent C_mu ~= 0.089."""

    name = "EARSM-WJ"

    def __init__(self, cfg, mesh, geom, wj: WJConstants = WJConstants(), **kw):
        super().__init__(cfg, mesh, geom, **kw)
        self.wj = wj

    def _G(self, eta, zeta):
        # exact 2-D invariants: II_S = tr(S*^2) = eta^2/2 under the
        # S_mag = sqrt(2 S_ij S_ij) normalization; II_O = tr(O*^2) <= 0
        II_S = 0.5 * eta * eta
        II_O = -0.5 * zeta * zeta
        c1p = 9.0 / 4.0 * (self.wj.C1 - 1.0)
        P1 = (c1p**2 / 27.0 + 0.45 * II_S - (2.0 / 3.0) * II_O) * c1p
        P2 = P1**2 - (c1p**2 / 9.0 + 0.9 * II_S + (2.0 / 3.0) * II_O) ** 3
        sqrtP2 = jnp.sqrt(jnp.maximum(P2, 0.0))
        t1 = jnp.cbrt(P1 + sqrtP2)
        arg = P1 - sqrtP2
        t2 = jnp.sign(arg) * jnp.cbrt(jnp.abs(arg))
        N_pos = c1p / 3.0 + t1 + t2
        # P2 < 0: strongly rotational branch (trigonometric root)
        base = jnp.maximum(P1**2 - P2, 1e-30)
        theta = jnp.arctan2(jnp.sqrt(jnp.maximum(-P2, 0.0)), P1)
        N_neg = c1p / 3.0 + 2.0 * base ** (1.0 / 6.0) * jnp.cos(theta / 3.0)
        N = jnp.where(P2 >= 0.0, N_pos, N_neg)
        Q = jnp.maximum(N * N - 2.0 * II_O, 1e-10)
        # b-convention (b = a/2): G = beta_WJ / 2 = -(3/5) {N, 1} / Q
        G1 = -0.6 * N / Q
        G2 = -0.6 / Q
        G3 = jnp.zeros_like(G1)   # the S^2 term vanishes in exact 2-D WJ
        return G1, G2, G3


class GatskiSpezialeEARSM(EARSMBase):
    """GS 1993 regularized (reference compute_G :452-490)."""

    name = "EARSM-GS"

    def __init__(self, cfg, mesh, geom, gs: GSConstants = GSConstants(), **kw):
        super().__init__(cfg, mesh, geom, **kw)
        self.gs = gs

    def _G(self, eta, zeta):
        g = self.gs
        C_mu_eff = g.C_mu / (1.0 + eta**2 / g.eta_max**2)
        ratio = jnp.where(eta > 1e-10, zeta / jnp.maximum(eta, 1e-10), 0.0)
        rot = 1.0 / (1.0 + 0.1 * ratio**2)
        G1 = -C_mu_eff * rot
        G2 = g.C1 * C_mu_eff**2
        G3 = g.C2 * C_mu_eff
        clip5 = lambda x: jnp.clip(x, -5.0, 5.0)
        return clip5(G1), clip5(G2), clip5(G3)


class PopeQuadraticEARSM(EARSMBase):
    """Pope 1975 quadratic (reference compute_G :497-524)."""

    name = "EARSM-Pope"

    def __init__(self, cfg, mesh, geom, C1: float = 0.1, C2: float = 0.1, **kw):
        super().__init__(cfg, mesh, geom, **kw)
        self.C1 = C1
        self.C2 = C2

    def _G(self, eta, zeta):
        eta_safe = jnp.minimum(jnp.nan_to_num(eta, nan=100.0), 100.0)
        C_mu_eff = self.C_MU / (1.0 + 0.01 * eta_safe**2)
        return -C_mu_eff, self.C2 * eta_safe, self.C1 * eta_safe
