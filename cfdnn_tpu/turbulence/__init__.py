"""Turbulence closure factory (reference: turbulence_model.hpp:168-174).

All 15 closures of the reference are (being) rebuilt as pure functions over
the state pytree; transport models additionally advance (k, omega) carried in
the state. See SURVEY.md section 2.6 for the model list.
"""

from __future__ import annotations

from ..config import Config, TurbulenceModel


class NoModel:
    """Laminar: nu_t = None (treated as zero everywhere)."""

    name = "none"
    uses_transport = False
    provides_reynolds_stresses = False

    def initialize(self, state, sim):
        return state

    def advance(self, state, sim, dt):
        return state

    def nu_t(self, state, sim):
        return None

    def advance_and_nu_t(self, state, sim, dt):
        return state, None

    def reynolds_stresses(self, state, sim):
        return None


def create_turbulence_model(cfg: Config, mesh, geom):
    m = cfg.turb_model
    if m == TurbulenceModel.NONE:
        return NoModel()
    from . import registry
    return registry.build(m, cfg, mesh, geom)
