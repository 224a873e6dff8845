"""Turbulence model factory (reference: create_turbulence_model,
include/turbulence_model.hpp:168-174, dispatcher enum config.hpp:11-30)."""

from __future__ import annotations

from ..config import Config, TurbulenceModel


def build(model: TurbulenceModel, cfg: Config, mesh, geom):
    T = TurbulenceModel
    if model == T.BASELINE:
        from .algebraic import MixingLengthModel
        return MixingLengthModel(cfg, mesh, geom)
    if model == T.GEP:
        from .algebraic import GEPModel
        return GEPModel(cfg, mesh, geom)
    if model == T.SST:
        from .transport import SSTTransport
        return SSTTransport(cfg, mesh, geom)
    if model == T.KOMEGA:
        from .transport import KOmegaTransport
        return KOmegaTransport(cfg, mesh, geom)
    if model == T.EARSM_WJ:
        from .earsm import WallinJohanssonEARSM
        return WallinJohanssonEARSM(cfg, mesh, geom)
    if model == T.EARSM_GS:
        from .earsm import GatskiSpezialeEARSM
        return GatskiSpezialeEARSM(cfg, mesh, geom)
    if model == T.EARSM_POPE:
        from .earsm import PopeQuadraticEARSM
        return PopeQuadraticEARSM(cfg, mesh, geom,
                                  C1=cfg.pope_C1, C2=cfg.pope_C2)
    if model == T.SMAGORINSKY:
        from .les import SmagorinskyModel
        return SmagorinskyModel(cfg, mesh, geom)
    if model == T.DYNAMIC_SMAGORINSKY:
        from .les import DynamicSmagorinskyModel
        return DynamicSmagorinskyModel(cfg, mesh, geom)
    if model == T.WALE:
        from .les import WALEModel
        return WALEModel(cfg, mesh, geom)
    if model == T.VREMAN:
        from .les import VremanModel
        return VremanModel(cfg, mesh, geom)
    if model == T.SIGMA:
        from .les import SigmaModel
        return SigmaModel(cfg, mesh, geom)
    if model == T.NN_MLP:
        from .nn_models import NNMLPModel
        return NNMLPModel(cfg, mesh, geom)
    if model == T.NN_TBNN:
        from .nn_models import NNTBNNModel
        return NNTBNNModel(cfg, mesh, geom)
    raise ValueError(f"unknown turbulence model {model}")
