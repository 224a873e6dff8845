"""NN-closure training toolchain (SURVEY 2.10, reference L10): offline
a-priori fitting (`training`) plus differentiable-solver a-posteriori
training through the unrolled step (`adjoint`) — the latter has no
reference analogue (the C++ solver is not differentiable)."""

from .adjoint import fit_closure, rollout, trajectory_loss
from .training import train_mlp, train_tbnn

__all__ = ["train_mlp", "train_tbnn", "fit_closure", "rollout",
           "trajectory_loss"]
