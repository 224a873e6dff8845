"""Offline NN-closure training toolchain (SURVEY 2.10, reference L10)."""

from .training import train_mlp, train_tbnn

__all__ = ["train_mlp", "train_tbnn"]
