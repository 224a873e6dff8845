"""Geometric multigrid Poisson solver (general-BC fallback).

Rebuild of the reference MG (src/poisson_solver_multigrid.cpp, 4.5k LoC) —
V-cycle with Chebyshev smoothing and semi-coarsening for stretched axes.
Round-1 placeholder: the FDM direct solver covers every tensor-product case
(including stretched walls and IBM RHS masking), so MG is only reached for
stretched-periodic axes; implemented in a later milestone.
"""

from __future__ import annotations


class MGPoissonSolver:
    name = "MG"

    def __init__(self, mesh, cfg, geom):
        raise NotImplementedError(
            "MG Poisson backend not yet implemented; FDM covers all "
            "tensor-product meshes (uniform periodic axes required)")
