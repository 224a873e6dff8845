"""Multi-chip distribution: device mesh + sharding of the state pytree.

TPU-native replacement of the reference MPI layer (reference: include/
decomposition.hpp:28-105 z-slab Decomposition, include/halo_exchange.hpp:24-76
HaloExchange, src/poisson_solver_fft_mpi.cpp pencil-transpose FFT): fields
are sharded along z over a 1-D `Mesh` axis. Data movement is split between
GSPMD (stencil halo `collective-permute`s on the jnp operator path, scalar
`all-reduce`s) and explicit shard_map programs where GSPMD's default
schedule is wrong or impossible: the pencil-transpose Poisson solve
(parallel/pencil.py — GSPMD alone all-gathers the full field) and the
Pallas fast path with ppermute halos (parallel/fused.py — GSPMD cannot
partition a custom call). No Schwarz outer iteration (the solve stays
globally coupled under sharding); single-chip runs are the n=1 special
case (the reference's !is_parallel() no-op path, halo_exchange.hpp:9-11).
The collective schedule is pinned by an HLO-inspection test
(test_sharding.py: all-to-all + collective-permute, never a full-field
all-gather).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Z_AXIS = "z"


def device_mesh(n_devices: Optional[int] = None, axis: str = Z_AXIS) -> Mesh:
    """1-D device mesh over the spatial z axis (reference Decomposition's
    1-D z-slab split, decomposition.hpp:28-44)."""
    devs = jax.devices()
    n = n_devices or len(devs)
    if n > len(devs):
        raise ValueError(f"requested {n} devices, have {len(devs)}")
    return Mesh(np.asarray(devs[:n]), (axis,))


def field_spec(x, axis: str = Z_AXIS):
    """Shard 3-D fields along their z (last) dimension; replicate scalars."""
    if hasattr(x, "ndim") and x.ndim == 3:
        return P(None, None, axis)
    return P()


def state_shardings(state, mesh: Mesh, axis: str = Z_AXIS):
    return jax.tree.map(
        lambda x: NamedSharding(mesh, field_spec(x, axis)), state)


def shard_state(state, mesh: Mesh, axis: str = Z_AXIS):
    """Place a state pytree onto the mesh (z-sharded fields)."""
    return jax.device_put(state, state_shardings(state, mesh, axis))


def diag_shardings(mesh: Mesh):
    """Replicated shardings for the scalar StepDiagnostics pytree."""
    from ..solver import StepDiagnostics
    import jax.numpy as jnp
    return jax.tree.map(
        lambda _: NamedSharding(mesh, P()),
        StepDiagnostics(
            residual=jnp.zeros(()), div_linf=jnp.zeros(()),
            dt=jnp.zeros(()), ke=jnp.zeros(()),
            nan_flag=jnp.zeros((), bool)),
    )


def sharded_step(sim, mesh: Mesh, axis: str = Z_AXIS):
    """Jit the simulation step with explicit in/out shardings over `mesh`.

    GSPMD partitions the whole step program; the per-axis collectives
    (ppermute halos from the stencil pads, FFT transposes, reduction psums)
    are inserted by XLA (SURVEY 2.3 'TPU equivalent').
    """
    ex_state = sim.initial_state()
    sh = state_shardings(ex_state, mesh, axis)
    return jax.jit(sim._step_impl, in_shardings=(sh,),
                   out_shardings=(sh, diag_shardings(mesh)))
