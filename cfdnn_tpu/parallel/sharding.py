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
X_AXIS = "x"


def device_mesh(n_devices: Optional[int] = None, axis: str = Z_AXIS) -> Mesh:
    """1-D device mesh over the spatial z axis (reference Decomposition's
    1-D z-slab split, decomposition.hpp:28-44)."""
    devs = jax.devices()
    n = n_devices or len(devs)
    if n > len(devs):
        raise ValueError(f"requested {n} devices, have {len(devs)}")
    return Mesh(np.asarray(devs[:n]), (axis,))


def device_mesh_nd(shape, axes) -> Mesh:
    """N-D device mesh (beyond the reference's 1-D z-slab: a 2-D (x, z)
    pencil decomposition maps onto the TPU's 2-D ICI torus, so both halo
    families ride neighbor links). Axis named 'x' shards spatial dim 0;
    every other axis name shards spatial dim 2 (z)."""
    devs = jax.devices()
    n = 1
    for d in shape:
        n *= int(d)
    if n > len(devs):
        raise ValueError(f"requested {n} devices, have {len(devs)}")
    if len(shape) != len(axes):
        raise ValueError(f"mesh shape {shape} vs axes {axes} length mismatch")
    return Mesh(np.asarray(devs[:n]).reshape(tuple(shape)), tuple(axes))


def _axis_names(axis) -> tuple:
    return (axis,) if isinstance(axis, str) else tuple(axis)


def field_spec(x, axis=Z_AXIS, mesh: Optional[Mesh] = None):
    """Shard 3-D fields over the mesh axes — the axis named 'x' along
    dim 0, the (at most one) other axis along dim 2 (z); replicate
    everything else. `axis` is one name or a tuple of names.

    With `mesh` given, a dim whose size is not divisible by its mesh
    axis is left replicated instead of failing device_put: wall-normal
    staggered components carry N+1 faces (the documented "runs, but
    through the fallback path" case — GSPMD reshards them inside the
    jitted step as the stencils demand)."""
    names = _axis_names(axis)
    if hasattr(x, "ndim") and x.ndim == 3:
        x_ax = next((a for a in names if a == X_AXIS), None)
        z_names = [a for a in names if a != X_AXIS]
        if len(z_names) > 1:
            raise ValueError(f"at most one z mesh axis, got {z_names}")
        z_ax = z_names[0] if z_names else None
        if mesh is not None:
            if x_ax is not None and x.shape[0] % mesh.shape[x_ax]:
                x_ax = None
            if z_ax is not None and x.shape[2] % mesh.shape[z_ax]:
                z_ax = None
        return P(x_ax, None, z_ax)
    return P()


def state_shardings(state, mesh: Mesh, axis: str = Z_AXIS):
    return jax.tree.map(
        lambda x: NamedSharding(mesh, field_spec(x, axis, mesh)), state)


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
