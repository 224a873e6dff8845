"""Explicit shard_map halo exchange over the z mesh axis.

The default distribution path lets GSPMD insert halo collectives
automatically (sharding.py). This module is the explicit, hand-controlled
equivalent — `lax.ppermute` neighbor exchanges inside `shard_map` — the
TPU-native rebuild of the reference HaloExchange (reference: include/
halo_exchange.hpp:24-76 nonblocking z-ghost exchange, src/cuda_kernels/
halo_pack.cu pack/unpack kernels; here the "pack" is a slice and the
transport is an ICI collective-permute). Useful for kernels that need
manual halo control (e.g. custom Pallas stencils under shard_map) and as
the measurable analogue of the reference's halo micro-benchmarks.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def exchange_z_halos(f: jnp.ndarray, axis_name: str = "z",
                     ng: int = 1) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inside shard_map: return (lo_ghost, hi_ghost) z-slabs of width ng
    from the periodic neighbors (reference HaloExchange::exchange)."""
    n = jax.lax.psum(1, axis_name)
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    # my top slab -> neighbor above => I receive neighbor-below's top slab
    lo_ghost = jax.lax.ppermute(f[..., -ng:], axis_name, fwd)
    hi_ghost = jax.lax.ppermute(f[..., :ng], axis_name, bwd)
    return lo_ghost, hi_ghost


def with_z_halos(f: jnp.ndarray, axis_name: str = "z", ng: int = 1):
    """Concatenate the neighbor ghosts onto the local shard:
    (..., nz_local) -> (..., nz_local + 2 ng)."""
    lo, hi = exchange_z_halos(f, axis_name, ng)
    return jnp.concatenate([lo, f, hi], axis=-1)


def with_axis_halos(f: jnp.ndarray, axis_name: str, ng: int = 1,
                    dim: int = -1):
    """with_z_halos generalized to any spatial dim (the 2-D (x, z) pencil
    mesh exchanges x halos along spatial dim 0 and z halos along dim 2 —
    both ride neighbor links of the 2-D ICI torus)."""
    n = jax.lax.psum(1, axis_name)
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    hi_slab = jax.lax.slice_in_dim(f, f.shape[dim] - ng, f.shape[dim],
                                   axis=dim)
    lo_slab = jax.lax.slice_in_dim(f, 0, ng, axis=dim)
    lo_ghost = jax.lax.ppermute(hi_slab, axis_name, fwd)
    hi_ghost = jax.lax.ppermute(lo_slab, axis_name, bwd)
    return jnp.concatenate([lo_ghost, f, hi_ghost], axis=dim)


def sharded_z_derivative(mesh: Mesh, dz: float, axis_name: str = "z"):
    """Example/benchmark kernel: central d/dz of a z-sharded periodic field
    using explicit ppermute halos (the reference's halo-exchange+stencil
    micro-benchmark, tests/bench_mpi_poisson.cpp-style)."""
    shard_map = jax.shard_map

    spec = P(None, None, axis_name)

    @partial(shard_map, mesh=mesh, in_specs=(spec,), out_specs=spec)
    def ddz(f):
        ext = with_z_halos(f, axis_name)
        return (ext[..., 2:] - ext[..., :-2]) / (2.0 * dz)

    return ddz
