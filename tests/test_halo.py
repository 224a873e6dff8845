"""Explicit shard_map halo exchange (reference tests/test_halo_exchange.cpp,
tests/test_mpi_halo_step.cpp) on the 8-virtual-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfdnn_tpu.parallel.halo import sharded_z_derivative
from cfdnn_tpu.parallel.sharding import device_mesh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def test_ppermute_halo_derivative_matches_roll():
    mesh = device_mesh(8)
    Nz = 64
    rng = np.random.default_rng(0)
    f = jnp.asarray(rng.standard_normal((4, 4, Nz)))
    dz = 0.1
    from jax.sharding import NamedSharding, PartitionSpec as P
    f_sh = jax.device_put(f, NamedSharding(mesh, P(None, None, "z")))
    ddz = sharded_z_derivative(mesh, dz)
    got = np.asarray(ddz(f_sh))
    exact = np.asarray((jnp.roll(f, -1, 2) - jnp.roll(f, 1, 2)) / (2 * dz))
    np.testing.assert_allclose(got, exact, rtol=0, atol=1e-13)


def test_safe_divide_bounded_ratio():
    from cfdnn_tpu.utils.numerics import bounded_ratio, safe_divide
    assert float(safe_divide(1.0, 0.0)) == pytest.approx(1e20)
    assert float(safe_divide(1.0, -0.0)) == pytest.approx(1e20)
    assert float(safe_divide(-1.0, 1e-30)) == pytest.approx(-1e20)
    assert float(bounded_ratio(1.0, 1e-30)) == 1e6
    assert float(bounded_ratio(3.0, 2.0)) == pytest.approx(1.5)
