"""Native (C) VTK encoder tests: bit-parity with the NumPy path and
graceful fallback (reference writes VTK from C++, src/solver_vtk.cpp;
this is the TPU build's native IO equivalent)."""

import numpy as np
import pytest

from cfdnn_tpu.native import load_vtkio


@pytest.fixture(scope="module")
def vtkio():
    m = load_vtkio()
    if m is None:
        pytest.skip("no C compiler available; NumPy fallback covers IO")
    return m


def _numpy_scalar(a):
    return np.ascontiguousarray(np.transpose(a, (2, 1, 0))).astype(">f8") \
        .tobytes()


def test_scalar_bit_parity(vtkio):
    rng = np.random.default_rng(3)
    a = rng.standard_normal((20, 12, 8))
    assert vtkio.encode_scalar(a, 20, 12, 8) == _numpy_scalar(a)


def test_vector_bit_parity(vtkio):
    rng = np.random.default_rng(4)
    u, v, w = (rng.standard_normal((10, 6, 4)) for _ in range(3))
    co = lambda x: np.ascontiguousarray(np.transpose(x, (2, 1, 0)))
    ref = np.stack([co(u), co(v), co(w)], axis=-1).astype(">f8").tobytes()
    assert vtkio.encode_vectors(u, v, w, 10, 6, 4) == ref


def test_wrong_size_raises(vtkio):
    a = np.zeros((4, 4, 4))
    with pytest.raises(ValueError):
        vtkio.encode_scalar(a, 4, 4, 5)


def test_write_vtk_native_matches_reader(tmp_path):
    """write_vtk (which uses the native encoder when present) must stay
    readable by the round-trip reader used across the suite."""
    import jax.numpy as jnp

    from cfdnn_tpu import Config, Simulation, perturbed_channel
    from cfdnn_tpu.io.vtk import read_vtk_scalars, write_vtk

    cfg = Config(Nx=12, Ny=16, Nz=8, nu=0.01, nu_specified=True,
                 dp_dx=-1e-3, dp_dx_specified=True, dtype="float32")
    sim = Simulation(cfg)
    st = perturbed_channel(cfg, sim.mesh, amp=0.01)
    path = str(tmp_path / "snap.vtk")
    write_vtk(path, st, sim.mesh, sim.geom, cfg)
    fields = read_vtk_scalars(path)
    assert fields["velocity"].shape == (12 * 16 * 8, 3)
    p = np.asarray(st.p)
    got = fields["pressure"].reshape(8, 16, 12).transpose(2, 1, 0)
    np.testing.assert_allclose(got, p, rtol=0, atol=1e-7)
