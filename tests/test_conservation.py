"""Energy-conservation and invariance tests.

Models the reference's test_skew_energy_conservation.cpp /
test_conservation_audit.cpp / test_galilean_invariance.cpp gates.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cfdnn_tpu import BCType, Config, ConvectiveScheme, Mesh
from cfdnn_tpu.fields import velocity_shapes
from cfdnn_tpu.ops import operators as ops
from cfdnn_tpu.ops.bc import apply_velocity_bc
from cfdnn_tpu.ops.grid import Geometry


def _setup(**kw):
    kw.setdefault("dtype", "float64")
    cfg = Config(**kw).finalize()
    mesh = Mesh.from_config(cfg)
    geom = Geometry.make(mesh, cfg)
    return cfg, mesh, geom


def _cv_volumes(cfg, mesh, geom):
    """Control-volume weights for each velocity component's DOFs."""
    vols = []
    axes = (mesh.x, mesh.y, mesh.z)
    bcs = (cfg.bc_x, cfg.bc_y, cfg.bc_z)
    for s in range(3):
        w = np.ones((1, 1, 1))
        for a in range(3):
            ax = axes[a]
            if a == s:
                dc = ax.dc.copy()
                if bcs[a] == BCType.PERIODIC:
                    wrap = (ax.centers[0] - ax.faces[0]) + (
                        ax.faces[-1] - ax.centers[-1])
                    dc = dc[:-1].copy()
                    dc[0] = wrap
                arr = dc
            else:
                arr = ax.d
            shape = [1, 1, 1]
            shape[a] = arr.shape[0]
            w = w * arr.reshape(shape)
        vols.append(w)
    return vols


class TestSkewEnergyConservation:
    @pytest.mark.parametrize("stretch", [False, True])
    @pytest.mark.parametrize("bc_y", [BCType.PERIODIC, BCType.WALL])
    def test_skew_does_no_work(self, bc_y, stretch):
        """sum_s sum_cells V * phi_s * conv_s == 0 to roundoff for arbitrary
        fields — exact discrete energy conservation of the skew operator."""
        if bc_y == BCType.PERIODIC and stretch:
            pytest.skip("stretched periodic not used")
        cfg, mesh, geom = _setup(Nx=12, Ny=16, Nz=8, bc_y=bc_y,
                                 stretch_y=stretch)
        rng = np.random.default_rng(7)
        shapes = velocity_shapes(cfg)
        comps = tuple(jnp.asarray(rng.standard_normal(s)) for s in shapes)
        comps = apply_velocity_bc(*comps, geom)
        conv = ops.convective(comps, geom, ConvectiveScheme.SKEW)
        vols = _cv_volumes(cfg, mesh, geom)
        total = 0.0
        scale = 0.0
        for s in range(3):
            work = np.asarray(comps[s]) * np.asarray(conv[s]) * vols[s]
            if bc_y == BCType.WALL and s == 1:
                work = work[:, 1:-1, :]   # boundary faces are fixed BCs
            total += work.sum()
            scale += np.abs(work).sum()
        assert abs(total) / max(scale, 1e-30) < 1e-13

    def test_central_vs_skew_consistency(self):
        """Both schemes approximate the same PDE: agree to O(h^2) on a
        smooth solenoidal field."""
        errs = []
        for N in (16, 32):
            cfg, mesh, geom = _setup(
                Nx=N, Ny=N, Nz=1, bc_y=BCType.PERIODIC,
                y_min=0.0, y_max=2 * np.pi)
            xf, xc = mesh.x.faces[:N], mesh.x.centers
            yc, yf = mesh.y.centers, mesh.y.faces[:N]
            u = jnp.asarray((np.sin(xf)[:, None] * np.cos(yc)[None, :])[..., None])
            v = jnp.asarray((-np.cos(xc)[:, None] * np.sin(yf)[None, :])[..., None])
            w = jnp.zeros((N, N, 1))
            c1 = ops.convective((u, v, w), geom, ConvectiveScheme.CENTRAL)
            c2 = ops.convective((u, v, w), geom, ConvectiveScheme.SKEW)
            errs.append(float(jnp.max(jnp.abs(c1[0] - c2[0]))))
        assert errs[1] < errs[0] * 0.3  # ~2nd-order shrink


class TestGalileanInvariance:
    def test_constant_offset_invariance(self):
        """Adding a uniform velocity changes convection only through the
        exact transport term (reference test_galilean_invariance.cpp):
        conv(u+U) - conv(u) == U . grad(u) discretely for central scheme."""
        cfg, mesh, geom = _setup(Nx=16, Ny=16, Nz=8, bc_y=BCType.PERIODIC,
                                 y_min=0.0, y_max=2 * np.pi, z_max=2 * np.pi)
        rng = np.random.default_rng(3)
        shapes = velocity_shapes(cfg)
        comps = tuple(jnp.asarray(rng.standard_normal(s)) for s in shapes)
        U0 = 1.37
        shifted = (comps[0] + U0, comps[1], comps[2])
        c0 = ops.convective(comps, geom, ConvectiveScheme.CENTRAL)
        c1 = ops.convective(shifted, geom, ConvectiveScheme.CENTRAL)
        # difference must equal U0 * d(phi)/dx for each component
        for s in range(3):
            dphidx = (ops.ff_central(comps[s], 0, geom.x) if s == 0
                      else ops.cc_central(comps[s], 0, geom.x))
            diff = np.asarray(c1[s] - c0[s]) - U0 * np.asarray(dphidx)
            assert np.max(np.abs(diff)) < 1e-12
