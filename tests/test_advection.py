"""Solid-body-rotation advection gates (reference:
tests/test_advection_rotation.cpp).

A Gaussian tracer blob is carried one full revolution by a frozen
solid-body-rotation velocity field (u = -Omega (y-y_c), v = +Omega
(x-x_c)), which is *discretely* divergence-free on the MAC grid (du/dx
and dv/dy vanish identically), so the advective and skew forms both
apply. The tracer rides the w momentum slot: in a z-independent Nz=1
periodic domain every z-derivative vanishes, so conv_w reduces exactly
to u dw/dx + v dw/dy — the passive-scalar advection the reference test
exercises with a dedicated tracer loop.

Reference gates (test_advection_rotation.cpp:264-267): centroid returns
to within 2 dx after one period; relL2 < 1.0 for 1st-order upwind (its
only scheme). Here all four convective schemes run through the real
`ops.convective` dispatch, with the additional ordering gate that the
higher-order schemes beat 1st-order upwind's diffusion.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfdnn_tpu import BCType, Config, ConvectiveScheme, Mesh
from cfdnn_tpu.fields import velocity_shapes
from cfdnn_tpu.ops import operators as ops
from cfdnn_tpu.ops.grid import Geometry

N = 64
LX = LY = 2.0
OMEGA = 1.0
SIGMA = 0.1
BLOB_C = (LX / 2.0 + 0.25, LY / 2.0)


def _setup():
    cfg = Config(Nx=N, Ny=N, Nz=1, x_min=0.0, x_max=LX,
                 y_min=0.0, y_max=LY,
                 bc_x=BCType.PERIODIC, bc_y=BCType.PERIODIC,
                 nu=1e-3, nu_specified=True, dp_dx=0.0,
                 dp_dx_specified=True, dtype="float64").finalize()
    mesh = Mesh.from_config(cfg)
    geom = Geometry.make(mesh, cfg)
    return cfg, mesh, geom


def _rotation_comps(cfg, mesh):
    """Frozen (u, v) on their staggered DOFs + Gaussian blob in w."""
    su, sv, sw = velocity_shapes(cfg)
    xc_u, yc_u = LX / 2.0, LY / 2.0
    yc = mesh.y.centers
    xc = mesh.x.centers
    # u lives at (x-faces, y-centers) and depends only on y; v lives at
    # (x-centers, y-faces) and depends only on x — both broadcasts are
    # exact on their own DOFs.
    u = np.broadcast_to((-OMEGA * (yc - yc_u))[None, :, None], su)
    v = np.broadcast_to((OMEGA * (xc - xc_u))[:, None, None], sv)
    X, Y = np.meshgrid(xc, yc, indexing="ij")
    blob = np.exp(-((X - BLOB_C[0]) ** 2 + (Y - BLOB_C[1]) ** 2)
                  / SIGMA ** 2)
    w = np.broadcast_to(blob[:, :, None], sw)
    return (jnp.asarray(np.ascontiguousarray(u)),
            jnp.asarray(np.ascontiguousarray(v)),
            jnp.asarray(np.ascontiguousarray(w)))


def _advect_one_period(scheme):
    cfg, mesh, geom = _setup()
    u, v, w0 = _rotation_comps(cfg, mesh)
    T = 2.0 * np.pi / OMEGA
    dx = LX / N
    u_max = OMEGA * LX / 2.0
    dt = 0.3 * dx / u_max
    nsteps = int(np.ceil(T / dt))
    dt = T / nsteps

    def rhs(w):
        return -ops.convective((u, v, w), geom, scheme)[2]

    @jax.jit
    def run(w):
        def body(w, _):
            # SSP-RK3 (central advection is neutrally stable, so forward
            # Euler would amplify; the reference's upwind-only loop can
            # afford FE, a scheme-generic gate cannot)
            w1 = w + dt * rhs(w)
            w2 = 0.75 * w + 0.25 * (w1 + dt * rhs(w1))
            return w / 3.0 + 2.0 / 3.0 * (w2 + dt * rhs(w2)), None
        return jax.lax.scan(body, w, None, length=nsteps)[0]

    wT = np.asarray(run(w0))
    w0 = np.asarray(w0)

    relL2 = np.sqrt(((wT - w0) ** 2).sum() / (w0 ** 2).sum())
    xc, yc = mesh.x.centers, mesh.y.centers
    X, Y = np.meshgrid(xc, yc, indexing="ij")

    def centroid(c):
        c = np.maximum(c[:, :, 0], 0.0)
        m = c.sum() + 1e-30
        return (c * X).sum() / m, (c * Y).sum() / m

    c0, cT = centroid(w0), centroid(wT)
    cent_dx = np.hypot(cT[0] - c0[0], cT[1] - c0[1]) / dx
    mass_drift = abs(wT.sum() - w0.sum()) / abs(w0.sum())
    return relL2, cent_dx, mass_drift


@pytest.fixture(scope="module")
def results():
    return {s: _advect_one_period(s)
            for s in (ConvectiveScheme.UPWIND, ConvectiveScheme.UPWIND2,
                      ConvectiveScheme.CENTRAL, ConvectiveScheme.SKEW)}


def test_centroid_returns(results, record_qoi):
    """Blob centroid back within 2 dx after one full revolution — the
    direction/speed gate (reference test_advection_rotation.cpp:267).
    The dissipative schemes hold it to <0.1 dx; the dispersive pair
    (central/skew) rings, and the centroid metric clips the negative
    lobes (as the reference's does), biasing it — gate those at 4 dx."""
    for scheme in (ConvectiveScheme.UPWIND, ConvectiveScheme.UPWIND2):
        assert results[scheme][1] < 2.0, (scheme, results[scheme][1])
    for scheme in (ConvectiveScheme.CENTRAL, ConvectiveScheme.SKEW):
        assert results[scheme][1] < 4.0, (scheme, results[scheme][1])
    record_qoi("advection_rotation_centroid_dx",
               results[ConvectiveScheme.UPWIND][1])


def test_upwind_diffusion_bounded(results, record_qoi):
    """1st-order upwind: shape heavily diffused but bounded (reference
    gate relL2 < 1.0)."""
    relL2 = results[ConvectiveScheme.UPWIND][0]
    assert relL2 < 1.0
    record_qoi("advection_rotation_upwind_relL2", relL2)


def test_higher_order_schemes_beat_upwind(results, record_qoi):
    """upwind2/central/skew all resolve the revolved blob far better
    than 1st-order upwind (ordering gate beyond the reference, which
    only runs upwind)."""
    up = results[ConvectiveScheme.UPWIND][0]
    assert results[ConvectiveScheme.UPWIND2][0] < 0.7 * up
    for scheme in (ConvectiveScheme.CENTRAL, ConvectiveScheme.SKEW):
        assert results[scheme][0] < 0.8 * up, (scheme, up)
    record_qoi("advection_rotation_central_relL2",
               results[ConvectiveScheme.CENTRAL][0])


def test_mass_conservation_all_schemes(results):
    """Total tracer mass conserved to roundoff over the revolution.
    The skew form telescopes unconditionally; the advective forms
    conserve here because the advecting field is discretely div-free,
    so advective and divergence forms differ by w*div(u) == 0."""
    for scheme, (_, _, drift) in results.items():
        assert drift < 1e-12, (scheme, drift)


def test_central_equals_skew_for_divfree_advection():
    """Structural identity: for a discretely divergence-free advecting
    field, the advective (central) and skew forms of conv_w coincide to
    roundoff — the discrete analogue of u.grad(w) == div(u w) when
    div(u)=0. Catches any asymmetry bug between the two code paths."""
    cfg, mesh, geom = _setup()
    u, v, w = _rotation_comps(cfg, mesh)
    c_adv = np.asarray(
        ops.convective((u, v, w), geom, ConvectiveScheme.CENTRAL)[2])
    c_skw = np.asarray(
        ops.convective((u, v, w), geom, ConvectiveScheme.SKEW)[2])
    scale = np.abs(c_adv).max() + 1e-30
    assert np.abs(c_adv - c_skw).max() / scale < 1e-12
