"""IBM physics validation: cylinder drag at Re=20.

Mirrors the reference gate (reference: tests/test_ibm_cylinder_drag.cpp —
fully periodic 20x16 domain, D=1 cylinder at (5,0), uniform U=1 IC,
Cd averaged over the tail, gate 1.0 <= Cd <= 3.5 around the published
~2.05). Scaled to a CI-friendly grid; the full-resolution run lives in
benchmarks/bench_suite.py-style scripts.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from cfdnn_tpu import BCType, Config, Simulation
from cfdnn_tpu.ibm import CylinderBody


@pytest.mark.slow
def test_cylinder_drag_re20(record_qoi):
    U_inf, D, Re = 1.0, 1.0, 20.0
    nu = U_inf * D / Re
    cfg = Config(
        Nx=96, Ny=64, Nz=1,
        x_min=0.0, x_max=20.0, y_min=-8.0, y_max=8.0,
        bc_x=BCType.PERIODIC, bc_y=BCType.PERIODIC,
        nu=nu, nu_specified=True, dp_dx=0.0, dp_dx_specified=True,
        dt=5e-3, adaptive_dt=False, dtype="float64",
    )
    sim = Simulation(cfg)
    sim.set_ibm_forcing(CylinderBody(5.0, 0.0, 0.5 * D))
    assert sim.ibm.n_forcing > 0 and sim.ibm.n_solid > 0

    state = sim.initial_state()
    state = state.replace(u=jnp.full_like(state.u, U_inf))

    n_steps, avg_start = 2200, 1600
    q_A = 0.5 * U_inf**2 * D
    cds, cls = [], []
    for it in range(n_steps):
        state, d = sim.step(state)
        if it >= avg_start:
            cds.append(float(d.fx) / q_A)
            cls.append(float(d.fy) / q_A)
    assert np.isfinite(float(d.ke)), "blow-up"
    cd = float(np.mean(cds))
    cl = float(np.mean(cls))
    record_qoi("ibm_cylinder_cd_re20", cd)
    record_qoi("ibm_cylinder_cl_re20", abs(cl))
    # reference gate [1.0, 3.5] around the published Cd ~ 2.05 (with this
    # blockage and 4.8 cells/radius the band is generous by design)
    assert 1.0 < cd < 3.5, f"Cd = {cd} outside the Re=20 gate"
    assert abs(cl) < 0.3 * cd, f"Cl = {cl} should vanish at Re=20"


@pytest.mark.slow
def test_cylinder_strouhal_re100(record_qoi):
    """Vortex-shedding frequency at Re=100 (reference:
    tests/test_ibm_strouhal.cpp — St_ref 0.165, gate [0.13, 0.20] from Cl
    zero crossings after a discarded transient)."""
    U_inf, D, Re = 1.0, 1.0, 100.0
    cfg = Config(
        Nx=96, Ny=64, Nz=1,
        x_min=0.0, x_max=20.0, y_min=-8.0, y_max=8.0,
        bc_x=BCType.PERIODIC, bc_y=BCType.PERIODIC,
        nu=U_inf * D / Re, nu_specified=True, dp_dx=0.0,
        dp_dx_specified=True, dt=5e-3, adaptive_dt=False, dtype="float64",
    )
    sim = Simulation(cfg)
    sim.set_ibm_forcing(CylinderBody(5.0, 0.0, 0.5 * D))
    state = sim.initial_state()
    # tiny asymmetric seed to break the (machine-exact) symmetry and
    # trigger shedding promptly
    yc = jnp.asarray(sim.mesh.y.centers)[None, :, None]
    v0 = 1e-2 * jnp.exp(-((yc - 0.0) ** 2)) * jnp.sin(
        jnp.asarray(sim.mesh.x.centers)[:, None, None])
    state = state.replace(u=jnp.full_like(state.u, U_inf),
                          v=jnp.broadcast_to(v0, state.v.shape)
                          .astype(state.v.dtype))

    n_trans, n_anal, every = 2000, 6000, 10
    for _ in range(n_trans):
        state, d = sim.step(state)
    assert np.isfinite(float(d.ke)), "blow-up in transient"

    t, cl = [], []
    q_A = 0.5 * U_inf**2 * D
    for it in range(n_anal):
        state, d = sim.step(state)
        if (it + 1) % every == 0:
            t.append(float(state.t))
            cl.append(float(d.fy) / q_A)
    cl = np.asarray(cl) - np.mean(cl)
    t = np.asarray(t)
    up = np.where((cl[:-1] < 0) & (cl[1:] >= 0))[0]
    assert len(up) >= 3, f"too few shedding periods detected ({len(up)})"
    period = (t[up[-1]] - t[up[0]]) / (len(up) - 1)
    st = D / (period * U_inf)
    record_qoi("ibm_cylinder_strouhal_re100", st)
    assert 0.13 <= st <= 0.20, f"St = {st} outside the reference gate"


@pytest.mark.slow
def test_sphere_drag_re50(record_qoi):
    """Sphere drag at Re=50 (reference tests/test_ibm_sphere_drag.cpp):
    published Cd ~ 1.57 (Clift-Grace-Weber correlation gives 1.57); a
    generous band on a CI-sized grid with blockage."""
    from cfdnn_tpu.ibm import SphereBody
    U_inf, D, Re = 1.0, 1.0, 50.0
    nu = U_inf * D / Re
    cfg = Config(
        Nx=72, Ny=48, Nz=48,
        x_min=0.0, x_max=12.0, y_min=-4.0, y_max=4.0,
        z_min=-4.0, z_max=4.0,
        bc_x=BCType.PERIODIC, bc_y=BCType.PERIODIC, bc_z=BCType.PERIODIC,
        nu=nu, nu_specified=True, dp_dx=0.0, dp_dx_specified=True,
        dt=5e-3, adaptive_dt=False, dtype="float32",
    )
    sim = Simulation(cfg)
    sim.set_ibm_forcing(SphereBody(3.0, 0.0, 0.0, 0.5 * D))
    assert sim.ibm.n_forcing > 0 and sim.ibm.n_solid > 0

    state = sim.initial_state()
    state = state.replace(u=jnp.full_like(state.u, U_inf))

    n_steps, avg_start = 1200, 800
    q_A = 0.5 * U_inf**2 * (np.pi * (0.5 * D) ** 2)
    cds = []
    for it in range(n_steps):
        state, d = sim.step(state)
        if it >= avg_start:
            cds.append(float(d.fx) / q_A)
    assert np.isfinite(float(d.ke)), "blow-up"
    cd = float(np.mean(cds))
    record_qoi("ibm_sphere_cd_re50", cd)
    # published ~1.57; wide band for the coarse grid + periodic blockage
    assert 0.8 < cd < 3.0, f"Cd = {cd} outside the Re=50 sphere gate"
