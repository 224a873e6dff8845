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


def test_backward_step_reattachment_armaly(record_qoi):
    """Backward-facing step, Re_D = 100 (Armaly et al. 1983 convention:
    bulk inlet velocity, hydraulic diameter D = 2 h_in, expansion ratio
    2): laminar reattachment length x_r/S ~ 2.9-3.1 (experiment ~3.0;
    2-D simulations 2.85-3.0). Gate: [2.5, 3.4] — the 216x32 IBM grid
    measures 2.81, converging to 2.85 at 324x48.
    Reference parity: app/main_step.cpp (which gates nothing)."""
    from cfdnn_tpu.apps import step
    sim, state, diags = step.main(["--backward", "--max_steps", "4000",
                                   "--verbose", "0"])
    xr = step.reattachment_length(sim, state)
    record_qoi("step_reattach_xr_re100", xr)
    assert 2.5 < xr < 3.4, f"BFS reattachment x_r/S = {xr}"


def test_periodic_hills_separation_structure(record_qoi):
    """Periodic hills (Breuer et al. 2009 geometry) in the low-Re steady
    regime: the lee-side recirculation bubble must exist, separate on the
    descending flank past the crest, and reattach in the valley ahead of
    the next hill — the structure Breuer et al. document for Re ~ O(100)
    (a band gate; the benchmark's digitized curves are Re >= 700)."""
    from cfdnn_tpu.apps import hills
    sim, state, diags = hills.main(["--max_steps", "8000",
                                    "--dp_dx", "-1.5e-3", "--verbose", "0"])
    x_sep, x_r, u_min = hills.separation_points(sim, state)
    record_qoi("hills_x_sep_lowre", x_sep)
    record_qoi("hills_x_reattach_lowre", x_r)
    assert u_min < -0.05, f"no recirculation bubble (u_min={u_min})"
    assert 0.2 < x_sep < 2.5, f"separation off the lee flank: {x_sep}"
    # primary-bubble reattachment (the old idx[-1] estimator stretched
    # to a windward-foot secondary pocket at ~7.8; the contiguous-bubble
    # measure lands at ~3.8 at this low Re)
    assert 3.0 < x_r < 9.0, f"reattachment out of the valley: {x_r}"


def test_naca_symmetry_and_lift_slope(record_qoi):
    """NACA0012: (a) zero lift at zero incidence (reference
    tests/test_ibm_naca_symmetry.cpp gate |Cl| < 0.05), (b) positive
    lift slope — +8 deg incidence must produce significantly positive
    Cl with the aerodynamic sign convention (nose-up = positive)."""
    import numpy as np

    from cfdnn_tpu.apps import airfoil
    from cfdnn_tpu.apps.airfoil import CHORD

    results = {}
    for aoa in (0.0, 8.0):
        sim, state, diags = airfoil.main(
            ["--max_steps", "3000", "--verbose", "0",
             "--aoa_deg", str(aoa)])
        u_ref = abs(float(np.asarray(state.u).mean()))
        denom = 0.5 * u_ref ** 2 * CHORD
        results[aoa] = (float(diags.fx) / denom, float(diags.fy) / denom)

    cl0 = results[0.0][1]
    cl8 = results[8.0][1]
    record_qoi("airfoil_cl_aoa0", cl0)
    record_qoi("airfoil_cl_aoa8", cl8)
    assert abs(cl0) < 0.05, f"symmetric foil lift |Cl| = {abs(cl0)}"
    assert cl8 > 0.1, f"positive incidence must lift: Cl(8deg) = {cl8}"
    assert cl8 > cl0 + 0.1


def test_ibm_force_integrator_invariance():
    """The reported drag must not depend on the time integrator: each
    RK stage's applied IBM impulse reaches the final state through the
    SSP convex blends, so force accumulation weights every impulse by
    its downstream blend product (stage weights sum to 1). The
    unweighted sum over-reported RK3 drag 2.15x (Cd 4.89 vs 2.28 on the
    Re=20 cylinder before the fix)."""
    from cfdnn_tpu.config import TimeIntegrator

    U_inf, D, Re = 1.0, 1.0, 20.0
    cds = {}
    for integ in (TimeIntegrator.EULER, TimeIntegrator.RK2,
                  TimeIntegrator.RK3):
        cfg = Config(
            Nx=64, Ny=48, Nz=1,
            x_min=0.0, x_max=16.0, y_min=-6.0, y_max=6.0,
            bc_x=BCType.PERIODIC, bc_y=BCType.PERIODIC,
            nu=U_inf * D / Re, nu_specified=True,
            dp_dx=0.0, dp_dx_specified=True,
            dt=5e-3, adaptive_dt=False, dtype="float64",
            time_integrator=integ,
        )
        sim = Simulation(cfg)
        sim.set_ibm_forcing(CylinderBody(4.0, 0.0, 0.5 * D))
        state = sim.initial_state()
        state = state.replace(u=jnp.full_like(state.u, U_inf))
        state, d = sim.run(state, 700)
        samples = []
        for _ in range(30):
            state, d = sim.step(state)
            samples.append(float(d.fx))
        assert np.isfinite(float(d.ke))
        cds[integ.value] = float(np.mean(samples)) / (0.5 * U_inf**2 * D)
    base = cds["euler"]
    for name, cd in cds.items():
        assert abs(cd - base) < 0.05 * abs(base), cds
