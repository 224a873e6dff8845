"""App smoke tests + VTK round-trip.

Mirrors the reference's app-level integration coverage (reference:
tests/test_channel_integration-style runs of app mains on tiny grids) and
VTK writer sanity.
"""

import os

import numpy as np

from cfdnn_tpu.apps import (airfoil, cavity, channel, cylinder, duct, hills,
                            step, taylor_green_3d)
from cfdnn_tpu.io.vtk import read_vtk_scalars, write_vtk


COMMON = ["--max_steps", "30", "--output_freq", "10",
          "--num_snapshots", "0", "--verbose", "false"]


def _tiny(*extra):
    return COMMON + list(extra)


def test_channel_app(tmp_path):
    sim, state, diags = channel.main(_tiny(
        "--Nx", "16", "--Ny", "32", "--tol", "0",
        "--output_dir", str(tmp_path) + "/"))
    assert np.isfinite(float(diags.ke))
    assert os.path.exists(tmp_path / "channel_final.vtk")


def test_tgv_app(tmp_path):
    sim, state, diags = taylor_green_3d.main(_tiny(
        "--Nx", "16", "--Ny", "16", "--Nz", "16",
        "--write_fields", "false", "--output_dir", str(tmp_path) + "/"))
    assert np.isfinite(float(diags.ke))
    assert float(diags.ke) < 0.25  # decaying from KE0 = 1/8 V0^2 ... sanity


def test_cylinder_app(tmp_path):
    sim, state, diags = cylinder.main(_tiny(
        "--Nx", "32", "--Ny", "32", "--write_fields", "false",
        "--output_dir", str(tmp_path) + "/"))
    assert np.isfinite(float(diags.fx))


def test_cavity_app(tmp_path):
    """30-step smoke: the moving-lid steady app runs, stays finite, and
    keeps the projection at machine precision on the all-wall domain."""
    sim, state, diags = cavity.main(_tiny(
        "--Nx", "24", "--Ny", "24", "--tol", "0",
        "--write_fields", "false", "--output_dir", str(tmp_path) + "/"))
    assert np.isfinite(float(diags.ke))
    assert float(diags.ke) > 0.0        # the lid stirs from a rest start
    assert float(diags.div_linf) < 1e-10


def test_duct_app(tmp_path):
    sim, state, diags = duct.main(_tiny(
        "--Nx", "8", "--Ny", "16", "--Nz", "16", "--tol", "0",
        "--write_fields", "false", "--output_dir", str(tmp_path) + "/"))
    assert np.isfinite(float(diags.ke))


def test_airfoil_step_hills_apps(tmp_path):
    for mod, name in ((airfoil, "airfoil"), (step, "step"), (hills, "hills")):
        sim, state, diags = mod.main(_tiny(
            "--Nx", "32", "--Ny", "16", "--write_fields", "false",
            "--output_dir", str(tmp_path) + "/"))
        assert np.isfinite(float(diags.ke)), name


def test_vtk_roundtrip_3d_binary(tmp_path):
    from cfdnn_tpu import BCType, Config, Simulation, init_taylor_green
    cfg = Config(Nx=8, Ny=8, Nz=8, bc_y=BCType.PERIODIC,
                 y_min=0.0, y_max=2 * np.pi, z_min=0.0, z_max=2 * np.pi,
                 nu=1e-3, nu_specified=True, dp_dx=0.0, dp_dx_specified=True,
                 dtype="float64")
    sim = Simulation(cfg)
    state = init_taylor_green(cfg, sim.mesh)
    path = str(tmp_path / "out.vtk")
    write_vtk(path, state, sim.mesh, sim.geom, cfg)
    data = read_vtk_scalars(path)
    assert "velocity" in data and "pressure" in data
    assert data["velocity"].shape == (8 * 8 * 8, 3)
    assert np.all(np.isfinite(data["velocity"]))
    # pressure round-trips exactly (binary doubles)
    p = np.asarray(state.p)
    p_rt = data["pressure"].reshape(8, 8, 8).transpose(2, 1, 0)
    np.testing.assert_allclose(p_rt, p, rtol=0, atol=0)


def test_vtk_ascii_2d(tmp_path):
    from cfdnn_tpu import Config, Simulation, init_poiseuille
    cfg = Config(Nx=8, Ny=8, Nz=1, nu=1e-3, nu_specified=True,
                 dp_dx=-1e-3, dp_dx_specified=True, dtype="float64")
    sim = Simulation(cfg)
    state = init_poiseuille(cfg, sim.mesh, fraction=1.0)
    path = str(tmp_path / "out2d.vtk")
    write_vtk(path, state, sim.mesh, sim.geom, cfg)
    with open(path) as fh:
        head = fh.read(200)
    assert "ASCII" in head
    data = read_vtk_scalars(path)
    assert np.all(np.isfinite(data["pressure"]))


def test_app_checkpoint_resume(tmp_path):
    """--checkpoint_dir/--checkpoint_interval save during a run and
    --resume continues from the latest checkpoint (exceeds the reference,
    which has no restart path — SURVEY 5.4)."""
    ck = str(tmp_path / "ck")
    args = ["--Nx", "12", "--Ny", "16", "--Nz", "4", "--max_steps", "6",
            "--adaptive_dt", "false", "--dt", "1e-3",
            "--write_fields", "false", "--verbose", "false",
            "--checkpoint_dir", ck, "--checkpoint_interval", "3"]
    sim, st1, _ = channel.main(args)
    assert int(st1.step) == 6
    import os
    assert any(x.startswith("ckpt_") for x in os.listdir(ck))
    sim, st2, _ = channel.main(args + ["--resume", "true"])
    # resumed from step 6 and ran 6 more
    assert int(st2.step) == 12
    assert float(st2.t) > float(st1.t)


def test_cylinder_external_mode(tmp_path):
    """--external switches the cylinder app to the hardened inflow/outflow
    external-flow configuration (pinned inlet + outlet flux correction)."""
    sim, state, diags = cylinder.main(
        ["--external", "--Nx", "64", "--Ny", "48", "--max_steps", "20",
         "--output_freq", "10", "--num_snapshots", "0",
         "--write_fields", "false", "--postprocess", "false",
         "--output_dir", str(tmp_path)])
    assert sim.cfg.bc_x.value == "inflow"
    assert getattr(sim, "_inflow_u", None) is not None
    assert np.isfinite(float(diags.ke))


def test_vtk_stretched_z_sidecar(tmp_path):
    """Stretched-z meshes must write mean spacing + a .zcoords.txt sidecar
    (regression: z spacing was the smallest wall-adjacent cell, silently
    shrinking the VTK z extent ~3x with no way to recover coordinates)."""
    from cfdnn_tpu import BCType, Config, Simulation, zero_state
    cfg = Config(Nx=8, Ny=8, Nz=16, bc_z=BCType.WALL, stretch_z=True,
                 z_min=0.0, z_max=1.0, nu=1e-3, nu_specified=True,
                 dp_dx=-1e-3, dp_dx_specified=True, dtype="float64")
    sim = Simulation(cfg)
    path = str(tmp_path / "duct.vtk")
    write_vtk(path, zero_state(cfg), sim.mesh, sim.geom, cfg)
    zc = np.loadtxt(path + ".zcoords.txt")
    np.testing.assert_allclose(zc, sim.mesh.z.centers)
    with open(path, "rb") as fh:
        head = fh.read(300).decode(errors="replace")
    dz = float(head.split("SPACING")[1].split("\n")[0].split()[2])
    # mean spacing reconstructs the true extent: Nz * dz == Lz
    assert abs(16 * dz - 1.0) < 1e-12


def test_vtk_unit_axis_with_wall_faces(tmp_path):
    """Nz=1 with bc_z=WALL stores 2 boundary w-faces; snapshotting must
    average them to the cell center, not crash broadcasting (Nx,Ny,2)->
    (Nx,Ny,1). Twin helper cell_center_velocity shares the fix."""
    from cfdnn_tpu import BCType, Config, Simulation, zero_state
    cfg = Config(Nx=8, Ny=8, Nz=1, bc_z=BCType.WALL, nu=1e-3,
                 nu_specified=True, dp_dx=-1e-3, dp_dx_specified=True,
                 dtype="float64")
    sim = Simulation(cfg)
    st = zero_state(cfg)
    st = st.replace(w=st.w.at[:, :, 0].set(1.0).at[:, :, 1].set(3.0))
    path = str(tmp_path / "quasi2d.vtk")
    write_vtk(path, st, sim.mesh, sim.geom, cfg)
    data = read_vtk_scalars(path)
    np.testing.assert_allclose(data["velocity"][:, 2], 2.0)
