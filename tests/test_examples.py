"""The examples/ tutorial suite stays runnable (reference:
examples/01..13 — validated ready-to-run cases; here 01..14).

Every .cfg must parse + finalize, every run.sh must reference an
existing entry point, and the beginner example (01) must actually
produce its gated physics in a truncated run."""

import glob
import os
import re
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EX = os.path.join(REPO, "examples")
CFGS = sorted(glob.glob(os.path.join(EX, "*", "*.cfg")))


def test_examples_exist():
    dirs = {os.path.basename(d) for d in glob.glob(os.path.join(EX, "*"))
            if os.path.isdir(d)}
    for n in ["01_laminar_channel", "02_turbulent_channel",
              "03_grid_refinement", "04_validation_suite",
              "05_channel_retau180_sst", "06_steady_rans_channel",
              "07_unsteady_developing_channel", "08_duct_flow",
              "09_taylor_green_3d", "10_les_channel", "11_cylinder_flow",
              "12_naca_airfoil", "13_rans_campaign",
              "14_lid_driven_cavity"]:
        assert n in dirs, f"missing example {n}"
    assert len(CFGS) >= 15


@pytest.mark.parametrize("path", CFGS,
                         ids=[os.path.relpath(p, EX) for p in CFGS])
def test_example_cfg_parses(path):
    from cfdnn_tpu import Config
    cfg = Config.from_file(path).finalize()
    assert cfg.Nx >= 4 and cfg.Ny >= 4
    assert cfg.nu > 0 and cfg.dt > 0 and cfg.max_steps > 0


def test_example_runsh_targets_exist():
    """Each run.sh references modules/scripts that exist (catches a
    rename of an app or a validation driver breaking the tutorials)."""
    for sh in sorted(glob.glob(os.path.join(EX, "*", "run.sh"))):
        body = open(sh).read()
        for mod in re.findall(r"-m\s+(cfdnn_tpu\.[\w.]+)", body):
            p = os.path.join(REPO, mod.replace(".", os.sep) + ".py")
            assert os.path.exists(p), f"{sh}: module {mod} missing"
        for rel in re.findall(r"\.\./\.\./((?:scripts|validation)/\S+\.py)",
                              body):
            assert os.path.exists(os.path.join(REPO, rel)), \
                f"{sh}: {rel} missing"


def test_example_01_end_to_end(tmp_path):
    """Truncated example 01: the steady Poiseuille solve converges to
    the analytic profile from the example's own cfg file."""
    import jax
    from cfdnn_tpu import Config, Simulation, init_poiseuille, \
        poiseuille_exact
    cfg = Config.from_file(
        os.path.join(EX, "01_laminar_channel", "poiseuille.cfg"))
    cfg = cfg.parse_args(["--output_dir", str(tmp_path),
                          "--write_fields", "false",
                          "--verbose", "false"]).finalize()
    sim = Simulation(cfg)
    # start near the solution so the truncated run converges fast
    state, diags = sim.solve_steady(
        init_poiseuille(cfg, sim.mesh, fraction=0.999))
    from cfdnn_tpu.ops.operators import f2c_mean
    u = np.asarray(f2c_mean(state.u, 0, sim.geom.axes[0]))
    prof = u.mean(axis=(0, 2))
    exact = poiseuille_exact(cfg, sim.mesh.y.centers)
    rel = np.linalg.norm(prof - exact) / np.linalg.norm(exact)
    assert rel < 5e-4, rel


def test_runsh_are_executable():
    for sh in glob.glob(os.path.join(EX, "*", "run.sh")):
        assert os.access(sh, os.X_OK), f"{sh} not executable"
