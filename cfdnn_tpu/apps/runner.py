"""Shared CLI driver machinery for the case apps.

TPU-native rebuild of the reference app layer (reference: app/main_channel.cpp
:267-637 and siblings — config parse, mesh/solver construction, steady/
unsteady loop with console diagnostics, snapshot VTK output, final
validation). Each case module supplies a default Config, an IC builder and
optional IBM body / validation hook, and calls `run_case`.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
from typing import Callable, Optional

from ..config import Config, SimulationMode
from ..io.vtk import write_profiles, write_vtk
from ..solver import Simulation


def run_case(name: str, cfg: Config, argv=None,
             ic: Optional[Callable] = None,
             body=None,
             validate: Optional[Callable] = None,
             callback: Optional[Callable] = None):
    """Parse CLI overrides, run to steady state or for max_steps, write
    outputs, return (sim, state, diags)."""
    argv = sys.argv[1:] if argv is None else argv
    cfg = cfg.parse_args(argv).finalize()
    if cfg.platform:
        import jax
        # jax.config.update neither raises nor takes effect once the
        # backend is initialized, so verify by LOOKING at the device —
        # a silent mismatch would run f64 physics on TPU emulation.
        try:
            jax.config.update("jax_platforms", cfg.platform)
        except Exception:
            pass
        actual = jax.devices()[0].platform.lower()
        want = cfg.platform.lower()
        if actual != want and not (want == "tpu" and actual == "axon"):
            print(f"[{name}] WARNING: requested platform={cfg.platform} "
                  f"but running on {actual} (JAX backend was already "
                  f"initialized in this process)")
    sim = Simulation(cfg)
    if body is not None:
        sim.set_ibm_forcing(body(cfg, sim.mesh) if callable(body) else body)
    state = ic(cfg, sim.mesh) if ic else sim.initial_state()
    state = sim.initialize(state)
    if cfg.resume and cfg.checkpoint_dir:
        from ..io.checkpoint import latest_checkpoint, load_checkpoint
        d = latest_checkpoint(cfg.checkpoint_dir)
        if d is not None:
            state = load_checkpoint(d, cfg, sim=sim)  # re-applies sharding
            if cfg.verbose:
                print(f"[{name}] resumed from {d} "
                      f"(step {int(state.step)}, t={float(state.t):.4f})")

    if cfg.verbose:
        print(f"[{name}] {cfg.Nx}x{cfg.Ny}x{cfg.Nz} "
              f"Re={cfg.Re:g} nu={cfg.nu:g} model={cfg.turb_model.value} "
              f"poisson={sim.poisson_selection_reason} dtype={cfg.dtype}")

    n_snap = cfg.num_snapshots
    snap_every = max(1, cfg.max_steps // n_snap) if n_snap > 0 else 0
    t0 = time.perf_counter()
    step0 = int(state.step)       # nonzero after --resume
    last_ck = [step0]
    last_out = [0]
    last_snap = [0]

    def console(it, st, d):
        gstep = step0 + it        # global step: resume-safe file numbering
        # ">= interval since last" rather than modulo EVERYWHERE: steady
        # mode invokes this callback only every diag_interval steps, so a
        # modulo test whose period is not a multiple of diag_interval
        # could alias and never fire
        if cfg.verbose and it - last_out[0] >= cfg.output_freq:
            last_out[0] = it
            print(f"  step {it:7d}  t={float(st.t):.4f} "
                  f"dt={float(d.dt):.2e} res={float(d.residual):.3e} "
                  f"div={float(d.div_linf):.3e} ke={float(d.ke):.6f}")
        if (snap_every and cfg.write_fields
                and it - last_snap[0] >= snap_every):
            last_snap[0] = it
            write_vtk(os.path.join(cfg.output_dir,
                                   f"{name}_{gstep:07d}.vtk"),
                      st, sim.mesh, sim.geom, cfg)
        if (cfg.checkpoint_dir and cfg.checkpoint_interval
                and gstep - last_ck[0] >= cfg.checkpoint_interval):
            from ..io.checkpoint import save_checkpoint
            save_checkpoint(cfg.checkpoint_dir, st, cfg)
            last_ck[0] = gstep
        if callback:
            callback(it, st, d)

    if cfg.simulation_mode == SimulationMode.STEADY:
        state, diags = sim.solve_steady(state, callback=console)
    else:
        state, diags = sim.advance_unsteady(state, cfg.max_steps,
                                            callback=console)
    wall = time.perf_counter() - t0

    if cfg.verbose:
        ncell = cfg.Nx * cfg.Ny * cfg.Nz
        steps = int(state.step)
        print(f"[{name}] done: {steps} steps, {wall:.2f}s wall, "
              f"{ncell * max(steps, 1) / max(wall, 1e-9) / 1e6:.1f} Mcells/s")
    if cfg.write_fields:
        write_vtk(os.path.join(cfg.output_dir, f"{name}_final.vtk"),
                  state, sim.mesh, sim.geom, cfg)
        write_profiles(os.path.join(cfg.output_dir, f"{name}_profiles.txt"),
                       state, sim.mesh, sim.geom)
    if validate:
        qois = validate(sim, state, diags) or {}
        for k, v in qois.items():
            # Namespace app QOIs per app/case: un-prefixed keys from
            # different smoke runs collide last-writer-wins in the CI
            # metrics (round-1 ADVICE: div_linf/strouhal silently
            # redefined what the baseline gated).
            key = k if k.startswith(name) else f"{name}_{k}"
            if not np.isfinite(float(v)):
                # "value": nan is invalid JSON and breaks the CI
                # metrics ingestion for the whole run
                print(f"[{name}] QOI {key} is non-finite; skipped")
                continue
            print(f'QOI_JSON: {{"name": "{key}", "value": {float(v):.6e}}}')
    return sim, state, diags
