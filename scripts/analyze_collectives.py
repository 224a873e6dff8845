#!/usr/bin/env python
"""Communication-volume analysis of the compiled multi-chip step.

Real multi-chip hardware is not available in this environment, so the
scaling story is grounded the way a performance model is: compile the
z-sharded step for N virtual devices, parse every collective op out of
the optimized HLO, and report per-device communication volume next to
the per-device compute volume. Healthy z-slab scaling means

  - halo collective-permutes:   O(Nx*Ny*ng) bytes per exchange
                                (independent of Nz/P -> weak-scales)
  - Poisson all-to-alls:        O(Nx*Ny*Nz/P) bytes per solve
                                (the field once over, split across ICI)
  - scalar all-reduces:         O(1)
  - full-field all-gathers:     ZERO (replication kills scaling)

Run:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/analyze_collectives.py [Nx Ny Nz]
"""

import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4,
                "u32": 4, "pred": 1, "c64": 8, "c128": 16}

_OP_RE = re.compile(
    r"=\s+(?:\()?((?:f|bf|s|u|c)\d+|pred)\[([\d,]*)\][^)]*?\)?\s+"
    r"(all-gather|all-to-all|collective-permute|all-reduce|reduce-scatter)"
    r"(?:-start)?\(")


def collective_stats(hlo_text: str):
    """op -> (count, total_bytes, example shapes) from optimized HLO."""
    stats = {}
    for m in _OP_RE.finditer(hlo_text):
        dt, dims, op = m.group(1), m.group(2), m.group(3)
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        nbytes = n * _DTYPE_BYTES.get(dt, 4)
        c, b, ex = stats.get(op, (0, 0, []))
        if len(ex) < 6:
            ex.append(f"{dt}[{dims}]")
        stats[op] = (c + 1, b + nbytes, ex)
    return stats


def analyze(Nx=32, Ny=32, Nz=32, n_dev=None):
    # This analysis is contractually a virtual-CPU-mesh compile: force the
    # CPU platform AND the virtual host device count before backend init,
    # so it works even where a sitecustomize pins a 1-chip TPU backend.
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_dev or 8}"
        ).strip()
    import jax
    jax.config.update("jax_platforms", "cpu")

    from cfdnn_tpu import BCType, Config, Simulation, perturbed_channel
    n_dev = n_dev or len(jax.devices())
    all_stats = {}
    # use_pallas="on" = the shard_map fast path a real multi-chip TPU run
    # takes (under "auto" it is TPU-only, so a CPU virtual-device compile
    # would silently measure the fallback instead); "off" = the GSPMD
    # operator fallback, reported for contrast.
    cases = [("fused shard_map path (production)", "on", (n_dev,), ("z",)),
             ("GSPMD operator fallback", "off", (n_dev,), ("z",))]
    if n_dev >= 4 and n_dev % 2 == 0:
        cases.append(("2-D (x,z) pencil path", "off",
                      (2, n_dev // 2), ("x", "z")))
    for label, up, mshape, maxes in cases:
        cfg = Config(Nx=Nx, Ny=Ny, Nz=Nz, bc_x=BCType.PERIODIC,
                     bc_y=BCType.WALL, bc_z=BCType.PERIODIC, stretch_y=True,
                     nu=1e-3, nu_specified=True, dp_dx=-1e-3,
                     dp_dx_specified=True, dt=1e-3, adaptive_dt=False,
                     dtype="float32", mesh_shape=mshape, mesh_axes=maxes,
                     use_pallas=up)
        sim = Simulation(cfg)
        if "pencil" in label and not sim.poisson.name.startswith(
                "Pencil2DFDM"):
            # don't mislabel the GSPMD fallback as the pencil path
            # (e.g. Nx/Nz not divisible by Px*Pz)
            print(f"\n[{label}] SKIPPED: pencil solver not selected "
                  f"(got {sim.poisson.name})")
            continue
        st = sim.initialize(perturbed_channel(cfg, sim.mesh, amp=0.05))
        txt = jax.jit(sim._step_impl).lower(st).compile().as_text()
        stats = collective_stats(txt)
        field_bytes = Nx * Ny * Nz * 4
        print(f"\n[{label}] step collectives, {Nx}x{Ny}x{Nz} over "
              f"{n_dev} devices (full field = {field_bytes/1e6:.2f} MB, "
              f"poisson = {sim.poisson.name}, "
              f"pallas mode = {sim._pallas_predictor_ok}):")
        for op, (c, b, ex) in sorted(stats.items()):
            print(f"  {op:20s} x{c:4d}  {b/1e6:8.3f} MB/device/step   "
                  f"e.g. {', '.join(ex[:3])}")
        ag = stats.get("all-gather", (0, 0, []))
        print(f"  -> all-gather volume: {ag[1]/1e6:.3f} MB "
              f"({'OK (zero)' if ag[1] == 0 else 'BAD: replication'})")
        all_stats[label] = stats
    return all_stats


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:4]]
    analyze(*args)
