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
    r"=\s+(.*?)\s+"
    r"(all-gather|all-to-all|collective-permute|all-reduce|reduce-scatter)"
    r"(-start)?\(")
_SHAPE_RE = re.compile(r"((?:f|bf|s|u|c)\d+|pred)\[([\d,]*)\]")


def _tuple_elements(t):
    """Top-level elements of a tuple-typed HLO result string, or None if
    `t` is not a tuple type. Paren-aware (elements may be tuples)."""
    t = t.strip()
    if not (t.startswith("(") and t.endswith(")")):
        return None
    parts, depth, cur = [], 0, []
    for ch in t[1:-1]:
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
            continue
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return parts


def collective_stats(hlo_text: str):
    """op -> (count, total_bytes, example shapes) from optimized HLO.

    The result type between '=' and the op name is parsed IN FULL: a
    tuple-form op (e.g. the tiled all-to-all's P operands, or a batched
    multi-field collective-permute) contributes the sum of all its
    tensors. (An earlier version took only the first tuple element,
    which undercounted the all-to-all volume by a factor of P — caught
    by the device-count sweep's 1/P scaling gate.)

    Async `-start` forms (TPU-compiled HLO) return a tuple that ALIASES
    the operand alongside the output — e.g. collective-permute-start ->
    ((in...), (out...), contexts) — so summing the full result type
    would double-count. Only the OUTPUT element of the result tuple is
    counted for them (halving the total instead is only exact for the
    size-symmetric ops; for all-gather-start/reduce-scatter-start the
    operand and output differ by the partition factor, and context
    scalars would be halved too). CPU CI emits the sync forms and is
    unaffected.
    """
    stats = {}
    for m in _OP_RE.finditer(hlo_text):
        lhs, op, is_start = m.group(1), m.group(2), bool(m.group(3))
        if is_start:
            els = _tuple_elements(lhs)
            if els and len(els) >= 2:
                lhs = els[1]   # (operand alias, OUTPUT, contexts...)
        nbytes = 0
        shapes = []
        for dt, dims in _SHAPE_RE.findall(lhs):
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            nbytes += n * _DTYPE_BYTES.get(dt, 4)
            shapes.append(f"{dt}[{dims}]")
        if not shapes:
            continue
        c, b, ex = stats.get(op, (0, 0, []))
        if len(ex) < 6:
            ex.append("+".join(shapes[:4]) + ("+..." if len(shapes) > 4
                                              else ""))
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


def sweep(Nx=32, Ny=32, Nz=32, ns=(2, 4, 8)):
    """Device-count sweep: measured per-collective bytes vs the ICI
    scaling model, for both the fused shard_map path and the GSPMD
    fallback (round-2 verdict: multi-chip evidence was single-point).

    The model (docs/DISTRIBUTION_GUIDE.md) predicts, per device per step:
      collective-permute (z halos):  ~ const in P  (planes of Nx*Ny*ng)
      all-to-all (pencil transpose): ~ 1/P         (field split over ICI)
      all-reduce:                    O(1) scalars
      all-gather:                    exactly zero
    Returns rows suitable for the guide's predicted-vs-measured table.
    """
    # pin the virtual device pool to the LARGEST count up front (the
    # first backend init freezes it; smaller meshes use a device subset)
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={max(ns)}"
        ).strip()
    rows = []
    for n in ns:
        stats = analyze(Nx, Ny, Nz, n_dev=n)
        for label, st in stats.items():
            get = lambda op: st.get(op, (0, 0, []))[1]
            rows.append(dict(n=n, path=label,
                             cp=get("collective-permute"),
                             ata=get("all-to-all"),
                             ar=get("all-reduce"),
                             ag=get("all-gather")))
    return rows


def check_sweep(rows, tol=0.35):
    """Loose gates on the sweep's scaling exponents (CI-facing).

    Within each path: collective-permute volume must be ~constant in P
    (weak-scaling halos) and all-to-all volume must fall ~1/P (split
    transpose); all-gather must be exactly zero everywhere. `tol` is the
    allowed relative deviation from the model exponent — loose, because
    small grids carry O(1) scalar traffic on top.
    """
    problems = []
    by_path = {}
    for r in rows:
        by_path.setdefault(r["path"], []).append(r)
    for path, rs in by_path.items():
        rs = sorted(rs, key=lambda r: r["n"])
        for r in rs:
            if r["ag"] != 0:
                problems.append(
                    f"{path} n={r['n']}: all-gather {r['ag']} bytes != 0")
        for a, b in zip(rs, rs[1:]):
            if a["cp"] and b["cp"]:
                ratio = b["cp"] / a["cp"]
                if not (1 - tol) <= ratio <= (1 + tol):
                    problems.append(
                        f"{path}: collective-permute not ~const: "
                        f"n={a['n']}->{b['n']} ratio {ratio:.2f}")
            if a["ata"] and b["ata"]:
                # per-device all-to-all should fall like 1/P (ratio
                # n_a/n_b with a factor (P-1)/P of actually-remote data)
                expect = a["n"] / b["n"]
                lo = expect * (1 - tol)
                hi = expect / (1 - tol) * (b["n"] / (b["n"] - 1))
                ratio = b["ata"] / a["ata"]
                if not lo <= ratio <= hi:
                    problems.append(
                        f"{path}: all-to-all not ~1/P: n={a['n']}->"
                        f"{b['n']} ratio {ratio:.3f} expected ~{expect:.3f}")
    return problems


def sweep_table(rows):
    out = ["| path | P | collective-permute MB | all-to-all MB | "
           "all-reduce MB | all-gather MB |",
           "|---|---|---|---|---|---|"]
    for r in rows:
        out.append(
            f"| {r['path']} | {r['n']} | {r['cp']/1e6:.3f} | "
            f"{r['ata']/1e6:.3f} | {r['ar']/1e6:.4f} | {r['ag']/1e6:.1f} |")
    return "\n".join(out)


if __name__ == "__main__":
    if "--sweep" in sys.argv:
        args = [int(a) for a in sys.argv[1:] if a.isdigit()]
        rows = sweep(*args) if args else sweep()
        print()
        print(sweep_table(rows).replace("\\n", "\n"))
        probs = check_sweep(rows)
        for pr in probs:
            print("SWEEP VIOLATION:", pr)
        sys.exit(1 if probs else 0)
    args = [int(a) for a in sys.argv[1:4]]
    analyze(*args)
