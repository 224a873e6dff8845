#!/usr/bin/env python
"""Run every turbulence closure on one case and produce a comparison
report (reference: scripts/run_all_models.py + compare_models.py — the
RANS-campaign drivers that run the channel per model and collect
profiles, nu_t fields, and timing into a summary).

  python scripts/run_all_models.py --case channel --quick
  python scripts/run_all_models.py --case channel --steps 2000 \
      --output_dir artifacts/campaign

Per model: wall time, steps run, bulk velocity, u_tau/Re_tau, max
nu_t/nu, final KE, and NaN-freeness; written as JSON + a markdown table.
NN closures load the shipped presets in data/models/. Uses the in-process
Simulation API (the reference shells out to ./channel per model).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def run_model(model, args):
    import jax
    from cfdnn_tpu import Config, Simulation, perturbed_channel
    from cfdnn_tpu.config import TurbulenceModel
    from cfdnn_tpu.diagnostics import channel_statistics

    kw = {}
    root = os.path.join(os.path.dirname(__file__), "..", "data", "models")
    if model == TurbulenceModel.NN_MLP:
        kw["nn_weights_path"] = os.path.join(root, "mlp_channel_sst")
    elif model == TurbulenceModel.NN_TBNN:
        kw["nn_weights_path"] = os.path.join(root, "tbnn_channel_synthetic")
    cfg = Config(
        Nx=args.Nx, Ny=args.Ny, Nz=args.Nz, stretch_y=True,
        Re=args.Re, Re_specified=True, dp_dx=-1.0,
        dp_dx_specified=True,
        dt=args.dt, adaptive_dt=True, dtype=args.dtype,
        turb_model=model, **kw)
    sim = Simulation(cfg)
    state = sim.initialize(perturbed_channel(cfg, sim.mesh, amp=0.05))
    # warm the jit before timing: without it the reported ms/step is
    # dominated by one-time compile (seconds) rather than step time;
    # benchmarks/bench_suite.py `models` is the precision cost bench
    jax.block_until_ready(sim.run(state, 1)[0].u)
    t0 = time.perf_counter()
    state, d = sim.run(state, args.steps)
    jax.block_until_ready(state.u)
    wall = time.perf_counter() - t0
    st = channel_statistics(sim, state)
    nu_t_max = float(np.max(np.asarray(state.nu_t))) if state.nu_t is not None else 0.0
    # volume-weighted bulk velocity (plain mean over a stretched-y grid
    # over-weights the small near-wall cells)
    dy = np.asarray(sim.mesh.y.d, np.float64)
    u_mean_y = np.asarray(state.u, np.float64).mean(axis=(0, 2))
    bulk_u = float((u_mean_y * dy).sum() / dy.sum())
    return {
        "model": model.value,
        "wall_s": round(wall, 3),
        "ms_per_step": round(wall / args.steps * 1e3, 4),
        "steps": args.steps,
        "finite": bool(np.isfinite(float(d.ke))),
        "ke": float(d.ke),
        "bulk_u": bulk_u,
        "u_tau": st.u_tau,
        "Re_tau": st.Re_tau,
        "nu_t_max_over_nu": round(nu_t_max / cfg.nu, 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", default="channel", choices=["channel"])
    ap.add_argument("--models", nargs="*", default=None,
                    help="subset of closure names (default: all 15)")
    ap.add_argument("--quick", action="store_true",
                    help="small grid + 200 steps")
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--Nx", type=int, default=None)
    ap.add_argument("--Ny", type=int, default=None)
    ap.add_argument("--Nz", type=int, default=None)
    # default Re matches the mlp_channel_sst preset's training regime
    # (SST channel at Re_tau=180, dp_dx=-1 => u_tau=1): at Re=5600 the
    # preset's Re_S feature is ~30x out of distribution and the NN rows
    # degenerate to nu_t=0
    ap.add_argument("--Re", type=float, default=180.0)
    ap.add_argument("--dt", type=float, default=1e-3)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--output_dir", default="artifacts/campaign")
    args = ap.parse_args()

    from cfdnn_tpu.config import TurbulenceModel
    if args.quick:
        defaults = dict(steps=200, Nx=32, Ny=64, Nz=16)
    else:
        defaults = dict(steps=2000, Nx=64, Ny=96, Nz=48)
    for k, v in defaults.items():
        if getattr(args, k) is None:
            setattr(args, k, v)

    models = list(TurbulenceModel)
    if args.models:
        byname = {m.value: m for m in TurbulenceModel}
        models = [byname[n] for n in args.models]

    rows = []
    for m in models:
        print(f"--- {m.value}")
        try:
            rows.append(run_model(m, args))
        except Exception as e:          # keep the campaign going
            rows.append({"model": m.value, "error": str(e)[:200]})
        r = rows[-1]
        if "error" in r:
            print(f"    ERROR: {r['error']}")
        else:
            print(f"    {r['ms_per_step']} ms/step, Re_tau={r['Re_tau']:.1f},"
                  f" nu_t_max/nu={r['nu_t_max_over_nu']}, finite={r['finite']}")

    os.makedirs(args.output_dir, exist_ok=True)
    jpath = os.path.join(args.output_dir, f"campaign_{args.case}.json")
    with open(jpath, "w") as fh:
        json.dump({"case": args.case,
                   "grid": [args.Nx, args.Ny, args.Nz],
                   "steps": args.steps, "results": rows}, fh, indent=1)

    mpath = os.path.join(args.output_dir, f"campaign_{args.case}.md")
    with open(mpath, "w") as fh:
        fh.write(f"# {args.case} closure campaign "
                 f"({args.Nx}x{args.Ny}x{args.Nz}, {args.steps} steps)\n\n"
                 "| model | ms/step | Re_tau | nu_t_max/nu | finite |\n"
                 "|---|---|---|---|---|\n")
        for r in rows:
            if "error" in r:
                fh.write(f"| {r['model']} | ERROR: {r['error'][:60]} | | | |\n")
            else:
                fh.write(f"| {r['model']} | {r['ms_per_step']} | "
                         f"{r['Re_tau']:.1f} | {r['nu_t_max_over_nu']} | "
                         f"{r['finite']} |\n")
    print(f"wrote {jpath} and {mpath}")
    bad = [r for r in rows if "error" in r or not r.get("finite", False)]
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
