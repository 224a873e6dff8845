#!/usr/bin/env python
"""Train the `tbnn_channel_earsm` preset: a TBNN anisotropy model distilled
from the CONVERGED Wallin-Johansson EARSM channel solution computed by this
solver (Re_tau = 180).

The reference's TBNN presets are trained on DNS anisotropy tables
(scripts/train_tbnn_mcconkey.py there); with no DNS table shipped in this
environment, the physical-data analogue is the solver's own EARSM b_ij
field — a genuine nonlinear constitutive relation (G_n(eta, zeta) in the
same tensor basis the TBNN reconstructs), evaluated on physical channel
states along the spin-up trajectory. Training pairs: the 5 TBNN invariants
+ 4-tensor basis (features.tbnn_invariants_and_basis) -> EARSM anisotropy
b_ij = tau_ij/(2k) - delta_ij/3.

    python scripts/distill_earsm_channel.py [--out data/models/tbnn_channel_earsm]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def generate_pairs():
    from cfdnn_tpu import Config, Simulation, init_poiseuille
    from cfdnn_tpu.config import TurbulenceModel
    from cfdnn_tpu.turbulence.features import tbnn_invariants_and_basis
    from cfdnn_tpu.turbulence.base import wall_distance

    cfg = Config(Nx=4, Ny=96, Nz=1,
                 nu=1.0 / 180.0, nu_specified=True,
                 dp_dx=-1.0, dp_dx_specified=True,
                 dt=1e-3, adaptive_dt=True, CFL_max=0.5,
                 dtype="float64", turb_model=TurbulenceModel.EARSM_WJ)
    sim = Simulation(cfg)
    state = sim.initialize(init_poiseuille(cfg, sim.mesh, fraction=0.05))
    y_wall = wall_distance(sim.mesh, cfg, sim.geom.dtype)

    def pairs(st):
        feats, basis, _ = tbnn_invariants_and_basis(
            (st.u, st.v, st.w), sim.geom, st.k, st.omega,
            y_wall, 0.5 * cfg.Ly)
        t_xx, t_xy, t_yy = sim.turb.reynolds_stresses(st, sim)
        k = np.maximum(np.asarray(st.k), 1e-12)
        b = np.stack([np.asarray(t_xx) / (2.0 * k) - 1.0 / 3.0,
                      np.asarray(t_xy) / (2.0 * k),
                      np.asarray(t_yy) / (2.0 * k) - 1.0 / 3.0],
                     axis=-1).reshape(-1, 3)
        return np.asarray(feats), np.asarray(basis), b

    # Sample the spin-up trajectory, not just the fixed point — the
    # closure is evaluated on transient states in-solver (same rationale
    # and cadence as distill_sst_channel.py).
    Xs, Ts, Bs = [], [], []
    for i in range(60):
        state, d = sim.run(state, 500)
        if not np.isfinite(float(d.ke)):
            raise SystemExit("EARSM channel diverged")
        if i >= 4 and i % 2 == 0:
            xi, ti, bi = pairs(state)
            Xs.append(xi)
            Ts.append(ti)
            Bs.append(bi)
    print(f"EARSM-WJ channel converged: ke={float(d.ke):.4f}, "
          f"{len(Xs)} snapshots")
    xi, ti, bi = pairs(state)          # weight the fixed point strongly
    Xs += [xi] * 5
    Ts += [ti] * 5
    Bs += [bi] * 5
    X = np.concatenate(Xs)
    T = np.concatenate(Ts)
    B = np.concatenate(Bs)
    keep = (np.all(np.isfinite(X), axis=1)
            & np.all(np.isfinite(B), axis=1)
            & np.all(np.isfinite(T.reshape(len(T), -1)), axis=1))
    return X[keep], T[keep], B[keep]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data/models/tbnn_channel_earsm")
    ap.add_argument("--epochs", type=int, default=300)
    args = ap.parse_args()

    from cfdnn_tpu.ml.training import train_tbnn

    X, T, B = generate_pairs()
    rng = np.random.default_rng(0)
    perm = rng.permutation(len(X))
    n_tr = int(0.8 * len(X))
    tr, ho = perm[:n_tr], perm[n_tr:]
    print(f"{len(tr)} train / {len(ho)} hold-out samples")

    mlp, hist = train_tbnn(X[tr], T[tr], B[tr], hidden=[64, 64, 64],
                           epochs=args.epochs, batch=1024, log=True)
    G = np.asarray(mlp(X[ho]))                       # (N, 4)
    b_pred = np.einsum("nb,nbc->nc", G, T[ho])
    ss_res = float(np.sum((b_pred - B[ho]) ** 2))
    ss_tot = float(np.sum((B[ho] - B[ho].mean(axis=0)) ** 2))
    r2 = 1.0 - ss_res / max(ss_tot, 1e-30)
    print(f"hold-out anisotropy R^2 = {r2:.4f}")

    # quality gate BEFORE save: a bad fit must not clobber a good preset
    if not r2 > 0.9:   # hard error, not assert: python -O must not
        raise SystemExit(      # silently clobber a good committed preset
            f"hold-out R^2 too low: {r2} — refusing to save")
    mlp.save(args.out, metadata={
        "name": os.path.basename(args.out.rstrip("/")),
        "type": "nn_tbnn",
        "description": ("TBNN anisotropy model distilled from the "
                        "converged Wallin-Johansson EARSM channel at "
                        "Re_tau=180 — physical solver anisotropy labels, "
                        "not synthetic"),
        "training": {
            "source": "cfdnn_tpu EARSM-WJ channel Re_tau=180, Ny=96, f64",
            "n_train": int(len(tr)), "n_holdout": int(len(ho)),
            "holdout_r2": r2, "final_loss": float(hist[-1]),
        },
        "features": {"type": "tbnn_invariants_v1"},
    })
    print(f"saved preset -> {args.out}")


if __name__ == "__main__":
    main()
