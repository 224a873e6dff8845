#!/usr/bin/env python
"""McConkey et al. (2021) CSV dataset -> NPZ training arrays.

Full-fidelity rebuild of the reference preprocessing chain (reference:
scripts/preprocess_mcconkey_csv.py:1-220): reads the dataset's komega.csv
(RANS inputs) and REF.csv (DNS/LES labels), assembles the 3x3 S and Omega
tensors from the *_11.._33 columns, and computes per sample

  - the 5 Ling et al. scalar invariants  tr(S^2), tr(O^2), tr(S^3),
    tr(S O^2), tr(S^2 O^2)  of the k/eps-normalized tensors,
  - the 4-tensor 2-D integrity basis T1..T4 (xx, xy, yy components),
  - the DNS anisotropy b_ij labels (b_11, b_12, b_22),

written per case family as  <out>/<case>/train/data.npz  with keys
{invariants, anisotropy, basis, k, epsilon} — the layout both the
reference's train_tbnn_mcconkey.py and this repo's scripts/train_tbnn.py
consume. The numerical pipeline is pinned against the in-solver feature
computer by tests/test_ml_training.py.

    python scripts/preprocess_mcconkey_csv.py --data_dir mcconkey_data \
        --output mcconkey_processed

The dataset itself (https://doi.org/10.34740/kaggle/dsv/2637500) must be
downloaded separately (reference scripts/download_mcconkey_data.sh);
this environment has no network egress.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_TENSOR_COMPONENTS = ("11", "12", "13", "22", "23", "33")
_LOWER = {"21": (1, 0), "31": (2, 0), "32": (2, 1)}


def read_csv_columns(path):
    """name -> 1-D array for every numeric column; 'Case' kept as str.
    (pandas used when available; plain-numpy fallback otherwise)."""
    try:
        import pandas as pd
        df = pd.read_csv(path)
        out = {c: df[c].to_numpy() for c in df.columns}
        return out
    except ImportError:
        with open(path) as fh:
            header = fh.readline().strip().split(",")
        raw = np.genfromtxt(path, delimiter=",", skip_header=1,
                            dtype=None, encoding="utf-8", names=None)
        cols = {}
        for i, name in enumerate(header):
            cols[name.strip()] = np.asarray([r[i] for r in raw])
        return cols


def assemble_tensor(cols, prefix):
    """(N, 3, 3) from `<prefix>_11`..`<prefix>_33` columns; symmetric
    completion when the lower triangle is absent (S); full read when
    present (Omega is antisymmetric and ships its own lower triangle)."""
    n = len(cols[f"{prefix}_11"])
    T = np.zeros((n, 3, 3))
    idx = {"11": (0, 0), "12": (0, 1), "13": (0, 2),
           "22": (1, 1), "23": (1, 2), "33": (2, 2)}
    for c, (i, j) in idx.items():
        T[:, i, j] = np.asarray(cols[f"{prefix}_{c}"], dtype=float)
    for c, (i, j) in _LOWER.items():
        key = f"{prefix}_{c}"
        if key in cols:
            T[:, i, j] = np.asarray(cols[key], dtype=float)
        else:
            T[:, i, j] = T[:, j, i]
    return T


def normalized_tensors(S, O, k, eps):
    """k/eps time-scale normalization (Ling et al. 2016 convention)."""
    T_t = k / (eps + 1e-20)
    return T_t[:, None, None] * S, T_t[:, None, None] * O


def invariants5(Sh, Oh):
    """The 5 scalar invariants of (S-hat, Omega-hat)."""
    tr = lambda A: np.trace(A, axis1=1, axis2=2)
    S2 = Sh @ Sh
    O2 = Oh @ Oh
    return np.stack([tr(S2), tr(O2), tr(S2 @ Sh), tr(Sh @ O2),
                     tr(S2 @ O2)], axis=1)


def tensor_basis_2d(Sh, Oh):
    """(N, 4, 3) basis tensors as (xx, xy, yy) components:
    T1=S, T2=SO-OS, T3=S^2-tr(S^2)I/2, T4=O^2-tr(O^2)I/2 (2-D trace)."""
    def comps(T, dev2d=False):
        xx, xy, yy = T[:, 0, 0], T[:, 0, 1], T[:, 1, 1]
        if dev2d:
            half_tr = 0.5 * (xx + yy)
            xx, yy = xx - half_tr, yy - half_tr
        return np.stack([xx, xy, yy], axis=1)

    out = np.empty((Sh.shape[0], 4, 3))
    out[:, 0] = comps(Sh)
    out[:, 1] = comps(Sh @ Oh - Oh @ Sh)
    out[:, 2] = comps(Sh @ Sh, dev2d=True)
    out[:, 3] = comps(Oh @ Oh, dev2d=True)
    return out


def process_case(cols_rans, cols_ref, pattern, out_path):
    case = np.asarray(cols_rans["Case"], dtype=str)
    sel = np.char.find(case, pattern) >= 0
    if not sel.any():
        print(f"  no samples match '{pattern}'")
        return False
    pick = lambda c: {k: np.asarray(v)[sel] for k, v in c.items()
                      if k != "Case"}
    rans = pick(cols_rans)
    S = assemble_tensor(rans, "komega_S")
    O = assemble_tensor(rans, "komega_R")
    k = np.asarray(rans["komega_k"], dtype=float)
    eps = np.asarray(rans["komega_epsilon"], dtype=float)
    Sh, Oh = normalized_tensors(S, O, k, eps)
    inv = invariants5(Sh, Oh)
    basis = tensor_basis_2d(Sh, Oh)

    case_ref = np.asarray(cols_ref["Case"], dtype=str)
    sel_ref = np.char.find(case_ref, pattern) >= 0
    if sel_ref.sum() == sel.sum():
        b = np.stack([np.asarray(cols_ref[f"REF_b_{c}"], dtype=float)
                      [sel_ref] for c in ("11", "12", "22")], axis=1)
    else:
        print("  WARNING: DNS label count mismatch — deriving b from the "
              "RANS tau (placeholder labels)")
        tau = assemble_tensor(rans, "komega_tau")
        bfull = tau / (2.0 * k[:, None, None] + 1e-20) \
            - np.eye(3)[None] / 3.0
        b = np.stack([bfull[:, 0, 0], bfull[:, 0, 1], bfull[:, 1, 1]],
                     axis=1)

    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    np.savez(out_path,
             invariants=inv.astype(np.float32),
             anisotropy=b.astype(np.float32),
             basis=basis.astype(np.float32),
             k=k.astype(np.float32), epsilon=eps.astype(np.float32))
    print(f"  {sel.sum()} samples -> {out_path}")
    return True


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", default="mcconkey_data")
    ap.add_argument("--output", default="mcconkey_processed")
    args = ap.parse_args()
    rans = read_csv_columns(os.path.join(args.data_dir, "komega.csv"))
    ref = read_csv_columns(os.path.join(args.data_dir, "REF.csv"))
    print(f"{len(rans['Case'])} RANS samples, "
          f"{len(set(np.asarray(rans['Case'], dtype=str)))} cases")
    # case families as in the reference: flat-plate -> channel-like,
    # case_* -> periodic hills
    process_case(rans, ref, "fp_",
                 os.path.join(args.output, "channel", "train", "data.npz"))
    process_case(rans, ref, "case_",
                 os.path.join(args.output, "periodic_hills", "train",
                              "data.npz"))


if __name__ == "__main__":
    main()
