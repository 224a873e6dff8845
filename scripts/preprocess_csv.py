#!/usr/bin/env python
"""CSV -> training arrays (reference: scripts/preprocess_mcconkey_csv.py).

Loads a CSV with named columns; the 6 scalar features are taken from the
columns named in FEATURE_COLUMNS (falling back to the first 6 non-label
columns), the label from --label.
"""

import sys

sys.path.insert(0, ".")

import numpy as np

FEATURE_COLUMNS = [
    "S_mag_delta_over_uref", "Omega_mag_delta_over_uref",
    "y_wall_over_delta", "Omega_over_S", "Re_S_local", "u_mag_over_uref",
]


def load_feature_csv(path: str, label: str = "nu_t"):
    with open(path) as fh:
        header = fh.readline().strip().split(",")
    data = np.loadtxt(path, delimiter=",", skiprows=1, ndmin=2)
    cols = {name.strip(): i for i, name in enumerate(header)}
    if label not in cols:
        raise KeyError(f"label column '{label}' not in {list(cols)}")
    if all(c in cols for c in FEATURE_COLUMNS):
        feat_idx = [cols[c] for c in FEATURE_COLUMNS]
    else:
        feat_idx = [i for n, i in cols.items() if n != label][:6]
    X = data[:, feat_idx]
    y = data[:, cols[label]]
    keep = np.all(np.isfinite(X), axis=1) & np.isfinite(y)
    return X[keep], y[keep]


if __name__ == "__main__":
    X, y = load_feature_csv(sys.argv[1],
                            sys.argv[2] if len(sys.argv) > 2 else "nu_t")
    out = sys.argv[3] if len(sys.argv) > 3 else "preprocessed.npz"
    np.savez(out, features=X, nu_t=y)
    print(f"{X.shape[0]} samples -> {out}")
