#!/usr/bin/env python
"""Tabulate the three converged RANS channels against the MKM DNS
(reference: examples/06_steady_rans_channel — baseline/GEP/SST model
comparison at Re_tau = 180)."""

import os

import numpy as np

from cfdnn_tpu.diagnostics import MKM_BULK_U_PLUS, MKM_CENTERLINE_U_PLUS

RE_TAU = 180.0
mkm_ub, mkm_ucl = MKM_BULK_U_PLUS[RE_TAU], MKM_CENTERLINE_U_PLUS[RE_TAU]

print(f"{'model':>10} {'U_b+':>8} {'err%':>7} {'U_cl+':>8} {'nu_t/nu max':>12}")
print(f"{'MKM DNS':>10} {mkm_ub:8.2f} {'-':>7} {mkm_ucl:8.2f}")
for m in ("baseline", "gep", "sst"):
    path = os.path.join("output", m, "channel_profiles.txt")
    if not os.path.exists(path):
        print(f"{m:>10}   (no output — run ./run.sh first)")
        continue
    data = np.loadtxt(path)
    y, u = data[:, 0], data[:, 1]
    nut_max = data[:, 5].max() / (1.0 / RE_TAU) if data.shape[1] > 5 else 0.0
    u_b = float(np.mean(u))
    u_cl = float(u[np.argmin(np.abs(y))])
    err = 100.0 * (u_b - mkm_ub) / mkm_ub
    print(f"{m:>10} {u_b:8.2f} {err:+7.2f} {u_cl:8.2f} {nut_max:12.1f}")
