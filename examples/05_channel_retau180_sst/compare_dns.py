#!/usr/bin/env python
"""Compare the converged SST channel against the MKM (Moser-Kim-Mansour
1999) Re_tau = 180 DNS benchmark (reference:
examples/05_channel_retau180_sst/compare_dns.py).

In u_tau units (dp_dx = -1, h = 1) the steady momentum balance gives
u_tau = 1 exactly, so the profile in output/channel_profiles.txt IS
U+(y). Gates: bulk U_b+ vs 15.63 (10%), centerline U+ vs 18.30, and the
log-law shape constants kappa/B."""

import numpy as np

from cfdnn_tpu.diagnostics import MKM_BULK_U_PLUS, MKM_CENTERLINE_U_PLUS

RE_TAU = 180.0

data = np.loadtxt("output/channel_profiles.txt")
y, u = data[:, 0], data[:, 1]

u_b = float(np.mean(u))              # uniform cell centers
u_cl = float(u[np.argmin(np.abs(y))])
print(f"bulk U_b+       = {u_b:7.3f}   (MKM {MKM_BULK_U_PLUS[RE_TAU]})")
print(f"centerline U+   = {u_cl:7.3f}   (MKM {MKM_CENTERLINE_U_PLUS[RE_TAU]})")

# log-law shape: pointwise deviation from U+ = ln(y+)/0.41 + 5.0 over
# the log layer (the CI gate in tests/test_rans_accuracy.py, <10%)
yp = (1.0 - np.abs(y)) * RE_TAU
mask = (yp > 30.0) & (yp < 120.0)
if mask.sum() >= 4:
    ll = np.log(yp[mask]) / 0.41 + 5.0
    dev = float(np.abs(u[mask] - ll).max() / np.abs(ll).max())
    print(f"log-law deviation (30<y+<120) = {100 * dev:.1f}%  (gate 10%)")

err = abs(u_b - MKM_BULK_U_PLUS[RE_TAU]) / MKM_BULK_U_PLUS[RE_TAU]
print(f"\nbulk-velocity error vs MKM: {100 * err:.2f}%")
if err < 0.10:
    print("PASS: SST channel within 10% of the MKM DNS bulk velocity")
else:
    raise SystemExit("FAIL: bulk velocity off by more than 10%")
