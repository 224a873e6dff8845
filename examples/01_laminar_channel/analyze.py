#!/usr/bin/env python
"""Compare the computed Poiseuille profile against the exact parabola.

Reads output/channel_profiles.txt (written by the app) and prints a
y / u_computed / u_exact / error table plus the relative L2 error.
The pass bar is the reference's own baseline, relL2 = 3.34e-4
(reference: examples/01_laminar_channel/analyze.py, same gate)."""

import numpy as np

from cfdnn_tpu import Config, poiseuille_exact

cfg = Config.from_file("poiseuille.cfg").finalize()
data = np.loadtxt("output/channel_profiles.txt")
y, u = data[:, 0], data[:, 1]
ue = poiseuille_exact(cfg, y)

rel_l2 = np.linalg.norm(u - ue) / np.linalg.norm(ue)
print(f"{'y':>10} {'u':>12} {'u_exact':>12} {'error':>12}")
for i in range(0, len(y), max(1, len(y) // 16)):
    print(f"{y[i]:10.4f} {u[i]:12.6f} {ue[i]:12.6f} {u[i]-ue[i]:12.3e}")
print(f"\nrelative L2 error = {rel_l2:.4e}  (reference baseline 3.34e-4)")
print(f"u_max = {u.max():.6f} (exact {ue.max():.6f})")
if rel_l2 < 5e-4:
    print("PASS: solver reproduces the analytic Poiseuille solution")
else:
    raise SystemExit(f"FAIL: relL2 {rel_l2:.3e} exceeds 5e-4")
