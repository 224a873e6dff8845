#!/usr/bin/env python
"""Post-hoc energy-spectrum analysis of saved VTK velocity fields.

Reference parity: scripts/spectral_analysis.py there (VTK -> E(k),
Kolmogorov inertial-range check; cupy-accelerated). Here it is plain
NumPy — post-processing is host-side by design, the in-solver device
path is `diagnostics.energy_spectrum_3d`.

Computes the shell-averaged 3-D kinetic-energy spectrum E(k) from the
cell-centered velocity a solver VTK snapshot stores, verifies Parseval
(sum E == mean KE density), fits the log-log slope over the inertial
subrange, and writes `<name>_spectrum.dat` (k, E) next to the input.

    python scripts/spectral_analysis.py output/tgv_final.vtk
    python scripts/spectral_analysis.py output/ --batch
    python scripts/spectral_analysis.py out.vtk --kfit 4 20
"""

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def shell_spectrum(u, v, w):
    """(k, E) integer-shell spectrum of cell-centered velocity arrays.

    Same shell/conjugate-weight convention as
    diagnostics.energy_spectrum_3d (Parseval: sum(E) = 0.5 <|u|^2>).
    """
    shape = u.shape
    n_total = np.prod(shape)
    e3 = None
    for c in (u, v, w):
        hat = np.fft.rfftn(c) / n_total
        p = np.abs(hat) ** 2
        w2 = np.ones(p.shape[-1])
        w2[1:] = 2.0
        if shape[-1] % 2 == 0:
            w2[-1] = 1.0
        p = p * w2
        e3 = p if e3 is None else e3 + p
    e3 *= 0.5
    ks = [np.fft.fftfreq(n, 1.0 / n) for n in shape[:-1]]
    ks.append(np.arange(shape[-1] // 2 + 1))
    K = np.sqrt(ks[0][:, None, None] ** 2 + ks[1][None, :, None] ** 2
                + ks[2][None, None, :] ** 2)
    shells = np.rint(K).astype(int)
    E = np.bincount(shells.ravel(), weights=e3.ravel())
    return np.arange(len(E)), E


def analyze(path, kfit=None, Re=None):
    from cfdnn_tpu.io.vtk import read_vtk_dims, read_vtk_scalars

    fields = read_vtk_scalars(path)
    if "velocity" not in fields:
        raise SystemExit(f"{path}: no VECTORS velocity field")
    dims = read_vtk_dims(path)
    vel = fields["velocity"].reshape(dims[2], dims[1], dims[0], 3)
    # VTK STRUCTURED_POINTS order is z-major; solver arrays are (x,y,z)
    u, v, w = (np.ascontiguousarray(vel[..., i].transpose(2, 1, 0))
               for i in range(3))

    k, E = shell_spectrum(u, v, w)
    ke_phys = 0.5 * float(np.mean(u * u + v * v + w * w))
    parseval = abs(E.sum() - ke_phys) / max(ke_phys, 1e-30)

    # inertial-range fit (default: decade below the dealiasing shell)
    kmax = len(k) - 1
    lo, hi = kfit if kfit else (max(3, kmax // 16), max(6, kmax // 3))
    sel = (k >= lo) & (k <= hi) & (E > 0)
    slope = np.nan
    if sel.sum() >= 3:
        slope = float(np.polyfit(np.log(k[sel]), np.log(E[sel]), 1)[0])

    out = os.path.splitext(path)[0] + "_spectrum.dat"
    np.savetxt(out, np.column_stack([k, E]),
               header=f"k E(k)   parseval_rel_err={parseval:.3e} "
                      f"slope[{lo},{hi}]={slope:.3f}")
    print(f"{os.path.basename(path)}: KE={ke_phys:.6f} "
          f"parseval_err={parseval:.2e} "
          f"slope(k={lo}..{hi})={slope:+.3f} (Kolmogorov -5/3) -> {out}")
    if Re:
        # Kolmogorov scale from the resolved dissipation estimate
        nu = 1.0 / Re
        k2 = k.astype(float) ** 2
        eps = 2.0 * nu * float((k2 * E).sum())
        eta = (nu ** 3 / max(eps, 1e-30)) ** 0.25
        print(f"  eps={eps:.4e}  eta={eta:.4e}  k_max*eta="
              f"{kmax * eta:.2f} (>=1 resolves dissipation)")
    return {"ke": ke_phys, "parseval": parseval, "slope": slope}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path", help="VTK file, or directory with --batch")
    ap.add_argument("--batch", action="store_true",
                    help="process every *.vtk in the directory")
    ap.add_argument("--kfit", type=int, nargs=2, default=None,
                    metavar=("KLO", "KHI"), help="inertial fit range")
    ap.add_argument("--Re", type=float, default=None,
                    help="Reynolds number for dissipation/eta scales")
    args = ap.parse_args()
    paths = (sorted(glob.glob(os.path.join(args.path, "*.vtk")))
             if args.batch else [args.path])
    if not paths:
        raise SystemExit("no VTK files found")
    for p in paths:
        analyze(p, kfit=args.kfit, Re=args.Re)


if __name__ == "__main__":
    main()
