#!/usr/bin/env python
"""Check and repair invalid feature-normalization statistics in a model
directory (reference: scripts/fix_normalization_stats.py — regenerates
input_means.txt / input_stds.txt when they contain inf/NaN/degenerate
values that would poison every inference).

  python scripts/fix_normalization_stats.py --model data/models/<name>
  python scripts/fix_normalization_stats.py --model <dir> --from_npz d.npz

Repair sources, in order: --from_npz recomputes means/stds from a
dataset's feature columns; otherwise degenerate entries are replaced
elementwise with identity scaling (mean 0, std 1 — a no-op transform),
which is always safe because the solver z-scores with exactly these
arrays. Writes nothing unless --write is passed."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def check(means, stds):
    issues = []
    if not np.all(np.isfinite(means)):
        issues.append("non-finite means")
    if not np.all(np.isfinite(stds)):
        issues.append("non-finite stds")
    if np.any(np.abs(stds) < 1e-30):
        issues.append("zero stds (division blow-up)")
    if np.any(np.abs(means) > 1e12) or np.any(np.abs(stds) > 1e12):
        issues.append("extreme magnitudes (> 1e12)")
    return issues


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--from_npz", default=None,
                    help="recompute from this dataset's features/invariants")
    ap.add_argument("--write", action="store_true",
                    help="actually rewrite the files (default: dry run)")
    args = ap.parse_args()

    mpath = os.path.join(args.model, "input_means.txt")
    spath = os.path.join(args.model, "input_stds.txt")
    means = np.loadtxt(mpath).reshape(-1)
    stds = np.loadtxt(spath).reshape(-1)
    issues = check(means, stds)
    if not issues:
        print(f"OK: {args.model} normalization stats are valid "
              f"({means.size} features)")
        return 0
    print(f"ISSUES in {args.model}: {', '.join(issues)}")

    if args.from_npz:
        d = np.load(args.from_npz)
        X = np.asarray(d["features" if "features" in d else "invariants"],
                       np.float64)
        if X.shape[1] != means.size:
            print(f"FAIL: dataset has {X.shape[1]} features, model expects "
                  f"{means.size}")
            return 1
        new_means, new_stds = X.mean(axis=0), X.std(axis=0)
        new_stds = np.where(new_stds < 1e-30, 1.0, new_stds)
        src = f"recomputed from {args.from_npz}"
    else:
        bad = (~np.isfinite(means) | ~np.isfinite(stds)
               | (np.abs(stds) < 1e-30) | (np.abs(means) > 1e12)
               | (np.abs(stds) > 1e12))
        new_means = np.where(bad, 0.0, means)
        new_stds = np.where(bad, 1.0, stds)
        src = f"identity-patched {int(bad.sum())} bad entries"
    print(f"repair ({src}):")
    print(f"  means: {new_means}")
    print(f"  stds:  {new_stds}")
    if args.write:
        np.savetxt(mpath, new_means)
        np.savetxt(spath, new_stds)
        print(f"wrote {mpath}, {spath}")
    else:
        print("dry run (pass --write to apply)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
