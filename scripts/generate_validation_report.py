#!/usr/bin/env python
"""Generate a validation report from CI metrics + reference baselines
(reference: scripts/generate_validation_report.py).

  python scripts/generate_validation_report.py [artifacts/ci_metrics.json]
"""

import json
import os
import sys

sys.path.insert(0, ".")

REFERENCE_GATES = {
    # name: (value, comparator, reference source)
    "poiseuille_rel_l2_N64": (3.4e-4, "<=", "reference baseline 3.342e-4 "
                              "(tests/baselines/baseline_gpu_nvidia_h200.json)"),
    "poiseuille_refine_rate": (1.8, ">=", "reference MMS order gate >= 1.8"),
    "projection_div_after_0": (1e-10, "<=", "reference div-free gate 1e-10"),
    "projection_div_after_1": (1e-10, "<=", "stretched-grid projection gate"),
}


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "artifacts/ci_metrics.json"
    if not os.path.exists(path):
        print(f"no metrics at {path}; run scripts/ci.sh first")
        return 1
    metrics = json.load(open(path))
    lines = ["# Validation report", "",
             f"metrics: {path} ({len(metrics)} QOIs)", "",
             "| gate | value | threshold | status | reference |",
             "|---|---|---|---|---|"]
    failures = 0
    for name, (thresh, op, src) in REFERENCE_GATES.items():
        if name not in metrics:
            lines.append(f"| {name} | MISSING | {thresh:g} | SKIP | {src} |")
            continue
        v = metrics[name]
        ok = v <= thresh if op == "<=" else v >= thresh
        failures += 0 if ok else 1
        lines.append(f"| {name} | {v:.3e} | {op} {thresh:g} | "
                     f"{'PASS' if ok else 'FAIL'} | {src} |")
    lines += ["", "## All QOIs", ""]
    for k in sorted(metrics):
        lines.append(f"- {k}: {metrics[k]:.6e}")
    report = "\n".join(lines)
    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/validation_report.md", "w") as fh:
        fh.write(report + "\n")
    print(report)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
