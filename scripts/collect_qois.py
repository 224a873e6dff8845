#!/usr/bin/env python
"""Parse QOI_JSON lines from a test log into a metrics JSON, and compare
against a stored baseline (reference: scripts/ci.sh:260-282 QOI collection
+ tests/baselines/*.json regression gates)."""

import json
import re
import sys

TOLERANCE = 2.0   # metric may not regress by more than this factor


def collect(log_path: str, out_path: str):
    qois = {}
    pat = re.compile(r"QOI_JSON:\s*(\{.*\})")
    with open(log_path) as fh:
        for line in fh:
            m = pat.search(line)
            if m:
                d = json.loads(m.group(1))
                qois[d["name"]] = d["value"]
    with open(out_path, "w") as fh:
        json.dump(qois, fh, indent=1, sort_keys=True)
    print(f"collected {len(qois)} QOIs -> {out_path}")
    return qois


def compare(current_path: str, baseline_path: str) -> int:
    cur = json.load(open(current_path))
    base = json.load(open(baseline_path))
    bad = []
    for name, ref in base.items():
        if name not in cur:
            bad.append(f"MISSING: {name}")
            continue
        val = cur[name]
        # error-like metrics must not grow; others just logged
        if ("err" in name or "rel" in name or "div" in name
                or "residual" in name or "closure" in name):
            if abs(val) > TOLERANCE * max(abs(ref), 1e-300):
                bad.append(f"REGRESSED: {name}: {val:.3e} vs baseline "
                           f"{ref:.3e}")
    for b in bad:
        print(b)
    print(f"baseline comparison: {len(base) - len(bad)}/{len(base)} ok")
    return 1 if bad else 0


if __name__ == "__main__":
    args = sys.argv[1:]
    if args and args[0] == "--compare":
        sys.exit(compare(args[1], args[2]))
    collect(args[0], args[1] if len(args) > 1 else "artifacts/ci_metrics.json")
