"""Hardware-keyed ms/step regression sentinel (reference:
tests/test_perf_sentinel.cpp + baseline_gpu_nvidia_h200.json). The CPU
baseline gates CI; bench.py maintains the TPU-keyed baseline the same way
(scripts/perf_sentinel.py --update on the target hardware)."""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

import perf_sentinel  # noqa: E402


def test_update_refuses_regression(monkeypatch, tmp_path):
    """The baseline is a RATCHET (reference: the deliberate, manual
    scripts/populate_gpu_baseline.sh): `--update` with artificially
    slowed measurements must refuse to rewrite the baseline, and a
    --rationale override must land in (and preserve) the `_note`
    curation field."""
    path = tmp_path / "perf_fake.json"
    base = {"tgv48_ms_per_step": 1.0, "channel48_ms_per_step": 1.0,
            "calibration_ms": 1.0, "_note": "curated"}
    path.write_text(json.dumps(base))
    slowed = {"tgv48_ms_per_step": 5.0, "channel48_ms_per_step": 1.0,
              "calibration_ms": 1.0}
    monkeypatch.setattr(perf_sentinel, "measure", lambda: slowed)
    monkeypatch.setattr(perf_sentinel, "baseline_path", lambda: str(path))
    # refused: file unchanged, nonzero exit
    assert perf_sentinel.main(["--update"]) == 1
    assert json.loads(path.read_text()) == base
    # plain compare also fails (the regression is reported, not ratified)
    assert perf_sentinel.main([]) == 1
    # explicit rationale: rewrite allowed, _note preserved + appended
    assert perf_sentinel.main(
        ["--update", "--rationale", "accepting slower kernel"]) == 0
    out = json.loads(path.read_text())
    assert out["tgv48_ms_per_step"] == 5.0
    assert out["_note"] == "curated | accepting slower kernel"
    # a non-regressing update keeps _note without a rationale
    monkeypatch.setattr(perf_sentinel, "measure",
                        lambda: dict(slowed, tgv48_ms_per_step=4.0))
    assert perf_sentinel.main(["--update"]) == 0
    out = json.loads(path.read_text())
    assert out["tgv48_ms_per_step"] == 4.0
    assert out["_note"] == "curated | accepting slower kernel"


def test_step_time_within_baseline(record_qoi):
    path = perf_sentinel.baseline_path()
    cur = perf_sentinel.measure()
    for k, v in cur.items():
        record_qoi(k, v)
    if not os.path.exists(path):
        pytest.skip(f"no perf baseline for this hardware ({path})")
    base = json.load(open(path))
    bad = perf_sentinel.compare(cur, base)
    if bad:
        # transient-load filter: a shared/1-core CI host can spike; a real
        # code regression reproduces on an immediate re-measure
        import time
        time.sleep(2.0)
        cur = perf_sentinel.measure()
        bad = perf_sentinel.compare(cur, base)
    assert not bad, "; ".join(bad)
