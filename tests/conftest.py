"""Test configuration: CPU backend with 8 virtual devices + float64.

Physics-gate tests (div-free 1e-10, projection 1e-11, Poiseuille relL2) run in
float64 on CPU, mirroring the reference's all-double validation suite; TPU
performance runs use float32 (bench.py). The 8 virtual devices exercise the
multi-chip sharding path without hardware (SURVEY 2.3 TPU equivalents).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # axon/TPU is reserved for bench.py
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize registers the TPU backend regardless of env vars;
# override here (before any backend initialization) so tests run on CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import json  # noqa: E402

import pytest  # noqa: E402

_QOIS = {}


def qoi(name, value):
    """Record a machine-readable QOI (reference: tests emit QOI_JSON lines
    parsed by scripts/ci.sh:260-282)."""
    _QOIS[name] = float(value)
    print(f'QOI_JSON: {{"name": "{name}", "value": {float(value):.6e}}}')


@pytest.fixture
def record_qoi():
    return qoi
