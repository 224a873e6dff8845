"""Cross-backend / cross-precision comparison driver.

Reference-parity for app/compare_channel_cpu_gpu.cpp and the cross-build
CPU<->GPU CI leg (reference CMakeLists.txt:712-719, scripts/ci.sh:36-43):
runs the same channel trajectory in float64 (the validation reference) and
float32 (the TPU performance dtype), and with the fused Pallas predictor on
and off, reporting max deviations.

  python -m cfdnn_tpu.apps.compare_backends --Nx 32 --Ny 32 --steps 20
"""

from __future__ import annotations

import sys

import numpy as np


def run_trajectory(cfg, n_steps, ic=None):
    import dataclasses
    import jax.numpy as jnp
    from ..fields import perturbed_channel
    from ..solver import Simulation
    sim = Simulation(cfg)
    if ic is None:
        state = sim.initialize(perturbed_channel(cfg, sim.mesh, amp=0.05))
    else:
        # cast a shared IC into this run's dtype (jax.random draws differ
        # between dtypes, so each leg must start from the same numbers)
        proto = sim.initial_state()
        kw = {}
        for f in dataclasses.fields(proto):
            ref = getattr(proto, f.name)
            src = getattr(ic, f.name)
            if ref is not None and src is not None:
                kw[f.name] = jnp.asarray(src, ref.dtype)
        state = proto.replace(**kw)
    ic_out = state
    for _ in range(n_steps):
        state, d = sim.step(state)
    return sim, state, d, ic_out


def main(argv=None):
    import jax
    # CPU tool: the f64 leg needs real float64 (unavailable on TPU), and
    # the environment's sitecustomize may force-register the TPU backend
    # regardless of JAX_PLATFORMS — override explicitly.
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    jax.config.update("jax_enable_x64", True)
    from ..config import Config
    argv = sys.argv[1:] if argv is None else argv
    steps = 20
    rest = []
    i = 0
    while i < len(argv):
        if argv[i] == "--steps":
            steps = int(argv[i + 1])
            i += 2
        else:
            rest.append(argv[i])
            i += 1
    base = Config(Nx=32, Ny=32, Nz=8, z_max=1.0,
                  nu=1e-3, nu_specified=True, dp_dx=-2e-3,
                  dp_dx_specified=True, dt=1e-3,
                  adaptive_dt=False).parse_args(rest)

    _, s64, d64, ic = run_trajectory(base.with_(dtype="float64",
                                                use_pallas="off"), steps)
    _, s32, d32, _ = run_trajectory(base.with_(dtype="float32",
                                               use_pallas="off"), steps, ic)
    _, s64p, _, _ = run_trajectory(base.with_(dtype="float64",
                                              use_pallas="on"), steps, ic)

    u64 = np.asarray(s64.u)
    scale = max(np.abs(u64).max(), 1e-30)
    d_prec = np.abs(np.asarray(s32.u, np.float64) - u64).max() / scale
    d_pallas = np.abs(np.asarray(s64p.u) - u64).max() / scale

    print(f"[compare] {steps} steps on {base.Nx}x{base.Ny}x{base.Nz}:")
    print(f"  f32 vs f64 trajectory deviation : {d_prec:.3e} (rel Linf)")
    print(f"  pallas vs jnp (f64) deviation   : {d_pallas:.3e} (rel Linf)")
    print(f'QOI_JSON: {{"name": "cross_precision_dev", "value": {d_prec:.6e}}}')
    print(f'QOI_JSON: {{"name": "cross_kernel_dev", "value": {d_pallas:.6e}}}')
    ok = d_pallas < 1e-12 and d_prec < 1e-3
    print("[compare] PASS" if ok else "[compare] FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
