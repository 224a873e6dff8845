#!/usr/bin/env python
"""On-device attribution of the Pallas four-step Hartley solve time
(round-3 verdict #4: the 512^3 physics-tier solve measured 17.4 ms vs a
~6.6 ms pure-bandwidth estimate, with no trace pinning the gap).

Method: time the COMPOSED `FDMPoissonSolver._solve_once` (differential
over 8- vs 2-solve jitted chains, cancelling the ~25 ms tunnel dispatch
overhead), then capture a `jax.profiler` device trace of one solve and
sum the per-kernel durations (`_solve_once.N` events = the five Pallas
passes in program order: fwd x, fwd y, modal z, inv y, inv x).

NOTE an earlier version timed each kernel alone inside a lax.scan chain;
that inflates every pass by the scan carry-buffer copies (~2x) and was
inconsistent with the composed solve — the composed+trace numbers here
are the authoritative ones (artifacts/fht_profile_512.md).

Per-pass analytic bounds printed for attribution:
  HBM: 2 * nbytes / BW        (one read + one write of the field)
  MXU: elems * 2*N2 * passes * 2 / peak_bf16
       (the compensated matmuls; 2x for the fused modal pass)

Usage:  python scripts/profile_fht.py [N]
"""

import collections
import dataclasses
import functools
import glob
import gzip
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# TPU v5e (v5 lite) public specs
PEAK_BF16 = 197e12          # FLOP/s
HBM_BW = 819e9              # B/s


def main(N=512):
    import jax
    import jax.numpy as jnp

    from cfdnn_tpu import BCType, Config
    from cfdnn_tpu.mesh import Mesh
    from cfdnn_tpu.poisson.fdm import FDMPoissonSolver
    from cfdnn_tpu.utils.timing import marginal_step_seconds

    dev = jax.devices()[0]
    print(f"device: {dev}; N={N}^3 f32 all-periodic")
    two_pi = 2 * np.pi
    cfg = Config(Nx=N, Ny=N, Nz=N, bc_x=BCType.PERIODIC,
                 bc_y=BCType.PERIODIC, bc_z=BCType.PERIODIC,
                 y_min=0, y_max=two_pi, z_min=0, z_max=two_pi,
                 nu=1e-3, nu_specified=True, dp_dx=0.0,
                 dp_dx_specified=True, dtype="float32")
    mesh = Mesh.from_config(cfg)
    rng = np.random.default_rng(0)
    rhs = jnp.asarray(rng.standard_normal((N, N, N)), jnp.float32)
    rhs = rhs - jnp.mean(rhs)
    elems = N ** 3
    hbm_ms = 2 * elems * 4 / HBM_BW * 1e3

    for prec, passes in (("highest", 6), ("high", 3)):
        c = dataclasses.replace(cfg, poisson_matmul_precision=prec)
        s = FDMPoissonSolver(mesh, c, transform="pallas_fft")
        mxu_ms = elems * 2 * s.tr[0].fht.N2 * passes * 2 / PEAK_BF16 * 1e3

        def chain(x, k):
            for _ in range(k):
                x = s._solve_once(x)
            return x

        c8 = jax.jit(functools.partial(chain, k=8))
        c2 = jax.jit(functools.partial(chain, k=2))
        jax.block_until_ready(c8(rhs))
        jax.block_until_ready(c2(rhs))
        t = marginal_step_seconds(
            lambda: jax.block_until_ready(c8(rhs)),
            lambda: jax.block_until_ready(c2(rhs)), 8, 2, 3)
        _, st = s.solve_with_stats(rhs)
        print(f"\n== {prec} (bf16x{passes}) == composed solve "
              f"{t * 1e3:.2f} ms @ rel residual "
              f"{float(st.rel_residual):.2e}")
        print(f"   bounds/pass: HBM {hbm_ms:.2f} ms, MXU {mxu_ms:.2f} ms "
              f"(modal {2 * mxu_ms:.2f}); 5-pass totals: HBM "
              f"{5 * hbm_ms:.2f}, MXU {6 * mxu_ms:.2f}")

        f = jax.jit(s._solve_once)
        jax.block_until_ready(f(rhs))
        tdir = f"/tmp/fht_trace_{prec}_{N}"
        try:
            with jax.profiler.trace(tdir):
                jax.block_until_ready(f(rhs))
            tr = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)[0]
            d = json.load(gzip.open(tr))
            tot = collections.defaultdict(float)
            for e in d.get("traceEvents", []):
                if (e.get("ph") == "X" and "dur" in e
                        and e.get("name", "").startswith("_solve_once.")):
                    tot[e["name"]] += e["dur"] / 1e3
            names = ["fwd x", "fwd y", "modal z", "inv y", "inv x"]
            for lbl, k in zip(names, sorted(tot)):
                print(f"   {lbl:8s} {tot[k]:6.3f} ms")
        except Exception as e:
            print(f"   (trace unavailable: {str(e)[:120]})")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 512)
