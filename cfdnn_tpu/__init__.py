"""cfdnn_tpu — TPU-native incompressible Navier-Stokes framework.

A ground-up JAX/XLA/Pallas rebuild of the capability surface of the
comp-physics/cfd-nn reference solver (fractional-step projection on a
staggered MAC grid, FFT/MG pressure solvers, 15 turbulence closures, IBM,
recycling inflow), designed for TPU: device-resident state pytrees, one jitted
step, MXU-batched NN inference, shard_map/GSPMD multi-chip scaling.
"""

import os as _os


def enable_compilation_cache():
    """Persistent XLA compile cache (opt-out: CFDNN_NO_COMPILE_CACHE=1).

    Called lazily from Simulation construction (NOT at import — mutating
    process-global JAX config as an import side effect surprises host
    applications embedding the library next to other JAX code); call it
    directly when using the Poisson/operator layers standalone.

    Large-grid Pallas kernels cost minutes of one-time Mosaic compile
    (the 512^3 2-D-tiled predictor alone is ~5 min); caching makes every
    later process with the same shapes start in seconds. No reference
    analogue — nvcc compiles ahead of time; XLA compiles per shape.
    Notes: deployments whose PJRT plugin compiles on a remote service may
    bypass this client-side cache, and CPU runs (e.g. the f64 validation
    suite) are deliberately NOT cached — see below."""
    if _os.environ.get("CFDNN_NO_COMPILE_CACHE"):
        return
    import jax
    plats = (_os.environ.get("JAX_PLATFORMS", "")
             + "," + str(jax.config.jax_platforms or ""))
    if "cpu" in plats.lower():
        # CPU AOT cache entries encode the compile host's microarch
        # features; loading them on a different machine (shared home dir,
        # remote-compile helper) warns of machine-type mismatch and "could
        # lead to SIGILL". CPU compiles are cheap anyway — cache only
        # accelerator programs.
        return
    if jax.config.jax_compilation_cache_dir:
        return   # user already configured one
    cache = _os.path.join(_os.path.expanduser("~"), ".cache", "cfdnn_tpu",
                          "xla")
    try:
        _os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        # cache everything that took >1s to compile, regardless of size
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass   # cache is an optimization, never a requirement


from .config import (BCType, Config, ConvectiveScheme, PoissonSolverType,
                     SimulationMode, TimeIntegrator, TurbulenceModel)
from .fields import (State, init_poiseuille, init_taylor_green,
                     init_turbulent_channel, perturbed_channel,
                     poiseuille_exact, zero_state)
from .mesh import Mesh
from .solver import Simulation, StepDiagnostics

__version__ = "0.2.0"

__all__ = [
    "BCType", "Config", "ConvectiveScheme", "PoissonSolverType",
    "SimulationMode", "TimeIntegrator", "TurbulenceModel",
    "State", "Mesh", "Simulation", "StepDiagnostics",
    "init_poiseuille", "init_taylor_green", "init_turbulent_channel",
    "perturbed_channel",
    "poiseuille_exact", "zero_state",
]
