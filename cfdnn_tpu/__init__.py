"""cfdnn_tpu — TPU-native incompressible Navier-Stokes framework.

A ground-up JAX/XLA/Pallas rebuild of the capability surface of the
comp-physics/cfd-nn reference solver (fractional-step projection on a
staggered MAC grid, FFT/MG pressure solvers, 15 turbulence closures, IBM,
recycling inflow), designed for TPU: device-resident state pytrees, one jitted
step, MXU-batched NN inference, shard_map/GSPMD multi-chip scaling.
"""

from .config import (BCType, Config, ConvectiveScheme, PoissonSolverType,
                     SimulationMode, TimeIntegrator, TurbulenceModel)
from .fields import (State, init_poiseuille, init_taylor_green,
                     init_turbulent_channel, perturbed_channel,
                     poiseuille_exact, zero_state)
from .mesh import Mesh
from .solver import Simulation, StepDiagnostics

__version__ = "0.1.0"

__all__ = [
    "BCType", "Config", "ConvectiveScheme", "PoissonSolverType",
    "SimulationMode", "TimeIntegrator", "TurbulenceModel",
    "State", "Mesh", "Simulation", "StepDiagnostics",
    "init_poiseuille", "init_taylor_green", "init_turbulent_channel",
    "perturbed_channel",
    "poiseuille_exact", "zero_state",
]
