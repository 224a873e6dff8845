"""Output layer: legacy VTK snapshots + text profiles (SURVEY 2.8 VTK)."""

from .vtk import read_vtk_scalars, write_profiles, write_vtk

__all__ = ["write_vtk", "write_profiles", "read_vtk_scalars"]
