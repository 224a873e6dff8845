"""Immersed-boundary method: SDF bodies + direct forcing (SURVEY 2.7)."""

from .forcing import IBMForcing
from .geometry import (BackwardStepBody, CylinderBody, IBMBody, NACABody,
                       PeriodicHillBody, SphereBody, StepBody,
                       create_ibm_body)

__all__ = [
    "IBMForcing", "IBMBody", "CylinderBody", "SphereBody", "NACABody",
    "StepBody", "BackwardStepBody", "PeriodicHillBody", "create_ibm_body",
]
