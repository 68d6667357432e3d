"""Deformables aggregate: one object owning all deformable energy models.

Reference: /root/reference/stark/src/models/deformables/Deformables.h:7-24 —
point_sets + lumped_inertia + prescribed_positions + segment_strain +
triangle_strain + discrete_shells + tet_strain + output.
"""
from __future__ import annotations

from ..point_dynamics import PointDynamics
from .energies import (EnergyDiscreteShells, EnergyLumpedInertia,
                       EnergyPrescribedPositions, EnergySegmentStrain,
                       EnergyTetStrain, EnergyTriangleStrain)


class Deformables:
    def __init__(self, stark, dyn: PointDynamics):
        self.point_sets = dyn
        self.lumped_inertia = EnergyLumpedInertia(stark, dyn)
        self.prescribed_positions = EnergyPrescribedPositions(stark, dyn)
        self.segment_strain = EnergySegmentStrain(stark, dyn)
        self.triangle_strain = EnergyTriangleStrain(stark, dyn)
        self.discrete_shells = EnergyDiscreteShells(stark, dyn)
        self.tet_strain = EnergyTetStrain(stark, dyn)
        from .output import DeformablesMeshOutput
        self.output = DeformablesMeshOutput(stark, dyn)
