"""Differentiable contact/friction element energies (filled by stage 4).

Placeholder module: `make_families` returns the dynamic PotentialFamily set.
Implemented together with the collision engine.
"""
from __future__ import annotations


def make_families(model):
    # populated when the collision engine lands (stage 4 of SURVEY.md §7)
    return {}
