"""Projection of element Hessians to positive definiteness.

Reference: /root/reference/stark/extern/symx/src/solver/second_order/project_to_PD.cpp:12-48
(per-element symmetric eigendecomposition; eigenvalues below eps are clamped
to eps or mirrored to -lambda) driven by four modes in NewtonsMethod::
_project_and_assemble (NewtonsMethod.cpp:254-352). Here the eigendecomposition
is a batched `jnp.linalg.eigh` over each family's (E, d, d) stack — one fused
XLA kernel per family instead of millions of scalar Eigen solves.
"""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp


def project_family_to_pd(H, eps: float, mirroring: bool, elem_mask=None):
    """Project a (E, d, d) stack of symmetric matrices to PD.

    Returns (H_projected, changed) where changed marks elements whose
    eigenvalues were modified (for the reference's `ph%` statistic,
    NewtonsMethod.cpp:199-206). elem_mask restricts projection to selected
    elements (PPN selective mode)."""
    w, V = jnp.linalg.eigh(H)
    below = w < eps
    w_new = jnp.where(below, jnp.where(mirroring, -w, eps), w)
    Hp = jnp.einsum("eij,ej,ekj->eik", V, w_new, V)
    changed = jnp.any(below, axis=-1)
    if elem_mask is not None:
        changed = jnp.logical_and(changed, elem_mask)
        sel = jnp.logical_and(jnp.any(below, axis=-1), elem_mask)
    else:
        sel = jnp.any(below, axis=-1)
    H_out = jnp.where(sel[:, None, None], Hp, H)
    return H_out, changed


def project_all(hess: Dict[str, jnp.ndarray], eps: float, mirroring: bool,
                data=None):
    """ProjectedNewton mode: project every element Hessian
    (ElementHessians project_to_PD_inplace__all). `data` restricts the
    changed-count to active rows (padded zero Hessians always "change")."""
    out = {}
    n_changed = jnp.zeros((), dtype=jnp.int32)
    for name, H in hess.items():
        Hp, changed = project_family_to_pd(H, eps, mirroring)
        out[name] = Hp
        if data is not None:
            changed = jnp.logical_and(changed, data[name]["rows"]["active"] > 0.5)
        n_changed = n_changed + jnp.sum(changed.astype(jnp.int32))
    return out, n_changed


def project_selective(hess: Dict[str, jnp.ndarray], data, eps: float,
                      mirroring: bool, block_mask):
    """Progressive (PPN) mode: project only elements touching DOF blocks whose
    gradient magnitude exceeds the threshold (NewtonsMethod.cpp:310-334).
    block_mask: (n_blocks,) bool."""
    out = {}
    n_changed = jnp.zeros((), dtype=jnp.int32)
    for name, H in hess.items():
        conn = data[name]["conn"]
        elem_mask = jnp.logical_and(jnp.any(block_mask[conn], axis=1),
                                    data[name]["rows"]["active"] > 0.5)
        Hp, changed = project_family_to_pd(H, eps, mirroring, elem_mask)
        out[name] = Hp
        n_changed = n_changed + jnp.sum(changed.astype(jnp.int32))
    return out, n_changed


def count_elements(hess: Dict[str, jnp.ndarray], data) -> jnp.ndarray:
    n = jnp.zeros((), dtype=jnp.int32)
    for name in hess:
        active = data[name]["rows"]["active"] > 0.5
        n = n + jnp.sum(active.astype(jnp.int32))
    return n
