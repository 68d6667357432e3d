"""Vmapped energy/gradient/Hessian evaluation and matrix-free operators.

This module replaces three reference layers at once (SURVEY.md §2.1-2.3):

  * SymX symbolic diff + JIT kernels  -> jax.grad / jax.hessian over vmap
    (SecondOrderCompiledPotential.cpp:66-69 derives grad+Hessian symbolically;
    here autodiff runs under XLA JIT),
  * thread-local accumulate + merge   -> jax.ops.segment_sum scatter
    (ElementHessians.h:22-104, Assembly.h:13-28),
  * BlockedSparseMatrix SpMV          -> matrix-free element Hessian-vector
    products (BlockedSparseMatrix.h spmxv): Hvp = scatter(H_e @ gather(v)),
    and the 3x3 block-diagonal preconditioner as a segment-sum of element
    diagonal blocks + batched 3x3 solve (BlockedSparseMatrix.h:150-226).

All functions here are pure and jittable; `data` is a dict
{family_name: {'conn': (E, arity) int32, 'rows': {... 'active': (E,)}}}.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, List

import jax
import jax.numpy as jnp

from .potential import PotentialFamily


def _gather(u, conn):
    # u: (n_blocks, 3); conn: (E, arity) -> (E, arity, 3)
    return u[conn]


def _active_mask(rows):
    return rows["active"] > 0.5


def make_evaluators(families: List[PotentialFamily], n_blocks: int):
    """Build the jittable evaluation closures for a fixed family set."""
    fam_by_name = {f.name: f for f in families}

    # Total energies accumulate in f64 even when the element math runs f32:
    # the Armijo test compares energy DIFFERENCES of order beta*g.du, which
    # f32 accumulation noise (~1e-7 * sum|e_i| over thousands of elements)
    # would otherwise drown — the line search then backtracks on noise.
    # The reference gets this for free from being all-double; on TPU the f64
    # reduce of an f32 element vector costs ~nothing next to the Hessians.
    _ACC = jnp.float64

    def energy(u, data, glob):
        E = jnp.zeros((), dtype=_ACC)
        for name, fd in data.items():
            fam = fam_by_name[name]
            u_e = _gather(u, fd["conn"])
            e = jax.vmap(fam.energy_fn, in_axes=(0, 0, None))(u_e, fd["rows"], glob)
            E = E + jnp.sum(jnp.where(_active_mask(fd["rows"]), e, 0.0).astype(_ACC))
        return E

    def energy_grad(u, data, glob):
        E = jnp.zeros((), dtype=_ACC)
        grad = jnp.zeros((n_blocks, 3), dtype=u.dtype)
        for name, fd in data.items():
            fam = fam_by_name[name]
            u_e = _gather(u, fd["conn"])
            e, g_e = jax.vmap(jax.value_and_grad(fam.energy_fn), in_axes=(0, 0, None))(
                u_e, fd["rows"], glob)
            mask = _active_mask(fd["rows"])
            E = E + jnp.sum(jnp.where(mask, e, 0.0).astype(_ACC))
            g_e = jnp.where(mask[:, None, None], g_e, 0.0)
            grad = grad + jax.ops.segment_sum(
                g_e.reshape(-1, 3), fd["conn"].reshape(-1), num_segments=n_blocks)
        return E, grad

    def energy_grad_hess(u, data, glob):
        """Returns (E, grad, {name: H (E, arity*3, arity*3)}). The per-family
        dense element Hessians play the role of ElementHessians chunk storage
        (ElementHessians.h:22-104) but stay on device, uniform per family."""
        E = jnp.zeros((), dtype=_ACC)
        grad = jnp.zeros((n_blocks, 3), dtype=u.dtype)
        hess: Dict[str, jnp.ndarray] = {}
        for name, fd in data.items():
            fam = fam_by_name[name]
            a = fam.arity
            u_e = _gather(u, fd["conn"])
            e_fn = fam.energy_fn
            e, g_e = jax.vmap(jax.value_and_grad(e_fn), in_axes=(0, 0, None))(
                u_e, fd["rows"], glob)
            H_e = jax.vmap(jax.hessian(e_fn), in_axes=(0, 0, None))(
                u_e, fd["rows"], glob)
            mask = _active_mask(fd["rows"])
            E = E + jnp.sum(jnp.where(mask, e, 0.0).astype(_ACC))
            g_e = jnp.where(mask[:, None, None], g_e, 0.0)
            grad = grad + jax.ops.segment_sum(
                g_e.reshape(-1, 3), fd["conn"].reshape(-1), num_segments=n_blocks)
            H_e = H_e.reshape(H_e.shape[0], a * 3, a * 3)
            H_e = jnp.where(mask[:, None, None], H_e, 0.0)
            # enforce exact symmetry (autodiff roundoff) like the reference's
            # symmetric Hessian derivation (diff.cpp:88-99)
            H_e = 0.5 * (H_e + jnp.swapaxes(H_e, 1, 2))
            hess[name] = H_e
        return E, grad, hess

    def hvp(p, data, hess):
        """q = H p, matrix-free (replaces bsm::spmxv, BlockedSparseMatrix.h:128-148)."""
        q = jnp.zeros((n_blocks, 3), dtype=p.dtype)
        for name, H_e in hess.items():
            fd = data[name]
            a = fam_by_name[name].arity
            p_e = _gather(p, fd["conn"]).reshape(-1, a * 3)
            q_e = jnp.einsum("eij,ej->ei", H_e, p_e)
            q = q + jax.ops.segment_sum(
                q_e.reshape(-1, 3), fd["conn"].reshape(-1), num_segments=n_blocks)
        return q

    def diag_blocks(data, hess):
        """3x3 diagonal blocks of the global Hessian (the BlockDiagonal
        preconditioner source, BlockedSparseMatrix.h:150-186)."""
        D = jnp.zeros((n_blocks, 3, 3), dtype=next(iter(hess.values())).dtype) \
            if hess else jnp.zeros((n_blocks, 3, 3))
        for name, H_e in hess.items():
            fd = data[name]
            a = fam_by_name[name].arity
            E_n = H_e.shape[0]
            Hb = H_e.reshape(E_n, a, 3, a, 3)
            # (E, arity, 3, 3) diagonal sub-blocks
            d_e = jnp.einsum("eiaib->eiab", Hb)
            D = D + jax.ops.segment_sum(
                d_e.reshape(-1, 3, 3), fd["conn"].reshape(-1), num_segments=n_blocks)
        return D

    return energy, energy_grad, energy_grad_hess, hvp, diag_blocks


def precondition_inverse(D, eps: float = 1e-30):
    """Batched inverse of the 3x3 diagonal blocks with identity fallback for
    empty/singular blocks (untouched DOF blocks have D=0; the reference never
    hits this because every DOF carries inertia, but padding safety matters
    here). Mirrors prepare_preconditioning (BlockedSparseMatrix.h:150-186)."""
    det = jnp.linalg.det(D)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=D.dtype), D.shape)
    ok = jnp.abs(det) > eps
    D_safe = jnp.where(ok[:, None, None], D, eye)
    Dinv = jnp.linalg.inv(D_safe)
    return jnp.where(ok[:, None, None], Dinv, eye)


def apply_preconditioner(Dinv, r):
    # r: (n_blocks, 3)
    return jnp.einsum("bij,bj->bi", Dinv, r)
