"""Matrix-free block-diagonal-preconditioned conjugate gradient.

Reference: /root/reference/stark/extern/symx/extern/BlockedSparseMatrix/include/
BlockedSparseMatrix/solve_pcg.h:82-240 — monolithic PCG with fused x/r update,
error = sqrt(r^2/b^2) tested against abs_tol and error/error_0 against rel_tol,
and indefiniteness detection pAp <= 0 with optional early stop. Here the solve
runs as one `lax.while_loop` on device; SpMV is the matrix-free element-Hessian
product and all dot products reduce on device (psum over shards when sharded).
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class PCGResult(NamedTuple):
    x: jnp.ndarray           # (n_blocks, 3)
    converged: jnp.ndarray   # bool scalar
    n_iterations: jnp.ndarray
    error: jnp.ndarray
    found_indefiniteness: jnp.ndarray


def _dot(a, b):
    return jnp.vdot(a, b)


def solve_pcg(A: Callable, Minv: Callable, b, abs_tol, rel_tol,
              max_iter: int, stop_on_indef: bool) -> PCGResult:
    """Solve A x = b with PCG from x0 = 0 (NewtonsMethod.cpp:428-430 zeroes
    the initial guess each Newton iteration)."""
    dtype = b.dtype
    b_norm_sq = _dot(b, b)

    # Zero-RHS early out (solve_pcg.h:118-126)
    zero_rhs = b_norm_sq < abs_tol * abs_tol

    # x0 = 0 -> r0 = b
    r0 = b
    z0 = Minv(r0)
    rz0 = _dot(r0, z0)
    err0 = jnp.sqrt(jnp.maximum(_dot(r0, r0) / jnp.maximum(b_norm_sq, 1e-300), 0.0))

    class Carry(NamedTuple):
        x: jnp.ndarray
        r: jnp.ndarray
        p: jnp.ndarray
        rz: jnp.ndarray
        it: jnp.ndarray
        error: jnp.ndarray
        done: jnp.ndarray
        converged: jnp.ndarray
        indefinite: jnp.ndarray

    init = Carry(
        x=jnp.zeros_like(b), r=r0, p=z0, rz=rz0,
        it=jnp.zeros((), jnp.int32), error=err0,
        done=jnp.logical_or(zero_rhs, err0 < abs_tol),
        converged=jnp.logical_or(zero_rhs, err0 < abs_tol),
        indefinite=jnp.zeros((), bool),
    )

    def cond(c: Carry):
        return jnp.logical_and(jnp.logical_not(c.done), c.it < max_iter)

    def body(c: Carry):
        Ap = A(c.p)
        pAp = _dot(c.p, Ap)
        indefinite = pAp <= 0.0
        stop_indef = jnp.logical_and(indefinite, stop_on_indef)

        alpha = c.rz / jnp.where(pAp == 0.0, 1e-300, pAp)
        x = c.x + alpha * c.p
        r = c.r - alpha * Ap
        error = jnp.sqrt(_dot(r, r) / jnp.maximum(b_norm_sq, 1e-300))
        conv = jnp.logical_or(error < abs_tol,
                              error / jnp.maximum(err0, 1e-300) < rel_tol)

        z = Minv(r)
        rz_new = _dot(r, z)
        beta = rz_new / jnp.where(c.rz == 0.0, 1e-300, c.rz)
        p = z + beta * c.p

        # On indefinite stop, keep the pre-update x like the reference
        # (solve_pcg.h:183-192 returns x before applying alpha)
        x_out = jnp.where(stop_indef, c.x, x)
        done = jnp.logical_or(conv, stop_indef)
        return Carry(
            x=x_out, r=r, p=p, rz=rz_new, it=c.it + 1,
            error=jnp.where(stop_indef, c.error, error),
            done=done,
            converged=jnp.logical_and(conv, jnp.logical_not(stop_indef)),
            indefinite=jnp.logical_or(c.indefinite, indefinite),
        )

    final = lax.while_loop(cond, body, init)
    return PCGResult(
        x=final.x,
        converged=final.converged,
        n_iterations=final.it,
        error=final.error,
        found_indefiniteness=final.indefinite,
    )
