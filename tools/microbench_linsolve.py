"""Microbenchmarks guiding the direct-solve redesign: cholesky, triangular
solves (1 vs n RHS), explicit inverse, argsort, segmented scan, scatter
variants, at bench-scene scale (n=3273, R2~200k).

Usage: python tools/microbench_linsolve.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

FLOOR = None


def timeit(label, fn, n=10):
    """fn must return device array(s); we reduce to a scalar INSIDE the
    timed region via a tiny follow-up jit... no — the caller should return
    small outputs. On axon, block_until_ready returns early for in-flight
    fast dispatches; jax.device_get is the only reliable sync, so each
    sample times fn() + device_get of its (small) output and the dispatch
    floor (measured the same way) is subtracted."""
    out = fn()
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        ts.append(time.perf_counter() - t0)
    dt = min(ts) * 1000
    extra = f" (dev ~{dt - FLOOR:7.3f})" if FLOOR else ""
    print(f"  {label:<52} {dt:10.3f} ms{extra}", flush=True)
    return dt


def main():
    global FLOOR
    n = 3273
    R2 = 205800
    key = jax.random.PRNGKey(0)
    # SPD matrix
    A = jax.random.normal(key, (n, n), jnp.float32) * 0.01
    H = A @ A.T + 10.0 * jnp.eye(n)
    g = jax.random.normal(key, (n,), jnp.float32)
    vals = jax.random.normal(key, (R2, 9), jnp.float32)
    pid = jax.random.randint(key, (R2,), 0, 30000, jnp.int32)

    FLOOR = timeit("dispatch floor (tiny add)",
                   (lambda _c: (lambda: _c(g)))(jax.jit(lambda x: x + 1.0).lower(g).compile()))
    f = jax.jit(lambda H: jax.lax.linalg.cholesky(H))
    timeit("cholesky n=3273", lambda: f(H))
    L = f(H)
    ts1 = jax.jit(lambda L, b: jax.lax.linalg.triangular_solve(
        L, b, left_side=True, lower=True))
    b1 = g[:, None]
    timeit("triangular_solve 1 rhs", lambda: ts1(L, b1))
    bn = jnp.eye(n, dtype=jnp.float32)
    timeit("triangular_solve n rhs (invert L)", lambda: ts1(L, bn))

    def chol_solve(H, g):
        L = jax.lax.linalg.cholesky(H)
        y = jax.lax.linalg.triangular_solve(L, g[:, None], left_side=True, lower=True)
        x = jax.lax.linalg.triangular_solve(L, y, left_side=True, lower=True,
                                            transpose_a=True)
        return x

    timeit("cholesky + 2 trisolve (full direct)", (lambda _c: (lambda: _c(H, g)))(jax.jit(chol_solve).lower(H, g).compile()))

    def chol_inv(H):
        L = jax.lax.linalg.cholesky(H)
        Li = jax.lax.linalg.triangular_solve(
            L, jnp.eye(n, dtype=jnp.float32), left_side=True, lower=True)
        return Li.T @ Li

    timeit("cholesky + invert (per-rebuild cost)", (lambda _c: (lambda: _c(H)))(jax.jit(chol_inv).lower(H).compile()))
    Hi = jax.jit(chol_inv)(H)
    timeit("dense matvec n=3273 (per-CG precond)",
           (lambda _c: (lambda: _c(Hi, g)))(jax.jit(lambda Hi, g: Hi @ g).lower(Hi, g).compile()))

    timeit("argsort R2=205800 int32",
           (lambda _c: (lambda: _c(pid)))(jax.jit(lambda p: jnp.argsort(p)).lower(pid).compile()))
    timeit("sort R2=205800 int32 (no indices)",
           (lambda _c: (lambda: _c(pid)))(jax.jit(lambda p: jnp.sort(p)).lower(pid).compile()))

    # segmented inclusive scan via log-shift passes
    def segscan(v, flags):
        d = 1
        Ln = v.shape[0]
        while d < Ln:
            vs = jnp.concatenate([jnp.zeros((d, v.shape[1]), v.dtype), v[:-d]])
            fs = jnp.concatenate([jnp.ones((d,), bool), flags[:-d]])
            v = v + jnp.where(flags[:, None], 0.0, vs)
            flags = flags | fs
            d *= 2
        return v

    flags = pid != jnp.concatenate([jnp.full((1,), -1, jnp.int32), pid[:-1]])
    timeit("segmented scan R2x9 (18 passes)",
           (lambda _c: (lambda: _c(vals, flags)))(jax.jit(segscan).lower(vals, flags).compile()))

    # f64 cumsum comparison (the current design)
    timeit("f64 cumsum R2x9 (current)",
           (lambda _c: (lambda: _c(vals)))(jax.jit(lambda v: jnp.cumsum(v.astype(jnp.float64), axis=0)).lower(vals).compile()))
    timeit("f32 cumsum R2x9",
           (lambda _c: (lambda: _c(vals)))(jax.jit(lambda v: jnp.cumsum(v, axis=0)).lower(vals).compile()))

    # scatter costs
    N1 = 1092
    idx16 = jax.random.randint(key, (16384,), 0, N1 * N1, jnp.int32)
    v16 = jax.random.normal(key, (16384, 9), jnp.float32)
    timeit("scatter-set 16k rows x9 into N1^2",
           (lambda _c: (lambda: _c(idx16, v16)))(jax.jit(lambda i, v: jnp.zeros((N1 * N1, 9), jnp.float32).at[i].set(v)).lower(idx16, v16).compile()))
    idx64 = jax.random.randint(key, (65536,), 0, N1 * N1, jnp.int32)
    v64 = jax.random.normal(key, (65536, 9), jnp.float32)
    timeit("scatter-set 65k rows x9 into N1^2",
           (lambda _c: (lambda: _c(idx64, v64)))(jax.jit(lambda i, v: jnp.zeros((N1 * N1, 9), jnp.float32).at[i].set(v)).lower(idx64, v64).compile()))
    idx51 = jax.random.randint(key, (51200,), 0, N1 * N1, jnp.int32)
    v51 = jax.random.normal(key, (51200, 9), jnp.float32)
    timeit("scatter-ADD 51k rows x9 into N1^2",
           (lambda _c: (lambda: _c(idx51, v51)))(jax.jit(lambda i, v: jnp.zeros((N1 * N1, 9), jnp.float32).at[i].add(v)).lower(idx51, v51).compile()))

    # the transpose that direct_solve pays: (N1,N1,3,3) -> (n,n)
    D4 = jax.random.normal(key, (N1, N1, 3, 3), jnp.float32)
    timeit("transpose (N1,N1,3,3)->(3N1,3N1)",
           (lambda _c: (lambda: _c(D4)))(jax.jit(lambda D: D.transpose(0, 2, 1, 3).reshape(3 * N1, 3 * N1)).lower(D4).compile()))

    # gather of 205800 rows x9 by precomputed order
    order = jax.random.permutation(key, R2).astype(jnp.int32)
    timeit("gather R2 rows x9 by order",
           (lambda _c: (lambda: _c(vals, order)))(jax.jit(lambda v, o: v[o]).lower(vals, order).compile()))

    # one CG iteration cost at this scale (hvp via one-hot + gather)
    conn = jax.random.randint(key, (8232, 5), 0, N1, jnp.int32)
    Hc = jax.random.normal(key, (8232, 15, 15), jnp.float32)
    rows = conn.reshape(-1)
    p = jax.random.normal(key, (N1 - 1, 3), jnp.float32)

    def hvp(p, conn, Hc, rows):
        p_pad = jnp.concatenate([p, jnp.zeros((1, 3), p.dtype)])
        p_e = p_pad[conn].reshape(-1, 15)
        q_e = jnp.einsum("eij,ej->ei", Hc, p_e).reshape(-1, 3)
        oh = (rows[:, None] == jnp.arange(N1, dtype=rows.dtype)[None, :]
              ).astype(q_e.dtype)
        q = jax.lax.dot_general(oh, q_e, (((0,), (0,)), ((), ())),
                                precision=jax.lax.Precision.HIGHEST)
        return q[:-1]

    timeit("one hvp (gather+einsum+onehot scatter)",
           (lambda _c: (lambda: _c(p, conn, Hc, rows)))(jax.jit(hvp).lower(p, conn, Hc, rows).compile()))

    def cg10(p, conn, Hc, rows):
        def body(i, x):
            return hvp(x, conn, Hc, rows) * 0.999 + p
        return jax.lax.fori_loop(0, 10, body, p)

    t10 = timeit("10 chained hvps", (lambda _c: (lambda: _c(p, conn, Hc, rows)))(jax.jit(cg10).lower(p, conn, Hc, rows).compile()))

    def cg100(p, conn, Hc, rows):
        def body(i, x):
            return hvp(x, conn, Hc, rows) * 0.999 + p
        return jax.lax.fori_loop(0, 100, body, p)

    t100 = timeit("100 chained hvps", (lambda _c: (lambda: _c(p, conn, Hc, rows)))(jax.jit(cg100).lower(p, conn, Hc, rows).compile()))
    print(f"    -> per hvp: {(t100 - t10) / 90:.4f} ms")


if __name__ == "__main__":
    main()
