"""Dense direct-solve feasibility at bench scale (n_blocks~1100, 3300 DOF):
scatter assembly + Jacobi-scaled Cholesky + solve vs the CG loop."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

_ = np.asarray(jnp.ones(4))
k0 = jax.random.PRNGKey(0)


def t(label, fn, n=8):
    out = fn(); jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter(); out = fn(); jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    print(f"  {label:<52} {min(ts)*1000:9.2f} ms", flush=True)
    return out


N = 1100           # blocks
n = 3 * N          # dof
E = 14336          # consolidated element rows
b = 5              # arity bucket
d = 3 * b

conn = jax.random.randint(k0, (E, b), 0, N, dtype=jnp.int32)
Hh = jax.random.normal(k0, (E, d, d), jnp.float32) * 0.1
He = jnp.einsum("eij,ekj->eik", Hh, Hh)  # SPD-ish blocks
g = jax.random.normal(k0, (N, 3), jnp.float32)


def assemble_dense(conn, He):
    # flat scatter of all (d x d) element entries into (n, n)
    rows3 = (conn[:, :, None] * 3 + jnp.arange(3)[None, None, :]).reshape(E, d)
    ri = jnp.broadcast_to(rows3[:, :, None], (E, d, d)).reshape(-1)
    ci = jnp.broadcast_to(rows3[:, None, :], (E, d, d)).reshape(-1)
    flat = ri.astype(jnp.int32) * n + ci.astype(jnp.int32)
    Hd = jax.ops.segment_sum(He.reshape(-1), flat, num_segments=n * n)
    return Hd.reshape(n, n)


asm = jax.jit(assemble_dense)
Hd = t(f"dense scatter assembly E={E} n={n}", lambda: asm(conn, He))

Hd = Hd + 10.0 * jnp.eye(n)  # make it solidly SPD for chol


def direct_solve(Hd, g):
    dg = jnp.diagonal(Hd)
    s = lax.rsqrt(jnp.maximum(dg, 1e-30))
    Hs = Hd * s[:, None] * s[None, :]
    L = lax.linalg.cholesky(Hs)
    y = lax.linalg.triangular_solve(L, (g.reshape(-1) * s)[:, None],
                                    left_side=True, lower=True)
    x = lax.linalg.triangular_solve(L, y, left_side=True, lower=True,
                                    transpose_a=True)
    return (x[:, 0] * s).reshape(N, 3)


ds = jax.jit(direct_solve)
x = t("jacobi-scaled cholesky + 2 trisolves", lambda: ds(Hd, g))

chol = jax.jit(lambda H: lax.linalg.cholesky(H))
t(f"cholesky alone n={n}", lambda: chol(Hd))

# accuracy
r = Hd @ x.reshape(-1) - g.reshape(-1)
print("    rel resid:", float(jnp.linalg.norm(r) / jnp.linalg.norm(g.reshape(-1))),
      flush=True)

# loop form (device-only per-solve cost)
def loop_solve(Hd, g, iters):
    def body(i, acc):
        return acc + direct_solve(Hd + acc[0, 0] * 0.0, g)[0, 0] * 1e-30
    return lax.fori_loop(0, iters, body, jnp.zeros((1, 1)))


ls = jax.jit(loop_solve, static_argnums=2)
t2 = t("direct solve loop x10", lambda: ls(Hd, g, 10), n=4)

# CG comparison at same shapes: 100 iterations of (gather+einsum+onehot)
def cg_like(p, conn, He, iters):
    p_pad = jnp.concatenate([p, jnp.zeros((1, 3))])
    def body(i, p):
        pe = p[conn].reshape(E, d)
        qe = jnp.einsum("eij,ej->ei", He, pe).reshape(-1, 3)
        rows = conn.reshape(-1)
        oh = (rows[:, None] == jnp.arange(N, dtype=jnp.int32)[None, :]).astype(qe.dtype)
        q = lax.dot_general(oh, qe, (((0,), (0,)), ((), ())),
                            precision=lax.Precision.HIGHEST)
        return q / (1.0 + jnp.max(jnp.abs(q)))
    return lax.fori_loop(0, iters, body, p)


cg = jax.jit(cg_like, static_argnums=3)
t("hvp-only loop x100 (CG core)", lambda: cg(g, conn, He, 100), n=4)
