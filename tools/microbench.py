"""Micro-benchmarks for TPU-native primitive choices (round 4 perf work).

Answers:
  1. one-hot matmul scatter: q[n] += sum over rows r with block[r]==n of v[r]
     vs segment_sum vs gather-table — does XLA fuse the one-hot into the dot?
  2. per-row compaction: row-cumsum + one-hot matmul slot-select vs global
     compact_indices.
  3. parallel-order Jacobi via batched matmuls vs serial .at[] Jacobi.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

DISPATCH_FLOOR = None


def timeit(label, fn, n=20):
    out = fn()
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    extra = ""
    if DISPATCH_FLOOR is not None:
        extra = f"   (device ~{(dt-DISPATCH_FLOOR)*1000:8.3f} ms)"
    print(f"  {label:<52} {dt*1000:9.3f} ms{extra}", flush=True)
    return dt


def main():
    global DISPATCH_FLOOR
    key = jax.random.PRNGKey(0)
    dev = jax.devices()[0]
    print("device:", dev, flush=True)

    nop = jax.jit(lambda x: x + 1.0)
    x0 = jnp.zeros((8,))
    DISPATCH_FLOOR = timeit("dispatch floor (x+1 on (8,))", lambda: nop(x0))

    # ---------------- scatter strategies ----------------
    R, N = 98304, 1100   # flat rows -> blocks
    rows = jax.random.randint(key, (R,), 0, N, dtype=jnp.int32)
    vals = jax.random.normal(key, (R, 3), dtype=jnp.float32)

    seg = jax.jit(lambda r, v: jax.ops.segment_sum(v, r, num_segments=N))
    timeit(f"segment_sum R={R} N={N}", lambda: seg(rows, vals))

    def onehot_scatter(r, v):
        oh = (r[:, None] == jnp.arange(N, dtype=jnp.int32)[None, :])
        return jnp.einsum("rn,rc->nc", oh.astype(v.dtype), v)

    oh1 = jax.jit(onehot_scatter)
    timeit(f"one-hot matmul scatter R={R} N={N}", lambda: oh1(rows, vals))

    def onehot_scatter_chunk(r, v, chunk=16384):
        q = jnp.zeros((N, 3), v.dtype)
        for i in range(0, R, chunk):
            rc = r[i:i + chunk]
            oh = (rc[:, None] == jnp.arange(N, dtype=jnp.int32)[None, :])
            q = q + jnp.einsum("rn,rc->nc", oh.astype(v.dtype), v[i:i + chunk])
        return q

    oh2 = jax.jit(onehot_scatter_chunk)
    timeit("one-hot matmul scatter chunked 16k", lambda: oh2(rows, vals))

    # correctness
    a = seg(rows, vals)
    b = oh1(rows, vals)
    print("    scatter max err:", float(jnp.max(jnp.abs(a - b))), flush=True)

    # ---------------- per-row compaction ----------------
    Nq, M, K = 3136, 3136, 64
    mask = jax.random.uniform(key, (Nq, M)) < (40.0 / M)   # ~40 true per row

    def row_compact_onehot(mask):
        c = jnp.cumsum(mask.astype(jnp.int32), axis=1)
        slot = jnp.where(mask, c - 1, K)           # K = invalid
        slot = jnp.minimum(slot, K)
        oh = (slot[:, :, None] == jnp.arange(K)[None, None, :])
        m_idx = jnp.arange(M, dtype=jnp.float32)
        ct = jnp.einsum("qmk,m->qk", oh.astype(jnp.float32), m_idx)
        return ct.astype(jnp.int32), c[:, -1]

    rc1 = jax.jit(row_compact_onehot)
    timeit(f"row compact one-hot ({Nq}x{M} K={K})", lambda: rc1(mask))

    def row_compact_sortbased(mask):
        # top-K by sorting keys (slot where mask else big), ascending
        c = jnp.cumsum(mask.astype(jnp.int32), axis=1)
        key = jnp.where(mask, c - 1, M + 1)
        idx = jnp.argsort(key, axis=1)[:, :K]
        return idx.astype(jnp.int32), c[:, -1]

    rc2 = jax.jit(row_compact_sortbased)
    timeit(f"row compact argsort ({Nq}x{M} K={K})", lambda: rc2(mask))

    from stark_tpu.ops.compaction import compact_indices
    gc = jax.jit(lambda m: compact_indices(m.ravel(), 524288))
    timeit(f"global compact_indices ({Nq*M} cap 524288)", lambda: gc(mask))
    gc2 = jax.jit(lambda m: compact_indices(m.ravel(), 131072))
    timeit(f"global compact_indices ({Nq*M} cap 131072)", lambda: gc2(mask))

    i1, c1 = rc1(mask)
    i2, c2 = rc2(mask)
    # compare as sets per row where count <= K
    print("    row compact equal:",
          bool(jnp.all(jnp.where((jnp.arange(K)[None, :] <
                                  jnp.minimum(c1, K)[:, None]),
                                 i1 == i2, True))), flush=True)

    # ---------------- Jacobi strategies ----------------
    E, d = 16384, 12
    A = jax.random.normal(key, (E, d, d), jnp.float32)
    A = 0.5 * (A + jnp.swapaxes(A, 1, 2))

    from stark_tpu.solver.project import _jacobi_eigh
    j1 = jax.jit(lambda A: _jacobi_eigh(A, 8))
    timeit(f"serial Jacobi 8 sweeps (E={E}, d={d})", lambda: j1(A))

    def parallel_jacobi(A, sweeps=8):
        # round-robin parallel ordering: d-1 rounds of d/2 disjoint pairs
        n = A.shape[-1]
        # build static round-robin schedule
        idx = list(range(n))
        rounds = []
        for _ in range(n - 1):
            pairs = [(idx[i], idx[n - 1 - i]) for i in range(n // 2)]
            pairs = [(min(p, q), max(p, q)) for p, q in pairs]
            rounds.append(pairs)
            idx = [idx[0]] + [idx[-1]] + idx[1:-1]
        V = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), A.shape)

        def sweep(carry, _):
            A, V = carry
            for pairs in rounds:
                p_idx = jnp.array([p for p, q in pairs])
                q_idx = jnp.array([q for p, q in pairs])
                app = A[:, p_idx, p_idx]
                aqq = A[:, q_idx, q_idx]
                apq = A[:, p_idx, q_idx]
                theta = 0.5 * jnp.arctan2(2.0 * apq, aqq - app)
                c = jnp.cos(theta)   # (E, n/2)
                s = jnp.sin(theta)
                # rotation matrix J: identity with c/s at (p,p),(q,q),(p,q),(q,p)
                J = jnp.zeros_like(A)
                J = J.at[:, p_idx, p_idx].set(c)
                J = J.at[:, q_idx, q_idx].set(c)
                J = J.at[:, p_idx, q_idx].set(-s)
                J = J.at[:, q_idx, p_idx].set(s)
                A = jnp.einsum("eij,ejk,elk->eil", J, A, J)
                V = jnp.einsum("eij,ekj->eik", V, J)
            return (A, V), None

        (A, V), _ = jax.lax.scan(sweep, (A, V), None, length=sweeps)
        w = jnp.diagonal(A, axis1=1, axis2=2)
        return w, V

    j2 = jax.jit(lambda A: parallel_jacobi(A, 8))
    timeit(f"parallel matmul Jacobi 8 sweeps (E={E}, d={d})", lambda: j2(A))

    w1, V1 = j1(A)
    w2, V2 = j2(A)
    we = jnp.linalg.eigh(A)[0]
    print("    serial eig err:", float(jnp.max(jnp.abs(jnp.sort(w1, -1) - we))), flush=True)
    print("    parallel eig err:", float(jnp.max(jnp.abs(jnp.sort(w2, -1) - we))), flush=True)

    eigh_x = jax.jit(lambda A: jnp.linalg.eigh(A))
    timeit(f"jnp.linalg.eigh (E={E}, d={d})", lambda: eigh_x(A))

    # ---------------- argsort baseline ----------------
    keys_ = jax.random.randint(key, (45056,), 0, 1 << 20, dtype=jnp.int32)
    srt = jax.jit(jnp.argsort)
    timeit("argsort 45k int32", lambda: srt(keys_))
    keys2 = jax.random.randint(key, (98304,), 0, 1 << 20, dtype=jnp.int32)
    timeit("argsort 98k int32", lambda: srt(keys2))


if __name__ == "__main__":
    main()
