"""Benchmark candidate primitives for the round-4 redesign.

All timings in DEGRADED dispatch mode (trigger a d2h first) so numbers
reflect in-sim reality; device time = wall - ~25ms floor. Loops run inside
one jit via lax.fori_loop where per-call device time < the floor.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

k0 = jax.random.PRNGKey(0)
# trigger degradation once so every measurement includes the same floor
_ = np.asarray(jnp.ones((4,)))
FLOOR = None


def timeit(label, fn, n=8):
    out = fn(); jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter(); out = fn(); jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    dt = min(ts) * 1000
    dev = dt - (FLOOR or 0.0)
    print(f"  {label:<56} {dt:9.3f} ms   dev~{dev:9.3f}", flush=True)
    return dt


f0 = jax.jit(lambda x: x + 1.0)
px = jnp.zeros((8,), jnp.float32)
FLOOR = timeit("floor", lambda: f0(px))

# ---------------- segment_sum in a loop (pure device per-iter) ----------
R, N = 98304, 1100
rows = jax.random.randint(k0, (R,), 0, N, dtype=jnp.int32)
vals = jax.random.normal(k0, (R, 3), jnp.float32)


def seg_loop(rows, vals, iters):
    def body(i, acc):
        v = vals + acc[0, 0]
        return jax.ops.segment_sum(v, rows, num_segments=N)
    return lax.fori_loop(0, iters, body, jnp.zeros((N, 3)))


sl = jax.jit(seg_loop, static_argnums=2)
t10 = timeit("segment_sum loop x10", lambda: sl(rows, vals, 10))
t100 = timeit("segment_sum loop x100", lambda: sl(rows, vals, 100))
print(f"    -> per segment_sum: {(t100-t10)/90:.4f} ms", flush=True)

# one-hot matmul scatter in a loop (HIGHEST precision f32)
def oh_loop(rows, vals, iters):
    oh = None
    def body(i, acc):
        v = vals + acc[0, 0]
        o = (rows[:, None] == jnp.arange(N, dtype=jnp.int32)[None, :]).astype(v.dtype)
        return lax.dot_general(o, v, (((0,), (0,)), ((), ())),
                               precision=lax.Precision.HIGHEST)
    return lax.fori_loop(0, iters, body, jnp.zeros((N, 3)))


ol = jax.jit(oh_loop, static_argnums=2)
t10 = timeit("one-hot scatter loop x10", lambda: ol(rows, vals, 10))
t100 = timeit("one-hot scatter loop x100", lambda: ol(rows, vals, 100))
print(f"    -> per one-hot scatter: {(t100-t10)/90:.4f} ms", flush=True)

# gather-table reduction (the current hvp path), K=128
from stark_tpu.ops.compaction import compact_indices


def gt_loop(entry, q_flat, iters):
    def body(i, acc):
        qp = jnp.concatenate([q_flat + acc[0, 0:1], jnp.zeros((1, 3))])
        return jnp.sum(qp[entry], axis=1)
    return lax.fori_loop(0, iters, body, jnp.zeros((N, 3)))


K = 128
entry = jax.random.randint(k0, (N, K), 0, R, dtype=jnp.int32)
gl = jax.jit(gt_loop, static_argnums=2)
t10 = timeit("gather-table K=128 loop x10", lambda: gl(entry, vals, 10))
t100 = timeit("gather-table K=128 loop x100", lambda: gl(entry, vals, 100))
print(f"    -> per gather-table reduce: {(t100-t10)/90:.4f} ms", flush=True)

# ---------------- bitpack compaction ----------------
def compact_bitpack(flat_mask, cap: int):
    n = flat_mask.size
    W = -(-n // 32)
    S = -(-W // 128)
    m = jnp.pad(flat_mask, (0, W * 32 - n)).reshape(W, 32)
    weights = (1 << jnp.arange(32, dtype=jnp.uint32))
    word = jnp.sum(m.astype(jnp.uint32) * weights[None, :], axis=1, dtype=jnp.uint32)
    wcnt = lax.population_count(word).astype(jnp.int32)          # (W,)
    wp = jnp.pad(wcnt, (0, S * 128 - W)).reshape(S, 128)
    # within-super inclusive scan (7 shift-adds over 128 lanes)
    x = wp
    for s in (1, 2, 4, 8, 16, 32, 64):
        x = x + jnp.pad(x, ((0, 0), (s, 0)))[:, :128]
    sup_tot = x[:, -1]                                            # (S,)
    sup_incl = jnp.cumsum(sup_tot)                                # S small
    sup_excl = sup_incl - sup_tot
    w_incl = (x + sup_excl[:, None]).reshape(-1)[:W]              # (W,) inclusive
    total = sup_incl[-1] if S else jnp.zeros((), jnp.int32)
    j = jnp.arange(cap, dtype=jnp.int32)
    # super containing the j-th true: searchsorted over sup_incl
    sidx = jnp.searchsorted(sup_incl, j + 1, side="left").astype(jnp.int32)
    sidx = jnp.clip(sidx, 0, S - 1)
    # binary search the word within the super's 128 words
    base = sidx * 128
    lo = jnp.zeros((cap,), jnp.int32)
    for step in (64, 32, 16, 8, 4, 2, 1):
        mid = lo + step
        widx = jnp.clip(base + mid - 1, 0, W - 1)
        go = w_incl[widx] < (j + 1)
        lo = jnp.where(go, mid, lo)
    widx = jnp.clip(base + lo, 0, W - 1)
    w_excl = w_incl[widx] - wcnt[widx]
    jloc = j - w_excl                                             # bit rank in word
    wv = word[widx]
    pos = jnp.zeros((cap,), jnp.int32)
    for b in (16, 8, 4, 2, 1):
        nxt = pos + b
        lowmask = jnp.where(nxt >= 32, jnp.uint32(0xFFFFFFFF),
                            (jnp.uint32(1) << nxt.astype(jnp.uint32)) - jnp.uint32(1))
        cnt = lax.population_count(wv & lowmask).astype(jnp.int32)
        pos = jnp.where(cnt <= jloc, nxt, pos)
    idx = widx * 32 + pos
    valid = j < jnp.minimum(total, cap)
    return jnp.where(valid, jnp.clip(idx, 0, n - 1), 0), total


for n, cap in ((9834496, 262144), (9834496, 524288), (6422528, 262144),
               (2230272, 131072), (56448, 8192)):
    mask = jnp.zeros((n,), bool).at[::137].set(True)
    cj = jax.jit(lambda m, cap=cap: compact_bitpack(m, cap))
    oj = jax.jit(lambda m, cap=cap: compact_indices(m, cap))
    i1, c1 = cj(mask); i2, c2 = oj(mask)
    ncheck = min(n // 137 + 1, cap)
    ok = bool(jnp.all(i1[:ncheck] == i2[:ncheck])) and int(c1) == int(c2)
    timeit(f"bitpack n={n} cap={cap} (ok={ok})", lambda: cj(mask))
    timeit(f"old     n={n} cap={cap}", lambda: oj(mask))

# masked producer fusion check: mask generated from distances on the fly
P = jax.random.normal(k0, (3136, 3), jnp.float32)
Q = jax.random.normal(k0, (3136, 3), jnp.float32)


def fused_producer(P, Q, cap=262144):
    d2 = jnp.sum((P[:, None, :] - Q[None, :, :]) ** 2, -1)
    mask = (d2 < 0.01).ravel()
    return compact_bitpack(mask, cap)


fp = jax.jit(fused_producer)
timeit("bitpack fused distance producer 3136^2 cap=256k", lambda: fp(P, Q))
fp2 = jax.jit(lambda P, Q: compact_indices(
    (jnp.sum((P[:, None, :] - Q[None, :, :]) ** 2, -1) < 0.01).ravel(), 262144))
timeit("old     fused distance producer 3136^2 cap=256k", lambda: fp2(P, Q))

# ---------------- lax.top_k per row ----------------
mask2d = jax.random.uniform(k0, (3136, 3136)) < 0.01


def topk_rows(mask, K=128):
    keys = jnp.where(mask, -jnp.arange(mask.shape[1], dtype=jnp.float32)[None, :],
                     -jnp.inf)
    v, idx = lax.top_k(keys, K)
    return idx, jnp.sum(mask, axis=1)


tk = jax.jit(topk_rows)
timeit("lax.top_k rows 3136x3136 K=128", lambda: tk(mask2d))
