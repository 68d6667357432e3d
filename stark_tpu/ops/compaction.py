"""Stream compaction of boolean masks into fixed-capacity index buffers.

This is the TPU replacement for the reference's dynamic contact-pair arrays
(EnergyFrictionalContact.cpp:368-530 pushes classified pairs into growing
std::vectors): a flat candidate mask is compacted into a static-capacity
index buffer, with the true count returned for overflow detection.

Why not `jnp.nonzero(size=cap)` / `jnp.cumsum`: XLA:TPU lowers their prefix
scans to (u32,u32) pair-typed reduce-windows and then fuses the (potentially
tens-of-millions-entry) candidate-mask producer into the scan's on-stack
operand — the scoped-VMEM stack allocation blows the 16 MiB budget. That is
a compile failure at best, and with a raised `xla_tpu_scoped_vmem_limit_kib`
a runtime kernel fault on v5e. The scan below uses only pad-shift-adds
(log-step Hillis-Steele over 128 lanes plus a recursive carry scan): exact
int32 arithmetic, no reduce-window anywhere, fusion-safe, deterministic.
"""
from __future__ import annotations

import jax.numpy as jnp

_LANES = 128


def _scan_lanes(x):
    """Inclusive scan along axis 1 of an (G, 128) int32 array via 7
    shift-and-add steps (Hillis-Steele)."""
    for s in (1, 2, 4, 8, 16, 32, 64):
        x = x + jnp.pad(x, ((0, 0), (s, 0)))[:, :_LANES]
    return x


def exclusive_scan(x):
    """Exclusive prefix sum of a 1-D int32 array, built only from pad/shift/
    add ops (no reduce-window lowering)."""
    n = x.shape[0]
    pad = (-n) % _LANES
    xg = jnp.pad(x, (0, pad)).reshape(-1, _LANES)
    inner = _scan_lanes(xg)                  # inclusive within each lane row
    totals = inner[:, -1]
    if totals.shape[0] > 1:
        carry = exclusive_scan(totals)       # recursion depth ~ log_128(n)
    else:
        carry = jnp.zeros_like(totals)
    incl = (inner + carry[:, None]).reshape(-1)[:n]
    return incl - x


def compact_indices(flat_mask, cap: int):
    """Compact the indices of true entries of `flat_mask` (1-D bool) into a
    (cap,) int32 buffer, ascending, padded with 0 — the same contract as
    `jnp.nonzero(flat, size=cap, fill_value=0)`. Returns (idx, count) where
    `count` is the TOTAL number of true entries (may exceed cap: overflow
    must be detected by the caller, mirroring the capacity-bump retry of the
    reference's growing pair arrays).

    The gather step is a vectorized binary search over the inclusive scan
    (the j-th true element is the first position where it reaches j+1) —
    an XLA scatter here would serialize ~1 update/cycle over the full
    (possibly tens-of-millions-entry) mask, dominating the entire broad
    phase; cap binary-search gathers are ~log2(n) fused passes instead."""
    n = flat_mask.size
    if n == 0:
        return jnp.zeros((cap,), jnp.int32), jnp.zeros((), jnp.int32)
    m = flat_mask.astype(jnp.int32)
    incl = exclusive_scan(m) + m
    # never search for more slots than the mask can hold: the searchsorted
    # gather cost is proportional to the slot count (each slot runs a
    # log2(n)-step binary search), and several call sites size `cap` from
    # worst-case geometry far above the actual mask size
    k = min(cap, n)
    j = jnp.arange(k, dtype=jnp.int32)
    pos = jnp.searchsorted(incl, j + 1, side="left").astype(jnp.int32)
    count = incl[-1]
    idx = jnp.where(j < jnp.minimum(count, k), jnp.clip(pos, 0, n - 1), 0)
    if k < cap:
        idx = jnp.pad(idx, (0, cap - k))
    return idx, count
