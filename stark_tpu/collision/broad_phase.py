"""Spatial-hash broad phase producing fixed-capacity candidate pairs.

TPU-native replacement of the reference's octree broad phase
(/root/reference/stark/extern/TriangleMeshCollisionDetection/src/Octree.cpp:46-90,
BroadPhasePTEEBase.cpp:51-100): instead of recursive spatial subdivision —
data-dependent control flow XLA cannot compile — primitives hash into a
uniform grid and queries read back their own cell. All shapes are static;
every dynamic quantity (cell extents, bucket occupancy) is capped with the
count surfaced for the standard cap-bump re-trace.

Scheme (one-sided insertion, one-cell query):
  * Every TARGET primitive (triangle or edge), described by its bounding
    sphere (center tc, radius tr), is inserted into every grid cell that the
    cube [tc - R, tc + R] overlaps, where R = tr + max_query_radius. Each
    target gets `ins_slots` static insertion slots (row-major over the
    covered cell box); the true covered-cell count is surfaced for overflow.
  * Every QUERY primitive (point or edge, bounding sphere (qc, qr)) then
    only inspects the single cell containing qc: any target within
    qr + tr of qc has its inflated box covering qc's cell, so the
    single-cell read is conservative.
  * Cells hash into `table_size` buckets (power of two). Collisions only
    ADD candidates (filtered by the caller's exact sphere test) — they never
    lose a pair. Insertions sort by (bucket, target-id) so duplicates of a
    target (inserted via several cells that collide into one bucket) are
    adjacent and dropped during the query scan: duplicate candidate pairs
    would double-count barrier energy downstream.

Cost: O(T * ins_slots * log + Q * occ_cap) versus the dense masks'
O(Q * T) — the scalable path for scenes past a few million primitive pairs.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_P1, _P2, _P3 = 73856093, 19349663, 83492791  # standard spatial-hash primes


def _cell_of(x, h):
    return jnp.floor(x / h).astype(jnp.int32)


def _hash_cells(c, table_size):
    hx = c[..., 0] * _P1 ^ c[..., 1] * _P2 ^ c[..., 2] * _P3
    return (hx & (table_size - 1)).astype(jnp.int32)


def grid_candidates(qc, qr, tc, tr, h, ins_slots: int, occ_cap: int,
                    table_size: int):
    """Candidate (query, target) pairs via the spatial hash.

    Parameters
    ----------
    qc, qr : (Q,3), (Q,) query bounding spheres (radius includes dhat/margin).
    tc, tr : (T,3), (T,) target bounding spheres.
    h      : cell size (scalar, traced).
    ins_slots : static per-target insertion-slot cap.
    occ_cap   : static per-query candidate cap (bucket scan length).
    table_size: hash buckets (power of two).

    Returns
    -------
    tid_grid : (Q, occ_cap) int32 candidate target ids (T = invalid pad).
    valid    : (Q, occ_cap) bool.
    max_cells: scalar int32 — true max covered cells per target (> ins_slots
               means insertion overflow: bump ins_slots and re-trace).
    max_occ  : scalar int32 — true max bucket occupancy scanned by a query
               (> occ_cap means candidates were dropped: bump occ_cap).
    """
    Q = qc.shape[0]
    T = tc.shape[0]
    max_qr = jnp.max(qr) if Q else jnp.zeros((), qr.dtype)

    # --- insertion: covered-cell box per target ---
    R = tr + max_qr
    lo = _cell_of(tc - R[:, None], h)                    # (T,3)
    hi = _cell_of(tc + R[:, None], h)
    ext = hi - lo + 1                                    # (T,3) >= 1
    n_cells = ext[:, 0] * ext[:, 1] * ext[:, 2]
    max_cells = jnp.max(n_cells).astype(jnp.int32)

    s = jnp.arange(ins_slots, dtype=jnp.int32)           # (S,)
    sx = s[None, :] % ext[:, 0:1]
    rem = s[None, :] // ext[:, 0:1]
    sy = rem % ext[:, 1:2]
    sz = rem // ext[:, 1:2]
    slot_valid = s[None, :] < n_cells[:, None]           # (T,S)
    cells = jnp.stack([lo[:, 0:1] + sx, lo[:, 1:2] + sy, lo[:, 2:3] + sz],
                      axis=-1)                           # (T,S,3)
    bucket = jnp.where(slot_valid, _hash_cells(cells, table_size), table_size)

    tid = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[:, None],
                           (T, ins_slots))
    # composite sort key (int64: bucket*T can exceed int32): bucket major,
    # target id minor -> duplicates of a target land adjacent within a bucket
    key = bucket.astype(jnp.int64) * (T + 1) + tid.astype(jnp.int64)
    order = jnp.argsort(key.reshape(-1))
    bucket_sorted = bucket.reshape(-1)[order]
    tid_sorted = tid.reshape(-1)[order]

    # --- query: scan own bucket ---
    qcell = _cell_of(qc, h)
    qb = _hash_cells(qcell, table_size)                  # (Q,)
    starts = jnp.searchsorted(bucket_sorted, qb, side="left")
    ends = jnp.searchsorted(bucket_sorted, qb, side="right")
    occ = (ends - starts).astype(jnp.int32)
    max_occ = jnp.max(occ).astype(jnp.int32) if Q else jnp.zeros((), jnp.int32)

    k = jnp.arange(occ_cap, dtype=jnp.int32)
    pos = starts[:, None] + k[None, :]                   # (Q, occ_cap)
    in_run = k[None, :] < jnp.minimum(occ, occ_cap)[:, None]
    pos_c = jnp.clip(pos, 0, bucket_sorted.shape[0] - 1)
    tid_grid = jnp.where(in_run, tid_sorted[pos_c], T)
    # drop duplicates (same target via colliding cells): sorted by tid
    # within the bucket run, so equal neighbors are adjacent
    dup = jnp.concatenate(
        [jnp.zeros((Q, 1), bool), tid_grid[:, 1:] == tid_grid[:, :-1]], axis=1)
    valid = in_run & jnp.logical_not(dup) & (tid_grid < T)
    return tid_grid, valid, max_cells, max_occ


def pick_cell_size(qr, tr):
    """Heuristic cell size ~ the typical inflated pair radius R. The
    query-side bucket occupancy scales as rho*(h + 2R)^2 on flat dense
    meshes (each target covers ((2R/h)+1)^3 cells), so SMALLER cells cut
    occupancy — the expensive axis (it sizes the per-query scan buffers) —
    at the cost of more insertion slots, which are cheap (bounded by
    ins_slots): h = R gives ~9*rho*R^2 occupancy at ~27 cells/target."""
    med_t = jnp.median(tr)
    med_q = jnp.median(qr) if qr.shape[0] else jnp.zeros((), tr.dtype)
    return (med_t + med_q) + 1e-12
