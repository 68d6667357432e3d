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

    def _scatter_rows_payload(rows, payload):
        """(R,) block ids + (R, W) payload -> (n_blocks, W) sum. One-hot
        MXU matmul below _ONEHOT_MAX_BLOCKS (deterministic, exact one-hot
        entries, HIGHEST forces the f32 accumulate path), segment_sum
        above. Rows may repeat arbitrarily; zero payload rows are inert."""
        if n_blocks <= _ONEHOT_MAX_BLOCKS:
            oh = (rows[:, None] ==
                  jnp.arange(n_blocks, dtype=rows.dtype)[None, :]
                  ).astype(payload.dtype)
            return jax.lax.dot_general(oh, payload, (((0,), (0,)), ((), ())),
                                       precision=jax.lax.Precision.HIGHEST)
        return jax.ops.segment_sum(payload, rows, num_segments=n_blocks)

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
        rows_parts, g_parts = [], []
        for name, fd in data.items():
            fam = fam_by_name[name]
            u_e = _gather(u, fd["conn"])
            e, g_e = jax.vmap(jax.value_and_grad(fam.energy_fn), in_axes=(0, 0, None))(
                u_e, fd["rows"], glob)
            mask = _active_mask(fd["rows"])
            E = E + jnp.sum(jnp.where(mask, e, 0.0).astype(_ACC))
            g_e = jnp.where(mask[:, None, None], g_e, 0.0)
            rows_parts.append(fd["conn"].reshape(-1))
            g_parts.append(g_e.reshape(-1, 3))
        rows = jnp.concatenate(rows_parts) if len(rows_parts) > 1 else rows_parts[0]
        g_flat = jnp.concatenate(g_parts) if len(g_parts) > 1 else g_parts[0]
        return E, _scatter_rows_payload(rows, g_flat)

    def energy_grad_hess(u, data, glob):
        """Returns (E, aux, grad, {name: H (E, arity*3, arity*3)}). The
        per-family dense element Hessians play the role of ElementHessians
        chunk storage (ElementHessians.h:22-104) but stay on device, uniform
        per family.

        aux carries the f32 rounding-noise floors the solver's convergence
        tests consume (independent per-element roundings of ~eps*|x| add in
        quadrature; a linear eps*sum|x| floor overestimates by ~sqrt(N) and
        made the f32 exits accept under-converged states — measured as
        1e-3..2e-2 one-step position deviations vs f64):
          * aux['e_nsq']: sum of per-element energies squared;
            eps * sqrt(e_nsq) is the energy-difference noise floor.
          * aux['g_nsq']: max over (block, component) of the sum of squared
            per-element gradient contributions; eps * sqrt(g_nsq) is the
            rounding-noise floor of the residual inf-norm — the smallest
            residual the f32 evaluation can certify."""
        E = jnp.zeros((), dtype=_ACC)
        E_nsq = jnp.zeros((), dtype=_ACC)
        hess: Dict[str, jnp.ndarray] = {}
        # All per-block reductions (gradient, gradient square, |H| row sums)
        # concatenate into ONE (R, 9) payload scattered by ONE one-hot MXU
        # matmul (or one segment_sum past _ONEHOT_MAX_BLOCKS): the previous
        # per-family segment_sums were ~30 XLA scatters per evaluation and
        # dominated egh device time (scatters measured ~10-17 ns/row on v5e
        # vs ~0.5 ms for the whole consolidated matmul).
        rows_parts = []
        payload_parts = []
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
            E_nsq = E_nsq + jnp.sum(jnp.where(mask, e, 0.0).astype(_ACC) ** 2)
            g_e = jnp.where(mask[:, None, None], g_e, 0.0)
            g_flat = g_e.reshape(-1, 3)
            H_e = H_e.reshape(H_e.shape[0], a * 3, a * 3)
            H_e = jnp.where(mask[:, None, None], H_e, 0.0)
            # enforce exact symmetry (autodiff roundoff) like the reference's
            # symmetric Hessian derivation (diff.cpp:88-99)
            H_e = 0.5 * (H_e + jnp.swapaxes(H_e, 1, 2))
            hess[name] = H_e
            # per-block |H| row sums -> the backward-error residual floor:
            # a 1-ulp position jiggle (eps * x_scale, i.e. eps * x_scale/dt
            # in velocity DOFs) perturbs the gradient by up to
            # sum_j |H_ij| * that; residual components below it carry no
            # information at this dtype (the f32 cancellation floor the
            # quadrature g_nsq model cannot see)
            hrow = jnp.sum(jnp.abs(H_e), axis=2).reshape(-1, 3)
            rows_parts.append(fd["conn"].reshape(-1))
            payload_parts.append(
                jnp.concatenate([g_flat, g_flat * g_flat, hrow], axis=-1))
        rows = jnp.concatenate(rows_parts) if len(rows_parts) > 1 \
            else rows_parts[0]
        payload = jnp.concatenate(payload_parts) if len(payload_parts) > 1 \
            else payload_parts[0]
        acc = _scatter_rows_payload(rows, payload)
        grad = acc[:, :3]
        gsq = acc[:, 3:6]
        hsum = acc[:, 6:9]
        aux = {"e_nsq": E_nsq, "g_nsq": jnp.max(gsq).astype(_ACC),
               "hsum": hsum}
        return E, aux, grad, hess

    def hvp_context(data, hess):
        """Concatenate element Hessians + connectivity by arity so each CG
        iteration runs ONE gather + ONE batched matvec + ONE reduction per
        arity group instead of one triple per family (the reference gets the
        same effect from a single blocked-CSR SpMV, BlockedSparseMatrix.h:
        128-148). Built once per Newton iteration; loop-invariant for CG.

        Canonical order: arity groups ascending, families sorted by name
        within a group — every flat row vector derived from the context
        (scatter tables, q_e concatenation) uses this order."""
        groups = {}
        for name in sorted(hess.keys()):
            a = fam_by_name[name].arity
            groups.setdefault(a, []).append(
                (data[name]["conn"], hess[name], data[name]["rows"]["active"]))
        ctx = {}
        for a in sorted(groups.keys()):
            items = groups[a]
            conn = jnp.concatenate([c for c, _, _ in items], axis=0) \
                if len(items) > 1 else items[0][0]
            H = jnp.concatenate([h for _, h, _ in items], axis=0) \
                if len(items) > 1 else items[0][1]
            act = jnp.concatenate([m for _, _, m in items], axis=0) \
                if len(items) > 1 else items[0][2]
            ctx[a] = (conn, H, act > 0.5)
        return ctx

    def hvp_ctx(p, ctx):
        """q = H p, matrix-free over the arity-consolidated context
        (segment_sum scatter variant, used by the staged host path)."""
        q = jnp.zeros((n_blocks, 3), dtype=p.dtype)
        for a in sorted(ctx.keys()):
            conn, H_e, _ = ctx[a]
            p_e = _gather(p, conn).reshape(-1, a * 3)
            q_e = jnp.einsum("eij,ej->ei", H_e, p_e)
            q = q + jax.ops.segment_sum(
                q_e.reshape(-1, 3), conn.reshape(-1), num_segments=n_blocks)
        return q

    def hvp(p, data, hess):
        """q = H p, matrix-free (replaces bsm::spmxv, BlockedSparseMatrix.h:128-148)."""
        return hvp_ctx(p, hvp_context(data, hess))

    # ------------------------------------------------------------------
    # gather-based segmented sum for the CG loop.
    #
    # jax.ops.segment_sum lowers to an XLA scatter-add, which measured
    # ~0.9 ms per call on v5e for ~60k rows -> 1k blocks — at 150 CG
    # iterations per Newton step that is the single largest cost in the
    # solve. Instead: sort the flat row ids ONCE per Newton iteration and
    # build a (n_blocks, K) gather table of value-row indices; every CG
    # iteration then reduces with pure gathers (fast on TPU). This is the
    # TPU-native analog of the reference's per-thread accumulate + merge
    # (ElementHessians.h:56-59) with the merge precomputed.
    # ------------------------------------------------------------------
    def scatter_table(ctx, K: int):
        """Build the gather table. Padded (inactive) rows are routed to a
        dummy segment so compaction padding cannot pile degree onto block 0.

        Returns (entry, n_rows, max_len): entry (n_blocks, K) indexes into
        the flat canonical q_e row vector (value n_rows = zero pad row);
        max_len > K signals overflow (host must bump K and re-trace)."""
        rows_parts = []
        for a in sorted(ctx.keys()):
            conn, _, act = ctx[a]
            r = jnp.where(act[:, None], conn, n_blocks).reshape(-1)
            rows_parts.append(r)
        rows = jnp.concatenate(rows_parts) if len(rows_parts) > 1 else rows_parts[0]
        R = rows.shape[0]
        order = jnp.argsort(rows)
        rows_sorted = rows[order]
        ids = jnp.arange(n_blocks, dtype=rows.dtype)
        starts = jnp.searchsorted(rows_sorted, ids, side="left")
        ends = jnp.searchsorted(rows_sorted, ids, side="right")
        lens = (ends - starts).astype(jnp.int32)
        pos = starts[:, None] + jnp.arange(K, dtype=jnp.int32)[None, :]
        valid = jnp.arange(K, dtype=jnp.int32)[None, :] < lens[:, None]
        entry = jnp.where(valid, order[jnp.clip(pos, 0, R - 1)], R)
        return entry, R, jnp.max(lens)

    def hvp_table(p, ctx, entry):
        """q = H p with the gather-table reduction (no scatter)."""
        qs = []
        for a in sorted(ctx.keys()):
            conn, H_e, _ = ctx[a]
            p_e = _gather(p, conn).reshape(-1, a * 3)
            q_e = jnp.einsum("eij,ej->ei", H_e, p_e)
            qs.append(q_e.reshape(-1, 3))
        q_flat = jnp.concatenate(qs) if len(qs) > 1 else qs[0]
        q_pad = jnp.concatenate([q_flat, jnp.zeros((1, 3), q_flat.dtype)])
        return jnp.sum(q_pad[entry], axis=1)

    def diag_blocks_ctx(ctx):
        """3x3 diagonal blocks of the global Hessian (the BlockDiagonal
        preconditioner source, BlockedSparseMatrix.h:150-186), over the
        arity-consolidated context."""
        D = jnp.zeros((n_blocks, 3, 3),
                      dtype=next(iter(ctx.values()))[1].dtype) \
            if ctx else jnp.zeros((n_blocks, 3, 3))
        for a, (conn, H_e, _act) in ctx.items():
            E_n = H_e.shape[0]
            Hb = H_e.reshape(E_n, a, 3, a, 3)
            # (E, arity, 3, 3) diagonal sub-blocks
            d_e = jnp.einsum("eiaib->eiab", Hb)
            D = D + jax.ops.segment_sum(
                d_e.reshape(-1, 3, 3), conn.reshape(-1), num_segments=n_blocks)
        return D

    def diag_blocks(data, hess):
        return diag_blocks_ctx(hvp_context(data, hess))

    # ------------------------------------------------------------------
    # single-bucket arity consolidation for the fused CG loop.
    #
    # The per-CG-iteration cost on TPU is dominated by kernel-launch count,
    # not flops: ALL families pad to one arity bucket so every CG iteration
    # runs exactly ONE gather + ONE batched matvec + ONE matmul scatter.
    # Padding a 1-arity inertia row to 15x15 costs 25x its (trivial) flops
    # while removing a whole gather/einsum pipeline from the loop — on a
    # 3k-DOF scene the CG iteration is launch-bound, not flop-bound.
    # Padded conn entries gather a zero row of p and their output rows land
    # in the dummy segment; padded H rows/cols are zero.
    # ------------------------------------------------------------------
    _max_arity = max((f.arity for f in families), default=1)
    _BUCKETS = (_max_arity,)

    def _bucket_of(arity: int) -> int:
        return _max_arity

    def _bucket_names(data):
        """Canonical per-bucket family order (sorted names)."""
        out = {b: [] for b in _BUCKETS}
        for name in sorted(data.keys()):
            out[_bucket_of(fam_by_name[name].arity)].append(name)
        return out

    # ------------------------------------------------------------------
    # active-row pooling of the DYNAMIC (contact/friction) families.
    #
    # Pair tables are capacity-padded for the worst case, but the CG loop,
    # preconditioner, and PD projection pay per ROW: at drape the bench's
    # contact tables hold ~14k rows of which <1k are live. The pool gathers
    # just the active rows (selection frozen with the pair topology) into a
    # small fixed-capacity block appended after the static families —
    # downstream cost then scales with LIVE pairs, not capacities.
    # ------------------------------------------------------------------
    _DYN_PREFIX = ("contact_", "friction_")

    def _is_dyn(name: str) -> bool:
        return name.startswith(_DYN_PREFIX)

    def _pad_conn_b(fd, b):
        conn = fd["conn"]
        act = fd["rows"]["active"] > 0.5
        conn = jnp.where(act[:, None], conn, n_blocks)
        a = conn.shape[1]
        if a < b:
            pad = jnp.full((conn.shape[0], b - a), n_blocks, conn.dtype)
            conn = jnp.concatenate([conn, pad], axis=1)
        return conn

    def bucket_conn_pool(data, pool_cap: int):
        """Consolidated connectivity with dynamic families pooled: returns
        (conn_cat {b: (E_static+pool_cap, b)}, pool_sel (pool_cap,),
        pool_count). pool_sel indexes the canonical concat of dynamic
        family rows; pool_count > pool_cap signals overflow (bump +
        re-trace)."""
        b = _max_arity
        stat_parts, dyn_parts, dyn_act = [], [], []
        for name in sorted(data.keys()):
            fd = data[name]
            (dyn_parts if _is_dyn(name) else stat_parts).append(
                _pad_conn_b(fd, b))
            if _is_dyn(name):
                dyn_act.append(fd["rows"]["active"] > 0.5)
        parts = list(stat_parts)
        if dyn_parts:
            from ..ops.compaction import compact_indices

            conn_dyn = (jnp.concatenate(dyn_parts, axis=0)
                        if len(dyn_parts) > 1 else dyn_parts[0])
            act = (jnp.concatenate(dyn_act) if len(dyn_act) > 1 else dyn_act[0])
            sel, cnt = compact_indices(act, pool_cap)
            valid = jnp.arange(pool_cap) < jnp.minimum(cnt, pool_cap)
            conn_pool = jnp.where(valid[:, None], conn_dyn[sel], n_blocks)
            parts.append(conn_pool)
        else:
            sel = jnp.zeros((pool_cap,), jnp.int32)
            cnt = jnp.zeros((), jnp.int32)
            parts.append(jnp.full((pool_cap, b), n_blocks, jnp.int32))
        conn_cat = jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
        return {b: conn_cat}, sel, cnt

    def _pad_h(H, d):
        if H.shape[-1] < d:
            p = d - H.shape[-1]
            H = jnp.pad(H, ((0, 0), (0, p), (0, p)))
        return H

    def dyn_conn_cat(data):
        """Concatenated dynamic-family connectivity padded to the bucket
        arity, inactive rows routed to the dummy block. Cheap (pure concat
        of frozen tables) — rebuilt every iteration rather than carried."""
        b = _max_arity
        parts = [_pad_conn_b(data[n], b) for n in sorted(data.keys())
                 if _is_dyn(n)]
        if not parts:
            return jnp.zeros((0, b), jnp.int32)
        return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]

    def dyn_hess_cat(hess):
        """Concatenated dynamic-family element Hessians zero-padded to the
        bucket dim, canonical (sorted) family order matching dyn_conn_cat."""
        d = 3 * _max_arity
        parts = [_pad_h(hess[n], d) for n in sorted(hess.keys())
                 if _is_dyn(n)]
        if not parts:
            return jnp.zeros((0, d, d), jnp.float32)
        return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]

    def live_select(conn_dyn, H_dyn, live_cap: int):
        """Select the dynamic rows with NONZERO element Hessians at the
        CURRENT iterate. IPC barriers clamp at dhat, so every pair in the
        slack_p shell but outside dhat contributes an exactly-zero Hessian
        — the projection and CG layers only ever need the truly-live rows
        (~5-20x fewer than the shell at drape: 9.6k shell rows vs ~0.5-2k
        live measured on the 32x32 bench). Selection is per-iteration (the
        live set changes as the iterate moves); count > live_cap signals
        overflow (bump + re-trace; the affected iteration solves with a
        truncated-but-PSD Hessian, like every other cap overflow).

        Returns (conn_live (live_cap,b), H_live (live_cap,3b,3b),
        valid (live_cap,), count)."""
        from ..ops.compaction import compact_indices

        b = _max_arity
        if conn_dyn.shape[0] == 0:
            return (jnp.full((live_cap, b), n_blocks, jnp.int32),
                    jnp.zeros((live_cap, 3 * b, 3 * b), H_dyn.dtype),
                    jnp.zeros((live_cap,), bool), jnp.zeros((), jnp.int32))
        nz = jnp.any(H_dyn != 0.0, axis=(1, 2))
        sel, cnt = compact_indices(nz, live_cap)
        valid = jnp.arange(live_cap) < jnp.minimum(cnt, live_cap)
        conn_live = jnp.where(valid[:, None], conn_dyn[sel], n_blocks)
        H_live = jnp.where(valid[:, None, None], H_dyn[sel], 0.0)
        return conn_live, H_live, valid, cnt

    def cat_static_conn(data):
        """Concatenated static-family connectivity (canonical sorted order,
        padded to the bucket arity, inactive rows -> dummy block)."""
        b = _max_arity
        parts = [_pad_conn_b(data[n], b) for n in sorted(data.keys())
                 if not _is_dyn(n)]
        if not parts:
            return jnp.zeros((0, b), jnp.int32)
        return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]

    def cat_with_live(conn_static, hess_stat, conn_live, H_live):
        """(conn_cat, H_cat) single-bucket layout: static families in
        canonical order followed by the live dynamic rows."""
        b = _max_arity
        d = 3 * b
        h_parts = [_pad_h(hess_stat[n], d) for n in sorted(hess_stat.keys())]
        h_parts.append(H_live)
        H = jnp.concatenate(h_parts, axis=0) if len(h_parts) > 1 else h_parts[0]
        conn = jnp.concatenate([conn_static, conn_live], axis=0)
        return {b: conn}, {b: H}

    def pool_dyn_hess(hess, pool_sel):
        """Pooled dynamic-family element Hessians: (pool_cap, 3b, 3b) in
        bucket_conn_pool's row order. Rows past the live count carry
        arbitrary data — the pooled conn masks them out of every consumer."""
        b = _max_arity
        d = 3 * b
        dyn = [_pad_h(hess[n], d) for n in sorted(hess.keys()) if _is_dyn(n)]
        if not dyn:
            return jnp.zeros((pool_sel.shape[0], d, d),
                             next(iter(hess.values())).dtype if hess
                             else jnp.float32)
        H_dyn = jnp.concatenate(dyn, axis=0) if len(dyn) > 1 else dyn[0]
        return H_dyn[pool_sel]

    def cat_hess_with_pool(hess_stat, H_pool):
        """Consolidated Hessians matching bucket_conn_pool's layout: padded
        static families in canonical order, then the (projected) pool."""
        b = _max_arity
        d = 3 * b
        parts = [_pad_h(hess_stat[n], d) for n in sorted(hess_stat.keys())]
        parts.append(H_pool)
        return {b: (jnp.concatenate(parts, axis=0)
                    if len(parts) > 1 else parts[0])}

    def split_dyn(names):
        """(static_names, dynamic_names) in canonical (sorted) order."""
        names = sorted(names)
        return ([n for n in names if not _is_dyn(n)],
                [n for n in names if _is_dyn(n)])

    def bucket_conn(data):
        """Consolidated effective connectivity per bucket: (Eb, b) int32 with
        value n_blocks for arity padding and for inactive rows (so padded
        rows add no degree to real blocks). Frozen between contact-table
        rebuilds; feeds both the scatter table and the per-iteration Hvp."""
        names = _bucket_names(data)
        out = {}
        for b in _BUCKETS:
            parts = []
            for name in names[b]:
                fd = data[name]
                conn = fd["conn"]
                act = fd["rows"]["active"] > 0.5
                conn = jnp.where(act[:, None], conn, n_blocks)
                a = conn.shape[1]
                if a < b:
                    pad = jnp.full((conn.shape[0], b - a), n_blocks, conn.dtype)
                    conn = jnp.concatenate([conn, pad], axis=1)
                parts.append(conn)
            if parts:
                out[b] = jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
        return out

    def bucket_hess(hess, data):
        """Consolidated element Hessians per bucket: (Eb, 3b, 3b), canonical
        family order matching bucket_conn. Zero-pads the extra rows/cols."""
        names = _bucket_names(data)
        out = {}
        for b in _BUCKETS:
            parts = []
            for name in names[b]:
                H = hess[name]
                d = H.shape[-1]
                if d < 3 * b:
                    p = 3 * b - d
                    H = jnp.pad(H, ((0, 0), (0, p), (0, p)))
                parts.append(H)
            if parts:
                out[b] = jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
        return out

    def scatter_rows(conn_cat):
        """Flat block-row vector of the consolidated layout (concat of
        bucket conns, bucket order ascending). Value n_blocks = dropped."""
        parts = [conn_cat[b].reshape(-1) for b in _BUCKETS if b in conn_cat]
        return jnp.concatenate(parts) if len(parts) > 1 else parts[0]

    # one-hot matmul scatter: rows (R,) -> (n_blocks+1, 3), dropped rows
    # (value n_blocks) land in the final slice. On the MXU this measured
    # 0.23 ms at R=98k/N=1100 vs 0.65 ms for XLA scatter-add (segment_sum)
    # and 0.91 ms for an argsort-built gather table — AND it removes the
    # per-pair-rebuild argsort (23 ms device at 45k rows on v5e) entirely.
    # Exact one-hot entries keep the sum deterministic; HIGHEST precision
    # forces the f32 accumulate path. Cost is O(R * n_blocks), so past a
    # few thousand blocks segment_sum wins; _scatter_q picks per size.
    _ONEHOT_MAX_BLOCKS = 4096

    def _scatter_q(rows, q_flat):
        if n_blocks <= _ONEHOT_MAX_BLOCKS:
            oh = (rows[:, None] ==
                  jnp.arange(n_blocks + 1, dtype=rows.dtype)[None, :]
                  ).astype(q_flat.dtype)
            q = jax.lax.dot_general(oh, q_flat, (((0,), (0,)), ((), ())),
                                    precision=jax.lax.Precision.HIGHEST)
            return q[:-1]
        return jax.ops.segment_sum(q_flat, rows, num_segments=n_blocks + 1)[:-1]

    def scatter_table_rows(rows, K: int, hot_cap: int, K2: int):
        """Two-level gather table over a flat block-row vector.

        Level 1: (n_blocks, K) — the first K row slots of every block; the
        per-CG-iteration reduction gathers n_blocks*K elements, so K must
        stay SMALL (TPU gathers run ~1 element/cycle; K=1024 measured
        3 ms/CG-iter vs ~0.4 ms at K=128).
        Level 2: a (hot_cap, K2) side table for the few HOT blocks whose
        degree exceeds K — rigid-body v/w blocks concentrate one row per
        rb-involving contact pair, reaching hundreds while every other
        block stays ~O(10).

        Returns (entry, hot_ids, hot_entry, hot_n, max_deg); max_deg > K+K2
        or hot_n > hot_cap signal overflow (host bumps + re-traces)."""
        from ..ops.compaction import compact_indices

        R = rows.shape[0]
        order = jnp.argsort(rows)
        rows_sorted = rows[order]
        ids = jnp.arange(n_blocks, dtype=rows.dtype)
        starts = jnp.searchsorted(rows_sorted, ids, side="left")
        ends = jnp.searchsorted(rows_sorted, ids, side="right")
        lens = (ends - starts).astype(jnp.int32)
        pos = starts[:, None] + jnp.arange(K, dtype=jnp.int32)[None, :]
        valid = jnp.arange(K, dtype=jnp.int32)[None, :] < lens[:, None]
        entry = jnp.where(valid, order[jnp.clip(pos, 0, R - 1)], R)
        # hot side table
        hot_idx, hot_n = compact_indices(lens > K, hot_cap)
        hot_valid = jnp.arange(hot_cap) < jnp.minimum(hot_n, hot_cap)
        pos2 = starts[hot_idx][:, None] + K + jnp.arange(K2, dtype=jnp.int32)[None, :]
        valid2 = hot_valid[:, None] & (
            jnp.arange(K2, dtype=jnp.int32)[None, :] < (lens[hot_idx] - K)[:, None])
        hot_entry = jnp.where(valid2, order[jnp.clip(pos2, 0, R - 1)], R)
        return entry, hot_idx, hot_entry, hot_n, jnp.max(lens)

    def hvp_bucket(p, conn_cat, H_cat, rows):
        """q = H p over the consolidated two-bucket layout: 2 gathers +
        2 batched matvecs + one deterministic scatter (_scatter_q). `rows`
        is the flat block-row vector (scatter_rows of the frozen conn)."""
        p_pad = jnp.concatenate([p, jnp.zeros((1, 3), p.dtype)])
        qs = []
        for b in _BUCKETS:
            if b not in conn_cat:
                continue
            p_e = p_pad[conn_cat[b]].reshape(-1, 3 * b)
            q_e = jnp.einsum("eij,ej->ei", H_cat[b], p_e)
            qs.append(q_e.reshape(-1, 3))
        q_flat = jnp.concatenate(qs) if len(qs) > 1 else qs[0]
        return _scatter_q(rows, q_flat)

    def diag_bucket(conn_cat, H_cat):
        """3x3 diagonal blocks over the consolidated layout. Dummy rows
        scatter into an extra segment that is sliced off."""
        dtype = next(iter(H_cat.values())).dtype
        D = jnp.zeros((n_blocks + 1, 3, 3), dtype=dtype)
        for b in _BUCKETS:
            if b not in conn_cat:
                continue
            H = H_cat[b]
            Hb = H.reshape(H.shape[0], b, 3, b, 3)
            d_e = jnp.einsum("eiaib->eiab", Hb)
            D = D + jax.ops.segment_sum(
                d_e.reshape(-1, 3, 3),
                jnp.clip(conn_cat[b], 0, n_blocks).reshape(-1),
                num_segments=n_blocks + 1)
        return D[:-1]

    # ------------------------------------------------------------------
    # dense direct linear solve (small scenes).
    #
    # At bench scale (~1.1k blocks / 3.3k DOF) the CG loop is launch-bound:
    # ~0.4 ms/iteration x 60-160 iterations per Newton step. A dense
    # Jacobi-scaled Cholesky costs ~1.9 ms on the MXU — the hard part is
    # ASSEMBLY: XLA scatter-add runs ~9 ns/value (3.2M element-Hessian
    # entries -> 29 ms). Solution: sort the block-pair ids ONCE per pair
    # rebuild (topology-frozen), then each iteration reduces the sorted
    # value runs with one f64 cumsum + boundary gathers and scatter-SETS
    # only the ~unique-block values (~0.4 ms). Exact directions also
    # replace the forcing-sequence inexactness entirely.
    # ------------------------------------------------------------------
    def direct_tables(conn_cat, slot_cap: int):
        """Per-rebuild sorted block-pair layout: (order, starts, pid_start,
        n_slots, is_start). n_slots > slot_cap signals overflow (bump +
        re-trace)."""
        from ..ops.compaction import compact_indices

        b = _max_arity
        conn = conn_cat[b]
        N1 = n_blocks + 1
        cl = jnp.minimum(conn, n_blocks).astype(jnp.int32)
        pid = cl[:, :, None] * N1 + cl[:, None, :]
        dummy = (cl[:, :, None] >= n_blocks) | (cl[:, None, :] >= n_blocks)
        pid = jnp.where(dummy, N1 * N1 - 1, pid).reshape(-1)
        order = jnp.argsort(pid).astype(jnp.int32)
        pid_sorted = pid[order]
        is_start = jnp.concatenate([
            jnp.ones((1,), bool), pid_sorted[1:] != pid_sorted[:-1]])
        starts, n_slots = compact_indices(is_start, slot_cap)
        valid = jnp.arange(slot_cap) < jnp.minimum(n_slots, slot_cap)
        pid_start = jnp.where(valid, pid_sorted[starts], N1 * N1 - 1)
        return order, starts, pid_start, n_slots, is_start

    def _seg_scan_rows(v, flags):
        """Segmented inclusive scan of (R, W) rows along axis 0, segment
        heads marked by `flags`. log2(R) shifted masked adds — sums stay
        SEGMENT-LOCAL, so f32 suffices (no global-prefix cancellation like
        a cumsum-and-subtract scheme; the worst run accumulates ~1e3
        entries -> ~sqrt(1e3)*eps relative noise)."""
        R = v.shape[0]
        d = 1
        while d < R:
            vs = jnp.concatenate([jnp.zeros((d, v.shape[1]), v.dtype), v[:-d]])
            fs = jnp.concatenate([jnp.ones((d,), bool), flags[:-d]])
            v = v + jnp.where(flags[:, None], 0.0, vs)
            flags = flags | fs
            d *= 2
        return v

    def assemble_dense_perm(H_cat, dtab):
        """Dense global Hessian in the PERMUTED layout Hp[(a,b1),(c,b2)] =
        H[(b1,a),(b2,c)] (component-major): a symmetric permutation of the
        same SPD matrix whose (3, N1, 3, N1) assembly transpose keeps the
        block index in the 128-lane minor axis — the natural (N1,3,N1,3)
        layout's transpose measured ~12 ms of pure retiling on v5e. The
        dummy block (index n_blocks) carries an identity diagonal so the
        factorization stays SPD; its solution component is discarded."""
        b = _max_arity
        N1 = n_blocks + 1
        order, starts, pid_start, n_slots, is_start = dtab
        H = H_cat[b]
        E_cat = H.shape[0]
        Hb = H.reshape(E_cat, b, 3, b, 3).transpose(0, 1, 3, 2, 4)
        vals = Hb.reshape(-1, 9)[order]
        seg = _seg_scan_rows(vals, is_start)
        R2 = vals.shape[0]
        slot_cap = starts.shape[0]
        nxt = jnp.concatenate([starts[1:], jnp.full((1,), R2, starts.dtype)])
        has_next = jnp.arange(slot_cap) + 1 < jnp.minimum(n_slots, slot_cap)
        nxt = jnp.where(has_next, nxt, R2)
        hi = jnp.clip(nxt - 1, 0, R2 - 1)
        sums = seg[hi]
        D4 = jnp.zeros((N1 * N1, 9), H.dtype)
        D4 = D4.at[pid_start].set(sums)
        D4 = D4.at[N1 * N1 - 1].set(
            jnp.eye(3, dtype=H.dtype).reshape(9))
        return D4.reshape(N1, N1, 3, 3).transpose(2, 0, 3, 1).reshape(
            3 * N1, 3 * N1)

    def dense_inverse(H_cat, dtab):
        """Explicit inverse of the (Jacobi-scaled) assembled Hessian in the
        permuted layout — the frozen PCG preconditioner, refreshed once per
        broad-shell rebuild (fused.py). Cholesky + triangular solve with n
        RHS measured ~1-2 ms at n~3.3k on v5e (MXU-bound, unlike the
        per-iteration latency-bound single-RHS triangular solves the old
        per-iteration direct solve paid). Falls back to the Jacobi diagonal
        when the factorization fails (indefinite H in Newton mode)."""
        Hp = assemble_dense_perm(H_cat, dtab)
        n = Hp.shape[0]
        dg = jnp.diagonal(Hp)
        ok_d = dg > 1e-30
        s = jnp.where(ok_d, jax.lax.rsqrt(jnp.maximum(dg, 1e-30)), 1.0)
        Hs = Hp * s[:, None] * s[None, :]
        Hs = Hs + jnp.diag(jnp.where(ok_d, 0.0, 1.0).astype(Hp.dtype))
        L = jax.lax.linalg.cholesky(Hs)
        Li = jax.lax.linalg.triangular_solve(
            L, jnp.eye(n, dtype=Hp.dtype), left_side=True, lower=True)
        Hs_inv = Li.T @ Li
        M = Hs_inv * s[:, None] * s[None, :]
        ok = jnp.all(jnp.isfinite(M))
        Mf = jnp.diag(s * s)
        return jnp.where(ok, M, Mf), ok

    def assemble_dense_scatter(conn_cat, H_cat):
        """Dense permuted-layout global Hessian via ONE scatter-add of the
        (E*b*b, 9) element blocks keyed by block-pair id. ~158k updates at
        32x32 is ~0.2-1 ms of XLA:TPU scatter — unlike the old
        per-iteration direct solve this runs on an (N1^2, 9) target, so no
        sorted-run machinery (argsort measured 10s of ms per call) is
        needed. XLA:TPU scatter-add applies updates sequentially, so the
        assembly stays deterministic."""
        b = _max_arity
        conn = conn_cat[b]
        H = H_cat[b]
        N1 = n_blocks + 1
        cl = jnp.minimum(conn, n_blocks).astype(jnp.int32)
        pid = cl[:, :, None] * N1 + cl[:, None, :]
        dummy = (cl[:, :, None] >= n_blocks) | (cl[:, None, :] >= n_blocks)
        pid = jnp.where(dummy, N1 * N1, pid).reshape(-1)
        E_cat = H.shape[0]
        vals = H.reshape(E_cat, b, 3, b, 3).transpose(0, 1, 3, 2, 4)
        vals = vals.reshape(-1, 9)
        D4 = jnp.zeros((N1 * N1 + 1, 9), H.dtype)
        D4 = D4.at[pid].add(vals)
        D4 = D4.at[N1 * N1 - 1].set(jnp.eye(3, dtype=H.dtype).reshape(9))
        return D4[:N1 * N1].reshape(N1, N1, 3, 3).transpose(
            2, 0, 3, 1).reshape(3 * N1, 3 * N1)

    def ns_refresh(M_prev, conn_cat, H_cat, warm_sweeps: int = 1,
                   cold_sweeps: int = 34):
        """Newton-Schulz tracking of the dense-inverse preconditioner:
        M' = M + M(I - Hs M) on the Jacobi-SCALED assembled Hessian — pure
        (n x n) MXU matmuls, replacing the Cholesky + n-RHS triangular
        solve whose blocked panels measured ~48 ms at n=3.3k on v5e with
        ~2-4 ms of GEMM. The preconditioner PERSISTS across refreshes,
        iterations, and time steps (the caller carries M), so one warm
        sweep per pair rebuild keeps ||I - Hs Ms|| at the f32 floor while
        H drifts; a quality probe falls back to the classical cold start
        Ms0 = I/||Hs||_inf (spectral radius < 1 for SPD, Pan-Reif) with
        `cold_sweeps` doublings when the warm seed has diverged (first
        solve of a run, or a stiffness-hardening jump).

        Returns (M, q) with M ~= H^-1 UNSCALED and q = max|I - Hs Ms| from
        the last sweep: the caller gates the CG preconditioner on q (> 0.5
        means untrusted -> use the block-Jacobi fallback this iteration).

        f32 throughout with Precision.HIGHEST on the MXU: the NS fixed
        point sits at ~kappa(Hs)*eps_f32; Jacobi scaling keeps kappa(Hs)
        low enough (~1e4-1e6 for cloth+IPC) that the floor is a usable
        preconditioner, which bf16 operand rounding (eps ~ 8e-3) is not.
        """
        Hp = assemble_dense_scatter(conn_cat, H_cat)
        n = Hp.shape[0]
        ftype = Hp.dtype
        dg = jnp.diagonal(Hp)
        ok_d = dg > 1e-30
        s = jnp.where(ok_d, jax.lax.rsqrt(jnp.maximum(dg, 1e-30)), 1.0)
        Hs = Hp * s[:, None] * s[None, :]
        Hs = Hs + jnp.diag(jnp.where(ok_d, 0.0, 1.0).astype(ftype))
        eye = jnp.eye(n, dtype=ftype)
        hi = jax.lax.Precision.HIGHEST

        def sweep(Ms, _):
            R = eye - jnp.matmul(Hs, Ms, precision=hi)
            Ms = Ms + jnp.matmul(Ms, R, precision=hi)
            return Ms, jnp.max(jnp.abs(R))

        # warm: rescale the carried unscaled M into the CURRENT scaling
        Ms_warm = M_prev / jnp.maximum(s, 1e-30)[:, None] \
            / jnp.maximum(s, 1e-30)[None, :]
        Ms, qs = jax.lax.scan(sweep, Ms_warm, None, length=warm_sweeps)
        q = qs[-1]
        bad = jnp.logical_not(jnp.isfinite(q)) | (q > 0.9)

        def cold(_):
            norm_inf = jnp.max(jnp.sum(jnp.abs(Hs), axis=1))
            Ms0 = eye / jnp.maximum(norm_inf, 1.0)
            Msc, qc = jax.lax.scan(sweep, Ms0, None, length=cold_sweeps)
            return Msc, qc[-1]

        Ms, q = jax.lax.cond(bad, cold, lambda _: (Ms, q), operand=None)
        M = Ms * s[:, None] * s[None, :]
        finite = jnp.isfinite(q)
        M = jnp.where(finite, M, jnp.diag(s * s))
        q = jnp.where(finite, q, jnp.asarray(1e9, ftype))
        return M, q, bad

    def apply_dense_perm(M, r):
        """q = M r with M in the permuted (component-major) layout and r in
        the (n_blocks, 3) block layout."""
        N1 = n_blocks + 1
        r_pad = jnp.concatenate([r, jnp.zeros((1, 3), r.dtype)])
        v = r_pad.T.reshape(-1)
        q = M @ v
        return q.reshape(3, N1).T[:n_blocks]

    def direct_solve(grad, H_cat, dtab):
        """du = -H^{-1} grad via dense Jacobi-scaled Cholesky over the
        sorted block-pair layout. Returns (du, ok). Requires PSD element
        Hessians (ProjectedNewton mode)."""
        b = _max_arity
        N1 = n_blocks + 1
        order, starts, pid_start = dtab[0], dtab[1], dtab[2]
        H = H_cat[b]
        E_cat = H.shape[0]
        Hb = H.reshape(E_cat, b, 3, b, 3).transpose(0, 1, 3, 2, 4)
        vals = Hb.reshape(-1, 9)[order]
        # f64 cumsum: f32 running sums over ~3M stiffness-scale entries
        # would leak O(1) absolute error into small off-diagonal blocks
        csum = jnp.cumsum(vals.astype(jnp.float64), axis=0)
        R2 = vals.shape[0]
        slot_cap = starts.shape[0]
        n_slots = dtab[3]
        # next run boundary; the LAST valid slot ends at R2 (padded starts
        # are 0, so the raw shift would corrupt it)
        nxt = jnp.concatenate([starts[1:], jnp.full((1,), R2, starts.dtype)])
        has_next = jnp.arange(slot_cap) + 1 < jnp.minimum(n_slots, slot_cap)
        nxt = jnp.where(has_next, nxt, R2)
        hi = jnp.clip(nxt - 1, 0, R2 - 1)
        lo_ok = starts > 0
        base = jnp.where(lo_ok[:, None],
                         csum[jnp.clip(starts - 1, 0, R2 - 1)], 0.0)
        sums = (csum[hi] - base).astype(H.dtype)
        D4 = jnp.zeros((N1 * N1, 9), H.dtype)
        D4 = D4.at[pid_start].set(sums)
        D4 = D4.at[N1 * N1 - 1].set(0.0)  # dummy bin
        n = 3 * n_blocks
        D = D4.reshape(N1, N1, 3, 3)[:n_blocks, :n_blocks]
        D = D.transpose(0, 2, 1, 3).reshape(n, n)
        dg = jnp.diagonal(D)
        ok_d = dg > 1e-30
        s = jnp.where(ok_d, jax.lax.rsqrt(jnp.maximum(dg, 1e-30)), 1.0)
        Hs = D * s[:, None] * s[None, :]
        # identity rows for untouched blocks (padding safety)
        Hs = Hs + jnp.diag(jnp.where(ok_d, 0.0, 1.0).astype(H.dtype))
        L = jax.lax.linalg.cholesky(Hs)
        rhs = (-grad.reshape(-1) * s)[:, None]
        y = jax.lax.linalg.triangular_solve(L, rhs, left_side=True, lower=True)
        x = jax.lax.linalg.triangular_solve(L, y, left_side=True, lower=True,
                                            transpose_a=True)
        du = (x[:, 0] * s).reshape(n_blocks, 3)
        ok = jnp.all(jnp.isfinite(du))
        return jnp.where(ok, du, 0.0), ok

    class Evaluators:
        pass

    ev = Evaluators()
    ev.energy = energy
    ev.energy_grad = energy_grad
    ev.energy_grad_hess = energy_grad_hess
    ev.hvp = hvp
    ev.diag_blocks = diag_blocks
    ev.hvp_context = hvp_context
    ev.hvp_ctx = hvp_ctx
    ev.diag_blocks_ctx = diag_blocks_ctx
    ev.scatter_table = scatter_table
    ev.hvp_table = hvp_table
    ev.bucket_conn = bucket_conn
    ev.bucket_hess = bucket_hess
    ev.bucket_conn_pool = bucket_conn_pool
    ev.pool_dyn_hess = pool_dyn_hess
    ev.cat_hess_with_pool = cat_hess_with_pool
    ev.split_dyn = split_dyn
    ev.direct_tables = direct_tables
    ev.direct_solve = direct_solve
    ev.assemble_dense_perm = assemble_dense_perm
    ev.assemble_dense_scatter = assemble_dense_scatter
    ev.dense_inverse = dense_inverse
    ev.ns_refresh = ns_refresh
    ev.apply_dense_perm = apply_dense_perm
    ev.dyn_conn_cat = dyn_conn_cat
    ev.dyn_hess_cat = dyn_hess_cat
    ev.live_select = live_select
    ev.cat_static_conn = cat_static_conn
    ev.cat_with_live = cat_with_live
    ev.scatter_rows = scatter_rows
    ev.scatter_table_rows = scatter_table_rows
    ev.hvp_bucket = hvp_bucket
    ev.diag_bucket = diag_bucket
    return ev


def precondition_inverse(D, eps: float = 1e-30):
    """Batched inverse of the 3x3 diagonal blocks with identity fallback for
    empty/singular blocks (untouched DOF blocks have D=0; the reference never
    hits this because every DOF carries inertia, but padding safety matters
    here). Mirrors prepare_preconditioning (BlockedSparseMatrix.h:150-186).

    Closed-form adjugate inverse: XLA lowers `jnp.linalg.inv` through an LU
    expander (unsupported for f64 on TPU and slow for tiny batched blocks);
    the symmetric 3x3 cofactor form is pure fused elementwise math."""
    a, b, c = D[:, 0, 0], D[:, 0, 1], D[:, 0, 2]
    e, f = D[:, 1, 1], D[:, 1, 2]
    i = D[:, 2, 2]
    A = e * i - f * f
    B = c * f - b * i
    C = b * f - c * e
    det = a * A + b * B + c * C
    E2 = a * i - c * c
    F = b * c - a * f
    I2 = a * e - b * b
    adj = jnp.stack([
        jnp.stack([A, B, C], -1),
        jnp.stack([B, E2, F], -1),
        jnp.stack([C, F, I2], -1),
    ], -2)
    ok = jnp.abs(det) > eps
    eye = jnp.broadcast_to(jnp.eye(3, dtype=D.dtype), D.shape)
    inv = adj / jnp.where(ok, det, 1.0)[:, None, None]
    return jnp.where(ok[:, None, None], inv, eye)


def apply_preconditioner(Dinv, r):
    # r: (n_blocks, 3)
    return jnp.einsum("bij,bj->bi", Dinv, r)
