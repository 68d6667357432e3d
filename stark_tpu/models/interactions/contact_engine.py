"""Device-side collision pipeline: candidate generation, pair compaction,
lagged-friction precompute, and intersection testing.

Reference behavior: /root/reference/stark/src/models/interactions/
EnergyFrictionalContact.cpp — contact tables rebuilt every Newton energy
evaluation from a proximity pass over x1 = x0 + dt*v1 (:368-530), friction
anchors frozen once per step from a dt=0 pass (:531-773), and the
edge-triangle intersection oracle for line-search validity (:774-799).
Candidate exclusion rules mirror tmcd's broad phase
(BroadPhasePTEEBase.cpp:540-544, 711-721): PT discards same-mesh incident
pairs; EE dedups by (set, index) order and discards same-mesh vertex-sharing
pairs.

TPU design (SURVEY.md §7): instead of an octree + scalar narrow phase, each
(system-combo) candidate block is a dense masked distance matrix computed in
one fused XLA kernel, compacted into fixed-capacity pair buffers via
`jnp.nonzero(size=CAP)`; overflow doubles the capacity and re-traces (the
static-shape analog of the reference's dynamic arrays). A sparse/hash-grid
broad phase can later replace the dense matrices without changing the
energies.
"""
from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ... import maths
from ...collision import broad_phase as bp
from ...collision import narrow_phase as nph
from ...ops.compaction import compact_indices
from ...utils import caps_cache

# dense-pair threshold: blocks with more candidate pairs than this use the
# spatial-hash broad phase (O(N*k)) instead of the dense masked grid (O(N^2)).
# TPU-first calibration: the dense mask is pure fused vector math (~30 flops/
# pair at ~3 TFLOP/s elementwise) while the hash grid is argsort-bound (XLA
# TPU sorts measured ~10-30 ms at 200k int keys), so brute force wins up to
# ~10^8 pairs on v5e; the grid takes over for truly large scenes.
GRID_PAIR_THRESHOLD = 1 << 27


def _dedup_mask(mesh_a, idx_a, mesh_b, idx_b):
    """tmcd edge-edge dedup: approve if set_b > set_a, or same set and
    idx_b > idx_a (BroadPhasePTEEBase.cpp:711-713)."""
    return (mesh_b[None, :] > mesh_a[:, None]) | (
        (mesh_b[None, :] == mesh_a[:, None]) & (idx_b[None, :] > idx_a[:, None]))


class ContactEngine:
    def __init__(self, model, layout, dtype):
        self.model = model
        self.layout = layout
        self.dtype = dtype
        self._build_static_tables()
        self._caps: Dict[str, int] = {}
        self._contact_data: Dict[str, dict] = {}
        self._friction_data: Dict[str, dict] = {}
        self._jits = {}

    # ------------------------------------------------------------------
    # static tables (host, freeze time)
    # ------------------------------------------------------------------
    def _build_static_tables(self):
        m = self.model
        sv_gid, sv_mesh = [], []
        rv_body, rv_loc, rv_mesh = [], [], []
        es, es_mesh = [], []       # soft edges (indices into sv)
        er, er_mesh = [], []       # rigid edges (indices into rv)
        ts, ts_mesh = [], []
        tr, tr_mesh = [], []
        for mesh in m.meshes:
            h = mesh.handler_idx
            if mesh.is_rigid:
                base = len(rv_body)
                for loc in mesh.local_vertices:
                    rv_body.append(mesh.rb_idx)
                    rv_loc.append(loc)
                    rv_mesh.append(h)
                for e in mesh.edges:
                    er.append([base + e[0], base + e[1]])
                    er_mesh.append(h)
                for t in mesh.triangles:
                    tr.append([base + t[0], base + t[1], base + t[2]])
                    tr_mesh.append(h)
            else:
                base = len(sv_gid)
                for gid in mesh.point_ids:
                    sv_gid.append(int(gid))
                    sv_mesh.append(h)
                for e in mesh.edges:
                    es.append([base + e[0], base + e[1]])
                    es_mesh.append(h)
                for t in mesh.triangles:
                    ts.append([base + t[0], base + t[1], base + t[2]])
                    ts_mesh.append(h)

        ii = np.int32
        self.sv_gid = np.asarray(sv_gid, ii)
        self.sv_mesh = np.asarray(sv_mesh, ii)
        self.rv_body = np.asarray(rv_body, ii)
        self.rv_loc = np.asarray(rv_loc, np.float64).reshape(-1, 3)
        self.rv_mesh = np.asarray(rv_mesh, ii)
        self.es = np.asarray(es, ii).reshape(-1, 2)
        self.es_mesh = np.asarray(es_mesh, ii)
        self.er = np.asarray(er, ii).reshape(-1, 2)
        self.er_mesh = np.asarray(er_mesh, ii)
        self.ts = np.asarray(ts, ii).reshape(-1, 3)
        self.ts_mesh = np.asarray(ts_mesh, ii)
        self.tr = np.asarray(tr, ii).reshape(-1, 3)
        self.tr_mesh = np.asarray(tr_mesh, ii)

        nm = len(m.contact_thicknesses)
        enabled = np.ones((nm, nm), dtype=bool)
        for (a, b) in m.disabled_pairs:
            enabled[a, b] = enabled[b, a] = False
        self.enabled_mat = enabled

        # static exclusion masks per candidate block
        def pt_incident(pmesh, tri, tmesh, tri_vert_of_same_kind):
            # same mesh AND point is a vertex of the triangle
            if len(pmesh) == 0 or len(tmesh) == 0:
                return np.zeros((len(pmesh), len(tmesh)), dtype=bool)
            pidx = np.arange(len(pmesh))
            same = pmesh[:, None] == tmesh[None, :]
            inc = np.zeros((len(pmesh), len(tmesh)), dtype=bool)
            for k in range(3):
                inc |= pidx[:, None] == tri[None, :, k]
            return same & inc

        # dense (N,N) exclusion masks are only materialized for blocks on the
        # dense stage-1 path; grid-path blocks evaluate exclusions per
        # candidate functionally (O(N^2) masks would defeat the grid's point)
        def if_dense(nq, nt, build):
            return None if self._use_grid(nq, nt) else build()

        self.pt_dd_excl = if_dense(len(self.sv_mesh), len(self.ts),
            lambda: pt_incident(self.sv_mesh, self.ts, self.ts_mesh, True))

        def build_pt_rr():
            excl = pt_incident(self.rv_mesh, self.tr, self.tr_mesh, True)
            # additionally drop same-mesh rigid-rigid pairs entirely:
            # co-moving points have rigid-invariant distances (zero gradient)
            if len(self.rv_mesh) and len(self.tr_mesh):
                excl |= self.rv_mesh[:, None] == self.tr_mesh[None, :]
            return excl

        self.pt_rr_excl = if_dense(len(self.rv_mesh), len(self.tr), build_pt_rr)

        def ee_excl(edges_a, mesh_a, edges_b, mesh_b, dedup):
            na, nb = len(mesh_a), len(mesh_b)
            if na == 0 or nb == 0:
                return np.zeros((na, nb), dtype=bool)
            same = mesh_a[:, None] == mesh_b[None, :]
            share = np.zeros((na, nb), dtype=bool)
            for i in range(2):
                for j in range(2):
                    share |= edges_a[:, None, i] == edges_b[None, :, j]
            excl = same & share
            if dedup:
                ia = np.arange(na)
                approve = (mesh_b[None, :] > mesh_a[:, None]) | (
                    same & (ia[None, :] > ia[:, None]))
                excl |= ~approve
            return excl

        self.ee_dd_excl = if_dense(len(self.es), len(self.es),
            lambda: ee_excl(self.es, self.es_mesh, self.es, self.es_mesh, True))

        def build_ee_rr():
            excl = ee_excl(self.er, self.er_mesh, self.er, self.er_mesh, True)
            if len(self.er_mesh):
                excl |= self.er_mesh[:, None] == self.er_mesh[None, :]
            return excl

        self.ee_rr_excl = if_dense(len(self.er), len(self.er), build_ee_rr)

        # edge-triangle incidence for the intersection test: exclude pairs
        # sharing a vertex (same kind + mesh)
        def et_excl(edges, emesh, tris, tmesh):
            if len(emesh) == 0 or len(tmesh) == 0:
                return np.zeros((len(emesh), len(tmesh)), dtype=bool)
            same = emesh[:, None] == tmesh[None, :]
            share = np.zeros((len(emesh), len(tmesh)), dtype=bool)
            for i in range(2):
                for k in range(3):
                    share |= edges[:, None, i] == tris[None, :, k]
            return same & share

        self.et_ss_excl = if_dense(len(self.es), len(self.ts),
            lambda: et_excl(self.es, self.es_mesh, self.ts, self.ts_mesh))
        self.et_rr_excl = if_dense(len(self.er), len(self.tr),
            lambda: et_excl(self.er, self.er_mesh, self.tr, self.tr_mesh))

        # layout helpers
        self.n_soft = self.layout.n_soft
        self.rv_vblock = (self.n_soft + 2 * self.rv_body).astype(ii)
        self.rv_wblock = (self.rv_vblock + 1).astype(ii)

        # --------------------------------------------------------------
        # combined (global) primitive tables: soft primitives first, rigid
        # after, all indexing the concatenated world array Vcat=[Vs; Vr].
        # The dense candidate path evaluates ONE exact distance matrix per
        # primitive KIND (PT / EE / edge-triangle) instead of one fat
        # (Nq, K) candidate grid per system-combo stem — one compaction
        # instead of seven, and exact distances replace the sphere+top_k
        # two-stage machinery entirely (top_k alone measured ~6 ms at
        # 3136^2 on v5e; the fused exact distance matrix is elementwise
        # broadcast math with no gathers at all).
        # --------------------------------------------------------------
        n_sv, n_rv = len(self.sv_gid), len(self.rv_body)
        self.n_sv, self.n_rv = n_sv, n_rv
        self.n_ts, self.n_tr = len(self.ts), len(self.tr)
        self.n_es, self.n_er = len(self.es), len(self.er)
        self.p_mesh_all = np.concatenate([self.sv_mesh, self.rv_mesh]) \
            if n_sv + n_rv else np.zeros((0,), ii)
        t_parts = []
        if self.n_ts:
            t_parts.append(self.ts)
        if self.n_tr:
            t_parts.append(self.tr + n_sv)
        self.tris_all = (np.concatenate(t_parts).astype(ii)
                         if t_parts else np.zeros((0, 3), ii))
        self.t_mesh_all = np.concatenate([self.ts_mesh, self.tr_mesh]) \
            if self.n_ts + self.n_tr else np.zeros((0,), ii)
        e_parts = []
        if self.n_es:
            e_parts.append(self.es)
        if self.n_er:
            e_parts.append(self.er + n_sv)
        self.edges_all = (np.concatenate(e_parts).astype(ii)
                          if e_parts else np.zeros((0, 2), ii))
        self.e_mesh_all = np.concatenate([self.es_mesh, self.er_mesh]) \
            if self.n_es + self.n_er else np.zeros((0,), ii)

        Np_all, Nt_all = len(self.p_mesh_all), len(self.tris_all)
        Ne_all = len(self.edges_all)
        self.dense_pt = not self._use_grid(Np_all, Nt_all)
        self.dense_ee = not self._use_grid(Ne_all, Ne_all)
        self.dense_et = not self._use_grid(Ne_all, Nt_all)

        is_rigid_p = np.arange(Np_all) >= n_sv
        is_rigid_t = np.arange(Nt_all) >= self.n_ts
        is_rigid_e = np.arange(Ne_all) >= self.n_es

        if self.dense_pt and Np_all and Nt_all:
            pm, tm = self.p_mesh_all, self.t_mesh_all
            allowed = self.enabled_mat[np.ix_(pm, tm)].copy()
            same = pm[:, None] == tm[None, :]
            # same-mesh incident pairs (point is a triangle vertex) —
            # global vertex ids are comparable directly
            inc = np.zeros((Np_all, Nt_all), dtype=bool)
            pidx = np.arange(Np_all)
            for k in range(3):
                inc |= pidx[:, None] == self.tris_all[None, :, k]
            allowed &= ~(same & inc)
            # same-mesh rigid-rigid pairs: rigid-invariant distance
            allowed &= ~(same & is_rigid_p[:, None] & is_rigid_t[None, :])
            self.pt_allowed_dense = allowed
        else:
            self.pt_allowed_dense = None

        if self.dense_ee and Ne_all:
            em = self.e_mesh_all
            allowed = self.enabled_mat[np.ix_(em, em)].copy()
            same = em[:, None] == em[None, :]
            share = np.zeros((Ne_all, Ne_all), dtype=bool)
            for i in range(2):
                for j in range(2):
                    share |= (self.edges_all[:, None, i]
                              == self.edges_all[None, :, j])
            allowed &= ~(same & share)
            # tmcd dedup (BroadPhasePTEEBase.cpp:711-713): approve
            # set_b > set_a, or same set and idx_b > idx_a (global edge ids
            # are contiguous ascending within a mesh)
            ei = np.arange(Ne_all)
            approve = (em[None, :] > em[:, None]) | (
                same & (ei[None, :] > ei[:, None]))
            allowed &= approve
            allowed &= ~(same & is_rigid_e[:, None] & is_rigid_e[None, :])
            self.ee_allowed_dense = allowed
        else:
            self.ee_allowed_dense = None

        if self.dense_et and Ne_all and Nt_all:
            em, tm = self.e_mesh_all, self.t_mesh_all
            same = em[:, None] == tm[None, :]
            share = np.zeros((Ne_all, Nt_all), dtype=bool)
            for i in range(2):
                for k in range(3):
                    share |= (self.edges_all[:, None, i]
                              == self.tris_all[None, :, k])
            allowed = ~(same & share)
            allowed &= ~(same & is_rigid_e[:, None] & is_rigid_t[None, :])
            # disable_collision pairs are excluded from the intersection
            # oracle too (reference: id.add_blacklist alongside
            # pd.add_blacklist, EnergyFrictionalContact.cpp:114-117) —
            # deliberately overlapping bodies (e.g. a gripper's palm and
            # fingers) must not invalidate the state
            allowed &= self.enabled_mat[np.ix_(em, tm)]
            self.et_allowed_dense = allowed
        else:
            self.et_allowed_dense = None

        # initial capacities; learned caps from prior runs of the same
        # mesh signature pre-empt the bump->retrace chain (caps_cache)
        self._caps = {}
        self._cap_sig = "ce-%d-%d-%d-%d-%d-%d" % (
            len(self.sv_gid), len(self.rv_body), len(self.es),
            len(self.er), len(self.ts), len(self.tr))
        self._learned_caps = caps_cache.load(self._cap_sig)

    # ------------------------------------------------------------------
    # world positions (traced)
    # ------------------------------------------------------------------
    def _world(self, glob, dt):
        Vs = None
        Vr = None
        if len(self.sv_gid):
            Vs = glob["x0"][self.sv_gid] + dt * glob["soft_v1"][self.sv_gid]
        if len(self.rv_body):
            q0 = glob["rb_q0"]
            w1 = glob["rb_w1"]
            v1 = glob["rb_v1"]
            t0 = glob["rb_t0"]
            R1 = jax.vmap(maths.quat_integration_rotation, in_axes=(0, 0, None))(q0, w1, dt)
            t1 = t0 + dt * v1
            Vr = t1[self.rv_body] + jnp.einsum(
                "vij,vj->vi", R1[self.rv_body], jnp.asarray(self.rv_loc, self.dtype))
        return Vs, Vr

    def _engine_glob(self, dt):
        """State snapshot for the engine jits."""
        m = self.model
        d = self.dtype
        glob = {"dt": jnp.asarray(dt, d)}
        if len(self.sv_gid):
            glob["x0"] = m.dyn.x0
            glob["soft_v1"] = m.dyn.v1
        if len(self.rv_body):
            glob["rb_t0"] = jnp.asarray(m.rb_dyn.t0, d)
            glob["rb_q0"] = jnp.asarray(m.rb_dyn.q0, d)
            glob["rb_v1"] = m.rb_dyn.v1
            glob["rb_w1"] = m.rb_dyn.w1
        return glob

    def _th_vec(self):
        """Per-mesh contact thickness vector. dhat for a pair is th[a]+th[b],
        computed as a SEPARABLE broadcast th_a[:,None]+th_b[None,:] — never as
        a 2D-indexed gather dhat_mat[pm[:,None], tm[None,:]]: XLA fuses that
        gather into the O(N^2) prefilter loop and it measured 106 ms/iter of
        pure device time (vs 0.004 ms for the broadcast form) on v5e."""
        return jnp.asarray(self.model.contact_thicknesses, self.dtype)

    @staticmethod
    def _lift_mesh_pair(mat, pm, tm):
        """Lift a per-mesh-pair (M,M) matrix to primitive pairs (Np,Nt) via
        one-hot matmuls on the MXU (O(N^2 M) flops, no per-element gather —
        see _th_vec note). pm/tm are static numpy index vectors."""
        M = mat.shape[0]
        oh_p = (jnp.asarray(pm)[:, None] == jnp.arange(M)[None, :]).astype(mat.dtype)
        oh_t = (jnp.asarray(tm)[:, None] == jnp.arange(M)[None, :]).astype(mat.dtype)
        return (oh_p @ mat) @ oh_t.T

    def _mu_mat(self):
        nm = len(self.model.contact_thicknesses)
        mu = np.zeros((nm, nm))
        for (a, b), v in self.model.pair_mu.items():
            mu[a, b] = mu[b, a] = v
        return jnp.asarray(mu, self.dtype)

    # ------------------------------------------------------------------
    # candidate block definitions
    # ------------------------------------------------------------------
    def _blocks(self):
        """Yield candidate block descriptors: (family stem, point/edge side
        data, tri/edge side data, static exclusion)."""
        blocks = []
        if len(self.sv_gid) and len(self.ts):
            blocks.append(("pt_dd",))
        if len(self.sv_gid) and len(self.tr):
            blocks.append(("pt_dr",))
        if len(self.rv_body) and len(self.ts):
            blocks.append(("pt_rd",))
        if len(self.rv_body) and len(self.tr):
            blocks.append(("pt_rr",))
        if len(self.es):
            blocks.append(("ee_dd",))
        if len(self.er) and len(self.es):
            blocks.append(("ee_dr",))
        if len(self.er):
            blocks.append(("ee_rr",))
        return [b[0] for b in blocks]

    def _cap(self, name):
        """Initial pair-buffer capacity sized from mesh statistics (a few
        live pairs per primitive is the realistic ceiling for IPC-thin
        contact), so capacity-bump recompiles of the fused program stay
        rare. Overflow still doubles. Prefixes: "f_" friction pairs, "c_"
        per-query candidate row slots (K of the (Nq, K) broad buffers),
        "cf_" friction candidate row slots, "i_" per-edge intersection
        candidate row slots."""
        if name not in self._caps:
            if name.startswith("m_") or name.startswith("im_"):
                # flat mid-list capacities (combined kinds): pairs within
                # d <= dhat + slack_pair + slack_broad of the broad-build
                # state. Sized for a draped/crumpled state at max broad
                # slack (the margin is ~3.5x the pair-shell margin, area
                # scaling ~10x the live-pair count); memory is two int32
                # vectors so generosity is cheap — the per-call cost they
                # tax is one (cap x ~13 f32) gather at pair rebuild.
                if name == "m_pt":
                    # soft points near big rigid tris can capture a whole
                    # cloth region (drape on a box face) -> the extra
                    # n_sv term when rigid tris exist. Drape-measured
                    # 36.7k at 32x32 (round 5): the previous 24x sizing
                    # (32768) cost a mid-run ~3 min re-trace.
                    h = (24 + (16 if self.n_tr else 0)) * max(self.n_sv, 64) \
                        + 64 * self.n_rv
                elif name == "m_ee":
                    # long rigid edges run a thin exact-distance band along
                    # the whole soft mesh: ~n_es/2 per rigid edge mid-drape.
                    # Soft-soft factor sized for the free-fall-stride broad
                    # radius (slack_broad_max ~ 64 mm) at a crumpled state.
                    h = 48 * max(self.n_es, 64) \
                        + self.n_er * max(64, self.n_es // 2)
                elif name == "im_et":
                    # exact-lower-bound near-touch pairs. The bound
                    # d(seg,tri) >= d(mid,tri) - h_e is tight for short
                    # soft edges and useless for body-length rigid edges,
                    # which therefore budget full candidacy.
                    h = 32 * max(self.n_es, 64) \
                        + self.n_er * max(64, self.n_ts + self.n_tr)
                else:
                    # per-stem mid segments (grid path): a slice of the
                    # combined budget proportional to the family cap
                    h = 4 * self._cap(name[2:] if name.startswith("m_")
                                      else name[3:])
            elif name.startswith("w_"):
                # stage-A ball-bound wide lists (transient inside one broad
                # build): the ball slop inflates the exact mid count by the
                # covering radii (tri ~ cell size, edge ~ half-length), an
                # area factor ~2-4x; clamped by the dense matrix size
                kind = name[2:]
                mkey = "im_et" if kind == "et" else "m_" + kind
                if kind == "pt":
                    full = len(self.p_mesh_all) * max(len(self.tris_all), 1)
                elif kind == "ee":
                    full = len(self.edges_all) ** 2
                else:
                    full = len(self.edges_all) * max(len(self.tris_all), 1)
                # the stage-B exact pass and its compaction cost scale with
                # this cap (padded rows are still evaluated): 2x the tight
                # mid cap covers the measured ball-bound inflation
                # (w/m ~ 1.9-2.4x at the 32x32 drape) without doubling the
                # exact-stage work the way 4x did
                h = min(2 * self._cap(mkey), max(full, 256))
            elif name.startswith("g_"):
                # spatial-hash structural caps: per-target insertion slots /
                # per-query bucket-scan length. The scan length sizes a
                # (Q, occ) intermediate, so it starts moderate and bumps on
                # measured occupancy; h ~ R puts ~27-40 cells per target
                h = 64 if name.endswith("_ins") else 512
            elif name.startswith("cf_"):
                # friction candidate row slots (no slack margin -> fewer).
                # NOTE: check cf_ BEFORE c_ ('cf_x'.startswith('c_') too).
                stem = name[3:]
                h = min(64, max(1, self._block_sizes(stem)[1]))
            elif name.startswith("c_"):
                # broad-shell candidate row slots: within slack_broad_max a
                # dense flat mesh packs ~100-250 primitives around one query
                # (EE denser: parallel + diagonal edges). Rigid-EDGE queries
                # (ee_dr / ee_rr with few long edges) get much larger K:
                # their bounding spheres span the body, covering O(nt/4)
                # targets — measured 756 soft edges per box edge on the
                # 32x32 bench — and rows are few so (Nq, K) stays tiny.
                stem = name[2:]
                _nq, nt = self._block_sizes(stem)
                # NOTE: for EE stems the QUERY side is the FIRST geometry in
                # _ee_geom: ee_dr queries RIGID edges against soft edges
                if stem in ("ee_dr", "ee_rr"):
                    # rigid-edge queries: full candidacy (rows are few, and
                    # a body-length edge's bounding sphere legitimately
                    # covers most of a nearby mesh — measured 3024/3136
                    # soft edges per box edge mid-drape)
                    h = max(1, nt)
                else:
                    # soft queries: sized for a draped/crumpled state (the
                    # 32x32 bench measured up to 256 pt / 512 ee rows);
                    # under-sizing costs a ~100-200 s re-trace mid-run
                    h = min(1024 if stem.startswith("ee") else 512,
                            max(1, nt))
            elif name.startswith("i_"):
                kind = name[2:]
                nt = len(self.ts) if kind[1] == "s" else len(self.tr)
                if kind[0] == "r":  # rigid-edge queries: see c_ note above
                    h = max(1, nt)
                else:
                    h = min(512, max(1, nt))
            else:
                # pair-table capacities: sized for a contact REGION (a
                # fraction of the mesh), not the whole mesh — the energy,
                # Hessian, PD-projection, and CG stages all process cap rows
                # including padding, so oversizing these directly taxes every
                # Newton iteration. Worst-case pileups overflow -> double +
                # re-trace (the standing cap-bump ladder).
                # sized for a fully-draped/crumpled state (measured across
                # the full spinning drape at converged f32 criteria); the
                # active-row pool decouples these from per-iteration cost,
                # so generosity only taxes egh/stage-2, not CG/projection
                # drape-measured at 32x32 (round 5): the slack_p shell
                # holds ~10k rows across families while only ~0.5-2k are
                # live — family tables tax egh rows (cheap elementwise)
                # but NOT projection/CG (live_select), so size them for
                # the shell, not the live set
                stem = name[2:] if name.startswith("f_") else name
                if stem == "pt_dd":
                    h = 4 * len(self.sv_gid)
                elif stem == "pt_dr":
                    h = 2 * len(self.sv_gid)
                elif stem == "pt_rd":
                    h = max(len(self.rv_body), len(self.ts))
                elif stem == "pt_rr":
                    h = len(self.rv_body)
                elif stem == "ee_dd":
                    h = 4 * len(self.es)
                elif stem == "ee_dr":
                    h = max(len(self.er), len(self.es))
                else:  # ee_rr
                    h = len(self.er)
            cap = 16 if name.startswith(("c_", "cf_", "i_")) else 256
            while cap < h:
                cap *= 2
            # learned caps (prior runs of this mesh signature) pre-empt
            # the overflow->retrace ladder
            self._caps[name] = max(cap, self._learned_caps.get(name, 0))
        return self._caps[name]

    # ------------------------------------------------------------------
    # spatial-hash stage 1 (large blocks; see collision/broad_phase.py)
    # ------------------------------------------------------------------
    def _use_grid(self, nq: int, nt: int) -> bool:
        mode = getattr(self.model, "broad_phase", "auto")
        if mode == "dense":
            return False
        if mode == "grid":
            return True
        return nq * nt > GRID_PAIR_THRESHOLD

    def _block_sizes(self, stem):
        """(n_queries, n_targets) of a candidate block. NOTE: stem names
        carry tmcd's pair-kind labels, not query order — for EE stems the
        QUERY side is the FIRST geometry of _ee_geom, which is the RIGID
        edge set for ee_dr."""
        if stem.startswith("pt"):
            nq = len(self.sv_gid) if stem[3] == "d" else len(self.rv_body)
            nt = len(self.ts) if stem[4] == "d" else len(self.tr)
        elif stem == "ee_dd":
            nq = nt = len(self.es)
        elif stem == "ee_dr":
            nq, nt = len(self.er), len(self.es)
        else:  # ee_rr
            nq = nt = len(self.er)
        return nq, nt

    def _stage1_keys(self, stem):
        """Count keys emitted by stage 1 of this block (candidate count +
        the grid's insertion/occupancy maxima when the grid path is used)."""
        keys = ["c_" + stem]
        if self._use_grid(*self._block_sizes(stem)):
            keys += ["g_" + stem + "_ins", "g_" + stem + "_occ"]
        return keys

    def _allowed_pairmat(self, extra_mat):
        """(M,M) allowed matrix over mesh handler ids as a flat device
        array (tiny: per-candidate lookups are 1-D gathers)."""
        base = jnp.asarray(self.enabled_mat)
        if extra_mat is not None:
            base = base & (extra_mat != 0.0)
        return base.reshape(-1)

    @staticmethod
    def _rowk_topk(mask, tids, K: int, nt: int):
        """Per-query top-K candidate selection: keep the K smallest target
        ids among mask-true entries of each row. `tids` is the per-slot
        target id grid ((Nq, M) int32; pass the iota grid for the dense
        path). Returns (tid (Nq, K) int32 with `nt` as the invalid
        sentinel, max true row count).

        Why top_k: one fused XLA primitive, ~6 ms on a 3136x3136 mask at
        K=128 on v5e, versus 45-100+ ms for any flat global compaction
        (whose searchsorted gather cost scales with the global capacity).
        Target ids ride IN the f32 sort key (exact for nt < 2^24), so no
        index side-channel is needed."""
        Nq, M = mask.shape
        if M == 0:
            return (jnp.full((Nq, K), nt, jnp.int32), jnp.zeros((), jnp.int32))
        keyv = jnp.where(mask, jnp.asarray(nt, jnp.float32) -
                         tids.astype(jnp.float32), 0.0)
        Ke = max(1, min(K, M))
        v, _ = jax.lax.top_k(keyv, Ke)
        tid = (jnp.asarray(nt, jnp.float32) - v).astype(jnp.int32)
        if Ke < K:
            tid = jnp.pad(tid, ((0, 0), (0, K - Ke)), constant_values=nt)
        if Nq == 0:
            return tid, jnp.zeros((), jnp.int32)
        maxrow = jnp.max(jnp.sum(mask.astype(jnp.int32), axis=1))
        return tid, maxrow

    def _grid_stage1(self, key, qc, qr, tc, tr, allowed_fn, K):
        """Spatial-hash candidate generation + sphere prefilter + row-K
        selection. Returns (tid (Q, K), max_row, grid_counts) with the same
        contract as the dense stage 1."""
        ins = self._cap(key + "_ins")
        occ = self._cap(key + "_occ")
        nt = tc.shape[0]
        tsz = 1 << max(8, (4 * nt - 1).bit_length())
        h = bp.pick_cell_size(qr, tr)
        tid, valid, max_cells, max_occ = bp.grid_candidates(
            qc, qr, tc, tr, h, ins, occ, tsz)
        Q, Kg = tid.shape
        tcl = jnp.clip(tid, 0, nt - 1)
        d2 = jnp.sum((qc[:, None, :] - tc[tcl]) ** 2, -1)
        sph = d2 <= (qr[:, None] + tr[tcl]) ** 2
        qidx = jnp.broadcast_to(jnp.arange(Q, dtype=jnp.int32)[:, None], (Q, Kg))
        mask = valid & sph & allowed_fn(qidx, tcl)
        tid_out, max_row = self._rowk_topk(mask, tcl, K, nt)
        # insertion-slot overflow loses candidates silently; occupancy
        # overflow truncates bucket scans — both must bump + re-trace
        counts = {key + "_ins": max_cells, key + "_occ": max_occ}
        return tid_out, max_row, counts

    def _pt_allowed_fn(self, stem, tri_np, pm_np, tm_np, extra_mat):
        """Per-candidate functional exclusions for the grid path (the dense
        path precomputes these as (N,N) masks, which would be O(N^2) memory
        at grid scales). Mirrors tmcd: PT discards same-mesh incident pairs
        (BroadPhasePTEEBase.cpp:540-544); same-mesh rigid-rigid pairs are
        dropped entirely (rigid-invariant distance)."""
        M = len(self.model.contact_thicknesses)
        allowed_flat = self._allowed_pairmat(extra_mat)
        pm = jnp.asarray(pm_np)
        tm = jnp.asarray(tm_np)
        tri = jnp.asarray(tri_np, jnp.int32)

        def f(cp, ct):
            pm_c = pm[cp]
            tm_c = tm[ct]
            ok = allowed_flat[pm_c * M + tm_c]
            if stem == "pt_dd":
                inc = (cp == tri[ct, 0]) | (cp == tri[ct, 1]) | (cp == tri[ct, 2])
                ok = ok & jnp.logical_not((pm_c == tm_c) & inc)
            elif stem == "pt_rr":
                ok = ok & (pm_c != tm_c)
            return ok

        return f

    def _ee_allowed_fn(self, stem, ea_np, eb_np, am_np, bm_np, extra_mat):
        """EE grid exclusions: tmcd dedup (approve set_b > set_a, or same set
        and idx_b > idx_a, BroadPhasePTEEBase.cpp:711-721) + same-mesh
        vertex-sharing discard; same-mesh rigid-rigid dropped entirely."""
        M = len(self.model.contact_thicknesses)
        allowed_flat = self._allowed_pairmat(extra_mat)
        am = jnp.asarray(am_np)
        bm = jnp.asarray(bm_np)
        ea = jnp.asarray(ea_np, jnp.int32)
        eb = jnp.asarray(eb_np, jnp.int32)

        def f(ca, cb):
            am_c = am[ca]
            bm_c = bm[cb]
            ok = allowed_flat[am_c * M + bm_c]
            if stem == "ee_dd":
                approve = (bm_c > am_c) | ((bm_c == am_c) & (cb > ca))
                share = jnp.zeros_like(approve)
                for i in range(2):
                    for j in range(2):
                        share = share | (ea[ca, i] == eb[cb, j])
                ok = ok & approve & jnp.logical_not(share)
            elif stem == "ee_rr":
                # same-mesh excluded + cross-mesh dedup => strict order
                ok = ok & (bm_c > am_c)
            return ok

        return f

    # ------------------------------------------------------------------
    # pair generation (traced; shapes static given caps)
    # ------------------------------------------------------------------
    def _pt_pairs(self, stem, Vs, Vr, th, extra_mat=None, slack=None):
        """Two-stage masked PT proximity for one combo block.

        Stage 1 (broad phase, dense but ~10 flops/pair): point-vs-triangle
        bounding-sphere test `|p-c|^2 <= (r+dhat)^2` over the full (P,T)
        grid — the TPU-native replacement of tmcd's octree AABB overlap
        (BroadPhasePTEEBase.cpp:51-100), conservative since
        d(p,tri) >= |p-c| - r — then per-query row-K selection (_rowk_topk).
        Stage 2 (narrow phase): exact IPC point-triangle distance on the
        (Nq, K) candidate grid, compacted to the final pair capacity.

        slack (traced scalar or None): when given, pairs are collected out to
        d <= dhat + slack (the per-solve frozen-candidate margin; see
        fused.py) and the counts dict gains an "n_live_<stem>" entry with the
        exact d <= dhat pair count at this state (a metric, not a cap).

        Returns (p_idx, t_idx, active, d, counts_dict, dhat_sel)."""
        P, pm, tri, tm, t0, t1, t2, c, r, th_p, th_t = self._pt_geom(
            stem, Vs, Vr, th)

        pfx = "f_" if extra_mat is not None else ""
        ckey = ("cf_" if extra_mat is not None else "c_") + stem
        K = self._cap(ckey)
        cap = self._cap(pfx + stem)
        counts = {}
        sl = jnp.asarray(0.0 if slack is None else slack, self.dtype)

        tid, max_row, c1 = self._pt_stage1(stem, P, c, r, th_p, th_t, sl,
                                           tri, pm, tm, extra_mat, K)
        counts.update(c1)
        p_idx, t_idx, active, d_sel, dhat_sel, c2 = self._pt_stage2(
            stem, P, t0, t1, t2, th_p, th_t, tid,
            sl, cap, pfx, with_live=slack is not None)
        counts.update(c2)
        counts[ckey] = max_row
        return p_idx, t_idx, active, d_sel, counts, dhat_sel

    def _pt_geom(self, stem, Vs, Vr, th):
        """Per-stem PT geometry: points, triangles, bounding spheres,
        thicknesses."""
        if stem == "pt_dd":
            P, pm = Vs, self.sv_mesh
            T, tri, tm = Vs, self.ts, self.ts_mesh
        elif stem == "pt_dr":
            P, pm = Vs, self.sv_mesh
            T, tri, tm = Vr, self.tr, self.tr_mesh
        elif stem == "pt_rd":
            P, pm = Vr, self.rv_mesh
            T, tri, tm = Vs, self.ts, self.ts_mesh
        else:  # pt_rr
            P, pm = Vr, self.rv_mesh
            T, tri, tm = Vr, self.tr, self.tr_mesh
        t0 = T[tri[:, 0]]
        t1 = T[tri[:, 1]]
        t2 = T[tri[:, 2]]
        th_p = th[jnp.asarray(pm)]   # (Np,) per-primitive thickness
        th_t = th[jnp.asarray(tm)]   # (Nt,)
        c = (t0 + t1 + t2) / 3.0
        r = jnp.sqrt(jnp.maximum(jnp.maximum(
            jnp.sum((t0 - c) ** 2, -1), jnp.sum((t1 - c) ** 2, -1)),
            jnp.sum((t2 - c) ** 2, -1)))
        return P, pm, tri, tm, t0, t1, t2, c, r, th_p, th_t

    def _pt_stage1(self, stem, P, c, r, th_p, th_t, sl, tri, pm, tm,
                   extra_mat, K):
        """PT broad phase -> per-query row-K candidates (tid, max_row)."""
        nt = len(tm)
        counts = {}
        if self._use_grid(len(pm), nt):
            # spatial hash (O(N*k)); exclusions evaluate per candidate
            # (functional form — no O(N^2) masks)
            allowed_fn = self._pt_allowed_fn(stem, tri, pm, tm, extra_mat)
            tid, max_row, gc = self._grid_stage1(
                "g_" + stem, P, th_p + sl, c, r + th_t, allowed_fn, K)
            counts.update(gc)
        else:
            # bounding-sphere prefilter on the dense grid (dhat enters as
            # the separable broadcast th_p + th_t, see _th_vec)
            excl = {"pt_dd": self.pt_dd_excl, "pt_rr": self.pt_rr_excl}.get(stem)
            if excl is None:
                excl = np.zeros((len(pm), nt), dtype=bool)
            allowed = jnp.asarray(self.enabled_mat[np.ix_(pm, tm)] & ~excl)
            if extra_mat is not None:
                allowed = allowed & (self._lift_mesh_pair(extra_mat, pm, tm) != 0.0)
            dc2 = jnp.sum((P[:, None, :] - c[None, :, :]) ** 2, -1)
            pre = allowed & (dc2 <= (r[None, :] + sl + th_p[:, None] + th_t[None, :]) ** 2)
            tids = jnp.broadcast_to(jnp.arange(nt, dtype=jnp.int32)[None, :],
                                    pre.shape)
            tid, max_row = self._rowk_topk(pre, tids, K, nt)
        return tid, max_row, counts

    def _pt_stage2(self, stem, P, t0, t1, t2, th_p, th_t, tid, sl, cap,
                   pfx="", with_live=False):
        """Exact IPC point-triangle distances over the (Nq, K) candidate
        grid, filtered to d <= dhat + sl and compacted to the pair
        capacity.

        Gather discipline: per-candidate data comes from ONE fat-row gather
        (tri vertices + thickness packed as (Nt, 10) rows); the query side
        broadcasts per row with no gather at all. Scalar-column gathers at
        (Nq*K) scale measured ~6-16 ms EACH on v5e (5-20 ns/element);
        the fat-row form is ~12x cheaper."""
        Nq, K = tid.shape
        nt = t0.shape[0]
        tc2 = jnp.clip(tid, 0, max(nt - 1, 0))
        fat = jnp.concatenate([t0, t1, t2, th_t[:, None]], axis=-1)  # (Nt,10)
        T = fat[tc2].reshape(Nq * K, 10)
        Pk = jnp.broadcast_to(P[:, None, :], (Nq, K, 3)).reshape(Nq * K, 3)
        d_c = jax.vmap(nph.point_triangle_distance)(
            Pk, T[:, 0:3], T[:, 3:6], T[:, 6:9])
        dhat_c = jnp.broadcast_to(th_p[:, None], (Nq, K)).reshape(-1) + T[:, 9]
        in_range = (tid < nt).reshape(-1)
        valid = in_range & (d_c <= dhat_c + sl)
        sel, count = compact_indices(valid, cap)
        active = jnp.arange(cap) < count
        counts = {pfx + stem: count}
        if with_live:
            counts["n_live_" + stem] = jnp.sum(
                (in_range & (d_c <= dhat_c)).astype(jnp.int32))
        qc = (sel // K).astype(jnp.int32)
        return qc, tc2.reshape(-1)[sel], active, d_c[sel], dhat_c[sel], counts

    def _ee_pairs(self, stem, Vs, Vr, th, extra_mat=None, slack=None):
        """Two-stage masked EE proximity (see _pt_pairs): stage 1 is the
        edge bounding-sphere test `|ma-mb|^2 <= (la/2+lb/2+dhat)^2` over the
        dense grid, stage 2 the exact IPC edge-edge distance on compacted
        candidates. slack: see _pt_pairs."""
        (ea, eam, eb, ebm, a0, a1, b0, b1, ma, ha, mb, hb,
         th_a, th_b) = self._ee_geom(stem, Vs, Vr, th)

        pfx = "f_" if extra_mat is not None else ""
        ckey = ("cf_" if extra_mat is not None else "c_") + stem
        K = self._cap(ckey)
        cap = self._cap(pfx + stem)
        counts = {}
        sl = jnp.asarray(0.0 if slack is None else slack, self.dtype)

        tid, max_row, c1 = self._ee_stage1(stem, ma, ha, mb, hb, th_a, th_b,
                                           sl, ea, eb, eam, ebm, extra_mat, K)
        counts.update(c1)
        a_sel, b_sel, active, d_sel, dhat_sel, c2 = self._ee_stage2(
            stem, a0, a1, b0, b1, th_a, th_b, tid,
            sl, cap, pfx, with_live=slack is not None)
        counts.update(c2)
        counts[ckey] = max_row
        return a_sel, b_sel, active, d_sel, counts, dhat_sel

    def _ee_geom(self, stem, Vs, Vr, th):
        """Per-stem EE geometry: endpoints, midpoints/half-lengths,
        thicknesses."""
        if stem == "ee_dd":
            EA, ea, eam = Vs, self.es, self.es_mesh
            EB, eb, ebm = Vs, self.es, self.es_mesh
        elif stem == "ee_dr":
            EA, ea, eam = Vr, self.er, self.er_mesh
            EB, eb, ebm = Vs, self.es, self.es_mesh
        else:  # ee_rr
            EA, ea, eam = Vr, self.er, self.er_mesh
            EB, eb, ebm = Vr, self.er, self.er_mesh
        a0, a1 = EA[ea[:, 0]], EA[ea[:, 1]]
        b0, b1 = EB[eb[:, 0]], EB[eb[:, 1]]
        th_a = th[jnp.asarray(eam)]
        th_b = th[jnp.asarray(ebm)]
        ma, ha = 0.5 * (a0 + a1), 0.5 * jnp.linalg.norm(a1 - a0, axis=-1)
        mb, hb = 0.5 * (b0 + b1), 0.5 * jnp.linalg.norm(b1 - b0, axis=-1)
        return ea, eam, eb, ebm, a0, a1, b0, b1, ma, ha, mb, hb, th_a, th_b

    def _ee_stage1(self, stem, ma, ha, mb, hb, th_a, th_b, sl, ea, eb, eam,
                   ebm, extra_mat, K):
        """EE broad phase -> per-query row-K candidates (tid, max_row)."""
        nb = len(ebm)
        counts = {}
        if self._use_grid(len(eam), nb):
            allowed_fn = self._ee_allowed_fn(stem, ea, eb, eam, ebm, extra_mat)
            tid, max_row, gc = self._grid_stage1(
                "g_" + stem, ma, ha + th_a + sl, mb, hb + th_b, allowed_fn, K)
            counts.update(gc)
        else:
            # midpoint/half-length sphere bound, conservative since
            # d(ea,eb) >= |ma-mb| - la/2 - lb/2 (dhat as separable broadcast,
            # see _th_vec)
            excl = {"ee_dd": self.ee_dd_excl, "ee_rr": self.ee_rr_excl}.get(stem)
            if excl is None:
                excl = np.zeros((len(eam), nb), dtype=bool)
            allowed = jnp.asarray(self.enabled_mat[np.ix_(eam, ebm)] & ~excl)
            if extra_mat is not None:
                allowed = allowed & (self._lift_mesh_pair(extra_mat, eam, ebm) != 0.0)
            dm2 = jnp.sum((ma[:, None, :] - mb[None, :, :]) ** 2, -1)
            pre = allowed & (dm2 <= (ha[:, None] + hb[None, :] + sl
                                     + th_a[:, None] + th_b[None, :]) ** 2)
            tids = jnp.broadcast_to(jnp.arange(nb, dtype=jnp.int32)[None, :],
                                    pre.shape)
            tid, max_row = self._rowk_topk(pre, tids, K, nb)
        return tid, max_row, counts

    def _ee_stage2(self, stem, a0, a1, b0, b1, th_a, th_b, tid, sl, cap,
                   pfx="", with_live=False):
        """Exact IPC edge-edge distances over the (Nq, K) candidate grid,
        filtered to d <= dhat + sl and compacted to the pair capacity.
        Fat-row gather discipline — see _pt_stage2."""
        Nq, K = tid.shape
        nb = b0.shape[0]
        cb2 = jnp.clip(tid, 0, max(nb - 1, 0))
        fat = jnp.concatenate([b0, b1, th_b[:, None]], axis=-1)   # (Nb, 7)
        B = fat[cb2].reshape(Nq * K, 7)
        A0 = jnp.broadcast_to(a0[:, None, :], (Nq, K, 3)).reshape(Nq * K, 3)
        A1 = jnp.broadcast_to(a1[:, None, :], (Nq, K, 3)).reshape(Nq * K, 3)
        ptol = self.model.edge_edge_cross_norm_sq_cutoff
        d_c = jax.vmap(lambda x0, x1, y0, y1: nph.edge_edge_distance(
            x0, x1, y0, y1, parallel_tol=ptol))(A0, A1, B[:, 0:3], B[:, 3:6])
        dhat_c = jnp.broadcast_to(th_a[:, None], (Nq, K)).reshape(-1) + B[:, 6]
        in_range = (tid < nb).reshape(-1)
        valid = in_range & (d_c <= dhat_c + sl)
        sel, count = compact_indices(valid, cap)
        active = jnp.arange(cap) < count
        counts = {pfx + stem: count}
        if with_live:
            counts["n_live_" + stem] = jnp.sum(
                (in_range & (d_c <= dhat_c)).astype(jnp.int32))
        ca = (sel // K).astype(jnp.int32)
        return ca, cb2.reshape(-1)[sel], active, d_c[sel], dhat_c[sel], counts

    # ------------------------------------------------------------------
    # family data builders (traced)
    # ------------------------------------------------------------------
    def _pt_family_data(self, stem, p_idx, t_idx, active, dhat):
        ii = jnp.int32
        sv_gid = jnp.asarray(self.sv_gid, ii) if len(self.sv_gid) else None
        rows = {"active": active.astype(self.dtype), "dhat": dhat}
        if stem == "pt_dd":
            tri = jnp.asarray(self.ts, ii)[t_idx]
            nodes = jnp.concatenate([sv_gid[p_idx][:, None], sv_gid[tri]], axis=1)
            rows["nodes"] = nodes
            conn = nodes
        elif stem == "pt_dr":
            tri = jnp.asarray(self.tr, ii)[t_idx]
            rows["node_p"] = sv_gid[p_idx]
            rows["body_b"] = jnp.asarray(self.rv_body, ii)[tri[:, 0]]
            rows["t_loc"] = jnp.asarray(self.rv_loc, self.dtype)[tri]
            conn = jnp.stack([
                sv_gid[p_idx],
                jnp.asarray(self.rv_vblock, ii)[tri[:, 0]],
                jnp.asarray(self.rv_wblock, ii)[tri[:, 0]],
            ], axis=1)
        elif stem == "pt_rd":
            tri = jnp.asarray(self.ts, ii)[t_idx]
            rows["body_a"] = jnp.asarray(self.rv_body, ii)[p_idx]
            rows["p_loc"] = jnp.asarray(self.rv_loc, self.dtype)[p_idx]
            rows["nodes_t"] = sv_gid[tri]
            conn = jnp.concatenate([
                jnp.asarray(self.rv_vblock, ii)[p_idx][:, None],
                jnp.asarray(self.rv_wblock, ii)[p_idx][:, None],
                sv_gid[tri],
            ], axis=1)
        else:  # pt_rr
            tri = jnp.asarray(self.tr, ii)[t_idx]
            rows["body_a"] = jnp.asarray(self.rv_body, ii)[p_idx]
            rows["p_loc"] = jnp.asarray(self.rv_loc, self.dtype)[p_idx]
            rows["body_b"] = jnp.asarray(self.rv_body, ii)[tri[:, 0]]
            rows["t_loc"] = jnp.asarray(self.rv_loc, self.dtype)[tri]
            conn = jnp.stack([
                jnp.asarray(self.rv_vblock, ii)[p_idx],
                jnp.asarray(self.rv_wblock, ii)[p_idx],
                jnp.asarray(self.rv_vblock, ii)[tri[:, 0]],
                jnp.asarray(self.rv_wblock, ii)[tri[:, 0]],
            ], axis=1)
        return {"conn": conn, "rows": rows}

    def _ee_family_data(self, stem, a_idx, b_idx, active, dhat):
        ii = jnp.int32
        sv_gid = jnp.asarray(self.sv_gid, ii) if len(self.sv_gid) else None
        rows = {"active": active.astype(self.dtype), "dhat": dhat}
        if stem == "ee_dd":
            ea = jnp.asarray(self.es, ii)[a_idx]
            eb = jnp.asarray(self.es, ii)[b_idx]
            nodes = jnp.concatenate([sv_gid[ea], sv_gid[eb]], axis=1)
            rows["nodes"] = nodes
            conn = nodes
        elif stem == "ee_dr":
            ea = jnp.asarray(self.er, ii)[a_idx]
            eb = jnp.asarray(self.es, ii)[b_idx]
            rows["body_a"] = jnp.asarray(self.rv_body, ii)[ea[:, 0]]
            rows["ea_loc"] = jnp.asarray(self.rv_loc, self.dtype)[ea]
            rows["nodes_b"] = sv_gid[eb]
            conn = jnp.concatenate([
                jnp.asarray(self.rv_vblock, ii)[ea[:, 0]][:, None],
                jnp.asarray(self.rv_wblock, ii)[ea[:, 0]][:, None],
                sv_gid[eb],
            ], axis=1)
        else:  # ee_rr
            ea = jnp.asarray(self.er, ii)[a_idx]
            eb = jnp.asarray(self.er, ii)[b_idx]
            rows["body_a"] = jnp.asarray(self.rv_body, ii)[ea[:, 0]]
            rows["ea_loc"] = jnp.asarray(self.rv_loc, self.dtype)[ea]
            rows["body_b"] = jnp.asarray(self.rv_body, ii)[eb[:, 0]]
            rows["eb_loc"] = jnp.asarray(self.rv_loc, self.dtype)[eb]
            conn = jnp.stack([
                jnp.asarray(self.rv_vblock, ii)[ea[:, 0]],
                jnp.asarray(self.rv_wblock, ii)[ea[:, 0]],
                jnp.asarray(self.rv_vblock, ii)[eb[:, 0]],
                jnp.asarray(self.rv_wblock, ii)[eb[:, 0]],
            ], axis=1)
        return {"conn": conn, "rows": rows}

    # ------------------------------------------------------------------
    # combined dense-exact candidate pipeline
    #
    # One exact distance matrix per primitive KIND over the concatenated
    # soft+rigid primitive tables (broadcast math, no gathers), one
    # compaction per kind into a flat "mid list" of candidate pairs within
    # d <= dhat + slack_pair + slack_broad, then per-Newton-iteration pair
    # tables from exact distances over the SMALL mid list only. Replaces
    # the per-stem sphere-prefilter + top_k + fat-(Nq,K)-grid stages whose
    # pair-shell rebuild cost (~39 ms/iteration measured at 32x32) was the
    # largest single cost of the fused solve.
    # ------------------------------------------------------------------
    def _vcat(self, Vs, Vr):
        parts = []
        if self.n_sv:
            parts.append(Vs)
        if self.n_rv:
            parts.append(Vr)
        if not parts:
            return jnp.zeros((0, 3), self.dtype)
        return jnp.concatenate(parts) if len(parts) > 1 else parts[0]

    def _pt_dense_d(self, Vcat, th):
        """Exact PT distances over the combined grid: (d (Np,Nt), dhat)."""
        tris = jnp.asarray(self.tris_all)
        t0, t1, t2 = Vcat[tris[:, 0]], Vcat[tris[:, 1]], Vcat[tris[:, 2]]
        d = jax.vmap(
            lambda p: jax.vmap(nph.point_triangle_distance,
                               in_axes=(None, 0, 0, 0))(p, t0, t1, t2)
        )(Vcat)
        dhat = (th[jnp.asarray(self.p_mesh_all)][:, None]
                + th[jnp.asarray(self.t_mesh_all)][None, :])
        return d, dhat

    def _ee_dense_d(self, Vcat, th):
        """Exact EE distances over the combined grid: (d (Ne,Ne), dhat)."""
        edges = jnp.asarray(self.edges_all)
        a0, a1 = Vcat[edges[:, 0]], Vcat[edges[:, 1]]
        ptol = self.model.edge_edge_cross_norm_sq_cutoff
        d = jax.vmap(
            lambda x0, x1: jax.vmap(
                lambda y0, y1: nph.edge_edge_distance(
                    x0, x1, y0, y1, parallel_tol=ptol))(a0, a1)
        )(a0, a1)
        the = th[jnp.asarray(self.e_mesh_all)]
        dhat = the[:, None] + the[None, :]
        return d, dhat

    def _et_dense_lb(self, Vcat):
        """Conservative segment-triangle distance LOWER BOUND over the
        combined grid: d(seg,tri) >= d(mid,tri) - h_e (exact PT distance of
        the segment midpoint minus its half-length)."""
        edges = jnp.asarray(self.edges_all)
        tris = jnp.asarray(self.tris_all)
        p0, p1 = Vcat[edges[:, 0]], Vcat[edges[:, 1]]
        m = 0.5 * (p0 + p1)
        h = 0.5 * jnp.linalg.norm(p1 - p0, axis=-1)
        t0, t1, t2 = Vcat[tris[:, 0]], Vcat[tris[:, 1]], Vcat[tris[:, 2]]
        d = jax.vmap(
            lambda p: jax.vmap(nph.point_triangle_distance,
                               in_axes=(None, 0, 0, 0))(p, t0, t1, t2)
        )(m)
        return d - h[:, None]

    # ------------------------------------------------------------------
    # two-stage dense candidate generation (fused broad shell)
    #
    # Stage A (bounding balls, MXU): every primitive kind is covered by a
    # ball (point: the point; edge: midpoint + half-length; triangle:
    # centroid + covering radius), so d(A, B) >= |c_A - c_B| - r_A - r_B.
    # The dense |c_A - c_B|^2 matrix is ONE matmul (|a|^2 + |b|^2 - 2 a.b)
    # plus a fused compare — no (N, M, k) classifier intermediates. The
    # exact dense matrices this replaces (vmapped 7/9-region classifiers
    # over every pair) measured 62 ms of device time per broad build at
    # 32x32; three ball matmuls + compactions measure ~5 ms.
    # Stage B (exact, flat): exact distances ONLY over the compacted
    # stage-A wide list, re-compacted into the tight mid lists — identical
    # final semantics to the exact dense matrices.
    # ------------------------------------------------------------------
    def _tri_balls(self, Vcat):
        tris = jnp.asarray(self.tris_all)
        t0, t1, t2 = Vcat[tris[:, 0]], Vcat[tris[:, 1]], Vcat[tris[:, 2]]
        c = (t0 + t1 + t2) / 3.0
        r = jnp.sqrt(jnp.maximum(jnp.maximum(
            jnp.sum((t0 - c) ** 2, -1), jnp.sum((t1 - c) ** 2, -1)),
            jnp.sum((t2 - c) ** 2, -1)))
        return c, r

    def _edge_balls(self, Vcat):
        edges = jnp.asarray(self.edges_all)
        p0, p1 = Vcat[edges[:, 0]], Vcat[edges[:, 1]]
        m = 0.5 * (p0 + p1)
        h = 0.5 * jnp.linalg.norm(p1 - p0, axis=-1)
        return m, h

    def _bound_pad(self, Vcat):
        """Absolute slop added to the ball threshold covering the f32
        cancellation of the matmul-form |a|^2+|b|^2-2a.b at coordinate
        magnitude ~max|V|: |d2_err| <= ~8 eps max|V|^2, so the distance
        slop at separation ~dhat is err/(2 dhat); bounded instead by its
        sqrt form which is valid at ALL separations."""
        scale = 1.0 + jnp.max(jnp.abs(Vcat)) if Vcat.shape[0] else 1.0
        return 8.0 * jnp.sqrt(jnp.asarray(
            jnp.finfo(self.dtype).eps, self.dtype)) * scale

    def _ball_wide(self, key, A, ra, B, rb, allowed, extra):
        """Stage A: flat wide list of pairs with |c_A-c_B| - ra - rb <=
        extra (per-side radii already include contact thickness where
        applicable). Compare is done in squared form; rhs >= 0 always."""
        a2 = jnp.sum(A * A, -1)
        b2 = jnp.sum(B * B, -1)
        m2 = a2[:, None] + b2[None, :] - 2.0 * (A @ B.T)
        rhs = ra[:, None] + rb[None, :] + extra
        valid = jnp.asarray(allowed) & (m2 <= rhs * rhs)
        return self._mid_compact(valid, self._cap(key))

    @staticmethod
    def _refine(q, t, act, keep, cap):
        """Stage B re-compaction of wide rows into the tight mid list."""
        sel, cnt = compact_indices(act & keep, cap)
        a2 = jnp.arange(cap) < jnp.minimum(cnt, cap)
        return (q[sel], t[sel], a2), cnt

    @staticmethod
    def _mid_compact(valid, cap):
        """(q, t, act) flat mid list from a dense validity matrix."""
        Nt = valid.shape[1]
        sel, cnt = compact_indices(valid.reshape(-1), cap)
        q = (sel // Nt).astype(jnp.int32)
        t = (sel % Nt).astype(jnp.int32)
        act = jnp.arange(cap) < jnp.minimum(cnt, cap)
        return (q, t, act), cnt

    def _pt_stems(self):
        return [s for s in self._blocks() if s.startswith("pt")]

    def _ee_stems(self):
        return [s for s in self._blocks() if s.startswith("ee")]

    def _pt_kind_mask(self, stem, q, t):
        ps = q < self.n_sv
        ts_ = t < self.n_ts
        return {"pt_dd": ps & ts_, "pt_dr": ps & ~ts_,
                "pt_rd": ~ps & ts_, "pt_rr": ~ps & ~ts_}[stem]

    def _pt_localize(self, stem, q, t):
        p_loc = q - (0 if stem[3] == "d" else self.n_sv)
        t_loc = t - (0 if stem[4] == "d" else self.n_ts)
        return p_loc, t_loc

    def _route_pt(self, q, t, valid, dhat_rows, cap_pfx="", d_rows=None):
        """Route flat PT candidate rows into per-stem family pair tables:
        {stem: (p_loc, t_loc, active, dhat_sel, d_sel, count)}."""
        out = {}
        for stem in self._pt_stems():
            cap = self._cap(cap_pfx + stem)
            sel, cnt = compact_indices(valid & self._pt_kind_mask(stem, q, t),
                                       cap)
            active = jnp.arange(cap) < jnp.minimum(cnt, cap)
            p_loc, t_loc = self._pt_localize(stem, q[sel], t[sel])
            d_sel = d_rows[sel] if d_rows is not None else None
            out[stem] = (p_loc, t_loc, active, dhat_rows[sel], d_sel, cnt)
        return out

    def _ee_kind_sides(self, stem, a, b):
        """(mask, a_side, b_side) for one EE stem over flat candidate rows.
        ee_dr family rows want (rigid er-local, soft es-local) sides, so
        mixed rows swap as needed; dd/rr keep the deduped (a, b) order."""
        as_ = a < self.n_es
        bs_ = b < self.n_es
        if stem == "ee_dd":
            return as_ & bs_, a, b
        if stem == "ee_rr":
            return ~as_ & ~bs_, a, b
        mixed = as_ != bs_
        ar = jnp.where(as_, b, a)   # the rigid side
        bs2 = jnp.where(as_, a, b)  # the soft side
        return mixed, ar, bs2

    def _route_ee(self, a, b, valid, dhat_rows, cap_pfx="", d_rows=None):
        out = {}
        for stem in self._ee_stems():
            cap = self._cap(cap_pfx + stem)
            mask, aa, bb = self._ee_kind_sides(stem, a, b)
            sel, cnt = compact_indices(valid & mask, cap)
            active = jnp.arange(cap) < jnp.minimum(cnt, cap)
            a_loc = aa[sel] - (0 if stem == "ee_dd" else self.n_es)
            b_loc = bb[sel] - (self.n_es if stem == "ee_rr" else 0)
            d_sel = d_rows[sel] if d_rows is not None else None
            out[stem] = (a_loc, b_loc, active, dhat_rows[sel], d_sel, cnt)
        return out

    # ------------------------------------------------------------------
    # contact refresh (every Newton energy evaluation; staged path)
    # ------------------------------------------------------------------
    def _contacts_fn(self, glob, th):
        Vs, Vr = self._world(glob, glob["dt"])
        out = {}
        counts = {}
        if self.dense_pt and self.dense_ee:
            Vcat = self._vcat(Vs, Vr)
            if self._pt_stems():
                d, dhat = self._pt_dense_d(Vcat, th)
                allowed = jnp.asarray(self.pt_allowed_dense)
                valid = (allowed & (d <= dhat)).reshape(-1)
                Nt = d.shape[1]
                idx = jnp.arange(valid.shape[0], dtype=jnp.int32)
                q, t = idx // Nt, idx % Nt
                routed = self._route_pt(q, t, valid, dhat.reshape(-1))
                for stem, (p, tl, act, dh, _d, cnt) in routed.items():
                    out["contact_" + stem] = self._pt_family_data(
                        stem, p, tl, act, dh)
                    counts[stem] = cnt
            if self._ee_stems():
                d, dhat = self._ee_dense_d(Vcat, th)
                allowed = jnp.asarray(self.ee_allowed_dense)
                valid = (allowed & (d <= dhat)).reshape(-1)
                Ne = d.shape[1]
                idx = jnp.arange(valid.shape[0], dtype=jnp.int32)
                a, b = idx // Ne, idx % Ne
                routed = self._route_ee(a, b, valid, dhat.reshape(-1))
                for stem, (al, bl, act, dh, _d, cnt) in routed.items():
                    out["contact_" + stem] = self._ee_family_data(
                        stem, al, bl, act, dh)
                    counts[stem] = cnt
            return out, counts
        for stem in self._blocks():
            if stem.startswith("pt"):
                p_idx, t_idx, active, d, cnts, dh = self._pt_pairs(stem, Vs, Vr, th)
                out["contact_" + stem] = self._pt_family_data(stem, p_idx, t_idx, active, dh)
            else:
                a_idx, b_idx, active, d, cnts, dh = self._ee_pairs(stem, Vs, Vr, th)
                out["contact_" + stem] = self._ee_family_data(stem, a_idx, b_idx, active, dh)
            counts.update(cnts)
        return out, counts

    # ------------------------------------------------------------------
    # twin-range frozen candidate tables (fused path; see fused.py)
    #
    # BROAD shell (expensive: grids, sorts, big compactions): candidate
    # index buffers within a large slack_b margin, plus the intersection
    # candidate buffers. Rebuilt rarely (motion > 0.45*slack_b).
    # PAIR shell (cheap: exact distances over the candidate buffers + small
    # compactions): the actual energy pair tables within a small slack_p
    # margin. Rebuilt whenever motion exceeds its budget — every iteration
    # during fast motion, never at rest.
    # ------------------------------------------------------------------
    def broad_fn(self, Vs, Vr, th, slack_b, slack_p):
        """Broad-shell build: flat mid lists {kind: (q, t, act)} of exact
        candidate pairs within d <= dhat + slack_p + slack_b of THIS state
        (a pair can enter the pair shell while the broad shell is valid
        only if its distance here was within the two-sided motion budget
        2*0.45*slack_b < slack_b), plus intersection candidates + counts
        (m_* totals; > cap means bump + re-trace)."""
        mcands = {}
        counts = {}
        margin = jnp.asarray(slack_p, self.dtype) + jnp.asarray(
            slack_b, self.dtype)
        if not (self.dense_pt and self.dense_ee):
            mcands, counts = self._broad_grid(Vs, Vr, th, slack_b, slack_p)
        else:
            Vcat = self._vcat(Vs, Vr)
            pad = self._bound_pad(Vcat)
            th_p = th[jnp.asarray(self.p_mesh_all)]
            th_t = th[jnp.asarray(self.t_mesh_all)] if len(self.t_mesh_all) \
                else th[:0]
            th_e = th[jnp.asarray(self.e_mesh_all)] if len(self.e_mesh_all) \
                else th[:0]
            if self._pt_stems():
                c, r = self._tri_balls(Vcat)
                (q, t, act), wcnt = self._ball_wide(
                    "w_pt", Vcat, th_p, c, r + th_t,
                    self.pt_allowed_dense, margin + pad)
                counts["w_pt"] = wcnt
                tq = jnp.asarray(self.tris_all)[t]
                d = jax.vmap(nph.point_triangle_distance)(
                    Vcat[q], Vcat[tq[:, 0]], Vcat[tq[:, 1]], Vcat[tq[:, 2]])
                keep = d <= th_p[q] + th_t[t] + margin
                mcands["pt"], cnt = self._refine(q, t, act, keep,
                                                 self._cap("m_pt"))
                counts["m_pt"] = cnt
            if self._ee_stems():
                m, h = self._edge_balls(Vcat)
                (a, b, act), wcnt = self._ball_wide(
                    "w_ee", m, h + th_e, m, h + th_e,
                    self.ee_allowed_dense, margin + pad)
                counts["w_ee"] = wcnt
                edges = jnp.asarray(self.edges_all)
                ea, eb = edges[a], edges[b]
                ptol = self.model.edge_edge_cross_norm_sq_cutoff
                d = jax.vmap(lambda x0, x1, y0, y1: nph.edge_edge_distance(
                    x0, x1, y0, y1, parallel_tol=ptol))(
                    Vcat[ea[:, 0]], Vcat[ea[:, 1]],
                    Vcat[eb[:, 0]], Vcat[eb[:, 1]])
                keep = d <= th_e[a] + th_e[b] + margin
                mcands["ee"], cnt = self._refine(a, b, act, keep,
                                                 self._cap("m_ee"))
                counts["m_ee"] = cnt
        if self.model.global_params.intersection_test_enabled:
            icands, icounts = self._isect_stage1(Vs, Vr, slack=slack_b)
            counts.update(icounts)
        else:
            icands = {}
        return mcands, icands, counts

    def _broad_grid(self, Vs, Vr, th, slack_b, slack_p):
        """Grid-path mid lists for blocks too large for the dense matrix:
        per-stem spatial-hash stage 1 -> exact distances over the (Nq, K)
        candidate grid -> per-stem flat mid segments in GLOBAL primitive
        ids, concatenated per kind."""
        counts = {}
        sl_s1 = jnp.asarray(slack_b, self.dtype) + jnp.asarray(slack_p, self.dtype)
        mid = {"pt": [], "ee": []}
        for stem in self._blocks():
            K = self._cap("c_" + stem)
            mcap = self._cap("m_" + stem)
            if stem.startswith("pt"):
                P, pm, tri, tm, t0, t1, t2, c, r, th_p, th_t = self._pt_geom(
                    stem, Vs, Vr, th)
                tid, max_row, c1 = self._pt_stage1(
                    stem, P, c, r, th_p, th_t, sl_s1, tri, pm, tm, None, K)
                p_idx, t_idx, active, _d, dh, c2 = self._pt_stage2(
                    stem, P, t0, t1, t2, th_p, th_t, tid, sl_s1, mcap,
                    pfx="m_")
                # localize -> global ids
                q_g = p_idx + (0 if stem[3] == "d" else self.n_sv)
                t_g = t_idx + (0 if stem[4] == "d" else self.n_ts)
                mid["pt"].append((q_g, t_g, active))
            else:
                (ea, eam, eb, ebm, a0, a1, b0, b1, ma, ha, mb, hb,
                 th_a, th_b) = self._ee_geom(stem, Vs, Vr, th)
                tid, max_row, c1 = self._ee_stage1(
                    stem, ma, ha, mb, hb, th_a, th_b, sl_s1, ea, eb, eam,
                    ebm, None, K)
                a_idx, b_idx, active, _d, dh, c2 = self._ee_stage2(
                    stem, a0, a1, b0, b1, th_a, th_b, tid, sl_s1, mcap,
                    pfx="m_")
                # _ee_geom query side: er for ee_dr/ee_rr, es for ee_dd
                a_g = a_idx + (0 if stem == "ee_dd" else self.n_es)
                b_g = b_idx + (self.n_es if stem == "ee_rr" else 0)
                mid["ee"].append((a_g, b_g, active))
            counts.update(c1)
            counts.update(c2)
            counts["c_" + stem] = max_row
        mcands = {}
        for kind, segs in mid.items():
            if not segs:
                continue
            q = jnp.concatenate([s[0] for s in segs]) if len(segs) > 1 else segs[0][0]
            t = jnp.concatenate([s[1] for s in segs]) if len(segs) > 1 else segs[0][1]
            act = jnp.concatenate([s[2] for s in segs]) if len(segs) > 1 else segs[0][2]
            mcands[kind] = (q, t, act)
        return mcands, counts

    def pairs_fn(self, Vs, Vr, th, mcands, slack_p):
        """Pair-shell build from the frozen flat mid lists: exact distances
        over mid rows filtered to d <= dhat + slack_p, routed and compacted
        into the per-stem family pair tables the energies consume. Returns
        (contact_data, counts) with n_live_* live-pair metrics."""
        out = {}
        counts = {}
        sl = jnp.asarray(slack_p, self.dtype)
        Vcat = self._vcat(Vs, Vr)
        th_p_all = th[jnp.asarray(self.p_mesh_all)] if len(self.p_mesh_all) else th[:0]
        th_t_all = th[jnp.asarray(self.t_mesh_all)] if len(self.t_mesh_all) else th[:0]
        th_e_all = th[jnp.asarray(self.e_mesh_all)] if len(self.e_mesh_all) else th[:0]
        if "pt" in mcands and self._pt_stems():
            q, t, act = mcands["pt"]
            tris = jnp.asarray(self.tris_all)
            tq = tris[t]
            d = jax.vmap(nph.point_triangle_distance)(
                Vcat[q], Vcat[tq[:, 0]], Vcat[tq[:, 1]], Vcat[tq[:, 2]])
            dhat = th_p_all[q] + th_t_all[t]
            valid = act & (d <= dhat + sl)
            counts["n_live_pt"] = jnp.sum(
                (act & (d <= dhat)).astype(jnp.int32))
            routed = self._route_pt(q, t, valid, dhat)
            for stem, (p, tl, a2, dh, _d, cnt) in routed.items():
                out["contact_" + stem] = self._pt_family_data(stem, p, tl, a2, dh)
                counts[stem] = cnt
        if "ee" in mcands and self._ee_stems():
            a, b, act = mcands["ee"]
            edges = jnp.asarray(self.edges_all)
            ea, eb = edges[a], edges[b]
            ptol = self.model.edge_edge_cross_norm_sq_cutoff
            d = jax.vmap(lambda x0, x1, y0, y1: nph.edge_edge_distance(
                x0, x1, y0, y1, parallel_tol=ptol))(
                Vcat[ea[:, 0]], Vcat[ea[:, 1]], Vcat[eb[:, 0]], Vcat[eb[:, 1]])
            dhat = th_e_all[a] + th_e_all[b]
            valid = act & (d <= dhat + sl)
            counts["n_live_ee"] = jnp.sum(
                (act & (d <= dhat)).astype(jnp.int32))
            routed = self._route_ee(a, b, valid, dhat)
            for stem, (al, bl, a2, dh, _d, cnt) in routed.items():
                out["contact_" + stem] = self._ee_family_data(stem, al, bl, a2, dh)
                counts[stem] = cnt
        return out, counts

    def broad_count_keys(self):
        keys = []
        if self.dense_pt and self.dense_ee:
            if self._pt_stems():
                keys += ["w_pt", "m_pt"]
            if self._ee_stems():
                keys += ["w_ee", "m_ee"]
        else:
            for stem in self._blocks():
                keys += self._stage1_keys(stem)
                keys.append("m_" + stem)
        if self.model.global_params.intersection_test_enabled:
            keys += self.intersect_count_keys()
        return keys

    def pair_count_keys(self):
        keys = []
        for stem in self._blocks():
            keys.append(stem)
        if self._pt_stems():
            keys.append("n_live_pt")
        if self._ee_stems():
            keys.append("n_live_ee")
        return keys

    def friction_count_keys(self):
        """Count keys friction_tables emits (fused_friction path)."""
        keys = []
        if self.dense_pt and self.dense_ee:
            return ["f_" + stem for stem in self._blocks()]
        for stem in self._blocks():
            keys.append("f_" + stem)
            keys.append("cf_" + stem)
            if self._use_grid(*self._block_sizes(stem)):
                keys += ["g_" + stem + "_ins", "g_" + stem + "_occ"]
        return keys

    def friction_enabled_now(self) -> bool:
        """Friction tables are non-trivial: friction on AND some pair mu."""
        return (self.model.global_params.friction_enabled
                and self.model.stark.settings.simulation.init_frictional_contact
                and any(v != 0.0 for v in self.model.pair_mu.values()))

    def world_from_u(self, u, state, dt):
        """(Vs, Vr) world positions under trial DOFs u."""
        return self._world(self.glob_from_u(u, state, dt), dt)

    def max_rigid_lever(self) -> float:
        """Static bound on |r| of any rigid contact vertex: converts an
        angular-velocity step bound into a world displacement bound for the
        slack budget (fused.py [max] stage)."""
        if len(self.rv_body) == 0:
            return 0.0
        return float(np.max(np.linalg.norm(self.rv_loc, axis=1)))

    def glob_from_u(self, u, state, dt):
        """Engine glob with trial velocities taken from the DOF vector
        (for fused device-side solves)."""
        glob = {"dt": dt}
        ns = self.n_soft
        if len(self.sv_gid):
            glob["x0"] = state["x0"]
            glob["soft_v1"] = u[:ns]
        if len(self.rv_body):
            glob["rb_t0"] = state["rb_t0"]
            glob["rb_q0"] = state["rb_q0"]
            rw = u[ns:].reshape(-1, 2, 3)
            glob["rb_v1"] = rw[:, 0]
            glob["rb_w1"] = rw[:, 1]
        return glob

    def engine_state(self):
        """Per-solve-constant state arrays (positions/orientations at step
        start). Host pushes these once per solve."""
        m = self.model
        d = self.dtype
        state = {}
        if len(self.sv_gid):
            state["x0"] = m.dyn.x0
        if len(self.rv_body):
            state["rb_t0"] = jnp.asarray(m.rb_dyn.t0, d)
            state["rb_q0"] = jnp.asarray(m.rb_dyn.q0, d)
        return state

    @staticmethod
    def _stack_counts(counts):
        """Single small int array so the host pulls ONE transfer."""
        keys = sorted(counts.keys())
        return keys, jnp.stack([counts[k] for k in keys])

    def _check_overflow(self, keys, counts_arr) -> bool:
        counts_np = np.asarray(counts_arr)
        overflow = False
        self._last_overflow = []
        near_full = []
        for k, c in zip(keys, counts_np):
            if k.startswith("n_live_"):  # metric, not a capacity
                continue
            c = int(c)
            if c > self._caps[k]:
                self._caps[k] = max(2 * self._caps[k], int(1.5 * c))
                overflow = True
                self._last_overflow.append((k, c))
            elif 4 * c > 3 * self._caps[k]:
                near_full.append((k, c))
        if overflow:
            # a retrace is already being paid: proactively bump every cap
            # at >=75% occupancy too, collapsing the serial one-key-per-
            # retrace discovery chain (each retrace costs a ~100 s remote
            # TPU compile) into a single rebuild
            for k, c in near_full:
                self._caps[k] *= 2
                self._last_overflow.append((k, c))
            caps_cache.store(self._cap_sig,
                             {k: self._caps[k] for k, _ in self._last_overflow})
        return overflow

    def refresh_contacts(self, dt):
        glob = self._engine_glob(dt)
        th = self._th_vec()
        key = "contacts"
        if key not in self._jits:
            self._jits[key] = jax.jit(self._contacts_fn)
        while True:
            data, counts = self._jits[key](glob, th)
            keys, arr = self._stack_counts(counts)
            if not self._check_overflow(keys, arr):
                break
            self._jits.pop(key)
            self._jits[key] = jax.jit(self._contacts_fn)
        self._contact_data = data

    # ------------------------------------------------------------------
    # friction refresh (once per step, dt=0 geometry)
    # ------------------------------------------------------------------
    def _friction_fn(self, glob, th, mu_mat, k):
        zero_dt = jnp.asarray(0.0, self.dtype)
        Vs, Vr = self._world(glob, zero_dt)
        return self.friction_tables(Vs, Vr, th, mu_mat, k)

    def friction_tables(self, Vs, Vr, th, mu_mat, k):
        """Lagged-friction pair tables from dt=0 world positions: per-pair
        mu, normal force fn (from the barrier force at the frozen distance),
        tangent basis T, and barycentric anchors
        (EnergyFrictionalContact.cpp:531-773). Traced; callable from the
        fused program (fused_friction) or the host refresh path."""
        btype = self.model.ipc_barrier_type
        out = {}
        counts = {}
        per_stem = {}
        if self.dense_pt and self.dense_ee:
            # combined dense path: one exact distance matrix per kind with
            # the mu-pair allowance lifted on the MXU (_lift_mesh_pair),
            # routed straight into the f_ pair tables at d <= dhat
            Vcat = self._vcat(Vs, Vr)
            if self._pt_stems():
                d, dhat = self._pt_dense_d(Vcat, th)
                mu_ok = self._lift_mesh_pair(
                    mu_mat, self.p_mesh_all, self.t_mesh_all) != 0.0
                valid = (jnp.asarray(self.pt_allowed_dense) & mu_ok
                         & (d <= dhat)).reshape(-1)
                Nt = d.shape[1]
                idx = jnp.arange(valid.shape[0], dtype=jnp.int32)
                routed = self._route_pt(idx // Nt, idx % Nt, valid,
                                        dhat.reshape(-1), cap_pfx="f_",
                                        d_rows=d.reshape(-1))
                for stem, (p, tl, act, dh, ds, cnt) in routed.items():
                    per_stem[stem] = (p, tl, act, ds, dh)
                    counts["f_" + stem] = cnt
            if self._ee_stems():
                d, dhat = self._ee_dense_d(Vcat, th)
                mu_ok = self._lift_mesh_pair(
                    mu_mat, self.e_mesh_all, self.e_mesh_all) != 0.0
                valid = (jnp.asarray(self.ee_allowed_dense) & mu_ok
                         & (d <= dhat)).reshape(-1)
                Ne = d.shape[1]
                idx = jnp.arange(valid.shape[0], dtype=jnp.int32)
                routed = self._route_ee(idx // Ne, idx % Ne, valid,
                                        dhat.reshape(-1), cap_pfx="f_",
                                        d_rows=d.reshape(-1))
                for stem, (al, bl, act, dh, ds, cnt) in routed.items():
                    per_stem[stem] = (al, bl, act, ds, dh)
                    counts["f_" + stem] = cnt
        else:
            for stem in self._blocks():
                if stem.startswith("pt"):
                    p_idx, t_idx, active, d, cnts, dh = self._pt_pairs(
                        stem, Vs, Vr, th, extra_mat=mu_mat)
                else:
                    p_idx, t_idx, active, d, cnts, dh = self._ee_pairs(
                        stem, Vs, Vr, th, extra_mat=mu_mat)
                per_stem[stem] = (p_idx, t_idx, active, d, dh)
                counts.update(cnts)
        for stem, (p_idx, t_idx, active, d, dh) in per_stem.items():
            if stem.startswith("pt"):
                fd = self._pt_family_data(stem, p_idx, t_idx, active, dh)
                P = (Vs if stem in ("pt_dd", "pt_dr") else Vr)[p_idx]
                T3 = Vs if stem in ("pt_dd", "pt_rd") else Vr
                tri = jnp.asarray(self.ts if stem in ("pt_dd", "pt_rd") else self.tr,
                                  jnp.int32)[t_idx]
                t0, t1, t2 = T3[tri[:, 0]], T3[tri[:, 1]], T3[tri[:, 2]]
                region = jax.vmap(nph.point_triangle_region)(P, t0, t1, t2)
                fd["rows"]["bary"] = jax.vmap(nph.point_triangle_bary)(P, t0, t1, t2, region)
                fd["rows"]["T"] = jax.vmap(nph.point_triangle_T)(P, t0, t1, t2, region)
                pm = jnp.asarray(
                    self.sv_mesh if stem in ("pt_dd", "pt_dr") else self.rv_mesh,
                    jnp.int32)[p_idx]
                tm = jnp.asarray(self.ts_mesh if stem in ("pt_dd", "pt_rd") else self.tr_mesh,
                                 jnp.int32)[t_idx]
                fd["rows"]["mu"] = mu_mat[pm, tm]
                fd["rows"]["fn"] = barrier_force_wrap(d, dh, k, btype)
                out["friction_" + stem] = fd
            else:
                a_idx, b_idx = p_idx, t_idx
                fd = self._ee_family_data(stem, a_idx, b_idx, active, dh)
                EA = Vs if stem == "ee_dd" else Vr
                EB = Vs if stem in ("ee_dd", "ee_dr") else Vr
                ea = jnp.asarray(self.es if stem == "ee_dd" else self.er, jnp.int32)[a_idx]
                eb = jnp.asarray(self.es if stem in ("ee_dd", "ee_dr") else self.er,
                                 jnp.int32)[b_idx]
                a0, a1 = EA[ea[:, 0]], EA[ea[:, 1]]
                b0, b1 = EB[eb[:, 0]], EB[eb[:, 1]]
                ptol = self.model.edge_edge_cross_norm_sq_cutoff
                region = jax.vmap(nph.edge_edge_region, in_axes=(0, 0, 0, 0, None))(
                    a0, a1, b0, b1, ptol)
                s, t = jax.vmap(nph.edge_edge_params)(a0, a1, b0, b1, region)
                fd["rows"]["s"] = s
                fd["rows"]["t"] = t
                fd["rows"]["T"] = jax.vmap(nph.edge_edge_T)(a0, a1, b0, b1, region)
                am = jnp.asarray(self.es_mesh if stem == "ee_dd" else self.er_mesh,
                                 jnp.int32)[a_idx]
                bm = jnp.asarray(self.es_mesh if stem in ("ee_dd", "ee_dr") else self.er_mesh,
                                 jnp.int32)[b_idx]
                fd["rows"]["mu"] = mu_mat[am, bm]
                fd["rows"]["fn"] = barrier_force_wrap(d, dh, k, btype)
                out["friction_" + stem] = fd
        return out, counts

    def refresh_friction(self, dt):
        # host-side early out: a device round trip here would cost ~25 ms
        # EVERY step on the remote-relay TPU path
        if not any(v != 0.0 for v in self.model.pair_mu.values()):
            self._friction_data = {}
            return
        glob = self._engine_glob(dt)
        th = self._th_vec()
        mu_mat = self._mu_mat()
        k = jnp.asarray(self.model.contact_stiffness, self.dtype)
        key = "friction"
        if key not in self._jits:
            self._jits[key] = jax.jit(self._friction_fn)
        while True:
            data, counts = self._jits[key](glob, th, mu_mat, k)
            keys, arr = self._stack_counts(counts)
            if not self._check_overflow(keys, arr):
                break
            self._jits.pop(key)
            self._jits[key] = jax.jit(self._friction_fn)
        self._friction_data = data

    # ------------------------------------------------------------------
    # intersection oracle
    # ------------------------------------------------------------------
    def _i_blocks(self):
        """Active intersection candidate blocks with their (query, target)
        sizes — (cap key, n_edges, n_tris)."""
        blocks = []
        if len(self.es) and len(self.ts):
            blocks.append(("i_ss", len(self.es), len(self.ts)))
        if len(self.es) and len(self.tr):
            blocks.append(("i_sr", len(self.es), len(self.tr)))
        if len(self.er) and len(self.ts):
            blocks.append(("i_rs", len(self.er), len(self.ts)))
        if len(self.er) and len(self.tr):
            blocks.append(("i_rr", len(self.er), len(self.tr)))
        return blocks

    def intersect_count_keys(self):
        """Exactly the count keys _isect_stage1 emits."""
        if self.dense_et:
            return ["w_et", "im_et"] \
                if (len(self.edges_all) and len(self.tris_all)) else []
        keys = []
        for k, nq, nt in self._i_blocks():
            keys.append(k)
            keys.append("im_" + k)
            if self._use_grid(nq, nt):
                keys += ["g_" + k + "_ins", "g_" + k + "_occ"]
        return keys

    def contact_count_keys(self):
        """Exactly the count keys _contacts_fn emits."""
        if self.dense_pt and self.dense_ee:
            return [stem for stem in self._blocks()]
        keys = []
        for stem in self._blocks():
            keys.append(stem)
            keys += self._stage1_keys(stem)
        return keys

    def _isect_stage1(self, Vs, Vr, slack=None):
        """Intersection candidate generation: a flat mid list
        {"et": (e_idx, t_idx, act, overflow)} of edge-triangle pairs whose
        conservative exact lower bound d(seg,tri) >= d(mid,tri) - h_e is
        within `slack` (traced scalar) — a superset of every pair that can
        intersect while total motion stays within the broad budget
        (2*0.45*slack < slack). Cap overflow reports conservatively
        (overflow flag -> hit) AND surfaces the count for a bump."""
        sl = jnp.asarray(0.0 if slack is None else slack, self.dtype)
        counts = {}
        if self.dense_et:
            if len(self.edges_all) == 0 or len(self.tris_all) == 0:
                return {}, counts
            Vcat = self._vcat(Vs, Vr)
            # stage A ball bound d(seg,tri) >= |m-c| - h - r, stage B exact
            # lower bound d(mid,tri) - h over the wide rows only
            m, h = self._edge_balls(Vcat)
            c, r = self._tri_balls(Vcat)
            (e, t, act), wcnt = self._ball_wide(
                "w_et", m, h, c, r, self.et_allowed_dense,
                sl + self._bound_pad(Vcat))
            counts["w_et"] = wcnt
            tq = jnp.asarray(self.tris_all)[t]
            d_mid = jax.vmap(nph.point_triangle_distance)(
                m[e], Vcat[tq[:, 0]], Vcat[tq[:, 1]], Vcat[tq[:, 2]])
            keep = d_mid - h[e] <= sl
            cap = self._cap("im_et")
            (e, t, act), cnt = self._refine(e, t, act, keep, cap)
            counts["im_et"] = cnt
            return {"et": (e, t, act, (cnt > cap) | (wcnt > self._cap("w_et")))}, counts
        # grid path: per-block stage 1 -> exact lower bound over the
        # (Ne, K) candidate grid -> flat per-block mid segments in global
        # primitive ids, concatenated
        segs = []
        overflow = jnp.zeros((), bool)
        for ikey, E, edges, T, tris, excl_fn, excl_dense in self._i_geoms(Vs, Vr):
            p0, p1 = E[edges[:, 0]], E[edges[:, 1]]
            t0, t1, t2 = T[tris[:, 0]], T[tris[:, 1]], T[tris[:, 2]]
            c = (t0 + t1 + t2) / 3.0
            r = jnp.sqrt(jnp.maximum(jnp.maximum(
                jnp.sum((t0 - c) ** 2, -1), jnp.sum((t1 - c) ** 2, -1)),
                jnp.sum((t2 - c) ** 2, -1)))
            m = 0.5 * (p0 + p1)
            h = 0.5 * jnp.linalg.norm(p1 - p0, axis=-1)
            K = self._cap(ikey)
            nt = tris.shape[0]
            if self._use_grid(edges.shape[0], nt):
                tid, max_row, gc = self._grid_stage1(
                    "g_" + ikey, m, h + sl, c, r, excl_fn, K)
                counts.update(gc)
            else:
                dm2 = jnp.sum((m[:, None, :] - c[None, :, :]) ** 2, -1)
                pre = jnp.asarray(~excl_dense) & (
                    dm2 <= (h[:, None] + sl + r[None, :]) ** 2)
                tids = jnp.broadcast_to(
                    jnp.arange(nt, dtype=jnp.int32)[None, :], pre.shape)
                tid, max_row = self._rowk_topk(pre, tids, K, nt)
            counts[ikey] = max_row
            overflow |= max_row > K
            # exact lower bound over the fat grid, compact to a flat segment
            Ne = tid.shape[0]
            tc = jnp.clip(tid, 0, max(nt - 1, 0))
            fat = jnp.concatenate([t0, t1, t2], axis=-1)
            Tk = fat[tc].reshape(Ne * K, 9)
            mk = jnp.broadcast_to(m[:, None, :], (Ne, K, 3)).reshape(-1, 3)
            d_mid = jax.vmap(nph.point_triangle_distance)(
                mk, Tk[:, 0:3], Tk[:, 3:6], Tk[:, 6:9])
            hk = jnp.broadcast_to(h[:, None], (Ne, K)).reshape(-1)
            ok = (tid < nt).reshape(-1) & (d_mid - hk <= sl)
            mcap = self._cap("im_" + ikey)
            sel, cnt = compact_indices(ok, mcap)
            counts["im_" + ikey] = cnt
            overflow |= cnt > mcap
            act = jnp.arange(mcap) < jnp.minimum(cnt, mcap)
            e_loc = (sel // K).astype(jnp.int32)
            t_loc = tc.reshape(-1)[sel]
            # localize -> global ids (i_geoms order: ss, sr, rs, rr)
            e_g = e_loc + (0 if ikey[2] == "s" else self.n_es)
            t_g = t_loc + (0 if ikey[3] == "s" else self.n_ts)
            segs.append((e_g, t_g, act))
        if not segs:
            return {}, counts
        e = jnp.concatenate([s[0] for s in segs]) if len(segs) > 1 else segs[0][0]
        t = jnp.concatenate([s[1] for s in segs]) if len(segs) > 1 else segs[0][1]
        act = jnp.concatenate([s[2] for s in segs]) if len(segs) > 1 else segs[0][2]
        return {"et": (e, t, act, overflow)}, counts

    def _isect_exact(self, Vs, Vr, cands):
        """Exact segment-triangle tests over the frozen flat mid list: the
        cheap per-trial half of the oracle (no grids, no compaction).
        Candidate overflow reports hit=True (conservative: forces step
        halving until the host bumps the cap and re-traces)."""
        if "et" not in cands:
            return jnp.zeros((), bool)
        e, t, act, overflowed = cands["et"]
        if e.shape[0] == 0:
            return jnp.asarray(overflowed, bool)
        Vcat = self._vcat(Vs, Vr)
        edges = jnp.asarray(self.edges_all)
        tris = jnp.asarray(self.tris_all)
        ee = edges[e]
        tt = tris[t]
        isect = jax.vmap(nph.segment_triangle_intersects)(
            Vcat[ee[:, 0]], Vcat[ee[:, 1]],
            Vcat[tt[:, 0]], Vcat[tt[:, 1]], Vcat[tt[:, 2]])
        return jnp.any(isect & act) | overflowed

    def _intersect_fn(self, glob):
        """Returns (hit, counts) where counts maps each i_ block to its true
        candidate count. Candidate overflow reports hit=True (conservative)
        AND surfaces the count so the host can bump the cap and re-trace —
        without the count an overflowed cap would report 'intersecting'
        forever and deadlock the retry ladder."""
        Vs, Vr = self._world(glob, glob["dt"])
        cands, counts = self._isect_stage1(Vs, Vr)
        hit = self._isect_exact(Vs, Vr, cands)
        return hit, counts

    def _i_geoms(self, Vs, Vr):
        """Per-block intersection geometry descriptors:
        (ikey, E, edges, T, tris, excl_fn, excl_dense)."""

        def et_excl_fn(edges, tris, emesh, tmesh, same_mesh_np=None,
                       share=True):
            """Functional edge-triangle exclusion for the grid path: shared
            vertex (global ids coincide only within a mesh), optional
            same-mesh drop (rigid-rigid), and disable_collision pairs (the
            reference blacklists them in the intersection detector too,
            EnergyFrictionalContact.cpp:114-117)."""
            e = jnp.asarray(edges, jnp.int32)
            t = jnp.asarray(tris, jnp.int32)
            emesh_a = jnp.asarray(emesh, jnp.int32)
            tmesh_a = jnp.asarray(tmesh, jnp.int32)
            enab = jnp.asarray(self.enabled_mat)
            if same_mesh_np is not None:
                em = jnp.asarray(same_mesh_np[0])
                tm = jnp.asarray(same_mesh_np[1])
            else:
                em = tm = None

            def f(ce, ct):
                ok = enab[emesh_a[ce], tmesh_a[ct]]
                if share:
                    sh = jnp.zeros(ce.shape, bool)
                    for i in range(2):
                        for k in range(3):
                            sh = sh | (e[ce, i] == t[ct, k])
                    ok = ok & jnp.logical_not(sh)
                if em is not None:
                    ok = ok & (em[ce] != tm[ct])
                return ok

            return f

        def excl_or_disabled(excl, emesh, tmesh):
            dis = ~self.enabled_mat[np.ix_(np.asarray(emesh, int),
                                           np.asarray(tmesh, int))]
            return dis if excl is None else (excl | dis)

        # soft edges vs soft tris / rigid tris; rigid edges vs soft tris / rigid tris
        geoms = []
        if len(self.es) and len(self.ts):
            geoms.append(("i_ss", Vs, jnp.asarray(self.es), Vs, jnp.asarray(self.ts),
                          et_excl_fn(self.es, self.ts, self.es_mesh, self.ts_mesh),
                          excl_or_disabled(self.et_ss_excl,
                                           self.es_mesh, self.ts_mesh)))
        if len(self.es) and len(self.tr):
            geoms.append(("i_sr", Vs, jnp.asarray(self.es), Vr, jnp.asarray(self.tr),
                          et_excl_fn(self.es, self.tr, self.es_mesh,
                                     self.tr_mesh, share=False),
                          excl_or_disabled(None, self.es_mesh, self.tr_mesh)))
        if len(self.er) and len(self.ts):
            geoms.append(("i_rs", Vr, jnp.asarray(self.er), Vs, jnp.asarray(self.ts),
                          et_excl_fn(self.er, self.ts, self.er_mesh,
                                     self.ts_mesh, share=False),
                          excl_or_disabled(None, self.er_mesh, self.ts_mesh)))
        if len(self.er) and len(self.tr):
            # same-mesh rigid self-intersection cannot change; exclude same mesh
            excl = (self.et_rr_excl | (self.er_mesh[:, None] == self.tr_mesh[None, :])
                    if self.et_rr_excl is not None else None)
            geoms.append(("i_rr", Vr, jnp.asarray(self.er), Vr, jnp.asarray(self.tr),
                          et_excl_fn(self.er, self.tr, self.er_mesh,
                                     self.tr_mesh,
                                     same_mesh_np=(self.er_mesh, self.tr_mesh)),
                          excl_or_disabled(excl, self.er_mesh, self.tr_mesh)))
        return geoms

    def has_intersection(self, dt) -> bool:
        glob = self._engine_glob(dt)
        key = "intersect"
        if key not in self._jits:
            self._jits[key] = jax.jit(self._intersect_fn)
        while True:
            hit, counts = self._jits[key](glob)
            if not counts:
                break
            keys, arr = self._stack_counts(counts)
            if not self._check_overflow(keys, arr):
                break
            self._jits.pop(key)
            self._jits[key] = jax.jit(self._intersect_fn)
        return bool(hit)

    # ------------------------------------------------------------------
    def current_family_data(self):
        data = dict(self._contact_data)
        if self.model.global_params.friction_enabled:
            data.update(self._friction_data)
        return data

    def glob_entries(self):
        return {
            "contact_k": jnp.asarray(self.model.contact_stiffness, self.dtype),
            "friction_epsv": jnp.asarray(
                self.model.global_params.friction_stick_slide_threshold, self.dtype),
            # per-mesh-pair Coulomb mu as a glob ARGUMENT (not a traced
            # constant) so set_friction takes effect without a re-trace;
            # consumed by the in-program friction tables (fused_friction)
            "mu_mat": self._mu_mat(),
        }


def barrier_force_wrap(d, dhat, k, barrier_type):
    from .contact_energies import barrier_force

    return barrier_force(d, dhat, k, barrier_type)
