"""Host-side point -> triangle-mesh distance queries with nearest-entity
classification.

Reference: /root/reference/stark/extern/TriangleMeshDistance (tmd::
TriangleMeshDistance — static BVH signed distance with nearest-entity
classification), consumed by EnergyAttachments::add_by_distance
(EnergyAttachments.cpp:229-341) to build barycentric gluing anchors.
Scene-building runs on host once, so a vectorized numpy brute force replaces
the BVH (O(points * triangles), fine at authoring scale).
"""
from __future__ import annotations

import numpy as np


def closest_point_on_triangles(points, vertices, triangles):
    """For each point: (distance, tri_idx, bary (3,)) of the closest point on
    the mesh, with barycentrics clamped to the triangle (Ericson)."""
    P = np.asarray(points, dtype=np.float64).reshape(-1, 3)
    V = np.asarray(vertices, dtype=np.float64)
    T = np.asarray(triangles, dtype=np.int64).reshape(-1, 3)
    a, b, c = V[T[:, 0]], V[T[:, 1]], V[T[:, 2]]

    ab = b - a
    ac = c - a
    n_pts = len(P)
    best_d = np.full(n_pts, np.inf)
    best_t = np.zeros(n_pts, dtype=np.int64)
    best_bary = np.zeros((n_pts, 3))

    for i, p in enumerate(P):
        ap = p - a
        d1 = np.einsum("ij,ij->i", ab, ap)
        d2 = np.einsum("ij,ij->i", ac, ap)
        bp = p - b
        d3 = np.einsum("ij,ij->i", ab, bp)
        d4 = np.einsum("ij,ij->i", ac, bp)
        cp = p - c
        d5 = np.einsum("ij,ij->i", ab, cp)
        d6 = np.einsum("ij,ij->i", ac, cp)

        va = d3 * d6 - d5 * d4
        vb = d5 * d2 - d1 * d6
        vc = d1 * d4 - d3 * d2

        denom_vw = np.where(np.abs(vb + vc) < 1e-300, 1.0, vb + vc)
        denom_uv = np.where(np.abs(va + vb) < 1e-300, 1.0, va + vb)

        # region masks (Ericson 5.1.5)
        u = np.zeros(len(T))
        v = np.zeros(len(T))
        w = np.zeros(len(T))
        # vertex regions
        m_a = (d1 <= 0) & (d2 <= 0)
        m_b = (d3 >= 0) & (d4 <= d3)
        m_c = (d6 >= 0) & (d5 <= d6)
        # edge AB
        m_ab = (~m_a) & (~m_b) & (vc <= 0) & (d1 >= 0) & (d3 <= 0)
        # edge AC
        m_ac = (~m_a) & (~m_c) & (vb <= 0) & (d2 >= 0) & (d6 <= 0)
        # edge BC
        m_bc = (~m_b) & (~m_c) & (va <= 0) & ((d4 - d3) >= 0) & ((d5 - d6) >= 0)
        m_face = ~(m_a | m_b | m_c | m_ab | m_ac | m_bc)

        t_ab = np.where(np.abs(d1 - d3) < 1e-300, 0.0, d1 / np.where(np.abs(d1 - d3) < 1e-300, 1.0, d1 - d3))
        t_ac = np.where(np.abs(d2 - d6) < 1e-300, 0.0, d2 / np.where(np.abs(d2 - d6) < 1e-300, 1.0, d2 - d6))
        denom_bc = (d4 - d3) + (d5 - d6)
        t_bc = np.where(np.abs(denom_bc) < 1e-300, 0.0, (d4 - d3) / np.where(np.abs(denom_bc) < 1e-300, 1.0, denom_bc))
        denom_f = va + vb + vc
        denom_f = np.where(np.abs(denom_f) < 1e-300, 1.0, denom_f)
        fv = vb / denom_f
        fw = vc / denom_f

        u = np.select([m_a, m_b, m_c, m_ab, m_ac, m_bc, m_face],
                      [1.0, 0.0, 0.0, 1.0 - t_ab, 1.0 - t_ac, 0.0, 1.0 - fv - fw])
        v = np.select([m_a, m_b, m_c, m_ab, m_ac, m_bc, m_face],
                      [0.0, 1.0, 0.0, t_ab, 0.0, 1.0 - t_bc, fv])
        w = np.select([m_a, m_b, m_c, m_ab, m_ac, m_bc, m_face],
                      [0.0, 0.0, 1.0, 0.0, t_ac, t_bc, fw])

        q = u[:, None] * a + v[:, None] * b + w[:, None] * c
        d = np.linalg.norm(q - p, axis=1)
        j = int(np.argmin(d))
        best_d[i] = d[j]
        best_t[i] = j
        best_bary[i] = (u[j], v[j], w[j])

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
