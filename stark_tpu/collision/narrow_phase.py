"""Branchless IPC narrow-phase: distance types, distances, friction geometry.

Reference: /root/reference/stark/extern/TriangleMeshCollisionDetection/src/
ipc_toolkit_geometry_functions.cpp (point_triangle_distance_type :253-282,
edge_edge_distance_type :80-170 incl. parallel handling :171-201) and
/root/reference/stark/src/models/distances.cpp (the same primitive distance
formulas re-expressed differentiably — the reference's "symbolic distances"
duality, models/distances.h) plus friction_geometry.cpp (barycentrics and
2x3 tangent projection matrices).

Everything here is a scalar-element JAX function intended for vmap: the
classification produces an integer region code (non-differentiable select);
the distance then selects the matching smooth primitive, so gradients flow
only through the selected formula exactly as the reference's per-type
potentials do.

PT region codes: 0,1,2 = closest vertex t0/t1/t2; 3,4,5 = edges (t0t1),
(t1t2), (t2t0); 6 = face.
EE region codes (match the reference bit layout, ipc:190-201):
0 EA0_EB0, 1 EA0_EB1, 2 EA1_EB0, 3 EA1_EB1, 4 EA_EB0, 5 EA_EB1,
6 EA0_EB, 7 EA1_EB, 8 EA_EB.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import maths

# Positive floor for denominator guards. Must be representable in BOTH f64
# and f32: the previous 1e-300 silently underflows to 0.0 under float32,
# turning every guard below into a no-op (observed failure: exactly-parallel
# cloth edges slipped past the guards and produced garbage line-line
# distances -> spurious barrier pairs with ~1e4 gradients).
_TINY = 1e-35


def _parallel_tol(dtype) -> float:
    """Relative (dimensionless) cross-norm^2 cutoff below which two edges are
    treated as parallel: cross_sq < tol * |u|^2 * |v|^2, i.e. sin^2(angle) <
    tol. The IPC toolkit uses an equivalent relative test; an ABSOLUTE cutoff
    cannot work across precisions because f32 rounding noise on the cross
    product of parallel unit edges is ~1e-14 relative while f64 noise is
    ~1e-30.

    The f32 cutoff must ALSO cover the classifier's own conditioning: the
    non-parallel path branches on D = |u|^2|v|^2 - (u.v)^2 = |u|^2|v|^2 sin^2,
    which for nearly-collinear edges is pure cancellation noise (~eps32
    relative, 1e-7). With sin^2 below ~1e-4 the region selection is garbage
    and can pick the interior line-line formula with a catastrophic distance
    (observed: a spurious cloth-cloth "contact" between edges 0.14 m apart,
    with ~1e4-magnitude gradients). Treating sin(angle) < 1e-2 as parallel
    costs at most ~angle*|edge| of distance error on genuinely-near pairs
    while keeping every selected formula three decades above the f32 noise
    floor."""
    return 1e-4 if jnp.finfo(dtype).bits == 32 else 1e-20

# NaN-safety: every candidate below is evaluated for every pair regardless of
# the selected region, and reverse-mode runs their VJPs with zero cotangents.
# A zero cotangent does NOT neutralize inf intermediates (0*inf = NaN), so
# each division uses the double-where pattern: replace a degenerate
# denominator by 1.0 and the result by a finite fallback. Degenerate inputs
# (parallel edges for line-line, zero-length edges on padded rows) are never
# selected by the classifier, so the fallback value itself is irrelevant.


def _guarded_div(num, den, floor):
    ok = den > floor
    return jnp.where(ok, num / jnp.where(ok, den, 1.0), 0.0)


def _select(cands, region, n):
    """Region-select via one-hot masked sum instead of `cands[region]`.

    A dynamic-index gather's reverse-mode VJP is a scatter; under
    vmap+jax.hessian that became thousands of batched (E, n) scatters —
    measured 26x slower on TPU than this formulation (bit-identical
    results). The one-hot mask is built from the non-differentiated int
    region code, so autodiff flows only through the multiply."""
    oh = jax.nn.one_hot(region, n, dtype=cands.dtype)
    oh = oh.reshape(oh.shape + (1,) * (cands.ndim - 1))
    return jnp.sum(cands * oh, axis=0)


def _sq_point_point(p, q):
    d = p - q
    return jnp.dot(d, d)


def _sq_point_line(p, a, b):
    ab = b - a
    ap = p - a
    e = jnp.dot(ap, ab)
    return jnp.dot(ap, ap) - _guarded_div(e * e, jnp.dot(ab, ab), _TINY)


def _sq_point_plane(p, a, b, c):
    n = jnp.cross(a - c, b - c)
    d = jnp.dot(p - a, n)
    return _guarded_div(d * d, jnp.dot(n, n), _TINY)


def _sq_line_line(a, b, p, q):
    # parallel edges (|n|^2 below the classifier's RELATIVE cutoff) are routed
    # to the point-line regions, so the guarded fallback is never the selected
    # value; the guard floor is likewise relative to the edge scales
    u = b - a
    v = q - p
    n = jnp.cross(u, v)
    l = jnp.dot(p - a, n)
    floor = _parallel_tol(a.dtype) * jnp.dot(u, u) * jnp.dot(v, v)
    return _guarded_div(l * l, jnp.dot(n, n), jnp.maximum(floor, _TINY))


# ---------------------------------------------------------------------------
# Point - Triangle
# ---------------------------------------------------------------------------

def _edge_param(p, e0, e1, n):
    """(s, o): s = param along edge, o = signed offset along edge x normal
    (ipc point_triangle_unrolled_edge_parametrization :203-249; only the sign
    of param[1] is used by the classifier, so the positive denominator is
    dropped)."""
    e = e1 - e0
    s = jnp.dot(p - e0, e) / jnp.maximum(jnp.dot(e, e), _TINY)
    o = jnp.dot(p - e0, jnp.cross(e, n))
    return s, o


def point_triangle_region(p, t0, t1, t2):
    n = jnp.cross(t1 - t0, t2 - t0)
    s0, o0 = _edge_param(p, t0, t1, n)
    s1, o1 = _edge_param(p, t1, t2, n)
    s2, o2 = _edge_param(p, t2, t0, n)
    conds = [
        (s0 > 0.0) & (s0 < 1.0) & (o0 >= 0.0),   # P_E0 -> 3
        (s1 > 0.0) & (s1 < 1.0) & (o1 >= 0.0),   # P_E1 -> 4
        (s2 > 0.0) & (s2 < 1.0) & (o2 >= 0.0),   # P_E2 -> 5
        (s0 <= 0.0) & (s2 >= 1.0),               # P_T0 -> 0
        (s1 <= 0.0) & (s0 >= 1.0),               # P_T1 -> 1
        (s2 <= 0.0) & (s1 >= 1.0),               # P_T2 -> 2
    ]
    codes = jnp.asarray([3, 4, 5, 0, 1, 2], dtype=jnp.int32)
    return jnp.select(conds, list(codes), jnp.asarray(6, jnp.int32))


def point_triangle_sq_distance(p, t0, t1, t2, region=None):
    if region is None:
        region = point_triangle_region(p, t0, t1, t2)
    cands = jnp.stack([
        _sq_point_point(p, t0),
        _sq_point_point(p, t1),
        _sq_point_point(p, t2),
        _sq_point_line(p, t0, t1),
        _sq_point_line(p, t1, t2),
        _sq_point_line(p, t2, t0),
        _sq_point_plane(p, t0, t1, t2),
    ])
    return _select(cands, region, 7)


def point_triangle_distance(p, t0, t1, t2, region=None):
    return maths.safe_sqrt(point_triangle_sq_distance(p, t0, t1, t2, region), _TINY)


def _bary_point_edge(p, a, b):
    ab = b - a
    alpha = jnp.dot(p - a, ab) / jnp.maximum(jnp.dot(ab, ab), _TINY)
    return 1.0 - alpha, alpha


def point_triangle_bary(p, t0, t1, t2, region):
    """3-barycentric weights of the closest point for the given region
    (friction anchors; friction_geometry.cpp barycentric_*)."""
    u0, v0 = _bary_point_edge(p, t0, t1)
    u1, v1 = _bary_point_edge(p, t1, t2)
    u2, v2 = _bary_point_edge(p, t2, t0)
    # full (Ericson) barycentric for the face region
    e0 = t1 - t0
    e1 = t2 - t0
    e2 = p - t0
    d00 = jnp.dot(e0, e0)
    d01 = jnp.dot(e0, e1)
    d11 = jnp.dot(e1, e1)
    d20 = jnp.dot(e2, e0)
    d21 = jnp.dot(e2, e1)
    denom = jnp.maximum(d00 * d11 - d01 * d01, _TINY)
    fv = (d11 * d20 - d01 * d21) / denom
    fw = (d00 * d21 - d01 * d20) / denom
    fu = 1.0 - fv - fw
    one = jnp.ones((), p.dtype)
    zz = jnp.zeros((), p.dtype)
    cands = jnp.stack([
        jnp.stack([one, zz, zz]),
        jnp.stack([zz, one, zz]),
        jnp.stack([zz, zz, one]),
        jnp.stack([u0, v0, jnp.zeros(())]),
        jnp.stack([jnp.zeros(()), u1, v1]),
        jnp.stack([v2, jnp.zeros(()), u2]),
        jnp.stack([fu, fv, fw]),
    ])
    return _select(cands, region, 7)


def _proj_point_point(p, q):
    # friction_geometry.cpp projection_matrix_point_point
    n = maths.normalized(p - q)
    e = jnp.where(n[2] < 0.99,
                  jnp.array([0.0, 0.0, 1.0], dtype=n.dtype),
                  jnp.array([1.0, 0.0, 0.0], dtype=n.dtype))
    u = maths.normalized(jnp.cross(e, n))
    v = maths.normalized(jnp.cross(u, n))
    return jnp.stack([u, v])


def _proj_point_edge(p, a, b):
    u = maths.normalized(b - a)
    v = maths.normalized(jnp.cross(u, p - a))
    return jnp.stack([u, v])


def _proj_triangle(a, b, c):
    v01 = a - c
    v02 = b - c
    u = maths.normalized(v01)
    normal = jnp.cross(v01, v02)
    v = maths.normalized(jnp.cross(normal, u))
    return jnp.stack([u, v])


def _proj_edge_edge(a, b, p, q):
    u = maths.normalized(b - a)
    n = jnp.cross(u, q - p)
    v = maths.normalized(jnp.cross(u, n))
    return jnp.stack([u, v])


def point_triangle_T(p, t0, t1, t2, region):
    """2x3 tangent projection for friction, per region (the reference routes
    pp/pe/pt to projection_matrix_{point_point,point_edge,triangle})."""
    cands = jnp.stack([
        _proj_point_point(p, t0),
        _proj_point_point(p, t1),
        _proj_point_point(p, t2),
        _proj_point_edge(p, t0, t1),
        _proj_point_edge(p, t1, t2),
        _proj_point_edge(p, t2, t0),
        _proj_triangle(t0, t1, t2),
    ])
    return _select(cands, region, 7)


# ---------------------------------------------------------------------------
# Edge - Edge
# ---------------------------------------------------------------------------

def edge_edge_region(ea0, ea1, eb0, eb1, parallel_tol=None):
    """ipc edge_edge_distance_type (:80-170). Degenerate zero-length edges
    cannot occur for real meshes and are not special-cased.

    `parallel_tol` is RELATIVE: edges are parallel when the squared cross
    norm is below parallel_tol * |u|^2 * |v|^2 (sin^2 of the angle). None
    picks a dtype-appropriate default (1e-10 f32 / 1e-20 f64)."""
    u = ea1 - ea0
    v = eb1 - eb0
    w = ea0 - eb0
    a = jnp.dot(u, u)
    b = jnp.dot(u, v)
    c = jnp.dot(v, v)
    d = jnp.dot(u, w)
    e = jnp.dot(v, w)
    D = jnp.maximum(a * c - b * b, 0.0)
    cross_sq = jnp.dot(jnp.cross(u, v), jnp.cross(u, v))
    if parallel_tol is None:
        parallel_tol = _parallel_tol(ea0.dtype)
    parallel = cross_sq < parallel_tol * a * c

    # --- non-parallel path ---
    sN = b * e - c * d
    low = sN <= 0.0
    high = sN >= D
    tN = jnp.where(low, e, jnp.where(high, e + b, a * e - b * d))
    tD = jnp.where(low | high, c, D)
    default_code = jnp.where(low, 6, jnp.where(high, 7, 8)).astype(jnp.int32)

    t_low = tN <= 0.0
    t_high = tN >= tD
    code_tlow = jnp.where(-d <= 0.0, 0, jnp.where(-d >= a, 2, 4)).astype(jnp.int32)
    code_thigh = jnp.where(-d + b <= 0.0, 1, jnp.where(-d + b >= a, 3, 5)).astype(jnp.int32)
    np_code = jnp.where(t_low, code_tlow, jnp.where(t_high, code_thigh, default_code))

    # --- parallel path (ipc:171-201) ---
    alpha = jnp.dot(eb0 - ea0, u) / jnp.maximum(a, _TINY)
    beta = jnp.dot(eb1 - ea0, u) / jnp.maximum(a, _TINY)
    in01 = lambda x: (0.0 <= x) & (x <= 1.0)
    eac = jnp.where(alpha < 0.0,
                    jnp.where(in01(beta), 2, 0),
                    jnp.where(alpha > 1.0,
                              jnp.where(in01(beta), 2, 1),
                              2)).astype(jnp.int32)
    ebc = jnp.where(alpha < 0.0,
                    jnp.where(beta <= alpha, 0, jnp.where(beta <= 1.0, 1, 2)),
                    jnp.where(alpha > 1.0,
                              jnp.where(beta >= alpha, 0, jnp.where(0.0 <= beta, 1, 2)),
                              0)).astype(jnp.int32)
    par_code = jnp.where(ebc < 2, (eac << 1) | ebc, 6 + eac).astype(jnp.int32)

    return jnp.where(parallel, par_code, np_code)


def edge_edge_sq_distance(ea0, ea1, eb0, eb1, region=None, parallel_tol=None):
    if region is None:
        region = edge_edge_region(ea0, ea1, eb0, eb1, parallel_tol)
    cands = jnp.stack([
        _sq_point_point(ea0, eb0),
        _sq_point_point(ea0, eb1),
        _sq_point_point(ea1, eb0),
        _sq_point_point(ea1, eb1),
        _sq_point_line(eb0, ea0, ea1),
        _sq_point_line(eb1, ea0, ea1),
        _sq_point_line(ea0, eb0, eb1),
        _sq_point_line(ea1, eb0, eb1),
        _sq_line_line(ea0, ea1, eb0, eb1),
    ])
    return _select(cands, region, 9)


def edge_edge_distance(ea0, ea1, eb0, eb1, region=None, parallel_tol=None):
    return maths.safe_sqrt(edge_edge_sq_distance(ea0, ea1, eb0, eb1, region,
                                                 parallel_tol), _TINY)


def edge_edge_params(ea0, ea1, eb0, eb1, region):
    """(s, t) line parameters of the closest points for friction anchors.
    pp/pe regions pin the endpoint parameter; ee uses the unclamped line-line
    solution (friction_geometry.cpp barycentric_edge_edge, parallel -> 0.5)."""
    da = ea1 - ea0
    db = eb1 - eb0
    r = ea0 - eb0
    a = jnp.dot(da, da)
    e = jnp.dot(db, db)
    f = jnp.dot(db, r)
    b = jnp.dot(da, db)
    c = jnp.dot(da, r)
    denom = a * e - b * b
    # relative degeneracy test (absolute 1e-16 underflows the f32 guard)
    degen = denom < _parallel_tol(da.dtype) * a * e
    s_ll = jnp.where(degen, 0.5, (b * f - c * e) / jnp.where(degen, 1.0, denom))
    t_ll = jnp.where(degen, 0.5, (b * s_ll + f) / jnp.maximum(e, _TINY))
    # point-on-line params for the pe regions
    _, t_a0 = _bary_point_edge(ea0, eb0, eb1)
    _, t_a1 = _bary_point_edge(ea1, eb0, eb1)
    _, s_b0 = _bary_point_edge(eb0, ea0, ea1)
    _, s_b1 = _bary_point_edge(eb1, ea0, ea1)
    zero = jnp.zeros(())
    one = jnp.ones(())
    # region meanings:
    # 0 EA0_EB0: s=0, t=0 ; 1 EA0_EB1: s=0, t=1 ; 2 EA1_EB0: s=1, t=0
    # 3 EA1_EB1: s=1, t=1 ; 4 EA_EB0: s=param(eb0 on ea), t=0
    # 5 EA_EB1: s=param(eb1 on ea), t=1 ; 6 EA0_EB: s=0, t=param(ea0 on eb)
    # 7 EA1_EB: s=1, t=param(ea1 on eb) ; 8 EA_EB: line-line
    s_cands = jnp.stack([zero, zero, one, one, s_b0, s_b1, zero, one, s_ll])
    t_cands = jnp.stack([zero, one, zero, one, zero, one, t_a0, t_a1, t_ll])
    return _select(s_cands, region, 9), _select(t_cands, region, 9)


def edge_edge_T(ea0, ea1, eb0, eb1, region):
    """2x3 tangent projection for EE friction per region."""
    cands = jnp.stack([
        _proj_point_point(ea0, eb0),
        _proj_point_point(ea0, eb1),
        _proj_point_point(ea1, eb0),
        _proj_point_point(ea1, eb1),
        _proj_point_edge(eb0, ea0, ea1),
        _proj_point_edge(eb1, ea0, ea1),
        _proj_point_edge(ea0, eb0, eb1),
        _proj_point_edge(ea1, eb0, eb1),
        _proj_edge_edge(ea0, ea1, eb0, eb1),
    ])
    return _select(cands, region, 9)


def edge_edge_mollifier(ea0, ea1, eb0, eb1, EA0, EA1, EB0, EB1):
    """IPC edge-edge mollifier with eps_x = 1e-3*|EA|^2*|EB|^2 from REST
    positions (EnergyFrictionalContact.cpp:1251-1259)."""
    eps_x = 1e-3 * maths.sq_norm(EA0 - EA1) * maths.sq_norm(EB0 - EB1)
    x = maths.sq_norm(jnp.cross(ea1 - ea0, eb1 - eb0))
    x_div = x / jnp.maximum(eps_x, _TINY)
    f = (-x_div + 2.0) * x_div
    return jnp.where(x > eps_x, 1.0, f)


# ---------------------------------------------------------------------------
# Edge - Triangle intersection (the "is state penetration-free" oracle)
# Reference: tmcd::IntersectionDetection / is_edge_intersecting_triangle
# ---------------------------------------------------------------------------

def segment_triangle_intersects(p0, p1, t0, t1, t2):
    """Boolean segment-triangle intersection (Moller-Trumbore, inclusive)."""
    d = p1 - p0
    e1 = t1 - t0
    e2 = t2 - t0
    h = jnp.cross(d, e2)
    a = jnp.dot(e1, h)
    # relative parallel test: a is a triple product ~ |e1||d||e2|*sin; the
    # old absolute 1e-300 guard underflows to 0 in f32 and lets coplanar
    # (flat-cloth) pairs produce garbage intersection coordinates
    scale_sq = jnp.dot(e1, e1) * jnp.dot(h, h)
    not_parallel = a * a > jnp.maximum(_parallel_tol(p0.dtype) * scale_sq, _TINY)
    f = 1.0 / jnp.where(not_parallel, a, 1.0)
    s = p0 - t0
    u = f * jnp.dot(s, h)
    q = jnp.cross(s, e1)
    v = f * jnp.dot(d, q)
    t = f * jnp.dot(e2, q)
    hit = (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t >= 0.0) & (t <= 1.0)
    return hit & not_parallel
