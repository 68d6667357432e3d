"""Small differentiable math helpers shared by all energy models.

NaN-safety conventions: JAX's `jnp.where` evaluates BOTH branches, and the
gradient of an unselected NaN/Inf branch poisons the result (0*NaN=NaN). The
reference avoids this class of bug by compiling real branches
(symx::Expr::Branch, see /root/reference/stark/extern/symx/src/symbol/diff.cpp:26-28).
Here every potentially-singular expression goes through the "double where"
guards below so that both value and all derivative orders stay finite.
"""
from __future__ import annotations

import jax.numpy as jnp

EPSILON = 1e-12


def guard(cond, x, safe):
    """Replace entries of x where cond is False by `safe` (grad-safe select)."""
    return jnp.where(cond, x, safe)


def safe_sqrt(x, eps: float = EPSILON):
    """sqrt with finite gradient at 0 (clamps the argument away from 0)."""
    return jnp.sqrt(jnp.maximum(x, eps))


def safe_norm(v, eps: float = EPSILON):
    """Euclidean norm with finite gradients at v=0."""
    return safe_sqrt(jnp.sum(v * v), eps)


def norm(v):
    return jnp.sqrt(jnp.sum(v * v))


def sq_norm(v):
    return jnp.sum(v * v)


def normalized(v, eps: float = EPSILON):
    return v / safe_norm(v, eps)


def cross(a, b):
    return jnp.cross(a, b)


def dot(a, b):
    return jnp.sum(a * b)


def cubic_one_sided(x, stiffness):
    """One-sided cubic penalty: stiffness*x^3/3 for x>0, else 0.

    Used by all strain-limit terms (reference: EnergySegmentStrain.cpp:44-46,
    EnergyTriangleStrain.cpp:66-71, EnergyTetStrain.cpp:66-77). Polynomial,
    so both branches are smooth -> plain where is derivative-safe.
    """
    return jnp.where(x > 0.0, stiffness * x * x * x / 3.0, 0.0)


def dihedral_angle(x0, x1, x2, x3, eps: float = None):
    """Dihedral angle across edge (x0,x1) with wing vertices x2, x3.

    Mirrors the reference's dihedral_angle_rad_f
    (EnergyDiscreteShells.cpp:12-24): acos((1-eps) * n0.hat . n1.hat) where
    n0 = e0 x e1, n1 = -e0 x e2. The (1-eps) factor keeps acos differentiable
    at +-1 exactly as the reference does — but eps must be dtype-aware: the
    reference's f64 1e-12 rounds (1-eps) to exactly 1.0 under float32, which
    re-creates the infinite acos slope at flat configurations (every internal
    edge of a flat cloth grid!).
    """
    e0 = x1 - x0
    e1 = x2 - x0
    e2 = x3 - x0
    n0 = jnp.cross(e0, e1)
    n1 = -jnp.cross(e0, e2)
    c = dot(normalized(n0), normalized(n1))
    if eps is None:
        eps = 100.0 * float(jnp.finfo(c.dtype).eps) if hasattr(c, "dtype") else EPSILON
    return jnp.arccos((1.0 - eps) * c)


# ----------------------------------------------------------------------------
# Quaternions (w, x, y, z) — rigid body kinematics
# Mirrors /root/reference/stark/src/models/rigidbodies/rigidbody_transformations.cpp
# ----------------------------------------------------------------------------

def quat_mul(q1, q2):
    """Hamilton product, (w,x,y,z) convention (rigidbody_transformations.cpp:96-117)."""
    a, b, c, d = q1[0], q1[1], q1[2], q1[3]
    e, f, g, h = q2[0], q2[1], q2[2], q2[3]
    return jnp.stack([
        a * e - b * f - c * g - d * h,
        b * e + a * f + c * h - d * g,
        a * g - b * h + c * e + d * f,
        a * h + b * g - c * f + d * e,
    ])


def quat_conj(q):
    return jnp.stack([q[0], -q[1], -q[2], -q[3]])


def quat_to_rotation(q):
    """Rotation matrix from a unit quaternion (rigidbody_transformations.cpp:57-94)."""
    qw, qx, qy, qz = q[0], q[1], q[2], q[3]
    tx, ty, tz = 2.0 * qx, 2.0 * qy, 2.0 * qz
    twx, twy, twz = tx * qw, ty * qw, tz * qw
    txx, txy, txz = tx * qx, ty * qx, tz * qx
    tyy, tyz = ty * qy, tz * qy
    tzz = tz * qz
    return jnp.array([
        [1.0 - (tyy + tzz), txy - twz, txz + twy],
        [txy + twz, 1.0 - (txx + tzz), tyz - twx],
        [txz - twy, tyz + twx, 1.0 - (txx + tyy)],
    ])


def quat_time_integration(q0, w_glob, dt):
    """q1 = normalize(q0 + 0.5*dt*(w*q0)) — first-order quaternion update
    (rigidbody_transformations.cpp:119-124). Differentiable w.r.t. w_glob."""
    w_ = jnp.stack([jnp.zeros_like(w_glob[0]), w_glob[0], w_glob[1], w_glob[2]])
    q1 = q0 + 0.5 * dt * quat_mul(w_, q0)
    return q1 / safe_norm(q1)


def quat_integration_rotation(q0, w_glob, dt):
    """R1 = R(quat_time_integration(q0, w1, dt)) (rigidbody_transformations.cpp:126-130)."""
    return quat_to_rotation(quat_time_integration(q0, w_glob, dt))


def integrate_loc_point(p_loc, t0, q0, v1, w1, dt):
    """x1 of a body-local point under next-step velocities (ref .cpp:148-153)."""
    R1 = quat_integration_rotation(q0, w1, dt)
    t1 = t0 + dt * v1
    return t1 + R1 @ p_loc


def integrate_loc_direction(d_loc, q0, w1, dt):
    """d1 of a body-local direction under next-step angular velocity (ref .cpp:154-158)."""
    return quat_integration_rotation(q0, w1, dt) @ d_loc


def np_quat_mul(q1, q2):
    """Hamilton product, (w,x,y,z), pure numpy (host paths must not dispatch
    device ops: every round trip over the remote TPU relay costs ~0.1-1 s).
    Batched: q1/q2 are (..., 4)."""
    import numpy as np

    a, b, c, d = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    e, f, g, h = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return np.stack([
        a * e - b * f - c * g - d * h,
        b * e + a * f + c * h - d * g,
        a * g - b * h + c * e + d * f,
        a * h + b * g - c * f + d * e,
    ], axis=-1)


def np_quat_to_rotation(q):
    """Rotation matrices from unit quaternions, pure numpy, batched (..., 4)
    -> (..., 3, 3)."""
    import numpy as np

    qw, qx, qy, qz = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    tx, ty, tz = 2.0 * qx, 2.0 * qy, 2.0 * qz
    twx, twy, twz = tx * qw, ty * qw, tz * qw
    txx, txy, txz = tx * qx, ty * qx, tz * qx
    tyy, tyz = ty * qy, tz * qy
    tzz = tz * qz
    one = np.ones_like(qw)
    R = np.stack([
        one - (tyy + tzz), txy - twz, txz + twy,
        txy + twz, one - (txx + tzz), tyz - twx,
        txz - twy, tyz + twx, one - (txx + tyy),
    ], axis=-1)
    return R.reshape(q.shape[:-1] + (3, 3))


def np_quat_time_integration(q0, w_glob, dt):
    """Host-side analog of quat_time_integration, batched (..., 4)/(..., 3)."""
    import numpy as np

    z = np.zeros_like(w_glob[..., :1])
    w_ = np.concatenate([z, w_glob], axis=-1)
    q1 = q0 + 0.5 * dt * np_quat_mul(w_, q0)
    return q1 / np.linalg.norm(q1, axis=-1, keepdims=True)


def rotation_to_quat(R):
    """Numerically-robust rotation-matrix -> quaternion (w,x,y,z). Host-side util."""
    import numpy as np

    R = np.asarray(R)
    tr = np.trace(R)
    if tr > 0:
        s = np.sqrt(tr + 1.0) * 2
        w = 0.25 * s
        x = (R[2, 1] - R[1, 2]) / s
        y = (R[0, 2] - R[2, 0]) / s
        z = (R[1, 0] - R[0, 1]) / s
    elif R[0, 0] > R[1, 1] and R[0, 0] > R[2, 2]:
        s = np.sqrt(1.0 + R[0, 0] - R[1, 1] - R[2, 2]) * 2
        w = (R[2, 1] - R[1, 2]) / s
        x = 0.25 * s
        y = (R[0, 1] + R[1, 0]) / s
        z = (R[0, 2] + R[2, 0]) / s
    elif R[1, 1] > R[2, 2]:
        s = np.sqrt(1.0 + R[1, 1] - R[0, 0] - R[2, 2]) * 2
        w = (R[0, 2] - R[2, 0]) / s
        x = (R[0, 1] + R[1, 0]) / s
        y = 0.25 * s
        z = (R[1, 2] + R[2, 1]) / s
    else:
        s = np.sqrt(1.0 + R[2, 2] - R[0, 0] - R[1, 1]) * 2
        w = (R[1, 0] - R[0, 1]) / s
        x = (R[0, 2] + R[2, 0]) / s
        y = (R[1, 2] + R[2, 1]) / s
        z = 0.25 * s
    q = np.array([w, x, y, z])
    return q / np.linalg.norm(q)


def axis_angle_rotation(angle_rad, axis):
    """Host-side Rodrigues rotation matrix (numpy)."""
    import numpy as np

    axis = np.asarray(axis, dtype=np.float64)
    axis = axis / np.linalg.norm(axis)
    K = np.array([
        [0, -axis[2], axis[1]],
        [axis[2], 0, -axis[0]],
        [-axis[1], axis[0], 0],
    ])
    return np.eye(3) + np.sin(angle_rad) * K + (1 - np.cos(angle_rad)) * (K @ K)


def eigenvalues_sym_2x2(M):
    """Closed-form eigenvalues of a symmetric 2x2 (used by triangle strain
    limiting, reference deformable_tools eigenvalues_sym_2x2)."""
    a, b, d = M[0, 0], M[0, 1], M[1, 1]
    mean = 0.5 * (a + d)
    disc = safe_sqrt(0.25 * (a - d) * (a - d) + b * b)
    return mean - disc, mean + disc


def triangle_area(a, b, c):
    return 0.5 * norm(jnp.cross(a - c, b - c))


def unsigned_tet_volume(a, b, c, d):
    return jnp.abs(jnp.dot(jnp.cross(b - a, c - a), d - a)) / 6.0


def blend(begin_value, end_value, begin_time, end_time, t, blend_type="linear"):
    """Scalar easing used by scripted animations (reference utils/blends.h)."""
    import numpy as np

    if t <= begin_time:
        return begin_value
    if t >= end_time:
        return end_value
    s = (t - begin_time) / (end_time - begin_time)
    if blend_type == "linear":
        w = s
    elif blend_type == "ease_in_out":
        w = 0.5 - 0.5 * np.cos(np.pi * s)
    elif blend_type == "instant":
        w = 1.0
    else:
        raise ValueError(f"unknown blend type {blend_type}")
    return begin_value + (end_value - begin_value) * w
