"""Rigid body constraints: 11 soft-penalty containers + hardening ladder.

Reference: /root/reference/stark/src/models/rigidbodies/RigidBodyConstraints.h:54-550
(containers + energy/violation formulas), EnergyRigidBodyConstraints.cpp:16-398
(potential registration, converged-state validity with stiffness hardening x2,
and soft pre-hardening x1.05 at 75% capacity on accepted steps).

Direction constraints are formulated as displacement between unit direction
vectors (RigidBodyConstraints.h comment [1]); the C1-smooth force-capped
velocity controllers follow c1_controller_energy (RigidBodyConstraints.h:56-76).

Each container is a PotentialFamily over rigid DOF blocks; body kinematics
x1/d1 are recovered inside the energies from (v1, w1) via quaternion time
integration (maths.integrate_loc_*).
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from ... import maths
from ...solver.potential import FamilyData, PotentialFamily
from ...utils.mesh_utils import deg2rad, rad2deg

_EPS = 100.0 * np.finfo(np.float64).eps


# ---------------------------------------------------------------------------
# differentiable kinematic helpers (operate on gathered DOF blocks)
# ---------------------------------------------------------------------------

def _x1(loc, t0, q0, v1, w1, dt):
    return maths.integrate_loc_point(loc, t0, q0, v1, w1, dt)


def _d1(loc, q0, w1, dt):
    return maths.integrate_loc_direction(loc, q0, w1, dt)


def _c1_controller_energy(da1, va1, vb1, target_v, max_force, delay, dt):
    """C1 force-capped velocity controller (RigidBodyConstraints.h:56-76)."""
    v = jnp.dot(da1, vb1 - va1)
    k = max_force / delay
    eps = delay / 2.0
    dv = v - target_v
    E_c = 0.5 * k * dv * dv * dt
    E_r = max_force * (dv - eps) * dt
    E_l = -E_r
    return jnp.where(dv < -delay, E_l, jnp.where(dv < delay, E_c, E_r))


def _c1_controller_violation_and_force(da1, va1, vb1, target_v, max_force, delay):
    v = float(np.dot(da1, vb1 - va1))
    k = max_force / delay
    dv = v - target_v
    if dv < -delay:
        return dv, -max_force
    if dv < delay:
        return dv, -k * dv
    return dv, max_force


def opening_distance_of_angle(angle_deg: float) -> float:
    return math.sqrt(2.0 - 2.0 * math.cos(deg2rad(angle_deg)))


def angle_of_opening_distance(d: float) -> float:
    return rad2deg(math.acos(max(-1.0, min(1.0, (2.0 - d * d) / 2.0))))


class _Container:
    """Shared storage pattern of all constraint containers."""

    def __init__(self, model, name):
        self.model = model
        self.name = name
        self.bodies_a: list[int] = []
        self.bodies_b: list[int] = []
        self.stiffness: list[float] = []
        self.tolerance: list[float] = []
        self.is_active: list[float] = []
        self.labels: list[str] = []
        self.vec: dict[str, list[np.ndarray]] = {}
        self.scal: dict[str, list[float]] = {}

    def size(self) -> int:
        return len(self.is_active)

    def _push(self, a, b, stiffness, tolerance, vecs=None, scals=None):
        idx = self.size()
        self.bodies_a.append(a)
        self.bodies_b.append(-1 if b is None else b)
        self.stiffness.append(float(stiffness))
        self.tolerance.append(float(tolerance))
        self.is_active.append(1.0)
        self.labels.append("")
        for k, v in (vecs or {}).items():
            self.vec.setdefault(k, []).append(np.asarray(v, dtype=np.float64))
        for k, v in (scals or {}).items():
            self.scal.setdefault(k, []).append(float(v))
        self.model.stark.mark_dirty(self.name)
        return idx

    def base_rows(self):
        rows = {
            "a": np.asarray(self.bodies_a, dtype=np.int32),
            "b": np.asarray(self.bodies_b, dtype=np.int32),
            "stiffness": np.asarray(self.stiffness),
            "active": np.asarray(self.is_active),
        }
        for k, v in self.vec.items():
            rows[k] = np.asarray(v)
        for k, v in self.scal.items():
            rows[k] = np.asarray(v)
        return rows

    def mark_dirty(self):
        self.model.stark.mark_dirty(self.name)


class EnergyRigidBodyConstraints:
    """All 11 constraint potentials (EnergyRigidBodyConstraints.cpp:16-240)."""

    stiffness_hard_multiplier = 2.0
    stiffness_soft_multiplier = 1.05
    soft_constraint_capacity_hardening_point = 0.75

    def __init__(self, stark, rb, inertia):
        self.stark = stark
        self.rb = rb
        self.inertia = inertia

        stark.callbacks.newton.add_is_converged_state_valid(
            lambda: self._is_converged_state_valid())
        stark.callbacks.add_on_time_step_accepted(lambda: self._on_time_step_accepted())

        C = _Container
        self.global_points = C(self, "rb_constraint_global_points")
        self.global_directions = C(self, "rb_constraint_global_directions")
        self.points = C(self, "rb_constraint_points")
        self.point_on_axes = C(self, "rb_constraint_point_on_axis")
        self.distances = C(self, "rb_constraint_distances")
        self.distance_limits = C(self, "rb_constraint_distance_limits")
        self.directions = C(self, "rb_constraint_directions")
        self.angle_limits = C(self, "rb_constraint_angle_limits")
        self.damped_springs = C(self, "rb_constraint_damped_spring")
        self.linear_velocity = C(self, "rb_constraint_linear_velocity")
        self.angular_velocity = C(self, "rb_constraint_angular_velocity")

        gp = stark.global_potential
        # (family, arity, energy, container, conn builder)
        # block layouts are resolved lazily at freeze time via stark.layout
        gp.add_potential(PotentialFamily("rb_constraint_global_points", 2,
                                         self._e_global_points),
                         lambda: self._prov(self.global_points, "aw"))
        gp.add_potential(PotentialFamily("rb_constraint_global_directions", 1,
                                         self._e_global_directions),
                         lambda: self._prov(self.global_directions, "w"))
        gp.add_potential(PotentialFamily("rb_constraint_points", 4, self._e_points),
                         lambda: self._prov(self.points, "awbw"))
        gp.add_potential(PotentialFamily("rb_constraint_point_on_axis", 4,
                                         self._e_point_on_axis),
                         lambda: self._prov(self.point_on_axes, "awbw"))
        gp.add_potential(PotentialFamily("rb_constraint_distances", 4, self._e_distances),
                         lambda: self._prov(self.distances, "awbw"))
        gp.add_potential(PotentialFamily("rb_constraint_distance_limits", 4,
                                         self._e_distance_limits),
                         lambda: self._prov(self.distance_limits, "awbw"))
        gp.add_potential(PotentialFamily("rb_constraint_directions", 2, self._e_directions),
                         lambda: self._prov(self.directions, "ww"))
        gp.add_potential(PotentialFamily("rb_constraint_angle_limits", 2,
                                         self._e_angle_limits),
                         lambda: self._prov(self.angle_limits, "ww"))
        gp.add_potential(PotentialFamily("rb_constraint_damped_spring", 4,
                                         self._e_damped_spring),
                         lambda: self._prov(self.damped_springs, "awbw"))
        gp.add_potential(PotentialFamily("rb_constraint_linear_velocity", 3,
                                         self._e_linear_velocity),
                         lambda: self._prov(self.linear_velocity, "vvw"))
        gp.add_potential(PotentialFamily("rb_constraint_angular_velocity", 2,
                                         self._e_angular_velocity),
                         lambda: self._prov(self.angular_velocity, "ww"))

    # ------------------------------------------------------------------
    # providers: build block conn from body indices
    # ------------------------------------------------------------------
    def _prov(self, cont: _Container, kind: str):
        if cont.size() == 0:
            return None
        lay = self.stark.layout
        a = np.asarray(cont.bodies_a, dtype=np.int64)
        b = np.asarray(cont.bodies_b, dtype=np.int64)
        va = lay.n_soft + 2 * a
        wa = va + 1
        vb = lay.n_soft + 2 * np.maximum(b, 0)
        wb = vb + 1
        if kind == "aw":       # [v_a, w_a]
            conn = np.stack([va, wa], axis=1)
        elif kind == "w":      # [w_a]
            conn = wa.reshape(-1, 1)
        elif kind == "awbw":   # [v_a, w_a, v_b, w_b]
            conn = np.stack([va, wa, vb, wb], axis=1)
        elif kind == "ww":     # [w_a, w_b]
            conn = np.stack([wa, wb], axis=1)
        elif kind == "vvw":    # [v_a, v_b, w_a]
            conn = np.stack([va, vb, wa], axis=1)
        else:
            raise ValueError(kind)
        return FamilyData(conn.astype(np.int32), cont.base_rows())

    # ------------------------------------------------------------------
    # energies (EnergyRigidBodyConstraints.cpp:30-240)
    # ------------------------------------------------------------------
    def _e_global_points(self, u_e, row, glob):
        va, wa = u_e[0], u_e[1]
        dt = glob["dt"]
        a = row["a"]
        p = _x1(row["loc"], glob["rb_t0"][a], glob["rb_q0"][a], va, wa, dt)
        d = row["target"] - p
        return 0.5 * row["stiffness"] * jnp.dot(d, d)

    def _e_global_directions(self, u_e, row, glob):
        wa = u_e[0]
        a = row["a"]
        d = _d1(row["d_loc"], glob["rb_q0"][a], wa, glob["dt"])
        u = row["target"] - d
        return 0.5 * row["stiffness"] * jnp.dot(u, u)

    def _e_points(self, u_e, row, glob):
        va, wa, vb, wb = u_e[0], u_e[1], u_e[2], u_e[3]
        dt = glob["dt"]
        a, b = row["a"], row["b"]
        a1 = _x1(row["a_loc"], glob["rb_t0"][a], glob["rb_q0"][a], va, wa, dt)
        b1 = _x1(row["b_loc"], glob["rb_t0"][b], glob["rb_q0"][b], vb, wb, dt)
        d = b1 - a1
        return 0.5 * row["stiffness"] * jnp.dot(d, d)

    def _e_point_on_axis(self, u_e, row, glob):
        va, wa, vb, wb = u_e[0], u_e[1], u_e[2], u_e[3]
        dt = glob["dt"]
        a, b = row["a"], row["b"]
        a1 = _x1(row["a_loc"], glob["rb_t0"][a], glob["rb_q0"][a], va, wa, dt)
        da1 = _d1(row["da_loc"], glob["rb_q0"][a], wa, dt)
        b1 = _x1(row["b_loc"], glob["rb_t0"][b], glob["rb_q0"][b], vb, wb, dt)
        # sq_distance_point_line(b1; a1, a1+da1) (models/distances.h)
        r = b1 - a1
        cr = jnp.cross(r, da1)
        sqd = jnp.dot(cr, cr) / jnp.dot(da1, da1)
        return 0.5 * row["stiffness"] * sqd

    def _e_distances(self, u_e, row, glob):
        va, wa, vb, wb = u_e[0], u_e[1], u_e[2], u_e[3]
        dt = glob["dt"]
        a, b = row["a"], row["b"]
        a1 = _x1(row["a_loc"], glob["rb_t0"][a], glob["rb_q0"][a], va, wa, dt)
        b1 = _x1(row["b_loc"], glob["rb_t0"][b], glob["rb_q0"][b], vb, wb, dt)
        l = maths.safe_norm(b1 - a1)
        return 0.5 * row["stiffness"] * (row["target_distance"] - l) ** 2

    def _e_distance_limits(self, u_e, row, glob):
        va, wa, vb, wb = u_e[0], u_e[1], u_e[2], u_e[3]
        dt = glob["dt"]
        a, b = row["a"], row["b"]
        a1 = _x1(row["a_loc"], glob["rb_t0"][a], glob["rb_q0"][a], va, wa, dt)
        b1 = _x1(row["b_loc"], glob["rb_t0"][b], glob["rb_q0"][b], vb, wb, dt)
        k = row["stiffness"]
        l = maths.safe_norm(b1 - a1)
        E_min = jnp.where(l < row["min_distance"], k * (row["min_distance"] - l) ** 2 / 2.0, 0.0)
        E_max = jnp.where(l > row["max_distance"], k * (l - row["max_distance"]) ** 2 / 2.0, 0.0)
        return E_min + E_max

    def _e_directions(self, u_e, row, glob):
        wa, wb = u_e[0], u_e[1]
        dt = glob["dt"]
        a, b = row["a"], row["b"]
        da = _d1(row["da_loc"], glob["rb_q0"][a], wa, dt)
        db = _d1(row["db_loc"], glob["rb_q0"][b], wb, dt)
        u = db - da
        return 0.5 * row["stiffness"] * jnp.dot(u, u)

    def _e_angle_limits(self, u_e, row, glob):
        wa, wb = u_e[0], u_e[1]
        dt = glob["dt"]
        a, b = row["a"], row["b"]
        da = _d1(row["da_loc"], glob["rb_q0"][a], wa, dt)
        db = _d1(row["db_loc"], glob["rb_q0"][b], wb, dt)
        l = maths.safe_norm(db - da, 1e-30)
        k = row["stiffness"]
        return jnp.where(l > row["max_distance"],
                         k * (l - row["max_distance"]) ** 3 / 3.0, 0.0)

    def _e_damped_spring(self, u_e, row, glob):
        va, wa, vb, wb = u_e[0], u_e[1], u_e[2], u_e[3]
        dt = glob["dt"]
        a, b = row["a"], row["b"]
        ta, qa = glob["rb_t0"][a], glob["rb_q0"][a]
        tb, qb = glob["rb_t0"][b], glob["rb_q0"][b]
        a1 = _x1(row["a_loc"], ta, qa, va, wa, dt)
        b1 = _x1(row["b_loc"], tb, qb, vb, wb, dt)
        a0 = ta + maths.quat_to_rotation(qa) @ row["a_loc"]
        b0 = tb + maths.quat_to_rotation(qb) @ row["b_loc"]
        l1 = maths.safe_norm(b1 - a1)
        l0 = maths.safe_norm(b0 - a0)
        E_spring = 0.5 * row["stiffness"] * (l1 - row["rest_length"]) ** 2
        E_damper = 0.5 * row["damping"] * ((l1 - l0) / dt) ** 2
        return E_spring + E_damper

    def _e_linear_velocity(self, u_e, row, glob):
        va, vb, wa = u_e[0], u_e[1], u_e[2]
        dt = glob["dt"]
        a = row["a"]
        da1 = _d1(row["da_loc"], glob["rb_q0"][a], wa, dt)
        return _c1_controller_energy(da1, va, vb, row["target_v"], row["max_force"],
                                     row["delay"], dt)

    def _e_angular_velocity(self, u_e, row, glob):
        wa, wb = u_e[0], u_e[1]
        dt = glob["dt"]
        a = row["a"]
        da1 = _d1(row["da_loc"], glob["rb_q0"][a], wa, dt)
        return _c1_controller_energy(da1, wa, wb, row["target_w"], row["max_torque"],
                                     row["delay"], dt)

    # ------------------------------------------------------------------
    # host-side violation evaluation (x1/d1 under current trial velocities
    # or at set positions; EnergyRigidBodyConstraints.cpp:300-398)
    # ------------------------------------------------------------------
    def _get_x1(self, rb, loc, are_positions_set):
        if are_positions_set:
            return self.rb.get_position_at(rb, loc)
        return self.rb.get_x1(rb, loc, self.stark.dt)

    def _get_d1(self, rb, loc, are_positions_set):
        if are_positions_set:
            return self.rb.get_direction(rb, loc)
        return self.rb.get_d1(rb, loc, self.stark.dt)

    # violation formulas (RigidBodyConstraints.h per-container statics)
    def violation_global_point(self, idx, pos_set=False):
        c = self.global_points
        p = self._get_x1(c.bodies_a[idx], c.vec["loc"][idx], pos_set)
        u = p - c.vec["target"][idx]
        Cv = np.linalg.norm(u)
        return Cv, c.stiffness[idx] * Cv

    def violation_global_direction(self, idx, pos_set=False):
        c = self.global_directions
        d = self._get_d1(c.bodies_a[idx], c.vec["d_loc"][idx], pos_set)
        u = d - c.vec["target"][idx]
        Cv = np.linalg.norm(u)
        force = -c.stiffness[idx] * Cv * u / (Cv + _EPS)
        angle_deg = rad2deg(math.asin(min(1.0, Cv)))
        torque = np.cross(c.vec["target"][idx], force)
        return angle_deg, np.linalg.norm(torque)

    def violation_point(self, idx, pos_set=False):
        c = self.points
        a1 = self._get_x1(c.bodies_a[idx], c.vec["a_loc"][idx], pos_set)
        b1 = self._get_x1(c.bodies_b[idx], c.vec["b_loc"][idx], pos_set)
        Cv = np.linalg.norm(b1 - a1)
        return Cv, c.stiffness[idx] * Cv

    def violation_point_on_axis(self, idx, pos_set=False):
        c = self.point_on_axes
        a1 = self._get_x1(c.bodies_a[idx], c.vec["a_loc"][idx], pos_set)
        da1 = self._get_d1(c.bodies_a[idx], c.vec["da_loc"][idx], pos_set)
        b1 = self._get_x1(c.bodies_b[idx], c.vec["b_loc"][idx], pos_set)
        r = b1 - a1
        cr = np.cross(r, da1)
        Cv = math.sqrt(np.dot(cr, cr) / np.dot(da1, da1))
        return Cv, c.stiffness[idx] * Cv

    def violation_distance(self, idx, pos_set=False):
        c = self.distances
        a1 = self._get_x1(c.bodies_a[idx], c.vec["a_loc"][idx], pos_set)
        b1 = self._get_x1(c.bodies_b[idx], c.vec["b_loc"][idx], pos_set)
        Cv = np.linalg.norm(b1 - a1) - c.scal["target_distance"][idx]
        return Cv, -c.stiffness[idx] * Cv

    def violation_distance_limits(self, idx, pos_set=False):
        c = self.distance_limits
        a1 = self._get_x1(c.bodies_a[idx], c.vec["a_loc"][idx], pos_set)
        b1 = self._get_x1(c.bodies_b[idx], c.vec["b_loc"][idx], pos_set)
        d = np.linalg.norm(b1 - a1)
        if d < c.scal["min_distance"][idx]:
            Cv = d - c.scal["min_distance"][idx]
            return Cv, -c.stiffness[idx] * Cv
        if d > c.scal["max_distance"][idx]:
            Cv = d - c.scal["max_distance"][idx]
            return Cv, -c.stiffness[idx] * Cv
        return 0.0, 0.0

    def violation_direction(self, idx, pos_set=False):
        c = self.directions
        da = self._get_d1(c.bodies_a[idx], c.vec["da_loc"][idx], pos_set)
        db = self._get_d1(c.bodies_b[idx], c.vec["db_loc"][idx], pos_set)
        u = db - da
        Cv = np.linalg.norm(u)
        force = c.stiffness[idx] * Cv * u / (Cv + _EPS)
        angle_deg = rad2deg(math.asin(min(1.0, Cv)))
        return angle_deg, np.linalg.norm(np.cross(da, force))

    def violation_angle_limit(self, idx, pos_set=False):
        c = self.angle_limits
        da = self._get_d1(c.bodies_a[idx], c.vec["da_loc"][idx], pos_set)
        db = self._get_d1(c.bodies_b[idx], c.vec["db_loc"][idx], pos_set)
        u = db - da
        d = np.linalg.norm(u)
        md = c.scal["max_distance"][idx]
        if d > md:
            Cv = d - md
            force = c.stiffness[idx] * Cv ** 2 * u / (d + _EPS)
            return angle_of_opening_distance(Cv), np.linalg.norm(np.cross(da, force))
        return 0.0, 0.0

    def violation_spring(self, idx):
        c = self.damped_springs
        a1 = self.rb.get_position_at(c.bodies_a[idx], c.vec["a_loc"][idx])
        b1 = self.rb.get_position_at(c.bodies_b[idx], c.vec["b_loc"][idx])
        Cv = np.linalg.norm(b1 - a1) - c.scal["rest_length"][idx]
        return Cv, -c.stiffness[idx] * Cv

    def damper_velocity_and_force(self, idx):
        c = self.damped_springs
        a, b = c.bodies_a[idx], c.bodies_b[idx]
        a1 = self.rb.get_position_at(a, c.vec["a_loc"][idx])
        b1 = self.rb.get_position_at(b, c.vec["b_loc"][idx])
        va1 = self.rb.get_velocity_at(a, c.vec["a_loc"][idx])
        vb1 = self.rb.get_velocity_at(b, c.vec["b_loc"][idx])
        r1 = b1 - a1
        r1 = r1 / np.linalg.norm(r1)
        dv = float(np.dot(vb1 - va1, r1))
        return dv, -c.scal["damping"][idx] * dv

    def violation_linear_velocity(self, idx):
        c = self.linear_velocity
        a, b = c.bodies_a[idx], c.bodies_b[idx]
        da1 = self.rb.get_direction(a, c.vec["da_loc"][idx])
        va1 = self.rb.host_v1()[a]
        vb1 = self.rb.host_v1()[b]
        return _c1_controller_violation_and_force(
            da1, va1, vb1, c.scal["target_v"][idx], c.scal["max_force"][idx],
            c.scal["delay"][idx])

    def violation_angular_velocity(self, idx):
        c = self.angular_velocity
        a, b = c.bodies_a[idx], c.bodies_b[idx]
        da1 = self.rb.get_direction(a, c.vec["da_loc"][idx])
        wa1 = self.rb.host_w1()[a]
        wb1 = self.rb.host_w1()[b]
        Cv, t = _c1_controller_violation_and_force(
            da1, wa1, wb1, c.scal["target_w"][idx], c.scal["max_torque"][idx],
            c.scal["delay"][idx])
        return rad2deg(Cv), t

    # ------------------------------------------------------------------
    # stiffness adjustment ladder (EnergyRigidBodyConstraints.cpp:242-298)
    # ------------------------------------------------------------------
    def _adjust(self, cap: float, multiplier: float, pos_set: bool) -> bool:
        valid = True

        def check(cont, i, C, tol):
            nonlocal valid
            if cont.is_active[i] > 0.0 and abs(C) > cap * tol:
                valid = False
                cont.stiffness[i] *= multiplier
                cont.mark_dirty()

        for i in range(self.global_points.size()):
            C, _ = self.violation_global_point(i, pos_set)
            check(self.global_points, i, C, self.global_points.tolerance[i])
        for i in range(self.global_directions.size()):
            C, _ = self.violation_global_direction(i, pos_set)
            check(self.global_directions, i, C, self.global_directions.tolerance[i])
        for i in range(self.points.size()):
            C, _ = self.violation_point(i, pos_set)
            check(self.points, i, C, self.points.tolerance[i])
        for i in range(self.point_on_axes.size()):
            C, _ = self.violation_point_on_axis(i, pos_set)
            check(self.point_on_axes, i, C, self.point_on_axes.tolerance[i])
        for i in range(self.distances.size()):
            C, _ = self.violation_distance(i, pos_set)
            check(self.distances, i, C, self.distances.tolerance[i])
        for i in range(self.distance_limits.size()):
            C, _ = self.violation_distance_limits(i, pos_set)
            check(self.distance_limits, i, C, self.distance_limits.tolerance[i])
        for i in range(self.directions.size()):
            C, _ = self.violation_direction(i, pos_set)
            check(self.directions, i, C, self.directions.tolerance[i])
        for i in range(self.angle_limits.size()):
            C, _ = self.violation_angle_limit(i, pos_set)
            check(self.angle_limits, i, C, self.angle_limits.tolerance[i])
        return valid

    def _is_converged_state_valid(self) -> bool:
        valid = self._adjust(1.0, self.stiffness_hard_multiplier, pos_set=False)
        if not valid:
            self.stark.output.print_with_new_line(
                "Rigid body constraints are not within tolerance. Hardening constraint stiffness.")
        return valid

    def _on_time_step_accepted(self):
        # soft pre-hardening once a constraint passes 75% of its tolerance
        # capacity (EnergyRigidBodyConstraints.cpp:268-298)
        self._adjust(self.soft_constraint_capacity_hardening_point,
                     self.stiffness_soft_multiplier, pos_set=True)
