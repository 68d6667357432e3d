"""Attachment (gluing) penalties between deformables and rigid bodies.

Reference: /root/reference/stark/src/models/interactions/EnergyAttachments.cpp:17-341
— d-d point-point/point-edge/point-triangle/edge-edge barycentric anchors,
rb-d point-to-local-point, proximity-based anchor construction via
TriangleMeshDistance, converged-state tolerance check with stiffness x2.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ...solver.potential import FamilyData, PotentialFamily


@dataclass
class AttachmentParams:
    stiffness: float = 1e6
    tolerance: float = 1e-3


class AttachmentHandler:
    def __init__(self, model, kind, group):
        self.model = model
        self.kind = kind
        self.group = group

    def set_stiffness(self, k):
        self.model.set_stiffness(self.kind, self.group, k)
        return self

    def get_stiffness(self):
        return self.model.groups[self.kind][self.group]["stiffness"]


class EnergyAttachments:
    """Stage-5 full implementation target; current subset supports
    d-d point-point anchors, rb-d point anchors, and proximity-based add."""

    NAME_DD = "EnergyAttachments_dd_pp"
    NAME_RBD = "EnergyAttachments_rb_d"

    def __init__(self, stark, dyn, rb_dyn):
        self.stark = stark
        self.dyn = dyn
        self.rb_dyn = rb_dyn
        # per kind: list of group dicts
        self.groups = {self.NAME_DD: [], self.NAME_RBD: []}
        self._elems = {self.NAME_DD: [], self.NAME_RBD: []}

        stark.global_potential.add_potential(
            PotentialFamily(self.NAME_DD, 2, self._energy_dd_pp),
            lambda: self._provider(self.NAME_DD, 2))
        stark.global_potential.add_potential(
            PotentialFamily(self.NAME_RBD, 3, self._energy_rb_d),
            lambda: self._provider(self.NAME_RBD, 3))
        stark.callbacks.newton.add_is_converged_state_valid(self._is_converged_state_valid)

    # -- energies --
    def _energy_dd_pp(self, u_e, row, glob):
        # 0.5*k*||x1_a - x1_b||^2 (EnergyAttachments.cpp d-d point-point)
        dt = glob["dt"]
        xa = glob["x0"][row["node_a"]] + dt * u_e[0]
        xb = glob["x0"][row["node_b"]] + dt * u_e[1]
        d = xa - xb
        return 0.5 * row["stiffness"] * jnp.dot(d, d)

    def _energy_rb_d(self, u_e, row, glob):
        # deformable point glued to rigid-body local point
        # blocks: [soft node, rb v, rb w]
        from ... import maths

        dt = glob["dt"]
        xd = glob["x0"][row["node"]] + dt * u_e[0]
        b = row["body"]
        xr = maths.integrate_loc_point(row["loc"], glob["rb_t0"][b], glob["rb_q0"][b],
                                       u_e[1], u_e[2], dt)
        d = xd - xr
        return 0.5 * row["stiffness"] * jnp.dot(d, d)

    # -- providers --
    def _provider(self, name, arity):
        elems = self._elems[name]
        if not elems:
            return None
        groups = self.groups[name]
        if name == self.NAME_DD:
            conn = np.asarray([[e["node_a"], e["node_b"]] for e in elems], dtype=np.int32)
            rows = {
                "node_a": conn[:, 0], "node_b": conn[:, 1],
                "stiffness": np.asarray([groups[e["group"]]["stiffness"] for e in elems]),
            }
            return FamilyData(conn, rows)
        lay = self.stark.layout
        conn = np.asarray(
            [[e["node"], lay.rigid_v_block(e["body"]), lay.rigid_w_block(e["body"])]
             for e in elems], dtype=np.int32)
        rows = {
            "node": conn[:, 0],
            "body": np.asarray([e["body"] for e in elems], dtype=np.int32),
            "loc": np.asarray([e["loc"] for e in elems]),
            "stiffness": np.asarray([groups[e["group"]]["stiffness"] for e in elems]),
        }
        return FamilyData(conn, rows)

    # -- API --
    def add(self, set_a, set_b, points_a, points_b, params: AttachmentParams = None):
        """Glue pairs of deformable points (d-d point-point)."""
        params = params or AttachmentParams()
        group = len(self.groups[self.NAME_DD])
        self.groups[self.NAME_DD].append(
            {"stiffness": params.stiffness, "tolerance": params.tolerance})
        for pa, pb in zip(points_a, points_b):
            self._elems[self.NAME_DD].append({
                "node_a": int(set_a.get_global_index(pa)),
                "node_b": int(set_b.get_global_index(pb)),
                "group": group})
        self.stark.mark_dirty(self.NAME_DD)
        return AttachmentHandler(self, self.NAME_DD, group)

    def add_rb_point(self, rb_handler, set_, points, params: AttachmentParams = None):
        """Glue deformable points to a rigid body (rb-d)."""
        params = params or AttachmentParams()
        group = len(self.groups[self.NAME_RBD])
        self.groups[self.NAME_RBD].append(
            {"stiffness": params.stiffness, "tolerance": params.tolerance})
        x = self.dyn.host_x_all()
        b = rb_handler.get_idx()
        for p in points:
            gi = int(set_.get_global_index(p))
            loc = rb_handler.transform_global_to_local_point(x[gi])
            self._elems[self.NAME_RBD].append(
                {"node": gi, "body": b, "loc": loc, "group": group})
        self.stark.mark_dirty(self.NAME_RBD)
        return AttachmentHandler(self, self.NAME_RBD, group)

    def add_by_proximity(self, rb_or_set, set_, distance: float,
                         params: AttachmentParams = None):
        """Glue all points of set_ within `distance` of the other object
        (EnergyAttachments.cpp:236-341 uses a point->mesh distance query)."""
        params = params or AttachmentParams()
        x = self.dyn.host_x_all()
        pts = set_.get_positions()
        if hasattr(rb_or_set, "rigidbodies"):  # RigidBodyHandler
            # distance to the rigid body's collision/visual mesh is
            # approximated by distance to its center-transformed vertices;
            # exact mesh SDF gluing arrives with the mesh_distance module.
            from ...collision.mesh_distance import points_near_rigid_mesh

            near = points_near_rigid_mesh(rb_or_set, pts, distance)
            return self.add_rb_point(rb_or_set, set_, np.nonzero(near)[0].tolist(), params)
        raise NotImplementedError("d-d proximity attachments arrive with mesh_distance")

    def set_stiffness(self, kind, group, k):
        self.groups[kind][group]["stiffness"] = k
        self.stark.mark_dirty(kind)

    def _is_converged_state_valid(self) -> bool:
        # tolerance check + hardening (EnergyAttachments.cpp converged check)
        ok = True
        dt = self.stark.dt
        if self._elems[self.NAME_DD]:
            x1 = np.asarray(self.dyn.get_x1(dt))
            for e in self._elems[self.NAME_DD]:
                g = self.groups[self.NAME_DD][e["group"]]
                d = np.linalg.norm(x1[e["node_a"]] - x1[e["node_b"]])
                if d > g["tolerance"]:
                    g["stiffness"] *= 2.0
                    self.stark.mark_dirty(self.NAME_DD)
                    ok = False
        if self._elems[self.NAME_RBD]:
            x1 = np.asarray(self.dyn.get_x1(dt))
            for e in self._elems[self.NAME_RBD]:
                g = self.groups[self.NAME_RBD][e["group"]]
                xr = self.rb_dyn.get_x1(e["body"], e["loc"], dt)
                d = np.linalg.norm(x1[e["node"]] - xr)
                if d > g["tolerance"]:
                    g["stiffness"] *= 2.0
                    self.stark.mark_dirty(self.NAME_RBD)
                    ok = False
        if not ok:
            self.stark.output.print_with_new_line(
                "Attachments not within tolerance. Stiffness hardened.")
        return ok
