"""Differentiable IPC contact + lagged friction element energies.

Reference: /root/reference/stark/src/models/interactions/EnergyFrictionalContact.cpp
— barrier potentials (Cubic k(dhat-d)^3/3 default, Log variant, :1225-1250),
edge-edge mollifier (:1251-1259), friction potential on relative velocity with
C0/C1 stick-slide transition and the fixed 1e-9 perturbation breaking ||u||
nondifferentiability (:1260-1289), and the 30 per-type potentials
(:830-1180).

TPU redesign: the reference splits every pair by its narrow-phase distance
type into a dedicated potential. Here the distance-type classification runs
*inside* a uniform PT/EE energy as a branchless select (collision/narrow_phase
.py), so 7 contact + 7 friction families cover all 30, with identical math at
the evaluation point.

Family table (conn = DOF block indices; see solver/dofs.py):
  contact_pt_dd [p,t0,t1,t2]      contact_ee_dd [ea0,ea1,eb0,eb1]
  contact_pt_dr [p,vB,wB]         contact_ee_dr [vA,wA,eb0,eb1]  (A rigid)
  contact_pt_rd [vA,wA,t0,t1,t2]  contact_ee_rr [vA,wA,vB,wB]
  contact_pt_rr [vA,wA,vB,wB]
plus friction_* analogs with frozen per-pair (T, mu, fn, bary/s,t) data.
"""
from __future__ import annotations

import jax.numpy as jnp

from ... import maths
from ...collision import narrow_phase as nph
from ...solver.potential import PotentialFamily


# ---------------------------------------------------------------------------
# kinematic helpers
# ---------------------------------------------------------------------------

def _soft_x1(glob, nodes, v1_blocks):
    return glob["x0"][nodes] + glob["dt"] * v1_blocks


def _rb_frame(glob, body, v, w):
    """(t1, R1) of a body under trial velocities."""
    dt = glob["dt"]
    t0 = glob["rb_t0"][body]
    q0 = glob["rb_q0"][body]
    R1 = maths.quat_integration_rotation(q0, w, dt)
    t1 = t0 + dt * v
    return t1, R1


def _rb_x1(glob, body, v, w, locs):
    t1, R1 = _rb_frame(glob, body, v, w)
    return t1 + locs @ R1.T   # (k,3)


def _rb_point_vel(glob, body, v, w, locs):
    """World velocity of body-local points under trial velocities
    (reference get_v1: v + w x (x1 - t1), RigidBodyDynamics.cpp:66-87)."""
    t1, R1 = _rb_frame(glob, body, v, w)
    r = locs @ R1.T
    return v[None, :] + jnp.cross(jnp.broadcast_to(w, r.shape), r)


# ---------------------------------------------------------------------------
# IPC potentials
# ---------------------------------------------------------------------------

def barrier(d, dhat, k, barrier_type: str, active):
    """EnergyFrictionalContact.cpp:1225-1237. `active` guards the log.

    The gap is clamped at 0 so the potential is identically zero for
    d >= dhat: pairs are ACTIVATED by the engine's distance pass, but the
    energy re-derives d from the trial DOFs, and the two can straddle the
    dhat boundary (f32 noise, or motion during the line search). The
    reference gets the same effect from conditional potentials re-evaluating
    their activation expression; an unclamped cubic would go NEGATIVE past
    dhat and reward separation bursts. Both barriers stay C2 at the clamp."""
    gap = jnp.maximum(dhat - d, 0.0)
    if barrier_type == "Cubic":
        return k * gap ** 3 / 3.0
    # Log barrier: -k*(dhat-d)^2*log(d/dhat); floor must be f32-representable
    d_safe = jnp.where(active, jnp.maximum(d, 1e-35), dhat)
    return -k * gap ** 2 * jnp.log(jnp.minimum(d_safe / dhat, 1.0))


def barrier_force(d, dhat, k, barrier_type: str):
    """Scalar normal force magnitude -dE/dd for lagged friction
    (cpp:1238-1250). NOTE: the reference's Log branch returns
    k(dhat-d)(2d log(d/dhat)+d-dhat)/d, which equals +dE/dd (NEGATIVE for
    d<dhat) — a sign bug that turns lagged friction into propulsion; its
    default Cubic branch is unaffected. Here the Log branch uses the correct
    repulsive magnitude -dE/dd = k(dhat-d)(dhat-d-2d log(d/dhat))/d."""
    gap = jnp.maximum(dhat - d, 0.0)
    if barrier_type == "Cubic":
        return k * gap ** 2
    d_safe = jnp.maximum(d, 1e-35)
    return (k * gap
            * (gap - 2.0 * d_safe * jnp.log(jnp.minimum(d_safe / dhat, 1.0)))) / d_safe


def friction_potential(v_rel, fn, mu, T, epsv, dt, friction_type: str):
    """cpp:1260-1289: potential on tangential displacement u = T v dt with the
    deliberate fixed perturbation for differentiability at u=0."""
    PERT = 1e-9
    vt = T @ v_rel
    ut = vt * dt + jnp.array([1.13 * PERT, -1.07 * PERT], dtype=vt.dtype)
    u = jnp.sqrt(jnp.dot(ut, ut))
    epsu = dt * epsv
    if friction_type == "C0":
        k = mu * fn / epsu
        eps = epsu / 2.0  # == mu*fn/(2k), written 0/0-safe for padded rows
        E_stick = 0.5 * k * u * u
        E_slide = mu * fn * (u - eps)
        return jnp.where(u < epsu, E_stick, E_slide)
    # C1
    E_stick = mu * fn * (-u ** 3 / (3.0 * epsu ** 2) + u * u / epsu + epsu / 3.0)
    E_slide = mu * fn * u
    return jnp.where(u < epsu, E_stick, E_slide)


# ---------------------------------------------------------------------------
# contact energies
# ---------------------------------------------------------------------------

def _pt_barrier(model_cfg, p, t0, t1, t2, row, glob):
    active = row["active"] > 0.5
    # guard padded rows: coincident points -> d=0; shift p away
    p = jnp.where(active, p, t0 + 1.0)
    d = nph.point_triangle_distance(p, t0, t1, t2)
    return barrier(d, row["dhat"], glob["contact_k"], model_cfg["barrier"], active)


def _ee_barrier(model_cfg, ea0, ea1, eb0, eb1, EA0, EA1, EB0, EB1, row, glob):
    active = row["active"] > 0.5
    eb0 = jnp.where(active, eb0, ea0 + jnp.array([1.0, 0.0, 0.0], dtype=ea0.dtype))
    eb1 = jnp.where(active, eb1, ea1 + jnp.array([1.0, 0.0, 1.0], dtype=ea0.dtype))
    d = nph.edge_edge_distance(ea0, ea1, eb0, eb1,
                               parallel_tol=model_cfg["parallel_tol"])
    m = nph.edge_edge_mollifier(ea0, ea1, eb0, eb1, EA0, EA1, EB0, EB1)
    return m * barrier(d, row["dhat"], glob["contact_k"], model_cfg["barrier"], active)


def make_families(model):
    """Build the 14 dynamic families closed over the model's barrier/friction
    type configuration. `model` is the EnergyFrictionalContact instance.

    The barrier/friction types are read lazily (at trace time, i.e. the
    first solve), so users may set model.ipc_barrier_type / ipc_friction_type
    any time before running; changes after the first step would require a
    re-trace and are not supported."""
    class _Cfg:
        def __getitem__(self, key):
            if key == "barrier":
                return model.ipc_barrier_type
            if key == "friction":
                return model.ipc_friction_type
            return model.edge_edge_cross_norm_sq_cutoff

    cfg = _Cfg()

    # ---- contact ----
    def contact_pt_dd(u_e, row, glob):
        x = _soft_x1(glob, row["nodes"], u_e)     # (4,3)
        return _pt_barrier(cfg, x[0], x[1], x[2], x[3], row, glob)

    def contact_pt_dr(u_e, row, glob):
        p = _soft_x1(glob, row["node_p"], u_e[0])
        t = _rb_x1(glob, row["body_b"], u_e[1], u_e[2], row["t_loc"])
        return _pt_barrier(cfg, p, t[0], t[1], t[2], row, glob)

    def contact_pt_rd(u_e, row, glob):
        p = _rb_x1(glob, row["body_a"], u_e[0], u_e[1], row["p_loc"][None, :])[0]
        t = _soft_x1(glob, row["nodes_t"], u_e[2:5])
        return _pt_barrier(cfg, p, t[0], t[1], t[2], row, glob)

    def contact_pt_rr(u_e, row, glob):
        p = _rb_x1(glob, row["body_a"], u_e[0], u_e[1], row["p_loc"][None, :])[0]
        t = _rb_x1(glob, row["body_b"], u_e[2], u_e[3], row["t_loc"])
        return _pt_barrier(cfg, p, t[0], t[1], t[2], row, glob)

    def contact_ee_dd(u_e, row, glob):
        x = _soft_x1(glob, row["nodes"], u_e)     # (4,3)
        X = glob["X"][row["nodes"]]
        return _ee_barrier(cfg, x[0], x[1], x[2], x[3], X[0], X[1], X[2], X[3],
                           row, glob)

    def contact_ee_dr(u_e, row, glob):
        # A rigid edge, B deformable edge
        ea = _rb_x1(glob, row["body_a"], u_e[0], u_e[1], row["ea_loc"])
        eb = _soft_x1(glob, row["nodes_b"], u_e[2:4])
        EB = glob["X"][row["nodes_b"]]
        return _ee_barrier(cfg, ea[0], ea[1], eb[0], eb[1],
                           row["ea_loc"][0], row["ea_loc"][1], EB[0], EB[1],
                           row, glob)

    def contact_ee_rr(u_e, row, glob):
        ea = _rb_x1(glob, row["body_a"], u_e[0], u_e[1], row["ea_loc"])
        eb = _rb_x1(glob, row["body_b"], u_e[2], u_e[3], row["eb_loc"])
        return _ee_barrier(cfg, ea[0], ea[1], eb[0], eb[1],
                           row["ea_loc"][0], row["ea_loc"][1],
                           row["eb_loc"][0], row["eb_loc"][1], row, glob)

    # ---- friction ----
    def _fric(row, glob, va, vb):
        return friction_potential(vb - va, row["fn"], row["mu"], row["T"],
                                  glob["friction_epsv"], glob["dt"],
                                  cfg["friction"])

    def friction_pt_dd(u_e, row, glob):
        vp = u_e[0]
        vt = row["bary"] @ u_e[1:4]
        return _fric(row, glob, vp, vt)

    def friction_pt_dr(u_e, row, glob):
        vp = u_e[0]
        vtri = _rb_point_vel(glob, row["body_b"], u_e[1], u_e[2], row["t_loc"])
        return _fric(row, glob, vp, row["bary"] @ vtri)

    def friction_pt_rd(u_e, row, glob):
        vp = _rb_point_vel(glob, row["body_a"], u_e[0], u_e[1], row["p_loc"][None, :])[0]
        vt = row["bary"] @ u_e[2:5]
        return _fric(row, glob, vp, vt)

    def friction_pt_rr(u_e, row, glob):
        vp = _rb_point_vel(glob, row["body_a"], u_e[0], u_e[1], row["p_loc"][None, :])[0]
        vtri = _rb_point_vel(glob, row["body_b"], u_e[2], u_e[3], row["t_loc"])
        return _fric(row, glob, vp, row["bary"] @ vtri)

    def friction_ee_dd(u_e, row, glob):
        va = u_e[0] + row["s"] * (u_e[1] - u_e[0])
        vb = u_e[2] + row["t"] * (u_e[3] - u_e[2])
        return _fric(row, glob, va, vb)

    def friction_ee_dr(u_e, row, glob):
        vea = _rb_point_vel(glob, row["body_a"], u_e[0], u_e[1], row["ea_loc"])
        va = vea[0] + row["s"] * (vea[1] - vea[0])
        vb = u_e[2] + row["t"] * (u_e[3] - u_e[2])
        return _fric(row, glob, va, vb)

    def friction_ee_rr(u_e, row, glob):
        vea = _rb_point_vel(glob, row["body_a"], u_e[0], u_e[1], row["ea_loc"])
        veb = _rb_point_vel(glob, row["body_b"], u_e[2], u_e[3], row["eb_loc"])
        va = vea[0] + row["s"] * (vea[1] - vea[0])
        vb = veb[0] + row["t"] * (veb[1] - veb[0])
        return _fric(row, glob, va, vb)

    fams = [
        PotentialFamily("contact_pt_dd", 4, contact_pt_dd, dynamic=True),
        PotentialFamily("contact_pt_dr", 3, contact_pt_dr, dynamic=True),
        PotentialFamily("contact_pt_rd", 5, contact_pt_rd, dynamic=True),
        PotentialFamily("contact_pt_rr", 4, contact_pt_rr, dynamic=True),
        PotentialFamily("contact_ee_dd", 4, contact_ee_dd, dynamic=True),
        PotentialFamily("contact_ee_dr", 4, contact_ee_dr, dynamic=True),
        PotentialFamily("contact_ee_rr", 4, contact_ee_rr, dynamic=True),
        PotentialFamily("friction_pt_dd", 4, friction_pt_dd, dynamic=True),
        PotentialFamily("friction_pt_dr", 3, friction_pt_dr, dynamic=True),
        PotentialFamily("friction_pt_rd", 5, friction_pt_rd, dynamic=True),
        PotentialFamily("friction_pt_rr", 4, friction_pt_rr, dynamic=True),
        PotentialFamily("friction_ee_dd", 4, friction_ee_dd, dynamic=True),
        PotentialFamily("friction_ee_dr", 4, friction_ee_dr, dynamic=True),
        PotentialFamily("friction_ee_rr", 4, friction_ee_rr, dynamic=True),
    ]
    return {f.name: f for f in fams}
