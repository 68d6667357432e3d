"""Simulation state checkpoint / resume.

The reference has no simulation-state persistence (SURVEY.md §5: only the
kernel cache and VTK frames). The TPU rebuild adds real checkpointing —
trivially, thanks to the flat-array state design: deformable x0/v0, rigid
t0/q0/v0/w0, sim clock, adaptive dt, and the hardening states (contact
stiffness, per-constraint stiffness).
"""
from __future__ import annotations

import json

import numpy as np


def save_state(sim, path: str):
    dyn = sim._dyn
    rb = sim._rb_dyn
    contact = sim.interactions.contact
    arrays = {
        "pt_x0": np.asarray(dyn.x0) if dyn.frozen else dyn._x0_host,
        "pt_v0": np.asarray(dyn.v0) if dyn.frozen else dyn._v0_host,
        "rb_t0": rb.t0, "rb_q0": rb.q0, "rb_v0": rb.v0, "rb_w0": rb.w0,
    }
    meta = {
        "current_time": sim.stark.current_time,
        "current_frame": sim.stark.current_frame,
        "current_time_step": sim.stark.current_time_step,
        "dt": sim.stark.dt,
        "next_frame_time": sim.stark.next_frame_time,
        "contact_stiffness": contact.contact_stiffness,
        "prescribed_stiffness": sim.deformables.prescribed_positions.stiffness,
        "constraint_stiffness": {
            name: list(getattr(sim.rigidbodies.constraints, name).stiffness)
            for name in ("global_points", "global_directions", "points",
                         "point_on_axes", "distances", "distance_limits",
                         "directions", "angle_limits", "damped_springs",
                         "linear_velocity", "angular_velocity")
        },
    }
    np.savez(path, __meta__=json.dumps(meta), **arrays)


def load_state(sim, path: str):
    import jax.numpy as jnp

    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["__meta__"]))
    dyn = sim._dyn
    rb = sim._rb_dyn
    if dyn.frozen:
        dtype = sim.stark.dtype
        dyn.x0 = jnp.asarray(data["pt_x0"], dtype)
        dyn.x1 = dyn.x0
        dyn.v0 = jnp.asarray(data["pt_v0"], dtype)
        dyn.v1 = jnp.zeros_like(dyn.v0)
        # refresh the post-freeze host mirrors (see PointDynamics: the
        # solver-primed caches would otherwise serve stale pre-restore state)
        dyn._host_x0 = np.asarray(data["pt_x0"], dtype=np.float64).copy()
        dyn._host_x1 = None
        dyn._host_v1 = None
    else:
        dyn._x0_host = data["pt_x0"].copy()
        dyn._v0_host = data["pt_v0"].copy()
    rb.t0 = data["rb_t0"].copy()
    rb.t1 = rb.t0.copy()
    rb.q0 = data["rb_q0"].copy()
    rb.q1 = rb.q0.copy()
    for i in range(rb.n_bodies):
        from .. import maths

        rb.R0[i] = rb.R1[i] = np.asarray(maths.quat_to_rotation(jnp.asarray(rb.q0[i])))
    rb.v0 = data["rb_v0"].copy()
    rb.w0 = data["rb_w0"].copy()
    st = sim.stark
    st.current_time = meta["current_time"]
    st.current_frame = meta["current_frame"]
    st.current_time_step = meta["current_time_step"]
    st.dt = meta["dt"]
    st.next_frame_time = meta["next_frame_time"]
    sim.interactions.contact.contact_stiffness = meta["contact_stiffness"]
    pp = sim.deformables.prescribed_positions
    pp.stiffness = list(meta["prescribed_stiffness"])
    if pp.stiffness:
        st.mark_dirty(pp.NAME)
    for name, ks in meta["constraint_stiffness"].items():
        cont = getattr(sim.rigidbodies.constraints, name)
        cont.stiffness = list(ks)
        if ks:
            cont.mark_dirty()
