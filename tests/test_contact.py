"""IPC contact tests: FD derivatives with live contact pairs, resting
contact, rigid-rigid stacking, friction stick.

The scenes mirror the reference's contact behavioral guarantees
(docs/source/contact.md): intersection-free states without CCD, thickness
gap maintained by the barrier, stiffness hardening on failure.
"""
import numpy as np
import pytest

from stark_tpu import Settings, Simulation
from stark_tpu.models.rigidbodies.inertia_tensors import inertia_tensor_box
from stark_tpu.presets.presets import SurfaceParams, VolumeParams
from stark_tpu.models.interactions.contact import ContactParams


def make_settings(name="contact", dt=1 / 100):
    s = Settings()
    s.output.simulation_name = name
    s.output.enable_output = False
    s.output.enable_frame_writes = False
    s.simulation.max_time_step_size = dt
    s.newton.residual_tolerance_abs = 1e-5
    return s


def _two_cloths(sim, gap=0.0015):
    """Two small overlapping-in-XY cloth patches separated by `gap` in z."""
    p = SurfaceParams.Cotton_Fabric()
    sim.interactions.contact.global_params.default_contact_thickness = 0.001
    c1 = sim.presets.deformables.add_surface_grid("", (0.2, 0.2), (3, 3), p)
    c2 = sim.presets.deformables.add_surface_grid("", (0.2, 0.2), (3, 3), p)
    # lift the second cloth by gap and shift slightly for EE variety
    pts = c2.point_set
    x = pts.get_positions()
    x[:, 2] += gap
    x[:, 0] += 0.021
    sim._dyn._x0_host[pts.get_begin():pts.get_begin() + pts.size()] = x
    return c1, c2


def test_fd_contact_energies():
    sim = Simulation(make_settings("fd_contact"))
    c1, c2 = _two_cloths(sim)
    c1.contact.set_friction(c2.contact, 0.4)
    sim.stark._initialize()
    sim.stark.callbacks.run_before_time_step()
    # contact tables exist?
    sim.stark.callbacks.newton.run_before_energy_evaluation()
    data = sim._get_data()
    assert "contact_pt_dd" in data
    n_active = int(np.sum(np.asarray(data["contact_pt_dd"]["rows"]["active"]) > 0.5))
    assert n_active > 0, "expected live PT contact pairs between the cloths"
    assert "friction_pt_dd" in data

    import jax.numpy as jnp

    nm = sim.stark.newton
    rng = np.random.default_rng(3)
    u = np.asarray(nm.get_dofs())
    u = u + 0.02 * rng.standard_normal(u.shape)
    glob = nm.get_glob()
    E, _Eabs, g, H = nm._jit_egh(jnp.asarray(u), data, glob)
    assert np.isfinite(float(E))
    g = np.asarray(g)
    assert np.all(np.isfinite(g))
    # FD check on dofs with contact contributions
    h = 1e-7
    idxs = rng.choice(u.shape[0] * 3, size=24, replace=False)
    scale = max(1.0, np.max(np.abs(g)))
    for flat in idxs:
        b, dax = divmod(int(flat), 3)
        up = u.copy(); up[b, dax] += h
        um = u.copy(); um[b, dax] -= h
        Ep = float(nm._jit_energy(jnp.asarray(up), data, glob))
        Em = float(nm._jit_energy(jnp.asarray(um), data, glob))
        fd = (Ep - Em) / (2 * h)
        assert abs(fd - g[b, dax]) / scale < 5e-5


def test_cloth_rests_on_rigid_box():
    sim = Simulation(make_settings("cloth_on_box"))
    contact = sim.interactions.contact
    contact.global_params.default_contact_thickness = 0.002
    contact.global_params.min_contact_stiffness = 1e5
    contact.contact_stiffness = 1e5
    box = sim.presets.rigidbodies.add_box("", 1.0, (0.2, 0.2, 0.1))
    sim.rigidbodies.add_constraint_fix(box.rigidbody)
    p = SurfaceParams.Cotton_Fabric()
    cloth = sim.presets.deformables.add_surface_grid("", (0.12, 0.12), (4, 4), p)
    pts = cloth.point_set
    x = pts.get_positions()
    x[:, 2] += 0.08  # above the box top (z=0.05)
    sim._dyn._x0_host[pts.get_begin():pts.get_begin() + pts.size()] = x
    ok = sim.run(duration=0.5)
    assert ok
    xf = pts.get_positions()
    assert np.all(np.isfinite(xf))
    # cloth must rest on top of the box, not fall through
    assert np.min(xf[:, 2]) > 0.05 - 0.002, f"cloth fell through: min z={np.min(xf[:, 2])}"
    # and should have actually landed (dropped from 0.08)
    assert np.max(xf[:, 2]) < 0.075


def test_rigid_box_drops_on_fixed_box():
    sim = Simulation(make_settings("rr_drop"))
    contact = sim.interactions.contact
    contact.global_params.default_contact_thickness = 0.002
    contact.global_params.min_contact_stiffness = 1e5
    contact.contact_stiffness = 1e5
    floor = sim.presets.rigidbodies.add_box("", 10.0, (0.5, 0.5, 0.1))
    sim.rigidbodies.add_constraint_fix(floor.rigidbody)
    box = sim.presets.rigidbodies.add_box("", 1.0, (0.1, 0.1, 0.1))
    box.rigidbody.set_translation([0.0, 0.0, 0.18])
    ok = sim.run(duration=0.5)
    assert ok
    t = box.rigidbody.get_translation()
    # resting height: floor top 0.05 + half box 0.05 + gap ~ thicknesses
    assert 0.09 < t[2] < 0.12, f"unexpected rest height {t[2]}"


def test_friction_stick_on_incline():
    """High-friction box on a tilted plane sticks; frictionless slides."""
    def run(mu):
        sim = Simulation(make_settings("incline", dt=1 / 100))
        contact = sim.interactions.contact
        contact.global_params.default_contact_thickness = 0.002
        contact.global_params.min_contact_stiffness = 1e5
        contact.global_params.friction_stick_slide_threshold = 0.01
        contact.contact_stiffness = 1e5
        ramp = sim.presets.rigidbodies.add_box("", 10.0, (0.6, 0.6, 0.05))
        ramp.rigidbody.add_rotation(15.0, [0, 1, 0])
        sim.rigidbodies.add_constraint_fix(ramp.rigidbody)
        box = sim.presets.rigidbodies.add_box("", 1.0, (0.08, 0.08, 0.08))
        # place on the ramp surface
        from stark_tpu import maths

        R = maths.axis_angle_rotation(np.deg2rad(15.0), [0, 1, 0])
        box.rigidbody.set_rotation(R=R)
        box.rigidbody.set_translation(R @ np.array([0.0, 0.0, 0.025 + 0.04 + 0.003]))
        if mu > 0:
            box.contact.set_friction(ramp.contact, mu)
        sim.run(duration=0.4)
        return box.rigidbody.get_translation()

    t_stick = run(0.8)
    t_slide = run(0.0)
    # frictionless box slides substantially further down the incline
    assert t_slide[0] - t_stick[0] > 0.05, (t_stick, t_slide)
    # high-friction box only creeps (C0 friction allows sub-epsv drift)
    assert abs(t_stick[0]) < 0.05, t_stick
