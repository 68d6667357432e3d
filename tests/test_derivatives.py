"""Finite-difference verification of energy gradients and Hessians.

Mirrors the reference's SecondOrderCompiledGlobal::test_derivatives_with_FD
(SecondOrderCompiledGlobal.cpp:144-191): central differences of E against the
autodiff gradient, and of the gradient against the element Hessians, over all
DOFs of small scenes exercising every static energy family.
"""
import numpy as np
import pytest

import stark_tpu
from stark_tpu import Settings, Simulation
from stark_tpu.presets.presets import (LineParams, SurfaceParams, VolumeParams)


def make_settings(name="fd"):
    s = Settings()
    s.output.simulation_name = name
    s.output.enable_output = False
    s.output.enable_frame_writes = False
    s.simulation.init_frictional_contact = False
    s.simulation.max_time_step_size = 0.01
    return s


def fd_check(sim, seed=0, h=1e-6, tol=2e-5):
    stark = sim.stark
    stark.run_one_step.__self__  # noqa - ensure attr exists
    stark._initialize()
    stark.callbacks.run_before_time_step()
    nm = stark.newton
    data = nm.get_data()
    glob = nm.get_glob()
    rng = np.random.default_rng(seed)
    u = np.asarray(nm.get_dofs())
    u = u + 0.1 * rng.standard_normal(u.shape)
    import jax.numpy as jnp

    u_j = jnp.asarray(u)
    E, _Eabs, g, H = nm._jit_egh(u_j, data, glob)
    g = np.asarray(g)
    assert np.isfinite(float(E))
    assert np.all(np.isfinite(g))

    # FD gradient on a sample of dofs
    n_blocks = u.shape[0]
    idxs = rng.choice(n_blocks * 3, size=min(30, n_blocks * 3), replace=False)
    scale = max(1.0, np.max(np.abs(g)))
    for flat in idxs:
        b, d = divmod(int(flat), 3)
        up = u.copy(); up[b, d] += h
        um = u.copy(); um[b, d] -= h
        Ep = float(nm._jit_energy(jnp.asarray(up), data, glob))
        Em = float(nm._jit_energy(jnp.asarray(um), data, glob))
        fd = (Ep - Em) / (2 * h)
        assert abs(fd - g[b, d]) / scale < tol, \
            f"grad mismatch at block {b} dim {d}: fd={fd} ad={g[b, d]}"

    # FD Hessian-vector product against the element Hessian Hvp
    v = rng.standard_normal(u.shape)
    v /= np.linalg.norm(v)
    _, gp = nm._energy_grad(jnp.asarray(u + h * v), data, glob)
    _, gm = nm._energy_grad(jnp.asarray(u - h * v), data, glob)
    fd_hv = (np.asarray(gp) - np.asarray(gm)) / (2 * h)
    hv = np.asarray(nm._hvp(jnp.asarray(v), data, H))
    scale = max(1.0, np.max(np.abs(fd_hv)))
    assert np.max(np.abs(fd_hv - hv)) / scale < 5e-4, \
        f"Hvp mismatch: {np.max(np.abs(fd_hv - hv)) / scale}"


def test_fd_cloth_energies():
    """Triangle strain + discrete shells + lumped inertia + prescribed."""
    sim = Simulation(make_settings())
    p = SurfaceParams.Cotton_Fabric()
    p.bending.flat_rest_angle = False  # exercise the dihedral-angle energy
    p.strain.strain_limit = 0.05      # make the strain limit active sometimes
    h = sim.presets.deformables.add_surface_grid("", (0.4, 0.4), (3, 3), p)
    sim.deformables.prescribed_positions.add(h.point_set, [0, 3], __import__(
        "stark_tpu.models.deformables.energies", fromlist=["x"]).PrescribedPositionsParams())
    fd_check(sim)


def test_fd_cloth_flat_bending():
    sim = Simulation(make_settings())
    p = SurfaceParams.Cotton_Fabric()
    assert p.bending.flat_rest_angle
    sim.presets.deformables.add_surface_grid("", (0.4, 0.4), (3, 3), p)
    fd_check(sim)


def test_fd_volume_energies():
    sim = Simulation(make_settings())
    p = VolumeParams.Soft_Rubber()
    p.strain.strain_limit = 0.02
    p.strain.damping = 1.0
    sim.presets.deformables.add_volume_grid("", (0.2, 0.2, 0.2), (2, 2, 2), p)
    fd_check(sim)


def test_fd_line_energies():
    sim = Simulation(make_settings())
    p = LineParams.Elastic_Rubberband()
    p.strain.strain_limit = 0.01
    sim.presets.deformables.add_line_as_segments("", (0, 0, 0), (0, 0, 1), 8, p)
    fd_check(sim)


def test_fd_rigid_constraints():
    from stark_tpu.models.rigidbodies.inertia_tensors import inertia_tensor_box

    sim = Simulation(make_settings())
    rbs = sim.rigidbodies
    b0 = rbs.add(1.0, inertia_tensor_box(1.0, 0.1))
    b1 = rbs.add(2.0, inertia_tensor_box(2.0, 0.1))
    b1.set_translation([0.3, 0, 0])
    b2 = rbs.add(1.5, inertia_tensor_box(1.5, 0.1))
    b2.set_translation([0.6, 0, 0])
    rbs.add_constraint_fix(b0)
    rbs.add_constraint_point(b0, b1, [0.15, 0, 0])
    rbs.add_constraint_hinge(b1, b2, [0.45, 0, 0], [0, 0, 1])
    rbs.add_constraint_distance(b0, b2, [0, 0, 0], [0.6, 0, 0])
    rbs.add_constraint_distance_limits(b0, b2, [0, 0, 0], [0.6, 0, 0], 0.5, 0.7)
    rbs.add_constraint_angle_limit(b1, b2, [0, 0, 1], 10.0)
    rbs.add_constraint_spring(b0, b2, [0, 0, 0], [0.6, 0, 0], 100.0, 1.0)
    rbs.add_constraint_linear_velocity(b0, b1, [1, 0, 0], 0.5, 10.0)
    rbs.add_constraint_angular_velocity(b1, b2, [0, 0, 1], 0.5, 10.0)
    rbs.add_constraint_point_on_axis(b0, b1, [0.0, 0, 0], [0, 0, 1])
    fd_check(sim, h=1e-6, tol=5e-5)


def test_fd_attachments():
    from stark_tpu.models.deformables.energies import LumpedInertiaParams
    from stark_tpu.models.rigidbodies.inertia_tensors import inertia_tensor_box

    sim = Simulation(make_settings())
    p = SurfaceParams.Cotton_Fabric()
    h = sim.presets.deformables.add_surface_grid("", (0.2, 0.2), (2, 2), p)
    rb = sim.rigidbodies.add(1.0, inertia_tensor_box(1.0, 0.1))
    sim.interactions.attachments.add_rb_point(rb, h.point_set, [0, 1])
    fd_check(sim)
