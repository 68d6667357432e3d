"""End-to-end Newton solve milestones: hanging cloth, falling box, rod.

Mirrors the reference's hanging-cloth hello world (pystark test_sim.py and
examples) as physics sanity: pinned corners, gravity sag, stable dynamics.
"""
import numpy as np
import pytest

from stark_tpu import Settings, Simulation
from stark_tpu.models.deformables.energies import PrescribedPositionsParams
from stark_tpu.presets.presets import LineParams, SurfaceParams, VolumeParams


def make_settings(name="e2e", dt=1 / 60):
    s = Settings()
    s.output.simulation_name = name
    s.output.enable_output = False
    s.output.enable_frame_writes = False
    s.simulation.init_frictional_contact = False
    s.simulation.max_time_step_size = dt
    s.newton.residual_tolerance_abs = 1e-6
    return s


def test_hanging_cloth():
    sim = Simulation(make_settings("cloth"))
    p = SurfaceParams.Cotton_Fabric()
    h = sim.presets.deformables.add_surface_grid("", (0.3, 0.3), (6, 6), p)
    # pin the two corners at y = +0.15 (grid is in the XY plane, z=0)
    pos = h.point_set.get_positions()
    corners = [int(np.argmin(np.linalg.norm(pos - np.array([-0.15, 0.15, 0.0]), axis=1))),
               int(np.argmin(np.linalg.norm(pos - np.array([0.15, 0.15, 0.0]), axis=1)))]
    sim.deformables.prescribed_positions.add(h.point_set, corners,
                                             PrescribedPositionsParams())
    ok = sim.run(duration=0.5)
    assert ok
    x = h.point_set.get_positions()
    assert np.all(np.isfinite(x))
    # cloth must sag under gravity except at the pins
    free = np.setdiff1d(np.arange(len(x)), corners)
    assert np.mean(x[free, 2]) < -0.02
    # pinned corners stay
    assert np.linalg.norm(x[corners[0]] - pos[corners[0]]) < 2e-3
    # does not fall freely (strain holds it): lowest point well above free fall
    assert np.min(x[:, 2]) > -0.5 * 9.81 * 0.5 ** 2


def test_falling_soft_box_quasistatic_off():
    sim = Simulation(make_settings("box"))
    p = VolumeParams.Soft_Rubber()
    h = sim.presets.deformables.add_volume_grid("", (0.1, 0.1, 0.1), (2, 2, 2), p)
    t_end = 0.3
    ok = sim.run(duration=t_end)
    assert ok
    x = h.point_set.get_positions()
    # free fall: center should have dropped about 0.5*g*t^2 (first-order
    # integration accumulates slightly more)
    drop = -np.mean(x[:, 2])
    expect = 0.5 * 9.81 * sim.get_time() ** 2
    assert abs(drop - expect) < 0.25 * expect + 5e-3


def test_hanging_rod():
    sim = Simulation(make_settings("rod"))
    p = LineParams.Elastic_Rubberband()
    h = sim.presets.deformables.add_line_as_segments("", (0, 0, 0), (0, 0, -0.3), 10, p)
    sim.deformables.prescribed_positions.add(h.point_set, [0], PrescribedPositionsParams())
    ok = sim.run(duration=0.5)
    assert ok
    x = h.point_set.get_positions()
    assert np.all(np.isfinite(x))
    # rod stretches a bit under gravity but the strain limit keeps it bounded
    length = np.sum(np.linalg.norm(np.diff(x, axis=0), axis=1))
    assert 0.3 <= length < 0.45


def test_rigid_pendulum_energy_sane():
    from stark_tpu.models.rigidbodies.inertia_tensors import inertia_tensor_box

    sim = Simulation(make_settings("pendulum", dt=1 / 120))
    rbs = sim.rigidbodies
    anchor = rbs.add(1.0, inertia_tensor_box(1.0, 0.05))
    rbs.add_constraint_fix(anchor)
    bob = rbs.add(1.0, inertia_tensor_box(1.0, 0.05))
    bob.set_translation([0.2, 0.0, 0.0])
    rbs.add_constraint_point(anchor, bob, [0.0, 0.0, 0.0])
    ok = sim.run(duration=0.4)
    assert ok
    t = bob.get_translation()
    # bob swings down, stays on the 0.2 sphere around the anchor
    assert abs(np.linalg.norm(t) - 0.2) < 5e-3
    assert t[2] < -0.02
