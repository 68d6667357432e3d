"""Port of the reference rb_constraints suite — the correctness oracle.

Reference: /root/reference/tests/rb_constraints.cpp:16-277. Each test builds a
tiny rigid scene, applies a randomized perturbation force/torque, runs to
steady state (3 s at dt = 2 ms, gravity off, DirectLLT), then asserts the
constraint's analytic force balance: violation within tolerance and the
reconstructed constraint force within 1e-3 relative of the perturbation.
"""
import numpy as np
import pytest

from stark_tpu import Settings, Simulation
from stark_tpu.core.settings import LinearSolver
from stark_tpu.models.rigidbodies.inertia_tensors import inertia_tensor_box

_rng = np.random.default_rng(1234)
MASS = float(_rng.uniform(0.0, 100.0))
PERTURBATION = float(_rng.uniform(0.0, 100.0)) + 10.0


def make_settings(name):
    s = Settings()
    s.output.simulation_name = name
    s.output.enable_output = False
    s.output.enable_frame_writes = False
    s.execution.end_simulation_time = 3.0
    s.simulation.gravity = (0.0, 0.0, 0.0)
    s.simulation.init_frictional_contact = False
    s.simulation.max_time_step_size = 0.002
    s.newton.linear_solver = LinearSolver.DirectLLT
    s.newton.residual_tolerance_abs = 1e-6
    s.newton.step_tolerance = 0.0
    return s


def _box(sim):
    return sim.rigidbodies.add(MASS, inertia_tensor_box(MASS, (0.1, 0.1, 0.1)))


def test_inertia():
    s = make_settings("inertia")
    s.simulation.gravity = (PERTURBATION, 0.0, 0.0)
    sim = Simulation(s)
    box0 = _box(sim)
    constraint = sim.rigidbodies.add_constraint_global_point(box0, box0.get_translation())
    sim.run()
    C, f = constraint.get_violation_in_m_and_force()
    assert abs(C) < constraint.get_tolerance_in_m()
    assert abs(f - PERTURBATION * MASS) / (PERTURBATION * MASS) < 1e-3


def test_global_point():
    sim = Simulation(make_settings("global_point"))
    box0 = _box(sim)
    constraint = sim.rigidbodies.add_constraint_global_point(box0, box0.get_translation())
    box0.add_force_at_centroid([PERTURBATION, 0, 0])
    sim.run()
    C, f = constraint.get_violation_in_m_and_force()
    assert abs(C) < constraint.get_tolerance_in_m()
    assert abs(f - PERTURBATION) / PERTURBATION < 1e-3


def test_global_direction():
    sim = Simulation(make_settings("global_direction"))
    box0 = _box(sim)
    constraint = sim.rigidbodies.add_constraint_global_direction(box0, [0.0, 0.0, 1.0])
    box0.add_torque([PERTURBATION, 0, 0])
    sim.run()
    C, t = constraint.get_violation_in_deg_and_torque()
    assert abs(C) < constraint.get_tolerance_in_deg()
    assert abs(t - PERTURBATION) / PERTURBATION < 1e-3


def test_point():
    sim = Simulation(make_settings("point"))
    box0 = _box(sim)
    sim.rigidbodies.add_constraint_fix(box0)
    box1 = _box(sim).set_translation([0.1, 0.0, 0.0])
    constraint = sim.rigidbodies.add_constraint_point(box0, box1, [0.05, 0.0, 0.0])
    box1.add_force_at_centroid([PERTURBATION, 0, 0])
    sim.run()
    C, f = constraint.get_violation_in_m_and_force()
    assert abs(C) < constraint.get_tolerance_in_m()
    assert abs(f - PERTURBATION) / PERTURBATION < 1e-3


def test_point_on_axis():
    sim = Simulation(make_settings("point_on_axis"))
    box0 = _box(sim)
    sim.rigidbodies.add_constraint_fix(box0)
    box1 = _box(sim).set_translation([0.1, 0.0, 0.0])
    constraint = sim.rigidbodies.add_constraint_point_on_axis(
        box0, box1, [0.0, 0.0, 0.0], [0.0, 0.0, 1.0])
    box1.add_force_at_centroid([PERTURBATION, 0, 0])
    sim.run()
    C, f = constraint.get_violation_in_m_and_force()
    assert abs(C) < constraint.get_tolerance_in_m()
    assert abs(f - PERTURBATION) / PERTURBATION < 1e-3


def test_distance():
    sim = Simulation(make_settings("distance"))
    box0 = _box(sim)
    sim.rigidbodies.add_constraint_fix(box0)
    box1 = _box(sim).set_translation([1.0, 0.0, 0.0])
    constraint = sim.rigidbodies.add_constraint_distance(
        box0, box1, box0.get_translation(), box1.get_translation())
    box1.add_force_at_centroid([PERTURBATION, 0, 0])
    sim.run()
    C, f = constraint.get_signed_violation_in_m_and_force()
    assert abs(C) < constraint.get_tolerance_in_m()
    assert abs(f - (-PERTURBATION)) / PERTURBATION < 1e-3


def test_distance_limits_max():
    sim = Simulation(make_settings("distance_limits_max"))
    box0 = _box(sim)
    sim.rigidbodies.add_constraint_fix(box0)
    box1 = _box(sim).set_translation([1.0, 0.0, 0.0])
    constraint = sim.rigidbodies.add_constraint_distance_limits(
        box0, box1, box0.get_translation(), box1.get_translation(), 0.99, 1.01)
    box1.add_force_at_centroid([PERTURBATION, 0, 0])
    sim.run()
    C, f = constraint.get_signed_violation_in_m_and_force()
    assert abs(C) < constraint.get_tolerance_in_m()
    assert abs(f - (-PERTURBATION)) / PERTURBATION < 1e-3


def test_distance_limits_min():
    sim = Simulation(make_settings("distance_limits_min"))
    box0 = _box(sim)
    sim.rigidbodies.add_constraint_fix(box0)
    box1 = _box(sim).set_translation([1.0, 0.0, 0.0])
    constraint = sim.rigidbodies.add_constraint_distance_limits(
        box0, box1, box0.get_translation(), box1.get_translation(), 0.99, 1.01)
    box1.add_force_at_centroid([-PERTURBATION, 0, 0])
    sim.run()
    C, f = constraint.get_signed_violation_in_m_and_force()
    assert abs(C) < constraint.get_tolerance_in_m()
    assert abs(f - PERTURBATION) / PERTURBATION < 1e-3


def test_direction():
    sim = Simulation(make_settings("direction"))
    box0 = _box(sim)
    sim.rigidbodies.add_constraint_fix(box0)
    box1 = _box(sim).set_translation([0.0, 0.0, 0.1])
    constraint = sim.rigidbodies.add_constraint_direction(box0, box1, [0.0, 0.0, 1.0])
    box1.add_torque([PERTURBATION, 0, 0])
    sim.run()
    C, t = constraint.get_violation_in_deg_and_torque()
    assert abs(C) < constraint.get_tolerance_in_deg()
    assert abs(t - PERTURBATION) / PERTURBATION < 1e-3


def test_angle_limit():
    sim = Simulation(make_settings("angle_limit"))
    box0 = _box(sim)
    sim.rigidbodies.add_constraint_fix(box0)
    box1 = _box(sim).set_translation([0.0, 0.0, 0.1])
    constraint = sim.rigidbodies.add_constraint_angle_limit(
        box0, box1, [0.0, 0.0, 1.0], 25.0)
    box1.add_torque([PERTURBATION, 0, 0])
    sim.run()
    C, t = constraint.get_violation_in_deg_and_torque()
    assert abs(C) < constraint.get_tolerance_in_deg()
    assert abs(t - PERTURBATION) / PERTURBATION < 1e-3


def test_spring():
    sim = Simulation(make_settings("spring"))
    stiffness = 1000.0
    perturbation = 1.0
    damping = 1.0
    box0 = _box(sim)
    sim.rigidbodies.add_constraint_fix(box0)
    box1 = _box(sim).set_translation([0.2, 0.0, 0.0])
    constraint = sim.rigidbodies.add_constraint_spring(
        box0, box1, box0.get_translation(), box1.get_translation(), stiffness, damping)
    box1.add_force_at_centroid([perturbation, 0, 0])
    sim.run()
    dC, df = constraint.get_signed_damper_velocity_and_force()
    assert abs(-dC * damping - df) < 1e-3
    C, f = constraint.get_signed_spring_displacement_in_m_and_force()
    assert abs(-C * stiffness - f) / max(abs(f), 1e-12) < 1e-3


def test_linear_velocity():
    sim = Simulation(make_settings("linear_velocity"))
    max_force = 50.0
    target_v = 3.7
    delay = 0.01
    box0 = _box(sim)
    sim.rigidbodies.add_constraint_fix(box0)
    box1 = _box(sim).set_translation([0.1, 0.0, 0.0])
    ball_joint = sim.rigidbodies.add_constraint_point(box0, box1, [0.05, 0.0, 0.0])
    constraint = sim.rigidbodies.add_constraint_linear_velocity(
        box0, box1, [1.0, 0.0, 0.0], target_v, max_force, delay)
    sim.run()
    bC, bf = ball_joint.get_violation_in_m_and_force()
    C, f = constraint.get_signed_velocity_violation_and_force()
    assert abs(f - (-bf)) / max(abs(bf), 1e-12) < 1e-3
    assert abs(bf - max_force) / max_force < 1e-3


def test_angular_velocity():
    sim = Simulation(make_settings("angular_velocity"))
    max_torque = 10.0
    perturbation = 1.7
    delay = 0.01
    box0 = _box(sim)
    sim.rigidbodies.add_constraint_fix(box0)
    box1 = _box(sim).set_translation([0.1, 0.0, 0.0])
    attachment = sim.rigidbodies.add_constraint_attachment(box0, box1)
    constraint = sim.rigidbodies.add_constraint_angular_velocity(
        box0, box1, [1.0, 0.0, 0.0], perturbation, max_torque, delay)
    sim.run()
    bC, bf = attachment.get_z_lock().get_violation_in_deg_and_torque()
    C, f = constraint.get_signed_angular_velocity_violation_in_deg_per_s_and_torque()
    assert abs(f - (-bf)) / max(abs(bf), 1e-12) < 1e-3
    assert abs(bf - max_torque) / max_torque < 1e-3
