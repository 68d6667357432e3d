"""Ports of the reference example scenes (reference: examples/main.cpp).

Each scene builds through the same public API surface the reference exposes
(Simulation + presets + handlers + events). Run:

    python examples/scenes.py <scene_name> [duration]

Scene list mirrors examples/main.cpp:723-756.
"""
from __future__ import annotations

import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from stark_tpu import Settings, Simulation  # noqa: E402
from stark_tpu.maths import blend  # noqa: E402
from stark_tpu.models.deformables.energies import (  # noqa: E402
    DiscreteShellsParams, LumpedInertiaParams, PrescribedPositionsParams,
    SegmentStrainParams, TetStrainParams, TriangleStrainParams)
from stark_tpu.models.interactions.attachments import AttachmentParams  # noqa: E402
from stark_tpu.models.interactions.contact import (ContactGlobalParams,  # noqa: E402
                                                   ContactParams)
from stark_tpu.presets.presets import (LineParams, SurfaceParams,  # noqa: E402
                                       VolumeParams)
from stark_tpu.utils import mesh_generators as gen  # noqa: E402
from stark_tpu.utils import mesh_utils as mu  # noqa: E402

OUTPUT_PATH = os.environ.get("STARK_TPU_OUTPUT", "/tmp/stark_tpu_examples")


def base_settings(name, end_time=5.0):
    s = Settings()
    s.output.simulation_name = name
    s.output.output_directory = os.path.join(OUTPUT_PATH, name)
    s.execution.end_simulation_time = end_time
    return s


def hanging_net(duration=None):
    # examples/main.cpp:12-39
    s = base_settings("hanging_net")
    s.simulation.init_frictional_contact = False
    sim = Simulation(s)
    n, d = 20, 1.0
    V, T = gen.generate_triangle_grid((0.0, 0.0), (d, d), (n, n))
    E = mu.find_edges_from_simplices(T, len(V))
    H = sim.presets.deformables.add_line("segments", V, E, LineParams.Elastic_Rubberband())
    sim.deformables.prescribed_positions.add_outside_aabb(
        H.point_set, (0, 0, 0), (d - 0.001, d - 0.001, d - 0.001), PrescribedPositionsParams())
    sim.run(duration or math.inf)
    return sim


def hanging_cloth(duration=None):
    # examples/main.cpp:41-74
    s = base_settings("hanging_cloth")
    s.simulation.init_frictional_contact = False
    sim = Simulation(s)
    n, d = 32, 1.0
    hd = d / 2
    H = sim.presets.deformables.add_surface_grid("cloth", (d, d), (n, n),
                                                 SurfaceParams.Cotton_Fabric())
    bc = PrescribedPositionsParams().set_stiffness(1e6)
    sim.deformables.prescribed_positions.add_inside_aabb(
        H.point_set, (hd, hd, 0.0), (0.001, 0.001, 0.001), bc)
    sim.deformables.prescribed_positions.add_inside_aabb(
        H.point_set, (-hd, hd, 0.0), (0.001, 0.001, 0.001), bc)
    sim.run(duration or math.inf)
    return sim


def hanging_deformable_box(duration=None):
    # examples/main.cpp:76-107
    s = base_settings("hanging_deformable_box")
    s.simulation.init_frictional_contact = False
    sim = Simulation(s)
    n, d = 10, 0.5
    hd = d / 2
    mat = VolumeParams.Soft_Rubber()
    mat.strain.youngs_modulus = 1e4
    H = sim.presets.deformables.add_volume_grid("box", (d, d, d), (n, n, n), mat)
    bc = PrescribedPositionsParams().set_stiffness(1e7)
    sim.deformables.prescribed_positions.add_inside_aabb(
        H.point_set, (hd, hd, hd), (0.001, 0.001, 0.001), bc)
    sim.deformables.prescribed_positions.add_inside_aabb(
        H.point_set, (-hd, hd, hd), (0.001, 0.001, 0.001), bc)
    sim.run(duration or math.inf)
    return sim


def hanging_box_with_composite_material(duration=None):
    # examples/main.cpp:109-190 — individual energies instead of presets
    s = base_settings("hanging_box_with_composite_material", 8.0)
    s.simulation.init_frictional_contact = False
    sim = Simulation(s)
    n, d = 10, 0.2
    hd = d / 2
    vertices, tets = gen.generate_tet_grid((0, 0, 0), (d, d, d), (n, n, n))
    triangles, tri_tet_map = mu.find_surface(vertices, tets)
    tri_vertices = mu.gather(vertices, tri_tet_map)
    tris_in_tet = mu.apply_map(triangles, tri_tet_map)
    sharp_edges, edge_tri_map = mu.find_sharp_edges(tri_vertices, triangles, 30.0)
    edge_tet_map = mu.gather(tri_tet_map, edge_tri_map)
    edges_in_tet = mu.apply_map(sharp_edges, edge_tet_map)

    nodeset = sim.deformables.point_sets.add(vertices)
    nodeset.add_rotation(-90.0, (1, 0, 0))

    defo = sim.deformables
    defo.lumped_inertia.add(nodeset, tets,
                            LumpedInertiaParams().set_density(1000.0).set_damping(0.5))
    defo.tet_strain.add(nodeset, tets, TetStrainParams().set_youngs_modulus(1e3))
    defo.segment_strain.add(nodeset, edges_in_tet,
                            SegmentStrainParams().set_section_radius(5e-3)
                            .set_youngs_modulus(5e5))
    defo.triangle_strain.add(nodeset, tris_in_tet,
                             TriangleStrainParams().set_youngs_modulus(1e4)
                             .set_strain_limit(0.2).set_strain_limit_stiffness(100.0))
    defo.discrete_shells.add(nodeset, tris_in_tet,
                             DiscreteShellsParams().set_stiffness(2e-3)
                             .set_flat_rest_angle(True))
    bc = PrescribedPositionsParams().set_stiffness(1e7).set_tolerance(1e-3)
    defo.prescribed_positions.add_inside_aabb(nodeset, (hd, hd, hd), (0.001,) * 3, bc)
    defo.prescribed_positions.add_inside_aabb(nodeset, (-hd, hd, hd), (0.001,) * 3, bc)

    defo.output.add_tet_mesh("tets", nodeset, tets)
    defo.output.add_triangle_mesh("triangles", nodeset, triangles, tri_tet_map)
    defo.output.add_segment_mesh("segments", nodeset, sharp_edges, edge_tet_map)
    defo.output.add_point_set("points", nodeset)
    sim.run(duration or math.inf)
    return sim


def quasistatic_column_extrusion(duration=None, refinement=8):
    # examples/main.cpp:191-266
    dur = 1.0
    extrusion_factor = 5.0
    dt = dur * 0.99999
    size = (1.0, 1.0, 0.5)
    s = base_settings("quasistatic_column_extrusion", dur)
    s.output.fps = int(1.0 / dt)
    s.simulation.gravity = (0.0, 0.0, 0.0)
    s.simulation.max_time_step_size = dt
    s.newton.project_to_pd_use_mirroring = True
    s.newton.step_tolerance = 0.001 / dt
    s.newton.step_cap = 0.5 / dt
    s.simulation.init_frictional_contact = False
    sim = Simulation(s)

    n = refinement
    V, T = gen.generate_tet_grid((0, 0, 0), size, (n, n, int(round(extrusion_factor * n / 5))))
    mat = VolumeParams.Soft_Rubber()
    mat.strain.elasticity_only = True
    mat.inertia.quasistatic = True
    mat.strain.poissons_ratio = 0.49
    mat.strain.youngs_modulus = 1e8
    H = sim.presets.deformables.add_volume("block", V, T, mat)
    bc = PrescribedPositionsParams().set_stiffness(1e10)
    sim.deformables.prescribed_positions.add_inside_aabb(
        H.point_set, (0, 0, -size[2] / 2), (10, 10, 0.001), bc)
    top = sim.deformables.prescribed_positions.add_inside_aabb(
        H.point_set, (0, 0, size[2] / 2), (10, 10, 0.001), bc)

    def extrude(t):
        max_disp = (extrusion_factor - 1) * size[2]
        top.set_transformation((0.0, 0.0, max_disp / dur * t), R=np.eye(3))

    sim.add_time_event(0, dur, extrude)
    sim.run(duration or math.inf)
    return sim


def attachments(duration=None):
    # examples/main.cpp:268-313
    s = base_settings("attachments")
    s.simulation.init_frictional_contact = False
    sim = Simulation(s)
    n, d = 20, 1.0
    hd, gap = d / 2, 0.001
    params = SurfaceParams.Cotton_Fabric()
    H1 = sim.presets.deformables.add_surface_grid("A", (d, d), (n, n), params)
    H2 = sim.presets.deformables.add_surface_grid("B", (d, d), (n, n), params)
    H2.point_set.add_rotation(45.0, (0, 0, 1))
    H2.point_set.add_displacement((d, 0.0, gap))

    bs = 0.25
    box_V, box_T = gen.make_box(bs)
    box = sim.presets.rigidbodies.add_box("box", 0.1, bs)
    box.rigidbody.add_translation((1.7, 0.0, 0.5 * bs + 2.0 * gap))

    T1 = H1.connectivity
    sim.interactions.attachments.add_by_distance(
        H2.point_set, H1.point_set, list(range(H2.point_set.size())), T1, 2.0 * gap,
        AttachmentParams().set_tolerance(0.01))
    sim.interactions.attachments.add_by_distance(
        box.rigidbody, H2.point_set, box_V, box_T,
        list(range(H2.point_set.size())), 4.0 * gap,
        AttachmentParams().set_tolerance(0.01))

    bc = PrescribedPositionsParams()
    sim.deformables.prescribed_positions.add_inside_aabb(
        H1.point_set, (-hd, -hd, 0.0), (0.001,) * 3, bc)
    sim.deformables.prescribed_positions.add_inside_aabb(
        H1.point_set, (-hd, hd, 0.0), (0.001,) * 3, bc)
    sim.run(duration or math.inf)
    return sim


def deformable_and_rigid_collisions(duration=None):
    # examples/main.cpp:314-369
    s = base_settings("deformable_and_rigid_collisions")
    sim = Simulation(s)
    sim.interactions.contact.set_global_params(
        ContactGlobalParams().set_friction_stick_slide_threshold(0.01)
        .set_min_contact_stiffness(1e8).set_default_contact_thickness(0.001))
    n1, d1 = 5, 0.25
    n2, d2 = 2, 0.1
    gap = 0.01
    rubber = VolumeParams.Soft_Rubber()
    rubber.contact.contact_thickness = 0.001 * d1
    rubber.inertia.density = 1e3
    H1 = sim.presets.deformables.add_volume_grid("boxes", (d1,) * 3, (n1,) * 3, rubber)
    H1.point_set.add_displacement((0, 0, 0.5 * d1 + gap))
    rubber2 = VolumeParams.Soft_Rubber()
    rubber2.contact.contact_thickness = 0.001 * d2
    rubber2.inertia.density = 1e4
    rubber2.strain.youngs_modulus = 1e5
    H2 = sim.presets.deformables.add_volume_grid("boxes", (d2,) * 3, (n2,) * 3, rubber2)
    H2.point_set.add_displacement((0.13 * d2, 0.07 * d2, d1 + 0.5 * d2 + 2 * gap))
    d3 = 2.0
    floor = sim.presets.rigidbodies.add_box(
        "floor", 1.0, (d3, d3, 0.05 * d3), ContactParams().set_contact_thickness(0.001 * d3))
    floor.rigidbody.set_translation((0, 0, -0.025 * d3))
    sim.rigidbodies.add_constraint_fix(floor.rigidbody)
    mu_c = 1.0
    c = sim.interactions.contact
    c.set_friction(floor.contact, H1.contact, mu_c)
    c.set_friction(floor.contact, H2.contact, mu_c)
    c.set_friction(H1.contact, H2.contact, mu_c)
    sim.run(duration or math.inf)
    return sim


def spinning_box_cloth(duration=None):
    # examples/main.cpp:371-414 (also bench.py's scene)
    s = base_settings("spinning_box_cloth", 10.0)
    sim = Simulation(s)
    gp = ContactGlobalParams()
    gp.default_contact_thickness = 0.002
    sim.interactions.contact.set_global_params(gp)
    cloth = sim.presets.deformables.add_surface_grid(
        "cloth", (0.4, 0.4), (32, 32), SurfaceParams.Cotton_Fabric())
    box = sim.presets.rigidbodies.add_box("box", 1.0, 0.08)
    box.rigidbody.add_translation((0.0, 0.0, -0.08))
    fix = sim.rigidbodies.add_constraint_fix(box.rigidbody)
    dur = duration or 10.0

    def spin(t):
        fix.set_transformation((0.0, 0.0, -0.08 - 0.1 * math.sin(t)),
                               angle_deg=90.0 * t, axis=(0.0, 0.0, 1.0))

    sim.add_time_event(0.0, dur, spin)
    sim.run(dur)
    return sim


def simple_grasp(duration=None):
    # examples/main.cpp:416-523 — rigid gripper pinching a deformable cube
    s = base_settings("simple_grasp", 7.0)
    s.simulation.gravity = (0.0, 0.0, 0.0)
    sim = Simulation(s)
    n, d = 5, 0.2
    hd, gap = d / 2, 0.02
    mass, gravity, pressure = 1.0, -10.0, 10.0
    mu_sticking, mu_sliding = 1.05, 0.95
    sim.interactions.contact.set_global_params(
        ContactGlobalParams().set_default_contact_thickness(0.001)
        .set_friction_stick_slide_threshold(0.001).set_min_contact_stiffness(1e7))

    obj_params = VolumeParams.Soft_Rubber()
    obj_params.inertia.density = mass / d ** 3
    obj_params.strain.elasticity_only = True
    obj_params.strain.youngs_modulus = 2e3
    obj = sim.presets.deformables.add_volume_grid("deformable", (d,) * 3, (n,) * 3, obj_params)

    hand = sim.presets.rigidbodies.add_box("hand", mass, (3 * d,) * 3)
    hand.rigidbody.set_translation((0.0, -(3 * hd + hd + gap), 0.0))
    fingers_size = (0.5 * d, 2 * d, 2 * d)
    left = sim.presets.rigidbodies.add_box("finger", mass, fingers_size)
    left.rigidbody.set_translation((-(hd + 0.5 * hd + gap), -gap, 0.0))
    right = sim.presets.rigidbodies.add_box("finger", mass, fingers_size)
    right.rigidbody.set_translation((hd + 0.5 * hd + gap, -gap, 0.0))

    c = sim.interactions.contact
    c.disable_collision(hand.contact, left.contact)
    c.disable_collision(hand.contact, right.contact)
    sim.rigidbodies.add_constraint_fix(hand.rigidbody)
    sim.rigidbodies.add_constraint_prismatic_press(
        hand.rigidbody, left.rigidbody, (0, 0, 0), (1, 0, 0), 1.0, 0.5 * pressure)
    sim.rigidbodies.add_constraint_prismatic_press(
        hand.rigidbody, right.rigidbody, (0, 0, 0), (1, 0, 0), -1.0, 0.5 * pressure)
    c.set_friction(left.contact, obj.contact, mu_sticking)
    c.set_friction(right.contact, obj.contact, mu_sticking)

    sim.add_time_event(2.0, 3.0, lambda t: sim.set_gravity(
        (0.0, 0.0, blend(0.0, gravity, 2.0, 3.0, t))))

    def reduce_friction(t):
        c.set_friction(left.contact, obj.contact, mu_sliding)
        c.set_friction(right.contact, obj.contact, mu_sliding)

    sim.add_time_event(5.0, 7.0, reduce_friction)
    sim.run(duration or math.inf)
    return sim


def twisting_cloth(duration=None):
    # examples/main.cpp:525-573
    s = base_settings("twisting_cloth", 5.0)
    s.simulation.gravity = (0.0, 0.0, 0.0)
    s.newton.step_tolerance = 0.001
    sim = Simulation(s)
    sim.interactions.contact.set_global_params(
        ContactGlobalParams().set_default_contact_thickness(0.001)
        .set_min_contact_stiffness(1e6))
    sdim, n = 0.5, 32
    material = SurfaceParams.Cotton_Fabric()
    material.strain.elasticity_only = True
    H = sim.presets.deformables.add_surface_grid("cloth", (sdim, sdim), (n, n), material)
    H.point_set.add_rotation(90.0, (1, 0, 0))
    H.contact.set_friction(H.contact, 1.0)
    bc = PrescribedPositionsParams()
    left = sim.deformables.prescribed_positions.add_inside_aabb(
        H.point_set, (-sdim / 2, 0, 0), (0.001, sdim, sdim), bc)
    right = sim.deformables.prescribed_positions.add_inside_aabb(
        H.point_set, (sdim / 2, 0, 0), (0.001, sdim, sdim), bc)
    dur = duration or 5.0
    w = 90.0
    sim.add_time_event(0, dur, lambda t: left.set_transformation(
        (0, 0, 0), angle_deg=w * t, axis=(1, 0, 0)))
    sim.add_time_event(0, dur, lambda t: right.set_transformation(
        (0, 0, 0), angle_deg=-w * t, axis=(1, 0, 0)))
    sim.run(dur)
    return sim


def magnetic_deformables_implicit(duration=None):
    # examples/main.cpp:575-722 — extending the framework with a CUSTOM
    # potential: two soft boxes with embedded dipoles attract implicitly.
    import jax.numpy as jnp

    from stark_tpu.solver.potential import FamilyData, PotentialFamily

    s = base_settings("magnetic_deformables", 4.0)
    s.simulation.gravity = (0.0, 0.0, 0.0)
    s.simulation.init_frictional_contact = True
    sim = Simulation(s)
    sim.interactions.contact.set_global_params(
        ContactGlobalParams().set_default_contact_thickness(0.002))
    n, d, gap = 3, 0.1, 0.06
    mat = VolumeParams.Soft_Rubber()
    H1 = sim.presets.deformables.add_volume_grid("m1", (d,) * 3, (n,) * 3, mat)
    H1.point_set.add_displacement((-(d + gap) / 2, 0, 0))
    H2 = sim.presets.deformables.add_volume_grid("m2", (d,) * 3, (n,) * 3, mat)
    H2.point_set.add_displacement(((d + gap) / 2, 0, 0))

    # custom magnetic point-pair energy: E = -c / (||xa - xb|| + eps)
    center1 = int(np.argmin(np.linalg.norm(
        H1.point_set.get_positions() - H1.point_set.get_positions().mean(0), axis=1)))
    center2 = int(np.argmin(np.linalg.norm(
        H2.point_set.get_positions() - H2.point_set.get_positions().mean(0), axis=1)))
    ga = int(H1.point_set.get_global_index(center1))
    gb = int(H2.point_set.get_global_index(center2))

    def magnet_energy(u_e, row, glob):
        dt = glob["dt"]
        xa = glob["x0"][row["na"]] + dt * u_e[0]
        xb = glob["x0"][row["nb"]] + dt * u_e[1]
        r = jnp.sqrt(jnp.sum((xa - xb) ** 2) + 1e-6)
        return -row["strength"] / r

    def provider():
        conn = np.asarray([[ga, gb]], dtype=np.int32)
        return FamilyData(conn, {"na": conn[:, 0], "nb": conn[:, 1],
                                 "strength": np.asarray([2e-3])})

    sim.stark.global_potential.add_potential(
        PotentialFamily("CustomMagneticDipole", 2, magnet_energy), provider)
    sim.run(duration or math.inf)
    return sim


SCENES = {f.__name__: f for f in [
    hanging_net, hanging_cloth, hanging_deformable_box,
    hanging_box_with_composite_material, quasistatic_column_extrusion,
    attachments, deformable_and_rigid_collisions, spinning_box_cloth,
    simple_grasp, twisting_cloth, magnetic_deformables_implicit]}


if __name__ == "__main__":
    name = sys.argv[1] if len(sys.argv) > 1 else "hanging_cloth"
    dur = float(sys.argv[2]) if len(sys.argv) > 2 else None
    if name not in SCENES:
        print("scenes:", ", ".join(SCENES))
        sys.exit(1)
    SCENES[name](dur)
