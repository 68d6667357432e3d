"""Coverage of the non-default solver configurations: the four projection
modes, the Log barrier, C1 friction, and the staged-vs-fused equivalence."""
import os

import numpy as np
import pytest

from stark_tpu import Settings, Simulation
from stark_tpu.core.settings import LinearSolver, ProjectionToPD
from stark_tpu.models.deformables.energies import PrescribedPositionsParams
from stark_tpu.presets.presets import SurfaceParams


def make_settings(name, mode=None):
    s = Settings()
    s.output.simulation_name = name
    s.output.enable_output = False
    s.output.enable_frame_writes = False
    s.simulation.init_frictional_contact = False
    s.simulation.max_time_step_size = 1 / 60
    if mode is not None:
        s.newton.projection_mode = mode
    return s


def _run_cloth(settings, steps=12):
    sim = Simulation(settings)
    h = sim.presets.deformables.add_surface_grid("", (0.2, 0.2), (4, 4),
                                                 SurfaceParams.Cotton_Fabric())
    sim.deformables.prescribed_positions.add(h.point_set, [0, 4],
                                             PrescribedPositionsParams())
    for _ in range(steps):
        assert sim.run_one_time_step()
    return h.point_set.get_positions(), sim


@pytest.mark.parametrize("mode", [ProjectionToPD.ProjectedNewton,
                                  ProjectionToPD.Newton,
                                  ProjectionToPD.ProjectOnDemand,
                                  ProjectionToPD.Progressive])
def test_projection_modes(mode):
    x, _ = _run_cloth(make_settings(f"mode_{mode.name}", mode))
    assert np.all(np.isfinite(x))
    assert np.mean(x[:, 2]) < -0.002  # sagged


def test_staged_matches_fused():
    x_fused, _ = _run_cloth(make_settings("fused"))
    os.environ["STARK_TPU_NO_FUSED"] = "1"
    try:
        x_staged, _ = _run_cloth(make_settings("staged"))
    finally:
        del os.environ["STARK_TPU_NO_FUSED"]
    assert np.max(np.abs(x_fused - x_staged)) < 1e-6, \
        "fused and staged solvers diverged"


def test_log_barrier_and_c1_friction():
    from stark_tpu.models.interactions.contact import IPCBarrierType, IPCFrictionType

    s = make_settings("log_barrier")
    s.simulation.init_frictional_contact = True
    sim = Simulation(s)
    contact = sim.interactions.contact
    contact.ipc_barrier_type = IPCBarrierType.Log
    contact.ipc_friction_type = IPCFrictionType.C1
    contact.global_params.default_contact_thickness = 0.002
    contact.global_params.min_contact_stiffness = 1e4
    contact.contact_stiffness = 1e4
    box = sim.presets.rigidbodies.add_box("", 1.0, (0.2, 0.2, 0.1))
    sim.rigidbodies.add_constraint_fix(box.rigidbody)
    cloth = sim.presets.deformables.add_surface_grid("", (0.12, 0.12), (3, 3),
                                                     SurfaceParams.Cotton_Fabric())
    cloth.contact.set_friction(box.contact, 0.3)
    pts = cloth.point_set
    x = pts.get_positions()
    x[:, 2] += 0.08
    sim._dyn._x0_host[pts.get_begin():pts.get_begin() + pts.size()] = x
    assert sim.run(duration=0.3)
    xf = pts.get_positions()
    assert np.all(np.isfinite(xf))
    assert np.min(xf[:, 2]) > 0.05 - 0.002
