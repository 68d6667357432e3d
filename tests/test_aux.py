"""Auxiliary subsystems: checkpoint/resume, OBJ IO, multichip dryrun, events."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from stark_tpu import Settings, Simulation
from stark_tpu.presets.presets import SurfaceParams
from stark_tpu.models.deformables.energies import PrescribedPositionsParams
from stark_tpu.utils import checkpoint, obj


def make_settings(name="aux", dt=1 / 60):
    s = Settings()
    s.output.simulation_name = name
    s.output.enable_output = False
    s.output.enable_frame_writes = False
    s.simulation.init_frictional_contact = False
    s.simulation.max_time_step_size = dt
    return s


def _cloth_sim():
    sim = Simulation(make_settings())
    h = sim.presets.deformables.add_surface_grid("", (0.2, 0.2), (4, 4),
                                                 SurfaceParams.Cotton_Fabric())
    sim.deformables.prescribed_positions.add(h.point_set, [0, 4],
                                             PrescribedPositionsParams())
    return sim, h


def test_checkpoint_resume(tmp_path):
    sim, h = _cloth_sim()
    sim.run(duration=0.2)
    path = str(tmp_path / "ckpt.npz")
    checkpoint.save_state(sim, path)
    sim.run(duration=0.2)
    x_ref = h.point_set.get_positions()
    t_ref = sim.get_time()

    # resume from the checkpoint in a FRESH simulation and replay
    sim2, h2 = _cloth_sim()
    sim2.stark._initialize()  # freeze before loading device state
    checkpoint.load_state(sim2, path)
    sim2.run(duration=0.2)
    assert abs(sim2.get_time() - t_ref) < 1e-9
    x2 = h2.point_set.get_positions()
    assert np.max(np.abs(x2 - x_ref)) < 1e-8, "resumed trajectory diverged"


def test_obj_roundtrip(tmp_path):
    from stark_tpu.utils.mesh_generators import make_box

    V, T = make_box((0.1, 0.2, 0.3))
    p = str(tmp_path / "box.obj")
    obj.save_obj(p, V, T)
    meshes = obj.load_obj(p)
    assert len(meshes) == 1
    V2, T2 = meshes[0]
    assert V2.shape == V.shape and T2.shape == T.shape
    assert np.allclose(np.sort(V2, axis=0), np.sort(V, axis=0))


def test_multichip_dryrun():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_event_script():
    sim, h = _cloth_sim()
    fired = []
    sim.add_time_event(0.05, 0.15, lambda t: fired.append(t))
    sim.run(duration=0.25)
    assert fired, "time event never fired"
    assert all(0.05 <= t < 0.15 + 1e-6 for t in fired)
