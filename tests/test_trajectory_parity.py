"""Golden-trajectory parity against the reference C++ build.

The committed golden (tests/golden/hanging_cloth_16.txt.gz) holds 30 steps of
f64 per-vertex positions produced by the reference's public API via
tools/parity/ref_dump.cpp (scene mirrors /root/reference/examples/main.cpp:
41-74 hanging_cloth at 16x16, fixed dt=1/30, adaptive stepping off, contact
off, two prescribed corners at stiffness 1e6). This is BASELINE.md's
correctness oracle: reproduce reference trajectories to solver tolerance.

The run is f64 end-to-end (the reference is all-double); the solve is an
unconstrained-in-path optimization of the same incremental potential, so
per-step minimizers agree to the Newton residual tolerance and deviations
accumulate only through the dissipative settling dynamics.
"""
import gzip
import math
import os

import numpy as np
import pytest

from stark_tpu import Settings, Simulation
from stark_tpu.models.deformables.energies import PrescribedPositionsParams
from stark_tpu.presets.presets import SurfaceParams

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "hanging_cloth_16.txt.gz")


def load_golden(path):
    steps = []
    with gzip.open(path, "rt") as f:
        cur = None
        for line in f:
            line = line.strip()
            if not line:
                continue
            if line.startswith("step"):
                cur = []
                steps.append(cur)
            else:
                cur.append([float(v) for v in line.split()])
    return [np.asarray(s) for s in steps]


@pytest.mark.slow
def test_hanging_cloth_16_matches_reference():
    golden = load_golden(GOLDEN)
    n_steps = len(golden)
    assert n_steps == 30

    s = Settings()
    s.output.simulation_name = "parity_hanging_cloth"
    s.output.enable_output = False
    s.output.enable_frame_writes = False
    s.device.dtype = "float64"
    s.simulation.max_time_step_size = 1.0 / 30.0
    s.simulation.use_adaptive_time_step = False
    s.simulation.init_frictional_contact = False
    sim = Simulation(s)

    n, d = 16, 1.0
    hd = d / 2.0
    H = sim.presets.deformables.add_surface_grid(
        "cloth", (d, d), (n, n), SurfaceParams.Cotton_Fabric())
    bc = PrescribedPositionsParams().set_stiffness(1e6)
    sim.deformables.prescribed_positions.add_inside_aabb(
        H.point_set, (hd, hd, 0.0), (0.001, 0.001, 0.001), bc)
    sim.deformables.prescribed_positions.add_inside_aabb(
        H.point_set, (-hd, hd, 0.0), (0.001, 0.001, 0.001), bc)

    n_verts = (n + 1) * (n + 1)
    assert golden[0].shape == (n_verts, 3)

    worst = 0.0
    for step in range(n_steps):
        assert sim.run_one_time_step()
        x = np.asarray(H.point_set.get_positions())
        dev = float(np.max(np.linalg.norm(x - golden[step], axis=1)))
        worst = max(worst, dev)
        # the deviation bound is step-accumulated: per-step minimizers agree
        # to the f64 Newton tolerance, trajectory drift compounds through
        # the free-fall/settling dynamics
        assert dev < 2e-3, f"step {step}: max vertex deviation {dev:.3e}"
    # tight bound on the whole-trajectory deviation
    assert worst < 2e-3
