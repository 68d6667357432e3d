"""Multi-device SPMD execution must reproduce the single-device trajectory.

conftest.py forces an 8-virtual-device CPU platform, so this runs the REAL
sharded path (settings.device.n_devices=8): static element tables are placed
with NamedSharding over the data axis and the fused solve compiles SPMD with
GSPMD-inserted collectives. The reference has no distributed analog (OpenMP
only, SURVEY §2.8) — the oracle is the single-device run.
"""
import numpy as np
import jax
import pytest

pytestmark = pytest.mark.slow


def _run(n_devices, steps=8):
    from stark_tpu import Settings, Simulation
    from stark_tpu.presets.presets import SurfaceParams
    from stark_tpu.models.interactions.contact import ContactGlobalParams

    s = Settings()
    s.output.enable_output = False
    s.output.enable_frame_writes = False
    s.device.dtype = "float64"
    s.device.n_devices = n_devices
    sim = Simulation(s)
    gp = ContactGlobalParams()
    gp.default_contact_thickness = 0.004
    sim.interactions.contact.set_global_params(gp)
    cloth = sim.presets.deformables.add_surface_grid(
        "cloth", (0.3, 0.3), (6, 6), SurfaceParams.Cotton_Fabric())
    box = sim.presets.rigidbodies.add_box("box", 1.0, 0.08)
    box.rigidbody.add_translation([0.0, 0.0, -0.041])
    sim.rigidbodies.add_constraint_fix(box.rigidbody)
    traj = []
    for _ in range(steps):
        assert sim.run_one_time_step()
        traj.append(np.asarray(cloth.point_set.get_positions()))
    return np.stack(traj), sim


def test_multidevice_matches_single_device():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    traj1, _ = _run(1)
    traj8, sim8 = _run(8)
    # verify the tables really are sharded, not replicated
    fd = next(iter(sim8._device_data.values()))
    shardings = {str(d) for d in fd["conn"].sharding.device_set}
    assert len(shardings) == 8, "static tables not spread over 8 devices"
    dev = np.max(np.abs(traj1 - traj8))
    # contact scene over 8 steps; f64 — only collective reduction order may
    # differ between shardings
    assert dev < 1e-8, f"multi-device trajectory deviates by {dev}"
