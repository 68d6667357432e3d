"""Spatial-hash broad phase equivalence vs the dense masked prefilter.

The grid (collision/broad_phase.py) must produce exactly the same exact-
distance pair sets as the dense O(N^2) stage 1 — candidates may differ
(both are conservative supersets), the post-narrow-phase pairs may not.
Reference behavior: tmcd octree vs bruteforce strategies agree
(BroadPhasePTEEBase.cpp:51-100, types.h BroadPhaseStrategy).
"""
import numpy as np
import pytest

pytestmark = pytest.mark.slow


def _build(broad_phase):
    import math
    from stark_tpu import Settings, Simulation
    from stark_tpu.presets.presets import SurfaceParams
    from stark_tpu.models.interactions.contact import ContactGlobalParams

    s = Settings()
    s.output.enable_output = False
    s.output.enable_frame_writes = False
    s.device.dtype = "float64"
    sim = Simulation(s)
    gp = ContactGlobalParams()
    gp.default_contact_thickness = 0.004
    sim.interactions.contact.set_global_params(gp)
    cloth = sim.presets.deformables.add_surface_grid(
        "cloth", (0.3, 0.3), (6, 6), SurfaceParams.Cotton_Fabric())
    box = sim.presets.rigidbodies.add_box("box", 1.0, 0.08)
    box.rigidbody.add_translation([0.0, 0.0, -0.041])
    sim.rigidbodies.add_constraint_fix(box.rigidbody)
    sim.interactions.contact.broad_phase = broad_phase
    # a couple of steps so the cloth approaches the box and pairs form
    for _ in range(6):
        assert sim.run_one_time_step()
    return sim


def _pair_sets(sim):
    eng = sim.interactions.contact._engine
    eng.refresh_contacts(sim.stark.dt)
    out = {}
    for name, fd in eng._contact_data.items():
        act = np.asarray(fd["rows"]["active"]) > 0.5
        conn = np.asarray(fd["conn"])[act]
        rows = set(map(tuple, conn.tolist()))
        out[name] = rows
    return out


def test_grid_matches_dense_pairs():
    sim_d = _build("dense")
    sim_g = _build("grid")
    pairs_d = _pair_sets(sim_d)
    pairs_g = _pair_sets(sim_g)
    assert pairs_d.keys() == pairs_g.keys()
    # trajectories must be identical too (same pair sets each iteration)
    for name in pairs_d:
        assert pairs_d[name] == pairs_g[name], (
            name, pairs_d[name] ^ pairs_g[name])
    xd = np.asarray(sim_d.stark._connector["get_dofs"]())
    xg = np.asarray(sim_g.stark._connector["get_dofs"]())
    assert np.max(np.abs(xd - xg)) < 1e-12


def test_grid_intersection_oracle_matches():
    sim_d = _build("dense")
    eng = sim_d.interactions.contact._engine
    dense_hit = eng.has_intersection(sim_d.stark.dt)
    sim_g = _build("grid")
    eng_g = sim_g.interactions.contact._engine
    grid_hit = eng_g.has_intersection(sim_g.stark.dt)
    assert dense_hit == grid_hit


def test_grid_candidates_unit():
    """Pure-function check: grid candidates are a superset of true sphere
    overlaps, with no duplicates."""
    import jax.numpy as jnp
    from stark_tpu.collision.broad_phase import grid_candidates, pick_cell_size

    rng = np.random.default_rng(3)
    Q, T = 200, 300
    qc = jnp.asarray(rng.uniform(-1, 1, (Q, 3)))
    qr = jnp.asarray(rng.uniform(0.01, 0.05, (Q,)))
    tc = jnp.asarray(rng.uniform(-1, 1, (T, 3)))
    tr = jnp.asarray(rng.uniform(0.01, 0.3, (T,)))  # mixed sizes incl. large
    h = pick_cell_size(qr, tr)
    tid, valid, max_cells, max_occ = grid_candidates(
        qc, qr, tc, tr, h, ins_slots=4096, occ_cap=512, table_size=4096)
    assert int(max_cells) <= 4096 and int(max_occ) <= 512
    cand = set()
    tid_np, valid_np = np.asarray(tid), np.asarray(valid)
    for q in range(Q):
        row = tid_np[q][valid_np[q]]
        assert len(row) == len(set(row.tolist())), "duplicate candidates"
        cand.update((q, int(t)) for t in row)
    d = np.linalg.norm(np.asarray(qc)[:, None, :] - np.asarray(tc)[None, :, :],
                       axis=-1)
    overlap = d <= (np.asarray(qr)[:, None] + np.asarray(tr)[None, :])
    for q, t in zip(*np.nonzero(overlap)):
        assert (q, t) in cand, f"missed true overlap ({q},{t})"
