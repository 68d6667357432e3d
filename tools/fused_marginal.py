"""Ground-truth marginal cost of one fused Newton iteration.

Runs the REAL fused program (same jit, same buffers) with forced iteration
counts (min_iterations=k, tolerances zeroed so no early exit) and reports
(wall_k2 - wall_k1)/(k2 - k1): the true device cost of one loop-body
iteration including every cond/carry/copy effect the stage profiler's
isolated measurements cannot see.

Usage: BENCH_N_QUADS=32 PROF_STEPS=8 python tools/fused_marginal.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import bench


def main():
    n_quads = int(os.environ.get("BENCH_N_QUADS", "32"))
    n_steps = int(os.environ.get("PROF_STEPS", "8"))
    sim = bench.build_scene(n_quads=n_quads,
                            dtype=os.environ.get("BENCH_DTYPE", "float32"))
    core = sim.stark
    t0 = time.perf_counter()
    for i in range(n_steps):
        sim.run_one_time_step()
    print(f"{n_steps} steps: {time.perf_counter()-t0:.1f} s", flush=True)

    nm = core.newton
    engine = sim.interactions.contact._engine
    u0 = nm.get_dofs()
    data_static = nm.get_static_data()
    glob = nm.get_glob()
    friction = {}
    eng_state = engine.engine_state()
    dhat = engine._th_vec()
    dtype = u0.dtype
    s = nm.settings
    dhat_max = 2.0 * float(np.max(np.asarray(engine.model.contact_thicknesses)))

    def params_for(k):
        return {
            "max_iterations": jnp.asarray(k, jnp.int32),
            "min_iterations": jnp.asarray(k, jnp.int32),
            "residual_tolerance_abs": jnp.asarray(0.0, dtype),
            "residual_tolerance_rel": jnp.asarray(0.0, dtype),
            "bailout_residual": jnp.asarray(0.0, dtype),
            "step_tolerance": jnp.asarray(0.0, dtype),
            "step_cap": jnp.asarray(min(s.step_cap, np.finfo(np.float32).max), dtype),
            "cg_abs_tolerance": jnp.asarray(s.cg_abs_tolerance, dtype),
            "cg_rel_tolerance": jnp.asarray(s.cg_rel_tolerance, dtype),
            "slack_pair": jnp.asarray(0.5 * dhat_max, dtype),
            "slack_broad_min": jnp.asarray(2.0 * dhat_max, dtype),
            "slack_broad_max": jnp.asarray(4.0 * dhat_max, dtype),
            "du_prior": jnp.asarray(nm._du_prior, dtype),
            "du_floor": jnp.asarray(1e-4, dtype),
        }

    def run_k(k, n_rep=3):
        p = params_for(k)
        out = nm._fused_jit(u0, data_static, friction, glob, eng_state,
                            dhat, p)
        jax.device_get(out[1])  # warmup (compile cache: same program)
        ts = []
        for _ in range(n_rep):
            t0 = time.perf_counter()
            out = nm._fused_jit(u0, data_static, friction, glob, eng_state,
                                dhat, p)
            packed = jax.device_get(out[1])
            ts.append(time.perf_counter() - t0)
        return min(ts), packed

    for k in (1, 2, 4, 8, 16):
        w, packed = run_k(k)
        print(f"k={k:3d} wall={w*1000:9.1f} ms  it={packed[1]:.0f} "
              f"cg={packed[2]:.0f} broad_rb={packed[12]:.0f} "
              f"pair_rb={packed[13]:.0f} ls_inv={packed[5]:.0f} "
              f"ls_bt={packed[6]:.0f}", flush=True)

    w1, _ = run_k(2)
    w2, _ = run_k(10)
    print(f"marginal per-iteration: {(w2-w1)/8*1000:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
