"""Is the f32 one-step deviation under-convergence or inherent precision?

From the same f64 state at several steps: one step with (a) f32 defaults,
(b) f32 with exits tightened (min_iterations high, more Newton), (c) f64.
If (a)~(b) << (a)-(c), the convergence criteria are not the problem.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["STARK_TPU_COMPILE_CACHE"] = ""  # CPU: no cross-host AOT cache
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
import bench
from stark_tpu.utils import checkpoint

N_QUADS = 12
DT = 1.0 / 60.0


def make(dtype, tight=False):
    sim = bench.build_scene(n_quads=N_QUADS, dtype=dtype)
    s = sim.get_settings()
    s.simulation.max_time_step_size = DT
    s.simulation.use_adaptive_time_step = False
    if tight:
        s.newton.min_iterations = 12
        s.newton.max_iterations = 60
    sim.stark._initialize()
    return sim


sim64 = make("float64")
sim32 = make("float32")
sim32t = make("float32", tight=True)
path = "/tmp/f32disc.npz"

for step in range(15):
    checkpoint.save_state(sim64, path)
    checkpoint.load_state(sim32, path)
    checkpoint.load_state(sim32t, path)
    assert sim64.run_one_time_step()
    assert sim32.run_one_time_step()
    assert sim32t.run_one_time_step()
    x64 = sim64._dyn.host_x_all()
    x32 = sim32._dyn.host_x_all()
    x32t = sim32t._dyn.host_x_all()
    st = sim32.stark.newton.get_last_solve_stats()
    stt = sim32t.stark.newton.get_last_solve_stats()
    print(f"step {step:2d}: |f32-f64| {np.max(np.abs(x32-x64)):.2e} "
          f"|f32tight-f64| {np.max(np.abs(x32t-x64)):.2e} "
          f"|f32-f32tight| {np.max(np.abs(x32-x32t)):.2e} "
          f"iters {st.newton_iterations}/{stt.newton_iterations}", flush=True)
