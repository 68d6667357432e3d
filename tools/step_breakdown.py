"""Wall-clock breakdown of one bench step's host-side phases (TPU)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import bench

sim = bench.build_scene(n_quads=int(os.environ.get("BENCH_N_QUADS", "32")),
                        dtype="float32")
core = sim.stark
sim.run_one_time_step()
sim.run_one_time_step()

nm = core.newton

# wrap the fused dispatch/pull
import stark_tpu.solver.newton as newton_mod

orig_fused_call = nm._fused_jit
times = {}


def T(name):
    class _C:
        def __enter__(self):
            self.t0 = time.perf_counter()
        def __exit__(self, *a):
            times[name] = times.get(name, 0.0) + time.perf_counter() - self.t0
    return _C()


orig_solve_fused = newton_mod.NewtonsMethod._solve_fused


def timed_solve(self):
    with T("solve_fused_total"):
        r = orig_solve_fused(self)
    return r


newton_mod.NewtonsMethod._solve_fused = timed_solve

# patch device_get to time the pull
orig_get = jax.device_get


def timed_get(x):
    with T("device_get"):
        return orig_get(x)


jax.device_get = timed_get

def run_phase(label, fn):
    t0 = time.perf_counter()
    out = fn()
    times[label] = times.get(label, 0.0) + time.perf_counter() - t0
    return out


N = 6
t_all0 = time.perf_counter()
for i in range(N):
    t0 = time.perf_counter()
    run_phase("script", lambda: sim.script.run_a_cycle(sim.get_time()))
    # manual replication of run_one_step phases
    run_phase("should_continue", core.callbacks.run_should_continue_execution)
    run_phase("before_time_step2", core.callbacks.run_before_time_step)
    r = run_phase("solve", core.newton.solve)
    from stark_tpu.solver.newton import SolverReturn
    assert r == SolverReturn.Successful, r
    run_phase("accepted_cbs", core.callbacks.run_on_time_step_accepted)
    run_phase("after_cbs", core.callbacks.run_after_time_step)
    core.current_time += core.dt
    core.current_time_step += 1
    core.dt = min(core.settings.simulation.max_time_step_size,
                  core.dt * core.settings.simulation.time_step_size_success_multiplier)
    times["step_total"] = times.get("step_total", 0.0) + time.perf_counter() - t0
wall = time.perf_counter() - t_all0
print(f"{N} steps, {wall:.3f}s total", flush=True)
for k, v in sorted(times.items(), key=lambda kv: -kv[1]):
    print(f"  {k:<24} {v/N*1000:9.2f} ms/step", flush=True)
st = core.newton.get_last_solve_stats()
print("last stats:", st, flush=True)
