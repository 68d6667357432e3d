"""Instrumented bench probe: per-step wall time, counts, retraces.

Run on the real TPU to see where bench.py spends its time. Prints one line
per step, flushed immediately, so hangs are attributable.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

n_quads = int(os.environ.get("PROBE_N_QUADS", "32"))
n_steps = int(os.environ.get("PROBE_STEPS", "40"))

import bench  # noqa: E402

t0 = time.perf_counter()
sim = bench.build_scene(n_quads=n_quads, dtype=os.environ.get("PROBE_DTYPE", "float32"))
print(f"[probe] scene built {time.perf_counter()-t0:.1f}s", flush=True)

logger = sim.get_logger()
prev_newton = 0.0
prev_solve = 0.0
for i in range(n_steps):
    ts = time.perf_counter()
    sim.run_one_time_step()
    te = time.perf_counter()
    nit = logger.get_stats("newton_iterations").total
    solve_t = logger.timers.get("fused_solve", 0.0)
    retr = logger.get_int("fused_retraces")
    nm = sim.stark.newton
    pairs = nm.live_contact_pairs() if nm is not None else -1
    cg = nm.get_last_solve_stats().cg_iterations if nm is not None else -1
    nsq = logger.series.get("ns_q", [-1.0])[-1]
    ncold = logger.get_int("ns_cold_restarts")
    brb = logger.get_stats("broad_rebuilds").total
    prb = logger.get_stats("pair_rebuilds").total
    print(f"[probe] step {i:3d} wall={te-ts:8.3f}s "
          f"solve={solve_t-prev_solve:7.3f}s newton={nit-prev_newton:4.0f} "
          f"cg={cg:4d} retraces={retr} pairs={pairs} "
          f"rb={brb:.0f}/{prb:.0f} nsq={nsq:.2e} cold={ncold} "
          f"t={sim.get_time():.4f}", flush=True)
    prev_newton = nit
    prev_solve = solve_t
print(f"[probe] total {time.perf_counter()-t0:.1f}s", flush=True)
if nm is not None:
    print("[probe] counts:", dict(sorted(nm._last_counts.items())), flush=True)
