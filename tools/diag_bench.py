"""Diagnostic run of the flagship bench scene: per-step timing, solver
codes, retrace counts, contact-pair counts. Usage:
  BENCH_N_QUADS=32 python tools/diag_bench.py [n_steps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    n_quads = int(os.environ.get("BENCH_N_QUADS", "32"))
    sim = bench.build_scene(n_quads=n_quads, dtype=os.environ.get("BENCH_DTYPE", "float32"))
    core = sim.stark
    core.settings.output.console_verbosity = __import__(
        "stark_tpu.core.settings", fromlist=["Verbosity"]).Verbosity.Summary
    core.output._console_verbosity = core.settings.output.console_verbosity

    # instrument retraces
    nm_holder = {}
    import stark_tpu.solver.newton as newton_mod
    orig_build = newton_mod.NewtonsMethod._build_fused
    retraces = [0]

    def counting_build(self):
        retraces[0] += 1
        t0 = time.perf_counter()
        eng = self.get_engine() if self.get_engine is not None else None
        caps = dict(eng._caps) if eng is not None else {}
        print(f"  [diag] _build_fused #{retraces[0]} pool={self._pool_cap} "
              f"caps={caps}", flush=True)
        r = orig_build(self)
        print(f"  [diag] _build_fused #{retraces[0]} done "
              f"({time.perf_counter()-t0:.2f}s host-side)", flush=True)
        return r

    newton_mod.NewtonsMethod._build_fused = counting_build

    t_all = time.perf_counter()
    for i in range(n_steps):
        t0 = time.perf_counter()
        ok = sim.run_one_time_step()
        wall = time.perf_counter() - t0
        eng = sim.interactions.contact._engine
        caps = dict(eng._caps) if eng is not None else {}
        nm = core.newton
        st = nm.get_last_solve_stats() if nm else None
        print(f"[diag] step {i}: ok={ok} wall={wall:.2f}s dt={core.dt*1000:.2f}ms "
              f"t={core.current_time:.4f} newton={st.newton_iterations if st else '-'} "
              f"cg={st.cg_iterations if st else '-'} "
              f"k_contact={sim.interactions.contact.contact_stiffness:.2e}", flush=True)
        if not ok:
            print("[diag] ABORTED", flush=True)
            break
    print(f"[diag] total {time.perf_counter()-t_all:.2f}s, retraces={retraces[0]}")
    print(f"[diag] caps: {caps}")


if __name__ == "__main__":
    main()
