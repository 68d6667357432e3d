"""Capture a jax.profiler trace of one fused solve and dump per-op device
times from the xplane proto.

Usage: BENCH_N_QUADS=32 python tools/profile_xplane.py
"""
import glob
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

import bench


def main():
    n_quads = int(os.environ.get("BENCH_N_QUADS", "32"))
    sim = bench.build_scene(n_quads=n_quads,
                            dtype=os.environ.get("BENCH_DTYPE", "float32"))
    core = sim.stark
    sim.run_one_time_step()
    sim.run_one_time_step()

    outdir = "/tmp/jaxtrace"
    os.system(f"rm -rf {outdir}")
    with jax.profiler.trace(outdir):
        t0 = time.perf_counter()
        sim.run_one_time_step()
        wall = time.perf_counter() - t0
    st = core.newton.get_last_solve_stats()
    print(f"traced step: wall={wall:.3f}s newton={st.newton_iterations} "
          f"cg={st.cg_iterations}", flush=True)

    # parse xplane
    paths = glob.glob(outdir + "/**/*.xplane.pb", recursive=True)
    print("xplane files:", paths, flush=True)
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    for p in paths:
        xs = xplane_pb2.XSpace()
        with open(p, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            if "TPU" not in plane.name and "tpu" not in plane.name.lower():
                continue
            print(f"== plane {plane.name}", flush=True)
            ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
            tot = defaultdict(float)
            cnt = defaultdict(int)
            for line in plane.lines:
                for ev in line.events:
                    name = ev_meta.get(ev.metadata_id, "?")
                    tot[name] += ev.duration_ps / 1e9  # ms
                    cnt[name] += 1
            items = sorted(tot.items(), key=lambda kv: -kv[1])[:48]
            tsum = sum(tot.values())
            print(f"  total summed op time: {tsum:.1f} ms (overcounts nesting)")
            for name, ms in items:
                print(f"  {ms:10.2f} ms  x{cnt[name]:<6} {name[:110]}")


if __name__ == "__main__":
    main()
