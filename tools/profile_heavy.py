"""xplane profile of a HEAVY (draped) bench step: run to t~0.3s first."""
import glob
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import bench


def main():
    sim = bench.build_scene(n_quads=32, dtype="float32")
    core = sim.stark
    n_warm = int(os.environ.get("HEAVY_WARM_STEPS", "9"))
    for i in range(n_warm):
        t0 = time.perf_counter()
        sim.run_one_time_step()
        st = core.newton.get_last_solve_stats()
        print(f"warm {i}: {time.perf_counter()-t0:.2f}s newton={st.newton_iterations} "
              f"cg={st.cg_iterations} bt={st.ls_bt_iterations}", flush=True)

    outdir = "/tmp/jaxtrace_heavy"
    os.system(f"rm -rf {outdir}")
    with jax.profiler.trace(outdir):
        t0 = time.perf_counter()
        sim.run_one_time_step()
        wall = time.perf_counter() - t0
    st = core.newton.get_last_solve_stats()
    print(f"traced: wall={wall:.3f}s newton={st.newton_iterations} "
          f"cg={st.cg_iterations} bt={st.ls_bt_iterations}", flush=True)

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    for p in glob.glob(outdir + "/**/*.xplane.pb", recursive=True):
        xs = xplane_pb2.XSpace()
        with open(p, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            if "TPU" not in plane.name:
                continue
            ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
            tot = defaultdict(float)
            cnt = defaultdict(int)
            for line in plane.lines:
                for ev in line.events:
                    name = ev_meta.get(ev.metadata_id, "?")
                    tot[name] += ev.duration_ps / 1e9
                    cnt[name] += 1
            for name, ms in sorted(tot.items(), key=lambda kv: -kv[1])[:36]:
                print(f"  {ms:10.2f} ms  x{cnt[name]:<6} {name[:120]}")


if __name__ == "__main__":
    main()
