"""Find which phase of the sim triggers the 25ms dispatch degradation."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

_probe = None
_px = None


def probe(label):
    global _probe, _px
    if _probe is None:
        _probe = jax.jit(lambda x: x + 1.0)
        _px = jnp.zeros((8,), jnp.float32)
        jax.block_until_ready(_probe(_px))
    jax.block_until_ready(_probe(_px))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(_probe(_px))
        ts.append((time.perf_counter() - t0) * 1000)
    print(f"PROBE {label:<40} {min(ts):7.2f} ms", flush=True)


probe("import jax only")

import bench

probe("import bench")
sim = bench.build_scene(n_quads=32, dtype="float32")
probe("build_scene")
sim.stark._initialize()
probe("_initialize")
sim.stark.callbacks.run_before_time_step()
probe("before_time_step")
ok = sim.run_one_time_step()
probe("step 1")
ok = sim.run_one_time_step()
probe("step 2")
