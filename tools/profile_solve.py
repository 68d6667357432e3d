"""Time individual solver stages of the bench scene on the real TPU."""
import time, os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
import bench

def t(label, fn, *a, n=5, **k):
    out = fn(*a, **k)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*a, **k)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    print(f"{label:34s} min {min(ts)*1e3:9.2f} ms   med {sorted(ts)[len(ts)//2]*1e3:9.2f} ms", flush=True)
    return out

sim = bench.build_scene(n_quads=32, dtype="float32")
sim.stark._initialize()
sim.stark.callbacks.run_before_time_step()
sim.stark.callbacks.newton.run_before_energy_evaluation()
nm = sim.stark.newton
eng = nm.get_engine()

u = nm.get_dofs(); glob = nm.get_glob()
sdata = nm.get_static_data(); fdata = nm.get_friction_data()
dt = glob["dt"]

print("n_blocks", nm.n_blocks, flush=True)
g2 = jax.jit(eng.glob_from_u)
gg = t("glob_from_u", g2, u, eng.engine_state(), dt)
ct = jax.jit(eng._contacts_fn)
cdata, counts = t("contact tables (broad+narrow)", ct, gg, eng._dhat_mat())
isect = jax.jit(eng._intersect_fn)
t("intersection test", isect, gg)

data = dict(sdata); data.update({k: v for k, v in cdata.items()}); data.update(fdata)
E, _Eabs, grad, hess = t("energy+grad+hess", nm._jit_egh, u, data, glob)
t("energy only", nm._jit_energy, u, data, glob)
hp = t("project_all", nm._jit_project_all, hess, nm.settings.projection_eps, True, data)
hess_p = hp[0]
f32 = jnp.asarray(1e-6, u.dtype)
for it in (10, 100):
    t(f"cg {it} iters", nm._jit_cg, grad, data, hess_p, jnp.asarray(0.0, u.dtype), jnp.asarray(0.0, u.dtype), it, stop_on_indef=False)
hvp1 = jax.jit(lambda p, data, hess: nm._hvp(p, data, hess))
t("single hvp", hvp1, grad, data, hess_p)
db = jax.jit(nm._diag_blocks)
t("diag blocks", db, data, hess_p)
