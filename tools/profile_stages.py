"""Per-stage device timing on the flagship bench scene.

Times each jitted stage of one Newton iteration in isolation (after warmup):
contact refresh, intersection oracle, energy, energy+grad+hess, PD projection,
one Hvp, a full PCG solve, preconditioner build. Prints a table.

Usage: BENCH_N_QUADS=32 python tools/profile_stages.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench


def timeit(label, fn, n=20):
    fn()  # warmup/compile
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"  {label:<42} {dt*1000:10.3f} ms", flush=True)
    return dt


def main():
    n_quads = int(os.environ.get("BENCH_N_QUADS", "32"))
    sim = bench.build_scene(n_quads=n_quads, dtype=os.environ.get("BENCH_DTYPE", "float32"))
    core = sim.stark
    # initialize without running a full step: use staged path pieces
    os.environ["STARK_TPU_NO_FUSED"] = "1"
    sim.run_one_time_step()  # one real step to settle contact etc.
    nm = core.newton
    eng = sim.interactions.contact._engine

    dt = core.dt
    glob_eng = eng._engine_glob(dt)
    dhat = eng._th_vec()
    contacts_jit = jax.jit(eng._contacts_fn)
    intersect_jit = jax.jit(eng._intersect_fn)

    print(f"n_quads={n_quads}  n_soft_verts={len(eng.sv_gid)} n_soft_edges={len(eng.es)} "
          f"n_soft_tris={len(eng.ts)} n_blocks={nm.n_blocks}", flush=True)

    timeit("contact refresh (dense+compact)", lambda: contacts_jit(glob_eng, dhat))
    timeit("intersection oracle", lambda: intersect_jit(glob_eng))

    # full data for evaluator stages
    eng.refresh_contacts(dt)
    data = nm.get_data()
    glob = nm.get_glob()
    u = nm.get_dofs()
    for name, fd in data.items():
        print(f"    family {name:<22} E={fd['conn'].shape[0]:>7} arity={fd['conn'].shape[1]}")

    timeit("energy only", lambda: nm._jit_energy(u, data, glob))
    E0, _Eabs, grad, hess = nm._jit_egh(u, data, glob)
    timeit("energy+grad+hess", lambda: nm._jit_egh(u, data, glob))
    s = nm.settings
    timeit("project_all (eigh)", lambda: nm._jit_project_all(
        hess, s.projection_eps, s.project_to_pd_use_mirroring, data))
    hess_p, _ = nm._jit_project_all(hess, s.projection_eps,
                                    s.project_to_pd_use_mirroring, data)

    from stark_tpu.solver import assembly
    hvp_jit = jax.jit(nm._hvp)
    timeit("one Hvp", lambda: hvp_jit(grad, data, hess_p))

    # CG-loop internals: context/table build (once per Newton iter) vs the
    # per-CG-iteration table-based Hvp
    ctx_jit = jax.jit(lambda d, h: nm._ev.hvp_context(d, h))
    timeit("hvp_context build", lambda: ctx_jit(data, hess_p))
    ctx = ctx_jit(data, hess_p)
    st_jit = jax.jit(lambda c: nm._ev.scatter_table(c, nm._hvp_K))
    timeit("scatter_table (argsort)", lambda: st_jit(ctx))
    entry, _R, _ = st_jit(ctx)
    hvt_jit = jax.jit(lambda p, c, e: nm._ev.hvp_table(p, c, e))
    timeit("hvp_table (per CG iter)", lambda: hvt_jit(grad, ctx, entry))

    diag_jit = jax.jit(lambda d, h: assembly.precondition_inverse(nm._diag_blocks(d, h)))
    timeit("diag blocks + inverse", lambda: diag_jit(data, hess_p))

    res = float(jnp.max(jnp.abs(grad)))
    cg = lambda: nm._jit_cg(grad, data, hess_p,
                            jnp.asarray(1e-6, u.dtype), jnp.asarray(s.cg_rel_tolerance, u.dtype),
                            s.cg_max_iterations, stop_on_indef=s.cg_stop_on_indefiniteness)
    r = cg()
    print(f"    PCG iters: {int(r.n_iterations)} converged={bool(r.converged)}")
    t = timeit("full PCG solve", cg, n=5)
    ni = int(r.n_iterations)
    if ni:
        print(f"    -> per CG iteration: {t/ni*1000:.3f} ms")


if __name__ == "__main__":
    main()
