"""Per-stage device timing of the FUSED solve path call sites.

Times each collision/solver stage of the fused program in isolation (after
warmup), matching the fused.py call sites exactly: broad_build
(engine.broad_fn), pair_build (engine.pairs_fn + pooled conn/scatter/direct
tables), isect_exact, egh, projection (static + pooled), the linear solve
(direct or PCG, matching fused.py's use_direct predicate), and the
energy-only Armijo trial — plus a finer breakdown inside the broad phase.

Usage: BENCH_N_QUADS=32 python tools/profile_fused.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import bench


RESULTS = {}


def timeit(label, fn, n=10, key=None):
    out = fn()  # warmup/compile
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print(f"  {label:<46} {dt*1000:10.3f} ms", flush=True)
    if key:
        RESULTS[key] = dt * 1000
    return dt


def main():
    n_quads = int(os.environ.get("BENCH_N_QUADS", "32"))
    sim = bench.build_scene(n_quads=n_quads,
                            dtype=os.environ.get("BENCH_DTYPE", "float32"))
    core = sim.stark
    t0 = time.perf_counter()
    sim.run_one_time_step()
    print(f"first step (all compiles): {time.perf_counter()-t0:.1f} s", flush=True)
    for i in range(2):
        t0 = time.perf_counter()
        sim.run_one_time_step()
        st = core.newton.get_last_solve_stats()
        print(f"step wall {time.perf_counter()-t0:.3f} s  newton={st.newton_iterations}"
              f" cg={st.cg_iterations}", flush=True)

    nm = core.newton
    eng = sim.interactions.contact._engine
    dt = jnp.asarray(core.dt, eng.dtype)

    print(f"n_quads={n_quads} n_soft={len(eng.sv_gid)} es={len(eng.es)} "
          f"ts={len(eng.ts)} rv={len(eng.rv_body)} er={len(eng.er)} tr={len(eng.tr)}",
          flush=True)
    print(f"caps: { {k: v for k, v in sorted(eng._caps.items())} }", flush=True)
    print(f"pool_cap={nm._pool_cap} slot_cap={nm._slot_cap} "
          f"n_blocks={nm.n_blocks}", flush=True)

    state = eng.engine_state()
    th = eng._th_vec()
    u = nm.get_dofs()
    glob = nm.get_glob()
    sdata = nm.get_static_data()
    fdata = nm.get_friction_data() if nm.get_friction_data else {}
    ev = nm._ev
    use_direct = (nm.settings.projection_mode.name == "ProjectedNewton"
                  and nm.n_blocks <= nm._direct_max_blocks)
    print(f"use_direct={use_direct}", flush=True)

    world_jit = jax.jit(lambda u: eng.world_from_u(u, state, dt))
    Vs, Vr = world_jit(u)
    slack_b = jnp.asarray(0.016, eng.dtype)  # 8*dhat_max typical
    slack_p = jnp.asarray(0.004, eng.dtype)

    timeit("world_from_u", lambda: world_jit(u), key="world_ms")

    broad_jit = jax.jit(lambda Vs, Vr: eng.broad_fn(Vs, Vr, th, slack_b))
    timeit("broad_fn (FULL broad shell)", lambda: broad_jit(Vs, Vr),
           key="broad_ms")
    bcands, icands, _counts = broad_jit(Vs, Vr)

    # --- breakdown: per-block stage 1 ---
    for stem in eng._blocks():
        ccap = eng._cap("c_" + stem)

        def one(stem=stem, ccap=ccap):
            if stem.startswith("pt"):
                P, pm, tri, tm, t0_, t1_, t2_, c, r, th_p, th_t = eng._pt_geom(
                    stem, Vs, Vr, th)
                return eng._pt_stage1(stem, P, c, r, th_p, th_t, slack_b,
                                      tri, pm, tm, None, ccap)
            (ea, eam, eb, ebm, a0, a1, b0, b1, ma, ha, mb, hb,
             th_a, th_b) = eng._ee_geom(stem, Vs, Vr, th)
            return eng._ee_stage1(stem, ma, ha, mb, hb, th_a, th_b, slack_b,
                                  ea, eb, eam, ebm, None, ccap)

        jf = jax.jit(one)
        nq, nt = eng._block_sizes(stem)
        timeit(f"  stage1 {stem} ({nq}x{nt}, ccap={ccap})", lambda jf=jf: jf())

    isect1_jit = jax.jit(lambda Vs, Vr: eng._isect_stage1(Vs, Vr, slack=slack_b))
    timeit("  isect_stage1 (cands)", lambda: isect1_jit(Vs, Vr))

    # --- compaction alone at representative sizes ---
    from stark_tpu.ops.compaction import compact_indices
    for n, cap in ((len(eng.sv_gid) * max(len(eng.ts), 1), eng._cap("c_pt_dd")),
                   (len(eng.es) * max(len(eng.es), 1), eng._cap("c_ee_dd")),
                   (len(eng.es) * max(len(eng.ts), 1), eng._cap("i_ss"))):
        mask = jnp.zeros((n,), bool).at[::137].set(True)
        cj = jax.jit(lambda m, cap=cap: compact_indices(m, cap))
        timeit(f"  compact_indices n={n} cap={cap}", lambda: cj(mask))

    pairs_jit = jax.jit(lambda Vs, Vr, bc: eng.pairs_fn(Vs, Vr, th, bc, slack_p))
    timeit("pairs_fn (pair tables only)", lambda: pairs_jit(Vs, Vr, bcands),
           key="pairs_ms")
    tables, _pc = pairs_jit(Vs, Vr, bcands)

    def full_data(t):
        d = dict(sdata)
        d.update(t)
        d.update(fdata)
        return d

    data = full_data(tables)
    pool_cap = nm._pool_cap
    slot_cap = nm._slot_cap

    # pair_build exactly as fused.py: pairs + pooled conn + scatter rows
    # (+ direct tables when the direct path is active)
    def pair_build_full():
        t, _ = eng.pairs_fn(Vs, Vr, th, bcands, slack_p)
        d = full_data(t)
        conn_cat, pool_sel, pool_cnt = ev.bucket_conn_pool(d, pool_cap)
        rows = ev.scatter_rows(conn_cat)
        if use_direct:
            dtab = ev.direct_tables(conn_cat, slot_cap)
        else:
            dtab = ()
        return conn_cat, rows, pool_sel, pool_cnt, dtab

    pb_jit = jax.jit(pair_build_full)
    timeit("pair_build (pairs+pool+rows+dtab)", lambda: pb_jit(),
           key="pair_build_ms")
    conn_cat, rows, pool_sel, pool_cnt, dtab = pb_jit()

    isx_jit = jax.jit(lambda Vs, Vr: eng._isect_exact(Vs, Vr, icands))
    timeit("isect_exact", lambda: isx_jit(Vs, Vr), key="isect_ms")

    egh_jit = jax.jit(nm._energy_grad_hess)
    timeit("egh (energy+grad+hess)", lambda: egh_jit(u, data, glob),
           key="egh_ms")
    E0, aux, grad, hess = egh_jit(u, data, glob)

    en_jit = jax.jit(nm._energy)
    timeit("energy only (Armijo trial)", lambda: en_jit(u, data, glob),
           key="energy_ms")

    from stark_tpu.solver import project as project_mod
    s = nm.settings
    stat_names, _dyn = ev.split_dyn(hess.keys())

    def project_full(hess, pool_sel, pool_cnt):
        hess_stat = {n: hess[n] for n in stat_names}
        H_pool = ev.pool_dyn_hess(hess, pool_sel)
        pool_valid = jnp.arange(pool_cap) < jnp.minimum(pool_cnt, pool_cap)
        hess_stat_p, n_proj = project_mod.project_all(
            hess_stat, s.projection_eps, s.project_to_pd_use_mirroring,
            {n: data[n] for n in stat_names}, jacobi_sweeps=nm._jacobi_sweeps)
        if pool_cap:
            H_pool, ch = project_mod.project_family_to_pd(
                H_pool, s.projection_eps, s.project_to_pd_use_mirroring,
                elem_mask=pool_valid, jacobi_sweeps=nm._jacobi_sweeps)
        return hess_stat_p, H_pool

    pj = jax.jit(project_full)
    timeit(f"projection static+pool (jacobi={nm._jacobi_sweeps})",
           lambda: pj(hess, pool_sel, pool_cnt), key="project_ms")
    hess_stat_p, H_pool = pj(hess, pool_sel, pool_cnt)

    cat_jit = jax.jit(ev.cat_hess_with_pool)
    timeit("cat_hess_with_pool", lambda: cat_jit(hess_stat_p, H_pool),
           key="cat_ms")
    H_cat = cat_jit(hess_stat_p, H_pool)

    from stark_tpu.solver import assembly
    from stark_tpu.solver.pcg import solve_pcg

    if use_direct:
        ds_jit = jax.jit(lambda g, H, dt_: ev.direct_solve(g, H, dt_))
        timeit("direct_solve (dense LLT)", lambda: ds_jit(grad, H_cat, dtab),
               key="linsolve_ms")
    else:
        def cg_once(niter):
            D = ev.diag_bucket(conn_cat, H_cat)
            Dinv = assembly.precondition_inverse(D)
            A = lambda p: ev.hvp_bucket(p, conn_cat, H_cat, rows)
            Minv = lambda r: assembly.apply_preconditioner(Dinv, r)
            return solve_pcg(A, Minv, -grad, jnp.asarray(0.0, u.dtype),
                             jnp.asarray(0.0, u.dtype), niter, False)

        cg_jit = jax.jit(cg_once, static_argnums=0)
        t10 = timeit("cg 10 iters (bucket path)", lambda: cg_jit(10))
        t100 = timeit("cg 100 iters (bucket path)", lambda: cg_jit(100),
                      key="linsolve_ms")
        print(f"    -> per CG iteration: {(t100-t10)/90*1000:.4f} ms", flush=True)

    tot = sum(RESULTS.get(k, 0.0) for k in
              ("pair_build_ms", "isect_ms", "egh_ms", "energy_ms",
               "project_ms", "cat_ms", "linsolve_ms"))
    print(f"\n  approx per-Newton-iteration total (pair rebuild every iter): "
          f"{tot:.1f} ms", flush=True)
    import json
    print("STAGES " + json.dumps({k: round(v, 3) for k, v in RESULTS.items()}),
          flush=True)


if __name__ == "__main__":
    main()
