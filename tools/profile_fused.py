"""Per-stage DEVICE timing of the fused solve call sites.

On this TPU setup every host<->device round trip costs ~25 ms over the
relay, so timing a single jitted call measures the relay, not the kernel.
Each stage is therefore repeated N times inside ONE jitted
`lax.fori_loop` whose body depends on the loop index (defeating
loop-invariant hoisting); per-call device time = (wall_N2 - wall_N1) /
(N2 - N1), cancelling both the dispatch floor and any constant prologue.

Stages mirror fused.py's loop body exactly: world_from_u, broad_build,
pair_build, isect_exact, egh, energy-only trial, live-row selection,
PD projection, CG-layout concat + scatter rows, direct tables + dense
inverse (per broad rebuild), PCG iterations.

Usage: BENCH_N_QUADS=32 PROF_STEPS=8 python tools/profile_fused.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

import bench

RESULTS = {}


def device_time(label, stage_fn, u0, n1=4, n2=12, key=None):
    """Per-call device time of stage_fn(u) via in-program repetition.

    stage_fn: u -> scalar (must consume its input so each iteration's work
    is live). The input is perturbed per iteration so XLA cannot hoist the
    stage out of the loop.
    """
    def loop(n):
        def run(u):
            def body(i, acc):
                ui = u * (1.0 + jnp.asarray(1e-12, u.dtype) * i)
                return acc + stage_fn(ui)
            return lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))
        return jax.jit(run)

    f1, f2 = loop(n1), loop(n2)
    jax.device_get((f1(u0), f2(u0)))  # compile both
    t1 = min_wall(lambda: jax.device_get(f1(u0)))
    t2 = min_wall(lambda: jax.device_get(f2(u0)))
    per = (t2 - t1) / (n2 - n1) * 1000.0
    print(f"  {label:<46} {per:10.3f} ms", flush=True)
    if key:
        RESULTS[key] = round(per, 3)
    return per


def min_wall(fn, n=3):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    n_quads = int(os.environ.get("BENCH_N_QUADS", "32"))
    n_steps = int(os.environ.get("PROF_STEPS", "8"))
    sim = bench.build_scene(n_quads=n_quads,
                            dtype=os.environ.get("BENCH_DTYPE", "float32"))
    core = sim.stark
    t0 = time.perf_counter()
    sim.run_one_time_step()
    print(f"first step (all compiles): {time.perf_counter()-t0:.1f} s",
          flush=True)
    for i in range(n_steps - 1):
        t0 = time.perf_counter()
        sim.run_one_time_step()
        st = core.newton.get_last_solve_stats()
        print(f"step {i+1} wall {time.perf_counter()-t0:.3f} s  "
              f"newton={st.newton_iterations} cg={st.cg_iterations}",
              flush=True)

    nm = core.newton
    eng = sim.interactions.contact._engine
    dt = jnp.asarray(core.dt, eng.dtype)

    print(f"n_quads={n_quads} n_soft={len(eng.sv_gid)} es={len(eng.es)} "
          f"ts={len(eng.ts)} rv={len(eng.rv_body)} er={len(eng.er)} "
          f"tr={len(eng.tr)}", flush=True)
    print(f"caps: { {k: v for k, v in sorted(eng._caps.items())} }", flush=True)
    print(f"pool_cap={nm._pool_cap} slot_cap={nm._slot_cap} "
          f"n_blocks={nm.n_blocks}", flush=True)
    print(f"counts: { {k: v for k, v in sorted(nm._last_counts.items())} }",
          flush=True)

    state = eng.engine_state()
    th = eng._th_vec()
    u = nm.get_dofs()
    glob = nm.get_glob()
    sdata = nm.get_static_data()
    ev = nm._ev
    s = nm.settings
    use_direct = (s.projection_mode.name == "ProjectedNewton"
                  and nm.n_blocks <= nm._direct_max_blocks)
    pool_cap = nm._pool_cap
    slot_cap = nm._slot_cap
    print(f"use_direct={use_direct}", flush=True)

    dhat_max = 2.0 * float(np.max(np.asarray(eng.model.contact_thicknesses)))
    slack_p = jnp.asarray(0.5 * dhat_max, eng.dtype)
    slack_b = jnp.asarray(4.0 * dhat_max, eng.dtype)

    def world(uu):
        Vs, Vr = eng.world_from_u(uu, state, dt)
        if Vs is None:
            Vs = jnp.zeros((0, 3), eng.dtype)
        if Vr is None:
            Vr = jnp.zeros((0, 3), eng.dtype)
        return Vs, Vr

    def chk(x):
        """Fold a pytree to one f32 scalar (keeps all outputs live)."""
        leaves = [jnp.sum(l.astype(jnp.float32)) if l.dtype != jnp.bool_
                  else jnp.sum(l) for l in jax.tree_util.tree_leaves(x)
                  if hasattr(l, "dtype")]
        return sum(leaves).astype(jnp.float32) if leaves \
            else jnp.zeros((), jnp.float32)

    device_time("world_from_u", lambda uu: chk(world(uu)), u,
                key="world_ms")

    def broad(uu):
        Vs, Vr = world(uu)
        return eng.broad_fn(Vs, Vr, th, slack_b, slack_p)

    device_time("broad_build (broad_fn)", lambda uu: chk(broad(uu)), u,
                key="broad_ms")
    bcands, icands, _c = jax.jit(broad)(u)

    def pairs(uu):
        Vs, Vr = world(uu)
        return eng.pairs_fn(Vs, Vr, th, bcands, slack_p)

    device_time("pair_build (pairs_fn)", lambda uu: chk(pairs(uu)), u,
                key="pairs_ms")
    tables, _pc = jax.jit(pairs)(u)

    def isect(uu):
        Vs, Vr = world(uu)
        return eng._isect_exact(Vs, Vr, icands)

    if eng.model.global_params.intersection_test_enabled:
        device_time("isect_exact", lambda uu: chk(isect(uu)), u,
                    key="isect_ms")

    if os.environ.get("PROF_ONLY") == "collision":
        print("STAGES " + json.dumps(RESULTS), flush=True)
        return

    data = dict(sdata)
    data.update(tables)
    fr = nm.get_friction_data() if nm.get_friction_data else {}
    data.update(fr)

    device_time("egh (energy+grad+hess)",
                lambda uu: chk(nm._energy_grad_hess(uu, data, glob)), u,
                key="egh_ms")
    E0, aux, grad, hess = jax.jit(
        lambda uu: nm._energy_grad_hess(uu, data, glob))(u)

    device_time("energy only (Armijo trial)",
                lambda uu: chk(nm._energy(uu, data, glob)), u,
                key="energy_ms")

    from stark_tpu.solver import assembly, project as project_mod
    from stark_tpu.solver.pcg import solve_pcg

    stat_names, _dyn = ev.split_dyn(hess.keys())
    conn_dyn = ev.dyn_conn_cat(data)

    def hess_of(uu):
        return nm._energy_grad_hess(uu, data, glob)[3]

    def live_sel(uu):
        h = hess_of(uu)
        H_dyn = ev.dyn_hess_cat(h)
        return ev.live_select(conn_dyn, H_dyn, pool_cap)

    # stage deltas: each builds on the previous stage's program so the
    # reported time is (stage_total - prior_total)
    t_egh = RESULTS["egh_ms"]
    t = device_time("egh + live_select",
                    lambda uu: chk(live_sel(uu)), u)
    RESULTS["live_select_ms"] = round(t - t_egh, 3)

    def proj(uu):
        h = hess_of(uu)
        hs = {n: h[n] for n in stat_names}
        H_dyn = ev.dyn_hess_cat(h)
        conn_live, H_live, live_valid, live_cnt = ev.live_select(
            conn_dyn, H_dyn, pool_cap)
        hess_stat_p, n_proj = project_mod.project_all(
            hs, s.projection_eps, s.project_to_pd_use_mirroring,
            {n: data[n] for n in stat_names},
            jacobi_sweeps=nm._jacobi_sweeps, psd_names=nm._psd_names)
        H_live, ch = project_mod.project_family_to_pd(
            H_live, s.projection_eps, s.project_to_pd_use_mirroring,
            elem_mask=live_valid, jacobi_sweeps=nm._jacobi_sweeps)
        return hess_stat_p, H_live, conn_live

    t_prev = t
    t = device_time("  + projection (static+live)",
                    lambda uu: chk(proj(uu)), u)
    RESULTS["project_ms"] = round(t - t_prev, 3)

    def cat_rows(uu):
        hess_stat_p, H_live, conn_live = proj(uu)
        conn_cat, H_cat = ev.cat_with_live(
            ev.cat_static_conn(data), hess_stat_p, conn_live, H_live)
        rows = ev.scatter_rows(conn_cat)
        return conn_cat, H_cat, rows

    t_prev = t
    t = device_time("  + cat_with_live + scatter_rows",
                    lambda uu: chk(cat_rows(uu)), u)
    RESULTS["cat_rows_ms"] = round(t - t_prev, 3)
    conn_cat, H_cat, rows = jax.jit(cat_rows)(u)

    if use_direct:
        def dinv(uu):
            _h, H_cat2, _r = cat_rows(uu)
            dtab = ev.direct_tables(conn_cat, slot_cap)
            M, ok = ev.dense_inverse(H_cat2, dtab)
            return M

        t_cat = t
        t = device_time("  + direct_tables + dense_inverse",
                        lambda uu: chk(dinv(uu)), u)
        RESULTS["dense_inverse_ms"] = round(t - t_cat, 3)
        M = jax.jit(dinv)(u)

        def cg_k(k):
            def f(uu):
                _cc, H_cat2, rows2 = cat_rows(uu)
                A = lambda p: ev.hvp_bucket(p, conn_cat, H_cat2, rows2)
                Minv = lambda r: ev.apply_dense_perm(M, r)
                cg = solve_pcg(A, Minv, -grad, jnp.zeros((), u.dtype),
                               jnp.zeros((), u.dtype), k, False)
                return chk(cg.x)
            return f

        t8 = device_time("  + pcg 8 iters (dense-inv precond)", cg_k(8), u)
        RESULTS["pcg8_ms"] = round(t8 - t_cat, 3)
        t32 = device_time("  + pcg 32 iters", cg_k(32), u)
        RESULTS["pcg_per_iter_ms"] = round((t32 - t8) / 24.0, 3)
    else:
        def cg_k(k):
            def f(uu):
                _cc, H_cat2, rows2 = cat_rows(uu)
                D = ev.diag_bucket(conn_cat, H_cat2)
                Dinv = assembly.precondition_inverse(D)
                A = lambda p: ev.hvp_bucket(p, conn_cat, H_cat2, rows2)
                Minv = lambda r: assembly.apply_preconditioner(Dinv, r)
                cg = solve_pcg(A, Minv, -grad, jnp.zeros((), u.dtype),
                               jnp.zeros((), u.dtype), k, False)
                return chk(cg.x)
            return f

        t_prev = t
        t8 = device_time("  + pcg 8 iters (jacobi precond)", cg_k(8), u)
        RESULTS["pcg8_ms"] = round(t8 - t_prev, 3)
        t32 = device_time("  + pcg 32 iters", cg_k(32), u)
        RESULTS["pcg_per_iter_ms"] = round((t32 - t8) / 24.0, 3)

    stage_sum = (RESULTS.get("pairs_ms", 0) + RESULTS.get("isect_ms", 0)
                 + RESULTS.get("egh_ms", 0) + RESULTS.get("energy_ms", 0)
                 + RESULTS.get("live_select_ms", 0)
                 + RESULTS.get("project_ms", 0)
                 + RESULTS.get("cat_rows_ms", 0)
                 + RESULTS.get("pcg8_ms", 0))
    print(f"\n  approx per-iteration (pair rebuild + 1 trial + 8 CG): "
          f"{stage_sum:.1f} ms", flush=True)
    print("STAGES " + json.dumps(RESULTS), flush=True)


if __name__ == "__main__":
    main()
