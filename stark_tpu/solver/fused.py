"""Fully fused device-side Newton solve: one dispatch per time step.

Motivation: on this TPU setup every device->host synchronization costs
milliseconds over the remote relay while async dispatches cost microseconds,
so the staged host-driven Newton loop (6-15 syncs per iteration) is latency
bound. This module compiles the ENTIRE solve — candidate-table construction,
energy/gradient/Hessian, PD projection, matrix-free BDPCG, and both
line-search stages — into a single `lax.while_loop` program. The host pulls
one small scalar vector per step and runs only the rare retry-ladder
decisions (dt halving, stiffness hardening, converged-state validity),
exactly the host/device cut SURVEY.md §7 prescribes.

Twin-range frozen candidate topology (the TPU analog of an MD twin-range
Verlet neighbor list): the reference rebuilds contact connectivity at every
Newton energy evaluation and every Armijo trial
(EnergyFrictionalContact.cpp:368-530, NewtonsMethod.cpp:594-596) —
affordable on CPU, but on TPU each rebuild is sort/compaction-bound
(~100 ms device time at 32x32-cloth scale, measured). Here the collision
state is split into two frozen shells, each rebuilt under `lax.cond` only
when accumulated vertex motion exceeds its margin:

  * BROAD shell (grids/sorts/large compactions — the expensive part):
    per-block candidate index buffers and intersection candidate buffers
    within slack_b = 1.35 * dt * du_reach (sized from the previous
    iteration's exact motion reach, so one Newton iteration's full stride
    fits). Rebuilt when motion since its build exceeds 0.45*slack_b —
    typically once per time step (the first iteration carries nearly all of
    a step's motion; later iterations are small corrections).
  * PAIR shell (exact distances over the broad buffers + small
    compactions — cheap): the energy pair tables within a small fixed
    slack_p ~ dhat. Rebuilt whenever motion exceeds 0.45*slack_p — every
    iteration during fast motion, never at rest.

Correctness contract:
  * Intersection safety is EXACT: the [max] line-search stage (the
    reference's max_allowed_step hook, unused by stark itself) clamps every
    step to the remaining broad-slack budget, so the frozen intersection
    candidates are a superset at every [inv]/initial/converged validity
    query, which then runs only exact vmapped segment-triangle tests.
  * Barrier energies re-derive distances from trial DOFs and clamp at
    dhat, so a pair-table superset evaluates to exactly the same energy.
    Line-search trial energies may transiently miss a pair that first
    activates deeper than slack_p/2 into a single trial stride — the same
    lag class as the reference's frozen friction anchors; the next
    iteration's pair rebuild sees it and the barrier pushes back, while
    intersection tests (exact, above) still reject any crossing. Near
    convergence strides shrink below slack_p/2 and the semantics become
    exact — accepted states always carry fully-consistent barriers.

Overflow accounting: every capacity-bounded buffer count produced anywhere
in the solve is max-folded into one int32 vector the host checks after the
step. Any overflow triggers a cap bump + re-trace (the static-shape analog
of the reference's growing pair arrays). Counts travel as int32 end-to-end.

Result codes (match SolverReturn):
  1 Successful, 2 InvalidInitialState, 3 TooManyIterations,
  4 TooManyArmijoIterations, 5 LinearSystemSolveFailure (or no-descent),
  6 TooManyInvalidIntermediateIterations
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from . import assembly, project
from .pcg import solve_pcg


def build_fused_solve(nm, engine):
    """Build the fused solve function closed over the NewtonsMethod
    evaluators and the (optional) contact engine. Returns f(u0, static_data,
    friction_data, glob, eng_state, th_vec, params) ->
    (u, packed_f32_stats, counts_i32) where params = dict of scalar
    tolerances."""

    energy = nm._energy
    egh = nm._energy_grad_hess
    ev = nm._ev
    s = nm.settings
    mirroring = s.project_to_pd_use_mirroring
    eps = s.projection_eps
    do_project = s.projection_mode.name == "ProjectedNewton"
    max_inv = s.max_backtracking_invalid_state_iterations
    max_bt = s.max_backtracking_armijo_iterations
    beta = s.line_search_armijo_beta
    enable_bt = s.enable_armijo_backtracking
    hvp_K = nm._hvp_K
    n_blocks = nm.n_blocks

    # monitor every capacity-bounded buffer for overflow; n_live_* keys are
    # metrics (live pair counts at build states), skipped by the cap check
    # in-program lagged-friction tables (the reference's once-per-step dt=0
    # pass, EnergyFrictionalContact.cpp:531-773) — removes the host friction
    # refresh and its device round trips entirely when friction is active
    use_ff = (engine is not None and nm.fused_friction
              and engine.friction_enabled_now())
    if engine is not None:
        cand_keys = engine.broad_count_keys() + engine.pair_count_keys()
        if use_ff:
            cand_keys += engine.friction_count_keys()
        r_max = engine.max_rigid_lever()
        n_soft = engine.n_soft
        isect_on = engine.model.global_params.intersection_test_enabled
    else:
        cand_keys = []
        r_max = 0.0
        n_soft = n_blocks
        isect_on = False
    count_keys = list(dict.fromkeys(cand_keys)) + ["hvp_pool", "direct_slots"]
    key_slot = {k: i for i, k in enumerate(count_keys)}
    hvp_pool_slot = key_slot["hvp_pool"]
    direct_slot = key_slot["direct_slots"]
    n_counts = len(count_keys)
    pool_cap = nm._pool_cap
    # dense direct linear solve for small scenes (assembly.direct_solve):
    # requires PSD element Hessians, so ProjectedNewton only
    use_direct = (s.projection_mode.name == "ProjectedNewton"
                  and n_blocks <= nm._direct_max_blocks)
    slot_cap = nm._slot_cap

    def _counts_arr(counts: dict):
        arr = jnp.zeros((n_counts,), jnp.int32)
        for k, v in counts.items():
            # max, not set: grid g_* keys can appear from both the contact
            # and the friction pipelines within one program
            arr = arr.at[key_slot[k]].max(v.astype(jnp.int32))
        return arr

    def _world(u, eng_state, dt, dtype):
        Vs, Vr = engine.world_from_u(u, eng_state, dt)
        if Vs is None:
            Vs = jnp.zeros((0, 3), dtype)
        if Vr is None:
            Vr = jnp.zeros((0, 3), dtype)
        return Vs, Vr

    def du_reach(du):
        """Exact world-displacement reach per unit line-search step: soft
        vertices move dt*|du_v|_2; rigid vertices add the angular lever
        |du_w|_2 * r_max (chord length 2 sin(phi/2)|r| <= phi |r|)."""
        m = jnp.zeros((), du.dtype)
        if n_soft > 0:
            m = jnp.sqrt(jnp.max(jnp.sum(du[:n_soft] ** 2, -1)))
        if n_blocks > n_soft:
            rw = du[n_soft:].reshape(-1, 2, 3)
            mv = jnp.sqrt(jnp.sum(rw[:, 0] ** 2, -1))
            mw = jnp.sqrt(jnp.sum(rw[:, 1] ** 2, -1))
            m = jnp.maximum(m, jnp.max(mv + mw * r_max))
        return m

    def fused_solve(u0, static_data, friction_data, glob, eng_state, th_vec,
                    params, M0):
        dt = glob["dt"]
        ftype = u0.dtype
        slack_p = params["slack_pair"]
        # position magnitude scale: one f32 position ulp is the smallest
        # world displacement a line-search trial can realize
        x_scale = (1.0 + jnp.max(jnp.abs(glob["x0"]))
                   if "x0" in glob else jnp.asarray(1.0, ftype))

        if use_ff:
            # dt=0 world positions (x1 = x0, rigid at q0/t0): the lagged
            # anchors freeze at the step-start state exactly like the
            # reference's before_time_step pass. mu rides in as a glob
            # argument so set_friction takes effect without a re-trace.
            zero_dt = jnp.asarray(0.0, u0.dtype)
            Vs0, Vr0 = engine.world_from_u(jnp.zeros_like(u0), eng_state,
                                           zero_dt)
            ff_tables, ff_counts = engine.friction_tables(
                Vs0, Vr0, th_vec, glob["mu_mat"], glob["contact_k"])
            friction_tabs = ff_tables
            counts_ff = _counts_arr(ff_counts)
        else:
            friction_tabs = friction_data
            counts_ff = jnp.zeros((n_counts,), jnp.int32)

        def full_data(tables):
            data = dict(static_data)
            data.update(tables)
            data.update(friction_tabs)
            return data

        def disp_from(V_pair, Vs, Vr):
            Vs_b, Vr_b = V_pair
            d2 = jnp.concatenate([
                jnp.sum((Vs - Vs_b) ** 2, -1),
                jnp.sum((Vr - Vr_b) ** 2, -1)])
            return jnp.sqrt(jnp.maximum(jnp.max(d2) if d2.shape[0] else 0.0, 0.0))

        def broad_build(u, du_ref):
            """The expensive collision call site: broad candidate buffers +
            intersection candidates within slack_b."""
            Vs, Vr = _world(u, eng_state, dt, ftype)
            # factor 2.5 so the [max] budget 0.45*slack covers a full
            # stride (needs slack >= 2.22*dt*du) with ~12% headroom; clamped
            # so the static candidate capacities can be sized for the
            # worst-case radius — past slack_broad_max the [max] stage
            # clamps the stride instead (extra Newton iterations, never
            # missed candidates)
            slack_b = jnp.clip(
                2.5 * dt * jnp.maximum(du_ref, params["du_floor"]),
                params["slack_broad_min"], params["slack_broad_max"])
            bcands, icands, counts = engine.broad_fn(Vs, Vr, th_vec, slack_b,
                                                     slack_p)
            return bcands, icands, (Vs, Vr), slack_b, _counts_arr(counts)

        def pair_build(u, bcands):
            """The cheap pair-shell build: exact distances over the frozen
            flat mid lists, routed into the family pair tables."""
            if engine is not None:
                Vs, Vr = _world(u, eng_state, dt, ftype)
                tables, counts = engine.pairs_fn(Vs, Vr, th_vec, bcands, slack_p)
                carr = _counts_arr(counts)
            else:
                Vs = jnp.zeros((0, 3), ftype)
                Vr = jnp.zeros((0, 3), ftype)
                tables = {}
                carr = jnp.zeros((n_counts,), jnp.int32)
            return tables, (Vs, Vr), carr

        def isect_hit(u, icands):
            """Exact intersection tests over the frozen candidates."""
            if engine is None or not isect_on:
                return jnp.zeros((), bool)
            Vs, Vr = _world(u, eng_state, dt, ftype)
            return engine._isect_exact(Vs, Vr, icands)

        # zero-valued initial pytrees with the build shapes (filled by the
        # iteration-0 rebuilds inside the loop)
        if engine is not None:
            b_sh = jax.eval_shape(broad_build, u0, jnp.zeros((), ftype))
            bcands0, icands0, Vb0, _s, _c = jax.tree_util.tree_map(
                lambda sd: jnp.zeros(sd.shape, sd.dtype), b_sh)
        else:
            bcands0, icands0 = {}, {}
            Vb0 = (jnp.zeros((0, 3), ftype), jnp.zeros((0, 3), ftype))
        p_sh = jax.eval_shape(pair_build, u0, bcands0)
        tables0, Vp0, _c = jax.tree_util.tree_map(
            lambda sd: jnp.zeros(sd.shape, sd.dtype), p_sh)

        class Carry(NamedTuple):
            u: jnp.ndarray
            it: jnp.ndarray
            res0: jnp.ndarray
            done: jnp.ndarray
            code: jnp.ndarray
            cg_total: jnp.ndarray
            ls_cap: jnp.ndarray
            ls_max: jnp.ndarray
            ls_inv: jnp.ndarray
            ls_bt: jnp.ndarray
            n_proj: jnp.ndarray
            n_hess: jnp.ndarray
            res: jnp.ndarray
            E0: jnp.ndarray
            stall: jnp.ndarray
            counts_max: jnp.ndarray
            bcands: dict
            icands: dict
            Vb: tuple
            slack_b: jnp.ndarray
            tables: dict
            Vp: tuple
            du_prev: jnp.ndarray
            force_rb: jnp.ndarray
            n_broad_rb: jnp.ndarray   # broad-shell rebuild count (stats)
            n_pair_rb: jnp.ndarray    # pair-shell rebuild count (stats)
            M: jnp.ndarray            # frozen dense-inverse preconditioner
            m_q: jnp.ndarray          # last NS residual max|I - Hs Ms|
            n_cold: jnp.ndarray       # NS cold-restart count (diagnostics)

        def cond(c: Carry):
            return jnp.logical_and(jnp.logical_not(c.done), c.it < params["max_iterations"])

        def body(c: Carry):
            u = c.u

            # ---- shell validity guards + conditional rebuilds ----
            if engine is not None:
                Vs, Vr = _world(u, eng_state, dt, ftype)
                disp_b = disp_from(c.Vb, Vs, Vr)
                disp_p = disp_from(c.Vp, Vs, Vr)
            else:
                disp_b = disp_p = jnp.zeros((), ftype)
            need_b = (c.it == 0) | c.force_rb | (disp_b > 0.45 * c.slack_b)

            if engine is not None:
                bcands, icands, Vb, slack_b, carr_b = lax.cond(
                    need_b,
                    lambda _: broad_build(u, c.du_prev),
                    lambda _: (c.bcands, c.icands, c.Vb, c.slack_b,
                               c.counts_max),
                    operand=None)
            else:
                bcands, icands, Vb, slack_b = c.bcands, c.icands, c.Vb, c.slack_b
                carr_b = c.counts_max
            counts_max = jnp.maximum(c.counts_max, carr_b)
            disp_b = jnp.where(need_b, 0.0, disp_b)

            need_p = need_b | (disp_p > 0.45 * slack_p)
            tables, Vp, carr_p = lax.cond(
                need_p,
                lambda _: pair_build(u, bcands),
                lambda _: (c.tables, c.Vp, counts_max),
                operand=None)
            counts_max = jnp.maximum(counts_max, carr_p)

            # initial-state validity (reference: before the loop,
            # NewtonsMethod.cpp:28-40); here at it==0 over fresh candidates
            init_bad = lax.cond(
                c.it == 0, lambda _: isect_hit(u, icands),
                lambda _: jnp.zeros((), bool), operand=None)

            data = full_data(tables)
            E0, aux, grad, hess = egh(u, data, glob)
            # rounding-noise floors (quadrature form, see assembly.py):
            # energy differences below eps*sqrt(sum e_i^2) and residuals
            # below eps*sqrt(max_block sum g_e^2) are unresolvable at this
            # dtype — the smallest quantities the evaluation can certify
            noise = (jnp.finfo(ftype).eps * jnp.sqrt(aux["e_nsq"])).astype(ftype)
            res_noise = (jnp.finfo(ftype).eps
                         * jnp.sqrt(aux["g_nsq"])).astype(ftype)
            res = jnp.max(jnp.abs(grad))
            res0 = jnp.where(c.it == 0, res, c.res0)

            past_min = c.it >= params["min_iterations"]
            # energy-stall convergence: two consecutive accepted iterations
            # whose energy improvement is below the rounding-noise floor —
            # the optimizer cannot certify further progress at this dtype.
            stalled = (c.it > 0) & ((c.E0 - E0) < noise.astype(E0.dtype))
            stall = jnp.where(stalled, c.stall + 1, 0).astype(jnp.int32)
            # residual acceptance: every component below the configured
            # absolute tolerance OR below its per-block backward-error
            # floor (eps * sum|H_row| * velocity-scale of one position
            # ulp): residual structure below that floor is indistinguishable
            # from rounding the positions themselves, so grinding further
            # wastes iterations on noise (the f32 cancellation floor). In
            # f64 the floor is ~1e9x lower and the abs tolerance governs,
            # matching the reference. The blunt rel-1e-3 fallback this
            # replaces accepted genuinely under-converged states.
            vscale = jnp.maximum(jnp.max(jnp.abs(u)), x_scale / dt)
            g_floor = jnp.finfo(ftype).eps * vscale * aux["hsum"]
            res_ok = jnp.all(jnp.abs(grad) <= jnp.maximum(
                params["residual_tolerance_abs"], 4.0 * g_floor))
            conv = (res < params["bailout_residual"]) \
                | (past_min & res_ok) \
                | (past_min & (c.it > 0)
                   & (res / jnp.maximum(res0, 1e-30) < params["residual_tolerance_rel"])) \
                | (past_min & (stall >= 2))

            # PD projection (NewtonsMethod.cpp:254-352, ProjectedNewton
            # mode): static families project per family (native dims, PSD
            # families skipped); the dynamic families first select their
            # NONZERO-Hessian rows at the current iterate (live_select —
            # barrier Hessians are exactly zero outside dhat) so projection
            # and CG cost scale with live pairs, not shell capacities.
            stat_names, _dyn_names = ev.split_dyn(hess.keys())
            hess_stat = {n: hess[n] for n in stat_names}
            conn_dyn = ev.dyn_conn_cat(data)
            H_dyn = ev.dyn_hess_cat(hess)
            conn_live, H_live, live_valid, live_cnt = ev.live_select(
                conn_dyn, H_dyn, pool_cap)
            counts_max = counts_max.at[hvp_pool_slot].max(
                live_cnt.astype(jnp.int32))
            if do_project:
                hess_stat_p, n_proj = project.project_all(
                    hess_stat, eps, mirroring,
                    {n: data[n] for n in stat_names},
                    jacobi_sweeps=nm._jacobi_sweeps,
                    psd_names=nm._psd_names)
                if pool_cap:
                    H_live, ch = project.project_family_to_pd(
                        H_live, eps, mirroring, elem_mask=live_valid,
                        jacobi_sweeps=nm._jacobi_sweeps)
                    n_proj = n_proj + jnp.sum(ch.astype(jnp.int32))
            else:
                hess_stat_p, n_proj = hess_stat, jnp.zeros((), jnp.int32)
            n_hess = (project.count_elements(hess_stat, data)
                      + jnp.minimum(live_cnt, pool_cap).astype(jnp.int32))

            # PCG with forcing sequence (NewtonsMethod.cpp:423) over the
            # pooled single-bucket layout: the scatter rows and pool
            # selection are frozen with the pair topology, only the element
            # Hessians are re-consolidated per iteration.
            conn_cat, H_cat = ev.cat_with_live(
                ev.cat_static_conn(data), hess_stat_p, conn_live, H_live)
            rows = ev.scatter_rows(conn_cat)
            if use_direct:
                # small scenes: PERSISTENT dense-inverse preconditioner
                # tracked by Newton-Schulz sweeps (assembly.ns_refresh):
                # M ~= H^-1 is carried across iterations AND time steps
                # (passed in as M0, returned to the host handle), refreshed
                # with one warm GEMM sweep whenever the pair shell rebuilds
                # — the moments H actually jumps (new barrier rows). The
                # cold start / hardening-jump path re-seeds from
                # I/||Hs||_inf inside the same program. Replaces the
                # per-broad-rebuild Cholesky + n-RHS triangular solve
                # (~48 ms measured at n=3.3k) with ~2-4 ms of MXU work,
                # and keeps CG at a handful of iterations instead of the
                # 30+/Newton a stale frozen inverse caused.
                def _refresh_m(_):
                    return ev.ns_refresh(c.M, conn_cat, H_cat)

                need_m = need_p | (c.m_q > 0.5)
                M, m_q, was_cold = lax.cond(
                    need_m,
                    _refresh_m,
                    lambda _: (c.M, c.m_q, jnp.zeros((), bool)),
                    operand=None)
                n_cold = c.n_cold + was_cold.astype(jnp.int32)
                D = ev.diag_bucket(conn_cat, H_cat)
                Dinv = assembly.precondition_inverse(D)
                m_good = m_q < 0.5

                def Minv(r):
                    qd = ev.apply_dense_perm(M, r)
                    qj = assembly.apply_preconditioner(Dinv, r)
                    return jnp.where(m_good, qd, qj)
            else:
                M, m_q, n_cold = c.M, c.m_q, c.n_cold
                D = ev.diag_bucket(conn_cat, H_cat)
                Dinv = assembly.precondition_inverse(D)
                Minv = lambda r: assembly.apply_preconditioner(Dinv, r)
            forcing = jnp.minimum(
                1e-2, res * jnp.minimum(0.5, jnp.sqrt(res)))
            abs_tol = jnp.maximum(forcing, params["cg_abs_tolerance"])
            A = lambda p: ev.hvp_bucket(p, conn_cat, H_cat, rows)
            cg = solve_pcg(A, Minv, -grad, abs_tol,
                           params["cg_rel_tolerance"],
                           s.cg_max_iterations, s.cg_stop_on_indefiniteness)
            du = cg.x
            cg_n = cg.n_iterations
            cg_ok = cg.converged
            dug = jnp.vdot(du, grad)
            du_max = jnp.max(jnp.abs(du))
            reach_du = du_reach(du)
            step_conv = past_min & (du_max < params["step_tolerance"])
            # Newton-decrement convergence at the precision noise floor
            dec_conv = jnp.abs(dug) < 4.0 * noise
            lin_fail = jnp.logical_not(cg_ok) \
                | ((dug >= 0.0) & jnp.logical_not(dec_conv))

            # -------- line search (NewtonsMethod.cpp:459-641) --------
            # [cap]
            capped = du_max > params["step_cap"]
            retraction = jnp.where(capped, params["step_cap"] / jnp.maximum(du_max, 1e-30), 1.0)

            # [max]: clamp the step so the line search cannot overrun the
            # broad-shell slack budget (intersection-candidate validity is
            # exact); when it clamps, flag a broad rebuild so the next
            # iteration restores full stride
            reach = dt * reach_du * retraction
            budget = jnp.maximum(0.45 * slack_b - disp_b, 0.0) \
                if engine is not None else jnp.asarray(jnp.inf, ftype)
            max_step = jnp.where(reach > budget,
                                 budget / jnp.maximum(reach, 1e-30), 1.0)
            maxed = max_step < 1.0
            retraction = retraction * max_step
            force_rb = maxed
            du_ls = du * retraction

            # [inv]: exact intersection tests over frozen candidates
            def valid_at(step):
                return jnp.logical_not(isect_hit(u + step * du_ls, icands))

            def inv_cond(t):
                step, i, valid = t
                return jnp.logical_not(valid) & (i < max_inv)

            def inv_body(t):
                step, i, _ = t
                step = step * 0.5
                return (step, i + 1, valid_at(step))

            step0 = jnp.ones((), ftype)
            step, inv_it, inv_valid = lax.while_loop(
                inv_cond, inv_body,
                (step0, jnp.zeros((), jnp.int32), valid_at(step0)))
            inv_fail = jnp.logical_not(inv_valid)

            # [bt] Armijo over the frozen tables: the energies re-derive
            # distances from the trial DOFs (clamped at dhat), so no table
            # refresh is needed at trial states
            def energy_at(step):
                return energy(u + step * du_ls, data, glob)

            expected = beta * dug * retraction
            if enable_bt:
                # Armijo reference energy from the SAME energy-only program
                # as the trial energies (fusion-rounding bias cancellation)
                E0a = energy(u, data, glob)

                # halvings below one position ulp cannot change any
                # coordinate at this dtype: stop probing there (the
                # exhaustion verdict below then applies)
                disp1 = dt * reach_du * retraction  # world stride at step=1
                step_floor = jnp.finfo(ftype).eps * x_scale \
                    / jnp.maximum(disp1, 1e-30)

                # noise-tolerant Armijo: accepting within one noise floor
                # keeps the reference semantics wherever differences are
                # resolvable
                def bt_cond(t):
                    step, j, E1 = t
                    return (E1 >= E0a + expected * step + noise) \
                        & (j < max_bt) & (step > step_floor)

                def bt_body(t):
                    step, j, _ = t
                    step = step * 0.5
                    return (step, j + 1, energy_at(step))

                step, bt_it, _E1 = lax.while_loop(
                    bt_cond, bt_body,
                    (step, jnp.zeros((), jnp.int32), energy_at(step)))
                bt_exhausted = (_E1 >= E0a + expected * step + noise) \
                    & ((bt_it >= max_bt) | (step <= step_floor))
                # f32: exhausting the NOISE-TOLERANT Armijo means no probed
                # step down to sub-ulp displacements decreased the energy
                # beyond its rounding floor: the f32 gradient's descent claim
                # is cancellation noise (measured: at res ~6e-4 the true
                # directional derivative was +1.6e-4 vs dug=-2.4e-6) and the
                # state is converged at dtype resolution — NOT a line-search
                # failure. f64 never reaches this floor legitimately (its
                # noise sits ~1e9x lower), so there exhaustion keeps the
                # reference's failure semantics: code 4 ->
                # TooManyArmijoIterations -> adaptive-dt halving
                # (NewtonsMethod.cpp:594-641, Stark.cpp:227-240).
                _is_f32 = jnp.dtype(ftype) == jnp.dtype(jnp.float32)
                if _is_f32:
                    bt_fail = jnp.zeros((), bool)
                    bt_conv = bt_exhausted
                else:
                    bt_fail = bt_exhausted
                    bt_conv = jnp.zeros((), bool)
            else:
                bt_it = jnp.zeros((), jnp.int32)
                bt_fail = jnp.zeros((), bool)
                bt_conv = jnp.zeros((), bool)

            u_new = u + step * du_ls

            # outcome resolution, in the reference's order of checks
            done = init_bad | conv | lin_fail | step_conv | dec_conv \
                | inv_fail | bt_fail | bt_conv
            code = jnp.where(init_bad, 2,
                   jnp.where(conv | step_conv | dec_conv | bt_conv, 1,
                   jnp.where(lin_fail, 5,
                   jnp.where(inv_fail, 6,
                   jnp.where(bt_fail, 4, 0))))).astype(jnp.int32)
            # on residual/step/decrement/sub-noise convergence the state is
            # NOT advanced
            u_out = jnp.where(init_bad | conv | step_conv | dec_conv
                              | bt_conv | lin_fail, u, u_new)

            return Carry(
                u=u_out, it=c.it + 1, res0=res0, done=done, code=code,
                cg_total=c.cg_total + cg_n,
                ls_cap=c.ls_cap + capped.astype(jnp.int32),
                ls_max=c.ls_max + maxed.astype(jnp.int32),
                ls_inv=c.ls_inv + inv_it,
                ls_bt=c.ls_bt + bt_it,
                n_proj=c.n_proj + n_proj.astype(jnp.int32),
                n_hess=c.n_hess + n_hess.astype(jnp.int32),
                res=res, E0=E0, stall=stall, counts_max=counts_max,
                bcands=bcands, icands=icands, Vb=Vb, slack_b=slack_b,
                tables=tables, Vp=Vp,
                du_prev=reach_du, force_rb=force_rb,
                n_broad_rb=c.n_broad_rb + need_b.astype(jnp.int32),
                n_pair_rb=c.n_pair_rb + need_p.astype(jnp.int32),
                M=M, m_q=m_q, n_cold=n_cold,
            )

        z32 = jnp.zeros((), jnp.int32)
        zf = jnp.zeros((), ftype)
        # E0 carries the f64-accumulated total energy (assembly._ACC)
        init = Carry(u=u0, it=z32, res0=zf, done=jnp.zeros((), bool),
                     code=z32, cg_total=z32, ls_cap=z32, ls_max=z32,
                     ls_inv=z32, ls_bt=z32,
                     n_proj=z32, n_hess=z32, res=zf, E0=jnp.zeros((), jnp.float64),
                     stall=z32, counts_max=counts_ff,
                     bcands=bcands0, icands=icands0, Vb=Vb0, slack_b=zf,
                     tables=tables0, Vp=Vp0,
                     du_prev=params["du_prior"].astype(ftype),
                     force_rb=jnp.zeros((), bool),
                     n_broad_rb=z32, n_pair_rb=z32,
                     M=(M0 if use_direct
                        else jnp.zeros((0, 0), ftype)),
                     m_q=jnp.asarray(1e9, ftype), n_cold=z32)
        final = lax.while_loop(cond, body, init)
        # loop exhausted without done -> TooManyIterations (or success if configured)
        exhausted = jnp.logical_not(final.done)
        code = jnp.where(exhausted,
                         jnp.asarray(1 if s.max_iterations_as_success else 3, jnp.int32),
                         final.code)
        # converged-state intersection validity folded in (the reference
        # re-checks it after success, EnergyFrictionalContact.cpp:25); the
        # final state is within the slack budget of the frozen candidates by
        # construction. Host maps code 9 -> InvalidConvergedState.
        conv_hit = isect_hit(final.u, final.icands)
        conv_bad = (code == 1) & conv_hit
        code = jnp.where(conv_bad, 9, code)
        # single packed stats vector + the int32 counts vector: the host pulls
        # exactly one transfer of (u, stats, counts)
        packed = jnp.stack([
            code.astype(jnp.float32), final.it.astype(jnp.float32),
            final.cg_total.astype(jnp.float32),
            final.ls_cap.astype(jnp.float32), final.ls_max.astype(jnp.float32),
            final.ls_inv.astype(jnp.float32),
            final.ls_bt.astype(jnp.float32), final.n_proj.astype(jnp.float32),
            final.n_hess.astype(jnp.float32), final.res.astype(jnp.float32),
            final.E0.astype(jnp.float32), final.du_prev.astype(jnp.float32),
            final.n_broad_rb.astype(jnp.float32),
            final.n_pair_rb.astype(jnp.float32),
            final.m_q.astype(jnp.float32),
            final.n_cold.astype(jnp.float32),
        ])
        # final.M rides back to the host HANDLE (never copied off-device):
        # the next solve's warm Newton-Schulz seed
        return final.u, packed, final.counts_max, final.M

    return fused_solve, count_keys
