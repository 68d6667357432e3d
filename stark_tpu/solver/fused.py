"""Fully fused device-side Newton solve: one dispatch per time step.

Motivation: on this TPU setup every device->host synchronization costs
seconds over the remote relay while async dispatches cost microseconds, so
the staged host-driven Newton loop (6-15 syncs per iteration) is latency
bound. This module compiles the ENTIRE solve — contact-table refresh, energy/
gradient/Hessian, PD projection, matrix-free BDPCG, and both line-search
stages — into a single `lax.while_loop` program. The host pulls one small
scalar vector per step and runs only the rare retry-ladder decisions
(dt halving, stiffness hardening, converged-state validity), exactly the
host/device cut SURVEY.md §7 prescribes.

Semantics match NewtonsMethod.cpp:28-641 for the fused-eligible
configuration: ProjectedNewton (or pure Newton) projection, BDPCG linear
solver, default residual, no user max-step/convergence callbacks. Other
configurations take the staged path.

Overflow accounting: every candidate-buffer count produced anywhere in the
solve — the per-iteration contact refresh, every Armijo-trial refresh, every
intersection test (initial, per-inv-trial, converged) — is max-folded into
one int32 vector the host checks after the step. Any overflow triggers a cap
bump + re-trace (the static-shape analog of the reference's growing pair
arrays). Counts travel as int32 end-to-end: float32 packing would lose
integer exactness above 2^24 and misjudge near-cap comparisons.

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
    """Build the fused solve function closed over the NewtonsMethod evaluators
    and the (optional) contact engine. Returns f(u0, static_data,
    friction_data, glob, eng_state, th_vec, params) ->
    (u, packed_f32_stats, counts_i32) where params = dict of scalar
    tolerances."""

    energy = nm._energy
    egh = nm._energy_grad_hess
    hvp_context = nm._ev.hvp_context
    hvp_ctx = nm._ev.hvp_ctx
    diag_blocks_ctx = nm._ev.diag_blocks_ctx
    s = nm.settings
    mirroring = s.project_to_pd_use_mirroring
    eps = s.projection_eps
    do_project = s.projection_mode.name == "ProjectedNewton"
    max_inv = s.max_backtracking_invalid_state_iterations
    max_bt = s.max_backtracking_armijo_iterations
    beta = s.line_search_armijo_beta
    enable_bt = s.enable_armijo_backtracking

    # monitor every capacity-bounded buffer for overflow (any triggers a
    # host-side cap bump + re-trace): exact pair buffers, broad-phase
    # candidate buffers, and intersection candidate buffers
    if engine is not None:
        ct_keys = sorted(engine.contact_count_keys())
        i_keys = sorted(engine.intersect_count_keys()) \
            if engine.model.global_params.intersection_test_enabled else []
    else:
        ct_keys, i_keys = [], []
    # hvp_deg: max rows-per-block degree of the CG gather table (overflow ->
    # the host doubles nm._hvp_K and re-traces)
    count_keys = ct_keys + i_keys + ["hvp_deg"]
    hvp_deg_slot = len(count_keys) - 1
    hvp_K = nm._hvp_K
    n_counts = max(len(count_keys), 1)

    def _zero_counts():
        return jnp.zeros((n_counts,), jnp.int32)

    def contact_tables(u, eng_state, dt, th_vec):
        if engine is None:
            return {}, _zero_counts()
        g = engine.glob_from_u(u, eng_state, dt)
        data, counts = engine._contacts_fn(g, th_vec)
        arr = _zero_counts()
        for k_i, k in enumerate(ct_keys):
            arr = arr.at[k_i].set(counts[k].astype(jnp.int32))
        return data, arr

    def has_intersection(u, eng_state, dt):
        """Returns (hit, counts) with intersection candidate counts folded
        into the shared count vector (zeros elsewhere)."""
        if engine is None or not engine.model.global_params.intersection_test_enabled:
            return jnp.zeros((), bool), _zero_counts()
        g = engine.glob_from_u(u, eng_state, dt)
        hit, counts = engine._intersect_fn(g)
        arr = _zero_counts()
        for k_i, k in enumerate(i_keys):
            arr = arr.at[len(ct_keys) + k_i].set(counts[k].astype(jnp.int32))
        return hit, arr

    def full_data(u, static_data, friction_data, glob, eng_state, th_vec):
        cdata, counts = contact_tables(u, eng_state, glob["dt"], th_vec)
        data = dict(static_data)
        data.update(cdata)
        data.update(friction_data)
        return data, counts

    def fused_solve(u0, static_data, friction_data, glob, eng_state, th_vec, params):
        dt = glob["dt"]
        ftype = u0.dtype

        init_bad, init_counts = has_intersection(u0, eng_state, dt)

        class Carry(NamedTuple):
            u: jnp.ndarray
            it: jnp.ndarray
            res0: jnp.ndarray
            done: jnp.ndarray
            code: jnp.ndarray
            cg_total: jnp.ndarray
            ls_cap: jnp.ndarray
            ls_inv: jnp.ndarray
            ls_bt: jnp.ndarray
            n_proj: jnp.ndarray
            n_hess: jnp.ndarray
            res: jnp.ndarray
            E0: jnp.ndarray
            stall: jnp.ndarray
            counts_max: jnp.ndarray

        def cond(c: Carry):
            return jnp.logical_and(jnp.logical_not(c.done), c.it < params["max_iterations"])

        def body(c: Carry):
            u = c.u
            data, counts = full_data(u, static_data, friction_data, glob,
                                     eng_state, th_vec)
            counts_max = jnp.maximum(c.counts_max, counts)
            E0, E_abs, grad, hess = egh(u, data, glob)
            # rounding-noise floor of any energy difference at this state:
            # each per-element energy carries ~eps(dtype)*|e_i| of rounding,
            # so differences below eps*sum|e_i| are unresolvable
            noise = (jnp.finfo(ftype).eps * E_abs).astype(ftype)
            res = jnp.max(jnp.abs(grad))
            res0 = jnp.where(c.it == 0, res, c.res0)

            past_min = c.it >= params["min_iterations"]
            # energy-stall convergence: two consecutive accepted iterations
            # whose energy improvement is below the rounding-noise floor —
            # the optimizer cannot certify further progress at this dtype.
            # (Companion of the noise-tolerant Armijo below: accepting
            # noise-level steps must not let the loop spin forever.)
            stalled = (c.it > 0) & ((c.E0 - E0) < noise.astype(E0.dtype))
            stall = jnp.where(stalled, c.stall + 1, 0).astype(jnp.int32)
            conv = (res < params["bailout_residual"]) \
                | (past_min & (res < params["residual_tolerance_abs"])) \
                | (past_min & (c.it > 0)
                   & (res / jnp.maximum(res0, 1e-30) < params["residual_tolerance_rel"])) \
                | (past_min & (stall >= 2))

            # PD projection (NewtonsMethod.cpp:254-352, ProjectedNewton mode)
            if do_project:
                hess_p, n_proj = project.project_all(
                    hess, eps, mirroring, data, jacobi_sweeps=nm._jacobi_sweeps)
            else:
                hess_p, n_proj = hess, jnp.zeros((), jnp.int32)
            n_hess = project.count_elements(hess, data)

            # BDPCG with forcing sequence (NewtonsMethod.cpp:423); the
            # arity-consolidated Hvp context + gather-based scatter table are
            # built once per Newton iteration and reused across all CG
            # iterations (each iteration is then scatter-free)
            forcing = jnp.minimum(1e-2, res * jnp.minimum(0.5, jnp.sqrt(res)))
            abs_tol = jnp.maximum(forcing, params["cg_abs_tolerance"])
            ctx = hvp_context(data, hess_p)
            entry, _R, max_deg = nm._ev.scatter_table(ctx, hvp_K)
            counts_max = counts_max.at[hvp_deg_slot].max(max_deg.astype(jnp.int32))
            D = diag_blocks_ctx(ctx)
            Dinv = assembly.precondition_inverse(D)
            A = lambda p: nm._ev.hvp_table(p, ctx, entry)
            Minv = lambda r: assembly.apply_preconditioner(Dinv, r)
            cg = solve_pcg(A, Minv, -grad, abs_tol, params["cg_rel_tolerance"],
                           s.cg_max_iterations, s.cg_stop_on_indefiniteness)
            du = cg.x
            dug = jnp.vdot(du, grad)
            du_max = jnp.max(jnp.abs(du))
            step_conv = past_min & (du_max < params["step_tolerance"])
            # Newton-decrement convergence at the precision noise floor:
            # when the certifiable decrease |g.du| is below a few ulps of
            # the energy sum, no further progress is resolvable at this
            # dtype — the f64 reference exits via residual_tolerance long
            # before this (eps64*E_abs ~ 1e-19), so parity is unaffected;
            # under f32 it is what ends quasi-static steps whose gradient
            # noise floor sits above residual_tolerance_abs.
            dec_conv = jnp.abs(dug) < 4.0 * noise
            lin_fail = jnp.logical_not(cg.converged) \
                | ((dug >= 0.0) & jnp.logical_not(dec_conv))

            # -------- line search (NewtonsMethod.cpp:459-641) --------
            # [cap]
            capped = du_max > params["step_cap"]
            retraction = jnp.where(capped, params["step_cap"] / jnp.maximum(du_max, 1e-30), 1.0)
            du_ls = du * retraction

            # [inv]
            def valid_at(step):
                hit, cnt = has_intersection(u + step * du_ls, eng_state, dt)
                return jnp.logical_not(hit), cnt

            def inv_cond(t):
                step, i, valid, _ = t
                return jnp.logical_not(valid) & (i < max_inv)

            def inv_body(t):
                step, i, _, cmax = t
                step = step * 0.5
                valid, cnt = valid_at(step)
                return (step, i + 1, valid, jnp.maximum(cmax, cnt))

            step0 = jnp.ones((), ftype)
            v0, c0 = valid_at(step0)
            step, inv_it, inv_valid, counts_max = lax.while_loop(
                inv_cond, inv_body,
                (step0, jnp.zeros((), jnp.int32), v0, jnp.maximum(counts_max, c0)))
            inv_fail = jnp.logical_not(inv_valid)

            # [bt] Armijo with contact-table refresh per trial; refresh counts
            # fold into counts_max so overflow at a trial state (which would
            # silently drop pairs and underestimate the trial energy) also
            # triggers the host cap-bump re-trace
            def energy_at(step):
                ut = u + step * du_ls
                d2, cnt = full_data(ut, static_data, friction_data, glob,
                                    eng_state, th_vec)
                return energy(ut, d2, glob), cnt

            expected = beta * dug * retraction
            if enable_bt:
                # Armijo reference energy from the SAME energy-only program
                # as the trial energies: under f32 the egh program's E and
                # the energy-only program's E differ by a systematic
                # fusion-rounding bias (~1e-7 relative, i.e. larger than
                # beta*dug near convergence), which made every trial look
                # like an increase. Same-program evaluation cancels it.
                E0a = energy(u, data, glob)

                # noise-tolerant Armijo: the sufficient-decrease term
                # beta*dug*step is orders below the energy rounding noise,
                # so the raw test degenerates to a coin flip on noise near
                # flat regions; accepting within one noise floor keeps the
                # reference semantics wherever differences are resolvable
                def bt_cond(t):
                    step, j, E1, _ = t
                    return (E1 >= E0a + expected * step + noise) & (j < max_bt)

                def bt_body(t):
                    step, j, _, cmax = t
                    step = step * 0.5
                    E1, cnt = energy_at(step)
                    return (step, j + 1, E1, jnp.maximum(cmax, cnt))

                E1_0, cbt0 = energy_at(step)
                step, bt_it, _E1, counts_max = lax.while_loop(
                    bt_cond, bt_body,
                    (step, jnp.zeros((), jnp.int32), E1_0,
                     jnp.maximum(counts_max, cbt0)))
                bt_fail = (bt_it >= max_bt) & (_E1 >= E0a + expected * step + noise)
            else:
                bt_it = jnp.zeros((), jnp.int32)
                bt_fail = jnp.zeros((), bool)

            u_new = u + step * du_ls

            # outcome resolution, in the reference's order of checks
            done = conv | lin_fail | step_conv | dec_conv | inv_fail | bt_fail
            code = jnp.where(conv | step_conv | dec_conv, 1,
                   jnp.where(lin_fail, 5,
                   jnp.where(inv_fail, 6,
                   jnp.where(bt_fail, 4, 0)))).astype(jnp.int32)
            # on residual/step/decrement convergence the state is NOT advanced
            u_out = jnp.where(conv | step_conv | dec_conv | lin_fail, u, u_new)

            return Carry(
                u=u_out, it=c.it + 1, res0=res0, done=done, code=code,
                cg_total=c.cg_total + cg.n_iterations,
                ls_cap=c.ls_cap + capped.astype(jnp.int32),
                ls_inv=c.ls_inv + inv_it,
                ls_bt=c.ls_bt + bt_it,
                n_proj=c.n_proj + n_proj.astype(jnp.int32),
                n_hess=c.n_hess + n_hess.astype(jnp.int32),
                res=res, E0=E0, stall=stall, counts_max=counts_max,
            )

        z32 = jnp.zeros((), jnp.int32)
        zf = jnp.zeros((), ftype)
        # E0 carries the f64-accumulated total energy (assembly._ACC)
        init = Carry(u=u0, it=z32, res0=zf, done=init_bad,
                     code=jnp.where(init_bad, 2, 0).astype(jnp.int32),
                     cg_total=z32, ls_cap=z32, ls_inv=z32, ls_bt=z32,
                     n_proj=z32, n_hess=z32, res=zf, E0=jnp.zeros((), jnp.float64),
                     stall=z32, counts_max=init_counts)
        final = lax.while_loop(cond, body, init)
        # loop exhausted without done -> TooManyIterations (or success if configured)
        exhausted = jnp.logical_not(final.done)
        code = jnp.where(exhausted,
                         jnp.asarray(1 if s.max_iterations_as_success else 3, jnp.int32),
                         final.code)
        # converged-state intersection validity folded in (the reference
        # re-checks it after success, EnergyFrictionalContact.cpp:25);
        # host maps code 9 -> InvalidConvergedState
        conv_hit, conv_counts = has_intersection(final.u, eng_state, dt)
        conv_bad = (code == 1) & conv_hit
        code = jnp.where(conv_bad, 9, code)
        counts_max = jnp.maximum(final.counts_max, conv_counts)
        # single packed stats vector + the int32 counts vector: the host pulls
        # exactly one transfer of (u, stats, counts)
        packed = jnp.stack([
            code.astype(jnp.float32), final.it.astype(jnp.float32),
            final.cg_total.astype(jnp.float32),
            final.ls_cap.astype(jnp.float32), final.ls_inv.astype(jnp.float32),
            final.ls_bt.astype(jnp.float32), final.n_proj.astype(jnp.float32),
            final.n_hess.astype(jnp.float32), final.res.astype(jnp.float32),
            final.E0.astype(jnp.float32),
        ])
        return final.u, packed, counts_max

    return fused_solve, count_keys
