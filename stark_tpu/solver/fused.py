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


class FusedOut(NamedTuple):
    u: jnp.ndarray
    code: jnp.ndarray            # int32 result code
    scalars: jnp.ndarray         # [newton_it, cg_total, ls_cap, ls_inv, ls_bt,
                                 #  n_proj, n_hess, residual, E0]
    counts: jnp.ndarray          # contact-pair counts (max over iterations)
    count_keys: tuple = ()


def build_fused_solve(nm, engine):
    """Build the fused solve function closed over the NewtonsMethod evaluators
    and the (optional) contact engine. Returns f(u0, static_data,
    friction_data, glob, eng_state, dhat_mat, params) -> FusedOut where
    params = dict of scalar tolerances."""

    energy = nm._energy
    egh = nm._energy_grad_hess
    hvp = nm._hvp
    diag_blocks = nm._diag_blocks
    s = nm.settings
    mirroring = s.project_to_pd_use_mirroring
    eps = s.projection_eps
    do_project = s.projection_mode.name == "ProjectedNewton"
    max_inv = s.max_backtracking_invalid_state_iterations
    max_bt = s.max_backtracking_armijo_iterations
    beta = s.line_search_armijo_beta
    enable_bt = s.enable_armijo_backtracking

    # monitor both the exact-pair buffers and the broad-phase candidate
    # buffers for overflow (either triggers a host-side cap bump + re-trace)
    count_keys = (sorted(engine._blocks()) + sorted("c_" + b for b in engine._blocks())
                  ) if engine is not None else []

    def contact_tables(u, eng_state, dt, dhat_mat):
        if engine is None:
            return {}, jnp.zeros((max(len(count_keys), 1),), jnp.int32)
        g = engine.glob_from_u(u, eng_state, dt)
        data, counts = engine._contacts_fn(g, dhat_mat)
        arr = jnp.stack([counts[k] for k in count_keys]).astype(jnp.int32)
        return data, arr

    def has_intersection(u, eng_state, dt):
        if engine is None or not engine.model.global_params.intersection_test_enabled:
            return jnp.zeros((), bool)
        g = engine.glob_from_u(u, eng_state, dt)
        return engine._intersect_fn(g)

    def full_data(u, static_data, friction_data, glob, eng_state, dhat_mat):
        cdata, counts = contact_tables(u, eng_state, glob["dt"], dhat_mat)
        data = dict(static_data)
        data.update(cdata)
        data.update(friction_data)
        return data, counts

    def fused_solve(u0, static_data, friction_data, glob, eng_state, dhat_mat, params):
        dt = glob["dt"]
        ftype = u0.dtype

        init_bad = has_intersection(u0, eng_state, dt)

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
            counts_max: jnp.ndarray

        def cond(c: Carry):
            return jnp.logical_and(jnp.logical_not(c.done), c.it < params["max_iterations"])

        def body(c: Carry):
            u = c.u
            data, counts = full_data(u, static_data, friction_data, glob,
                                     eng_state, dhat_mat)
            counts_max = jnp.maximum(c.counts_max, counts)
            E0, grad, hess = egh(u, data, glob)
            res = jnp.max(jnp.abs(grad))
            res0 = jnp.where(c.it == 0, res, c.res0)

            past_min = c.it >= params["min_iterations"]
            conv = (res < params["bailout_residual"]) \
                | (past_min & (res < params["residual_tolerance_abs"])) \
                | (past_min & (c.it > 0)
                   & (res / jnp.maximum(res0, 1e-30) < params["residual_tolerance_rel"]))

            # PD projection (NewtonsMethod.cpp:254-352, ProjectedNewton mode)
            if do_project:
                hess_p, n_proj = project.project_all(hess, eps, mirroring, data)
            else:
                hess_p, n_proj = hess, jnp.zeros((), jnp.int32)
            n_hess = project.count_elements(hess, data)

            # BDPCG with forcing sequence (NewtonsMethod.cpp:423)
            forcing = jnp.minimum(1e-2, res * jnp.minimum(0.5, jnp.sqrt(res)))
            abs_tol = jnp.maximum(forcing, params["cg_abs_tolerance"])
            D = diag_blocks(data, hess_p)
            Dinv = assembly.precondition_inverse(D)
            A = lambda p: hvp(p, data, hess_p)
            Minv = lambda r: assembly.apply_preconditioner(Dinv, r)
            cg = solve_pcg(A, Minv, -grad, abs_tol, params["cg_rel_tolerance"],
                           s.cg_max_iterations, s.cg_stop_on_indefiniteness)
            du = cg.x
            dug = jnp.vdot(du, grad)
            lin_fail = jnp.logical_not(cg.converged) | (dug >= 0.0)
            du_max = jnp.max(jnp.abs(du))
            step_conv = past_min & (du_max < params["step_tolerance"])

            # -------- line search (NewtonsMethod.cpp:459-641) --------
            # [cap]
            capped = du_max > params["step_cap"]
            retraction = jnp.where(capped, params["step_cap"] / jnp.maximum(du_max, 1e-30), 1.0)
            du_ls = du * retraction

            # [inv]
            def valid_at(step):
                return jnp.logical_not(has_intersection(u + step * du_ls, eng_state, dt))

            def inv_cond(t):
                step, i, valid = t
                return jnp.logical_not(valid) & (i < max_inv)

            def inv_body(t):
                step, i, _ = t
                step = step * 0.5
                return (step, i + 1, valid_at(step))

            step0 = jnp.ones((), ftype)
            step, inv_it, inv_valid = lax.while_loop(
                inv_cond, inv_body, (step0, jnp.zeros((), jnp.int32), valid_at(step0)))
            inv_fail = jnp.logical_not(inv_valid)

            # [bt] Armijo with contact-table refresh per trial
            def energy_at(step):
                ut = u + step * du_ls
                d2, _ = full_data(ut, static_data, friction_data, glob,
                                  eng_state, dhat_mat)
                return energy(ut, d2, glob)

            expected = beta * dug * retraction
            if enable_bt:
                def bt_cond(t):
                    step, j, E1 = t
                    return (E1 >= E0 + expected * step) & (j < max_bt)

                def bt_body(t):
                    step, j, _ = t
                    step = step * 0.5
                    return (step, j + 1, energy_at(step))

                step, bt_it, _E1 = lax.while_loop(
                    bt_cond, bt_body, (step, jnp.zeros((), jnp.int32), energy_at(step)))
                bt_fail = (bt_it >= max_bt) & (_E1 >= E0 + expected * step)
            else:
                bt_it = jnp.zeros((), jnp.int32)
                bt_fail = jnp.zeros((), bool)

            u_new = u + step * du_ls

            # outcome resolution, in the reference's order of checks
            done = conv | lin_fail | step_conv | inv_fail | bt_fail
            code = jnp.where(conv | step_conv, 1,
                   jnp.where(lin_fail, 5,
                   jnp.where(inv_fail, 6,
                   jnp.where(bt_fail, 4, 0)))).astype(jnp.int32)
            # on residual/step convergence the state is NOT advanced
            u_out = jnp.where(conv | step_conv | lin_fail, u, u_new)

            return Carry(
                u=u_out, it=c.it + 1, res0=res0, done=done, code=code,
                cg_total=c.cg_total + cg.n_iterations,
                ls_cap=c.ls_cap + capped.astype(jnp.int32),
                ls_inv=c.ls_inv + inv_it,
                ls_bt=c.ls_bt + bt_it,
                n_proj=c.n_proj + n_proj.astype(jnp.int32),
                n_hess=c.n_hess + n_hess.astype(jnp.int32),
                res=res, E0=E0, counts_max=counts_max,
            )

        z32 = jnp.zeros((), jnp.int32)
        zf = jnp.zeros((), ftype)
        # E0 carries the f64-accumulated total energy (assembly._ACC)
        init = Carry(u=u0, it=z32, res0=zf, done=init_bad,
                     code=jnp.where(init_bad, 2, 0).astype(jnp.int32),
                     cg_total=z32, ls_cap=z32, ls_inv=z32, ls_bt=z32,
                     n_proj=z32, n_hess=z32, res=zf, E0=jnp.zeros((), jnp.float64),
                     counts_max=jnp.zeros((max(len(count_keys), 1),), jnp.int32))
        final = lax.while_loop(cond, body, init)
        # loop exhausted without done -> TooManyIterations (or success if configured)
        exhausted = jnp.logical_not(final.done)
        code = jnp.where(exhausted,
                         jnp.asarray(1 if s.max_iterations_as_success else 3, jnp.int32),
                         final.code)
        # converged-state intersection validity folded in (the reference
        # re-checks it after success, EnergyFrictionalContact.cpp:25);
        # host maps code 9 -> InvalidConvergedState
        conv_bad = (code == 1) & has_intersection(final.u, eng_state, dt)
        code = jnp.where(conv_bad, 9, code)
        # single packed vector so the host pulls exactly one transfer:
        # [code, newton_it, cg_total, ls_cap, ls_inv, ls_bt, n_proj, n_hess,
        #  residual, E0, counts...]
        packed = jnp.concatenate([
            jnp.stack([
                code.astype(jnp.float32), final.it.astype(jnp.float32),
                final.cg_total.astype(jnp.float32),
                final.ls_cap.astype(jnp.float32), final.ls_inv.astype(jnp.float32),
                final.ls_bt.astype(jnp.float32), final.n_proj.astype(jnp.float32),
                final.n_hess.astype(jnp.float32), final.res.astype(jnp.float32),
                final.E0.astype(jnp.float32),
            ]),
            final.counts_max.astype(jnp.float32),
        ])
        return final.u, packed

    return fused_solve, count_keys
