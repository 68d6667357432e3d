"""Projected Newton minimizer with 4-stage line search and retry ladder.

Reference: /root/reference/stark/extern/symx/src/solver/NewtonsMethod.cpp:28-641.
Flow per solve(): evaluate E/g/H -> residual (inf-norm) -> convergence checks
(abs/rel residual, bailout, step tol) -> inner loop {project Hessians per
mode, matrix-free BDPCG with forcing sequence, check descent, escalate
projection} -> 4-stage line search [cap][max][inv][bt] -> converged-state
validity. Host Python makes the ladder decisions (exactly the reference's
host-side role); each stage body is a jitted device function.

The four projection modes (Newton / ProjectedNewton / ProjectOnDemand /
Progressive-PPN) and their escalation rules follow NewtonsMethod.cpp:254-386.
"""
from __future__ import annotations

import math
import os
from dataclasses import dataclass, field
from enum import Enum
from functools import partial
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.callbacks import SolverCallbacks
from ..core.logger import Logger, OutputSink
from ..core.settings import LinearSolver, NewtonSettings, ProjectionToPD, Verbosity
from ..utils import caps_cache
from . import assembly, project
from .pcg import solve_pcg
from .potential import PotentialFamily


class SolverReturn(Enum):
    # symx::SolverReturn (solver_utils.h:15-26)
    Successful = 0
    Running = 1
    InvalidInitialState = 2
    TooManyIterations = 3
    TooManyArmijoIterations = 4
    LinearSystemSolveFailure = 5
    TooManyInvalidIntermediateIterations = 6
    StepDoesNotDescend = 7
    InvalidConvergedState = 8


@dataclass
class SolveStats:
    newton_iterations: int = 0
    cg_iterations: int = 0
    ls_cap_iterations: int = 0
    ls_max_iterations: int = 0
    ls_inv_iterations: int = 0
    ls_bt_iterations: int = 0
    n_hessians: int = 0
    n_projected_hessians: int = 0
    projected_hessians_ratio: float = 0.0


class NewtonsMethod:
    """Host orchestrator over jitted device stages.

    Parameters
    ----------
    families : registered potential families (static + dynamic).
    n_blocks : total DOF blocks (DofLayout.n_blocks).
    get_data : () -> data dict for the current Newton evaluation (static
        family tables + freshly refreshed contact tables).
    get_glob : () -> glob pytree (dt, gravity, state arrays).
    get_dofs / set_dofs : read/write the flat (n_blocks, 3) DOF vector
        from/to the model state containers (GlobalPotential get/set_dofs,
        GlobalPotential.cpp:83-140).
    """

    def __init__(self, families, n_blocks: int, callbacks: SolverCallbacks,
                 settings: NewtonSettings, logger: Logger, output: OutputSink,
                 get_data: Callable, get_glob: Callable,
                 get_dofs: Callable, set_dofs: Callable,
                 get_static_data: Optional[Callable] = None,
                 get_friction_data: Optional[Callable] = None,
                 get_engine: Optional[Callable] = None,
                 prime_host_dofs: Optional[Callable] = None,
                 jacobi_sweeps: Optional[int] = None):
        self.families = families
        self.n_blocks = n_blocks
        self.callbacks = callbacks
        self.settings = settings
        self.logger = logger
        self.output = output
        self.get_data = get_data
        self.get_glob = get_glob
        self.get_dofs = get_dofs
        self.set_dofs = set_dofs
        self.get_static_data = get_static_data
        self.get_friction_data = get_friction_data
        self.get_engine = get_engine
        self.prime_host_dofs = prime_host_dofs
        # generate the lagged-friction tables INSIDE the fused program
        # (fused.py use_ff): removes the per-step host friction refresh and
        # its device round trips. The staged fallback still refreshes on
        # the host (contact._before_time_step checks _fused_eligible).
        self.fused_friction = True
        self.stats = SolveStats()
        self._fused_jit = None
        self._fused_count_keys = []
        # two-level CG gather table capacities (assembly.scatter_table_rows):
        # K fixed small (per-CG-iteration gather cost is n_blocks*K); hot
        # blocks (degree > K — rigid v/w blocks under contact) spill into a
        # (_hvp_hot, _hvp_K2) side table, both doubled on overflow.
        self._hvp_K = 128
        self._hvp_K2 = 256
        self._hvp_hot = 8
        # LIVE-row capacity for the dynamic (contact/friction) families
        # (assembly.live_select): rows with nonzero element Hessians at the
        # current iterate (d < dhat barrier rows + friction rows) —
        # projection and CG cost scale with this. Drape-measured: ~0.5-2k
        # live rows at 32x32 while the slack_p shell holds ~10k.
        self._pool_cap = 8
        if get_engine is not None and get_engine() is not None:
            eng = get_engine()
            need = max(2048, (2 * len(eng.sv_gid) + len(eng.es)) // 2)
            self._pool_cap = 1 << (need - 1).bit_length()
            if len(eng.rv_body):
                # every rb-involving pair row lands on the same v/w blocks
                self._hvp_K2 = 4096
                self._hvp_hot = max(8, 4 * len(np.unique(eng.rv_body)))
        # dense direct linear solve (assembly.direct_solve): exact Newton
        # directions in ~4 ms beat 60-160 launch-bound CG iterations up to
        # a few thousand blocks (cholesky is O(n^3) past that)
        self._direct_max_blocks = 2048
        self._slot_cap = max(65536, 32 * n_blocks)
        # learned caps from prior runs of the same scene signature
        # (caps_cache): start at the bumped values so the fused program
        # traces once instead of walking the overflow->retrace ladder
        if get_engine is not None and get_engine() is not None:
            self._cap_sig = get_engine()._cap_sig
        else:
            self._cap_sig = "nm-%d" % n_blocks
        learned = caps_cache.load(self._cap_sig)
        self._pool_cap = max(self._pool_cap, learned.get("hvp_pool", 0))
        self._slot_cap = max(self._slot_cap, learned.get("direct_slots", 0))
        # motion prior (max |du| of the last accepted solve) seeding the
        # frozen-candidate slack at iteration 0 (fused.py)
        self._du_prior = 1.0
        # per-key pair/candidate counts from the last fused solve (max over
        # its Newton iterations) — feeds the contact-pairs metric
        self._last_counts: Dict[str, int] = {}
        # line-search failure diagnostic (print_line_search_upon_failure)
        self.diagnostic_dir = ""
        self._ls_failure_count = 0

        ev = assembly.make_evaluators(families, n_blocks)
        self._ev = ev
        self._energy = ev.energy
        self._energy_grad = ev.energy_grad
        self._energy_grad_hess = ev.energy_grad_hess
        self._hvp = ev.hvp
        self._diag_blocks = ev.diag_blocks

        self._jacobi_sweeps = (jacobi_sweeps if jacobi_sweeps is not None
                               else project.default_jacobi_sweeps())
        # families PSD by construction skip the eigendecomposition entirely
        self._psd_names = frozenset(f.name for f in families if f.psd)
        self._jit_energy = jax.jit(self._energy)
        self._jit_egh = jax.jit(self._energy_grad_hess)
        self._jit_project_all = jax.jit(
            partial(project.project_all, jacobi_sweeps=self._jacobi_sweeps,
                    psd_names=self._psd_names),
            static_argnames=("eps", "mirroring"))
        self._jit_project_sel = jax.jit(
            partial(project.project_selective, jacobi_sweeps=self._jacobi_sweeps,
                    psd_names=self._psd_names),
            static_argnames=("eps", "mirroring"))
        self._jit_cg = jax.jit(self._cg_stage, static_argnames=("stop_on_indef",))
        self._jit_cg_direct = jax.jit(self._direct_stage)
        self._jit_apply_du = jax.jit(lambda u0, du, s: u0 + s * du)

    # ------------------------------------------------------------------
    # jitted stages
    # ------------------------------------------------------------------
    def _cg_stage(self, grad, data, hess, abs_tol, rel_tol, max_iter, stop_on_indef):
        D = self._diag_blocks(data, hess)
        Dinv = assembly.precondition_inverse(D)
        A = lambda p: self._hvp(p, data, hess)
        Minv = lambda r: assembly.apply_preconditioner(Dinv, r)
        return solve_pcg(A, Minv, -grad, abs_tol, rel_tol, max_iter, stop_on_indef)

    def _direct_stage(self, grad, data, hess):
        """DirectLLT path for small systems (rb_constraints tests use it for
        determinism, tests/rb_constraints.cpp:27-46): dense assembly + Cholesky."""
        n = self.n_blocks
        H = jnp.zeros((n, 3, n, 3), dtype=grad.dtype)
        for name, H_e in hess.items():
            fd = data[name]
            conn = fd["conn"]
            a = conn.shape[1]
            Hb = H_e.reshape(H_e.shape[0], a, 3, a, 3)
            # scatter dense blocks: rows conn[:, i], cols conn[:, j]
            for i in range(a):
                for j in range(a):
                    H = H.at[conn[:, i], :, conn[:, j], :].add(Hb[:, i, :, j, :])
        Hd = H.reshape(3 * n, 3 * n)
        # tiny diagonal shift guards untouched DOFs (they have zero rows)
        Hd = Hd + 1e-30 * jnp.eye(3 * n, dtype=grad.dtype)
        L, low = jax.scipy.linalg.cho_factor(Hd)
        du = jax.scipy.linalg.cho_solve((L, low), -grad.reshape(-1))
        ok = jnp.all(jnp.isfinite(du))
        return du.reshape(n, 3), ok

    # ------------------------------------------------------------------
    # fused device-side solve (one dispatch + one pull per step; fused.py)
    # ------------------------------------------------------------------
    def _fused_eligible(self) -> bool:
        if os.environ.get("STARK_TPU_NO_FUSED") == "1":
            return False
        s = self.settings
        cb = self.callbacks
        return (self.get_static_data is not None
                and s.linear_solver == LinearSolver.BDPCG
                and s.projection_mode in (ProjectionToPD.ProjectedNewton,
                                          ProjectionToPD.Newton)
                and cb.residual is None
                and not cb.max_allowed_step
                and not cb.is_converged)

    def _build_fused(self):
        from .fused import build_fused_solve

        engine = self.get_engine() if self.get_engine is not None else None
        # record the friction-enablement the program is specialized on:
        # mu values ride in as glob arguments (no re-trace needed), but
        # whether the in-program friction tables exist AT ALL is baked in
        # at trace time — _solve_fused rebuilds when this flips (e.g.
        # set_friction called after a first all-zero-mu solve)
        self._fused_use_ff = (engine is not None and self.fused_friction
                              and engine.friction_enabled_now())
        fn, keys = build_fused_solve(self, engine)
        # No compiler-option overrides: the pair-buffer compaction uses the
        # blocked scan in ops/compaction.py precisely so the fused program
        # fits the default scoped-VMEM budget (a raised
        # xla_tpu_scoped_vmem_limit_kib masked the oversized monolithic scan
        # as a runtime kernel fault on v5e).
        # donate the persistent preconditioner buffer (arg 7): it is
        # consumed and returned every call — without donation each solve
        # would copy the (3N)^2 matrix
        self._fused_jit = jax.jit(fn, donate_argnums=(7,))
        self._fused_count_keys = keys
        return engine

    def _solve_fused(self) -> SolverReturn:
        s = self.settings
        self.stats = SolveStats()
        engine = self.get_engine() if self.get_engine is not None else None
        use_ff_now = (engine is not None and self.fused_friction
                      and engine.friction_enabled_now())
        if self._fused_jit is None or use_ff_now != getattr(
                self, "_fused_use_ff", use_ff_now):
            self._build_fused()

        data_static = self.get_static_data()
        # when friction tables are generated inside the fused program the
        # host-refreshed dict is not an input (contact._before_time_step
        # skips the host refresh entirely, saving its device->host sync)
        friction = {} if self.fused_friction else (
            self.get_friction_data() if self.get_friction_data else {})
        glob = self.get_glob()
        u0 = self.get_dofs()
        dtype = u0.dtype
        if engine is not None:
            eng_state = engine.engine_state()
            dhat = engine._th_vec()
            # slack sizing: the pair shell holds pairs out to
            # dhat + slack_pair (these rows feed energies/Hessians — keep
            # tight); the broad shell's radius directly multiplies the
            # per-row candidate counts (c_* caps) and the [max] stride
            # budget. Rebuilds are cheap post-top_k (~5-10 ms), so small
            # shells rebuilt often beat big shells: halving slack_broad
            # cut the drape-peak c_ee_dd row count ~4x.
            dhat_max = 2.0 * float(np.max(np.asarray(
                engine.model.contact_thicknesses)))
            slack_pair = 0.5 * dhat_max
            slack_broad_min = 2.0 * dhat_max
            # The broad radius must cover a typical Newton stride
            # (2.5*dt*|du|): capping it at 4*dhat (16 mm at the default
            # thickness) forced the [max] stage to clamp EVERY free-fall/
            # impact stride to a 7 mm budget — measured 11-16 broad
            # rebuilds (~60 ms each) per step and 2-4x the Newton
            # iterations. On the dense path the radius only costs
            # candidate COUNT (caps bump adaptively; far shells are
            # empty), so let it grow to free-fall stride scale. The grid
            # path keeps the tight cap: its per-row candidate slots (c_*)
            # scale with radius^3.
            # 8*dhat (32 mm at default thickness) balances the two
            # failure modes: 4*dhat forced [max]-clamped 7 mm strides
            # (11-16 broad rebuilds/step measured); 16*dhat made every
            # in-plane primitive of a FLAT cloth a candidate of ~100
            # others (mid-list caps overflowed -> retrace storm).
            if engine.dense_pt and engine.dense_ee:
                slack_broad_max = max(8.0 * dhat_max, 0.032)
            else:
                slack_broad_max = 4.0 * dhat_max
        else:
            eng_state = {}
            dhat = jnp.zeros((0, 0), dtype)
            slack_pair = 1.0
            slack_broad_min = 1.0
            slack_broad_max = 1.0
        params = {
            "max_iterations": jnp.asarray(min(s.max_iterations, 2**31 - 1), jnp.int32),
            "min_iterations": jnp.asarray(s.min_iterations, jnp.int32),
            "residual_tolerance_abs": jnp.asarray(s.residual_tolerance_abs, dtype),
            "residual_tolerance_rel": jnp.asarray(s.residual_tolerance_rel, dtype),
            "bailout_residual": jnp.asarray(s.bailout_residual, dtype),
            "step_tolerance": jnp.asarray(s.step_tolerance, dtype),
            "step_cap": jnp.asarray(min(s.step_cap, np.finfo(np.float32).max), dtype),
            "cg_abs_tolerance": jnp.asarray(s.cg_abs_tolerance, dtype),
            "cg_rel_tolerance": jnp.asarray(s.cg_rel_tolerance, dtype),
            # twin-range slack controls (fused.py): slack_pair bounds the
            # pair-shell margin, slack_broad_min covers near-rest steps,
            # du_prior seeds iteration 0's motion-reach estimate from the
            # last accepted solve, du_floor guards the degenerate 0
            "slack_pair": jnp.asarray(slack_pair, dtype),
            "slack_broad_min": jnp.asarray(slack_broad_min, dtype),
            "slack_broad_max": jnp.asarray(slack_broad_max, dtype),
            "du_prior": jnp.asarray(self._du_prior, dtype),
            "du_floor": jnp.asarray(1e-4, dtype),
        }

        # persistent dense-inverse preconditioner handle (Newton-Schulz
        # warm seed, fused.py): stays device-resident across steps; zeros
        # trigger the in-program cold start on the first solve
        if getattr(self, "_M_dev", None) is None:
            n = 3 * (self.n_blocks + 1) \
                if self.n_blocks <= self._direct_max_blocks else 0
            self._M_dev = jnp.zeros((n, n), dtype)

        with self.logger.time("fused_solve"):
            while True:
                u_out, packed, counts_dev, M_out = self._fused_jit(
                    u0, data_static, friction, glob, eng_state, dhat, params,
                    self._M_dev)
                self._M_dev = M_out
                # the ONE host sync per step: stats vector + the DOF vector
                # together (u feeds the host mirrors that the accept path and
                # constraint checks read, avoiding further pulls)
                u_np, packed, counts = jax.device_get((u_out, packed, counts_dev))
                overflow = False
                keys = self._fused_count_keys
                over_keys = []
                if "hvp_pool" in keys:
                    live = int(counts[keys.index("hvp_pool")])
                    if live > self._pool_cap:
                        while self._pool_cap < live:
                            self._pool_cap *= 2
                        overflow = True
                        over_keys.append(("hvp_pool", live))
                if "direct_slots" in keys:
                    nnz = int(counts[keys.index("direct_slots")])
                    if nnz > self._slot_cap:
                        while self._slot_cap < nnz:
                            self._slot_cap *= 2
                        overflow = True
                        over_keys.append(("direct_slots", nnz))
                eng_kc = [(k, c) for k, c in zip(keys, counts)
                          if k not in ("hvp_deg", "hvp_hot", "hvp_pool",
                                       "direct_slots")]
                if engine is not None and eng_kc:
                    eng_over = engine._check_overflow(
                        [k for k, _ in eng_kc], [c for _, c in eng_kc])
                    if eng_over:
                        overflow = True
                        over_keys += getattr(engine, "_last_overflow", [])
                if overflow:
                    # buffer overflow: bump caps and re-trace (the
                    # static-shape analog of dynamic pair arrays); remember
                    # the bumped values so later runs trace once
                    caps_cache.store(self._cap_sig, {
                        "hvp_pool": self._pool_cap,
                        "direct_slots": self._slot_cap})
                    self.logger.add("fused_retraces", 1)
                    self.output.print_with_new_line(
                        "fused re-trace: cap overflow on %s"
                        % (", ".join("%s=%d" % kc for kc in over_keys)))
                    self._build_fused()
                    continue
                break
        self._last_counts = {k: int(c) for k, c in
                             zip(self._fused_count_keys, counts)}

        code = int(packed[0])
        self.logger.append("solver_code", code)
        self.set_dofs(u_out)
        if self.prime_host_dofs is not None:
            self.prime_host_dofs(u_np)
        # motion prior for the next solve's iteration-0 candidate slack
        self._du_prior = max(1e-4, float(packed[11]))

        st = self.stats
        st.newton_iterations = int(packed[1])
        st.cg_iterations = int(packed[2])
        st.ls_cap_iterations = int(packed[3])
        st.ls_max_iterations = int(packed[4])
        st.ls_inv_iterations = int(packed[5])
        st.ls_bt_iterations = int(packed[6])
        st.n_projected_hessians = int(packed[7])
        st.n_hessians = int(packed[8])
        if len(packed) > 13:
            self.logger.add_and_append("broad_rebuilds", int(packed[12]))
            self.logger.add_and_append("pair_rebuilds", int(packed[13]))
        if len(packed) > 15:
            self.logger.append("ns_q", float(packed[14]))
            self.logger.add_and_append("ns_cold_restarts", int(packed[15]))
        if st.n_hessians > 0:
            st.projected_hessians_ratio = st.n_projected_hessians / st.n_hessians
        self.logger.add_and_append("newton_iterations", st.newton_iterations)
        self.logger.add_and_append("cg_iterations", st.cg_iterations)
        self.logger.append("projected_hessians_ratio", st.projected_hessians_ratio)
        for key, n in (("ls_cap", st.ls_cap_iterations), ("ls_max", st.ls_max_iterations),
                       ("ls_inv", st.ls_inv_iterations), ("ls_bt", st.ls_bt_iterations)):
            self.logger.add_and_append(key, n)

        code_map = {
            1: SolverReturn.Successful,
            2: SolverReturn.InvalidInitialState,
            3: SolverReturn.TooManyIterations,
            4: SolverReturn.TooManyArmijoIterations,
            5: SolverReturn.LinearSystemSolveFailure,
            6: SolverReturn.TooManyInvalidIntermediateIterations,
            9: SolverReturn.InvalidConvergedState,
        }
        result = code_map.get(code, SolverReturn.LinearSystemSolveFailure)

        if result == SolverReturn.TooManyInvalidIntermediateIterations:
            self.callbacks.run_on_intermediate_state_invalid()
        if result == SolverReturn.TooManyArmijoIterations:
            if self.settings.print_line_search_upon_failure:
                # like the reference, re-solve on the diagnostic (staged)
                # path to reproduce the failure and dump the 1D energy
                # profile (NewtonsMethod.cpp:604-634 re-solves with the
                # sampling enabled)
                return self._solve_staged()
            self.callbacks.run_on_armijo_fail()
        if result == SolverReturn.Successful:
            # host-side converged-state checks (constraint/prescribed/
            # attachment tolerances with stiffness hardening); the contact
            # intersection part already ran on device (code 9), so the
            # contact model's own converged callback is suppressed
            model = engine.model if engine is not None else None
            if model is not None:
                model._suppress_converged_intersection = True
            try:
                ok = self.callbacks.run_is_converged_state_valid()
            finally:
                if model is not None:
                    model._suppress_converged_intersection = False
            if not ok:
                result = SolverReturn.InvalidConvergedState
        return result

    # ------------------------------------------------------------------
    # main solve (NewtonsMethod.cpp:28-252)
    # ------------------------------------------------------------------
    def solve(self) -> SolverReturn:
        if self._fused_eligible():
            return self._solve_fused()
        return self._solve_staged()

    def _solve_staged(self) -> SolverReturn:
        s = self.settings
        self.stats = SolveStats()
        result = SolverReturn.Running
        res_0 = math.inf
        E0 = 0.0
        E_prev = None
        stall = 0

        # Projection state persisting across Newton iterations
        self._pdn_countdown = 0
        self._ppn_threshold = -1.0

        if not self.callbacks.run_is_initial_state_valid():
            self.output.print_with_new_line("Newton failure: Invalid initial state.", Verbosity.Medium)
            result = SolverReturn.InvalidInitialState

        newton_iteration = -1
        while result == SolverReturn.Running:
            newton_iteration += 1
            if newton_iteration == s.max_iterations:
                result = (SolverReturn.Successful if s.max_iterations_as_success
                          else SolverReturn.TooManyIterations)
                break

            # Evaluate energy, gradient and element Hessians
            self.callbacks.run_before_energy_evaluation()
            data = self.get_data()
            glob = self.get_glob()
            u = self.get_dofs()
            with self.logger.time("evaluate"):
                E0_dev, aux, grad, hess_raw = self._jit_egh(u, data, glob)
                E0 = float(E0_dev)
                # rounding-noise floors (quadrature form; see assembly.py)
                eps_d = float(np.finfo(np.dtype(u.dtype)).eps)
                noise = eps_d * math.sqrt(max(float(aux["e_nsq"]), 0.0))
                res_noise = eps_d * math.sqrt(max(float(aux["g_nsq"]), 0.0))

            # Residual (default inf-norm, solver_utils.h:28)
            if self.callbacks.residual is not None:
                residual_norm = float(self.callbacks.residual(grad))
            else:
                residual_norm = float(jnp.max(jnp.abs(grad)))
            if newton_iteration == 0:
                res_0 = residual_norm

            # energy-stall convergence at the precision noise floor (fused.py)
            if E_prev is not None and (E_prev - E0) < noise:
                stall += 1
            else:
                stall = 0
            E_prev = E0

            if residual_norm < s.bailout_residual:
                result = SolverReturn.Successful
                break
            if newton_iteration >= s.min_iterations:
                # abs tolerance, componentwise floored by the per-block
                # backward-error floor (see fused.py res_ok)
                x_scale = (1.0 + float(jnp.max(jnp.abs(glob["x0"])))
                           if "x0" in glob else 1.0)
                vscale = max(float(jnp.max(jnp.abs(u))),
                             x_scale / float(glob["dt"]))
                res_ok = bool(jnp.all(jnp.abs(grad) <= jnp.maximum(
                    s.residual_tolerance_abs,
                    4.0 * eps_d * vscale * aux["hsum"])))
                if res_ok:
                    result = SolverReturn.Successful
                    break
                if newton_iteration > 0 and residual_norm / res_0 < s.residual_tolerance_rel:
                    result = SolverReturn.Successful
                    break
                if stall >= 2:
                    result = SolverReturn.Successful
                    break

            # Inner loop: project + solve until a descent direction (or give up)
            init_cg = self.stats.cg_iterations
            du = None
            du_dot_grad = 0.0
            dec_converged = False
            while True:
                hess, all_projected, n_projected = self._project(hess_raw, data, grad)
                du, ok, cg_iters = self._solve_linear_system(grad, data, hess, residual_norm)
                self.stats.cg_iterations += cg_iters

                descends = False
                if ok:
                    du_dot_grad = float(jnp.vdot(du, grad))
                    descends = du_dot_grad < 0.0
                    # Newton-decrement noise-floor convergence (see fused.py)
                    if abs(du_dot_grad) < 4.0 * noise:
                        dec_converged = True
                        result = SolverReturn.Successful
                        break

                if ok and descends:
                    break
                can_project_more = (s.projection_mode != ProjectionToPD.Newton) and not all_projected
                if not can_project_more:
                    result = (SolverReturn.LinearSystemSolveFailure if not ok
                              else SolverReturn.StepDoesNotDescend)
                    break
                self._increase_projection(grad)

            if dec_converged:
                break

            if result != SolverReturn.Running:
                self.output.print_with_new_line(
                    "Newton failure: Could not solve the linear system or find a descend direction.",
                    Verbosity.Summary)
                break

            self._decrease_projection()

            # Stats / logs (NewtonsMethod.cpp:195-207)
            n_hessians = int(project.count_elements(hess_raw, data))
            self.stats.n_hessians += n_hessians
            self.stats.n_projected_hessians += int(n_projected)
            self.logger.add_and_append("cg_iterations", self.stats.cg_iterations - init_cg)

            # Step tolerance
            du_max = float(jnp.max(jnp.abs(du)))
            if newton_iteration >= s.min_iterations and du_max < s.step_tolerance:
                result = SolverReturn.Successful
                break

            # Line search
            result = self._line_search(u, du, E0, du_dot_grad, du_max, data, glob,
                                       noise=noise)

            # User convergence
            if newton_iteration >= s.min_iterations and self.callbacks.run_is_converged():
                result = SolverReturn.Successful
                break
            if result != SolverReturn.Running:
                break

        # Converged-state validity (NewtonsMethod.cpp:243-252)
        if result == SolverReturn.Successful:
            if not self.callbacks.run_is_converged_state_valid():
                self.output.print_with_new_line("Newton failure: Invalid converged state.", Verbosity.Medium)
                result = SolverReturn.InvalidConvergedState

        self.stats.newton_iterations = max(newton_iteration, 0)
        if self.stats.n_hessians > 0:
            self.stats.projected_hessians_ratio = (
                self.stats.n_projected_hessians / self.stats.n_hessians)
        self.logger.add_and_append("newton_iterations", self.stats.newton_iterations)
        self.logger.append("projected_hessians_ratio", self.stats.projected_hessians_ratio)
        return result

    # ------------------------------------------------------------------
    # projection ladder (NewtonsMethod.cpp:254-386)
    # ------------------------------------------------------------------
    def _project(self, hess_raw, data, grad):
        s = self.settings
        mode = s.projection_mode
        with self.logger.time("project_to_PD"):
            if mode == ProjectionToPD.Newton:
                return hess_raw, False, 0
            if mode == ProjectionToPD.ProjectedNewton:
                hess, n = self._jit_project_all(hess_raw, s.projection_eps,
                                                s.project_to_pd_use_mirroring, data)
                return hess, True, int(n)
            if mode == ProjectionToPD.ProjectOnDemand:
                if self._pdn_countdown > 0:
                    hess, n = self._jit_project_all(hess_raw, s.projection_eps,
                                                    s.project_to_pd_use_mirroring,
                                                    data=data)
                    return hess, True, int(n)
                return hess_raw, False, 0
            if mode == ProjectionToPD.Progressive:
                if self._ppn_threshold < 0.0:
                    return hess_raw, False, 0
                thr = self._ppn_threshold
                if 0.0 < thr < 1e-12:
                    thr = 0.0
                    self._ppn_threshold = 0.0
                block_mask = jnp.max(jnp.abs(grad), axis=1) >= thr
                all_projected = bool(jnp.all(block_mask))
                hess, n = self._jit_project_sel(
                    hess_raw, data, s.projection_eps,
                    s.project_to_pd_use_mirroring, block_mask)
                return hess, all_projected, int(n)
        raise ValueError(f"unknown projection mode {mode}")

    def _increase_projection(self, grad):
        s = self.settings
        if s.projection_mode == ProjectionToPD.ProjectOnDemand:
            self._pdn_countdown = s.project_on_demand_countdown
        elif s.projection_mode == ProjectionToPD.Progressive:
            if self._ppn_threshold < 0.0:
                self._ppn_threshold = float(jnp.max(jnp.abs(grad)))
            self._ppn_threshold *= s.ppn_tightening_factor

    def _decrease_projection(self):
        s = self.settings
        if s.projection_mode == ProjectionToPD.ProjectOnDemand:
            self._pdn_countdown -= 1
        elif s.projection_mode == ProjectionToPD.Progressive:
            self._ppn_threshold *= s.ppn_release_factor

    # ------------------------------------------------------------------
    # linear solve (NewtonsMethod.cpp:388-457)
    # ------------------------------------------------------------------
    def _solve_linear_system(self, grad, data, hess, residual_norm):
        s = self.settings
        with self.logger.time("linear_system_solve"):
            if s.linear_solver == LinearSolver.DirectLLT:
                du, ok = self._jit_cg_direct(grad, data, hess)
                return du, bool(ok), 0
            # Forcing sequence (NewtonsMethod.cpp:423)
            forcing = min(1e-2, residual_norm * min(0.5, math.sqrt(residual_norm)))
            abs_tol = max(forcing, s.cg_abs_tolerance)
            res = self._jit_cg(grad, data, hess,
                               jnp.asarray(abs_tol, grad.dtype),
                               jnp.asarray(s.cg_rel_tolerance, grad.dtype),
                               s.cg_max_iterations,
                               stop_on_indef=s.cg_stop_on_indefiniteness)
            return res.x, bool(res.converged), int(res.n_iterations)

    # ------------------------------------------------------------------
    # 4-stage line search (NewtonsMethod.cpp:459-641)
    # ------------------------------------------------------------------
    def _line_search(self, u0, du, E0, du_dot_grad, du_max, data, glob,
                     noise: float = 0.0) -> SolverReturn:
        s = self.settings
        retraction = 1.0

        # [cap]
        if du_max > s.step_cap:
            retraction *= s.step_cap / du_max
            du = du * (s.step_cap / du_max)
            du_max = s.step_cap
            self.stats.ls_cap_iterations += 1
            self.logger.add_and_append("ls_cap", 1)
        else:
            self.logger.add_and_append("ls_cap", 0)

        # [max]
        max_step = self.callbacks.run_max_allowed_step()
        if max_step < 1.0:
            retraction *= max_step
            du = du * max_step
            du_max *= max_step
            self.stats.ls_max_iterations += 1
            self.logger.add_and_append("ls_max", 1)
        else:
            self.logger.add_and_append("ls_max", 0)

        shrink = 0.5
        step = 1.0
        self.set_dofs(self._jit_apply_du(u0, du, step))

        # [inv]
        ls_inv_it = 0
        while ls_inv_it < s.max_backtracking_invalid_state_iterations:
            if self.callbacks.run_is_intermediate_state_valid():
                break
            step *= shrink
            self.set_dofs(self._jit_apply_du(u0, du, step))
            self.stats.ls_inv_iterations += 1
            ls_inv_it += 1
        self.logger.add_and_append("ls_inv", ls_inv_it)
        if ls_inv_it == s.max_backtracking_invalid_state_iterations:
            self.output.print_with_new_line(
                "Newton failure: Too many invalid intermediate state iterations.", Verbosity.Medium)
            self.callbacks.run_on_intermediate_state_invalid()
            return SolverReturn.TooManyInvalidIntermediateIterations

        # [bt] Armijo
        if not s.enable_armijo_backtracking:
            return SolverReturn.Running

        # same-program Armijo reference energy (see fused.py: the egh
        # program's E carries a systematic f32 fusion-rounding bias vs the
        # energy-only program used for the trials)
        E0 = float(self._jit_energy(u0, data, glob))
        expected_decrease = s.line_search_armijo_beta * du_dot_grad * retraction
        # + noise: noise-tolerant Armijo (see fused.py)
        E_threshold = E0 + expected_decrease * step + noise
        armijo_iterations = 0
        while armijo_iterations < s.max_backtracking_armijo_iterations:
            # contact tables must track the trial state (the reference re-runs
            # before_energy_evaluation inside armijo, NewtonsMethod.cpp:594-596)
            self.callbacks.run_before_energy_evaluation()
            data_ls = self.get_data()
            glob_ls = self.get_glob()
            E1 = float(self._jit_energy(self.get_dofs(), data_ls, glob_ls))
            if E1 < E_threshold:
                break
            step *= shrink
            self.set_dofs(self._jit_apply_du(u0, du, step))
            E_threshold = E0 + expected_decrease * step + noise
            self.stats.ls_bt_iterations += 1
            armijo_iterations += 1
        self.logger.add_and_append("ls_bt", armijo_iterations)

        if armijo_iterations == s.max_backtracking_armijo_iterations:
            if np.dtype(np.asarray(u0).dtype) == np.float32:
                # f32: exhaustion converts to convergence ONLY when the
                # evidence says the descent claim was rounding noise: the
                # final probed displacement is below one position ulp
                # (mirrors fused.py step_floor) or the claimed decrease
                # |beta*dug*step| is within the energy noise floor. A
                # genuinely bad direction (macroscopic step, resolvable
                # descent claim) keeps TooManyArmijoIterations -> dt halving.
                eps32 = float(np.finfo(np.float32).eps)
                glob_now = self.get_glob()
                x_scale = (1.0 + float(jnp.max(jnp.abs(glob_now["x0"])))
                           if "x0" in glob_now else 1.0)
                disp = step * float(glob_now["dt"]) * du_max
                if disp <= eps32 * x_scale or \
                        abs(expected_decrease * step) <= max(noise, 0.0):
                    self.set_dofs(u0)
                    return SolverReturn.Successful
            self.output.print_with_new_line("Newton failure: Too many armijo iterations.", Verbosity.Medium)
            if s.print_line_search_upon_failure:
                self._dump_line_search_profile(u0, du, E0, du_dot_grad)
            self.callbacks.run_on_armijo_fail()
            return SolverReturn.TooManyArmijoIterations

        return SolverReturn.Running

    def _dump_line_search_profile(self, u0, du, E0, du_dot_grad,
                                  n_samples: int = 1000):
        """Line-search failure diagnostic: sample the 1D energy landscape
        E(alpha) over alpha in [-0.5, 1.5]*du and dump a plot-ready file
        (NewtonsMethod.cpp:549-563, 604-634 re-solves with gnuplot output;
        here the profile is sampled directly at the failure point). Contact
        tables are refreshed per sample exactly like an Armijo trial."""
        import os as _os
        path = _os.path.join(self.diagnostic_dir or ".",
                             "line_search_failure_%d.txt" % self._ls_failure_count)
        self._ls_failure_count += 1
        alphas = np.linspace(-0.5, 1.5, n_samples)
        lines = ["# alpha  E(u0 + alpha*du)   E0=%r  du_dot_grad=%r"
                 % (E0, du_dot_grad)]
        for a in alphas:
            self.set_dofs(self._jit_apply_du(u0, du, float(a)))
            self.callbacks.run_before_energy_evaluation()
            E = float(self._jit_energy(self.get_dofs(), self.get_data(),
                                       self.get_glob()))
            lines.append("%.8f %.17g" % (a, E))
        self.set_dofs(u0)
        with open(path, "w") as f:
            f.write("\n".join(lines) + "\n")
        self.output.print_with_new_line(
            f"Line search failure energy profile written to {path}",
            Verbosity.Minimal)

    # ------------------------------------------------------------------
    def live_contact_pairs(self) -> int:
        """Exact contact pairs live in the last solve (max over its Newton
        iterations; fused path counts d <= dhat at candidate-build states).
        Staged path: from the engine's host-mirrored tables."""
        if self._last_counts:
            return sum(c for k, c in self._last_counts.items()
                       if k.startswith("n_live_"))
        engine = self.get_engine() if self.get_engine is not None else None
        if engine is None:
            return 0
        total = 0
        for fd in engine._contact_data.values():
            total += int(np.sum(np.asarray(fd["rows"]["active"]) > 0.5))
        return total

    def get_last_solve_stats(self) -> SolveStats:
        return self.stats

    def print_summary(self):
        out = self.output
        logger = self.logger
        total_n_newton = logger.get_stats("newton_iterations").total
        if total_n_newton == 0:
            out.print_with_new_line("No Newton iterations were performed.")
            return
        out.print_with_new_line("")
        out.print_with_new_line(f"  {'Solve':<24} {'Total':>10} {'Avg':>8} {'Min':>8} {'Max':>8}")
        out.print_with_new_line("  " + "-" * 62)
        rows = [("Newton iterations", "newton_iterations"), ("CG iterations", "cg_iterations"),
                ("Line search cap", "ls_cap"), ("Line search max", "ls_max"),
                ("Line search inv", "ls_inv"), ("Line search bt", "ls_bt")]
        for label, key in rows:
            st = logger.get_stats(key)
            out.print_with_new_line(
                f"  {label:<24} {int(st.total):>10} {st.avg:>8.1f} {int(st.min):>8} {int(st.max):>8}")
        st = logger.get_stats("projected_hessians_ratio")
        out.print_with_new_line(
            f"  {'Projected hessians':<24} {'':>10} {100*st.avg:>7.1f}% {100*st.min:>7.1f}% {100*st.max:>7.1f}%")
        total_time = sum(logger.get_timer_total(l) for l in logger.get_timer_labels())
        out.print_with_new_line("")
        out.print_with_new_line(f"  {'Runtime':<40} {'Time (s)':>10}  {'%':>6}")
        out.print_with_new_line("  " + "-" * 60)
        entries = sorted(((l, logger.get_timer_total(l)) for l in logger.get_timer_labels()),
                         key=lambda kv: -kv[1])
        for label, t in entries:
            if total_time > 0 and t / total_time < 0.001:
                continue
            pct = 100.0 * t / total_time if total_time > 0 else 0.0
            out.print_with_new_line(f"  {label:<40} {t:>10.6f}  {pct:>5.1f}%")
        out.print_with_new_line("  " + "-" * 60)
        out.print_with_new_line(f"  {'Total':<40} {total_time:>10.6f}  100.0%")
        out.print_new_line()
