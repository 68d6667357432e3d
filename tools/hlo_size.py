"""Lower the fused solve at bench shapes (CPU trace only) and report HLO
size statistics: total text size, op counts, largest embedded constants.
Diagnoses compile-time blowups without touching the TPU compiler.

Usage: BENCH_N_QUADS=32 python tools/hlo_size.py
"""
import os
import re
import sys
from collections import Counter

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import bench


def main():
    n_quads = int(os.environ.get("BENCH_N_QUADS", "32"))
    sim = bench.build_scene(n_quads=n_quads,
                            dtype=os.environ.get("BENCH_DTYPE", "float32"))
    core = sim.stark
    # build the fused jit without running a step (mirror newton._solve_fused
    # argument assembly)
    nm = core.newton_prepare() if hasattr(core, "newton_prepare") else None
    # fall back: run one step on CPU is too slow; instead reach into the
    # scheduler the same way stark.run_one_time_step does up to the solve
    core._ensure_models_initialized() if hasattr(
        core, "_ensure_models_initialized") else None
    nm = core.newton
    if nm is None:
        core.prepare_step() if hasattr(core, "prepare_step") else None
        nm = core.newton
    if nm is None:
        # trigger solver construction via one (cheap on 8x8) CPU step
        sim.run_one_time_step()
        nm = core.newton

    engine = nm._build_fused()
    import stark_tpu.solver.newton as newton_mod
    u0 = nm.get_dofs()
    data_static = nm.get_static_data()
    glob = nm.get_glob()
    friction = {}
    if engine is not None:
        eng_state = engine.engine_state()
        dhat = engine._th_vec()
        dhat_max = 2.0 * float(np.max(np.asarray(
            engine.model.contact_thicknesses)))
    else:
        eng_state, dhat, dhat_max = {}, jnp.zeros((0, 0)), 0.002
    s = nm.settings
    dtype = u0.dtype
    params = {
        "max_iterations": jnp.asarray(s.max_iterations, jnp.int32),
        "min_iterations": jnp.asarray(s.min_iterations, jnp.int32),
        "residual_tolerance_abs": jnp.asarray(s.residual_tolerance_abs, dtype),
        "residual_tolerance_rel": jnp.asarray(s.residual_tolerance_rel, dtype),
        "bailout_residual": jnp.asarray(s.bailout_residual, dtype),
        "step_tolerance": jnp.asarray(s.step_tolerance, dtype),
        "step_cap": jnp.asarray(min(s.step_cap, np.finfo(np.float32).max), dtype),
        "cg_abs_tolerance": jnp.asarray(s.cg_abs_tolerance, dtype),
        "cg_rel_tolerance": jnp.asarray(s.cg_rel_tolerance, dtype),
        "slack_pair": jnp.asarray(0.5 * dhat_max, dtype),
        "slack_broad_min": jnp.asarray(2.0 * dhat_max, dtype),
        "slack_broad_max": jnp.asarray(4.0 * dhat_max, dtype),
        "du_prior": jnp.asarray(1.0, dtype),
        "du_floor": jnp.asarray(1e-4, dtype),
    }

    lowered = nm._fused_jit.lower(
        u0, data_static, friction, glob, eng_state, dhat, params)
    txt = lowered.as_text()
    print(f"StableHLO text: {len(txt)/1e6:.1f} MB, {txt.count(chr(10))} lines",
          flush=True)

    ops = Counter(re.findall(r"stablehlo\.([a-z_]+)", txt))
    print("top ops:", ops.most_common(30), flush=True)

    # constants: stablehlo.constant dense<...> : tensor<AxBxf32>
    sizes = Counter()
    counts = Counter()
    for m in re.finditer(
            r"stablehlo\.constant dense<[^:\n]{0,120}?> : tensor<([0-9x]*)x?"
            r"(f32|f64|i32|i64|i1|i8|ui8|bf16)", txt):
        shape = m.group(1)
        n = 1
        for d in shape.split("x"):
            if d:
                n *= int(d)
        sizes[(shape, m.group(2))] += n
        counts[(shape, m.group(2))] += 1
    tot = sum(sizes.values())
    print(f"constants: {sum(counts.values())} totaling {tot/1e6:.2f}M "
          f"elements", flush=True)
    for (shape, ty), n in sizes.most_common(20):
        print(f"  tensor<{shape}x{ty}> x{counts[(shape, ty)]}  "
              f"total {n/1e6:.3f}M", flush=True)

    # biggest single ops by printed tensor size in result type
    big = Counter()
    for m in re.finditer(r"stablehlo\.([a-z_]+)[^\n]*-> tensor<([0-9x]+)x"
                         r"(f32|f64|i32|i64|i1)", txt):
        n = 1
        for d in m.group(2).split("x"):
            n *= int(d)
        big[(m.group(1), m.group(2))] = max(big[(m.group(1), m.group(2))], n)
    print("largest result tensors:", flush=True)
    for (op, shape), n in sorted(big.items(), key=lambda kv: -kv[1])[:20]:
        print(f"  {op} -> {shape}  {n/1e6:.2f}M", flush=True)

    while_bodies = txt.count("stablehlo.while")
    conds = txt.count("stablehlo.if") + txt.count("stablehlo.case")
    sorts = txt.count("stablehlo.sort")
    print(f"while={while_bodies} if/case={conds} sort={sorts}", flush=True)


if __name__ == "__main__":
    main()
