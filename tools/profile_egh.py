"""Drill into energy+grad+hess cost: per-family timings, scatter vs compute.

Usage: BENCH_N_QUADS=32 python tools/profile_egh.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench


def timeit(label, fn, n=20):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"  {label:<46} {dt*1000:10.3f} ms", flush=True)
    return dt


def main():
    os.environ["STARK_TPU_NO_FUSED"] = "1"
    n_quads = int(os.environ.get("BENCH_N_QUADS", "32"))
    sim = bench.build_scene(n_quads=n_quads, dtype=os.environ.get("BENCH_DTYPE", "float32"))
    core = sim.stark
    sim.run_one_time_step()
    nm = core.newton
    eng = sim.interactions.contact._engine
    eng.refresh_contacts(core.dt)
    data = nm.get_data()
    glob = nm.get_glob()
    u = nm.get_dofs()

    from stark_tpu.solver import assembly
    fams = {f.name: f for f in nm.families}
    n_blocks = nm.n_blocks

    # per-family egh
    total = 0.0
    for name, fd in data.items():
        fam = fams[name]
        a = fam.arity

        def one_fam(u, fd=fd, fam=fam, a=a):
            u_e = u[fd["conn"]]
            e, g = jax.vmap(jax.value_and_grad(fam.energy_fn), in_axes=(0, 0, None))(
                u_e, fd["rows"], glob)
            H = jax.vmap(jax.hessian(fam.energy_fn), in_axes=(0, 0, None))(
                u_e, fd["rows"], glob)
            return e.sum(), g, H

        f = jax.jit(one_fam)
        total += timeit(f"egh[{fam.name}] E={fd['conn'].shape[0]} a={a}", lambda: f(u))

    print(f"  sum of families: {total*1000:.1f} ms")

    # scatter (segment_sum) cost alone, using the largest contact family
    fd = data["contact_ee_dd"]

    def scat(u):
        g_e = u[fd["conn"]]
        return jax.ops.segment_sum(g_e.reshape(-1, 3), fd["conn"].reshape(-1),
                                   num_segments=n_blocks)

    f = jax.jit(scat)
    timeit(f"segment_sum 4*{fd['conn'].shape[0]} rows -> {n_blocks}", lambda: f(u))

    # all-family grad-only
    f = jax.jit(nm._energy_grad)
    timeit("energy+grad (all families)", lambda: f(u, data, glob))

    # hessian compute without symmetrize/where
    # eigh alternatives on the bending family Hessians
    _, _, _, hess = nm._jit_egh(u, data, glob)
    H = hess["EnergyBendingFlat"]
    f = jax.jit(lambda H: jnp.linalg.eigh(H))
    timeit(f"eigh {H.shape}", lambda: f(H))

    def jacobi_eigh(A, sweeps=8):
        d = A.shape[-1]

        def sweep(c, _):
            A, V = c
            for p in range(d):
                for q in range(p + 1, d):
                    app, aqq, apq = A[..., p, p], A[..., q, q], A[..., p, q]
                    theta = 0.5 * jnp.arctan2(2 * apq, aqq - app)
                    cth, sth = jnp.cos(theta), jnp.sin(theta)
                    # rotate rows/cols p,q
                    Ap = cth[..., None] * A[..., p, :] - sth[..., None] * A[..., q, :]
                    Aq = sth[..., None] * A[..., p, :] + cth[..., None] * A[..., q, :]
                    A = A.at[..., p, :].set(Ap).at[..., q, :].set(Aq)
                    Ap = cth[..., None] * A[..., :, p] - sth[..., None] * A[..., :, q]
                    Aq = sth[..., None] * A[..., :, p] + cth[..., None] * A[..., :, q]
                    A = A.at[..., :, p].set(Ap).at[..., :, q].set(Aq)
                    Vp = cth[..., None] * V[..., :, p] - sth[..., None] * V[..., :, q]
                    Vq = sth[..., None] * V[..., :, p] + cth[..., None] * V[..., :, q]
                    V = V.at[..., :, p].set(Vp).at[..., :, q].set(Vq)
            return (A, V), None

        V = jnp.broadcast_to(jnp.eye(d, dtype=A.dtype), A.shape)
        (A, V), _ = jax.lax.scan(sweep, (A, V), None, length=sweeps)
        w = jnp.diagonal(A, axis1=-2, axis2=-1)
        return w, V

    f = jax.jit(lambda H: jacobi_eigh(H))
    w2, V2 = f(H)
    w1, V1 = jnp.linalg.eigh(H)
    err = float(jnp.max(jnp.abs(jnp.sort(w2, -1) - w1)) / (1e-9 + float(jnp.max(jnp.abs(w1)))))
    print(f"    jacobi rel eig err: {err:.2e}")
    timeit(f"jacobi-eigh(8 sweeps) {H.shape}", lambda: f(H))


if __name__ == "__main__":
    main()
