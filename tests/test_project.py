"""CPU-forced tests for the accelerator-default PD-projection path.

Round-2 postmortem: `default_jacobi_sweeps()` returns 0 on CPU, so the
8-sweep Jacobi path the TPU actually runs had zero coverage in the CPU test
suite — and a transposed-eigenvalue refactor shipped, crashing the bench.
Rule adopted here: every `jax.default_backend()`-gated branch gets a
CPU-forced test of the non-CPU value.

Reference semantics:
/root/reference/stark/extern/symx/src/solver/second_order/project_to_PD.cpp:12-48
(clamp eigenvalues below eps to eps, or mirror to -lambda).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from stark_tpu.solver import project


def _random_sym_stack(rng, E, d, dtype=np.float64):
    A = rng.standard_normal((E, d, d)).astype(dtype)
    # indefinite by construction: symmetric with mixed-sign eigenvalues
    return 0.5 * (A + np.swapaxes(A, -1, -2))


@pytest.mark.parametrize("d", [3, 6, 9, 12, 15])
def test_jacobi_matches_eigh_projection(rng, d):
    """jacobi_sweeps=8 (the TPU default) must match the exact-eigh path."""
    H = jnp.asarray(_random_sym_stack(rng, 64, d))
    Hp_exact, ch_exact = project.project_family_to_pd(
        H, eps=1e-9, mirroring=False, jacobi_sweeps=0)
    Hp_jac, ch_jac = project.project_family_to_pd(
        H, eps=1e-9, mirroring=False, jacobi_sweeps=8)
    scale = float(jnp.max(jnp.abs(Hp_exact))) + 1e-30
    err = float(jnp.max(jnp.abs(Hp_jac - Hp_exact))) / scale
    assert err < 1e-5, f"d={d}: jacobi projection deviates {err:.2e}"
    # same elements flagged as changed
    np.testing.assert_array_equal(np.asarray(ch_exact), np.asarray(ch_jac))


@pytest.mark.parametrize("d", [6, 12])
@pytest.mark.parametrize("sweeps", [0, 8])
def test_projection_output_is_psd(rng, d, sweeps):
    H = jnp.asarray(_random_sym_stack(rng, 32, d))
    Hp, _ = project.project_family_to_pd(H, eps=1e-9, mirroring=False,
                                         jacobi_sweeps=sweeps)
    w = np.linalg.eigvalsh(np.asarray(Hp))
    assert w.min() > -1e-6, f"min eigenvalue {w.min():.3e} not PSD"


@pytest.mark.parametrize("sweeps", [0, 8])
def test_mirroring_mode(rng, sweeps):
    """Mirroring flips negative eigenvalues to -lambda (project_to_PD.cpp:35-41)."""
    d = 9
    H = jnp.asarray(_random_sym_stack(rng, 16, d))
    Hp, _ = project.project_family_to_pd(H, eps=1e-9, mirroring=True,
                                         jacobi_sweeps=sweeps)
    w_in = np.linalg.eigvalsh(np.asarray(H))
    w_out = np.sort(np.linalg.eigvalsh(np.asarray(Hp)), axis=-1)
    w_ref = np.sort(np.abs(w_in), axis=-1)
    np.testing.assert_allclose(w_out, w_ref, rtol=1e-4, atol=1e-7)


def test_jacobi_eigh_shapes(rng):
    """Direct shape contract of the batched Jacobi (the round-2 bug)."""
    for d in (6, 12):
        H = jnp.asarray(_random_sym_stack(rng, 8, d))
        w, V = project._jacobi_eigh(H, sweeps=8)
        assert w.shape == (8, d), f"w shape {w.shape} != (8, {d})"
        assert V.shape == (8, d, d)
        # reconstruction A ~= V diag(w) V^T
        R = jnp.einsum("eij,ej,ekj->eik", V, w, V)
        err = float(jnp.max(jnp.abs(R - H))) / (float(jnp.max(jnp.abs(H))) + 1e-30)
        assert err < 1e-6, f"d={d}: reconstruction error {err:.2e}"


def test_project_all_counts_only_active(rng):
    """Padded (inactive) rows must not count toward ph% (round-1 finding)."""
    d = 6
    H = jnp.asarray(_random_sym_stack(rng, 8, d))
    # mark half the rows padded
    active = jnp.array([1.0, 1.0, 1.0, 1.0, 0.0, 0.0, 0.0, 0.0])
    data = {"fam": {"rows": {"active": active}}}
    _, n_all = project.project_all({"fam": H}, 1e-9, False)
    _, n_act = project.project_all({"fam": H}, 1e-9, False, data=data)
    assert int(n_act) <= 4
    assert int(n_all) >= int(n_act)
