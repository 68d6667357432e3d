"""Unit tests for stark_tpu.ops device kernels."""
import jax
import jax.numpy as jnp
import numpy as np

from stark_tpu.ops.compaction import compact_indices


def test_compact_indices_matches_nonzero(rng):
    for n in [0, 1, 3, 4095, 4096, 4097, 50000]:
        for p in [0.0, 0.02, 0.5, 1.0]:
            m = jnp.asarray(rng.random(n) < p)
            for cap in [1, 16, 777]:
                ref = jnp.nonzero(m, size=cap, fill_value=0)[0]
                idx, cnt = jax.jit(compact_indices, static_argnums=(1,))(m, cap)
                assert int(cnt) == int(m.sum())
                np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref))


def test_compact_indices_overflow_count():
    # count reports the TRUE total even when it exceeds cap (overflow signal)
    m = jnp.ones((100,), bool)
    idx, cnt = compact_indices(m, 8)
    assert int(cnt) == 100
    np.testing.assert_array_equal(np.asarray(idx), np.arange(8))
