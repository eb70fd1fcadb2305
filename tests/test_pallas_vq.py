"""Pallas RVQ kernel == XLA reference path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiodec_tpu.archive.vq_kernel import rvq_encode_pallas
from audiodec_tpu.ops.vq import rvq_forward_index, rvq_init


@pytest.mark.parametrize("q,n,d,bt", [(4, 32, 16, (2, 10)),
                                      (8, 1024, 64, (1, 300))])
def test_pallas_rvq_matches_xla(q, n, d, bt):
    params = rvq_init(jax.random.PRNGKey(0), q, n, d)
    z = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((*bt, d)).astype(np.float32))
    zq_ref, idx_ref = rvq_forward_index(z, params)
    zq, idx = rvq_encode_pallas(z, params["embed"], interpret=True)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_ref))
    np.testing.assert_allclose(np.asarray(zq), np.asarray(zq_ref), rtol=1e-5,
                               atol=1e-5)


def test_pallas_rvq_pad_path():
    """Frame count not divisible by the tile size exercises padding."""
    params = rvq_init(jax.random.PRNGKey(1), 2, 16, 8)
    z = jnp.asarray(np.random.default_rng(1)
                    .standard_normal((1, 3, 8)).astype(np.float32))
    zq_ref, idx_ref = rvq_forward_index(z, params)
    zq, idx = rvq_encode_pallas(z, params["embed"], interpret=True)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_ref))
