"""Fused residual-stack Pallas kernel == sequential XLA residual units
(interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiodec_tpu.models.autoencoder import (
    GeneratorConfig,
    _res_unit_apply,
    _res_unit_init,
)
from audiodec_tpu.archive.resunit_kernel import (
    fused_residual_stack,
    res_stack_params,
)


@pytest.mark.parametrize("c,t,tile", [(8, 256, 128), (16, 300, 100),
                                      (8, 100, 1024)])
def test_fused_stack_matches_sequential(c, t, tile):
    cfg = GeneratorConfig()
    act = cfg.act
    dilations = (1, 3, 9)
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    units = [_res_unit_init(keys[i], c, 7) for i in range(3)]
    # give units non-trivial weights
    units = jax.tree_util.tree_map(lambda w: w * 10.0, units)

    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((2, t, c)).astype(np.float32))
    ref = x
    for u, d in zip(units, dilations):
        ref = _res_unit_apply(u, ref, dilation=d, act=act, mode="causal")

    params = res_stack_params({"res": units})
    out = fused_residual_stack(x, params, dilations=dilations, tile_t=tile,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                               atol=1e-5)
