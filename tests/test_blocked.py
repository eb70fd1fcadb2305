"""Block-packed convs == flat causal convs (MXU lane-packing transform)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiodec_tpu.models.autoencoder import (
    GeneratorConfig,
    _res_unit_apply,
    _res_unit_init,
)
from audiodec_tpu.archive.blocked import (
    block_time,
    blocked_causal_conv1d,
    blocked_res_stack,
    pack_factor,
    unblock_time,
)
from audiodec_tpu.ops.conv import causal_conv1d, conv1d_init

RNG = np.random.default_rng(3)


@pytest.mark.parametrize("c,k,d,p", [(32, 7, 1, 4), (32, 7, 3, 4),
                                     (32, 7, 9, 4), (64, 7, 1, 2),
                                     (32, 1, 1, 4), (16, 3, 1, 8)])
def test_blocked_conv_matches_flat(c, k, d, p):
    params = conv1d_init(jax.random.PRNGKey(0), k, c, c, bias=True)
    params = jax.tree_util.tree_map(lambda w: w * 50.0, params)
    t = 16 * p
    x = jnp.asarray(RNG.standard_normal((2, t, c)).astype(np.float32))
    ref = causal_conv1d(x, params, dilation=d)
    xb = block_time(x, p)
    yb = blocked_causal_conv1d(xb, params["w"], dilation=d, p=p,
                               b_bias=params.get("b"))
    out = unblock_time(yb, p)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                               atol=1e-4)


def test_blocked_res_stack_matches_sequential():
    cfg = GeneratorConfig()
    act = cfg.act
    c, t = 32, 1200
    dilations = (1, 3, 9)
    keys = jax.random.split(jax.random.PRNGKey(1), 3)
    units = [_res_unit_init(keys[i], c, 7) for i in range(3)]
    units = jax.tree_util.tree_map(lambda w: w * 10.0, units)
    x = jnp.asarray(RNG.standard_normal((2, t, c)).astype(np.float32))
    ref = x
    for u, d in zip(units, dilations):
        ref = _res_unit_apply(u, ref, dilation=d, act=act, mode="causal")
    out = blocked_res_stack(x, units, dilations=dilations, act=act)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                               atol=1e-4)


def test_pack_factor():
    assert pack_factor(32) == 4
    assert pack_factor(64) == 2
    assert pack_factor(128) == 1
    assert pack_factor(256) == 1
