"""Parity of conv primitives vs torch reference semantics.

Expectations are computed with torch.nn layers configured exactly like the
reference's wrappers (ref: layers/conv_layer.py) — built inline here, weights
shared with the JAX side through explicit layout conversion:

    torch Conv1d weight (O, I, K)          ->  ours (K, I, O)
    torch ConvTranspose1d weight (I, O, K) ->  ours (K, I, O) flipped on K
"""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax.numpy as jnp

from audiodec_tpu.ops.conv import (
    causal_conv1d,
    causal_conv_transpose1d,
    causal_state_init,
    causal_transpose_state_init,
    noncausal_conv1d,
    noncausal_conv2d,
    noncausal_conv_transpose1d,
)

RNG = np.random.default_rng(0)


def t2j_conv_w(w):
    """torch (O, I, K) -> (K, I, O)"""
    return jnp.asarray(np.transpose(w, (2, 1, 0)))


def t2j_convT_w(w):
    """torch (I, O, K) -> gathering orientation (K, I, O): flip K, reorder."""
    return jnp.asarray(np.transpose(w[:, :, ::-1].copy(), (2, 0, 1)))


def make_torch_conv(ci, co, k, stride=1, dilation=1, groups=1, bias=True):
    conv = nn.Conv1d(ci, co, k, stride=stride, dilation=dilation,
                     groups=groups, bias=bias, padding=0)
    conv.weight.data = torch.tensor(
        RNG.standard_normal(conv.weight.shape), dtype=torch.float32)
    if bias:
        conv.bias.data = torch.tensor(
            RNG.standard_normal(conv.bias.shape), dtype=torch.float32)
    return conv


@pytest.mark.parametrize("k,stride,dilation", [
    (7, 1, 1), (7, 1, 3), (7, 1, 9), (6, 3, 1), (8, 4, 1), (10, 5, 1),
    (3, 1, 1), (1, 1, 1),
])
def test_causal_conv1d_batch(k, stride, dilation):
    ci, co, T = 4, 6, 60
    conv = make_torch_conv(ci, co, k, stride, dilation)
    x = RNG.standard_normal((2, ci, T)).astype(np.float32)

    pad = (k - 1) * dilation
    with torch.no_grad():
        ref = conv(nn.functional.pad(torch.tensor(x), (pad, 0)))
    ref = ref.numpy().transpose(0, 2, 1)

    p = {"w": t2j_conv_w(conv.weight.detach().numpy()),
         "b": jnp.asarray(conv.bias.detach().numpy())}
    out = causal_conv1d(jnp.asarray(x.transpose(0, 2, 1)), p, stride=stride,
                        dilation=dilation)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("k,stride,dilation", [(7, 1, 3), (6, 3, 1), (10, 5, 1)])
def test_causal_conv1d_streaming_equals_batch(k, stride, dilation):
    """Chunked stateful conv == whole-utterance conv (the reference's
    pad_buffer identity, ref: layers/conv_layer.py:153-156)."""
    ci, co, T, chunk = 3, 5, 120, 15
    conv = make_torch_conv(ci, co, k, stride, dilation)
    x = RNG.standard_normal((1, T, ci)).astype(np.float32)
    p = {"w": t2j_conv_w(conv.weight.detach().numpy()),
         "b": jnp.asarray(conv.bias.detach().numpy())}

    full = causal_conv1d(jnp.asarray(x), p, stride=stride, dilation=dilation)

    state = causal_state_init(1, ci, k, dilation)
    outs = []
    for i in range(0, T, chunk):
        y, state = causal_conv1d(jnp.asarray(x[:, i:i + chunk]), p,
                                 stride=stride, dilation=dilation, state=state)
        outs.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(outs, axis=1), np.asarray(full),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("k,stride", [(6, 3), (8, 4), (10, 5), (5, 3)])
def test_causal_conv_transpose1d_batch(k, stride):
    """vs reference CausalConvTranspose1d.forward: replication left-pad by
    ceil(k/s)-1, ConvTranspose1d(padding=0), trim [s:-s]
    (ref: layers/conv_layer.py:189-192)."""
    import math
    ci, co, T = 4, 3, 20
    deconv = nn.ConvTranspose1d(ci, co, k, stride=stride, padding=0,
                                output_padding=0)
    deconv.weight.data = torch.tensor(
        RNG.standard_normal(deconv.weight.shape), dtype=torch.float32)
    deconv.bias.data = torch.tensor(
        RNG.standard_normal(deconv.bias.shape), dtype=torch.float32)
    x = RNG.standard_normal((2, ci, T)).astype(np.float32)

    pad_len = math.ceil(k / stride) - 1
    with torch.no_grad():
        xt = nn.ReplicationPad1d((pad_len, 0))(torch.tensor(x))
        ref = deconv(xt)[:, :, stride:-stride]
    ref = ref.numpy().transpose(0, 2, 1)

    p = {"w": t2j_convT_w(deconv.weight.detach().numpy()),
         "b": jnp.asarray(deconv.bias.detach().numpy())}
    out = causal_conv_transpose1d(jnp.asarray(x.transpose(0, 2, 1)), p,
                                  stride=stride)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("k,stride", [(6, 3), (10, 5)])
def test_causal_conv_transpose1d_streaming(k, stride):
    """Chunked stateful == whole-input with zero-initialized state (the
    streaming inference path, ref: layers/conv_layer.py:194-197)."""
    ci, co, T, chunk = 3, 2, 24, 4
    deconv = nn.ConvTranspose1d(ci, co, k, stride=stride)
    x = RNG.standard_normal((1, T, ci)).astype(np.float32)
    p = {"w": t2j_convT_w(deconv.weight.detach().numpy()),
         "b": jnp.asarray(deconv.bias.detach().numpy())}

    # whole-input streaming reference (zero state)
    state0 = causal_transpose_state_init(1, ci, k, stride)
    full, _ = causal_conv_transpose1d(jnp.asarray(x), p, stride=stride,
                                      state=state0)

    state = causal_transpose_state_init(1, ci, k, stride)
    outs = []
    for i in range(0, T, chunk):
        y, state = causal_conv_transpose1d(jnp.asarray(x[:, i:i + chunk]), p,
                                           stride=stride, state=state)
        outs.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(outs, axis=1), np.asarray(full),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("k,stride,dilation,groups", [
    (7, 1, 1, 1), (5, 2, 1, 1), (7, 1, 2, 1), (41, 2, 1, 4), (15, 1, 1, 1),
])
def test_noncausal_conv1d(k, stride, dilation, groups):
    ci, co, T = 8, 8, 64
    conv = nn.Conv1d(ci, co, k, stride=stride, dilation=dilation,
                     groups=groups, padding=(k - 1) // 2 * dilation)
    conv.weight.data.normal_()
    x = RNG.standard_normal((2, ci, T)).astype(np.float32)
    with torch.no_grad():
        ref = conv(torch.tensor(x)).numpy().transpose(0, 2, 1)
    p = {"w": t2j_conv_w(conv.weight.detach().numpy()),
         "b": jnp.asarray(conv.bias.detach().numpy())}
    out = noncausal_conv1d(jnp.asarray(x.transpose(0, 2, 1)), p,
                           stride=stride, dilation=dilation, groups=groups)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("k,stride", [(4, 2), (8, 4), (10, 5), (9, 3)])
def test_noncausal_conv_transpose1d(k, stride):
    """vs torch ConvTranspose1d with the reference defaults padding=(s+1)//2,
    output_padding=s%2 (ref: layers/conv_layer.py:92-95)."""
    ci, co, T = 4, 3, 16
    pad, opad = (stride + 1) // 2, stride % 2
    deconv = nn.ConvTranspose1d(ci, co, k, stride=stride, padding=pad,
                                output_padding=opad)
    deconv.weight.data.normal_()
    x = RNG.standard_normal((2, ci, T)).astype(np.float32)
    with torch.no_grad():
        ref = deconv(torch.tensor(x)).numpy().transpose(0, 2, 1)
    p = {"w": t2j_convT_w(deconv.weight.detach().numpy()),
         "b": jnp.asarray(deconv.bias.detach().numpy())}
    out = noncausal_conv_transpose1d(jnp.asarray(x.transpose(0, 2, 1)), p,
                                     stride=stride)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("k,stride", [((5, 1), (3, 1)), ((3, 9), (1, 2))])
def test_noncausal_conv2d(k, stride):
    ci, co = 2, 4
    pad = ((k[0] - 1) // 2, (k[1] - 1) // 2)
    conv = nn.Conv2d(ci, co, k, stride=stride, padding=pad)
    conv.weight.data.normal_()
    x = RNG.standard_normal((2, ci, 12, 20)).astype(np.float32)
    with torch.no_grad():
        ref = conv(torch.tensor(x)).numpy().transpose(0, 2, 3, 1)
    p = {"w": jnp.asarray(conv.weight.detach().numpy().transpose(2, 3, 1, 0)),
         "b": jnp.asarray(conv.bias.detach().numpy())}
    out = noncausal_conv2d(jnp.asarray(x.transpose(0, 2, 3, 1)), p,
                           stride=stride)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)
