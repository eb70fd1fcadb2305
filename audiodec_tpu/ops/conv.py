"""Causal / non-causal 1-D (and 2-D) convolution primitives, TPU-native.

Design notes
------------
Everything here is a *pure function* operating on a channels-last layout:

    waveforms / feature maps : (B, T, C)   -- C rides the 128-lane axis
    conv weights             : (K, C_in // groups, C_out)
    transposed conv weights  : (K, C_in, C_out)  "gathering" orientation (see
                               `causal_conv_transpose1d`)

Streaming state is explicit: each causal layer's state is simply the last
`(K-1)*dilation` input samples (for conv) or the last `ceil(K/stride)-1`
input frames (for transposed conv).  Batch mode (`state=None`) reproduces the
reference's whole-utterance semantics; streaming mode (`state` given)
reproduces its hop-by-hop `inference()` semantics, returning `(y, new_state)`.

Behavioral contract (matched against facebookresearch/AudioDec):
  - causal conv batch:   left zero-pad by (K-1)*d, VALID conv
                         (ref: layers/conv_layer.py:148-151)
  - causal conv stream:  concat(state, x), VALID conv, state := tail
                         (ref: layers/conv_layer.py:153-156)
  - causal convT batch:  left *replication* pad by ceil(K/s)-1, full transposed
                         conv, trim [s:-s] (ref: layers/conv_layer.py:189-192)
  - causal convT stream: concat(state, x) with zero-initialized state, full
                         transposed conv, trim [s:-s], state := tail
                         (ref: layers/conv_layer.py:194-197).  NOTE: batch and
                         streaming genuinely differ on the first frames
                         (replication vs zeros) exactly as in the reference.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

DIMSPEC_1D = ("NWC", "WIO", "NWC")
DIMSPEC_2D = ("NHWC", "HWIO", "NHWC")


# ---------------------------------------------------------------------------
# initializers (HiFiGAN-style: N(0, 0.01), zero bias;
# ref: models/autoencoder/AudioDec.py:123-136)
# ---------------------------------------------------------------------------

def conv1d_init(key, kernel_size: int, in_channels: int, out_channels: int,
                groups: int = 1, bias: bool = True, scale: float = 0.01,
                dtype=jnp.float32) -> dict:
    """Parameters for a 1-D conv: {'w': (K, C_in//groups, C_out) [, 'b': (C_out,)]}."""
    w = scale * jax.random.normal(
        key, (kernel_size, in_channels // groups, out_channels), dtype=dtype)
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((out_channels,), dtype=dtype)
    return p


def conv_transpose1d_init(key, kernel_size: int, in_channels: int,
                          out_channels: int, bias: bool = True,
                          scale: float = 0.01, dtype=jnp.float32) -> dict:
    """Parameters for a transposed 1-D conv: {'w': (K, C_in, C_out) [, 'b']}."""
    w = scale * jax.random.normal(
        key, (kernel_size, in_channels, out_channels), dtype=dtype)
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((out_channels,), dtype=dtype)
    return p


def conv2d_init(key, kernel_size, in_channels: int, out_channels: int,
                groups: int = 1, bias: bool = True, scale: float = 0.01,
                dtype=jnp.float32) -> dict:
    kh, kw = (kernel_size, kernel_size) if isinstance(kernel_size, int) else kernel_size
    w = scale * jax.random.normal(
        key, (kh, kw, in_channels // groups, out_channels), dtype=dtype)
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((out_channels,), dtype=dtype)
    return p


def causal_state_init(batch: int, in_channels: int, kernel_size: int,
                      dilation: int = 1, dtype=jnp.float32) -> jnp.ndarray:
    """Zero streaming state for a causal conv: (B, (K-1)*d, C_in)."""
    return jnp.zeros((batch, (kernel_size - 1) * dilation, in_channels), dtype)


def causal_transpose_state_init(batch: int, in_channels: int, kernel_size: int,
                                stride: int, dtype=jnp.float32) -> jnp.ndarray:
    """Zero streaming state for a causal transposed conv: (B, ceil(K/s)-1, C_in)."""
    return jnp.zeros(
        (batch, math.ceil(kernel_size / stride) - 1, in_channels), dtype)


# ---------------------------------------------------------------------------
# core convs
# ---------------------------------------------------------------------------

def _conv1d(x, w, b, *, stride=1, dilation=1, padding, groups=1,
            lhs_dilation=1):
    if groups > 1:
        # Lower grouped convs to per-group dense convs.  XLA:TPU lays a
        # feature_group_count conv out as (B, T, G, C/G) with the per-group
        # channel dim padded to 128 lanes — 4x HBM blowup at C/G=32 (OOMs
        # the B=16 vocoder decode).  G dense convs keep the native (B, T, C)
        # layout; the math is identical.
        cin_g = x.shape[-1] // groups
        cout_g = w.shape[-1] // groups
        ys = [
            _conv1d(x[..., g * cin_g:(g + 1) * cin_g],
                    w[..., g * cout_g:(g + 1) * cout_g], None,
                    stride=stride, dilation=dilation, padding=padding,
                    lhs_dilation=lhs_dilation)
            for g in range(groups)
        ]
        y = jnp.concatenate(ys, axis=-1)
        return y if b is None else y + b
    y = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride,),
        padding=padding,
        lhs_dilation=(lhs_dilation,),
        rhs_dilation=(dilation,),
        dimension_numbers=DIMSPEC_1D,
        feature_group_count=groups,
        preferred_element_type=x.dtype,
    )
    if b is not None:
        y = y + b
    return y


def causal_conv1d(x, params: dict, *, stride: int = 1, dilation: int = 1,
                  groups: int = 1, state: Optional[jnp.ndarray] = None):
    """Causal 1-D convolution.

    x: (B, T, C_in).  Batch mode (state is None): left zero-pad (K-1)*d then
    VALID conv.  Streaming mode: prepend `state`, VALID conv, return
    (y, new_state) with new_state = last (K-1)*d inputs.
    """
    w = params["w"]
    b = params.get("b")
    k = w.shape[0]
    pad = (k - 1) * dilation
    if state is None:
        return _conv1d(x, w, b, stride=stride, dilation=dilation,
                       padding=[(pad, 0)], groups=groups)
    xc = jnp.concatenate([state, x], axis=1) if pad > 0 else x
    y = _conv1d(xc, w, b, stride=stride, dilation=dilation,
                padding=[(0, 0)], groups=groups)
    new_state = xc[:, xc.shape[1] - pad:, :] if pad > 0 else state
    return y, new_state


def noncausal_conv1d(x, params: dict, *, stride: int = 1, dilation: int = 1,
                     groups: int = 1, padding: int = -1):
    """Symmetric-pad conv (ref: layers/conv_layer.py:35-74).

    Default padding = (K-1)//2 * d on both sides, like torch Conv1d."""
    w = params["w"]
    k = w.shape[0]
    if padding < 0:
        padding = (k - 1) // 2 * dilation
    return _conv1d(x, w, params.get("b"), stride=stride, dilation=dilation,
                   padding=[(padding, padding)], groups=groups)


def _conv_transpose_full(x, w, b, stride: int):
    """Full (padding=0) transposed conv via input dilation.

    x: (B, T, C_in); w: (K, C_in, C_out) in *gathering* orientation:
    y[t] = sum_k w[k] @ x_up[t + k], where x_up is x with (stride-1) zeros
    inserted between samples.  Output length = (T-1)*stride + K, identical to
    torch ConvTranspose1d(padding=0, output_padding=0) when
    w[k, i, o] = W_torch[i, o, K-1-k].
    """
    k = w.shape[0]
    return _conv1d(x, w, b, stride=1, dilation=1,
                   padding=[(k - 1, k - 1)], lhs_dilation=stride)


def causal_conv_transpose1d(x, params: dict, *, stride: int,
                            state: Optional[jnp.ndarray] = None):
    """Causal transposed conv with the reference's pad/trim convention.

    Batch: replication-pad left by L=ceil(K/s)-1, full transposed conv, trim
    [s:-s].  Streaming: prepend `state` (zeros initially), same conv+trim,
    state := last L input frames.
    """
    w = params["w"]
    b = params.get("b")
    k = w.shape[0]
    pad = math.ceil(k / stride) - 1
    if state is None:
        if pad > 0:
            left = jnp.repeat(x[:, :1, :], pad, axis=1)
            xc = jnp.concatenate([left, x], axis=1)
        else:
            xc = x
        y = _conv_transpose_full(xc, w, b, stride)
        return y[:, stride:y.shape[1] - stride, :]
    xc = jnp.concatenate([state, x], axis=1) if pad > 0 else x
    y = _conv_transpose_full(xc, w, b, stride)
    y = y[:, stride:y.shape[1] - stride, :]
    new_state = xc[:, xc.shape[1] - pad:, :] if pad > 0 else state
    return y, new_state


def noncausal_conv_transpose1d(x, params: dict, *, stride: int,
                               padding: int = -1, output_padding: int = -1):
    """Symmetric transposed conv (ref: layers/conv_layer.py:77-115).

    Default padding=(s+1)//2, output_padding=s%2 like the reference."""
    w = params["w"]
    if padding < 0:
        padding = (stride + 1) // 2
    if output_padding < 0:
        output_padding = 1 if stride % 2 else 0
    y = _conv_transpose_full(x, w, params.get("b"), stride)
    hi = y.shape[1] - (padding - output_padding)
    return y[:, padding:hi, :]


def noncausal_conv2d(x, params: dict, *, stride=1, dilation=1, groups: int = 1,
                     padding=-1):
    """2-D conv with torch-style symmetric default padding (discriminators).

    x: (B, H, W, C); w: (KH, KW, C_in//groups, C_out)."""
    w = params["w"]
    kh, kw = w.shape[0], w.shape[1]
    st = (stride, stride) if isinstance(stride, int) else tuple(stride)
    dl = (dilation, dilation) if isinstance(dilation, int) else tuple(dilation)
    if isinstance(padding, int) and padding < 0:
        padding = ((kh - 1) // 2 * dl[0], (kw - 1) // 2 * dl[1])
    if isinstance(padding, int):
        padding = (padding, padding)
    pads = [(padding[0], padding[0]), (padding[1], padding[1])]
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=st, padding=pads, rhs_dilation=dl,
        dimension_numbers=DIMSPEC_2D, feature_group_count=groups,
        preferred_element_type=x.dtype)
    b = params.get("b")
    if b is not None:
        y = y + b
    return y
