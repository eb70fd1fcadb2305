"""Block-packed convolutions: fill the MXU for low-channel conv stacks.

The MXU multiplies 128x128 tiles; a conv with C=32 channels pads its K and N
matmul dimensions 4x, wasting ~94% of the array.  Packing P = 128//C time
phases into the channel axis turns the same conv into a block-banded conv
over (B, T/P, P*C) with kernel blocks that are genuinely 128-wide:

    x_b[tb, p*C + c] = x_pad[P*tb + p, c]
    y_b = VALID_conv(x_b, W'),  W'[m][p*C+c, s*C+o] = w[j, c, o]
        whenever  s + shift + j*d = m*P + p,   shift = L - (k-1)*d,
        L = ceil((k-1)*d / P) * P   (left zero pad, in samples)

For a k=7, d=1, C=32 conv this replaces 7 (T,32)@(32,32) passes (each padded
to 128x128 internally) with 3 (T/4,128)@(128,128) passes — ~9x fewer MXU
cycles; dilation d=3 gives ~4.7x, d=9 ~1.9x.  Elementwise ops (ELU, residual
adds) work unchanged in the blocked layout, so whole residual stacks run
blocked end-to-end (models/fast.py).

Numerics: each output element is the same sum of products, evaluated on the
MXU in f32; the tap order inside the banded kernel differs from the flat
conv's, so results agree to float tolerance (parity tests use the flat path).
"""

from __future__ import annotations

import math
from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp


def pack_factor(channels: int, target: int = 128) -> int:
    """Largest P with P*C <= target (1 when C >= target)."""
    return max(1, target // max(channels, 1))


@partial(jax.jit, static_argnames=("dilation", "p"))
def pack_weights(w: jnp.ndarray, dilation: int, p: int) -> jnp.ndarray:
    """w: (K, C_in, C_out) -> W' (kb, P*C_in, P*C_out) block-banded kernel."""
    k, ci, co = w.shape
    span = (k - 1) * dilation
    L = math.ceil(span / p) * p
    shift = L - span
    kb = L // p + 1
    wp = jnp.zeros((kb, p * ci, p * co), w.dtype)
    for s in range(p):
        for j in range(k):
            u = s + shift + j * dilation
            m, pp = u // p, u % p
            wp = wp.at[m, pp * ci:(pp + 1) * ci,
                       s * co:(s + 1) * co].set(w[j])
    return wp


def block_time(x: jnp.ndarray, p: int) -> jnp.ndarray:
    """(B, T, C) -> (B, T/P, P*C).  T must be divisible by P."""
    b, t, c = x.shape
    return x.reshape(b, t // p, p * c)


def unblock_time(x: jnp.ndarray, p: int) -> jnp.ndarray:
    """(B, T/P, P*C) -> (B, T, C)."""
    b, tb, pc = x.shape
    return x.reshape(b, tb * p, pc // p)


def blocked_causal_conv1d(xb: jnp.ndarray, w: jnp.ndarray, *, dilation: int,
                          p: int, b_bias=None) -> jnp.ndarray:
    """Causal stride-1 conv evaluated in blocked layout.

    xb: (B, T/P, P*C_in) blocked input; w: flat (K, C_in, C_out) weights.
    Returns blocked (B, T/P, P*C_out), equal (to float tolerance) to
    block_time(causal_conv1d(unblock_time(xb), w, dilation=d))."""
    wp = pack_weights(w, dilation, p)
    kb = wp.shape[0]
    y = jax.lax.conv_general_dilated(
        xb, wp, window_strides=(1,), padding=[(kb - 1, 0)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=xb.dtype)
    if b_bias is not None:
        y = y + jnp.tile(b_bias, p)
    return y


def blocked_res_stack(x: jnp.ndarray, units, *, dilations, act,
                      target: int = 128) -> jnp.ndarray:
    """Apply a chain of causal residual units (ELU -> conv(k,d) -> ELU -> 1x1
    -> skip; ref residual_unit.py:49-81) in blocked layout.

    x: (B, T, C) with T % P == 0; units: list of param dicts with
    conv1 (K,C,C) and conv2 (1,C,C)."""
    c = x.shape[-1]
    p = pack_factor(c, target)
    if p == 1:
        from audiodec_tpu.models.autoencoder import _res_unit_apply
        for u, d in zip(units, dilations):
            x = _res_unit_apply(u, x, dilation=d, act=act, mode="causal")
        return x
    t = x.shape[1]
    pad = (-t) % p
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    xb = block_time(x, p)
    for u, d in zip(units, dilations):
        y = blocked_causal_conv1d(act(xb), u["conv1"]["w"], dilation=d, p=p,
                                  b_bias=u["conv1"].get("b"))
        y = blocked_causal_conv1d(act(y), u["conv2"]["w"], dilation=1, p=p,
                                  b_bias=u["conv2"].get("b"))
        xb = xb + y
    out = unblock_time(xb, p)
    return out[:, :t] if pad else out
