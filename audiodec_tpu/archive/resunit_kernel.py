"""Fused causal residual-unit stack (Pallas/TPU).

The codec's hot loop is stacks of 3 residual units per encoder/decoder block
(ref: models/autoencoder/modules/residual_unit.py:49-81 — ELU -> causal
conv(k=7, dil d) -> ELU -> 1x1 conv -> skip, d in (1,3,9)).  The XLA path
round-trips every conv through HBM (~8 tensor passes per stack), which makes
the low-channel high-rate blocks bandwidth-bound.  This kernel computes the
whole stack in VMEM:

- time is tiled; each tile carries a left halo equal to the stack's total
  receptive field, so tiles are independent (same trick as the chunk-halo
  sequence parallelism, at VMEM granularity);
- dilated convs run as k per-tap (TILE, C) @ (C, C) MXU matmuls in f32 with
  fixed tap order; ELU on the VPU; the 1x1 conv is one matmul;
- HBM traffic collapses to one read (+halo) and one write per stack.

The overlapped-window input is materialized outside the kernel (a ~1.1x read
amplification replacing ~8 full passes).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE_T = 1024


def _elu(x):
    # jax.nn.elu uses expm1, which has no Pallas TPU lowering; the explicit
    # form differs only below f32 roundoff for our value range
    return jnp.where(x > 0, x, jnp.exp(jnp.minimum(x, 0.0)) - 1.0)


def _windowed(x, tile_t: int, pad: int):
    """x (B, T, C) -> (B, n_tiles, tile_t + pad, C) overlapping windows with
    `pad` zeros of left context before t=0 (causal zero padding)."""
    b, t, c = x.shape
    n_tiles = t // tile_t
    xp = jnp.pad(x, ((0, 0), (pad, 0), (0, 0)))
    starts = jnp.arange(n_tiles) * tile_t

    def take(s):
        return jax.lax.dynamic_slice(xp, (0, s, 0), (b, tile_t + pad, c))

    win = jax.vmap(take, out_axes=1)(starts)  # (B, n_tiles, tile+pad, C)
    return win, n_tiles


@partial(jax.jit, static_argnames=("dilations", "kernel_size", "tile_t",
                                   "interpret"))
def fused_residual_stack(x, unit_params: Tuple, *,
                         dilations: Tuple[int, ...] = (1, 3, 9),
                         kernel_size: int = 7,
                         tile_t: int = DEFAULT_TILE_T,
                         interpret: bool = False):
    """x: (B, T, C); unit_params: tuple of (w1 (K,C,C), w2 (1,C,C)) per unit.
    Equivalent to applying the causal residual units sequentially in batch
    mode (zero left padding).  T must be a multiple of tile_t (pad upstream).
    """
    b, t, c = x.shape
    pad = sum((kernel_size - 1) * d for d in dilations)
    # largest divisor of t that fits the tile budget (keeps VMEM bounded for
    # any sequence length)
    tile = 1
    for cand in range(min(tile_t, t), 0, -1):
        if t % cand == 0:
            tile = cand
            break
    win, n_tiles = _windowed(x, tile, pad)

    flat_params = []
    in_specs = [pl.BlockSpec((1, 1, tile + pad, c),
                             lambda bi, ti: (bi, ti, 0, 0),
                             memory_space=pltpu.VMEM)]
    for (w1, w2) in unit_params:
        flat_params.append(w1)
        flat_params.append(w2)
        in_specs.append(pl.BlockSpec(
            w1.shape, (lambda nd: lambda bi, ti: (0,) * nd)(w1.ndim),
            memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec(
            w2.shape, (lambda nd: lambda bi, ti: (0,) * nd)(w2.ndim),
            memory_space=pltpu.VMEM))

    def kernel(xw_ref, *refs):
        # xw block is (1, 1, tile+pad, C) -> squeeze leading axes
        out_ref = refs[-1]
        x_ = xw_ref[0, 0].astype(jnp.float32)
        idx = 0
        for d in dilations:
            w1 = refs[idx][:]
            w2 = refs[idx + 1][:]
            idx += 2
            k = w1.shape[0]
            span = (k - 1) * d
            y1 = _elu(x_)
            t_out = x_.shape[0] - span
            acc = jnp.zeros((t_out, x_.shape[1]), jnp.float32)
            for j in range(k):
                seg = y1[j * d: j * d + t_out, :]
                acc += jax.lax.dot_general(
                    seg, w1[j],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            y2 = jax.lax.dot_general(
                _elu(acc), w2[0],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            x_ = x_[span:, :] + y2
        out_ref[0, 0] = x_

    out = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, tile, c),
                               lambda bi, ti: (bi, ti, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles, tile, c), jnp.float32),
        interpret=interpret,
    )(win, *flat_params)
    return out.reshape(b, t, c)


from audiodec_tpu.ops.pallas.folded_stack import res_stack_params  # noqa: F401,E402
