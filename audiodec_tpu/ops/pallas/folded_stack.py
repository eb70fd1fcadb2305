"""Time-folded fused causal residual stack (Pallas/TPU).

The codec's hot loop is 3-unit residual stacks (ref:
models/autoencoder/modules/residual_unit.py:49-81 — ELU -> causal
conv(k=7, dil d) -> ELU -> 1x1 conv -> skip, d in (1,3,9)) at low channel
counts (C=32/64) and high rates (T up to 480k).  XLA is *compute*-bound
there: a (T, 32) conv uses 32 of the MXU's 128 lanes on both operands
(~1/16 utilization; measured ~7.6 TFLOP/s, tools/stage_probe.py).

This kernel restores full MXU utilization by **folding time into lanes**:

    x (B, T, C)  ->  X (B, T/F, F*C)   with F = 128 // C (a pure reshape)

In folded coordinates a causal dilated conv becomes a block-Toeplitz sum of
full-width matmuls:

    Y[u] = sum_o X[u + o] @ Wf_o,       o in a small set of non-positive
                                        row offsets (see _fold_offsets)

where each (F*C, F*C) folded weight Wf_o scatters the original taps
w[j] (C, C) into (lane-group g -> lane-group p) blocks.  For C=32 (F=4) the
three dilations need 3/6/13 offsets; every matmul is (rows, 128) @ (128, 128).
The 1x1 conv folds to a block-diagonal kron(I_F, w).  The whole 3-unit stack
runs in VMEM: HBM traffic is one read + one write of the activation (plus a
~2% halo side-array), and every MAC runs at full lane width.

Numerics: same dtype/accumulation class as the XLA conv path (dot with
f32 accumulation); reduction order differs (taps grouped per row-offset), so
results match XLA to f32 roundoff, not bit-exactly.

Batch-mode semantics only (zero left context at t=0), matching
models.autoencoder._res_unit_apply with state=None.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE_ROWS = 1024


def _elu(x):
    # explicit form: Pallas TPU lacks an expm1 lowering (jax.nn.elu uses it).
    # Compute in f32: Mosaic on v5e has no bf16 vector compare, and this
    # matches XLA's elu-then-cast numerics for the bf16 storage path.
    xf = x.astype(jnp.float32)
    return jnp.where(xf > 0, xf, jnp.exp(jnp.minimum(xf, 0.0)) - 1.0)


def _fold_offsets(k: int, d: int, F: int) -> list:
    """Distinct folded-row offsets used by a causal conv(k, dilation d) under
    time-fold F.  All are <= 0; the list is ascending and ends at 0."""
    span = (k - 1) * d
    return sorted({(p + j * d - span) // F
                   for p in range(F) for j in range(k)})


def fold_conv_weight(w: jnp.ndarray, dilation: int, F: int) -> jnp.ndarray:
    """(k, C, C) tap weights -> (n_offsets, F*C, F*C) folded weights.

    Wf[i, g*C:(g+1)*C, p*C:(p+1)*C] = w[j] for the (p, j) pairs whose source
    row offset is offsets[i] and source lane group is g."""
    k, c, c_out = w.shape
    assert c == c_out
    span = (k - 1) * dilation
    offsets = _fold_offsets(k, dilation, F)
    pos = {o: i for i, o in enumerate(offsets)}
    fc = F * c
    wf = jnp.zeros((len(offsets), fc, fc), w.dtype)
    for p in range(F):
        for j in range(k):
            o, g = divmod(p + j * dilation - span, F)
            wf = wf.at[pos[o], g * c:(g + 1) * c, p * c:(p + 1) * c].set(w[j])
    return wf


def fold_1x1_weight(w: jnp.ndarray, F: int) -> jnp.ndarray:
    """(1, C, C) -> block-diagonal (F*C, F*C)."""
    return jnp.kron(jnp.eye(F, dtype=w.dtype), w[0])


def _pick_tile(n_rows: int, target: int) -> int:
    """Largest divisor of n_rows that is <= target and a multiple of 16
    (sublane-aligned for f32 and bf16); falls back to any divisor."""
    for cand in range(min(target, n_rows), 15, -1):
        if n_rows % cand == 0 and cand % 16 == 0:
            return cand
    for cand in range(min(target, n_rows), 0, -1):
        if n_rows % cand == 0:
            return cand
    return n_rows


def res_stack_params(block_params: dict) -> Tuple:
    """Extract ((w1, w2), ...) from an encoder/decoder block's 'res' list
    (models.autoencoder param tree)."""
    return tuple((u["conv1"]["w"], u["conv2"]["w"])
                 for u in block_params["res"])


@partial(jax.jit, static_argnames=("dilations", "kernel_size",
                                   "kernel_size2", "act", "act_param",
                                   "tile_rows", "bf16_dots", "int8_dots",
                                   "int8_scale", "fold", "interpret"))
def folded_residual_stack(x, unit_params: Tuple, *,
                          dilations: Tuple[int, ...] = (1, 3, 9),
                          kernel_size: int = 7,
                          kernel_size2: int = 1,
                          act: str = "elu",
                          act_param: float = 0.0,
                          biases: Tuple = None,
                          tile_rows: int = DEFAULT_TILE_ROWS,
                          bf16_dots: bool = True,
                          int8_dots: bool = False,
                          int8_scale: str = "row",
                          fold: int = 0,
                          interpret: bool = False):
    """Apply a chain of causal residual units, fused, in folded-time layout.

    x: (B, T, C); unit_params: tuple of (w1 (k, C, C), w2 (k2, C, C)) per
    unit, one per dilation.  Returns (B, T, C), batch-mode causal semantics
    (zero left padding), equivalent to chaining _res_unit_apply.

    The unit is act -> conv(k, d) -> act -> conv(k2, 1) -> +skip.  With the
    defaults (k2=1, act='elu', no biases) this is the AE residual unit
    (ref: residual_unit.py:49-81); with k2=k, act='leaky_relu'
    (act_param = slope) and biases it is the HiFiGAN resblock unit
    (ref: residual_block.py:23-106).

    biases: optional tuple of (b1 (C,), b2 (C,)) per unit.  When given, the
    kernel masks conv outputs at absolute rows before t=0 back to zero so
    the intermediate zero-left-pad semantics match the XLA chain (without
    biases, zeros propagate through act/conv on their own).

    bf16_dots: run the MXU matmuls with bf16 operands and f32 accumulation.
    This is the SAME numeric class as XLA's TPU convolutions (which multiply
    in bf16 single-pass under default precision even for f32 inputs —
    measured ~2e-3 relative deviation between XLA-f32 and true-f32 on real
    shapes); Mosaic would otherwise emit multi-pass f32 matmuls ~3x slower.
    Set False for true-f32 multiplies (interpret-mode parity tests).

    int8_dots: quantized decode mode — the v5e MXU runs int8xint8->int32
    dots at 2x the bf16 rate.  Weights are quantized per output lane
    (symmetric, absmax/127 over all folded offset planes); activations are
    quantized per folded row on the fly.  Each offset's int32 partial is
    dequantized with its own input-row scales and accumulated in f32 (per-
    row scales make a shared int32 accumulator across offsets incorrect).
    Indices/encoder are untouched by this mode — it is decode-side only;
    quality deltas are measured in BENCHMARKS.md.  Overrides bf16_dots.

    int8_scale: "row" = per-folded-row dynamic activation scales (safest;
    each offset's int32 partial must be dequantized separately, VPU-bound —
    measured at folded-bf16 speed, BENCHMARKS round 2).  "tile" = ONE
    scalar activation scale per tile: all offsets accumulate in int32 and
    dequantize ONCE per conv (the round-2 named unexplored lever), trading
    quantization granularity for the removal of the per-offset VPU dequant.
    int32 is safe but the margin is modest: each dot contracts over
    FC = fold*C (up to 2048 for a 512-channel stack at fold 4), and all
    <= 25 offsets share one accumulator, so worst case
    |acc| <= 127^2 * 2048 * 25 ~= 8.3e8 — inside int32 (2^31 ~= 2.1e9)
    with only ~2.6x headroom.  A wider config or larger fold*C*offsets
    product must re-check 127^2 * fold * C * n_offsets < 2^31.
    """
    b, t, c = x.shape
    k = kernel_size
    k2 = kernel_size2
    # fold factor: f*C = 128 (one full lane tile) measures fastest — Mosaic's
    # per-dot rate does not grow past K=N=128, so larger folds only add
    # halo-offset FLOPs (tools/folded_probe.py fold sweep)
    f = fold if fold else max(1, 128 // c)
    # pad time so it folds evenly AND the row count tiles into
    # sublane-aligned blocks (the TPU lowering requires row blocks that are
    # multiples of 8, and ragged utterance lengths otherwise have no aligned
    # divisor).  The units are causal — they never read forward — so the
    # tail zeros are inert and sliced off before returning.
    n_rows0 = -(-t // f)
    align = 256 if n_rows0 >= 256 else 16
    pad_t = (-t) % (align * f)
    if pad_t:
        x = jnp.pad(x, ((0, 0), (0, pad_t), (0, 0)))
    t_full = t + pad_t
    fc = f * c
    n_rows = t_full // f

    offs2 = _fold_offsets(k2, 1, f) if k2 > 1 else [0]
    span2 = -offs2[0]
    per_unit = []  # (offsets1, span1)
    h_total = 0
    for d in dilations:
        offs = _fold_offsets(k, d, f)
        per_unit.append((offs, -offs[0]))
        h_total += -offs[0] + span2

    xf = x.reshape(b, n_rows, fc)
    rows_tile = _pick_tile(n_rows, tile_rows)
    n_tiles = n_rows // rows_tile

    # halo side-array: the H rows preceding each tile (zeros before t=0).
    # A tiny gather (~H/rows_tile of x) so the kernel reads each row once.
    xp = jnp.pad(xf, ((0, 0), (h_total, 0), (0, 0)))
    starts = jnp.arange(n_tiles) * rows_tile

    def take(s):
        return jax.lax.dynamic_slice(xp, (0, s, 0), (b, h_total, fc))

    halos = jax.vmap(take, out_axes=1)(starts)  # (B, n_tiles, H, FC)

    flat_w = []
    in_specs = [
        pl.BlockSpec((1, 1, h_total, fc), lambda bi, ti: (bi, ti, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, rows_tile, fc), lambda bi, ti: (bi, ti, 0),
                     memory_space=pltpu.VMEM),
    ]
    dot_dtype = jnp.bfloat16 if bf16_dots else x.dtype
    wscales = []
    for (w1, w2), d in zip(unit_params, dilations):
        wf = fold_conv_weight(w1.astype(jnp.float32), d, f)
        if k2 > 1:
            w2f = fold_conv_weight(w2.astype(jnp.float32), 1, f)
        else:
            w2f = fold_1x1_weight(w2.astype(jnp.float32), f)[None]
        if int8_dots:
            # symmetric per-output-lane scales over all offset planes
            s1 = jnp.maximum(jnp.max(jnp.abs(wf), axis=(0, 1)), 1e-12) / 127.
            s2 = jnp.maximum(jnp.max(jnp.abs(w2f), axis=(0, 1)),
                             1e-12) / 127.
            wf = jnp.round(wf / s1).astype(jnp.int8)
            w2f = jnp.round(w2f / s2).astype(jnp.int8)
            wscales.append(s1)
            wscales.append(s2)
        else:
            wf = wf.astype(dot_dtype)
            w2f = w2f.astype(dot_dtype)
        flat_w.append(wf)
        flat_w.append(w2f)
        in_specs.append(pl.BlockSpec(
            wf.shape, (lambda nd: lambda bi, ti: (0,) * nd)(wf.ndim),
            memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec(
            w2f.shape, (lambda nd: lambda bi, ti: (0,) * nd)(w2f.ndim),
            memory_space=pltpu.VMEM))

    if int8_dots:
        wscale_stack = jnp.stack(wscales)  # (2*n_units, FC) f32
        flat_w.append(wscale_stack)
        in_specs.append(pl.BlockSpec(wscale_stack.shape,
                                     lambda bi, ti: (0, 0),
                                     memory_space=pltpu.VMEM))

    has_bias = biases is not None
    if has_bias:
        bstack = jnp.stack([jnp.tile(bb.astype(jnp.float32), f)
                            for unit_b in biases for bb in unit_b])
        flat_w.append(bstack)
        in_specs.append(pl.BlockSpec(bstack.shape, lambda bi, ti: (0, 0),
                                     memory_space=pltpu.VMEM))

    if act == "elu":
        _act = _elu
    elif act == "leaky_relu":
        def _act(v, slope=act_param):
            vf = v.astype(jnp.float32)
            return jnp.where(vf > 0, vf, slope * vf)
    else:
        raise NotImplementedError(f"folded stack activation {act}")

    def kernel(halo_ref, x_ref, *refs):
        out_ref = refs[-1]
        bias_ref = refs[-2] if has_bias else None
        wscale_ref = refs[-2 - int(has_bias)] if int8_dots else None
        v = jnp.concatenate([halo_ref[0, 0], x_ref[0]], axis=0)
        length = rows_tile + h_total
        # absolute folded-row index of v[0] (rows < 0 are the zero pad
        # before t=0; only tile 0 of the grid sees them)
        start = pl.program_id(1) * rows_tile - h_total

        def masked(y, row0, bvec):
            # + bias at absolute rows >= 0, back to exact zero before t=0
            # (matches the XLA chain's zero left-padding of intermediates)
            if not has_bias:
                return y
            rows = jax.lax.broadcasted_iota(jnp.int32, (y.shape[0], 1), 0)
            return jnp.where(rows + row0 >= 0, y + bvec, 0.0)

        def conv_folded(y, w_ref, offs, span, out_len, scale_row):
            """Offset-sum folded conv.  y: pre-activated f32 input.
            scale_row: per-row dequant scales (len(y), 1) in int8 "row"
            mode, a (1, 1) scalar in "tile" mode."""
            if int8_dots and int8_scale == "tile":
                acc = None
                for i, o in enumerate(offs):
                    s = o + span
                    d_ = jax.lax.dot_general(
                        y[s:s + out_len, :], w_ref[i],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                    acc = d_ if acc is None else acc + d_
                return acc.astype(jnp.float32) * scale_row
            if int8_dots:
                acc = None
                for i, o in enumerate(offs):
                    s = o + span
                    d_ = jax.lax.dot_general(
                        y[s:s + out_len, :], w_ref[i],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                    part = d_.astype(jnp.float32) * scale_row[s:s + out_len]
                    acc = part if acc is None else acc + part
                return acc
            acc = None
            for i, o in enumerate(offs):
                s = o + span
                d_ = jax.lax.dot_general(
                    y[s:s + out_len, :], w_ref[i],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = d_ if acc is None else acc + d_
            return acc

        def quantize(y):
            """f32 (rows, FC) -> (int8 rows, dequant scale): per-row
            (rows, 1) scales, or one (1, 1) scalar in "tile" mode."""
            if int8_scale == "tile":
                s_x = jnp.max(jnp.abs(y)).reshape(1, 1)
            else:
                s_x = jnp.max(jnp.abs(y), axis=1, keepdims=True)
            r = 127.0 / jnp.maximum(s_x, 1e-12)
            q = jnp.round(y * r).astype(jnp.int8)
            return q, s_x * (1.0 / 127.0)

        ridx = 0
        for u, (offs, span1) in enumerate(per_unit):
            wf_ref = refs[ridx]
            w2_ref = refs[ridx + 1]
            ridx += 2
            y1f = _act(v)
            out_len = length - span1
            if int8_dots:
                q1, sr1 = quantize(y1f)
                acc = conv_folded(q1, wf_ref, offs, span1, out_len, sr1)
                acc = acc * wscale_ref[2 * u:2 * u + 1, :]
            else:
                acc = conv_folded(y1f.astype(dot_dtype), wf_ref, offs,
                                  span1, out_len, None)
            if has_bias:
                acc = masked(acc, start + span1, bias_ref[2 * u:2 * u + 1, :])
            out_len2 = out_len - span2
            ymf = _act(acc)
            if int8_dots:
                q2, sr2 = quantize(ymf)
                y2 = conv_folded(q2, w2_ref, offs2, span2, out_len2, sr2)
                y2 = y2 * wscale_ref[2 * u + 1:2 * u + 2, :]
            else:
                y2 = conv_folded(ymf.astype(dot_dtype), w2_ref, offs2,
                                 span2, out_len2, None)
            if has_bias:
                y2 = masked(y2, start + span1 + span2,
                            bias_ref[2 * u + 1:2 * u + 2, :])
            v = v[span1 + span2:, :] + y2.astype(v.dtype)
            start += span1 + span2
            length = out_len2
        out_ref[0] = v

    out = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, rows_tile, fc),
                               lambda bi, ti: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_rows, fc), x.dtype),
        interpret=interpret,
    )(halos, xf, *flat_w)
    return out.reshape(b, t_full, c)[:, :t]
