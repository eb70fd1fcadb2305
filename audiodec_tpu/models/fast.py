"""Fast batch inference paths: fused-Pallas residual stacks + XLA strided
convs.

Numerically equivalent to models.autoencoder.{encoder,decoder}_apply (same
f32 MXU matmuls, fixed tap order); the fused kernels keep the residual-unit
chains in VMEM, collapsing the HBM traffic the hot low-channel/high-rate
blocks are bound by.  Use for batch transcode / benchmarking on TPU; the XLA
path stays the reference for parity tests and training.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from audiodec_tpu.models.autoencoder import GeneratorConfig, _res_unit_apply
from audiodec_tpu.ops.conv import causal_conv1d, causal_conv_transpose1d
from audiodec_tpu.ops.pallas.folded_stack import (
    folded_residual_stack,
    res_stack_params,
)


def _use_folded(c: int, t: int, cfg: GeneratorConfig) -> bool:
    # the folded kernel wins only where XLA is lane-starved: C<=32 (fold
    # factor >=4).  At C=64/128 the fold's halo-offset FLOP amplification
    # outweighs the lane fill (measured, tools/folded_probe.py).
    f = max(1, 128 // max(c, 1))
    return (cfg.nonlinear_activation == "ELU"
            and not cfg.nonlinear_activation_params
            and f >= 4 and t % f == 0)


def res_stack_auto(x, block_params, cfg: GeneratorConfig, interpret=None,
                   int8=False):
    """Residual stack: folded-time Pallas kernel where it beats XLA
    (C<=32; tools/folded_probe.py), plain XLA chain otherwise.

    int8=True (quantized decode mode): run EVERY stack width through the
    folded kernel with int8 MXU dots (2x the bf16 dot rate on v5e) —
    per-lane weight scales, per-row dynamic activation scales; quality
    deltas measured in BENCHMARKS.md."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, t, c = x.shape
    if int8:
        if (cfg.nonlinear_activation == "ELU"
                and not cfg.nonlinear_activation_params):
            return folded_residual_stack(
                x, res_stack_params(block_params),
                dilations=tuple(cfg.res_dilations),
                kernel_size=cfg.res_kernel_size, int8_dots=True,
                interpret=interpret)
        # the folded int8 kernel hardcodes param-free ELU; a user asking
        # for int8 must not silently get a different mode (trace-time
        # warning — res_stack_auto runs under jit tracing, once per shape)
        import warnings
        warnings.warn(
            f"int8 residual stacks require param-free ELU activation "
            f"(got {cfg.nonlinear_activation}"
            f"{dict(cfg.nonlinear_activation_params) or ''}); "
            f"falling back to the non-int8 path")
    if _use_folded(c, t, cfg):
        return folded_residual_stack(
            x, res_stack_params(block_params),
            dilations=tuple(cfg.res_dilations),
            kernel_size=cfg.res_kernel_size, interpret=interpret)
    act = cfg.act
    for j, d in enumerate(cfg.res_dilations):
        x = _res_unit_apply(block_params["res"][j], x, dilation=d, act=act,
                            mode="causal")
    return x


def encoder_apply_folded(p, x, cfg: GeneratorConfig, interpret=None):
    """Batch causal encoder, folded-stack fast path.  x: (B, T, C).

    Same structure as models.autoencoder.encoder_apply (batch mode); the
    residual stacks run in the folded Pallas kernel where profitable."""
    assert cfg.mode == "causal" and cfg.codec == "audiodec"
    x = causal_conv1d(x, p["conv"])
    for i, stride in enumerate(cfg.enc_strides):
        bp = p["blocks"][i]
        x = res_stack_auto(x, bp, cfg, interpret)
        x = causal_conv1d(x, bp["conv"], stride=stride)
    return x


def decoder_apply_folded(p, z, cfg: GeneratorConfig, interpret=None,
                         int8=False):
    """Batch causal decoder, folded-stack fast path.  z: (B, T', D).

    int8=True: quantized-decoder mode — residual stacks use int8 MXU dots
    at every width; the strided/transposed convs keep their input dtype."""
    assert cfg.mode == "causal" and cfg.codec == "audiodec"
    x = causal_conv1d(z, p["conv1"])
    for i, stride in enumerate(cfg.dec_strides):
        bp = p["blocks"][i]
        x = causal_conv_transpose1d(x, bp["conv"], stride=stride)
        x = res_stack_auto(x, bp, cfg, interpret, int8=int8)
    return causal_conv1d(x, p["conv2"])


# ---------------------------------------------------------------------------
# batch-folded whole-decoder decode (round-4 lever; tools/decfold_probe.py)
# ---------------------------------------------------------------------------

def batchfold_auto(n_frames: int, target_chunk: int = 200,
                   max_fold: int = 8) -> int:
    """Pick the decode batch-fold factor for an n_frames-long code sequence.

    F=8 at nc=200 chunk frames measured fastest on the 10 s x 48 kHz
    production shape (1.55x over the direct decoder, tools/decfold_probe.py
    round 4); larger F pays more redundant halo FLOPs (28-frame halo),
    smaller F leaves the C=32 stack lane-starved.  Shorter sequences scale
    F down to keep chunks >= ~target_chunk frames."""
    f = 1
    while f * 2 <= max_fold and n_frames // (f * 2) >= target_chunk:
        f *= 2
    return f


def _apply_batchfold_frames(apply_fn, zq, h: int, hop: int, f: int,
                            head_patch: bool = True):
    """Generic frame-level batch-fold for an upsampling decoder/vocoder:
    zq (B, n, D) -> chunks (B*F, n/F + h, D) with an h-frame left halo of
    REAL context (the chunk-halo recipe of parallel/codec.py, reshape
    instead of ppermute), one apply at the folded batch, one output
    unfold, and a direct head patch for the first h*hop samples (batch-
    mode CausalConvTranspose1d left-pads by REPLICATING the first frame,
    ref layers/conv_layer.py:184-197, which a zero halo cannot
    reproduce — same reason as parallel/codec.py dec_head).

    head_patch=False skips the direct head decode, leaving the first
    h*hop output samples zero-halo-decoded — for callers that trim or
    re-patch that region themselves (parallel/codec.py dec_local trims
    exactly [0, h*hop) and repairs the global head via dec_head)."""
    b, n, d = zq.shape
    pad = (-n) % f
    zp = jnp.pad(zq, ((0, 0), (h, pad), (0, 0)))
    nc = (n + pad) // f
    chunks = jnp.stack(
        [zp[:, i * nc:i * nc + nc + h] for i in range(f)],
        axis=1).reshape(b * f, nc + h, d)
    y = apply_fn(chunks)
    y = y[:, h * hop:, :].reshape(b, f * nc * hop, -1)[:, :n * hop]
    if not head_patch:
        return y
    head = apply_fn(zq[:, :min(2 * h, n)])[:, :h * hop]
    return jax.lax.dynamic_update_slice(y, head, (0, 0, 0))


def decoder_apply_batchfold(p, zq, cfg: GeneratorConfig, *, fold=None,
                            head_patch: bool = True, fold_from="auto"):
    """Full-decoder apply with the code-frame axis folded into batch
    (_apply_batchfold_frames with halo = decoder_halo_frames) — re-tiles
    the dominant C=32 stack at the output rate onto the MXU.

    Numeric class: the fold changes XLA's conv tiling, so outputs deviate
    from the direct decoder at bf16-reassociation level (measured 5.2e-3
    rel on hardware, equal quality vs the f32 anchor) — use for bf16/mixed
    decoders, NOT for the f32 parity path.

    1.55x over the direct bf16 decoder at the production 10 s x 48 kHz
    batch shape (fold=8, tools/decfold_probe.py round 4).

    fold_from: run conv1 + the first `fold_from` blocks DIRECT, then fold
    only the remaining (lane-starved) stages — the round-5 stage sweep
    measured the fold a loss at the decoder's C>=128 stages, and a late
    fold's halo is only the tail stages' receptive field at their input
    rate (29 frames of 12x-upsampled context vs 28 code frames of the
    whole decoder: redundancy drops 14% -> <1%).  'auto' =
    decoder_fold_from_auto (first C<128 block); None/0 = whole decoder
    folded (round-4 behavior).
    """
    import math

    from audiodec_tpu.models.autoencoder import _res_unit_apply
    from audiodec_tpu.parallel.codec import decoder_halo_frames

    f = batchfold_auto(zq.shape[1]) if fold is None else fold
    if f <= 1:
        return _decoder_direct(p, zq, cfg)
    if fold_from == "auto":
        fold_from = decoder_fold_from_auto(cfg)
    if not fold_from:
        return _apply_batchfold_frames(
            lambda z: _decoder_direct(p, z, cfg), zq,
            decoder_halo_frames(cfg), cfg.hop_length, f,
            head_patch=head_patch)

    act = cfg.act
    x = causal_conv1d(zq, p["conv1"])
    for i in range(fold_from):
        bp = p["blocks"][i]
        x = causal_conv_transpose1d(x, bp["conv"],
                                    stride=cfg.dec_strides[i])
        for j, d in enumerate(cfg.res_dilations):
            x = _res_unit_apply(bp["res"][j], x, dilation=d, act=act,
                                mode="causal")

    def tail(xc):
        y = xc
        for i in range(fold_from, len(cfg.dec_strides)):
            bp = p["blocks"][i]
            y = causal_conv_transpose1d(y, bp["conv"],
                                        stride=cfg.dec_strides[i])
            for j, d in enumerate(cfg.res_dilations):
                y = _res_unit_apply(bp["res"][j], y, dilation=d, act=act,
                                    mode="causal")
        return causal_conv1d(y, p["conv2"])

    tail_hop = math.prod(cfg.dec_strides[fold_from:])
    h = decoder_halo_frames(cfg, from_stage=fold_from)
    return _apply_batchfold_frames(tail, x, h, tail_hop, f,
                                   head_patch=head_patch)


def vocoder_fold_from_auto(cfg) -> int:
    """First upsample stage whose output channels drop below 128 (same
    measured C>=128 boundary as decoder_fold_from_auto)."""
    for i in range(len(cfg.upsample_scales)):
        if cfg.stage_channels(i) < 128:
            return i
    return 0


def vocoder_apply_batchfold(p, zq, voc_cfg, *, fold=None,
                            head_patch: bool = True, fold_from="auto"):
    """HiFiGAN vocoder apply with the code-frame axis folded into batch
    (_apply_batchfold_frames with halo = vocoder_halo_frames) — the AD
    v1/v2 receiver's analogue of decoder_apply_batchfold, for bf16-class
    vocoder decodes (same numeric-class caveat).

    fold_from: as in decoder_apply_batchfold — run the wide (C>=128)
    early stages direct and fold only the lane-starved tail, with the
    tail stages' own (small) receptive field as halo.  'auto' =
    vocoder_fold_from_auto; None/0 = whole vocoder folded."""
    import math

    from audiodec_tpu.models.vocoder import vocoder_apply
    from audiodec_tpu.parallel.codec import vocoder_halo_frames

    f = batchfold_auto(zq.shape[1]) if fold is None else fold
    if f <= 1:
        return vocoder_apply(p, zq, voc_cfg)
    if fold_from == "auto":
        fold_from = vocoder_fold_from_auto(voc_cfg)
    if not fold_from:
        hop = math.prod(voc_cfg.upsample_scales)
        return _apply_batchfold_frames(
            lambda z: vocoder_apply(p, z, voc_cfg), zq,
            vocoder_halo_frames(voc_cfg), hop, f, head_patch=head_patch)

    from audiodec_tpu.models.vocoder import _fusion_apply
    from audiodec_tpu.ops.activations import get_activation
    from audiodec_tpu.ops.conv import causal_conv_transpose1d as convT

    act = voc_cfg.act
    lrelu = get_activation("LeakyReLU")
    c = zq
    if voc_cfg.stats and "mean" in p:
        c = (c - p["mean"]) / p["scale"]
    c = causal_conv1d(c, p["input_conv"])
    for i in range(fold_from):
        c = convT(act(c), p["upsamples"][i],
                  stride=voc_cfg.upsample_scales[i])
        c = _fusion_apply(p["blocks"][i], c, voc_cfg)

    def tail(xc):
        y = xc
        for i in range(fold_from, len(voc_cfg.upsample_scales)):
            y = convT(act(y), p["upsamples"][i],
                      stride=voc_cfg.upsample_scales[i])
            y = _fusion_apply(p["blocks"][i], y, voc_cfg)
        y = causal_conv1d(lrelu(y), p["output_conv"])
        return jnp.tanh(y)

    tail_hop = math.prod(voc_cfg.upsample_scales[fold_from:])
    h = vocoder_halo_frames(voc_cfg, from_stage=fold_from)
    return _apply_batchfold_frames(tail, c, h, tail_hop, f,
                                   head_patch=head_patch)


def encoder_unfold_auto(cfg: GeneratorConfig):
    """First encoder block whose residual stack reaches C>=128 — the
    round-5 stage sweep measured the fold HURTING there (+13-15% vs
    direct: halo redundancy with no lane-fill benefit), while C<=64
    stacks gain 1.4-3.2x.  Partial folds unfold before that block."""
    c = cfg.encode_channels
    for i in range(len(cfg.enc_strides)):
        if c >= 128:
            return i
        c = cfg.encode_channels * cfg.enc_ratios[i]
    return len(cfg.enc_strides)


def decoder_fold_from_auto(cfg: GeneratorConfig):
    """First decoder block whose residual stack drops below C=128 — the
    late-fold starts there (same stage-sweep evidence, mirrored)."""
    n = len(cfg.dec_strides)
    for i in range(n):
        c = (cfg.decode_channels * cfg.dec_ratios[i + 1]
             if i + 1 < len(cfg.dec_ratios) else cfg.decode_channels)
        if c < 128:
            return i
    return 0


def encoder_apply_batchfold(p, x, cfg: GeneratorConfig, *, fold=None,
                            unfold_after="auto"):
    """Whole-encoder apply with the waveform axis folded into batch:
    x (B, T, C) -> chunks (B*F, T/F + halo, C) with an
    encoder_halo_samples() left halo (hop-aligned, so every frame keeps
    its stride phase), one encoder pass at the folded batch, trim the
    halo frames, unfold.  Returns the (B, T/hop, C_enc) feature map —
    run projector/RVQ on the unfolded result.

    The encoder is purely causal (no transposed convs), so chunk 0's
    zero-filled halo IS batch-mode zero left-padding: no head patch
    needed, every chunk is semantically exact.  At F>=4 XLA picks its MXU
    conv algorithm for the re-tiled C=32 stack, which changes f32
    rounding within the one-pass-bf16 class the TPU default already uses
    — measured 2.27x encode speedup at fold 8 with 0/204800 RVQ index
    flips vs the direct path (tools/encfold_probe.py round 4).  NOT for
    the --precision exact/highest parity paths, which stay direct.

    unfold_after: run only conv0 + the first `unfold_after` blocks
    folded, then merge the chunks back (drop each chunk's halo at the
    current rate, reshape to (B, ., C)) and run the deep blocks direct —
    the round-5 stage sweep measured the fold a LOSS at C>=128 stacks
    (+13-15%: halo redundancy with no lane-fill gain), so the partial
    fold keeps it only where it wins, and the halo shrinks to the folded
    blocks' own receptive field (7500 -> 600 samples at unfold_after=2
    for symAD; encoder_halo_samples(through_blocks=...)).  'auto' =
    encoder_unfold_auto; None = whole encoder folded (round-4 behavior).
    """
    from audiodec_tpu.models.autoencoder import (
        _res_unit_apply,
        encoder_apply,
    )
    from audiodec_tpu.parallel.codec import encoder_halo_samples

    b, t, c = x.shape
    hop = cfg.hop_length
    n = t // hop
    f = batchfold_auto(n) if fold is None else fold
    if f <= 1:
        return encoder_apply(p, x, cfg)
    if unfold_after == "auto":
        unfold_after = encoder_unfold_auto(cfg)
    n_blocks = len(cfg.enc_strides)
    u = n_blocks if unfold_after is None else min(unfold_after, n_blocks)

    h = encoder_halo_samples(cfg) if u == n_blocks \
        else encoder_halo_samples(cfg, through_blocks=u)
    pad = (-t) % (f * hop)
    xp = jnp.pad(x, ((0, 0), (h, pad), (0, 0)))
    tc = (t + pad) // f
    chunks = jnp.stack(
        [xp[:, i * tc:i * tc + tc + h] for i in range(f)],
        axis=1).reshape(b * f, tc + h, c)
    if u == n_blocks:
        hh = encoder_apply(p, chunks, cfg)
        h_fr = h // hop
        hh = hh[:, h_fr:, :]
        return hh.reshape(b, f * (tc // hop), hh.shape[-1])[:, :n]

    # partial: folded shallow blocks, direct deep blocks
    act = cfg.act
    y = causal_conv1d(chunks, p["conv"])
    h_rate, tc_rate = h, tc
    for i in range(u):
        bp = p["blocks"][i]
        for j, d in enumerate(cfg.res_dilations):
            y = _res_unit_apply(bp["res"][j], y, dilation=d, act=act,
                                mode="causal")
        y = causal_conv1d(y, bp["conv"], stride=cfg.enc_strides[i])
        h_rate //= cfg.enc_strides[i]
        tc_rate //= cfg.enc_strides[i]
    # merge chunks: drop each chunk's halo, restore (B, ., C) contiguity
    y = y[:, h_rate:, :].reshape(b, f * tc_rate, y.shape[-1])
    for i in range(u, n_blocks):
        bp = p["blocks"][i]
        for j, d in enumerate(cfg.res_dilations):
            y = _res_unit_apply(bp["res"][j], y, dilation=d, act=act,
                                mode="causal")
        y = causal_conv1d(y, bp["conv"], stride=cfg.enc_strides[i])
    return y[:, :n]


def decode_batchfold(dec_params, q_params, idx, cfg: GeneratorConfig, *,
                     dec_dtype=jnp.bfloat16, fold=None):
    """Batch-folded decode from RVQ indices: one rvq_lookup, then
    decoder_apply_batchfold (see its docstring for semantics/measurement).
    """
    from audiodec_tpu.ops.vq import rvq_lookup
    zq = rvq_lookup(idx, q_params).astype(dec_dtype)
    return decoder_apply_batchfold(dec_params, zq, cfg, fold=fold)


def _decoder_direct(p, zq, cfg: GeneratorConfig):
    from audiodec_tpu.models.autoencoder import decoder_apply
    return decoder_apply(p, zq, cfg)


# ---------------------------------------------------------------------------
# vocoder fast path (HiFiGAN resblocks in the folded kernel)
# ---------------------------------------------------------------------------

def _voc_resblock_params(p_block):
    """((w1, w2), ...) + biases from a vocoder resblock's convs1/convs2
    lists (models.vocoder param tree)."""
    units = tuple((c1["w"], c2["w"])
                  for c1, c2 in zip(p_block["convs1"], p_block["convs2"]))
    if "b" in p_block["convs1"][0]:
        biases = tuple((c1["b"], c2["b"])
                       for c1, c2 in zip(p_block["convs1"],
                                         p_block["convs2"]))
    else:
        biases = None
    return units, biases


def _voc_use_folded(cfg, c: int, t: int) -> bool:
    f = max(1, 128 // max(c, 1))
    return (cfg.use_additional_convs
            and cfg.nonlinear_activation == "LeakyReLU"
            and f >= 4 and t % f == 0)


def _voc_resblock_folded(p_block, x, *, kernel_size, dilations, slope,
                         interpret):
    units, biases = _voc_resblock_params(p_block)
    return folded_residual_stack(
        x, units, dilations=tuple(dilations), kernel_size=kernel_size,
        kernel_size2=kernel_size, act="leaky_relu", act_param=slope,
        biases=biases, interpret=interpret)


def _voc_fusion_auto(p, x, cfg, interpret):
    """Fusion block (MultiGroupConv1d / MultiReceptiveField) with folded
    resblocks where profitable; falls back to the plain XLA path."""
    from audiodec_tpu.models.vocoder import _fusion_apply

    b, t, c = x.shape
    if not _voc_use_folded(cfg, c, t):
        return _fusion_apply(p, x, cfg)
    slope = dict(cfg.nonlinear_activation_params).get("negative_slope", 0.01)
    if cfg.grouped:
        # groups -> independent dense resblocks on the untiled input
        # (identical math to channel-repeat + grouped conv; see
        # models.vocoder._fusion_apply)
        G = cfg.groups

        def slice_group(conv_p, g):
            pg = {"w": conv_p["w"][..., g * c:(g + 1) * c]}
            if "b" in conv_p:
                pg["b"] = conv_p["b"][g * c:(g + 1) * c]
            return pg

        outs = []
        for g in range(G):
            pg = {"convs1": [slice_group(cp, g) for cp in p["convs1"]],
                  "convs2": [slice_group(cp, g) for cp in p["convs2"]]}
            outs.append(_voc_resblock_folded(
                pg, x, kernel_size=cfg.resblock_kernel_sizes[0],
                dilations=cfg.resblock_dilations[0], slope=slope,
                interpret=interpret))
        xg = jnp.concatenate(outs, axis=-1)
        return causal_conv1d(xg, p["conv_out"])
    n = len(cfg.resblock_kernel_sizes)
    cs = 0.0
    for i in range(n):
        cs = cs + _voc_resblock_folded(
            p["blocks"][i], x, kernel_size=cfg.resblock_kernel_sizes[i],
            dilations=cfg.resblock_dilations[i], slope=slope,
            interpret=interpret)
    return cs / n


def vocoder_apply_folded(p, c, cfg, interpret=None):
    """Batch vocoder decode, folded-resblock fast path.  c: (B, T, D) codes.

    Same structure as models.vocoder.vocoder_apply (batch mode, ref:
    models/vocoder/HiFiGAN.py:141-161); the low-channel/high-rate resblock
    stages run in the folded Pallas kernel."""
    from audiodec_tpu.ops.activations import get_activation
    from audiodec_tpu.ops.conv import causal_conv_transpose1d as convT

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    act = cfg.act
    lrelu = get_activation("LeakyReLU")
    if cfg.stats and "mean" in p:
        c = (c - p["mean"]) / p["scale"]
    c = causal_conv1d(c, p["input_conv"])
    for i, s in enumerate(cfg.upsample_scales):
        c = convT(act(c), p["upsamples"][i], stride=s)
        c = _voc_fusion_auto(p["blocks"][i], c, cfg, interpret)
    c = causal_conv1d(lrelu(c), p["output_conv"])
    return jnp.tanh(c)
