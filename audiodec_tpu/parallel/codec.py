"""Chunk-parallel codec: intra-utterance sequence parallelism with
receptive-field halo exchange (SURVEY.md §2.1 item 2, §7).

Every op in the codec is a causal FIR conv, so sharding one waveform's time
axis across devices only requires each shard to see its left neighbor's
trailing context (the convolutional analogue of ring attention):

  encode:  shard s gathers H = ceil((rf-1)/hop)*hop samples from the left
           neighbor via `ppermute` (zeros arrive at shard 0, which exactly
           reproduces the batch path's zero left-padding), runs the plain
           batch causal encoder on [halo | chunk], and drops the first H/hop
           frames — every kept frame then has its full receptive field of
           real samples, so the result is bit-identical to an unsharded
           encode.
  decode:  the same at frame granularity: F halo frames, drop F*hop samples.

One `ppermute` per stack (not per layer): the halo is exchanged once at the
waveform/code level, fused into a single collective riding the ICI.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from audiodec_tpu.models.autoencoder import (
    GeneratorConfig,
    decoder_apply,
    encoder_apply,
    projector_apply,
)
from audiodec_tpu.models.vocoder import VocoderConfig, vocoder_apply
from audiodec_tpu.ops.vq import rvq_forward_index, rvq_lookup


def encoder_halo_samples(cfg: GeneratorConfig,
                         through_blocks: Optional[int] = None) -> int:
    """Left-context halo in samples, rounded up to a hop multiple so the
    stride phase of every frame is preserved across chunk seams.

    through_blocks: when set, the halo covers only conv0 + the first
    `through_blocks` encoder blocks (NOT the projector), aligned to the
    rate after those blocks — the halo a partial encoder fold needs
    (models/fast unfold_after: deep blocks run unfolded on the merged
    full-context sequence, so their receptive field costs no halo).  For
    symAD this shrinks the halo 7500 -> 600 samples at through_blocks=2.
    Default (None) keeps the full conservative halo incl. the projector,
    which the sharded codec's shard-local projector requires."""
    hop = cfg.hop_length
    if through_blocks is None:
        rf = cfg.receptive_field
        return math.ceil((rf - 1) / hop) * hop
    strides = tuple(cfg.enc_strides)
    u = min(through_blocks, len(strides))
    rf = 1 + (cfg.kernel_size - 1)
    rate = 1
    for i in range(u):
        for d in tuple(cfg.res_dilations):
            rf += (cfg.res_kernel_size - 1) * d * rate
        rf += (2 * strides[i] - 1) * rate
        rate *= strides[i]
    align = hop if u == len(strides) else rate
    return math.ceil((rf - 1) / align) * align


def decoder_halo_frames(cfg: GeneratorConfig, from_stage: int = 0) -> int:
    """Decoder receptive field in input code frames (conservative ceil walk
    through conv1 -> blocks(convT + res units) -> conv2).

    from_stage > 0 counts only the REMAINING stages (block from_stage
    onward + conv2), in frames at that block's input rate — the halo a
    mid-decoder fold needs (models/fast late-fold; the late stages' own
    receptive field is tiny relative to the whole decoder's, so folding
    late costs almost no halo redundancy)."""
    rf = 1 + (cfg.kernel_size - 1)  # conv2 at output rate
    for stride in reversed(tuple(cfg.dec_strides)[from_stage:]):
        for d in tuple(cfg.res_dilations):
            rf += (cfg.res_kernel_size - 1) * d
        rf = math.ceil(rf / stride) + (math.ceil(2 * stride / stride) - 1)
    if from_stage == 0:
        rf += cfg.kernel_size - 1  # conv1 at frame rate
    return rf


def vocoder_halo_frames(cfg: VocoderConfig, from_stage: int = 0) -> int:
    """HiFiGAN vocoder receptive field in input code frames.

    from_stage > 0: only the remaining upsample stages + output conv, in
    frames at that stage's input rate (the late-fold halo, mirroring
    decoder_halo_frames)."""
    rf = 1 + (cfg.kernel_size - 1)  # output conv
    for i in reversed(range(from_stage, len(cfg.upsample_scales))):
        s = cfg.upsample_scales[i]
        for b, k in enumerate(cfg.resblock_kernel_sizes):
            for d in cfg.resblock_dilations[b]:
                rf += (k - 1) * d
                if cfg.use_additional_convs:
                    rf += (k - 1)
        rf = math.ceil(rf / s) + (math.ceil(cfg.upsample_kernel_sizes[i] / s)
                                  - 1)
    if from_stage == 0:
        rf += cfg.kernel_size - 1  # input conv
    return rf


def _left_halo(x, halo: int, axis_name: str):
    """Fetch the last `halo` steps of left-neighbor context.  Shards with no
    source receive zeros (ppermute drops untargeted destinations), matching
    the batch path's zero left-padding.

    When the halo exceeds one shard's length the context spans several left
    neighbors, so the shift is chained: hop h delivers the shard h steps to
    the left."""
    n = jax.lax.axis_size(axis_name)
    shard_len = x.shape[1]
    perm = [(i, i + 1) for i in range(n - 1)]
    if halo <= shard_len:
        tail = x[:, shard_len - halo:, :]
        return jax.lax.ppermute(tail, axis_name, perm=perm)
    hops = math.ceil(halo / shard_len)
    parts = []
    cur = x
    for _ in range(hops):
        cur = jax.lax.ppermute(cur, axis_name, perm=perm)
        parts.insert(0, cur)
    ctx = jnp.concatenate(parts, axis=1)
    return ctx[:, ctx.shape[1] - halo:, :]


def make_sharded_codec(mesh: Mesh, params, cfg: GeneratorConfig,
                       vocoder: Optional[Tuple[dict, VocoderConfig]] = None,
                       dtype=jnp.float32, dec_dtype=None,
                       encode_fold=False, decode_fold=False):
    """Build jitted sharded encode/decode over a ('data','seq') mesh.

    Returns (encode, decode):
      encode(x: (B, T, C) sharded (data, seq)) -> idx (B, T//hop, Q)
      decode(idx) -> y (B, T, C)
    T must be divisible by seq_size * hop.  With the folds off (default),
    RVQ indices are bit-identical to the single-device batch path;
    waveforms match to f32 rounding (XLA may reassociate conv reductions
    across the different padded shapes).

    dtype / dec_dtype mirror BatchTranscoder's dtype modes: dtype is the
    encoder-side compute dtype (VQ distances always f32), dec_dtype
    (default = dtype) the decoder/vocoder dtype — dtype=f32 +
    dec_dtype=bf16 is the mixed mode with indices identical to full f32.

    encode_fold / decode_fold apply the round-4 batch-fold (models/fast)
    INSIDE each shard's local chunk — the fold is a shard-local reshape,
    so it composes with the chunk-halo exchange: the ppermute'd halo is
    already part of the local input the fold sees, and the fold's own
    chunk-0 head handling (zero halo == batch semantics for the causal
    encoder; direct head patch for the decoder/vocoder) applies to the
    local chunk exactly as on a single device.  Values: False = direct
    convs (the bit-exact contract above), None = auto fold factor
    (models/fast.batchfold_auto on the LOCAL length), int = fixed factor.
    Folded paths keep the single-device folds' semantics: same numeric
    class, measured-0 index flips for the encoder fold, bf16-class
    rounding for the decoder fold (throughput modes only).
    """
    dec_dtype = dtype if dec_dtype is None else dec_dtype
    # shard-local batch-folds (lazy import: models.fast imports this
    # module for the halo helpers)
    from audiodec_tpu.models import fast as _fast
    enc_fold = (None if encode_fold is True else encode_fold)
    dec_fold = (None if decode_fold is True else decode_fold)

    def _cast(tree, dt):
        return jax.tree_util.tree_map(
            lambda a: a.astype(dt) if a.dtype == jnp.float32 else a, tree)

    hop = cfg.hop_length
    h_samples = encoder_halo_samples(cfg)
    h_frames_enc = h_samples // hop
    if vocoder is None:
        h_dec = decoder_halo_frames(cfg)
    else:
        voc_params, voc_cfg = vocoder
        h_dec = vocoder_halo_frames(voc_cfg)

    def enc_local(params, x):
        halo = _left_halo(x, h_samples, "seq")
        xp = jnp.concatenate([halo, x], axis=1).astype(dtype)
        if encode_fold is not False:
            h = _fast.encoder_apply_batchfold(params["encoder"], xp, cfg,
                                              fold=enc_fold)
        else:
            h = encoder_apply(params["encoder"], xp, cfg)
        z = projector_apply(params["projector"], h, cfg)
        _, idx = rvq_forward_index(z.astype(jnp.float32),
                                   params["quantizer"])
        return idx[:, h_frames_enc:, :]

    def dec_local(params, idx):
        halo = _left_halo(idx, h_dec, "seq")
        idxp = jnp.concatenate([halo, idx], axis=1)
        zq = rvq_lookup(idxp, params["quantizer"]).astype(dec_dtype)
        # head_patch=False: the fold's in-chunk direct head (first
        # h_dec*hop samples) would be entirely trimmed by the slice below
        # and re-done globally by dec_head — skip the redundant decode
        if vocoder is None:
            if decode_fold is not False:
                y = _fast.decoder_apply_batchfold(params["decoder"], zq,
                                                  cfg, fold=dec_fold,
                                                  head_patch=False)
            else:
                y = decoder_apply(params["decoder"], zq, cfg)
        elif decode_fold is not False:
            y = _fast.vocoder_apply_batchfold(params["voc"], zq, voc_cfg,
                                              fold=dec_fold,
                                              head_patch=False)
        else:
            y = vocoder_apply(params["voc"], zq, voc_cfg)
        return y[:, h_dec * hop:, :].astype(jnp.float32)

    wav_spec = P("data", "seq", None)
    idx_spec = P("data", "seq", None)

    enc_params = {"encoder": _cast(params["encoder"], dtype),
                  "projector": _cast(params["projector"], dtype),
                  "quantizer": params["quantizer"]}
    dec_params = {"quantizer": params["quantizer"]}
    if vocoder is not None:
        dec_params["voc"] = _cast(vocoder[0], dec_dtype)
    else:
        dec_params["decoder"] = _cast(params["decoder"], dec_dtype)

    @jax.jit
    def encode(x):
        return shard_map(enc_local, mesh=mesh,
                         in_specs=(P(), wav_spec), out_specs=idx_spec,
                         check_vma=False)(enc_params, x)

    def dec_head(params, idx_head):
        """Exact batch-semantics decode of the utterance head.  Shard 0's
        halo is wrong for TWO independent reasons: (a) the ppermute
        zero-fill gives INDEX 0, and rvq_lookup maps index 0 to
        codebook-entry-0 embeddings — not the zero activations the batch
        path's zero left-padding produces — so the head diverges for
        every conv type, causal included; (b) batch-mode
        CausalConvTranspose1d additionally left-pads by REPLICATING the
        first input frame (ref: layers/conv_layer.py:184-197) rather
        than zeros.  Do not shrink this patch for a transposed-conv-free
        decoder — reason (a) alone requires it.  Causality makes the fix
        exact: decoding the first 2*h_dec code frames unsharded
        reproduces the batch path's first h_dec*hop samples
        bit-for-bit."""
        zq = rvq_lookup(idx_head, params["quantizer"]).astype(dec_dtype)
        if vocoder is None:
            y = decoder_apply(params["decoder"], zq, cfg)
        else:
            y = vocoder_apply(params["voc"], zq, voc_cfg)
        return y[:, :h_dec * hop, :].astype(jnp.float32)

    @jax.jit
    def decode(idx):
        y = shard_map(dec_local, mesh=mesh,
                      in_specs=(P(), idx_spec), out_specs=wav_spec,
                      check_vma=False)(dec_params, idx)
        n_head = min(2 * h_dec, idx.shape[1])
        head = dec_head(dec_params, idx[:, :n_head, :])
        return jax.lax.dynamic_update_slice(
            y, head[:, :min(h_dec * hop, y.shape[1]), :], (0, 0, 0))

    return encode, decode
