"""Batch transcode / eval runner (capability twin of ref codecTest.py +
bin/test.py, redesigned for TPU batch execution).

Instead of a serial per-utterance loop, utterances are bucketed by length
(header-only scans), padded to bucket boundaries, and transcoded in jitted
batches on the device mesh (data-parallel over utterances, optional
chunk-halo sequence parallelism for long files).  The loop is software-
pipelined: wav decode runs ahead in a prefetch thread, up to --inflight
batches stay dispatched before the oldest result is fetched, and writes
drain through a writer thread — host I/O overlaps device compute.  Overall
RTF is end-to-end wall clock; decoded wavs are written as <utt>_output.wav
PCM16 like the reference (ref: bin/test.py:96-106).

Usage:
  python -m audiodec_tpu.bin.codec_test --encoder <ckpt> --decoder <ckpt> \
      --subset test [--data-path DIR] [--outdir DIR] [--seq N]
"""

from __future__ import annotations

import argparse
import json
import logging
import math
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from audiodec_tpu.data import SingleDataset, write_wav
from audiodec_tpu.models.autoencoder import (
    GeneratorConfig,
    decoder_apply,
    encoder_apply,
    projector_apply,
)
from audiodec_tpu.models.fast import (
    decoder_apply_folded,
    encoder_apply_folded,
)
from audiodec_tpu.models.vocoder import VocoderConfig, vocoder_apply
from audiodec_tpu.ops.vq import rvq_forward_index, rvq_lookup
from audiodec_tpu.parallel import make_mesh, make_sharded_codec
from audiodec_tpu.train.checkpoint import load_only_params
from audiodec_tpu.utils.config import (
    generator_config,
    load_config_near_checkpoint,
)


def plan_buckets(dataset, batch_size: int, chunk: int):
    """Batch plan [(indices, lens, padded_len)] from header-only length
    scans: utterances sorted longest-first (minimal padding waste) and
    grouped into equal-padded-length batches (multiples of `chunk`).  No
    audio is decoded here, so planning a large corpus is cheap and the
    whole corpus never has to fit in host memory at once."""
    order = sorted(range(len(dataset)),
                   key=lambda i: -dataset.num_frames(i))
    plans = []
    for i in range(0, len(order), batch_size):
        idxs = order[i:i + batch_size]
        lens = [dataset.num_frames(j) for j in idxs]
        padded = math.ceil(max(lens) / chunk) * chunk
        plans.append((idxs, lens, padded))
    return plans


def load_planned_batch(dataset, plan, pcm16_in=False):
    """Decode + zero-pad one planned batch -> (uids, batch, lens).

    pcm16_in: when every file in the batch is PCM16, ship raw int16
    samples (the device normalizes by 1/32768, bit-identical to host float
    conversion at half the transfer bytes); falls back to float32 if any
    file is not PCM16."""
    idxs, lens, padded = plan

    if pcm16_in and getattr(dataset, "load_fn", None) == "audio":
        from audiodec_tpu.data.wav import read_wav_pcm16, wav_is_pcm16
        # header-only probe first so a non-PCM16 file in the batch doesn't
        # cost a wasted payload read of its PCM16 neighbors
        if all(wav_is_pcm16(dataset.filenames[j]) for j in idxs):
            raws = [read_wav_pcm16(dataset.filenames[j]) for j in idxs]
            if all(r is not None for r in raws):
                batch = np.zeros((len(idxs), padded, raws[0][0].shape[-1]),
                                 np.int16)
                for row, (x, _) in enumerate(raws):
                    batch[row, :lens[row]] = x
                return [dataset.utt_ids[j] for j in idxs], batch, lens

    def data(j):
        item = dataset[j]
        return item[1] if isinstance(item, tuple) else item

    first = data(idxs[0])
    batch = np.zeros((len(idxs), padded, first.shape[-1]), np.float32)
    batch[0, :lens[0]] = first
    uids = [dataset.utt_ids[j] for j in idxs]
    for row, j in enumerate(idxs[1:], start=1):
        batch[row, :lens[row]] = data(j)
    return uids, batch, lens


def bucket_batches(dataset, batch_size: int, chunk: int, prefetch: int = 2,
                   pcm16_in: bool = False):
    """Yield (uids, batch, lens) with a decode thread running `prefetch`
    batches ahead of the consumer, so host wav I/O overlaps device
    compute."""
    import queue as _queue
    import threading as _threading

    plans = plan_buckets(dataset, batch_size, chunk)
    out: "_queue.Queue" = _queue.Queue(maxsize=max(1, prefetch))

    def producer():
        try:
            for plan in plans:
                out.put(load_planned_batch(dataset, plan, pcm16_in))
            out.put(None)
        except BaseException as e:  # re-raised in the consumer
            out.put(e)

    t = _threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = out.get()
        if item is None:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


def _fold_arg(v):
    """Normalize a fold flag to models/fast's fold= argument.  Identity
    checks, not `in (None, True)`: an explicit factor of 1 (== True in
    Python) must mean "direct", not auto."""
    return None if (v is None or v is True) else v


def _pcm16(y):
    """Device-side PCM16 quantization, bit-identical to write_wav's host
    conversion (round-half-away-from-zero at scale 2^15 — exact in f32 —
    like csrc/wavio.cpp).  Halves device->host transfer vs float32."""
    v = y.astype(jnp.float32) * 32768.0
    q = jnp.trunc(v + jnp.where(v >= 0, 0.5, -0.5))
    return jnp.clip(q, -32768, 32767).astype(jnp.int16)


class BatchTranscoder:
    """Jitted batch encode/decode, optionally vocoder-decoded and/or
    seq-sharded.

    dtype: compute dtype for the conv stacks.  float32 is the default;
    bfloat16 halves activation traffic (~1.5x faster) with VQ distances kept
    in f32.  dec_dtype (default = dtype) sets the decoder/vocoder dtype
    independently: dtype=f32 + dec_dtype=bf16 is the "mixed" mode — RVQ
    indices are computed exactly as in full-f32 mode (the decoder cannot
    influence them), only the decoded waveform rides bf16.
    stack='xla' (the CLI default as of round 2) runs plain XLA convs —
    the current axon runtime's convs beat the folded-time Pallas kernel at
    every stack width in-process (BENCHMARKS.md "runtime r2
    re-measurement"); 'folded' keeps the kernel available (same
    bf16-multiply/f32-accumulate numeric class; it won on the round-1
    runtime).  For bit-exact RVQ indices vs the torch reference ON TPU
    HARDWARE, run with --precision highest (true-f32 multiplies, stack
    forced to 'xla'); the default TPU path can flip near-tie argmins (see
    BENCHMARKS.md "numerics on hardware")."""

    def __init__(self, params, cfg: GeneratorConfig, voc=None, mesh=None,
                 dtype=jnp.float32, stack="xla", dec_dtype=None,
                 pcm16=False, int8_decode=False, exact_k=None,
                 enc_precision=None, decode_fold=None, encode_fold=None):
        self.params = params
        self.cfg = cfg
        self.voc = voc
        self.mesh = mesh
        self.dtype = dtype
        dec_dtype = dtype if dec_dtype is None else dec_dtype
        # batch-folded whole-decoder decode (models/fast.decode_batchfold,
        # 1.55x on the bf16 decoder at production shape, round-4 probe):
        # auto-on for bf16-class decoders on the plain-XLA single-device
        # path; never for the f32 parity decoder (the fold changes the
        # numeric class to bf16-reassociation level)
        self.decode_fold = decode_fold
        if int8_decode and (voc is not None or cfg.mode != "causal"
                            or cfg.codec != "audiodec"
                            or mesh is not None):
            # int8 residual stacks exist only for the causal audiodec
            # decoder on the single-device path; a vocoder-pair decode,
            # non-audiodec config, or sharded (--dp/--seq) run would
            # otherwise silently get a different mode than asked for.
            # Downgrade BEFORE the fold-eligibility checks below so the
            # fallback is the normal (folded, when eligible) decoder, not
            # a fully-direct one.
            import warnings
            warnings.warn(
                "int8-decode cannot be honored for "
                + ("vocoder-pair decodes" if voc is not None
                   else "sharded (--dp/--seq) runs" if mesh is not None
                   else f"mode={cfg.mode}/codec={cfg.codec}")
                + "; running the non-int8 decoder instead")
            int8_decode = False
        # the same fold policy drives both the single-device applies and
        # the sharded (mesh) codec: the fold is a shard-local reshape, so
        # under a mesh it runs inside each shard's chunk
        # (make_sharded_codec encode_fold/decode_fold)
        dec_batchfold_ok = (decode_fold is not False
                            and voc is None and not int8_decode
                            and stack != "folded"
                            and dec_dtype == jnp.bfloat16
                            and cfg.mode == "causal"
                            and cfg.codec == "audiodec")
        use_batchfold = dec_batchfold_ok and mesh is None
        # the AD v1/v2 vocoder receiver gets the same treatment
        # (models/fast.vocoder_apply_batchfold; halo = vocoder_halo_frames)
        voc_batchfold_ok = (decode_fold is not False
                            and voc is not None and not int8_decode
                            and stack != "folded"
                            and dec_dtype == jnp.bfloat16
                            and getattr(voc[1], "mode", "causal")
                            == "causal")
        use_voc_batchfold = voc_batchfold_ok and mesh is None
        use_folded = (stack == "folded" and cfg.mode == "causal"
                      and cfg.codec == "audiodec")
        # batch-folded whole-encoder encode (2.27x at fold 8, 0/204800
        # index flips vs direct — tools/encfold_probe.py round 4): auto-on
        # for the default XLA path in BOTH f32 and mixed modes (both fold
        # identically, so the mixed==f32 index identity is preserved by
        # construction); the --precision exact/highest parity paths pass
        # encode_fold=False and stay direct.
        enc_batchfold_ok = (encode_fold is not False
                            and enc_precision is None
                            and stack != "folded"
                            and cfg.mode == "causal"
                            and cfg.codec == "audiodec")
        use_enc_batchfold = enc_batchfold_ok and mesh is None
        # introspection (tests pin the fold-eligibility decisions, e.g.
        # that an int8 downgrade under a mesh keeps the folded decoder)
        self.fold_policy = {
            "enc_fold": enc_batchfold_ok,
            "dec_fold": dec_batchfold_ok or voc_batchfold_ok,
            "int8_decode": int8_decode,
        }
        if use_enc_batchfold:
            from functools import partial as _partial
            from audiodec_tpu.models.fast import encoder_apply_batchfold
            enc_apply = _partial(encoder_apply_batchfold,
                                 fold=_fold_arg(encode_fold))
        elif use_folded:
            enc_apply = encoder_apply_folded
        else:
            enc_apply = encoder_apply
        if int8_decode:
            # quantized-decoder mode: int8 MXU dots in every decoder
            # residual stack; encoder/RVQ unaffected (indices identical to
            # the f32 encoder mode).  Decoder params/activations stay f32
            # outside the kernel so the int8 quantization rounds from f32 —
            # the exact path tools/int8_quality_probe.py measured
            # (BENCHMARKS.md int8 section).
            from functools import partial as _partial
            dec_apply = _partial(decoder_apply_folded, int8=True)
            dec_dtype = jnp.float32
        elif use_folded:
            dec_apply = decoder_apply_folded
        else:
            dec_apply = decoder_apply
        if stack == "folded":
            from audiodec_tpu.models.fast import vocoder_apply_folded
            voc_apply = vocoder_apply_folded
        else:
            voc_apply = vocoder_apply
        if mesh is not None:
            self.encode, self.decode = make_sharded_codec(
                mesh, params, cfg, vocoder=voc,
                dtype=dtype, dec_dtype=dec_dtype,
                encode_fold=(_fold_arg(encode_fold)
                             if enc_batchfold_ok else False),
                decode_fold=(_fold_arg(decode_fold)
                             if (dec_batchfold_ok or voc_batchfold_ok)
                             else False))
            if pcm16:
                dec, pcm = self.decode, jax.jit(_pcm16)
                self.decode = lambda idx: pcm(dec(idx))
        else:
            def cast(tree, dt):
                return jax.tree_util.tree_map(
                    lambda a: a.astype(dt)
                    if a.dtype == jnp.float32 else a, tree)

            enc_params = cast({"encoder": params["encoder"],
                               "projector": params["projector"]}, dtype)
            dec_params = cast(voc[0] if voc is not None
                              else params["decoder"], dec_dtype)

            import contextlib

            # "exact" parity mode: the encoder+projector trace under a
            # raised matmul precision (true-f32 multiplies; the TPU default
            # is one bf16 pass) while the decoder keeps its fast dtype —
            # the decoder cannot influence the indices.  exact_k adds the
            # two-pass argmin so the RVQ distance matmul is exact even
            # when the encoder precision is not raised.
            enc_scope = (
                (lambda: jax.default_matmul_precision(enc_precision))
                if enc_precision else contextlib.nullcontext)

            @jax.jit
            def encode(x):
                if x.dtype == jnp.int16:
                    # device-side normalization of raw PCM16 input:
                    # int16->f32 and /2^15 are exact, so this equals the
                    # host float read bit-for-bit
                    x = x.astype(jnp.float32) / 32768.0
                with enc_scope():
                    h = enc_apply(enc_params["encoder"], x.astype(dtype),
                                  cfg)
                    z = projector_apply(enc_params["projector"], h, cfg)
                _, idx = rvq_forward_index(z.astype(jnp.float32),
                                           params["quantizer"],
                                           exact_k=exact_k)
                return idx

            @jax.jit
            def decode(idx):
                fold_arg = _fold_arg(decode_fold)
                if use_batchfold:
                    from audiodec_tpu.models.fast import decode_batchfold
                    y = decode_batchfold(
                        dec_params, params["quantizer"], idx, cfg,
                        dec_dtype=dec_dtype, fold=fold_arg)
                    return _pcm16(y) if pcm16 else y.astype(jnp.float32)
                zq = rvq_lookup(idx, params["quantizer"]).astype(dec_dtype)
                if use_voc_batchfold:
                    from audiodec_tpu.models.fast import (
                        vocoder_apply_batchfold,
                    )
                    y = vocoder_apply_batchfold(dec_params, zq, voc[1],
                                                fold=fold_arg)
                elif voc is None:
                    y = dec_apply(dec_params, zq, cfg)
                else:
                    y = voc_apply(dec_params, zq, voc[1])
                return _pcm16(y) if pcm16 else y.astype(jnp.float32)

            self.encode, self.decode = encode, decode

    def __call__(self, x: np.ndarray):
        pad = 0
        if self.mesh is not None and x.dtype == np.int16:
            # the sharded codec takes float input; normalize host-side
            x = x.astype(np.float32) / 32768.0
        if self.mesh is not None:
            data = self.mesh.shape["data"]
            pad = (-x.shape[0]) % data
            if pad:
                x = np.concatenate(
                    [x, np.zeros((pad,) + x.shape[1:], x.dtype)])
        if jax.process_count() > 1:
            # every process holds the identical full batch (bucketing is
            # deterministic); carve out this process's contiguous rows and
            # assemble the global sharded input
            from jax.sharding import PartitionSpec as P
            from audiodec_tpu.parallel import host_local_to_global
            nproc, pid = jax.process_count(), jax.process_index()
            rows_pp = x.shape[0] // nproc
            xg = host_local_to_global(
                self.mesh, P("data", "seq", None),
                x[pid * rows_pp:(pid + 1) * rows_pp])
        else:
            xg = jnp.asarray(x)
        idx = self.encode(xg)
        y = self.decode(idx)
        if pad and jax.process_count() == 1:
            idx, y = idx[:-pad], y[:-pad]
        return idx, y


def load_codec(encoder_ckpt: str, decoder_ckpt: str, seq: int = 1,
               dp: int = 1, dtype=jnp.float32, stack="xla",
               dec_dtype=None, pcm16=False, int8_decode=False,
               exact_k=None, enc_precision=None, decode_fold=None,
               encode_fold=None):
    """Build params + configs from checkpoint pair (symAE or AE+vocoder,
    ref: codecTest.py:52-75)."""
    enc_config = load_config_near_checkpoint(encoder_ckpt)
    cfg = generator_config(enc_config)
    from audiodec_tpu.models.autoencoder import generator_init
    template = generator_init(jax.random.PRNGKey(0), cfg)
    params, _ = load_only_params(encoder_ckpt, "gen", template=template)

    voc = None
    if os.path.abspath(decoder_ckpt) != os.path.abspath(encoder_ckpt):
        dec_config = load_config_near_checkpoint(decoder_ckpt)
        if dec_config.get("model_type") in ("HiFiGAN", "UnivNet"):
            voc_cfg = generator_config(dec_config)
            from audiodec_tpu.models.vocoder import vocoder_init
            voc_t = vocoder_init(jax.random.PRNGKey(0), voc_cfg)
            voc_params, _ = load_only_params(decoder_ckpt, "gen",
                                             template=voc_t)
            voc = (voc_params, voc_cfg)
    mesh = None
    if jax.process_count() > 1:
        # multi-host: the mesh must span every process's devices, with
        # contiguous (process-major) 'data' rows per host
        from audiodec_tpu.parallel import global_mesh
        mesh = global_mesh(data=-1 if dp <= 1 else dp, seq=seq)
        assert mesh.shape["data"] % jax.process_count() == 0, (
            f"data axis {mesh.shape['data']} must divide evenly over "
            f"{jax.process_count()} processes (pick --seq to divide the "
            f"per-host device count)")
    elif seq > 1 or dp > 1:
        mesh = make_mesh(data=dp, seq=seq)
    return BatchTranscoder(params, cfg, voc=voc, mesh=mesh,
                           dtype=dtype, stack=stack,
                           dec_dtype=dec_dtype, pcm16=pcm16,
                           int8_decode=int8_decode, exact_k=exact_k,
                           enc_precision=enc_precision,
                           decode_fold=decode_fold,
                           encode_fold=encode_fold), enc_config


def main(argv=None):
    from audiodec_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--encoder", required=True)
    parser.add_argument("--decoder", required=True)
    parser.add_argument("--data-path", default=None)
    parser.add_argument("--subset", default="test")
    parser.add_argument("--subset-num", type=int, default=-1,
                        help="only transcode the first N utterances "
                             "(ref codecTest.py --subset_num)")
    parser.add_argument("--outdir", default=None)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--seq", type=int, default=1,
                        help="sequence-parallel shards per utterance")
    parser.add_argument("--dp", type=int, default=1,
                        help="data-parallel devices")
    parser.add_argument("--dtype", default="float32",
                        choices=["float32", "bfloat16", "mixed",
                                 "int8-decode"],
                        help="conv compute dtype.  bfloat16 = fast mode; "
                             "mixed = f32 encoder+RVQ (identical indices "
                             "to float32 mode) with a bf16 decoder; "
                             "int8-decode = f32 encoder+RVQ with int8-"
                             "MXU-dot residual stacks in the decoder, "
                             "quantized from f32 (2x dot rate; quality "
                             "deltas in BENCHMARKS.md)")
    parser.add_argument("--stack", default="xla",
                        choices=["folded", "xla"],
                        help="residual-stack impl: plain XLA (default — "
                             "the current axon runtime's convs beat the "
                             "folded kernel in-process, BENCHMARKS.md) or "
                             "the folded Pallas kernel (same numeric "
                             "class; faster on the round-1 runtime)")
    parser.add_argument("--precision", default="default",
                        choices=["default", "exact", "highest"],
                        help="exact = hardware-bit-exact RVQ indices at "
                             "the cheapest measured cost (1.87x default "
                             "encode, tools/flip_probe.py round 3): the "
                             "encoder traces at 'high' matmul precision "
                             "(3-pass bf16) and the RVQ argmin runs the "
                             "two-pass shortlist re-score, while the "
                             "decoder keeps its fast dtype (the "
                             "recommended parity configuration; single-"
                             "host only).  NOTE exactness is EMPIRICALLY "
                             "validated (0-flip on the measured "
                             "checkpoints/sessions; 'high' is not "
                             "mathematically f32) — 'highest' is the "
                             "conservative fallback: true-f32 multiplies "
                             "for the WHOLE graph (2.6x; forces "
                             "--stack xla)")
    parser.add_argument("--decode-fold", default="auto",
                        help="batch-folded whole-decoder decode for "
                             "bf16-class decoders (mixed/bfloat16 modes): "
                             "'auto' (default; fold 8 at production "
                             "length, scaled down for short inputs — "
                             "1.55x decoder speedup, tools/"
                             "decfold_probe.py), 'off', or an explicit "
                             "fold factor")
    parser.add_argument("--encode-fold", default="auto",
                        help="batch-folded whole-encoder encode (f32, "
                             "mixed and bfloat16 modes; 2.27x encode at "
                             "fold 8 with 0 measured index flips vs the "
                             "direct path, tools/encfold_probe.py): "
                             "'auto' (default), 'off', or an explicit "
                             "fold factor.  --precision exact/highest "
                             "always run the direct encoder")
    parser.add_argument("--exact-k", type=int, default=16,
                        help="two-pass argmin shortlist size for "
                             "--precision exact (k=16 covers the measured "
                             "~4-5%% near-tie flip band with wide margin)")
    parser.add_argument("--float-in", action="store_true",
                        help="convert PCM16 inputs to float32 on the host "
                             "instead of shipping raw int16 and "
                             "normalizing on device (identical numerics, "
                             "2x the upload bytes)")
    parser.add_argument("--float-out", action="store_true",
                        help="fetch float32 waveforms from the device "
                             "instead of device-quantized PCM16 (the "
                             "default halves device->host transfer and "
                             "writes bit-identical wav files)")
    parser.add_argument("--inflight", type=int, default=2,
                        help="transcode batches kept dispatched on the "
                             "device before fetching the oldest (software "
                             "pipelining of host I/O vs device compute); "
                             "1 = fully synchronous")
    parser.add_argument("--profile", default=None,
                        help="capture a jax.profiler trace into this dir")
    parser.add_argument("--coordinator", default=None,
                        help="multi-host: coordinator address host:port "
                             "(all hosts run this CLI with the same "
                             "arguments; omit on single host)")
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    if args.coordinator is not None:
        from audiodec_tpu.parallel import init_distributed
        init_distributed(args.coordinator, args.num_processes,
                         args.process_id)

    stack = args.stack
    exact_k = enc_precision = None
    if args.precision == "highest":
        jax.config.update("jax_default_matmul_precision", "highest")
        stack = "xla"
    elif args.precision == "exact":
        if args.seq > 1 or args.dp > 1 or jax.process_count() > 1:
            parser.error("--precision exact is single-host/unsharded only")
        if args.dtype == "bfloat16":
            parser.error("--precision exact needs an f32 encoder "
                         "(--dtype float32, mixed, or int8-decode)")
        # 'high' (3-pass bf16) measures 0/1280 flips WITH the two-pass
        # argmin at 1.87x default cost, vs 2.59x for 'highest'
        # (tools/flip_probe.py round 3: default-precision z perturbation
        # causes most flips; the argmin re-score alone fixes only 17/56)
        exact_k, enc_precision = args.exact_k, "high"

    dtype = (jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32)
    dec_dtype = (jnp.bfloat16 if args.dtype in ("mixed", "int8-decode")
                 else None)
    decode_fold = (None if args.decode_fold == "auto"
                   else False if args.decode_fold == "off"
                   else int(args.decode_fold))
    encode_fold = (None if args.encode_fold == "auto"
                   else False if args.encode_fold == "off"
                   else int(args.encode_fold))
    if args.precision != "default":
        # exact/highest are parity modes: the encoder numeric path must
        # stay the measured direct one (the fold changes f32 rounding)
        encode_fold = False
    transcoder, config = load_codec(
        args.encoder, args.decoder, args.seq, args.dp,
        dtype=dtype, stack=stack, dec_dtype=dec_dtype,
        pcm16=not args.float_out, int8_decode=args.dtype == "int8-decode",
        exact_k=exact_k, enc_precision=enc_precision,
        decode_fold=decode_fold, encode_fold=encode_fold)
    cfg = transcoder.cfg
    sr = config.get("sampling_rate", 48000)

    data_path = args.data_path or os.path.join(
        config["data"]["path"], config["data"]["subset"][args.subset])
    dataset = SingleDataset(data_path, return_utt_id=True,
                            subset_num=args.subset_num)
    outdir = args.outdir or (
        os.path.splitext(os.path.basename(args.encoder))[0] + "-"
        + os.path.splitext(os.path.basename(args.decoder))[0])
    os.makedirs(outdir, exist_ok=True)

    from audiodec_tpu.utils.profiling import device_trace

    chunk = cfg.hop_length * max(1, args.seq)
    total_audio = 0.0
    n_utts = 0
    trace = device_trace(args.profile)
    trace.__enter__()
    multihost = jax.process_count() > 1

    # Software-pipelined loop: a prefetch thread decodes wavs ahead, up to
    # `--inflight` transcode batches stay dispatched on the device before
    # the oldest is fetched (JAX async dispatch keeps the chip busy while
    # the host pads/writes), and wav writes drain through a writer thread.
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    inflight: "deque" = deque()
    writer = ThreadPoolExecutor(max_workers=2)
    writes = []

    def drain_one():
        uids, lens, batch_t, t_disp, idx, y = inflight.popleft()
        if multihost:
            from audiodec_tpu.parallel import host_local_rows
            lo, y_np = host_local_rows(y)  # this host's rows only
        else:
            lo, y_np = 0, np.asarray(y)
        dt = time.perf_counter() - t_disp
        audio_secs = sum(lens) / sr
        logging.info("batch of %d (T=%d): ready %.3fs after dispatch, "
                     "RTF>=%.1fx", len(uids), batch_t, dt, audio_secs / dt)
        for j in range(y_np.shape[0]):
            if lo + j < len(uids):  # skip data-axis padding rows
                writes.append(writer.submit(
                    write_wav,
                    os.path.join(outdir, f"{uids[lo + j]}_output.wav"),
                    y_np[j, :lens[lo + j]], sr))

    t_start = time.perf_counter()
    for uids, batch, lens in bucket_batches(dataset, args.batch_size, chunk,
                                            prefetch=args.inflight,
                                            pcm16_in=not args.float_in):
        idx, y = transcoder(batch)  # async dispatch
        inflight.append((uids, lens, batch.shape[1], time.perf_counter(),
                         idx, y))
        total_audio += sum(lens) / sr
        n_utts += len(uids)
        while len(inflight) > max(0, args.inflight - 1):
            drain_one()
    while inflight:
        drain_one()
    total_time = time.perf_counter() - t_start  # end-to-end wall clock
    for w in writes:
        w.result()
    writer.shutdown()
    trace.__exit__(None, None, None)
    if multihost:
        # slowest host bounds the pipeline; every host transcoded every
        # batch (its own rows of it), so audio/utt totals are global already
        from jax.experimental import multihost_utils
        total_time = float(np.max(np.asarray(
            multihost_utils.process_allgather(np.float64(total_time)))))
    rtf = total_audio / total_time if total_time else 0.0
    if jax.process_index() == 0:
        print(json.dumps({"utterances": n_utts, "audio_seconds": total_audio,
                          "wall_seconds": total_time, "rtf": rtf,
                          "hosts": jax.process_count()}))


if __name__ == "__main__":
    main()
