"""Persistent batch-transcode server.

Keeps one loaded+compiled codec resident and serves transcode jobs from
stdin or a watched directory — amortizing model load and (on relayed TPU
backends) the per-process Mosaic executable-load cost across every job,
where a fresh `codec_test` process would re-pay it (BENCHMARKS.md
"per-process Mosaic load cost").

Modes:
  --stdin       read one input wav path per line (optionally
                "in.wav<TAB>out.wav"); write <utt>_output.wav to --outdir
                (or the given out path); print one JSON line per file.
  --watch DIR   poll DIR for new wavs; transcode each once, write results
                to --outdir; keeps running until SIGTERM/EOF marker file
                DIR/.stop appears.  Files are picked up only after their
                size is stable across two polls (a writer may still be
                flushing).

Jobs are micro-batched: paths arriving within --linger seconds (or up to
--batch-size files) transcode as one padded batch, so a burst of files
rides the device at batch throughput.  Device batches always use the full
--batch-size row count and a time axis bucketed to multiples of the
warmup length, so a long-lived server sees a small, warm set of compiled
shapes (each new shape would otherwise pay a fresh compile — minutes on a
relayed TPU for folded-stack graphs).  Bad inputs (unreadable file, wrong
sample rate, mismatched channel count) produce a JSON error line for that
file and never take the server down.  All codec flags match codec_test
(--dtype mixed, --stack, --precision; --seq/--dp need a mesh and are not
supported here — this is the single-host serving surface).

Usage:
  ls *.wav | python -m audiodec_tpu.bin.codec_serve \
      --encoder <ckpt> --decoder <ckpt> --outdir out --stdin
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import queue
import sys
import threading
import time

import numpy as np

import jax.numpy as jnp


def iter_stdin_jobs(linger_s: float):
    """Yields (src, dst) jobs from stdin, or None as an idle tick.

    stdin is drained on a background thread so a slow producer cannot
    block the linger deadline: the main loop receives None ticks while
    waiting, letting a partial batch flush after --linger seconds instead
    of waiting for the next line (or EOF)."""
    q: "queue.Queue" = queue.Queue()
    _eof = object()

    def reader():
        for line in sys.stdin:
            q.put(line)
        q.put(_eof)

    threading.Thread(target=reader, daemon=True).start()
    tick = max(0.01, min(0.05, linger_s / 4 if linger_s > 0 else 0.05))
    while True:
        try:
            line = q.get(timeout=tick)
        except queue.Empty:
            yield None
            continue
        if line is _eof:
            return
        line = line.strip()
        if not line:
            continue
        if "\t" in line:
            src, dst = line.split("\t", 1)
            yield src, dst
        else:
            yield line, None


def iter_watch_jobs(watch_dir: str, poll_s: float):
    """Yields (src, dst) jobs, or None as an idle tick so the consumer can
    flush a lingering partial batch between file arrivals.

    A file is only yielded once its size is unchanged between two polls —
    a producer still writing it would otherwise hand us a truncated wav.

    State is bounded by the directory's current contents: names that
    disappear are forgotten (so a rotated/recreated file transcodes
    again), never accumulated forever in a long-lived server."""
    seen = set()
    sizes = {}
    while True:
        if os.path.exists(os.path.join(watch_dir, ".stop")):
            return
        listing = [n for n in sorted(os.listdir(watch_dir))
                   if n.endswith(".wav")]
        present = set(listing)
        seen &= present
        for name in list(sizes):
            if name not in present:
                del sizes[name]
        for name in listing:
            if name in seen:
                continue
            path = os.path.join(watch_dir, name)
            try:
                size = os.path.getsize(path)
            except OSError:
                continue
            if sizes.get(name) == size:
                seen.add(name)
                sizes.pop(name, None)
                yield path, None
            else:
                sizes[name] = size
        yield None
        time.sleep(poll_s)


def main(argv=None):
    from audiodec_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--encoder", required=True)
    parser.add_argument("--decoder", required=True)
    parser.add_argument("--outdir", default=".")
    parser.add_argument("--stdin", action="store_true",
                        help="read input wav paths from stdin (default)")
    parser.add_argument("--watch", default=None,
                        help="poll this directory for new wavs instead")
    parser.add_argument("--poll", type=float, default=0.5,
                        help="watch-mode poll interval seconds")
    parser.add_argument("--batch-size", type=int, default=8,
                        help="device batch row count (partial batches are "
                             "zero-padded to this, keeping one compiled "
                             "shape per length bucket)")
    parser.add_argument("--linger", type=float, default=0.2,
                        help="seconds to wait for more jobs before "
                             "dispatching a partial batch")
    parser.add_argument("--dtype", default="mixed",
                        choices=["float32", "bfloat16", "mixed"],
                        help="codec dtype mode (serving default: mixed)")
    parser.add_argument("--stack", default="xla",
                        choices=["folded", "xla"])
    parser.add_argument("--precision", default="default",
                        choices=["default", "exact", "highest"],
                        help="exact = hardware-bit-exact RVQ indices at "
                             "1.87x default encode cost (encoder 'high' "
                             "matmul precision + two-pass argmin re-score; "
                             "empirically 0-flip, see codec_test "
                             "--precision).  highest = true-f32 multiplies "
                             "for the whole graph (conservative fallback, "
                             "2.6x; forces --stack xla)")
    parser.add_argument("--exact-k", type=int, default=16,
                        help="two-pass argmin shortlist size for "
                             "--precision exact")
    parser.add_argument("--encode-fold", default="auto",
                        help="batch-folded whole-encoder encode "
                             "(auto/off/N; see codec_test --encode-fold)")
    parser.add_argument("--decode-fold", default="auto",
                        help="batch-folded whole-decoder decode for "
                             "bf16-class decoders (auto/off/N; see "
                             "codec_test --decode-fold)")
    parser.add_argument("--warmup-seconds", type=float, default=10.0,
                        help="compile-priming transcode length; also the "
                             "time-axis bucket unit (0 skips warmup and "
                             "buckets by hop only)")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    import jax
    from audiodec_tpu.bin.codec_test import load_codec
    from audiodec_tpu.data import read_wav, read_wav_pcm16, write_wav
    from audiodec_tpu.data.wav import wav_is_pcm16

    def parse_fold(v):
        return None if v == "auto" else False if v == "off" else int(v)

    stack = args.stack
    exact_k = enc_precision = None
    encode_fold = parse_fold(args.encode_fold)
    decode_fold = parse_fold(args.decode_fold)
    if args.precision == "highest":
        jax.config.update("jax_default_matmul_precision", "highest")
        stack = "xla"
        encode_fold = False
    elif args.precision == "exact":
        if args.dtype == "bfloat16":
            parser.error("--precision exact needs an f32 encoder "
                         "(--dtype float32 or mixed)")
        # same recipe as codec_test --precision exact: encoder at 'high'
        # (3-pass bf16) + two-pass argmin — 0/1280 flips measured at 1.87x
        # default encode cost (tools/flip_probe.py round 3)
        exact_k, enc_precision = args.exact_k, "high"
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    dec_dtype = jnp.bfloat16 if args.dtype == "mixed" else None
    transcoder, config = load_codec(args.encoder, args.decoder,
                                    dtype=dtype, stack=stack,
                                    dec_dtype=dec_dtype, pcm16=True,
                                    exact_k=exact_k,
                                    enc_precision=enc_precision,
                                    encode_fold=encode_fold,
                                    decode_fold=decode_fold)
    sr_expect = config.get("sampling_rate", 48000)
    hop = transcoder.cfg.hop_length
    os.makedirs(args.outdir, exist_ok=True)

    # Time axes are padded up to a multiple of t_unit (and batches to
    # batch_size rows) so the server cycles a small set of compiled shapes.
    t_unit = hop
    if args.warmup_seconds > 0:
        t_unit = max(hop, int(round(args.warmup_seconds * sr_expect
                                    / hop)) * hop)
        z = np.zeros((args.batch_size, t_unit, 1), np.int16)
        idx, y = transcoder(z)
        np.asarray(y)
        logging.info("warmup done (batch %d x %.1fs)", args.batch_size,
                     t_unit / sr_expect)

    def emit(obj):
        print(json.dumps(obj), flush=True)

    def load_job(src):
        """-> (data, sr) or None (an error line was emitted)."""
        try:
            x = sr = None
            if wav_is_pcm16(src):
                got = read_wav_pcm16(src)  # None on truncated payload
                if got is not None:
                    x, sr = got
            if x is None:
                x, sr = read_wav(src)
        except Exception as e:  # unreadable / malformed / vanished file
            emit({"input": src, "error": f"read failed: {e}"})
            return None
        if len(x) == 0:
            emit({"input": src, "error": "empty audio"})
            return None
        if sr != sr_expect:
            emit({"input": src, "error":
                  f"sample rate {sr} != model rate {sr_expect}"})
            return None
        return x, sr

    # Auto-generated output names (<base>_output.wav) can collide across
    # jobs: two inputs with the same basename from different directories
    # would silently overwrite each other.  Remember which source produced
    # each output (LRU-bounded so a long-lived server's memory stays flat);
    # a DIFFERENT source colliding on the same output gets a uniquified
    # name, while the same source re-transcoding (watch-mode rotation)
    # keeps overwriting its own output.
    from collections import OrderedDict
    out_owner: "OrderedDict[str, str]" = OrderedDict()
    OUT_OWNER_CAP = 65536

    def output_path(src, dst):
        if dst:
            return dst
        base = os.path.splitext(os.path.basename(src))[0]
        out = os.path.join(args.outdir, f"{base}_output.wav")
        n = 2
        while out in out_owner and out_owner[out] != src:
            out = os.path.join(args.outdir, f"{base}_output.{n}.wav")
            n += 1
        out_owner[out] = src
        out_owner.move_to_end(out)
        while len(out_owner) > OUT_OWNER_CAP:
            out_owner.popitem(last=False)
        return out

    def flush(batch_jobs):
        """Transcode one micro-batch of (src, dst) jobs."""
        jobs, datas = [], []
        for src, dst in batch_jobs:
            got = load_job(src)
            if got is None:
                continue
            x, _ = got
            if datas and x.shape[-1] != datas[0].shape[-1]:
                emit({"input": src, "error":
                      f"channel count {x.shape[-1]} != batch's "
                      f"{datas[0].shape[-1]}"})
                continue
            jobs.append((src, dst))
            datas.append(x)
        if not datas:
            return
        lens = [len(x) for x in datas]
        padded = -(-max(lens) // t_unit) * t_unit
        i16 = all(d.dtype == np.int16 for d in datas)
        batch = np.zeros((args.batch_size, padded, datas[0].shape[-1]),
                         np.int16 if i16 else np.float32)
        for row, x in enumerate(datas):
            if i16 or x.dtype != np.int16:
                batch[row, :lens[row]] = x
            else:
                # mixed batch: int16 rows need the same /32768
                # normalization the device applies to an all-int16 batch
                batch[row, :lens[row]] = x.astype(np.float32) / 32768.0
        t0 = time.perf_counter()
        idx, y = transcoder(batch)
        y_np = np.asarray(y)
        dt = time.perf_counter() - t0
        for row, (src, dst) in enumerate(jobs):
            out = output_path(src, dst)
            write_wav(out, y_np[row, :lens[row]], sr_expect)
            emit({"input": src, "output": out,
                  "seconds": lens[row] / sr_expect,
                  "batch_rtf": round(sum(lens) / sr_expect / dt, 1)})

    jobs = (iter_watch_jobs(args.watch, args.poll) if args.watch
            else iter_stdin_jobs(args.linger))
    pending = []
    deadline = None
    for job in jobs:
        if job is not None:
            pending.append(job)
            if deadline is None:
                deadline = time.monotonic() + args.linger
        if pending and (len(pending) >= args.batch_size
                        or time.monotonic() > deadline):
            flush(pending[:args.batch_size])
            pending = pending[args.batch_size:]
            deadline = (time.monotonic() + args.linger) if pending else None
    while pending:
        flush(pending[:args.batch_size])
        pending = pending[args.batch_size:]


if __name__ == "__main__":
    main()
