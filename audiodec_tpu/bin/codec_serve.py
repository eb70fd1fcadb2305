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
                DIR/.stop appears.

Jobs are micro-batched: paths arriving within --linger seconds (or up to
--batch-size files) transcode as one padded batch, so a burst of files
rides the device at batch throughput.  All codec flags match codec_test
(--dtype mixed, --stack, --precision, --seq/--dp need a mesh and are not
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
import sys
import time

import numpy as np

import jax.numpy as jnp


def iter_stdin_jobs():
    for line in sys.stdin:
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
    flush a lingering partial batch between file arrivals."""
    seen = set()
    while True:
        if os.path.exists(os.path.join(watch_dir, ".stop")):
            return
        for name in sorted(os.listdir(watch_dir)):
            if not name.endswith(".wav") or name in seen:
                continue
            seen.add(name)
            yield os.path.join(watch_dir, name), None
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
                        help="max files per device batch")
    parser.add_argument("--linger", type=float, default=0.2,
                        help="seconds to wait for more jobs before "
                             "dispatching a partial batch")
    parser.add_argument("--dtype", default="mixed",
                        choices=["float32", "bfloat16", "mixed"],
                        help="codec dtype mode (serving default: mixed)")
    parser.add_argument("--stack", default="folded",
                        choices=["folded", "xla"])
    parser.add_argument("--precision", default="default",
                        choices=["default", "highest"])
    parser.add_argument("--warmup-seconds", type=float, default=10.0,
                        help="compile-priming transcode length (0 skips)")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    import jax
    from audiodec_tpu.bin.codec_test import load_codec
    from audiodec_tpu.data import read_wav, read_wav_pcm16, write_wav
    from audiodec_tpu.data.wav import wav_is_pcm16

    stack = args.stack
    if args.precision == "highest":
        jax.config.update("jax_default_matmul_precision", "highest")
        stack = "xla"
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    dec_dtype = jnp.bfloat16 if args.dtype == "mixed" else None
    transcoder, config = load_codec(args.encoder, args.decoder,
                                    dtype=dtype, stack=stack,
                                    dec_dtype=dec_dtype, pcm16=True)
    sr_expect = config.get("sampling_rate", 48000)
    hop = transcoder.cfg.hop_length
    os.makedirs(args.outdir, exist_ok=True)

    if args.warmup_seconds > 0:
        # prime compile (and the Mosaic executable load on relayed
        # backends) before serving, at a representative padded length
        t = max(hop, int(round(args.warmup_seconds * sr_expect
                               / hop)) * hop)
        z = np.zeros((args.batch_size, t, 1), np.int16)
        idx, y = transcoder(z)
        np.asarray(y)
        logging.info("warmup done (batch %d x %.1fs)", args.batch_size,
                     t / sr_expect)

    def flush(batch_jobs):
        """Transcode one micro-batch of (src, dst) jobs."""
        datas, srs = [], []
        for src, _ in batch_jobs:
            if wav_is_pcm16(src):
                x, sr = read_wav_pcm16(src)
            else:
                x, sr = read_wav(src)
            datas.append(x)
            srs.append(sr)
        lens = [len(x) for x in datas]
        padded = -(-max(lens) // hop) * hop
        i16 = all(d.dtype == np.int16 for d in datas)
        batch = np.zeros((len(datas), padded, datas[0].shape[-1]),
                         np.int16 if i16 else np.float32)
        for row, x in enumerate(datas):
            batch[row, :lens[row]] = x if i16 else x.astype(np.float32)
        t0 = time.perf_counter()
        idx, y = transcoder(batch)
        y_np = np.asarray(y)
        dt = time.perf_counter() - t0
        for row, ((src, dst), sr) in enumerate(zip(batch_jobs, srs)):
            base = os.path.splitext(os.path.basename(src))[0]
            out = dst or os.path.join(args.outdir, f"{base}_output.wav")
            write_wav(out, y_np[row, :lens[row]], sr)
            print(json.dumps({"input": src, "output": out,
                              "seconds": lens[row] / sr,
                              "batch_rtf": round(
                                  sum(lens) / sr_expect / dt, 1)}),
                  flush=True)

    jobs = (iter_watch_jobs(args.watch, args.poll) if args.watch
            else iter_stdin_jobs())
    pending = []
    deadline = None
    for job in jobs:
        if job is not None:
            pending.append(job)
            if deadline is None:
                deadline = time.monotonic() + args.linger
        if pending and (len(pending) >= args.batch_size
                        or time.monotonic() > deadline):
            flush(pending)
            pending, deadline = [], None
    if pending:
        flush(pending)


if __name__ == "__main__":
    main()
