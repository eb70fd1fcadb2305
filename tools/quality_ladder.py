"""Held-out quality ladder across a training run's checkpoints.

For every checkpoint-<N>steps.ckpt in an experiment dir: transcode the
test subset (symAE encode->decode, same path as codec_test) and score the
output against the originals with log-mel L1 and mel-cepstral distortion
(utils/metrics).  Prints one JSON line per checkpoint — the saturation
curve VERDICT r4 next-8 asked for.

Runs on CPU by default (the chip is usually busy training the very run
being measured); pass --tpu to use the default backend.

Usage: python tools/quality_ladder.py --expdir exp_ref/symAD_200k \
           [--data data/synth/test] [--tpu]
"""
import argparse
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--expdir", required=True)
    ap.add_argument("--data", default="data/synth/test")
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--steps", nargs="+", type=int, default=None,
                    help="only these checkpoint step counts")
    args = ap.parse_args()
    if not args.tpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from audiodec_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()

    import numpy as np
    import jax.numpy as jnp

    from audiodec_tpu.bin.codec_test import load_codec
    from audiodec_tpu.data import SingleDataset
    from audiodec_tpu.utils.metrics import mcd_db, mel_distance, snr_db

    ckpts = []
    for p in glob.glob(os.path.join(args.expdir, "checkpoint-*steps.ckpt")):
        m = re.search(r"checkpoint-(\d+)steps", p)
        if m and (args.steps is None or int(m.group(1)) in args.steps):
            ckpts.append((int(m.group(1)), p))
    final = os.path.join(args.expdir, "checkpoint-final.ckpt")
    if os.path.exists(final) and args.steps is None:
        ckpts.append((-1, final))
    ckpts.sort()

    ds = SingleDataset(args.data)
    sr = 48000
    for steps, path in ckpts:
        transcoder, config = load_codec(path, path, dtype=jnp.float32)
        sr = config.get("sampling_rate", 48000)
        hop = transcoder.cfg.hop_length
        mels, mcds, snrs = [], [], []
        for i in range(len(ds)):
            x = ds[i]
            n = (len(x) // hop) * hop
            _, y = transcoder(np.asarray(x[None, :n], np.float32))
            y = np.asarray(y, np.float32)[0, :n]
            mels.append(mel_distance(x[:n, 0], y[:, 0], sr))
            mcds.append(mcd_db(x[:n, 0], y[:, 0], sr))
            snrs.append(snr_db(x[:n, 0], y[:, 0]))
        print(json.dumps({
            "steps": steps if steps >= 0 else "final",
            "n_utts": len(ds),
            "mel_l1": round(float(np.mean(mels)), 4),
            "mcd_db": round(float(np.mean(mcds)), 3),
            "snr_db": round(float(np.mean(snrs)), 2),
        }), flush=True)


if __name__ == "__main__":
    main()
