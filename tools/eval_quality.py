"""Compare two directories of wavs (e.g. our decoded output vs the reference
implementation's decoded output): per-utterance SNR and log-mel distance.

Usage: python tools/eval_quality.py --ref DIR --est DIR [--suffix _output.wav]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# host-side metric computation: tiny per-utterance mels are far faster on
# CPU than dispatched through the TPU tunnel (~30 ms RTT per call)
import jax

jax.config.update("jax_platforms", "cpu")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--ref", required=True)
    parser.add_argument("--est", required=True)
    parser.add_argument("--suffix", default=".wav")
    parser.add_argument("--est-suffix", default=None,
                        help="suffix replacing --suffix on the est side "
                             "(e.g. _output.wav to compare a corpus "
                             "against codec_test output)")
    args = parser.parse_args()

    from audiodec_tpu.data import read_wav
    from audiodec_tpu.utils.metrics import mcd_db, mel_distance, snr_db

    import numpy as np

    est_suffix = args.est_suffix or args.suffix
    names = sorted(f for f in os.listdir(args.ref)
                   if f.endswith(args.suffix))
    snrs, mels, mcds = [], [], []
    for name in names:
        ep = os.path.join(args.est,
                          name[: len(name) - len(args.suffix)] + est_suffix)
        if not os.path.exists(ep):
            continue
        a, sr = read_wav(os.path.join(args.ref, name))
        b, _ = read_wav(ep)
        n = min(len(a), len(b))
        snrs.append(snr_db(a[:n, 0], b[:n, 0]))
        mels.append(mel_distance(a[:n, 0], b[:n, 0], sr))
        mcds.append(mcd_db(a[:n, 0], b[:n, 0], sr))
    print(json.dumps({
        "n": len(snrs),
        "snr_db_mean": float(np.mean(snrs)) if snrs else None,
        "snr_db_min": float(np.min(snrs)) if snrs else None,
        "mel_l1_mean": float(np.mean(mels)) if mels else None,
        # mel-cepstral distortion: the standard objective proxy for the
        # reference's MOS evidence (utils/metrics.mcd_db; lower = better)
        "mcd_db_mean": float(np.mean(mcds)) if mcds else None,
    }))


if __name__ == "__main__":
    main()
