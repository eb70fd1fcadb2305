"""Input-pipeline throughput at local-disk rates (no device, no tunnel).

The trainer consumes batches of B x batch_length f32 (reference config:
16 x 9600 = 614 KB/step); a directly-attached chip at the measured hardware
step rate (~58 steps/s, BENCHMARKS.md training table) needs the loader to
sustain that from disk.  This probe measures DataLoader steps/s over the
synthetic corpus from local disk for several worker counts, reporting the
margin over the trainer's demand.

Usage: python tools/loader_probe.py [--data data/synth_ref/train]
       [--batch-size 16] [--batch-length 9600] [--steps 300]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from audiodec_tpu.data import CollaterAudio, SingleDataset  # noqa: E402
from audiodec_tpu.data.loader import DataLoader  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="data/synth_ref/train")
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--batch-length", type=int, default=9600)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--target-steps-per-s", type=float, default=58.0)
    args = ap.parse_args()

    ds = SingleDataset(args.data)
    collate = CollaterAudio(args.batch_length)
    bytes_per_step = args.batch_size * args.batch_length * 4

    for workers in (1, 2, 4):
        loader = DataLoader(ds, collate, args.batch_size,
                            num_workers=workers, prefetch=4)
        it = loader.infinite()
        for _ in range(10):  # warm page cache + thread spin-up
            next(it)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            b = next(it)
            assert b.shape[0] > 0
        dt = time.perf_counter() - t0
        sps = args.steps / dt
        print(json.dumps({
            "num_workers": workers,
            "steps_per_s": round(sps, 1),
            "MB_per_s": round(sps * bytes_per_step / 1e6, 1),
            "target_steps_per_s": args.target_steps_per_s,
            "margin_x": round(sps / args.target_steps_per_s, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
