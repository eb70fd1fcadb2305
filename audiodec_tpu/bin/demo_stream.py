"""Simulated realtime streaming demo (capability twin of ref demoStream.py,
without an audio device: feeds a WAV through the threaded tx/rx pipeline and
reports latency statistics like ref bin/stream.py:295-311).

Usage:
  python -m audiodec_tpu.bin.demo_stream --model vctk_v1 -i in.wav -o out.wav \
      [--frame-size 300] [--realtime]
"""

from __future__ import annotations

import argparse
import json
import logging

from audiodec_tpu.bin.demo_file import build_streaming_codec
from audiodec_tpu.data import read_wav, write_wav
from audiodec_tpu.models.registry import assign_model
from audiodec_tpu.streaming import SimulatedStreamer


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default=None)
    parser.add_argument("--encoder", default=None)
    parser.add_argument("--decoder", default=None)
    parser.add_argument("-i", "--input", required=True)
    parser.add_argument("-o", "--output", default=None)
    parser.add_argument("--frame-size", type=int, default=300)
    parser.add_argument("--max-latency-ms", type=float, default=100.0)
    parser.add_argument("--realtime", action="store_true",
                        help="pace input frames at the audio rate")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    if args.model:
        sr_expected, enc, dec = assign_model(args.model)
    else:
        enc, dec, sr_expected = args.encoder, args.decoder, None

    codec, config = build_streaming_codec(enc, dec)
    x, sr = read_wav(args.input)
    streamer = SimulatedStreamer(codec, frame_size=args.frame_size,
                                 max_latency_ms=args.max_latency_ms,
                                 realtime=args.realtime, sample_rate=sr)
    y = streamer.run(x)
    if args.output:
        write_wav(args.output, y, sr)
    print(json.dumps(streamer.stats(), indent=2))


if __name__ == "__main__":
    main()
