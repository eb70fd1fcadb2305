"""Realtime streaming demo (capability twin of ref demoStream.py).

Default mode feeds a WAV through the threaded tx/rx pipeline (no audio
device needed — the TPU-host-friendly mode) and reports latency statistics
like ref bin/stream.py:295-311.  With --device it streams live
microphone -> codec -> speaker through `sounddevice`, exactly like the
reference demo (requires the sounddevice package and audio hardware).

Usage:
  python -m audiodec_tpu.bin.demo_stream --model vctk_v1 -i in.wav -o out.wav \
      [--frame-size 300] [--realtime]
  python -m audiodec_tpu.bin.demo_stream --model vctk_v1 --device \
      --input-device 1 --output-device 4 [-i dump_in.wav -o dump_out.wav]
"""

from __future__ import annotations

import argparse
import json
import logging

from audiodec_tpu.bin.demo_file import build_streaming_codec
from audiodec_tpu.data import read_wav, write_wav
from audiodec_tpu.models.registry import assign_model
from audiodec_tpu.streaming import DeviceStreamer, SimulatedStreamer


def main(argv=None):
    from audiodec_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default=None)
    parser.add_argument("--encoder", default=None)
    parser.add_argument("--decoder", default=None)
    parser.add_argument("-i", "--input", default=None,
                        help="wav to stream (simulated mode) / input dump "
                             "file (--device mode)")
    parser.add_argument("-o", "--output", default=None)
    parser.add_argument("--frame-size", type=int, default=300)
    parser.add_argument("--max-latency-ms", type=float, default=100.0)
    parser.add_argument("--realtime", action="store_true",
                        help="pace input frames at the audio rate")
    parser.add_argument("--device", action="store_true",
                        help="stream live mic -> speaker via sounddevice "
                             "(ref demoStream.py)")
    parser.add_argument("--input-device", default=None,
                        help="sounddevice input name/index")
    parser.add_argument("--output-device", default=None,
                        help="sounddevice output name/index")
    parser.add_argument("--gain", type=float, default=1.0)
    parser.add_argument("--duration", type=float, default=None,
                        help="--device mode: stream for N seconds instead "
                             "of waiting for Return")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    if args.model:
        sr_expected, enc, dec = assign_model(args.model)
    else:
        enc, dec, sr_expected = args.encoder, args.decoder, None

    codec, config = build_streaming_codec(enc, dec)

    if args.device:
        sr = sr_expected or config.get("sampling_rate", 48000)
        dev = lambda d: int(d) if d is not None and str(d).isdigit() else d
        streamer = DeviceStreamer(
            codec, frame_size=args.frame_size,
            input_device=dev(args.input_device),
            output_device=dev(args.output_device),
            sample_rate=sr, gain=args.gain,
            max_latency_ms=args.max_latency_ms)
        if args.input or args.output:
            streamer.enable_filedump(input_stream_file=args.input,
                                     output_stream_file=args.output)
        streamer.run(latency="low", duration=args.duration)
        return

    if not args.input:
        parser.error("-i/--input is required in simulated mode")
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
