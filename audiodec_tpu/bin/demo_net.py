"""Network streaming codec demo: encoder and decoder on opposite ends of a
TCP connection, RVQ bitstream packets on the wire.

This is the deployable form of the reference streamer's tx/rx split
(ref bin/stream.py, utils/audiodec.py:100-106 — there the "wire" is an
in-process queue); the payload is the self-describing 12.8 kbps format of
`utils.bitstream`.

Receiver (decoder side) — start first:
  python -m audiodec_tpu.bin.demo_net rx --listen 0.0.0.0:9900 \
      --encoder <ckpt> --decoder <ckpt> -o received.wav

Transmitter (encoder side):
  python -m audiodec_tpu.bin.demo_net tx --connect host:9900 \
      --encoder <ckpt> --decoder <ckpt> -i input.wav [--realtime]
"""

from __future__ import annotations

import argparse
import json
import logging
import socket

from audiodec_tpu.bin.demo_file import build_streaming_codec
from audiodec_tpu.data import read_wav, write_wav
from audiodec_tpu.models.registry import assign_model
from audiodec_tpu.streaming.net import CodecReceiver, CodecTransmitter


def _addr(s: str):
    host, port = s.rsplit(":", 1)
    return host, int(port)


def main(argv=None):
    from audiodec_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("mode", choices=["tx", "rx"])
    parser.add_argument("--model", default=None)
    parser.add_argument("--encoder", default=None)
    parser.add_argument("--decoder", default=None)
    parser.add_argument("--connect", default=None, help="tx: host:port")
    parser.add_argument("--listen", default=None, help="rx: host:port")
    parser.add_argument("-i", "--input", default=None, help="tx: wav to send")
    parser.add_argument("-o", "--output", default=None,
                        help="rx: wav to write")
    parser.add_argument("--frame-size", type=int, default=3000,
                        help="samples per packet (hop multiple)")
    parser.add_argument("--realtime", action="store_true",
                        help="tx: pace packets at the audio rate")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    if args.model:
        sr_expected, enc, dec = assign_model(args.model)
    else:
        enc, dec = args.encoder, args.decoder

    codec, config = build_streaming_codec(enc, dec)
    sr = config.get("sampling_rate", 48000)

    if args.mode == "tx":
        if not (args.connect and args.input):
            parser.error("tx needs --connect and --input")
        x, sr_in = read_wav(args.input)
        tx = CodecTransmitter(codec, frame_size=args.frame_size,
                              sample_rate=sr_in or sr)
        with socket.create_connection(_addr(args.connect)) as sock:
            stats = tx.run(x, sock, realtime=args.realtime)
        print(json.dumps(stats))
    else:
        if not args.listen:
            parser.error("rx needs --listen")
        host, port = _addr(args.listen)
        with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as srv:
            srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
            srv.bind((host, port))
            srv.listen(1)
            logging.info("listening on %s:%d", host, port)
            conn, peer = srv.accept()
            logging.info("connection from %s", peer)
            with conn:
                y, stats = CodecReceiver(codec).run(conn)
        if args.output:
            write_wav(args.output, y, sr)
        print(json.dumps(stats))


if __name__ == "__main__":
    main()
