"""Simulated realtime streamer: the demoStream pipeline without an audio
device (ref: bin/stream.py:80-366, demoStream.py).

Frames from a source waveform are pushed through an encoder thread and a
decoder thread connected by queues (the tx->rx "wire" carries RVQ indices,
ref utils/audiodec.py:100-106), with a latency watchdog that drops frames
above `max_latency`, and exit-time statistics (mean/std encode/decode/latency
ms, frame-drop ratio) like the reference's streamer
(ref: bin/stream.py:295-311).
"""

from __future__ import annotations

import queue
import threading
import time
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from audiodec_tpu.streaming.engine import StreamingCodec


class SimulatedStreamer:
    def __init__(self, codec: StreamingCodec, frame_size: int,
                 max_latency_ms: float = 100.0, realtime: bool = False,
                 sample_rate: int = 48000):
        hop = codec.cfg.hop_length
        assert frame_size % hop == 0, \
            f"frame_size {frame_size} % hop {hop} != 0 (demoStream.py:53-54)"
        self.codec = codec
        self.frame_size = frame_size
        self.sample_rate = sample_rate
        self.max_latency = max_latency_ms / 1000.0
        self.realtime = realtime
        self.encoder_queue: "queue.Queue" = queue.Queue()
        self.decoder_queue: "queue.Queue" = queue.Queue()
        self.outputs = []
        self.encoder_times = []
        self.decoder_times = []
        self.latencies = []
        self.drops = 0
        self.frames = 0

    def _run_encoder(self):
        while True:
            item = self.encoder_queue.get()
            if item is None:
                self.decoder_queue.put(None)
                return
            t_birth, frame = item
            t0 = time.perf_counter()
            idx = self.codec.encode(jnp.asarray(frame))
            idx.block_until_ready()
            self.encoder_times.append(time.perf_counter() - t0)
            self.decoder_queue.put((t_birth, idx))

    def _run_decoder(self):
        while True:
            item = self.decoder_queue.get()
            if item is None:
                return
            t_birth, idx = item
            t0 = time.perf_counter()
            y = self.codec.decode(idx)
            y.block_until_ready()
            self.decoder_times.append(time.perf_counter() - t0)
            latency = time.perf_counter() - t_birth
            self.latencies.append(latency)
            if latency > self.max_latency:
                # watchdog: drop late frame, emit silence
                # (ref: bin/stream.py:259-266)
                self.drops += 1
                self.outputs.append(np.zeros_like(np.asarray(y)))
            else:
                self.outputs.append(np.asarray(y))

    def run(self, x: np.ndarray) -> np.ndarray:
        """Stream x (T, C) through the pipeline; returns decoded audio."""
        self.codec.warmup()
        self.codec.reset()
        T = (len(x) // self.frame_size) * self.frame_size
        frames = x[:T].reshape(-1, self.frame_size, x.shape[-1])
        enc_t = threading.Thread(target=self._run_encoder, daemon=True)
        dec_t = threading.Thread(target=self._run_decoder, daemon=True)
        enc_t.start()
        dec_t.start()
        frame_dt = self.frame_size / self.sample_rate
        for f in frames:
            self.frames += 1
            self.encoder_queue.put((time.perf_counter(), f[None]))
            if self.realtime:
                time.sleep(frame_dt)
        self.encoder_queue.put(None)
        enc_t.join()
        dec_t.join()
        return np.concatenate(self.outputs, axis=1)[0]

    def stats(self) -> dict:
        """Exit statistics (ref: bin/stream.py:295-311)."""
        def ms(xs):
            return (float(np.mean(xs) * 1000), float(np.std(xs) * 1000)) \
                if xs else (0.0, 0.0)
        em, es = ms(self.encoder_times)
        dm, ds = ms(self.decoder_times)
        lm, ls = ms(self.latencies)
        return {
            "encode_ms_mean": em, "encode_ms_std": es,
            "decode_ms_mean": dm, "decode_ms_std": ds,
            "latency_ms_mean": lm, "latency_ms_std": ls,
            "frames": self.frames,
            "drop_ratio": self.drops / max(1, self.frames),
        }
