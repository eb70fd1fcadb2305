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


class DeviceStreamer:
    """Live duplex audio streamer: microphone -> codec -> speaker
    (ref: bin/stream.py:80-366 AudioCodecStreamer + demoStream.py).

    Runs the audio-driver callback -> encoder thread -> decoder thread ->
    callback pipeline of the reference: the callback pushes each captured
    frame (scaled by `gain`) into the encoder queue and pops the newest
    decoded frame (or emits silence while the pipeline fills); RVQ indices
    are the only payload between the tx and rx threads (the "wire",
    ref utils/audiodec.py:100-106).  When end-to-end latency exceeds
    `max_latency_ms` all queues are flushed and the pending frames are
    counted as drops (ref bin/stream.py:259-266).

    Requires the `sounddevice` package (only imported when `run()` is
    called, so the rest of the framework works on audio-less TPU hosts);
    pass `sd_module` to inject a fake driver for tests.
    """

    def __init__(self, codec: StreamingCodec, frame_size: int,
                 input_device=None, output_device=None,
                 input_channels: int = 1, output_channels: int = 1,
                 sample_rate: int = 48000, gain: float = 1.0,
                 max_latency_ms: float = 100.0, sd_module=None):
        hop = codec.cfg.hop_length
        assert frame_size % hop == 0, \
            f"frame_size {frame_size} % hop {hop} != 0 (demoStream.py:53-54)"
        self.codec = codec
        self.frame_size = frame_size
        self.input_device = input_device
        self.output_device = output_device
        self.input_channels = input_channels
        self.output_channels = output_channels
        self.sample_rate = sample_rate
        self.gain = gain
        self.max_latency = max_latency_ms / 1000.0
        self._sd = sd_module
        # queues for encoder, decoder, and output (ref bin/stream.py:184-187)
        self.encoder_queue: "queue.Queue" = queue.Queue()
        self.decoder_queue: "queue.Queue" = queue.Queue()
        self.output_queue: "queue.Queue" = queue.Queue()
        self.latency_queue: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        # file dump (ref enable_filedump, bin/stream.py:313-333)
        self.input_dump = []
        self.output_dump = []
        self.input_dump_filename = None
        self.output_dump_filename = None
        # streaming statistics (ref bin/stream.py:196-201)
        self.frame_drops = 0
        self.n_frames = 0
        self.encoder_times = []
        self.decoder_times = []
        self.latencies = []

    def enable_filedump(self, input_stream_file: Optional[str] = None,
                        output_stream_file: Optional[str] = None):
        """Dump input/output audio to wav on exit; call before run()
        (ref bin/stream.py:313-333)."""
        if input_stream_file is None and output_stream_file is None:
            raise ValueError("at least one of input_stream_file and "
                             "output_stream_file must be specified")
        if input_stream_file is not None:
            if not input_stream_file.endswith(".wav"):
                input_stream_file += ".wav"
            self.input_dump_filename = input_stream_file
        if output_stream_file is not None:
            if not output_stream_file.endswith(".wav"):
                output_stream_file += ".wav"
            self.output_dump_filename = output_stream_file

    # --- worker threads (ref bin/stream.py:212-239) ---

    def _run_encoder(self):
        while not self._stop.is_set():
            try:
                frame = self.encoder_queue.get(timeout=1)
            except queue.Empty:
                continue
            t0 = time.perf_counter()
            idx = self.codec.encode(jnp.asarray(frame))
            idx.block_until_ready()
            self.encoder_times.append(time.perf_counter() - t0)
            self.decoder_queue.put(idx)

    def _run_decoder(self):
        while not self._stop.is_set():
            try:
                idx = self.decoder_queue.get(timeout=1)
            except queue.Empty:
                continue
            t0 = time.perf_counter()
            y = np.asarray(self.codec.decode(idx))  # (B, T, C)
            self.decoder_times.append(time.perf_counter() - t0)
            self.output_queue.put(y[0])

    # --- audio-driver callback path (ref bin/stream.py:242-289) ---

    def _process(self, data: np.ndarray) -> np.ndarray:
        """One callback frame: (frame_size, in_ch) -> (frame_size, out_ch)."""
        data = data * self.gain
        if self.input_dump_filename is not None:
            self.input_dump.append(np.array(data, np.float32))
        self.encoder_queue.put(data[None].astype(np.float32))
        self.latency_queue.put(time.perf_counter())
        try:
            output = self.output_queue.get_nowait()
            latency = time.perf_counter() - self.latency_queue.get_nowait()
            self.latencies.append(latency)
            if latency > self.max_latency:
                # flush the pipeline; everything pending is dropped
                # (ref bin/stream.py:259-266)
                self.encoder_queue.queue.clear()
                self.decoder_queue.queue.clear()
                self.output_queue.queue.clear()
                while not self.latency_queue.empty():
                    self.frame_drops += 1
                    self.latency_queue.get_nowait()
        except queue.Empty:
            output = np.zeros((self.frame_size, self.output_channels),
                              np.float32)
        self.n_frames += 1
        if self.output_dump_filename is not None:
            self.output_dump.append(np.array(output, np.float32))
        return output

    def _callback(self, indata, outdata, frames, _time, status):
        if status:
            print(status)
        out = self._process(np.asarray(indata, np.float32))
        outdata[:] = out[:len(outdata)]

    def _exit(self):
        from audiodec_tpu.data import write_wav

        if self.input_dump_filename is not None and self.input_dump:
            audio = np.clip(np.concatenate(self.input_dump, axis=0), -1, 1)
            write_wav(self.input_dump_filename, audio, self.sample_rate)
        if self.output_dump_filename is not None and self.output_dump:
            audio = np.clip(np.concatenate(self.output_dump, axis=0), -1, 1)
            write_wav(self.output_dump_filename, audio, self.sample_rate)
        s = self.stats()
        print("#" * 80)
        print(f"encoder processing time (ms):      "
              f"{s['encode_ms_mean']:.2f} +- {s['encode_ms_std']:.2f}")
        print(f"decoder processing time (ms):      "
              f"{s['decode_ms_mean']:.2f} +- {s['decode_ms_std']:.2f}")
        print(f"system latency (ms):               "
              f"{s['latency_ms_mean']:.2f} +- {s['latency_ms_std']:.2f}")
        print(f"frame drops:                       {self.frame_drops} "
              f"({s['drop_ratio'] * 100:.2f}%)")
        print("#" * 80)

    def run(self, latency="low", duration: Optional[float] = None):
        """Stream from the input device to the output device until Return is
        pressed (or for `duration` seconds when given — the non-interactive
        mode for scripted runs).  Prints exit statistics
        (ref bin/stream.py:336-366)."""
        sd = self._sd
        if sd is None:
            try:
                import sounddevice as sd  # type: ignore
            except ImportError as e:
                raise RuntimeError(
                    "DeviceStreamer needs the `sounddevice` package (and an "
                    "audio device); on audio-less hosts use "
                    "SimulatedStreamer / demo_stream without --device"
                ) from e
        self.codec.warmup(self.frame_size)
        self.codec.reset()
        self._stop.clear()
        enc_t = threading.Thread(target=self._run_encoder, daemon=True)
        dec_t = threading.Thread(target=self._run_decoder, daemon=True)
        enc_t.start()
        dec_t.start()
        try:
            with sd.Stream(
                    device=(self.input_device, self.output_device),
                    samplerate=self.sample_rate,
                    blocksize=self.frame_size,
                    dtype=np.float32,
                    latency=latency,
                    channels=(self.input_channels, self.output_channels),
                    callback=self._callback):
                if duration is None:
                    print("### starting stream [press Return to quit] ###")
                    input()
                else:
                    time.sleep(duration)
        except KeyboardInterrupt:
            pass
        finally:
            self._stop.set()
            enc_t.join(timeout=2)
            dec_t.join(timeout=2)
            self._exit()

    def stats(self) -> dict:
        """Exit statistics (ref bin/stream.py:295-311)."""
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
            "frames": self.n_frames,
            "drop_ratio": self.frame_drops / max(1, self.n_frames),
        }


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
