"""Streaming engine: hop-by-hop == scan == batch-graph streaming parity,
plus the simulated streamer pipeline."""

import threading
import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiodec_tpu.models.autoencoder import (
    GeneratorConfig,
    codec_state_init,
    generator_init,
)
from audiodec_tpu.models.vocoder import VocoderConfig, vocoder_init
from audiodec_tpu.streaming import (
    DeviceStreamer,
    SimulatedStreamer,
    StreamingCodec,
)
from audiodec_tpu.streaming.engine import (
    scan_streaming_decode,
    scan_streaming_encode,
)

CFG = GeneratorConfig(encode_channels=2, decode_channels=2, code_dim=8,
                      codebook_num=2, codebook_size=16)


@pytest.fixture(scope="module")
def params():
    return generator_init(jax.random.PRNGKey(3), CFG)


def test_hop_by_hop_equals_scan(params):
    hop = CFG.hop_length
    n = 8
    x = 0.2 * np.random.default_rng(0).standard_normal(
        (1, n * hop, 1)).astype(np.float32)

    codec = StreamingCodec(params, CFG)
    idxs, ys = [], []
    for i in range(n):
        idx = codec.encode(jnp.asarray(x[:, i * hop:(i + 1) * hop]))
        idxs.append(np.asarray(idx))
        ys.append(np.asarray(codec.decode(idx)))
    idx_hop = np.concatenate(idxs, axis=1)
    y_hop = np.concatenate(ys, axis=1)

    idx_scan = scan_streaming_encode(params, CFG, jnp.asarray(x))
    np.testing.assert_array_equal(idx_hop, np.asarray(idx_scan))
    y_scan = scan_streaming_decode(params, CFG, idx_scan)
    np.testing.assert_allclose(y_hop, np.asarray(y_scan), rtol=1e-5,
                               atol=1e-6)


def test_streaming_precision_exact(params):
    """StreamingCodec(precision='exact') — the codec_test --precision exact
    recipe on the streaming surface (encoder 'high' + two-pass argmin).
    On CPU the recipe is semantically a no-op (f32 multiplies are already
    exact), so indices must equal the default path bit-for-bit; this pins
    the plumbing so the hardware mode exists on every user surface."""
    hop = CFG.hop_length
    x = 0.2 * np.random.default_rng(5).standard_normal(
        (1, 6 * hop, 1)).astype(np.float32)
    c_def = StreamingCodec(params, CFG)
    c_ex = StreamingCodec(params, CFG, precision="exact")
    for i in range(6):
        chunk = jnp.asarray(x[:, i * hop:(i + 1) * hop])
        np.testing.assert_array_equal(np.asarray(c_def.encode(chunk)),
                                      np.asarray(c_ex.encode(chunk)))
    with pytest.raises(ValueError):
        StreamingCodec(params, CFG, precision="exact", dtype=jnp.bfloat16)
    with pytest.raises(ValueError):
        StreamingCodec(params, CFG, precision="fast")


def test_multi_hop_chunks_equal_single_hops(params):
    """Encoding 4 hops at once == 4 single-hop calls (state consistency)."""
    hop = CFG.hop_length
    x = 0.2 * np.random.default_rng(1).standard_normal(
        (1, 4 * hop, 1)).astype(np.float32)
    c1 = StreamingCodec(params, CFG)
    idx_once = np.asarray(c1.encode(jnp.asarray(x)))
    c2 = StreamingCodec(params, CFG)
    idx_hops = np.concatenate(
        [np.asarray(c2.encode(jnp.asarray(x[:, i * hop:(i + 1) * hop])))
         for i in range(4)], axis=1)
    np.testing.assert_array_equal(idx_once, idx_hops)


def test_streaming_vocoder_decode(params):
    voc_cfg = VocoderConfig(in_channels=CFG.code_dim, channels=8,
                            upsample_scales=(5, 5, 4, 3),
                            upsample_kernel_sizes=(10, 10, 8, 6),
                            resblock_kernel_sizes=(3,),
                            resblock_dilations=((1, 3),), groups=2)
    voc = vocoder_init(jax.random.PRNGKey(8), voc_cfg)
    p = dict(params, vocoder=voc)
    codec = StreamingCodec(p, CFG, voc_cfg=voc_cfg)
    hop = CFG.hop_length
    x = 0.2 * np.random.default_rng(2).standard_normal(
        (1, 3 * hop, 1)).astype(np.float32)
    idx = codec.encode(jnp.asarray(x))
    y = codec.decode(idx)
    assert y.shape == (1, 3 * hop, 1)
    # scan decode equals stateful decode
    codec.reset()
    idx2 = codec.encode(jnp.asarray(x))
    y_scan = scan_streaming_decode(p, CFG, idx2, voc_cfg=voc_cfg)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_scan), rtol=1e-5,
                               atol=1e-6)


def test_simulated_streamer(params):
    codec = StreamingCodec(params, CFG)
    hop = CFG.hop_length
    x = 0.2 * np.random.default_rng(3).standard_normal(
        (6 * hop, 1)).astype(np.float32)
    streamer = SimulatedStreamer(codec, frame_size=2 * hop,
                                 max_latency_ms=10000)
    y = streamer.run(x)
    assert y.shape == (6 * hop, 1)
    stats = streamer.stats()
    assert stats["frames"] == 3
    assert stats["drop_ratio"] == 0.0
    assert stats["encode_ms_mean"] > 0
    # frame_size must be a hop multiple (ref demoStream.py:53-54)
    with pytest.raises(AssertionError):
        SimulatedStreamer(codec, frame_size=hop + 1)


class _FakeSoundDevice:
    """Minimal sounddevice stand-in: a duplex Stream whose context drives
    the callback with synthetic mic frames from a worker thread."""

    def __init__(self, n_frames: int, in_channels: int = 1,
                 out_channels: int = 1):
        self.n_frames = n_frames
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.captured = []
        fake = self

        class Stream:
            def __init__(self, device, samplerate, blocksize, dtype,
                         latency, channels, callback):
                assert channels == (fake.in_channels, fake.out_channels)
                self.blocksize = blocksize
                self.callback = callback

            def __enter__(self):
                import threading as _t

                def drive():
                    rng = np.random.default_rng(0)
                    for _ in range(fake.n_frames):
                        indata = 0.1 * rng.standard_normal(
                            (self.blocksize, fake.in_channels)).astype(
                                np.float32)
                        outdata = np.zeros(
                            (self.blocksize, fake.out_channels), np.float32)
                        self.callback(indata, outdata, self.blocksize,
                                      None, None)
                        fake.captured.append(outdata.copy())
                        time.sleep(0.002)

                self._t = _t.Thread(target=drive, daemon=True)
                self._t.start()
                return self

            def __exit__(self, *exc):
                self._t.join()

        self.Stream = Stream


def test_device_streamer(params, tmp_path):
    """Live-device pipeline (ref bin/stream.py AudioCodecStreamer) against a
    fake audio driver: all frames flow, dumps are written, stats populate."""
    codec = StreamingCodec(params, CFG)
    hop = CFG.hop_length
    n_frames = 6
    fake = _FakeSoundDevice(n_frames)
    streamer = DeviceStreamer(codec, frame_size=2 * hop,
                              max_latency_ms=10000, sd_module=fake)
    out = tmp_path / "out.wav"
    inp = tmp_path / "in.wav"
    streamer.enable_filedump(input_stream_file=str(inp),
                             output_stream_file=str(out))
    streamer.run(duration=1.0)
    stats = streamer.stats()
    assert stats["frames"] == n_frames
    assert stats["drop_ratio"] == 0.0
    # the pipeline decoded at least some frames within the run window
    assert stats["decode_ms_mean"] > 0
    from audiodec_tpu.data import read_wav
    xi, sri = read_wav(str(inp))
    xo, sro = read_wav(str(out))
    assert xi.shape == (n_frames * 2 * hop, 1) and sri == 48000
    assert xo.shape == (n_frames * 2 * hop, 1)
    # frame_size must still be a hop multiple
    with pytest.raises(AssertionError):
        DeviceStreamer(codec, frame_size=hop + 1, sd_module=fake)


def test_device_streamer_requires_sounddevice(params):
    """Without sounddevice installed, run() raises a clear error."""
    codec = StreamingCodec(params, CFG)
    streamer = DeviceStreamer(codec, frame_size=CFG.hop_length)
    try:
        import sounddevice  # noqa: F401
        pytest.skip("sounddevice available in this environment")
    except ImportError:
        pass
    with pytest.raises(RuntimeError, match="sounddevice"):
        streamer.run(duration=0.01)


def test_streamer_latency_watchdog(params):
    """max_latency=0 forces every frame to be dropped and replaced with
    silence (ref: bin/stream.py:259-266)."""
    codec = StreamingCodec(params, CFG)
    hop = CFG.hop_length
    x = 0.2 * np.random.default_rng(4).standard_normal(
        (4 * hop, 1)).astype(np.float32)
    streamer = SimulatedStreamer(codec, frame_size=2 * hop,
                                 max_latency_ms=0.0)
    y = streamer.run(x)
    stats = streamer.stats()
    assert stats["drop_ratio"] == 1.0
    np.testing.assert_array_equal(y, np.zeros_like(y))


def test_network_codec_transport(params):
    """tx/rx over a real socket: the decoded stream equals a local
    streaming transcode of the same frames, and the wire runs at the
    codec's nominal bitrate (+packet overhead)."""
    import socket

    from audiodec_tpu.streaming.net import CodecReceiver, CodecTransmitter

    hop = CFG.hop_length
    frame = 2 * hop
    n = 6
    # deliberately NOT a frame multiple: tx zero-pads the tail frame
    x = 0.2 * np.random.default_rng(9).standard_normal(
        (n * frame - 13, 1)).astype(np.float32)

    tx_codec = StreamingCodec(params, CFG)
    rx_codec = StreamingCodec(params, CFG)
    a, b = socket.socketpair()
    results = {}

    def rx():
        results["y"], results["stats"] = CodecReceiver(rx_codec).run(b)

    t = threading.Thread(target=rx)
    t.start()
    tx_stats = CodecTransmitter(tx_codec, frame_size=frame,
                                sample_rate=48000).run(x, a)
    t.join(timeout=60)
    a.close()
    b.close()
    assert tx_stats["frames"] == n == results["stats"]["frames"]

    # local oracle: same (tail-padded) frames through one stateful codec
    xp = np.concatenate([x, np.zeros((n * frame - len(x), 1), x.dtype)])
    ref_codec = StreamingCodec(params, CFG)
    outs = []
    for i in range(n):
        idx = ref_codec.encode(jnp.asarray(xp[None, i * frame:(i + 1) * frame]))
        outs.append(np.asarray(ref_codec.decode(idx))[0])
    np.testing.assert_allclose(results["y"], np.concatenate(outs, axis=0),
                               rtol=1e-5, atol=1e-6)

    # wire accounting is exact: per packet 4B length + 24B header +
    # ceil(frames*Q*bits/8) payload (headers dominate only at this tiny
    # test config; the canonical 8x1024 codec runs ~13 kbps on this wire)
    import math
    bits = math.ceil(math.log2(CFG.codebook_size))
    per_packet = 4 + 24 + math.ceil((frame // hop) * CFG.codebook_num
                                    * bits / 8)
    audio_secs = n * frame / 48000
    expect_kbps = n * per_packet * 8 / 1000.0 / audio_secs
    assert tx_stats["wire_kbps"] == pytest.approx(expect_kbps, rel=1e-6)


def test_batched_concurrent_streams_equal_independent(params):
    """StreamingCodec(batch=B) serves B concurrent independent streams: each
    batch row's indices are bit-equal to running that stream alone through
    its own batch=1 codec (causal state never mixes rows), and waveforms
    match to reassociation tolerance (XLA may reduce differently per batch
    size).
    This is the multi-session serving mode (N calls per chip) the reference
    has no analogue of (its pad_buffers are registered (1,C,L) buffers)."""
    hop = CFG.hop_length
    n, B = 6, 3
    rng = np.random.default_rng(11)
    x = 0.2 * rng.standard_normal((B, n * hop, 1)).astype(np.float32)

    batched = StreamingCodec(params, CFG, batch=B)
    idx_b, y_b = [], []
    for i in range(n):
        idx = batched.encode(jnp.asarray(x[:, i * hop:(i + 1) * hop]))
        idx_b.append(np.asarray(idx))
        y_b.append(np.asarray(batched.decode(idx)))
    idx_b = np.concatenate(idx_b, axis=1)
    y_b = np.concatenate(y_b, axis=1)

    for r in range(B):
        solo = StreamingCodec(params, CFG, batch=1)
        idx_s, y_s = [], []
        for i in range(n):
            idx = solo.encode(jnp.asarray(x[r:r + 1,
                                            i * hop:(i + 1) * hop]))
            idx_s.append(np.asarray(idx))
            y_s.append(np.asarray(solo.decode(idx)))
        np.testing.assert_array_equal(np.concatenate(idx_s, axis=1)[0],
                                      idx_b[r])
        np.testing.assert_allclose(np.concatenate(y_s, axis=1)[0],
                                   y_b[r], rtol=1e-2, atol=1e-8)
