"""Bitstream pack/unpack roundtrip and bitrate accounting."""

import numpy as np
import pytest

from audiodec_tpu.utils.bitstream import (
    bits_for,
    pack_codes,
    unpack_codes,
)


@pytest.mark.parametrize("t,q,size", [(100, 8, 1024), (7, 3, 17), (1, 1, 2),
                                      (33, 16, 1024)])
def test_roundtrip(t, q, size):
    rng = np.random.default_rng(0)
    idx = rng.integers(0, size, (t, q)).astype(np.int32)
    blob = pack_codes(idx, size, 48000, 300)
    out, info = unpack_codes(blob)
    np.testing.assert_array_equal(out, idx)
    assert info["n_frames"] == t and info["num_q"] == q


def test_canonical_bitrate():
    """symAD: 8 books x 10 bits at 160 frames/s = 12.8 kbps
    (ref README.md:6)."""
    assert bits_for(1024) == 10
    idx = np.zeros((160, 8), np.int32)  # one second of codes
    blob = pack_codes(idx, 1024, 48000, 300)
    _, info = unpack_codes(blob)
    assert info["kbps"] == pytest.approx(12.8)
    # payload: exactly 12800 bits = 1600 bytes (+ 24-byte header)
    assert len(blob) == 24 + 1600


def test_streaming_codec_integration():
    """Codes from the streaming encoder survive the bitstream roundtrip and
    decode identically."""
    import jax
    import jax.numpy as jnp
    from audiodec_tpu.models.autoencoder import (
        GeneratorConfig, generator_init)
    from audiodec_tpu.ops.vq import rvq_forward_index, rvq_lookup
    from audiodec_tpu.models.autoencoder import (
        encoder_apply, projector_apply)

    cfg = GeneratorConfig(encode_channels=2, decode_channels=2, code_dim=8,
                          codebook_num=2, codebook_size=16)
    params = generator_init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(0.3 * np.random.default_rng(1)
                    .standard_normal((1, 4 * cfg.hop_length, 1))
                    .astype(np.float32))
    h = encoder_apply(params["encoder"], x, cfg)
    z = projector_apply(params["projector"], h, cfg)
    _, idx = rvq_forward_index(z, params["quantizer"])

    blob = pack_codes(np.asarray(idx[0]), cfg.codebook_size, 48000,
                      cfg.hop_length)
    restored, _ = unpack_codes(blob)
    zq_a = rvq_lookup(idx, params["quantizer"])
    zq_b = rvq_lookup(jnp.asarray(restored[None]), params["quantizer"])
    np.testing.assert_array_equal(np.asarray(zq_a), np.asarray(zq_b))


def test_malformed_bitstream_rejected():
    """Corrupt/hostile packets raise ValueError (never a huge allocation or
    an IndexError): validated magic, version, field ranges, and exact
    payload length before any size-dependent work."""
    import pytest
    import struct

    good = pack_codes(np.zeros((4, 2), np.int32), 16, 48000, 300)

    with pytest.raises(ValueError):  # truncated header
        unpack_codes(good[:10])
    with pytest.raises(ValueError):  # bad magic
        unpack_codes(b"XXXX" + good[4:])
    with pytest.raises(ValueError):  # bad version
        unpack_codes(good[:4] + b"\x07" + good[5:])
    with pytest.raises(ValueError):  # truncated payload
        unpack_codes(good[:-1])
    with pytest.raises(ValueError):  # trailing garbage
        unpack_codes(good + b"\x00")
    # hostile n_frames: header claims 2^40 frames with a tiny payload —
    # must reject by length mismatch without allocating anything
    hdr = struct.Struct("<4sBBHIIQ").pack(b"ADTC", 1, 2, 4, 48000, 300,
                                          1 << 40)
    with pytest.raises(ValueError):
        unpack_codes(hdr + b"\x00" * 8)
    with pytest.raises(ValueError):  # impossible bits-per-code
        unpack_codes(struct.Struct("<4sBBHIIQ").pack(b"ADTC", 1, 2, 99,
                                                     48000, 300, 0))


def test_oversized_packet_length_rejected():
    """A corrupt length prefix on the wire raises instead of buffering
    gigabytes."""
    import pytest
    import socket
    import struct

    from audiodec_tpu.streaming.net import MAX_PACKET, recv_packet

    a, b = socket.socketpair()
    a.sendall(struct.pack("<I", MAX_PACKET + 1) + b"junk")
    with pytest.raises(ValueError):
        recv_packet(b)
    a.close()
    b.close()
