"""Data layer: WAV I/O (native + fallback), datasets, collaters, loader."""

import os

import numpy as np
import pytest

from audiodec_tpu.data import (
    CollaterAudio,
    CollaterAudioPair,
    SingleDataset,
    MultiDataset,
    find_files,
    read_wav,
    wav_info,
    write_wav,
)
from audiodec_tpu.data import wav as wav_mod
from audiodec_tpu.data.loader import DataLoader


@pytest.fixture
def wav_dir(tmp_path):
    rng = np.random.default_rng(0)
    for i in range(6):
        t = 2000 + 500 * i
        x = (0.5 * rng.standard_normal((t, 1))).clip(-1, 1).astype(np.float32)
        write_wav(str(tmp_path / f"utt{i}.wav"), x, 48000)
    return str(tmp_path)


def test_wav_roundtrip_native_and_fallback(tmp_path):
    rng = np.random.default_rng(1)
    x = (0.8 * rng.standard_normal((3333, 2))).clip(-1, 1).astype(np.float32)
    p = str(tmp_path / "a.wav")
    write_wav(p, x, 24000)

    y, sr = read_wav(p)
    assert sr == 24000 and y.shape == (3333, 2)
    # PCM16 can't represent +1.0 exactly (clamps to 32767/32768)
    expected = np.clip(x, -1.0, 32767.0 / 32768.0)
    np.testing.assert_allclose(y, expected, atol=0.51 / 32768)

    # force the pure-python fallback and compare bit-exactly with native
    old = wav_mod._LIB, wav_mod._LIB_TRIED
    try:
        wav_mod._LIB, wav_mod._LIB_TRIED = None, True
        y2, sr2 = read_wav(p)
        info = wav_info(p)
    finally:
        wav_mod._LIB, wav_mod._LIB_TRIED = old
    assert sr2 == 24000 and info == (24000, 2, 3333)
    np.testing.assert_array_equal(y, y2)


def test_wav_pcm24_and_float32(tmp_path):
    """Hand-build PCM24 and float32 WAVs, read both paths."""
    import struct
    x = np.linspace(-0.9, 0.9, 101).astype(np.float32)

    # float32 WAV
    p = str(tmp_path / "f32.wav")
    payload = x.astype("<f4").tobytes()
    with open(p, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, 16000,
                                      16000 * 4, 4, 32))
        f.write(b"data" + struct.pack("<I", len(payload)) + payload)
    y, sr = read_wav(p)
    np.testing.assert_allclose(y[:, 0], x, atol=1e-7)

    # PCM24 WAV
    p24 = str(tmp_path / "p24.wav")
    q = np.round(x * 8388607).astype(np.int32)
    b = np.zeros((len(q), 3), np.uint8)
    b[:, 0] = q & 0xFF
    b[:, 1] = (q >> 8) & 0xFF
    b[:, 2] = (q >> 16) & 0xFF
    payload = b.tobytes()
    with open(p24, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 16000,
                                      16000 * 3, 3, 24))
        f.write(b"data" + struct.pack("<I", len(payload)) + payload)
    y24, _ = read_wav(p24)
    np.testing.assert_allclose(y24[:, 0], x, atol=2e-7)


def test_single_dataset_and_find_files(wav_dir):
    assert len(find_files(wav_dir)) == 6
    ds = SingleDataset(wav_dir, return_utt_id=True)
    uid, data = ds[0]
    assert uid == "utt0" and data.shape == (2000, 1)
    assert data.dtype == np.float32


def test_multi_dataset(wav_dir):
    ds = MultiDataset([wav_dir, wav_dir])
    a, b = ds[1]
    np.testing.assert_array_equal(a, b)


def test_collaters(wav_dir):
    ds = SingleDataset(wav_dir)
    col = CollaterAudio(batch_length=1800, seed=1)
    batch = col([ds[i] for i in range(4)])
    assert batch.shape == (4, 1800, 1)

    pair_col = CollaterAudioPair(batch_length=1800, seed=1)
    items = [(ds[i], ds[i]) for i in range(4)]
    n, c = pair_col(items)
    assert n.shape == c.shape == (4, 1800, 1)
    np.testing.assert_array_equal(n, c)  # same crop offsets for the pair

    # clips shorter than batch_length are dropped (ref collater semantics)
    short = np.zeros((100, 1), np.float32)
    assert col([short]).shape[0] == 0


def test_loader_order_and_shapes(wav_dir):
    ds = SingleDataset(wav_dir)
    dl = DataLoader(ds, CollaterAudio(1500, seed=2), batch_size=2,
                    num_workers=3, seed=3)
    batches = list(dl)
    assert len(batches) == 3
    assert all(b.shape == (2, 1500, 1) for b in batches)
    it = dl.infinite()
    assert next(it).shape == (2, 1500, 1)


def test_num_frames_and_bucket_planning(wav_dir):
    """Header-only length scan matches decoded lengths; planner buckets
    longest-first with chunk-multiple padding; pipelined loader yields the
    same batches as a synchronous build."""
    from audiodec_tpu.bin.codec_test import (
        bucket_batches,
        load_planned_batch,
        plan_buckets,
    )

    ds = SingleDataset(wav_dir, return_utt_id=True)
    for i in range(len(ds)):
        assert ds.num_frames(i) == len(ds[i][1])

    chunk = 300
    plans = plan_buckets(ds, batch_size=4, chunk=chunk)
    assert sum(len(p[0]) for p in plans) == len(ds)
    flat_lens = [l for p in plans for l in p[1]]
    assert flat_lens == sorted(flat_lens, reverse=True)  # longest first
    for idxs, lens, padded in plans:
        assert padded % chunk == 0 and padded >= max(lens)

    got = list(bucket_batches(ds, batch_size=4, chunk=chunk, prefetch=2))
    assert len(got) == len(plans)
    for (uids, batch, lens), plan in zip(got, plans):
        ref_uids, ref_batch, ref_lens = load_planned_batch(ds, plan)
        assert uids == ref_uids and lens == ref_lens
        np.testing.assert_array_equal(batch, ref_batch)
        # padding rows beyond each utterance are zero
        for r, L in enumerate(lens):
            assert not batch[r, L:].any()


def test_pcm16_quantization_three_paths_agree(tmp_path):
    """Device-side PCM16 (codec_test._pcm16), the native C++ writer, and
    the pure-python fallback all quantize with the same
    round-half-away-from-zero convention — including exact 0.5-LSB ties and
    clipping — so files are bit-identical regardless of path."""
    import jax.numpy as jnp
    from audiodec_tpu.bin.codec_test import _pcm16

    # exact .5-LSB ties (n/65536), near-clip, clipped, zero, generic values
    x = np.array([0.0, 1 / 65536, 3 / 65536, -1 / 65536, -3 / 65536,
                  0.25, -0.25, 0.999999, 32767.49 / 32768, 1.0, -1.0,
                  2.0, -2.0, 0.3141592], np.float32)[:, None]

    dev = np.asarray(_pcm16(jnp.asarray(x)))[:, 0]

    def file_q(write_x, force_fallback):
        p = str(tmp_path / f"q{force_fallback}.wav")
        old = wav_mod._LIB, wav_mod._LIB_TRIED
        try:
            if force_fallback:
                wav_mod._LIB, wav_mod._LIB_TRIED = None, True
            write_wav(p, write_x, 48000)
        finally:
            wav_mod._LIB, wav_mod._LIB_TRIED = old
        with open(p, "rb") as f:
            f.seek(44)
            return np.frombuffer(f.read(), "<i2")

    np.testing.assert_array_equal(file_q(x, False), dev)   # native writer
    np.testing.assert_array_equal(file_q(x, True), dev)    # py fallback
    # int16 passthrough writes the device samples verbatim
    np.testing.assert_array_equal(file_q(dev.astype(np.int16), True), dev)
    np.testing.assert_array_equal(file_q(dev.astype(np.int16), False), dev)


def test_pcm16_input_batches_match_float(wav_dir):
    """load_planned_batch(pcm16_in=True) ships raw int16 whose device
    normalization (x/32768) equals the float32 read bit-for-bit."""
    from audiodec_tpu.bin.codec_test import load_planned_batch, plan_buckets

    ds = SingleDataset(wav_dir, return_utt_id=True)
    for plan in plan_buckets(ds, batch_size=4, chunk=300):
        uids_f, bf, lens_f = load_planned_batch(ds, plan)
        uids_i, bi, lens_i = load_planned_batch(ds, plan, pcm16_in=True)
        assert uids_i == uids_f and lens_i == lens_f
        assert bi.dtype == np.int16 and bf.dtype == np.float32
        np.testing.assert_array_equal(
            bi.astype(np.float32) / 32768.0, bf)


def test_bucket_batches_propagates_producer_errors(wav_dir):
    """A load failure in the prefetch thread re-raises in the consumer
    instead of silently truncating the run (codec_test would otherwise
    report success on a partial corpus)."""
    import pytest
    from audiodec_tpu.bin import codec_test as ct

    ds = SingleDataset(wav_dir, return_utt_id=True)
    orig = ct.load_planned_batch

    def boom(dataset, plan, pcm16_in=False):
        raise RuntimeError("decode failed")

    ct.load_planned_batch = boom
    try:
        with pytest.raises(RuntimeError, match="decode failed"):
            list(ct.bucket_batches(ds, batch_size=2, chunk=300))
    finally:
        ct.load_planned_batch = orig
