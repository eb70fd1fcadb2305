"""Code-statistics extraction (capability twin of ref codecStatistic.py).

Runs the frozen analyzer encoder->projector->quantize-dequantize over a
training subset and accumulates a running mean/std of the quantized codes zq
(Welford; equivalent to sklearn StandardScaler.partial_fit at
ref codecStatistic.py:92-112), saving np.stack([mean, scale]) -> stats .npy
(shape (2, code_dim) float32) consumed by the vocoder's input normalization.

Usage:
  python -m audiodec_tpu.bin.codec_stats --config <statistic yaml> \
      [--analyzer <ckpt>] [--data-path DIR] [--out stats.npy]
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np

import jax
import jax.numpy as jnp

from audiodec_tpu.data import SingleDataset
from audiodec_tpu.models.autoencoder import (
    encoder_apply,
    generator_init,
    projector_apply,
)
from audiodec_tpu.ops.vq import rvq_forward_index
from audiodec_tpu.train.checkpoint import load_only_params
from audiodec_tpu.utils.config import (
    generator_config,
    load_config,
    load_config_near_checkpoint,
)


class RunningMoments:
    """Chan-parallel Welford accumulation over frames."""

    def __init__(self, dim: int):
        self.n = 0
        self.mean = np.zeros(dim, np.float64)
        self.m2 = np.zeros(dim, np.float64)

    def update(self, frames: np.ndarray):  # (N, D)
        n_b = len(frames)
        if n_b == 0:
            return
        mean_b = frames.mean(axis=0)
        m2_b = ((frames - mean_b) ** 2).sum(axis=0)
        if self.n == 0:
            self.n, self.mean, self.m2 = n_b, mean_b, m2_b
            return
        delta = mean_b - self.mean
        tot = self.n + n_b
        self.mean += delta * n_b / tot
        self.m2 += m2_b + delta ** 2 * self.n * n_b / tot
        self.n = tot

    def finalize(self):
        scale = np.sqrt(self.m2 / self.n)
        return self.mean.astype(np.float32), scale.astype(np.float32)


def _windows(dataset, window: int, hop: int, halo: int = 0):
    """Yield (padded (halo + window, C) slice, n_valid_frames) over every
    utterance.

    Fixed window shapes keep the device path to one XLA compilation
    regardless of utterance lengths; short tails are zero-padded with the
    padded frames trimmed from the moment update.

    Every window carries `halo` samples of REAL left context from its own
    utterance (the receptive-field halo of parallel/codec.py; zeros at
    utterance start, which IS the batch path's zero left-padding), so the
    encoded zq population matches the reference's whole-utterance forward
    (ref codecStatistic.py:101-113) instead of restarting causal context
    at every window boundary.  The consumer drops the first halo//hop
    frames of each window's codes."""
    for i in range(len(dataset)):
        x = dataset[i]
        buf = np.zeros((halo + window, x.shape[-1]), np.float32)

        def _make(s, n_samples):
            lo = max(0, s - halo)
            buf[:] = 0.0
            start = halo - (s - lo)
            buf[start:start + (s + n_samples - lo)] = x[lo:s + n_samples]
            return buf.copy()

        for s in range(0, len(x) - window + 1, window):
            yield _make(s, window), window // hop
        rem = len(x) % window if len(x) >= window else len(x)
        if rem >= hop:
            yield _make(len(x) - rem, rem), rem // hop


def extract_stats(params, cfg, dataset, window_hops: int = 160,
                  batch_size: int = 8, dp: int = 1) -> np.ndarray:
    """Accumulate zq moments over fixed-size windows, batched (and
    optionally data-parallel over `dp` devices) so the analyzer runs at
    full device utilization instead of the reference's one-utterance-at-a-
    time loop (ref codecStatistic.py:101-113).  Any window grouping gives
    the same moments (Welford merge is exact), so batch/dp size don't
    change the result.

    Windows carry a receptive-field halo of real left context (_windows),
    so the zq population equals the reference's whole-utterance encode to
    f32 rounding — windowing is an implementation detail, not a semantic
    change (pinned by test_variants.test_extract_stats_windowed_equals_
    whole_utterance)."""
    sharding = None
    if dp > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P
        from audiodec_tpu.parallel import make_mesh
        mesh = make_mesh(data=dp, seq=1)
        sharding = NamedSharding(mesh, P("data", None, None))
        assert batch_size % dp == 0, \
            f"--batch-size {batch_size} must divide over --dp {dp}"

    from audiodec_tpu.parallel.codec import encoder_halo_samples
    halo = encoder_halo_samples(cfg)
    halo_frames = halo // cfg.hop_length

    @jax.jit
    def codes(x):
        h = encoder_apply(params["encoder"], x, cfg)
        z = projector_apply(params["projector"], h, cfg)
        zq, _ = rvq_forward_index(z, params["quantizer"])
        return zq[:, halo_frames:, :]  # drop the halo-context frames

    window = cfg.hop_length * window_hops
    mom = RunningMoments(cfg.code_dim)

    def flush(buf, counts):
        xb = np.stack(buf)
        if len(buf) < batch_size:  # pad last batch to the compiled shape
            xb = np.concatenate([xb, np.zeros(
                (batch_size - len(buf),) + xb.shape[1:], np.float32)])
        xb = jnp.asarray(xb)
        if sharding is not None:
            xb = jax.device_put(xb, sharding)
        zq = np.asarray(codes(xb), np.float64)
        mom.update(np.concatenate(
            [zq[j, :n] for j, n in enumerate(counts)], axis=0))

    buf, counts = [], []
    for w, n_frames in _windows(dataset, window, cfg.hop_length, halo):
        buf.append(w)
        counts.append(n_frames)
        if len(buf) == batch_size:
            flush(buf, counts)
            buf, counts = [], []
    if buf:
        flush(buf, counts)
    mean, scale = mom.finalize()
    return np.stack([mean, scale])


def main(argv=None):
    from audiodec_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--analyzer", default=None)
    parser.add_argument("--data-path", default=None)
    parser.add_argument("--subset", default="train")
    parser.add_argument("--subset-num", type=int, default=-1,
                        help="only scan the first N utterances "
                             "(ref codecStatistic.py --subset_num)")
    parser.add_argument("--out", default=None)
    parser.add_argument("--batch-size", type=int, default=8,
                        help="windows per device batch")
    parser.add_argument("--dp", type=int, default=1,
                        help="data-parallel devices (windows sharded)")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    config = load_config(args.config)
    analyzer_ckpt = args.analyzer or config["analyzer"]
    an_config = load_config_near_checkpoint(analyzer_ckpt)
    cfg = generator_config(an_config)

    template = generator_init(jax.random.PRNGKey(0), cfg)
    params, _ = load_only_params(analyzer_ckpt, "gen", template=template)

    data_path = args.data_path or os.path.join(
        config["data"]["path"], config["data"]["subset"][args.subset])
    dataset = SingleDataset(data_path, subset_num=args.subset_num)
    stats = extract_stats(params, cfg, dataset,
                          batch_size=args.batch_size, dp=args.dp)
    out = args.out or config.get("stats", "stats.npy")
    os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
    np.save(out, stats)
    logging.info("saved stats %s (shape %s)", out, stats.shape)


if __name__ == "__main__":
    main()
