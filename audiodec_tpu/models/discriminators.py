"""GAN discriminators: HiFiGAN MSD+MPD and UnivNet MRSD+MPD, functional.

Capability twins of ref models/vocoder/modules/discriminator.py and the
combined wrappers in HiFiGAN.py:308-395 / UnivNet.py:23-103.  All applies
return the reference's nested output structure: a list (one entry per
sub-discriminator) of lists of per-layer feature maps, final logits last —
the shape the adversarial/feature-match losses consume.

Norm reparametrizations (weight norm everywhere; spectral norm on scale-0
when follow_official_norm) live in the param pytree and are resolved by
`ops.norms.resolve_params` before apply.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from audiodec_tpu.ops.activations import get_activation
from audiodec_tpu.ops.conv import (
    conv1d_init,
    conv2d_init,
    noncausal_conv1d,
    noncausal_conv2d,
)
from audiodec_tpu.ops.norms import spectral_norm_params, weight_norm_params
from audiodec_tpu.ops.spectral import stft_magnitude


# ---------------------------------------------------------------------------
# scale discriminator (ref: discriminator.py:213-373)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class ScaleDiscriminatorConfig:
    in_channels: int = 1
    out_channels: int = 1
    kernel_sizes: Sequence[int] = (15, 41, 5, 3)
    channels: int = 128
    max_downsample_channels: int = 1024
    max_groups: int = 16
    bias: bool = True
    downsample_scales: Sequence[int] = (2, 2, 4, 4, 1)
    nonlinear_activation: str = "LeakyReLU"
    nonlinear_activation_params: tuple = (("negative_slope", 0.1),)

    def layer_shapes(self):
        """[(k, in, out, stride, groups)] for all layers."""
        ks = self.kernel_sizes
        layers = [(ks[0], self.in_channels, self.channels, 1, 1)]
        in_chs, out_chs, groups = self.channels, self.channels, 4
        for ds in self.downsample_scales:
            layers.append((ks[1], in_chs, out_chs, ds, groups))
            in_chs = out_chs
            out_chs = min(in_chs * 2, self.max_downsample_channels)
            groups = min(groups * 4, self.max_groups)
        out_chs = min(in_chs * 2, self.max_downsample_channels)
        layers.append((ks[2], in_chs, out_chs, 1, 1))
        layers.append((ks[3], out_chs, self.out_channels, 1, 1))
        return layers


def scale_discriminator_init(key, cfg: ScaleDiscriminatorConfig,
                             use_spectral_norm: bool = False) -> dict:
    """Plain (un-reparametrized) conv params.

    Reference quirk reproduced deliberately: HiFiGANScaleDiscriminator's
    apply_weight_norm / apply_spectral_norm test `isinstance(m, nn.Conv2d)`
    but the scale discriminator is built from Conv1d layers, so NO norm is
    ever applied to any scale discriminator — including the
    follow_official_norm "spectral norm on scale 0", which is a silent
    no-op upstream (ref: discriminator.py:355-373, 420-428).  Training
    therefore optimizes the raw conv weights, and train-step parity
    (tests/test_train_step_parity.py) requires the same parameterization
    here.  use_spectral_norm is accepted for API compatibility and applies
    a REAL spectral norm if explicitly requested by non-reference configs.
    """
    shapes = cfg.layer_shapes()
    keys = jax.random.split(key, 2 * len(shapes))
    layers = []
    for i, (k, ci, co, _, g) in enumerate(shapes):
        p = conv1d_init(keys[2 * i], k, ci, co, groups=g, bias=cfg.bias,
                        scale=0.1)
        if use_spectral_norm:
            p = spectral_norm_params(keys[2 * i + 1], p)
        layers.append(p)
    return {"layers": layers}


def scale_discriminator_apply(p, x, cfg: ScaleDiscriminatorConfig):
    """x: (B, T, 1) -> list of per-layer outputs (logits last)."""
    act = get_activation(cfg.nonlinear_activation,
                        dict(cfg.nonlinear_activation_params))
    outs = []
    shapes = cfg.layer_shapes()
    n = len(shapes)
    for i, (k, _, _, stride, groups) in enumerate(shapes):
        x = noncausal_conv1d(x, p["layers"][i], stride=stride, groups=groups,
                             padding=(k - 1) // 2)
        if i < n - 1:
            x = act(x)
        outs.append(x)
    return outs


def _avg_pool1d(x, kernel=4, stride=2, padding=2):
    """torch AvgPool1d (count_include_pad=True).  x: (B, T, C)."""
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, window_dimensions=(1, kernel, 1),
        window_strides=(1, stride, 1),
        padding=((0, 0), (padding, padding), (0, 0)))
    return s / kernel


@dataclasses.dataclass(frozen=True)
class MultiScaleConfig:
    scales: int = 3
    follow_official_norm: bool = True
    pool_kernel: int = 4
    pool_stride: int = 2
    pool_padding: int = 2
    discriminator: ScaleDiscriminatorConfig = ScaleDiscriminatorConfig()


def msd_init(key, cfg: MultiScaleConfig) -> dict:
    # follow_official_norm intentionally does NOT reparametrize: the
    # reference's norm application is a Conv2d-isinstance no-op on these
    # Conv1d stacks (see scale_discriminator_init docstring)
    keys = jax.random.split(key, cfg.scales)
    discs = []
    for i in range(cfg.scales):
        discs.append(scale_discriminator_init(keys[i], cfg.discriminator))
    return {"discriminators": discs}


def msd_apply(p, x, cfg: MultiScaleConfig):
    outs = []
    for i in range(cfg.scales):
        outs.append(scale_discriminator_apply(p["discriminators"][i], x,
                                              cfg.discriminator))
        x = _avg_pool1d(x, cfg.pool_kernel, cfg.pool_stride, cfg.pool_padding)
    return outs


# ---------------------------------------------------------------------------
# period discriminator (ref: discriminator.py:27-210)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class PeriodDiscriminatorConfig:
    in_channels: int = 1
    out_channels: int = 1
    kernel_sizes: Sequence[int] = (5, 3)
    channels: int = 32
    downsample_scales: Sequence[int] = (3, 3, 3, 3, 1)
    max_downsample_channels: int = 1024
    bias: bool = True
    nonlinear_activation: str = "LeakyReLU"
    nonlinear_activation_params: tuple = (("negative_slope", 0.1),)
    use_spectral_norm: bool = False

    def layer_shapes(self):
        layers = []
        in_chs, out_chs = self.in_channels, self.channels
        for ds in self.downsample_scales:
            layers.append((self.kernel_sizes[0], in_chs, out_chs, ds))
            in_chs = out_chs
            out_chs = min(out_chs * 4, self.max_downsample_channels)
        return layers


def period_discriminator_init(key, cfg: PeriodDiscriminatorConfig) -> dict:
    shapes = cfg.layer_shapes()
    keys = jax.random.split(key, 2 * (len(shapes) + 1))
    layers = []
    for i, (k, ci, co, _) in enumerate(shapes):
        p = conv2d_init(keys[2 * i], (k, 1), ci, co, bias=cfg.bias, scale=0.1)
        p = (spectral_norm_params(keys[2 * i + 1], p)
             if cfg.use_spectral_norm else weight_norm_params(p))
        layers.append(p)
    # output conv kernel (k2-1, 1) like the reference (discriminator.py:92-98)
    out_k = cfg.kernel_sizes[1] - 1
    po = conv2d_init(keys[-2], (max(out_k, 1), 1), shapes[-1][2],
                     cfg.out_channels, bias=cfg.bias, scale=0.1)
    po = (spectral_norm_params(keys[-1], po) if cfg.use_spectral_norm
          else weight_norm_params(po))
    return {"layers": layers, "output_conv": po}


def period_discriminator_apply(p, x, cfg: PeriodDiscriminatorConfig,
                               period: int):
    """x: (B, T, 1) -> list of per-layer outputs; logits flattened last."""
    act = get_activation(cfg.nonlinear_activation,
                        dict(cfg.nonlinear_activation_params))
    b, t, c = x.shape
    if t % period != 0:
        n_pad = period - (t % period)
        x = jnp.pad(x, ((0, 0), (0, n_pad), (0, 0)), mode="reflect")
        t += n_pad
    # (B, T, C) -> (B, T/P, P, C) NHWC, matching torch (B, C, T/P, P)
    x = x.reshape(b, t // period, period, c)
    outs = []
    for i, (k, _, _, ds) in enumerate(cfg.layer_shapes()):
        x = noncausal_conv2d(x, p["layers"][i], stride=(ds, 1),
                             padding=((k - 1) // 2, 0))
        x = act(x)
        outs.append(x)
    k2 = cfg.kernel_sizes[1]
    x = noncausal_conv2d(x, p["output_conv"], padding=((k2 - 1) // 2, 0))
    outs.append(x.reshape(b, -1))
    return outs


@dataclasses.dataclass(frozen=True)
class MultiPeriodConfig:
    periods: Sequence[int] = (2, 3, 5, 7, 11)
    discriminator: PeriodDiscriminatorConfig = PeriodDiscriminatorConfig()


def mpd_init(key, cfg: MultiPeriodConfig) -> dict:
    keys = jax.random.split(key, len(cfg.periods))
    return {"discriminators": [
        period_discriminator_init(keys[i], cfg.discriminator)
        for i in range(len(cfg.periods))]}


def mpd_apply(p, x, cfg: MultiPeriodConfig):
    return [period_discriminator_apply(p["discriminators"][i], x,
                                       cfg.discriminator, period)
            for i, period in enumerate(cfg.periods)]


# ---------------------------------------------------------------------------
# batched (stacked) MSD / MPD — one conv per layer across all branches
# ---------------------------------------------------------------------------
#
# The sequential applies above launch dozens of small convs per step (3 MSD
# scales x 8 layers + 5 MPD periods x 6 layers on 0.2 s clips), which the
# round-3 adv-step breakdown measured launch-bound at 0.07 TFLOP/s.  These
# variants stack the branches (periods / scales) into a leading vmap axis —
# identical per-branch weights structure, inputs zero-padded to the largest
# branch — so each layer is ONE batched conv.  Validity masks (static, from
# the conv length arithmetic) re-zero the padded region after every layer so
# garbage can never leak into valid rows through the next layer's receptive
# field; the returned feature maps are sliced to the exact sequential shapes,
# so the loss path is numerically unchanged (f32-reassociation class only).
# FLOP amplification from padding: ~5.5x for MPD (periods 2..11 padded to
# 11 wide x T/2 high), ~1.7x for MSD — worth it iff the batched conv's MXU
# rate outruns it; measured on hardware by tools/adv_probe.py (A/B'd, not
# asserted: VERDICT r4 next-2).


def _stack_trees(trees):
    return jax.tree_util.tree_map(lambda *a: jnp.stack(a), *trees)


def mpd_apply_batched(p, x, cfg: MultiPeriodConfig):
    """Numerically equal to mpd_apply (same nested output structure and
    shapes); the 5 period discriminators run as one stacked conv per layer.
    """
    dcfg = cfg.discriminator
    act = get_activation(dcfg.nonlinear_activation,
                        dict(dcfg.nonlinear_activation_params))
    periods = tuple(cfg.periods)
    b, t, c = x.shape
    folds, h0 = [], []
    for per in periods:
        xp, tp = x, t
        if t % per:
            n_pad = per - (t % per)
            xp = jnp.pad(x, ((0, 0), (0, n_pad), (0, 0)), mode="reflect")
            tp += n_pad
        h0.append(tp // per)
        folds.append(xp.reshape(b, tp // per, per, c))
    hmax, pmax = max(h0), max(periods)
    y = jnp.stack([
        jnp.pad(f, ((0, 0), (0, hmax - f.shape[1]),
                    (0, pmax - f.shape[2]), (0, 0)))
        for f in folds])  # (P, B, Hmax, Pmax, C)
    sp = _stack_trees(p["discriminators"])

    def _mask(hs, hdim):
        m = np.zeros((len(periods), 1, hdim, 1, 1), np.float32)
        for j, h in enumerate(hs):
            m[j, :, :h] = 1.0
        return jnp.asarray(m)

    shapes = dcfg.layer_shapes()
    hs = h0
    heights, stacked_outs = [], []
    for i, (k, _, _, ds) in enumerate(shapes):
        pad = (k - 1) // 2
        y = jax.vmap(lambda pp, yy, s=ds, pd=pad:
                     noncausal_conv2d(yy, pp, stride=(s, 1),
                                      padding=(pd, 0)))(sp["layers"][i], y)
        y = act(y)
        hs = [(h + 2 * pad - k) // ds + 1 for h in hs]
        y = y * _mask(hs, y.shape[2])
        heights.append(hs)
        stacked_outs.append(y)
    k2 = dcfg.kernel_sizes[1]
    ko, po_pad = max(k2 - 1, 1), (k2 - 1) // 2
    y = jax.vmap(lambda pp, yy:
                 noncausal_conv2d(yy, pp, padding=(po_pad, 0)))(
        sp["output_conv"], y)
    h_out = [h + 2 * po_pad - ko + 1 for h in hs]

    res = []
    for j, per in enumerate(periods):
        lst = [stacked_outs[i][j][:, :heights[i][j], :per, :]
               for i in range(len(shapes))]
        lst.append(y[j][:, :h_out[j], :per, :].reshape(b, -1))
        res.append(lst)
    return res


def msd_apply_batched(p, x, cfg: MultiScaleConfig):
    """Numerically equal to msd_apply; the 3 scale discriminators run as
    one stacked (grouped) conv per layer, scales zero-padded to the
    undownsampled length."""
    dcfg = cfg.discriminator
    act = get_activation(dcfg.nonlinear_activation,
                        dict(dcfg.nonlinear_activation_params))
    xs, lens = [], []
    cur = x
    for _ in range(cfg.scales):
        xs.append(cur)
        lens.append(cur.shape[1])
        cur = _avg_pool1d(cur, cfg.pool_kernel, cfg.pool_stride,
                          cfg.pool_padding)
    tmax = lens[0]
    y = jnp.stack([jnp.pad(xi, ((0, 0), (0, tmax - xi.shape[1]), (0, 0)))
                   for xi in xs])  # (S, B, Tmax, C)
    sp = _stack_trees(p["discriminators"])

    def _mask(ls, tdim):
        m = np.zeros((cfg.scales, 1, tdim, 1), np.float32)
        for j, l in enumerate(ls):
            m[j, :, :l] = 1.0
        return jnp.asarray(m)

    shapes = dcfg.layer_shapes()
    n = len(shapes)
    ls = lens
    lens_per_layer, stacked_outs = [], []
    for i, (k, _, _, stride, groups) in enumerate(shapes):
        pad = (k - 1) // 2
        y = jax.vmap(lambda pp, yy, s=stride, g=groups, pd=pad:
                     noncausal_conv1d(yy, pp, stride=s, groups=g,
                                      padding=pd))(sp["layers"][i], y)
        if i < n - 1:
            y = act(y)
        ls = [(l + 2 * pad - k) // stride + 1 for l in ls]
        y = y * _mask(ls, y.shape[2])
        lens_per_layer.append(ls)
        stacked_outs.append(y)
    return [[stacked_outs[i][j][:, :lens_per_layer[i][j], :]
             for i in range(n)] for j in range(cfg.scales)]


# ---------------------------------------------------------------------------
# UnivNet spectral discriminator (ref: discriminator.py:451-640)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class SpectralDiscriminatorConfig:
    fft_size: int = 1024
    hop_size: int = 120
    win_length: int = 600
    kernel_sizes: Sequence[Sequence[int]] = ((3, 9), (3, 9), (3, 9), (3, 9),
                                             (3, 3), (3, 3))
    strides: Sequence[Sequence[int]] = ((1, 1), (1, 2), (1, 2), (1, 2),
                                        (1, 1), (1, 1))
    channels: int = 32
    bias: bool = True
    nonlinear_activation: str = "LeakyReLU"
    nonlinear_activation_params: tuple = (("negative_slope", 0.2),)

    def layer_shapes(self):
        n = len(self.kernel_sizes)
        layers = [(tuple(self.kernel_sizes[0]), 1, self.channels,
                   tuple(self.strides[0]))]
        for i in range(1, n - 1):
            layers.append((tuple(self.kernel_sizes[i]), self.channels,
                           self.channels, tuple(self.strides[i])))
        layers.append((tuple(self.kernel_sizes[-1]), self.channels, 1,
                       tuple(self.strides[-1])))
        return layers


def spectral_discriminator_init(key, cfg: SpectralDiscriminatorConfig) -> dict:
    shapes = cfg.layer_shapes()
    keys = jax.random.split(key, len(shapes))
    return {"layers": [
        weight_norm_params(conv2d_init(keys[i], k, ci, co, bias=cfg.bias,
                                       scale=0.1))
        for i, (k, ci, co, _) in enumerate(shapes)]}


def spectral_discriminator_apply(p, x, cfg: SpectralDiscriminatorConfig):
    """x: (B, T, 1) waveform -> layer outputs over the magnitude spectrogram
    (torchaudio.spectrogram(power=1, pad=win//2) semantics)."""
    act = get_activation(cfg.nonlinear_activation,
                        dict(cfg.nonlinear_activation_params))
    # eps > 0 keeps sqrt differentiable on the all-zero padded edge frames
    # (values shift by <=1e-6, gradients stay finite)
    mag = stft_magnitude(x[:, :, 0], cfg.fft_size, cfg.hop_size,
                         cfg.win_length, pad=cfg.win_length // 2, eps=1e-12)
    h = mag[:, :, :, None]  # (B, T', F, 1) NHWC
    outs = []
    shapes = cfg.layer_shapes()
    for i, (k, _, _, st) in enumerate(shapes):
        h = noncausal_conv2d(h, p["layers"][i], stride=st)
        if i < len(shapes) - 1:
            h = act(h)
        outs.append(h)
    return outs


@dataclasses.dataclass(frozen=True)
class MultiResolutionSpectralConfig:
    fft_sizes: Sequence[int] = (1024, 2048, 512)
    hop_sizes: Sequence[int] = (120, 240, 50)
    win_lengths: Sequence[int] = (600, 1200, 240)
    discriminator: SpectralDiscriminatorConfig = SpectralDiscriminatorConfig()

    def resolution_cfgs(self):
        return [dataclasses.replace(self.discriminator, fft_size=f,
                                    hop_size=h, win_length=w)
                for f, h, w in zip(self.fft_sizes, self.hop_sizes,
                                   self.win_lengths)]


def mrsd_init(key, cfg: MultiResolutionSpectralConfig) -> dict:
    res = cfg.resolution_cfgs()
    keys = jax.random.split(key, len(res))
    return {"discriminators": [
        spectral_discriminator_init(keys[i], rc)
        for i, rc in enumerate(res)]}


def mrsd_apply(p, x, cfg: MultiResolutionSpectralConfig):
    return [spectral_discriminator_apply(p["discriminators"][i], x, rc)
            for i, rc in enumerate(cfg.resolution_cfgs())]


# ---------------------------------------------------------------------------
# combined discriminators (ref: HiFiGAN.py:308-395, UnivNet.py:23-103)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class HiFiGANDiscriminatorConfig:
    msd: MultiScaleConfig = MultiScaleConfig()
    mpd: MultiPeriodConfig = MultiPeriodConfig()


def hifigan_discriminator_init(key, cfg: HiFiGANDiscriminatorConfig) -> dict:
    k1, k2 = jax.random.split(key)
    return {"msd": msd_init(k1, cfg.msd), "mpd": mpd_init(k2, cfg.mpd)}


def _mono_fold(x):
    """(B, T, C) -> (B*C, T, 1) (ref: HiFiGAN.py:390-392)."""
    b, t, c = x.shape
    if c != 1:
        x = jnp.moveaxis(x, 2, 1).reshape(b * c, t, 1)
    return x


def hifigan_discriminator_apply(p, x, cfg: HiFiGANDiscriminatorConfig,
                                batched: bool = False):
    """batched=True runs the stacked one-conv-per-layer MSD/MPD variants
    (identical outputs to f32-reassociation tolerance; see the batched
    section above for the measurement discipline)."""
    x = _mono_fold(x)
    if batched:
        return (msd_apply_batched(p["msd"], x, cfg.msd)
                + mpd_apply_batched(p["mpd"], x, cfg.mpd))
    return msd_apply(p["msd"], x, cfg.msd) + mpd_apply(p["mpd"], x, cfg.mpd)


@dataclasses.dataclass(frozen=True)
class UnivNetDiscriminatorConfig:
    mrsd: MultiResolutionSpectralConfig = MultiResolutionSpectralConfig()
    mpd: MultiPeriodConfig = MultiPeriodConfig()
    flat_channel: bool = False


def univnet_discriminator_init(key, cfg: UnivNetDiscriminatorConfig) -> dict:
    k1, k2 = jax.random.split(key)
    return {"mrsd": mrsd_init(k1, cfg.mrsd), "mpd": mpd_init(k2, cfg.mpd)}


def univnet_discriminator_apply(p, x, cfg: UnivNetDiscriminatorConfig,
                                batched: bool = False):
    # UnivNet only folds multi-channel input when flat_channel is set
    # (ref: UnivNet.py:98-100)
    if cfg.flat_channel:
        x = _mono_fold(x)
    mpd = (mpd_apply_batched(p["mpd"], x, cfg.mpd) if batched
           else mpd_apply(p["mpd"], x, cfg.mpd))
    return mrsd_apply(p["mrsd"], x, cfg.mrsd) + mpd
