"""Config loading + model factories from reference-style YAML experiment
configs (ref: codecTrain.py:118-147, bin/utils.py:17-22).

The YAML schema is kept compatible with the reference so its experiment
configs work unchanged (config/ in this repo carries ported copies)."""

from __future__ import annotations

import os
from typing import Optional, Tuple

import yaml

from audiodec_tpu.models import autoencoder as ae
from audiodec_tpu.models import vocoder as voc
from audiodec_tpu.models.discriminators import (
    HiFiGANDiscriminatorConfig,
    MultiPeriodConfig,
    MultiResolutionSpectralConfig,
    MultiScaleConfig,
    PeriodDiscriminatorConfig,
    ScaleDiscriminatorConfig,
    SpectralDiscriminatorConfig,
    UnivNetDiscriminatorConfig,
)


def _deep_merge(base: dict, override: dict) -> dict:
    out = dict(base)
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def load_config(path: str) -> dict:
    """Load a YAML config; an `inherit: <relative path>` key deep-merges the
    file over its base (framework extension; reference configs have no
    inherit and load unchanged)."""
    with open(path) as f:
        cfg = yaml.safe_load(f)
    if isinstance(cfg, dict) and "inherit" in cfg:
        base = load_config(os.path.join(os.path.dirname(path),
                                        cfg.pop("inherit")))
        cfg = _deep_merge(base, cfg)
    return cfg


def load_config_near_checkpoint(ckpt_path: str) -> dict:
    """config.yml sitting next to a checkpoint (ref: bin/utils.py:17-22)."""
    dirname = os.path.dirname(ckpt_path)
    return load_config(os.path.join(dirname, "config.yml"))


def _act_params(d: dict) -> tuple:
    return tuple(sorted(d.get("nonlinear_activation_params", {}).items()))


def scale_discriminator_config(p: dict) -> ScaleDiscriminatorConfig:
    return ScaleDiscriminatorConfig(
        in_channels=p.get("in_channels", 1),
        out_channels=p.get("out_channels", 1),
        kernel_sizes=tuple(p.get("kernel_sizes", (15, 41, 5, 3))),
        channels=p.get("channels", 128),
        max_downsample_channels=p.get("max_downsample_channels", 1024),
        max_groups=p.get("max_groups", 16),
        bias=p.get("bias", True),
        downsample_scales=tuple(p.get("downsample_scales", (2, 2, 4, 4, 1))),
        nonlinear_activation=p.get("nonlinear_activation", "LeakyReLU"),
        nonlinear_activation_params=_act_params(p),
    )


def period_discriminator_config(p: dict) -> PeriodDiscriminatorConfig:
    return PeriodDiscriminatorConfig(
        in_channels=p.get("in_channels", 1),
        out_channels=p.get("out_channels", 1),
        kernel_sizes=tuple(p.get("kernel_sizes", (5, 3))),
        channels=p.get("channels", 32),
        downsample_scales=tuple(p.get("downsample_scales", (3, 3, 3, 3, 1))),
        max_downsample_channels=p.get("max_downsample_channels", 1024),
        bias=p.get("bias", True),
        nonlinear_activation=p.get("nonlinear_activation", "LeakyReLU"),
        nonlinear_activation_params=_act_params(p),
        use_spectral_norm=p.get("use_spectral_norm", False),
    )


def hifigan_discriminator_config(d: dict) -> HiFiGANDiscriminatorConfig:
    """From the YAML discriminator_params block (HiFiGAN MSD+MPD)."""
    pool = d.get("scale_downsample_pooling_params", {})
    return HiFiGANDiscriminatorConfig(
        msd=MultiScaleConfig(
            scales=d.get("scales", 3),
            follow_official_norm=d.get("follow_official_norm", True),
            pool_kernel=pool.get("kernel_size", 4),
            pool_stride=pool.get("stride", 2),
            pool_padding=pool.get("padding", 2),
            discriminator=scale_discriminator_config(
                d.get("scale_discriminator_params", {}))),
        mpd=MultiPeriodConfig(
            periods=tuple(d.get("periods", (2, 3, 5, 7, 11))),
            discriminator=period_discriminator_config(
                d.get("period_discriminator_params", {}))),
    )


def univnet_discriminator_config(d: dict) -> UnivNetDiscriminatorConfig:
    sp = d.get("spectral_discriminator_params", {})
    return UnivNetDiscriminatorConfig(
        mrsd=MultiResolutionSpectralConfig(
            fft_sizes=tuple(d.get("fft_sizes", (1024, 2048, 512))),
            hop_sizes=tuple(d.get("hop_sizes", (120, 240, 50))),
            win_lengths=tuple(d.get("win_lengths", (600, 1200, 240))),
            discriminator=SpectralDiscriminatorConfig(
                kernel_sizes=tuple(tuple(k) for k in sp.get(
                    "kernel_sizes", ((3, 9), (3, 9), (3, 9), (3, 9), (3, 3),
                                     (3, 3)))),
                strides=tuple(tuple(s) for s in sp.get(
                    "strides", ((1, 1), (1, 2), (1, 2), (1, 2), (1, 1),
                                (1, 1)))),
                channels=sp.get("channels", 32),
                bias=sp.get("bias", True),
                nonlinear_activation=sp.get("nonlinear_activation",
                                            "LeakyReLU"),
                nonlinear_activation_params=_act_params(sp) or
                (("negative_slope", 0.2),),
            )),
        mpd=MultiPeriodConfig(
            periods=tuple(d.get("periods", (2, 3, 5, 7, 11))),
            discriminator=period_discriminator_config(
                d.get("period_discriminator_params", {}))),
        flat_channel=d.get("flat_channel", False),
    )


def generator_config(config: dict):
    """model_type -> generator config (ref: codecTrain.py:130-147)."""
    model_type = config.get("model_type", "symAudioDec")
    gp = config.get("generator_params", {})
    if model_type in ("symAudioDec", "symAudioDecUniv"):
        return ae.config_from_yaml(gp)
    if model_type in ("HiFiGAN", "UnivNet"):
        return voc.config_from_yaml(gp, stats=gp.get("stats") is not None)
    raise NotImplementedError(f"Model type {model_type} is not supported!")


def discriminator_config(config: dict):
    model_type = config.get("model_type", "symAudioDec")
    dp = config.get("discriminator_params", {})
    if model_type in ("symAudioDec", "HiFiGAN"):
        return hifigan_discriminator_config(dp)
    if model_type in ("symAudioDecUniv", "UnivNet"):
        return univnet_discriminator_config(dp)
    raise NotImplementedError(f"Model type {model_type} is not supported!")
