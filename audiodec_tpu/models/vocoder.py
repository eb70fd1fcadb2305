"""Causal HiFiGAN vocoder — TPU-native functional implementation.

Capability twin of the reference's causal HiFiGAN generator (ref:
models/vocoder/HiFiGAN.py:28-305, modules/{multi_fusion,residual_block}.py):

- optional input normalization (c - mean) / scale with stats from the
  code-statistics pipeline (ref: HiFiGAN.py:126-131,151-153);
- input causal conv -> N x [LeakyReLU -> causal transposed conv -> fusion
  block] -> LeakyReLU -> output causal conv -> tanh;
- fusion block is MultiReceptiveField (v0: sum/avg of resblocks with kernels
  3/7/11) or MultiGroupConv1d (v1/v2 fast path: one grouped resblock with
  channel replication and a 1x1 fuse-out, ref: multi_fusion.py:82-141),
  selected exactly like the reference (1 resblock and groups>1 => grouped).

Streaming state mirrors the layer tree like the autoencoder.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from audiodec_tpu.ops.activations import get_activation
from audiodec_tpu.ops.conv import (
    causal_conv1d,
    causal_conv_transpose1d,
    causal_state_init,
    causal_transpose_state_init,
    conv1d_init,
    conv_transpose1d_init,
)


@dataclasses.dataclass(frozen=True)
class VocoderConfig:
    in_channels: int = 80
    out_channels: int = 1
    channels: int = 512
    kernel_size: int = 7
    upsample_scales: Sequence[int] = (8, 8, 2, 2)
    upsample_kernel_sizes: Sequence[int] = (16, 16, 4, 4)
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilations: Sequence[Sequence[int]] = ((1, 3, 5), (1, 3, 5),
                                                  (1, 3, 5))
    groups: int = 1
    bias: bool = True
    use_additional_convs: bool = True
    nonlinear_activation: str = "LeakyReLU"
    nonlinear_activation_params: tuple = (("negative_slope", 0.1),)
    stats: bool = False   # whether params carry input-normalization stats

    @property
    def act(self):
        return get_activation(self.nonlinear_activation,
                              dict(self.nonlinear_activation_params))

    @property
    def grouped(self) -> bool:
        """MultiGroupConv1d vs MultiReceptiveField (ref: HiFiGAN.py:77-81)."""
        return (len(self.resblock_dilations) ==
                len(self.resblock_kernel_sizes) == 1) and self.groups > 1

    @property
    def hop_length(self) -> int:
        import math
        return math.prod(self.upsample_scales)

    def stage_channels(self, i: int) -> int:
        return self.channels // (2 ** (i + 1))


def config_from_yaml(d: dict, stats: bool = False) -> VocoderConfig:
    g = dict(d)
    fields = {f.name for f in dataclasses.fields(VocoderConfig)}
    out = {}
    for k, v in g.items():
        if k not in fields:
            continue
        if k == "nonlinear_activation_params":
            v = tuple(sorted(v.items()))
        elif k == "resblock_dilations":
            v = tuple(tuple(x) for x in v)
        elif isinstance(v, list):
            v = tuple(v)
        out[k] = v
    out["stats"] = stats
    return VocoderConfig(**out)


# ---------------------------------------------------------------------------
# residual block (ref: models/vocoder/modules/residual_block.py:23-106)
# ---------------------------------------------------------------------------

def _resblock_init(key, channels, kernel_size, dilations, groups, bias,
                   use_additional):
    keys = jax.random.split(key, 2 * len(dilations))
    p = {"convs1": [], "convs2": []}
    for j in range(len(dilations)):
        p["convs1"].append(conv1d_init(keys[2 * j], kernel_size, channels,
                                       channels, groups=groups, bias=bias))
        if use_additional:
            p["convs2"].append(conv1d_init(keys[2 * j + 1], kernel_size,
                                           channels, channels, groups=groups,
                                           bias=bias))
    return p


def _resblock_apply(p, x, *, dilations, groups, use_additional, act,
                    state=None):
    if state is None:
        for j, d in enumerate(dilations):
            xt = causal_conv1d(act(x), p["convs1"][j], dilation=d,
                               groups=groups)
            if use_additional:
                xt = causal_conv1d(act(xt), p["convs2"][j], groups=groups)
            x = xt + x
        return x
    ns = {"convs1": [], "convs2": []}
    for j, d in enumerate(dilations):
        xt, s1 = causal_conv1d(act(x), p["convs1"][j], dilation=d,
                               groups=groups, state=state["convs1"][j])
        ns["convs1"].append(s1)
        if use_additional:
            xt, s2 = causal_conv1d(act(xt), p["convs2"][j], groups=groups,
                                   state=state["convs2"][j])
            ns["convs2"].append(s2)
        x = xt + x
    return x, ns


def _resblock_state(batch, channels, kernel_size, dilations, use_additional,
                    dtype):
    s = {"convs1": [], "convs2": []}
    for d in dilations:
        s["convs1"].append(causal_state_init(batch, channels, kernel_size, d,
                                             dtype))
        if use_additional:
            s["convs2"].append(causal_state_init(batch, channels, kernel_size,
                                                 1, dtype))
    return s


# ---------------------------------------------------------------------------
# fusion blocks (ref: models/vocoder/modules/multi_fusion.py)
# ---------------------------------------------------------------------------

def _fusion_init(key, cfg: VocoderConfig, channels):
    if cfg.grouped:
        k1, k2 = jax.random.split(key)
        p = _resblock_init(k1, channels * cfg.groups,
                           cfg.resblock_kernel_sizes[0],
                           cfg.resblock_dilations[0], cfg.groups, cfg.bias,
                           cfg.use_additional_convs)
        p["conv_out"] = conv1d_init(k2, 1, channels * cfg.groups, channels,
                                    bias=False)
        return p
    keys = jax.random.split(key, len(cfg.resblock_kernel_sizes))
    return {"blocks": [
        _resblock_init(keys[i], channels, cfg.resblock_kernel_sizes[i],
                       cfg.resblock_dilations[i], cfg.groups, cfg.bias,
                       cfg.use_additional_convs)
        for i in range(len(cfg.resblock_kernel_sizes))]}


def _fusion_apply(p, x, cfg: VocoderConfig, state=None):
    act = cfg.act
    if cfg.grouped:
        if state is None:
            # Batch mode: run the grouped resblock as `groups` independent
            # dense resblocks on the (untiled) input — identical math to the
            # reference's channel-repeat + grouped conv (each input group is
            # a copy of x), but keeps activations in the native (B, T, C)
            # layout instead of a lane-padded grouped-conv form that blows
            # HBM up 4x at C=32 on TPU.
            G, C = cfg.groups, x.shape[-1]

            def slice_group(conv_p, g):
                pg = {"w": conv_p["w"][..., g * C:(g + 1) * C]}
                if "b" in conv_p:
                    pg["b"] = conv_p["b"][g * C:(g + 1) * C]
                return pg

            outs = []
            for g in range(G):
                pg = {"convs1": [slice_group(c, g) for c in p["convs1"]],
                      "convs2": [slice_group(c, g) for c in p["convs2"]]}
                outs.append(_resblock_apply(
                    pg, x, dilations=cfg.resblock_dilations[0], groups=1,
                    use_additional=cfg.use_additional_convs, act=act))
            xg = jnp.concatenate(outs, axis=-1)
            return causal_conv1d(xg, p["conv_out"])
        xg = jnp.tile(x, (1, 1, cfg.groups))  # (B, T, n*C) channel repeat
        xg, ns = _resblock_apply(p, xg, dilations=cfg.resblock_dilations[0],
                                 groups=cfg.groups,
                                 use_additional=cfg.use_additional_convs,
                                 act=act, state=state)
        return causal_conv1d(xg, p["conv_out"]), ns
    n = len(cfg.resblock_kernel_sizes)
    if state is None:
        cs = 0.0
        for i in range(n):
            cs = cs + _resblock_apply(
                p["blocks"][i], x, dilations=cfg.resblock_dilations[i],
                groups=cfg.groups, use_additional=cfg.use_additional_convs,
                act=act)
        return cs / n
    cs = 0.0
    ns = {"blocks": []}
    for i in range(n):
        y, s = _resblock_apply(
            p["blocks"][i], x, dilations=cfg.resblock_dilations[i],
            groups=cfg.groups, use_additional=cfg.use_additional_convs,
            act=act, state=state["blocks"][i])
        cs = cs + y
        ns["blocks"].append(s)
    return cs / n, ns


def _fusion_state(batch, cfg: VocoderConfig, channels, dtype):
    if cfg.grouped:
        return _resblock_state(batch, channels * cfg.groups,
                               cfg.resblock_kernel_sizes[0],
                               cfg.resblock_dilations[0],
                               cfg.use_additional_convs, dtype)
    return {"blocks": [
        _resblock_state(batch, channels, cfg.resblock_kernel_sizes[i],
                        cfg.resblock_dilations[i], cfg.use_additional_convs,
                        dtype)
        for i in range(len(cfg.resblock_kernel_sizes))]}


# ---------------------------------------------------------------------------
# generator
# ---------------------------------------------------------------------------

def vocoder_init(key, cfg: VocoderConfig) -> dict:
    n_up = len(cfg.upsample_scales)
    keys = jax.random.split(key, 2 + 2 * n_up)
    p = {
        "input_conv": conv1d_init(keys[0], cfg.kernel_size, cfg.in_channels,
                                  cfg.channels, bias=True),
        "upsamples": [],
        "blocks": [],
        "output_conv": conv1d_init(keys[1], cfg.kernel_size,
                                   cfg.stage_channels(n_up - 1),
                                   cfg.out_channels, bias=True),
    }
    for i in range(n_up):
        c_in = cfg.channels // (2 ** i)
        c_out = cfg.stage_channels(i)
        p["upsamples"].append(conv_transpose1d_init(
            keys[2 + 2 * i], cfg.upsample_kernel_sizes[i], c_in, c_out,
            bias=True))
        p["blocks"].append(_fusion_init(keys[3 + 2 * i], cfg, c_out))
    if cfg.stats:
        p["mean"] = jnp.zeros((cfg.in_channels,))
        p["scale"] = jnp.ones((cfg.in_channels,))
    return p


def vocoder_apply(p, c, cfg: VocoderConfig, state=None):
    """c: (B, T, in_channels) codes -> (B, T*hop, out_channels) waveform."""
    act = cfg.act
    lrelu = get_activation("LeakyReLU")  # output act1 is default-slope LeakyReLU
    if cfg.stats and "mean" in p:
        c = (c - p["mean"]) / p["scale"]
    if state is None:
        c = causal_conv1d(c, p["input_conv"])
        for i, s in enumerate(cfg.upsample_scales):
            c = causal_conv_transpose1d(act(c), p["upsamples"][i], stride=s)
            c = _fusion_apply(p["blocks"][i], c, cfg)
        c = causal_conv1d(lrelu(c), p["output_conv"])
        return jnp.tanh(c)
    c, s_in = causal_conv1d(c, p["input_conv"], state=state["input_conv"])
    new_up, new_blocks = [], []
    for i, s in enumerate(cfg.upsample_scales):
        c, su = causal_conv_transpose1d(act(c), p["upsamples"][i], stride=s,
                                        state=state["upsamples"][i])
        c, sb = _fusion_apply(p["blocks"][i], c, cfg,
                              state=state["blocks"][i])
        new_up.append(su)
        new_blocks.append(sb)
    c, s_out = causal_conv1d(lrelu(c), p["output_conv"],
                             state=state["output_conv"])
    return jnp.tanh(c), {"input_conv": s_in, "upsamples": new_up,
                         "blocks": new_blocks, "output_conv": s_out}


def vocoder_state_init(batch: int, cfg: VocoderConfig, dtype=jnp.float32):
    n_up = len(cfg.upsample_scales)
    state = {
        "input_conv": causal_state_init(batch, cfg.in_channels,
                                        cfg.kernel_size, 1, dtype),
        "upsamples": [],
        "blocks": [],
        "output_conv": causal_state_init(batch, cfg.stage_channels(n_up - 1),
                                         cfg.kernel_size, 1, dtype),
    }
    for i in range(n_up):
        c_in = cfg.channels // (2 ** i)
        c_out = cfg.stage_channels(i)
        state["upsamples"].append(causal_transpose_state_init(
            batch, c_in, cfg.upsample_kernel_sizes[i], cfg.upsample_scales[i],
            dtype))
        state["blocks"].append(_fusion_state(batch, cfg, c_out, dtype))
    return state
