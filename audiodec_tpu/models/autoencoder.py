"""AudioDec autoencoder (symAD) — TPU-native functional implementation.

Capability twin of the reference generator (ref:
models/autoencoder/AudioDec.py:27-256, modules/{encoder,decoder,projector,
quantizer}.py) re-designed for JAX/XLA:

- params are plain pytrees, all applies are pure functions;
- layout is (B, T, C) channels-last;
- batch mode and streaming mode share the same conv kernels; streaming state
  is an explicit pytree mirroring the layer tree (zero-width arrays for
  stateless 1x1 convs) so it can ride a `lax.scan` carry;
- the encoder/decoder "blocks" loop is unrolled at trace time (4 blocks, 3
  residual units each — small static structure, XLA fuses it).

Config anatomy mirrors config/autoencoder/symAD_vctk_48000_hop300.yaml:28-44.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence, Tuple

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
    noncausal_conv1d,
    noncausal_conv_transpose1d,
)
from audiodec_tpu.ops.vq import (
    rvq_forward,
    rvq_forward_index,
    rvq_init,
    rvq_lookup,
)


@dataclasses.dataclass(frozen=True)
class GeneratorConfig:
    input_channels: int = 1
    output_channels: int = 1
    encode_channels: int = 32
    decode_channels: int = 32
    code_dim: int = 64
    codebook_num: int = 8
    codebook_size: int = 1024
    bias: bool = True
    enc_ratios: Sequence[int] = (2, 4, 8, 16)
    dec_ratios: Sequence[int] = (16, 8, 4, 2)
    enc_strides: Sequence[int] = (3, 4, 5, 5)
    dec_strides: Sequence[int] = (5, 5, 4, 3)
    mode: str = "causal"
    codec: str = "audiodec"          # 'audiodec' | 'activate_audiodec'
    projector: str = "conv1d"
    quantizer: str = "residual_vq"
    nonlinear_activation: str = "ELU"
    nonlinear_activation_params: tuple = ()
    kernel_size: int = 7
    res_dilations: Sequence[int] = (1, 3, 9)
    res_kernel_size: int = 7

    @property
    def act(self):
        return get_activation(self.nonlinear_activation,
                              dict(self.nonlinear_activation_params))

    @property
    def hop_length(self) -> int:
        return math.prod(self.enc_strides)

    @property
    def enc_out_channels(self) -> int:
        return self.encode_channels * self.enc_ratios[-1]

    @property
    def receptive_field(self) -> int:
        """Encoder-side receptive field in samples (pre-projector).

        Each encoder stage at input rate r consumes (K-1)*d past samples per
        causal conv; accumulate through the stride pyramid (matches the 7209
        samples noted at ref utils/audiodec.py:24 for symAD hop300 once the
        projector is included).
        """
        rf = 1
        # walk backwards: projector (k=3) at frame rate
        rf += (3 - 1) * self.hop_length
        # per block: strided conv (k=2s) then 3 res units (k=7, dil 1,3,9)
        rate = self.hop_length
        for stride in reversed(self.enc_strides):
            rate //= stride
            rf += (2 * stride - 1) * rate
            for d in reversed(tuple(self.res_dilations)):
                rf += (self.res_kernel_size - 1) * d * rate
        rf += (self.kernel_size - 1)  # input conv at sample rate
        return rf


def config_from_yaml(d: dict) -> GeneratorConfig:
    """Build a GeneratorConfig from a reference-style YAML generator_params
    dict (ref: codecTrain.py:118-147; note the reference's 'quantier' typo)."""
    g = dict(d)
    aliases = {"quantier": "quantizer"}
    fields = {f.name for f in dataclasses.fields(GeneratorConfig)}
    out = {}
    for k, v in g.items():
        k = aliases.get(k, k)
        if k not in fields:
            continue
        if k == "nonlinear_activation_params":
            v = tuple(sorted(v.items()))
        elif isinstance(v, list):
            v = tuple(v)
        out[k] = v
    return GeneratorConfig(**out)


# ---------------------------------------------------------------------------
# residual unit (ref: models/autoencoder/modules/residual_unit.py:49-81)
# ---------------------------------------------------------------------------

def _res_unit_init(key, channels: int, kernel_size: int):
    k1, k2 = jax.random.split(key)
    return {
        "conv1": conv1d_init(k1, kernel_size, channels, channels, bias=False),
        "conv2": conv1d_init(k2, 1, channels, channels, bias=False),
    }


def _res_unit_apply(p, x, *, dilation, act, mode, state=None):
    if mode == "causal":
        if state is None:
            y = causal_conv1d(act(x), p["conv1"], dilation=dilation)
            y = causal_conv1d(act(y), p["conv2"])
            return x + y
        y, s1 = causal_conv1d(act(x), p["conv1"], dilation=dilation,
                              state=state["conv1"])
        y = causal_conv1d(act(y), p["conv2"])  # 1x1: stateless
        return x + y, {"conv1": s1}
    y = noncausal_conv1d(act(x), p["conv1"], dilation=dilation)
    y = noncausal_conv1d(act(y), p["conv2"])
    return x + y


def _res_unit_state(batch, channels, kernel_size, dilation, dtype):
    return {"conv1": causal_state_init(batch, channels, kernel_size,
                                       dilation, dtype)}


# ---------------------------------------------------------------------------
# encoder (ref: models/autoencoder/modules/encoder.py:84-175)
# ---------------------------------------------------------------------------

def encoder_init(key, cfg: GeneratorConfig) -> dict:
    keys = jax.random.split(key, 1 + len(cfg.enc_strides))
    params = {
        "conv": conv1d_init(keys[0], cfg.kernel_size, cfg.input_channels,
                            cfg.encode_channels, bias=False),
        "blocks": [],
    }
    in_ch = cfg.encode_channels
    for i, stride in enumerate(cfg.enc_strides):
        out_ch = cfg.encode_channels * cfg.enc_ratios[i]
        bkeys = jax.random.split(keys[1 + i], len(cfg.res_dilations) + 1)
        block = {
            "res": [_res_unit_init(bkeys[j], in_ch, cfg.res_kernel_size)
                    for j in range(len(cfg.res_dilations))],
            "conv": conv1d_init(bkeys[-1], 2 * stride, in_ch, out_ch,
                                bias=cfg.bias),
        }
        params["blocks"].append(block)
        in_ch = out_ch
    return params


def encoder_apply(p, x, cfg: GeneratorConfig, state=None):
    act = cfg.act
    causal = cfg.mode == "causal"
    if state is None:
        if causal:
            x = causal_conv1d(x, p["conv"])
        else:
            x = noncausal_conv1d(x, p["conv"])
        for i, stride in enumerate(cfg.enc_strides):
            bp = p["blocks"][i]
            for j, d in enumerate(cfg.res_dilations):
                x = _res_unit_apply(bp["res"][j], x, dilation=d, act=act,
                                    mode=cfg.mode)
            if causal:
                x = causal_conv1d(x, bp["conv"], stride=stride)
            else:
                x = noncausal_conv1d(x, bp["conv"], stride=stride)
        if cfg.codec == "activate_audiodec":
            x = act(x)
        return x
    # streaming
    assert causal
    x, s_conv = causal_conv1d(x, p["conv"], state=state["conv"])
    new_blocks = []
    for i, stride in enumerate(cfg.enc_strides):
        bp, bs = p["blocks"][i], state["blocks"][i]
        new_res = []
        for j, d in enumerate(cfg.res_dilations):
            x, sr = _res_unit_apply(bp["res"][j], x, dilation=d, act=act,
                                    mode=cfg.mode, state=bs["res"][j])
            new_res.append(sr)
        x, sc = causal_conv1d(x, bp["conv"], stride=stride, state=bs["conv"])
        new_blocks.append({"res": new_res, "conv": sc})
    if cfg.codec == "activate_audiodec":
        x = act(x)
    return x, {"conv": s_conv, "blocks": new_blocks}


def encoder_state_init(batch: int, cfg: GeneratorConfig, dtype=jnp.float32):
    state = {
        "conv": causal_state_init(batch, cfg.input_channels, cfg.kernel_size,
                                  1, dtype),
        "blocks": [],
    }
    in_ch = cfg.encode_channels
    for i, stride in enumerate(cfg.enc_strides):
        out_ch = cfg.encode_channels * cfg.enc_ratios[i]
        state["blocks"].append({
            "res": [_res_unit_state(batch, in_ch, cfg.res_kernel_size, d,
                                    dtype)
                    for d in cfg.res_dilations],
            "conv": causal_state_init(batch, in_ch, 2 * stride, 1, dtype),
        })
        in_ch = out_ch
    return state


# ---------------------------------------------------------------------------
# projector (ref: models/autoencoder/modules/projector.py:20-54)
# ---------------------------------------------------------------------------

_BN_EPS = 1e-5      # torch.nn.BatchNorm1d defaults
_BN_MOMENTUM = 0.1


def projector_init(key, cfg: GeneratorConfig) -> dict:
    if cfg.projector not in ("conv1d", "conv1d_bn"):
        raise NotImplementedError(
            f"Projector ({cfg.projector}) is not supported!")
    p = {"conv": conv1d_init(key, 3, cfg.enc_out_channels, cfg.code_dim,
                             bias=False)}
    if cfg.projector == "conv1d_bn":
        # BatchNorm1d(code_dim) after the conv (ref: projector.py:39-47).
        # scale/bias are optimizer-trained; mean/var/count are running
        # buffers overwritten from the forward's aux output, exactly like
        # the quantizer EMA buffers (never optimizer-driven).
        d = cfg.code_dim
        p["bn"] = {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,)),
                   "mean": jnp.zeros((d,)), "var": jnp.ones((d,)),
                   "count": jnp.zeros((), jnp.float32)}
    return p


def _bn_apply(bn, z, *, train: bool):
    """torch BatchNorm1d semantics on (B, T, C): normalize per channel over
    (B, T); training uses biased batch stats for normalization and updates
    running stats with the unbiased variance (momentum 0.1, eps 1e-5)."""
    if not train:
        zn = (z - bn["mean"]) * jax.lax.rsqrt(bn["var"] + _BN_EPS)
        return zn * bn["scale"] + bn["bias"], bn
    n = z.shape[0] * z.shape[1]
    mean_b = jnp.mean(z, axis=(0, 1))
    var_b = jnp.mean(jnp.square(z - mean_b), axis=(0, 1))
    zn = (z - mean_b) * jax.lax.rsqrt(var_b + _BN_EPS)
    var_unbiased = var_b * (n / max(n - 1, 1))
    m = _BN_MOMENTUM
    new = dict(bn,
               mean=(1 - m) * bn["mean"] + m * mean_b,
               var=(1 - m) * bn["var"] + m * var_unbiased,
               count=bn["count"] + 1)
    return zn * bn["scale"] + bn["bias"], new


def projector_apply(p, x, cfg: GeneratorConfig, state=None, *,
                    train: bool = False):
    """conv1d variant: returns z (or (z, state) when streaming).

    With train=True the batch path returns (z, new_bn_buffers | None) —
    batch-stat BN plus updated running stats for the conv1d_bn variant
    (None for plain conv1d).  With train=False BN uses the running stats
    and the return is plain z.  The streaming path always applies eval-mode
    BN (the reference's own streaming path for this variant is broken —
    nn.Sequential has no .inference, ref projector.py:52-54 — so eval-BN is
    our defined semantics)."""
    if cfg.mode == "causal" and state is not None:
        z, s = causal_conv1d(x, p["conv"], state=state["conv"])
        if cfg.projector == "conv1d_bn":
            z, _ = _bn_apply(p["bn"], z, train=False)
        return z, {"conv": s}
    if cfg.mode == "causal":
        z = causal_conv1d(x, p["conv"])
    else:
        z = noncausal_conv1d(x, p["conv"])
    if cfg.projector == "conv1d_bn":
        z, new_bn = _bn_apply(p["bn"], z, train=train)
    else:
        new_bn = None
    if train:
        return z, new_bn
    return z


def projector_state_init(batch: int, cfg: GeneratorConfig, dtype=jnp.float32):
    return {"conv": causal_state_init(batch, cfg.enc_out_channels, 3, 1,
                                      dtype)}


# ---------------------------------------------------------------------------
# decoder (ref: models/autoencoder/modules/decoder.py:84-214)
# ---------------------------------------------------------------------------

def decoder_init(key, cfg: GeneratorConfig) -> dict:
    keys = jax.random.split(key, 2 + len(cfg.dec_strides))
    ch0 = cfg.decode_channels * cfg.dec_ratios[0]
    params = {
        "conv1": conv1d_init(keys[0], cfg.kernel_size, cfg.code_dim, ch0,
                             bias=False),
        "blocks": [],
    }
    for i, stride in enumerate(cfg.dec_strides):
        in_ch = cfg.decode_channels * cfg.dec_ratios[i]
        if i < len(cfg.dec_ratios) - 1:
            out_ch = cfg.decode_channels * cfg.dec_ratios[i + 1]
        else:
            out_ch = cfg.decode_channels
        bkeys = jax.random.split(keys[1 + i], len(cfg.res_dilations) + 1)
        params["blocks"].append({
            "conv": conv_transpose1d_init(bkeys[0], 2 * stride, in_ch, out_ch,
                                          bias=cfg.bias),
            "res": [_res_unit_init(bkeys[1 + j], out_ch, cfg.res_kernel_size)
                    for j in range(len(cfg.res_dilations))],
        })
    params["conv2"] = conv1d_init(keys[-1], cfg.kernel_size, out_ch,
                                  cfg.output_channels, bias=False)
    return params


def decoder_apply(p, z, cfg: GeneratorConfig, state=None):
    act = cfg.act
    causal = cfg.mode == "causal"
    activate = cfg.codec == "activate_audiodec"
    if state is None:
        if causal:
            x = causal_conv1d(z, p["conv1"])
        else:
            x = noncausal_conv1d(z, p["conv1"])
        for i, stride in enumerate(cfg.dec_strides):
            bp = p["blocks"][i]
            if activate:
                x = act(x)
            if causal:
                x = causal_conv_transpose1d(x, bp["conv"], stride=stride)
            else:
                x = noncausal_conv_transpose1d(x, bp["conv"], stride=stride)
            for j, d in enumerate(cfg.res_dilations):
                x = _res_unit_apply(bp["res"][j], x, dilation=d, act=act,
                                    mode=cfg.mode)
        if activate:
            x = act(x)
        if causal:
            x = causal_conv1d(x, p["conv2"])
        else:
            x = noncausal_conv1d(x, p["conv2"])
        return jnp.tanh(x) if activate else x
    # streaming
    assert causal
    x, s1 = causal_conv1d(z, p["conv1"], state=state["conv1"])
    new_blocks = []
    for i, stride in enumerate(cfg.dec_strides):
        bp, bs = p["blocks"][i], state["blocks"][i]
        if activate:
            x = act(x)
        x, sc = causal_conv_transpose1d(x, bp["conv"], stride=stride,
                                        state=bs["conv"])
        new_res = []
        for j, d in enumerate(cfg.res_dilations):
            x, sr = _res_unit_apply(bp["res"][j], x, dilation=d, act=act,
                                    mode=cfg.mode, state=bs["res"][j])
            new_res.append(sr)
        new_blocks.append({"conv": sc, "res": new_res})
    if activate:
        x = act(x)
    x, s2 = causal_conv1d(x, p["conv2"], state=state["conv2"])
    y = jnp.tanh(x) if activate else x
    return y, {"conv1": s1, "blocks": new_blocks, "conv2": s2}


def decoder_state_init(batch: int, cfg: GeneratorConfig, dtype=jnp.float32):
    ch0 = cfg.decode_channels * cfg.dec_ratios[0]
    state = {
        "conv1": causal_state_init(batch, cfg.code_dim, cfg.kernel_size, 1,
                                   dtype),
        "blocks": [],
    }
    for i, stride in enumerate(cfg.dec_strides):
        in_ch = cfg.decode_channels * cfg.dec_ratios[i]
        if i < len(cfg.dec_ratios) - 1:
            out_ch = cfg.decode_channels * cfg.dec_ratios[i + 1]
        else:
            out_ch = cfg.decode_channels
        state["blocks"].append({
            "conv": causal_transpose_state_init(batch, in_ch, 2 * stride,
                                                stride, dtype),
            "res": [_res_unit_state(batch, out_ch, cfg.res_kernel_size, d,
                                    dtype)
                    for d in cfg.res_dilations],
        })
    state["conv2"] = causal_state_init(batch, out_ch, cfg.kernel_size, 1,
                                       dtype)
    return state


# ---------------------------------------------------------------------------
# generator
# ---------------------------------------------------------------------------

def generator_init(key, cfg: GeneratorConfig) -> dict:
    ke, kp, kq, kd = jax.random.split(key, 4)
    return {
        "encoder": encoder_init(ke, cfg),
        "projector": projector_init(kp, cfg),
        "quantizer": rvq_init(kq, cfg.codebook_num, cfg.codebook_size,
                              cfg.code_dim),
        "decoder": decoder_init(kd, cfg),
    }


def _channel_fold(x, input_channels: int):
    """(B, T, C) -> (B*C/ic, T, ic) MIMO fold (ref: AudioDec.py:113-115)."""
    b, t, c = x.shape
    if c == input_channels:
        return x
    # (B, T, G*ic) -> (B, G, T, ic) -> (B*G, T, ic), grouping consecutive chans
    g = c // input_channels
    x = x.reshape(b, t, g, input_channels)
    x = jnp.moveaxis(x, 2, 1)
    return x.reshape(b * g, t, input_channels)


def generator_forward(params, x, cfg: GeneratorConfig, *, train: bool = False,
                      bn_train: Optional[bool] = None,
                      axis_name: Optional[str] = None):
    """Full train/eval forward (ref: AudioDec.py:112-120).

    x: (B, T, C).  Returns (y, zq, z, vqloss, perplexity, new_buffers) where
    new_buffers = {"quantizer": EMA-updated codebooks[, "projector_bn":
    updated BN running stats {mean, var, count}]} — the non-optimizer
    buffers train steps merge back into the param tree (see
    merge_forward_buffers).

    bn_train decouples BatchNorm mode from codebook EMA mode: in the
    reference's adversarial/denoise phases the frozen projector's BN stays
    in train() mode (batch stats + running updates) while the codebook is
    eval (ref: trainer/autoencoder.py:66-79 freezes via requires_grad, not
    .eval()).  Defaults to `train`.
    """
    bn_train = train if bn_train is None else bn_train
    x = _channel_fold(x, cfg.input_channels)
    h = encoder_apply(params["encoder"], x, cfg)
    if bn_train:
        z, new_bn = projector_apply(params["projector"], h, cfg, train=True)
    else:
        z = projector_apply(params["projector"], h, cfg)
        new_bn = None
    zq, vqloss, ppl, new_q = rvq_forward(z, params["quantizer"], train=train,
                                         axis_name=axis_name)
    y = decoder_apply(params["decoder"], zq, cfg)
    new_buffers = {"quantizer": new_q}
    if new_bn is not None:
        new_buffers["projector_bn"] = {k: new_bn[k]
                                       for k in ("mean", "var", "count")}
    return y, zq, z, vqloss, ppl, new_buffers


def merge_forward_buffers(gen_params: dict, new_buffers: dict) -> dict:
    """Overwrite the non-optimizer buffers (quantizer EMA codebooks, BN
    running stats) that generator_forward returns into a param tree that has
    just been optimizer-updated.  Overwrites, never accumulates — these
    buffers are owned by the forward pass (ref: layers/vq_module.py:74-80;
    torch BN running-stat semantics)."""
    out = dict(gen_params, quantizer=new_buffers["quantizer"])
    if "projector_bn" in new_buffers:
        out["projector"] = dict(
            out["projector"],
            bn=dict(out["projector"]["bn"], **new_buffers["projector_bn"]))
    return out


def generator_encode(params, x, cfg: GeneratorConfig, state=None):
    """Waveform -> code indices (B, T', Q).  Streaming if `state` given."""
    x = _channel_fold(x, cfg.input_channels)
    if state is None:
        h = encoder_apply(params["encoder"], x, cfg)
        z = projector_apply(params["projector"], h, cfg)
        _, idx = rvq_forward_index(z, params["quantizer"])
        return idx
    h, se = encoder_apply(params["encoder"], x, cfg, state=state["encoder"])
    z, sp = projector_apply(params["projector"], h, cfg,
                            state=state["projector"])
    _, idx = rvq_forward_index(z, params["quantizer"])
    return idx, {"encoder": se, "projector": sp}


def generator_decode(params, idx, cfg: GeneratorConfig, state=None):
    """Code indices -> waveform.  Streaming if `state` given."""
    zq = rvq_lookup(idx, params["quantizer"])
    if state is None:
        return decoder_apply(params["decoder"], zq, cfg)
    y, sd = decoder_apply(params["decoder"], zq, cfg, state=state["decoder"])
    return y, {"decoder": sd}


def codec_state_init(batch: int, cfg: GeneratorConfig, dtype=jnp.float32):
    """Joint streaming state for encode+decode paths."""
    return {
        "encoder": encoder_state_init(batch, cfg, dtype),
        "projector": projector_state_init(batch, cfg, dtype),
        "decoder": decoder_state_init(batch, cfg, dtype),
    }
