"""Tensor (channel) parallelism for the codec's conv stacks
(SURVEY.md §2.1 item 4).

The reference has no distribution at all and AudioDec's models are small
(9-20 M params), so TP is never needed for capacity — this module exists so
the layer API accepts a mesh axis for channel sharding, following the GSPMD
recipe: annotate conv-weight shardings over a 'model' mesh axis, shard the
batch over 'data', and let XLA insert the collectives (all-gather /
reduce-scatter / psum ride the ICI).

Sharding plan (Megatron-style, per residual unit
ref models/autoencoder/modules/residual_unit.py:49-81):

  conv1 (k=7, dilated) -> column-parallel: w (K, I, O) split on O
  conv2 (1x1)          -> row-parallel:    w split on I

so the unit's internal activation is channel-sharded and one reduction
returns the replicated residual.  Strided encoder convs, transposed decoder
convs, the input/output convs and the projector are column-parallel whenever
their output width divides the axis; everything else (and the whole RVQ
quantizer) stays replicated — splitting the codebook argmin would
reassociate the f32 distance sums that the bit-exactness tests pin.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from audiodec_tpu.models.autoencoder import (
    GeneratorConfig,
    decoder_apply,
    encoder_apply,
    projector_apply,
)
from audiodec_tpu.ops.vq import rvq_forward_index, rvq_lookup


def make_tp_mesh(data: int = -1, model: int = 1,
                 devices: Optional[Sequence] = None) -> Mesh:
    """Create a ('data', 'model') mesh.  data=-1 uses all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model <= n, f"mesh {data}x{model} > {n} devices"
    arr = np.array(devices[: data * model]).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def _replicate(p):
    return jax.tree.map(lambda _: P(), p)


def _col(p: dict, width: int, tp: int, axis: str) -> dict:
    """Column-parallel conv spec: w (K, I, O) split on O (bias follows O),
    replicated when the width doesn't divide the axis."""
    if width % tp:
        return _replicate(p)
    s = {"w": P(None, None, axis)}
    if "b" in p:
        s["b"] = P(axis)
    return s


def _unit(p: dict, channels: int, tp: int, axis: str) -> dict:
    """Megatron pair for one residual unit (res convs are bias-free)."""
    if channels % tp:
        return _replicate(p)
    return {"conv1": {"w": P(None, None, axis)},
            "conv2": {"w": P(None, axis, None)}}


def generator_tp_specs(params: dict, cfg: GeneratorConfig, tp: int,
                       axis: str = "model") -> dict:
    """PartitionSpec pytree (same structure as the generator params) that
    channel-shards every divisible conv over mesh axis `axis`."""
    enc_p = params["encoder"]
    enc = {"conv": _col(enc_p["conv"], cfg.encode_channels, tp, axis),
           "blocks": []}
    in_ch = cfg.encode_channels
    for i, _stride in enumerate(cfg.enc_strides):
        out_ch = cfg.encode_channels * cfg.enc_ratios[i]
        bp = enc_p["blocks"][i]
        enc["blocks"].append({
            "res": [_unit(r, in_ch, tp, axis) for r in bp["res"]],
            "conv": _col(bp["conv"], out_ch, tp, axis),
        })
        in_ch = out_ch

    dec_p = params["decoder"]
    ch0 = cfg.decode_channels * cfg.dec_ratios[0]
    dec = {"conv1": _col(dec_p["conv1"], ch0, tp, axis), "blocks": []}
    for i, _stride in enumerate(cfg.dec_strides):
        if i < len(cfg.dec_ratios) - 1:
            out_ch = cfg.decode_channels * cfg.dec_ratios[i + 1]
        else:
            out_ch = cfg.decode_channels
        bp = dec_p["blocks"][i]
        dec["blocks"].append({
            "conv": _col(bp["conv"], out_ch, tp, axis),
            "res": [_unit(r, out_ch, tp, axis) for r in bp["res"]],
        })
    dec["conv2"] = _replicate(dec_p["conv2"])  # output width is 1-2 channels

    return {
        "encoder": enc,
        "projector": {"conv": _col(params["projector"]["conv"], cfg.code_dim,
                                   tp, axis)},
        "quantizer": _replicate(params["quantizer"]),
        "decoder": dec,
    }


def make_tp_codec(mesh: Mesh, params: dict, cfg: GeneratorConfig,
                  axis: str = "model"):
    """Build jitted batch encode/decode with conv channels sharded over
    `axis` and the batch over 'data'.

    Returns (encode, decode):
      encode(x: (B, T, C)) -> idx (B, T//hop, Q)
      decode(idx) -> y (B, T, C)
    Channel sharding never splits a causal conv's time axis, so RVQ indices
    stay bit-identical to the single-device path on CPU; row-parallel 1x1
    reductions may reassociate f32 sums at rounding level in waveforms.
    """
    tp = mesh.shape[axis]
    specs = generator_tp_specs(params, cfg, tp, axis)
    shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                             is_leaf=lambda v: isinstance(v, P))
    params = jax.device_put(params, shardings)
    dspec = NamedSharding(mesh, P("data", None, None))

    def _enc(params, x):
        h = encoder_apply(params["encoder"], x, cfg)
        z = projector_apply(params["projector"], h, cfg)
        _, idx = rvq_forward_index(z, params["quantizer"])
        return idx

    def _dec(params, idx):
        zq = rvq_lookup(idx, params["quantizer"])
        return decoder_apply(params["decoder"], zq, cfg)

    encode = jax.jit(_enc, in_shardings=(shardings, dspec),
                     out_shardings=dspec)
    decode = jax.jit(_dec, in_shardings=(shardings, dspec),
                     out_shardings=dspec)
    return (lambda x: encode(params, x)), (lambda idx: decode(params, idx))
