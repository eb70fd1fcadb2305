"""Fast batch inference paths: fused-Pallas residual stacks + XLA strided
convs.

Numerically equivalent to models.autoencoder.{encoder,decoder}_apply (same
f32 MXU matmuls, fixed tap order); the fused kernels keep the residual-unit
chains in VMEM, collapsing the HBM traffic the hot low-channel/high-rate
blocks are bound by.  Use for batch transcode / benchmarking on TPU; the XLA
path stays the reference for parity tests and training.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from audiodec_tpu.models.autoencoder import GeneratorConfig, _res_unit_apply
from audiodec_tpu.ops.conv import causal_conv1d, causal_conv_transpose1d
from audiodec_tpu.ops.pallas.folded_stack import folded_residual_stack
from audiodec_tpu.ops.pallas.resunit_kernel import (
    fused_residual_stack,
    res_stack_params,
)


def _stack(x, block_params, cfg: GeneratorConfig, tile_t: int,
           interpret: bool):
    # scale the time tile inversely with channel width so the kernel's VMEM
    # working set (~a dozen live (tile, C) f32 tensors from the unrolled tap
    # matmuls, plus weights) stays under the scoped-vmem limit
    c = x.shape[-1]
    tile_eff = max(128, min(tile_t, 65536 // max(c, 1)))
    return fused_residual_stack(
        x, res_stack_params(block_params),
        dilations=tuple(cfg.res_dilations),
        kernel_size=cfg.res_kernel_size,
        tile_t=tile_eff, interpret=interpret)


def encoder_apply_blocked(p, x, cfg: GeneratorConfig):
    """Batch causal encoder with block-packed (lane-filling) residual stacks
    — pure XLA, no Pallas.  x: (B, T, C)."""
    from audiodec_tpu.ops.blocked import blocked_res_stack

    assert cfg.mode == "causal" and cfg.codec == "audiodec"
    act = cfg.act
    x = causal_conv1d(x, p["conv"])
    for i, stride in enumerate(cfg.enc_strides):
        bp = p["blocks"][i]
        x = blocked_res_stack(x, bp["res"],
                              dilations=tuple(cfg.res_dilations), act=act)
        x = causal_conv1d(x, bp["conv"], stride=stride)
    return x


def decoder_apply_blocked(p, z, cfg: GeneratorConfig):
    """Batch causal decoder with block-packed residual stacks."""
    from audiodec_tpu.ops.blocked import blocked_res_stack

    assert cfg.mode == "causal" and cfg.codec == "audiodec"
    act = cfg.act
    x = causal_conv1d(z, p["conv1"])
    for i, stride in enumerate(cfg.dec_strides):
        bp = p["blocks"][i]
        x = causal_conv_transpose1d(x, bp["conv"], stride=stride)
        x = blocked_res_stack(x, bp["res"],
                              dilations=tuple(cfg.res_dilations), act=act)
    return causal_conv1d(x, p["conv2"])


def _use_folded(c: int, t: int, cfg: GeneratorConfig) -> bool:
    # the folded kernel wins only where XLA is lane-starved: C<=32 (fold
    # factor >=4).  At C=64/128 the fold's halo-offset FLOP amplification
    # outweighs the lane fill (measured, tools/folded_probe.py).
    f = max(1, 128 // max(c, 1))
    return (cfg.nonlinear_activation == "ELU"
            and not cfg.nonlinear_activation_params
            and f >= 4 and t % f == 0)


def res_stack_auto(x, block_params, cfg: GeneratorConfig, interpret=None):
    """Residual stack: folded-time Pallas kernel where it beats XLA
    (C<=32; tools/folded_probe.py), plain XLA chain otherwise."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, t, c = x.shape
    if _use_folded(c, t, cfg):
        return folded_residual_stack(
            x, res_stack_params(block_params),
            dilations=tuple(cfg.res_dilations),
            kernel_size=cfg.res_kernel_size, interpret=interpret)
    act = cfg.act
    for j, d in enumerate(cfg.res_dilations):
        x = _res_unit_apply(block_params["res"][j], x, dilation=d, act=act,
                            mode="causal")
    return x


def encoder_apply_folded(p, x, cfg: GeneratorConfig, interpret=None):
    """Batch causal encoder, folded-stack fast path.  x: (B, T, C).

    Same structure as models.autoencoder.encoder_apply (batch mode); the
    residual stacks run in the folded Pallas kernel where profitable."""
    assert cfg.mode == "causal" and cfg.codec == "audiodec"
    x = causal_conv1d(x, p["conv"])
    for i, stride in enumerate(cfg.enc_strides):
        bp = p["blocks"][i]
        x = res_stack_auto(x, bp, cfg, interpret)
        x = causal_conv1d(x, bp["conv"], stride=stride)
    return x


def decoder_apply_folded(p, z, cfg: GeneratorConfig, interpret=None):
    """Batch causal decoder, folded-stack fast path.  z: (B, T', D)."""
    assert cfg.mode == "causal" and cfg.codec == "audiodec"
    x = causal_conv1d(z, p["conv1"])
    for i, stride in enumerate(cfg.dec_strides):
        bp = p["blocks"][i]
        x = causal_conv_transpose1d(x, bp["conv"], stride=stride)
        x = res_stack_auto(x, bp, cfg, interpret)
    return causal_conv1d(x, p["conv2"])


def encoder_apply_fused(p, x, cfg: GeneratorConfig, tile_t: int = 1024,
                        interpret: bool = False):
    """Batch causal encoder with fused residual stacks.  x: (B, T, C)."""
    assert cfg.mode == "causal" and cfg.codec == "audiodec"
    x = causal_conv1d(x, p["conv"])
    for i, stride in enumerate(cfg.enc_strides):
        bp = p["blocks"][i]
        x = _stack(x, bp, cfg, tile_t, interpret)
        x = causal_conv1d(x, bp["conv"], stride=stride)
    return x


def decoder_apply_fused(p, z, cfg: GeneratorConfig, tile_t: int = 1024,
                        interpret: bool = False):
    """Batch causal decoder with fused residual stacks.  z: (B, T', D)."""
    assert cfg.mode == "causal" and cfg.codec == "audiodec"
    x = causal_conv1d(z, p["conv1"])
    for i, stride in enumerate(cfg.dec_strides):
        bp = p["blocks"][i]
        x = causal_conv_transpose1d(x, bp["conv"], stride=stride)
        x = _stack(x, bp, cfg, tile_t, interpret)
    return causal_conv1d(x, p["conv2"])
