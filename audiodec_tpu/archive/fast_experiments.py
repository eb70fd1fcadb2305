"""Archived encoder/decoder fast-path wrappers over rejected kernels.

See audiodec_tpu/archive/__init__.py for why these lost their A/Bs.
Numerically equivalent to models.autoencoder.{encoder,decoder}_apply
(asserted by tests/test_fast_paths.py, tests/test_blocked.py).
"""

from __future__ import annotations

from audiodec_tpu.models.autoencoder import GeneratorConfig
from audiodec_tpu.ops.conv import causal_conv1d, causal_conv_transpose1d


def _stack(x, block_params, cfg: GeneratorConfig, tile_t: int,
           interpret: bool):
    from audiodec_tpu.archive.resunit_kernel import (
        fused_residual_stack,
        res_stack_params,
    )

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
    from audiodec_tpu.archive.blocked import blocked_res_stack

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
    from audiodec_tpu.archive.blocked import blocked_res_stack

    assert cfg.mode == "causal" and cfg.codec == "audiodec"
    act = cfg.act
    x = causal_conv1d(z, p["conv1"])
    for i, stride in enumerate(cfg.dec_strides):
        bp = p["blocks"][i]
        x = causal_conv_transpose1d(x, bp["conv"], stride=stride)
        x = blocked_res_stack(x, bp["res"],
                              dilations=tuple(cfg.res_dilations), act=act)
    return causal_conv1d(x, p["conv2"])


def encoder_apply_fused(p, x, cfg: GeneratorConfig, tile_t: int = 1024,
                        interpret: bool = False):
    """Batch causal encoder with per-tap fused residual stacks.
    x: (B, T, C)."""
    assert cfg.mode == "causal" and cfg.codec == "audiodec"
    x = causal_conv1d(x, p["conv"])
    for i, stride in enumerate(cfg.enc_strides):
        bp = p["blocks"][i]
        x = _stack(x, bp, cfg, tile_t, interpret)
        x = causal_conv1d(x, bp["conv"], stride=stride)
    return x


def decoder_apply_fused(p, z, cfg: GeneratorConfig, tile_t: int = 1024,
                        interpret: bool = False):
    """Batch causal decoder with per-tap fused residual stacks.
    z: (B, T', D)."""
    assert cfg.mode == "causal" and cfg.codec == "audiodec"
    x = causal_conv1d(z, p["conv1"])
    for i, stride in enumerate(cfg.dec_strides):
        bp = p["blocks"][i]
        x = causal_conv_transpose1d(x, bp["conv"], stride=stride)
        x = _stack(x, bp, cfg, tile_t, interpret)
    return causal_conv1d(x, p["conv2"])
