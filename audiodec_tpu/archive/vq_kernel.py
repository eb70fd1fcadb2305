"""Fused residual-VQ encode kernel (Pallas/TPU).

Computes, for each input frame, the full residual quantization cascade
(8 codebooks x 1024 entries x 64 dims for symAD) in one kernel:

    for q in range(Q):
        dist  = |r|^2 - 2 r @ E_q^T + |E_q|^2      (MXU matmul, f32)
        idx_q = argmin(dist)                        (lowest-index tie-break)
        quant = onehot(idx_q) @ E_q                 (MXU gather-as-matmul)
        r    -= quant; zq += quant

All distances accumulate in f32 with a fixed reduction order, making the
nearest-code indices reproducible across shapes/backends (SURVEY.md §7 hard
part 1).  Gathers are expressed as one-hot matmuls so everything runs on the
MXU; frames are tiled over a 1-D grid.

Falls back to the plain XLA path (ops.vq.rvq_forward_index) on non-TPU
backends.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 256


def _rvq_kernel(z_ref, embed_ref, e2_ref, idx_ref, zq_ref):
    """z: (TILE_N, D); embed: (Q, N_e, D); e2: (Q, N_e) precomputed |E|^2;
    idx out: (TILE_N, Q) int32; zq out: (TILE_N, D)."""
    num_q, n_embed, dim = embed_ref.shape
    residual = z_ref[:].astype(jnp.float32)
    zq = jnp.zeros_like(residual)
    for q in range(num_q):
        embed = embed_ref[q].astype(jnp.float32)          # (N_e, D)
        r2 = jnp.sum(residual * residual, axis=1, keepdims=True)
        cross = jax.lax.dot_general(
            residual, embed,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # (TILE_N, N_e)
        dist = r2 - 2.0 * cross + e2_ref[q][None, :]
        idx = jnp.argmin(dist, axis=1).astype(jnp.int32)  # first-min ties
        idx_ref[:, q] = idx
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (residual.shape[0],
                                                       n_embed), 1)
                  == idx[:, None]).astype(jnp.float32)
        quant = jax.lax.dot_general(
            onehot, embed,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # (TILE_N, D)
        residual = residual - quant
        zq = zq + quant
    zq_ref[:] = zq


@partial(jax.jit, static_argnames=("interpret",))
def rvq_encode_pallas(z: jnp.ndarray, embed: jnp.ndarray,
                      interpret: bool = False):
    """z: (B, T, D) f32; embed: (Q, N_e, D) -> (zq (B,T,D), idx (B,T,Q)).

    Equivalent to ops.vq.rvq_forward_index(z, ...)'s values (no gradient
    rule: this is the inference path)."""
    b, t, d = z.shape
    num_q, n_embed, _ = embed.shape
    n = b * t
    zf = z.reshape(n, d)
    pad = (-n) % TILE_N
    if pad:
        zf = jnp.concatenate([zf, jnp.zeros((pad, d), zf.dtype)])
    e2 = jnp.sum(embed.astype(jnp.float32) ** 2, axis=-1)  # (Q, N_e)

    grid = (zf.shape[0] // TILE_N,)
    idx, zq = pl.pallas_call(
        _rvq_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_N, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_q, n_embed, d), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_q, n_embed), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_N, num_q), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((zf.shape[0], num_q), jnp.int32),
            jax.ShapeDtypeStruct((zf.shape[0], d), jnp.float32),
        ],
        interpret=interpret,
    )(zf, embed, e2)
    if pad:
        idx, zq = idx[:n], zq[:n]
    return zq.reshape(b, t, d), idx.reshape(b, t, num_q)


def rvq_encode_fast(z: jnp.ndarray, params: dict, interpret: bool = False):
    """Pallas-fused RVQ encode with XLA fallback on non-TPU backends."""
    try:
        platform = z.devices().pop().platform if hasattr(z, "devices") else \
            jax.default_backend()
    except Exception:
        platform = jax.default_backend()
    if platform not in ("tpu", "axon") and not interpret:
        from audiodec_tpu.ops.vq import rvq_forward_index
        return rvq_forward_index(z, params)
    zq, idx = rvq_encode_pallas(z, params["embed"], interpret=interpret)
    return zq, idx
