"""Residual vector quantization (RVQ), TPU-native and functional.

Re-design of the reference's EMA-codebook RVQ (ref: layers/vq_module.py:19-161,
SoundStream alg. 1) as pure functions over an explicit parameter pytree:

    params = {
        "embed":        (Q, N, D)  codebooks (N entries of dim D per quantizer)
        "cluster_size": (Q, N)     EMA cluster sizes
        "embed_avg":    (Q, N, D)  EMA sums
    }

Gradient semantics replicate the reference exactly: the residual subtraction is
*not* detached (ref: layers/vq_module.py:126-129), so only the first
quantizer's straight-through gradient reaches the encoder; commitment loss is
computed per-layer on the (gradient-dead for q>=1) residuals.

The EMA codebook update is returned functionally (new params) and supports a
cross-replica `psum` over a mesh axis for data-parallel training — summing
one-hot counts and embedding sums across replicas reproduces single-device
semantics at equal global batch (SURVEY.md §5, §7).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def rvq_init(key, num_quantizers: int, codebook_size: int, dim: int,
             dtype=jnp.float32) -> dict:
    """Random-normal codebooks, like the reference's `torch.randn(dim, n)`."""
    embed = jax.random.normal(key, (num_quantizers, codebook_size, dim), dtype)
    return {
        "embed": embed,
        "cluster_size": jnp.zeros((num_quantizers, codebook_size), dtype),
        "embed_avg": embed.copy(),
    }


def vq_distances(z: jnp.ndarray, embed: jnp.ndarray) -> jnp.ndarray:
    """Squared L2 distances.  z: (..., D); embed: (N, D) -> (..., N).

    Computed as |z|^2 - 2 z.E^T + |E|^2 in f32, the same expansion the
    reference uses (ref: layers/vq_module.py:63-68).
    """
    z2 = jnp.sum(jnp.square(z), axis=-1, keepdims=True)
    e2 = jnp.sum(jnp.square(embed), axis=-1)
    cross = jnp.einsum("...d,nd->...n", z, embed,
                       preferred_element_type=jnp.float32)
    return z2 - 2.0 * cross + e2


def vq_nearest(z: jnp.ndarray, embed: jnp.ndarray) -> jnp.ndarray:
    """Nearest-codebook indices with lowest-index tie-breaking.

    Matches torch's `(-dist).max(1)` (first maximal element = lowest index,
    ref: layers/vq_module.py:69); `jnp.argmin` has the same tie rule.
    """
    return jnp.argmin(vq_distances(z, embed), axis=-1).astype(jnp.int32)


def vq_nearest_2pass(z: jnp.ndarray, embed: jnp.ndarray,
                     k: int = 16) -> jnp.ndarray:
    """Two-pass nearest-codebook argmin: hardware-exact at near-default cost.

    XLA:TPU multiplies f32 matmuls in one bf16 pass under default precision,
    which can flip near-tie argmins vs the torch/CPU f32 reference (ref:
    layers/vq_module.py:63-69; BENCHMARKS.md "numerics on hardware").  Pass 1
    computes all N distances at default precision and shortlists the top-k
    candidates per frame; pass 2 re-scores ONLY those k rows with a
    HIGHEST-precision cross term (true-f32 multiplies; the |z|^2 and |E|^2
    terms are elementwise VPU work and already exact).  k=16 covers the
    measured ~4-5% near-tie flip band with a wide margin at ~k/N = 1.6% of
    the distance FLOPs re-run at 6-pass cost.

    Ties in the exact distances resolve to the lowest codebook index,
    matching torch's `(-dist).max(1)` first-maximal rule.
    """
    d1 = vq_distances(z, embed)
    _, cand = jax.lax.top_k(-d1, k)            # (..., k) candidate indices
    e = jnp.take(embed, cand, axis=0)          # (..., k, D)
    z2 = jnp.sum(jnp.square(z), axis=-1, keepdims=True)
    e2 = jnp.sum(jnp.square(e), axis=-1)
    cross = jnp.einsum("...d,...kd->...k", z, e,
                       precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)
    dk = z2 - 2.0 * cross + e2
    m = jnp.min(dk, axis=-1, keepdims=True)
    n_embed = embed.shape[0]
    best = jnp.min(jnp.where(dk <= m, cand, n_embed), axis=-1)
    return best.astype(jnp.int32)


def vq_distances_exact(z: jnp.ndarray, embed: jnp.ndarray) -> jnp.ndarray:
    """Squared L2 distances with a HIGHEST-precision cross term (true-f32
    multiplies on TPU; identical to vq_distances on CPU).  The oracle the
    two-pass argmin re-scores against."""
    z2 = jnp.sum(jnp.square(z), axis=-1, keepdims=True)
    e2 = jnp.sum(jnp.square(embed), axis=-1)
    cross = jnp.einsum("...d,nd->...n", z, embed,
                       precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)
    return z2 - 2.0 * cross + e2


def rvq_shortlist_ranks(z: jnp.ndarray, params: dict,
                        pass1_dtype=None) -> jnp.ndarray:
    """Exactness-coverage validator for vq_nearest_2pass's k shortlist.

    For every frame and every quantizer layer, computes the RANK of the
    true (highest-precision f32) argmin within the pass-1 distances the
    shortlist is drawn from (0 = pass-1 already ranks it best; ties
    resolve to the lowest index, jax.lax.top_k's order).  vq_nearest_2pass
    is exact for a frame iff rank < k, so `max(ranks)` over a corpus is
    the tight lower bound on a safe k — run this whenever goldens are
    re-pinned to keep the k=16 default honest (VERDICT r4 §weak-5;
    ref layers/vq_module.py:63-69 is the torch f32 oracle being matched).

    pass1_dtype: optional cast of z/embeddings for the pass-1 distances
    only — emulates the hardware's lower-precision first pass on CPU (on
    TPU leave None: the default-precision einsum IS the hardware pass 1).
    Residuals follow the exact-index path, i.e. the sequence the two-pass
    decoder actually produces.

    z: (B, T, D) f32.  Returns ranks (B, T, Q) int32.
    """
    embed = params["embed"]
    num_q, n_embed = embed.shape[0], embed.shape[1]
    residual = z
    ranks = []
    for q in range(num_q):
        e_q = embed[q]
        if pass1_dtype is not None:
            d1 = vq_distances(residual.astype(pass1_dtype),
                              e_q.astype(pass1_dtype)).astype(jnp.float32)
        else:
            d1 = vq_distances(residual, e_q)
        dex = vq_distances_exact(residual, e_q)
        true_idx = jnp.argmin(dex, axis=-1)
        d1_true = jnp.take_along_axis(d1, true_idx[..., None],
                                      axis=-1)[..., 0]
        below = jnp.sum((d1 < d1_true[..., None]).astype(jnp.int32),
                        axis=-1)
        ids = jnp.arange(n_embed)
        tie_before = jnp.sum(
            ((d1 == d1_true[..., None])
             & (ids < true_idx[..., None])).astype(jnp.int32), axis=-1)
        ranks.append(below + tie_before)
        quant = jnp.take(e_q, true_idx, axis=0)
        residual = residual - quant
    return jnp.stack(ranks, axis=-1).astype(jnp.int32)


def _straight_through(residual, quant):
    return residual + jax.lax.stop_gradient(quant - residual)


def rvq_forward_index(z: jnp.ndarray, params: dict,
                      flatten: bool = False,
                      exact_k: Optional[int] = None,
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Quantize-dequantize with indices (inference path).

    z: (B, T, D).  Returns (zq, idx) with zq (B, T, D) and idx (B, T, Q)
    int32; if `flatten`, layer-q indices are offset by q*N, the reference's
    wire format (ref: layers/vq_module.py:136-149).

    exact_k: when set, each layer's argmin runs the two-pass hardware-exact
    path (vq_nearest_2pass with a k-candidate shortlist); identical to the
    default on CPU, removes the RVQ-matmul contribution to index flips on
    TPU at ~no cost.
    """
    embed = params["embed"]
    num_q, n_embed = embed.shape[0], embed.shape[1]
    residual = z
    zq = jnp.zeros_like(z)
    idxs = []
    for q in range(num_q):
        if exact_k:
            idx = vq_nearest_2pass(residual, embed[q], k=exact_k)
        else:
            idx = vq_nearest(residual, embed[q])
        quant = jnp.take(embed[q], idx, axis=0)
        quant = _straight_through(residual, quant)
        residual = residual - quant
        zq = zq + quant
        idxs.append(idx + q * n_embed if flatten else idx)
    return zq, jnp.stack(idxs, axis=-1)


def rvq_lookup(idx: jnp.ndarray, params: dict,
               flattened: bool = False) -> jnp.ndarray:
    """Decode indices -> zq by codebook lookup + sum over quantizers.

    idx: (B, T, Q) int32.  Equivalent of the reference's flat-table
    `F.embedding(...).sum(0)` (ref: layers/vq_module.py:151-161).
    """
    embed = params["embed"]
    num_q, n_embed, dim = embed.shape
    if flattened:
        idx = idx - (jnp.arange(num_q, dtype=idx.dtype) * n_embed)
    flat = embed.reshape(num_q * n_embed, dim)
    off = idx + (jnp.arange(num_q, dtype=idx.dtype) * n_embed)
    return jnp.sum(jnp.take(flat, off, axis=0), axis=-2)


def rvq_forward(z: jnp.ndarray, params: dict, *, train: bool,
                decay: float = 0.8, eps: float = 1e-5,
                commitment: float = 1.0,
                axis_name: Optional[str] = None):
    """Training/eval forward: (zq, per-layer losses, perplexities, new_params).

    z: (B, T, D).  In training mode the EMA codebook update of the reference
    (ref: layers/vq_module.py:74-80) is applied functionally; statistics are
    `psum`ed over `axis_name` when given (data-parallel EMA).
    """
    embed = params["embed"]
    num_q, n_embed, dim = embed.shape
    flat_dim = z.shape[0] * z.shape[1] if z.ndim == 3 else z.shape[0]

    residual = z
    zq = jnp.zeros_like(z)
    losses, perplexities = [], []
    new_cluster = []
    new_avg = []
    new_embed = []
    for q in range(num_q):
        e_q = embed[q]
        idx = vq_nearest(residual, e_q)
        quant = jnp.take(e_q, idx, axis=0)

        flatten = residual.reshape(-1, dim)
        onehot = jax.nn.one_hot(idx.reshape(-1), n_embed, dtype=z.dtype)
        avg_probs = jnp.mean(onehot, axis=0)
        if axis_name is not None:
            avg_probs = jax.lax.pmean(avg_probs, axis_name)
        perplexities.append(
            jnp.exp(-jnp.sum(avg_probs * jnp.log(avg_probs + 1e-10))))

        # commitment loss: MSE(sg(quant), residual) (ref vq_module.py:82)
        losses.append(commitment * jnp.mean(
            jnp.square(jax.lax.stop_gradient(quant) - residual)))

        if train:
            onehot_sum = jnp.sum(onehot, axis=0)
            embed_sum = jnp.einsum("nd,ne->ed", flatten, onehot,
                                   preferred_element_type=jnp.float32)
            if axis_name is not None:
                onehot_sum = jax.lax.psum(onehot_sum, axis_name)
                embed_sum = jax.lax.psum(embed_sum, axis_name)
            onehot_sum = jax.lax.stop_gradient(onehot_sum)
            embed_sum = jax.lax.stop_gradient(embed_sum)
            cs = params["cluster_size"][q] * decay + (1 - decay) * onehot_sum
            ea = params["embed_avg"][q] * decay + (1 - decay) * embed_sum
            smoothed = (cs + eps) / (jnp.sum(cs) + n_embed * eps) * jnp.sum(cs)
            new_cluster.append(cs)
            new_avg.append(ea)
            new_embed.append(ea / smoothed[:, None])

        quant = _straight_through(residual, quant)
        residual = residual - quant
        zq = zq + quant

    if train:
        new_params = {
            "embed": jnp.stack(new_embed),
            "cluster_size": jnp.stack(new_cluster),
            "embed_avg": jnp.stack(new_avg),
        }
    else:
        new_params = params
    return zq, jnp.stack(losses), jnp.stack(perplexities), new_params
