"""RVQ parity vs a torch oracle implementing the reference's EMA-VQ math
(spec: ref layers/vq_module.py:19-161)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from audiodec_tpu.ops.vq import (
    rvq_forward,
    rvq_forward_index,
    rvq_init,
    rvq_lookup,
    vq_nearest,
    vq_nearest_2pass,
)

RNG = np.random.default_rng(42)
Q, N, D = 4, 32, 8


def torch_vq_forward_index(z, embeds, flatten=False):
    """Oracle for the reference's ResidualVQ.forward_index."""
    residual = torch.tensor(z.reshape(-1, D))
    zq = torch.zeros_like(residual)
    idxs = []
    for q in range(Q):
        embed = torch.tensor(embeds[q].T)  # (D, N) like ref
        flat = residual
        dist = (flat.pow(2).sum(1, keepdim=True) - 2 * flat @ embed
                + embed.pow(2).sum(0, keepdim=True))
        _, ind = (-dist).max(1)
        quant = F.embedding(ind, embed.t())
        residual = residual - quant
        zq = zq + quant
        idxs.append(ind.numpy() + (q * N if flatten else 0))
    return zq.numpy(), np.stack(idxs, -1)


@pytest.fixture(scope="module")
def params():
    return rvq_init(jax.random.PRNGKey(0), Q, N, D)


def test_nearest_ties_lowest_index():
    embed = jnp.asarray(np.stack([np.ones(D), np.ones(D), np.zeros(D)])
                        .astype(np.float32))
    z = jnp.ones((1, D), dtype=jnp.float32)
    assert int(vq_nearest(z, embed)[0]) == 0


def test_nearest_2pass_equals_single_pass_on_cpu():
    """On CPU every precision is true f32, so the two-pass shortlist
    re-score must reproduce the single-pass argmin exactly (the modes only
    diverge on TPU hardware, where pass 2 restores f32 multiplies)."""
    rng = np.random.default_rng(7)
    embed = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
    z = jnp.asarray(rng.standard_normal((3, 11, D)).astype(np.float32))
    for k in (1, 4, 16, N):
        np.testing.assert_array_equal(
            np.asarray(vq_nearest_2pass(z, embed, k=k)),
            np.asarray(vq_nearest(z, embed)))


def test_nearest_2pass_ties_lowest_index():
    """Exact-tie candidates resolve to the lowest codebook index, matching
    torch's (-dist).max(1) first-maximal rule even when top_k ordered the
    shortlist differently."""
    rng = np.random.default_rng(8)
    base = rng.standard_normal((N, D)).astype(np.float32)
    base[9] = base[3]  # duplicate rows -> exact distance ties
    base[21] = base[3]
    embed = jnp.asarray(base)
    z = jnp.asarray(base[3][None] + 1e-3)
    assert int(vq_nearest_2pass(z, embed, k=8)[0]) == 3


def test_forward_index_exact_k_matches_oracle(params):
    """exact_k routes every layer through the two-pass argmin; indices and
    zq must still match the torch oracle bit-for-bit on CPU."""
    z = RNG.standard_normal((2, 5, D)).astype(np.float32)
    zq_ref, idx_ref = torch_vq_forward_index(z, np.asarray(params["embed"]))
    zq, idx = rvq_forward_index(jnp.asarray(z), params, exact_k=8)
    np.testing.assert_array_equal(np.asarray(idx).reshape(-1, Q), idx_ref)
    np.testing.assert_allclose(np.asarray(zq).reshape(-1, D), zq_ref,
                               rtol=0, atol=1e-6)


@pytest.mark.parametrize("flatten", [False, True])
def test_forward_index_matches_oracle(params, flatten):
    z = RNG.standard_normal((2, 6, D)).astype(np.float32)
    embeds = np.asarray(params["embed"])
    zq_ref, idx_ref = torch_vq_forward_index(z, embeds, flatten)
    zq, idx = rvq_forward_index(jnp.asarray(z), params, flatten=flatten)
    np.testing.assert_array_equal(np.asarray(idx).reshape(-1, Q), idx_ref)
    np.testing.assert_allclose(np.asarray(zq).reshape(-1, D), zq_ref,
                               rtol=1e-5, atol=1e-5)


def test_lookup_roundtrip(params):
    z = RNG.standard_normal((3, 5, D)).astype(np.float32)
    zq, idx = rvq_forward_index(jnp.asarray(z), params)
    out = rvq_lookup(idx, params)
    np.testing.assert_allclose(np.asarray(out), np.asarray(zq), rtol=1e-5,
                               atol=1e-5)
    # flattened wire format too
    _, fidx = rvq_forward_index(jnp.asarray(z), params, flatten=True)
    out2 = rvq_lookup(fidx, params, flattened=True)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(zq), rtol=1e-5,
                               atol=1e-5)


def test_eval_forward_matches_forward_index(params):
    """In eval mode forward == quantize-dequantize (ref vq_module.py:74)."""
    z = RNG.standard_normal((2, 7, D)).astype(np.float32)
    zq_e, _, _, new_p = rvq_forward(jnp.asarray(z), params, train=False)
    zq_i, _ = rvq_forward_index(jnp.asarray(z), params)
    np.testing.assert_allclose(np.asarray(zq_e), np.asarray(zq_i), rtol=1e-6)
    assert new_p is params


def test_ema_update_matches_oracle(params):
    """One training step of the EMA codebook update vs a torch oracle
    (spec: ref layers/vq_module.py:55-80)."""
    decay, eps = 0.8, 1e-5
    z = RNG.standard_normal((4, 10, D)).astype(np.float32)
    _, losses, ppl, new_p = rvq_forward(jnp.asarray(z), params, train=True,
                                        decay=decay, eps=eps)

    # torch oracle, layer by layer
    residual = torch.tensor(z.reshape(-1, D))
    cluster = torch.tensor(np.asarray(params["cluster_size"]))
    avg = torch.tensor(np.asarray(params["embed_avg"]))
    for q in range(Q):
        embed = torch.tensor(np.asarray(params["embed"][q]).T)  # (D, N)
        flat = residual
        dist = (flat.pow(2).sum(1, keepdim=True) - 2 * flat @ embed
                + embed.pow(2).sum(0, keepdim=True))
        _, ind = (-dist).max(1)
        onehot = F.one_hot(ind, N).float()
        quant = F.embedding(ind, embed.t())

        cs = cluster[q] * decay + (1 - decay) * onehot.sum(0)
        ea = avg[q] * decay + (1 - decay) * (flat.t() @ onehot).t()
        smoothed = (cs + eps) / (cs.sum() + N * eps) * cs.sum()
        embed_new = ea / smoothed.unsqueeze(1)

        np.testing.assert_allclose(np.asarray(new_p["cluster_size"][q]),
                                   cs.numpy(), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(new_p["embed_avg"][q]),
                                   ea.numpy(), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(new_p["embed"][q]),
                                   embed_new.numpy(), rtol=1e-4, atol=1e-5)

        loss_ref = F.mse_loss(quant, flat).item()
        np.testing.assert_allclose(float(losses[q]), loss_ref, rtol=1e-4)

        probs = onehot.mean(0)
        ppl_ref = torch.exp(-(probs * torch.log(probs + 1e-10)).sum()).item()
        np.testing.assert_allclose(float(ppl[q]), ppl_ref, rtol=1e-4)

        residual = residual - quant


def test_straight_through_gradient():
    """Only the first quantizer's gradient reaches z, and it is identity
    (ref: layers/vq_module.py:126-129 non-detached residual)."""
    params = rvq_init(jax.random.PRNGKey(1), Q, N, D)
    z = jnp.asarray(RNG.standard_normal((1, 3, D)).astype(np.float32))

    def f(z):
        zq, _, _, _ = rvq_forward(z, params, train=False)
        return jnp.sum(zq)

    g = jax.grad(f)(z)
    np.testing.assert_allclose(np.asarray(g), np.ones_like(np.asarray(g)),
                               rtol=1e-6)


def test_ema_data_parallel_matches_single_device(params):
    """psum'd EMA over a 2-way data mesh == single-device EMA on the
    concatenated batch (SURVEY.md §7 hard part 6)."""
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    z = RNG.standard_normal((4, 6, D)).astype(np.float32)
    _, _, _, ref_p = rvq_forward(jnp.asarray(z), params, train=True)

    mesh = Mesh(np.array(jax.devices()[:2]), ("data",))

    @jax.jit
    def sharded(z):
        def step(z):
            _, _, _, new_p = rvq_forward(z, params, train=True,
                                         axis_name="data")
            return new_p
        return shard_map(step, mesh=mesh, in_specs=P("data"),
                         out_specs=P())(z)

    new_p = sharded(jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(new_p["embed"]),
                               np.asarray(ref_p["embed"]), rtol=1e-4,
                               atol=1e-5)


def test_shortlist_ranks_zero_on_cpu(params):
    """On CPU pass-1 and exact distances are the same f32 math, so the
    true argmin always ranks 0 in pass 1 (the validator's fixed point)."""
    from audiodec_tpu.ops.vq import rvq_shortlist_ranks

    z = jnp.asarray(RNG.standard_normal((2, 9, D)).astype(np.float32))
    ranks = np.asarray(rvq_shortlist_ranks(z, params))
    assert ranks.shape == (2, 9, Q)
    assert (ranks == 0).all()


def _tight_params():
    """Codebooks whose entries cluster (near-tie distances), so a
    low-precision pass 1 genuinely reorders the argmin ranking."""
    rng = np.random.default_rng(123)
    base = rng.standard_normal((Q, 1, D))
    embed = (base + 3e-3 * rng.standard_normal((Q, N, D))).astype(np.float32)
    return {"embed": jnp.asarray(embed),
            "cluster_size": jnp.zeros((Q, N), jnp.float32),
            "embed_avg": jnp.asarray(embed)}


def test_shortlist_ranks_against_numpy_oracle():
    """Rank bookkeeping (strictly-below count + lowest-index tie rule) and
    exact-path residual threading vs a numpy oracle, with a genuinely
    perturbed pass 1 (pass1_dtype=float16 emulates the hardware's
    lower-precision first pass on CPU)."""
    from audiodec_tpu.ops.vq import (
        rvq_shortlist_ranks,
        vq_distances,
        vq_distances_exact,
    )

    params = _tight_params()
    z = jnp.asarray(RNG.standard_normal((3, 7, D)).astype(np.float32))
    ranks = np.asarray(rvq_shortlist_ranks(z, params,
                                           pass1_dtype=jnp.float16))

    # oracle: same distance functions, rank computed in numpy
    residual = z
    embed = params["embed"]
    want = []
    for q in range(Q):
        d1 = np.asarray(vq_distances(residual.astype(jnp.float16),
                                     embed[q].astype(jnp.float16)),
                        np.float32)
        dex = np.asarray(vq_distances_exact(residual, embed[q]))
        true_idx = dex.argmin(-1)
        d1_true = np.take_along_axis(d1, true_idx[..., None], -1)[..., 0]
        below = (d1 < d1_true[..., None]).sum(-1)
        ties = ((d1 == d1_true[..., None])
                & (np.arange(N) < true_idx[..., None])).sum(-1)
        want.append(below + ties)
        residual = residual - jnp.take(embed[q], true_idx, axis=0)
    want = np.stack(want, -1)
    np.testing.assert_array_equal(ranks, want)
    # the f16 perturbation must actually exercise nonzero ranks, or this
    # test proves nothing about the bookkeeping
    assert (want > 0).any()


def test_shortlist_rank_predicts_2pass_exactness():
    """The validator's contract: vq_nearest_2pass with k > rank recovers
    the true argmin (here with the same f16-perturbed pass 1)."""
    from audiodec_tpu.ops.vq import (
        rvq_shortlist_ranks,
        vq_distances_exact,
    )

    params = _tight_params()
    z = jnp.asarray(RNG.standard_normal((64, D)).astype(np.float32))
    embed = params["embed"][0]
    ranks = np.asarray(rvq_shortlist_ranks(z[None], params,
                                           pass1_dtype=jnp.float16))[0, :, 0]
    k = int(ranks.max()) + 1

    # a 2-pass variant whose pass 1 is the same f16 distances
    from audiodec_tpu.ops.vq import vq_distances as _vqd
    d1 = _vqd(z.astype(jnp.float16), embed.astype(jnp.float16))
    _, cand = jax.lax.top_k(-d1.astype(jnp.float32), k)
    e = jnp.take(embed, cand, axis=0)
    z2 = jnp.sum(jnp.square(z), axis=-1, keepdims=True)
    e2 = jnp.sum(jnp.square(e), axis=-1)
    cross = jnp.einsum("...d,...kd->...k", z, e,
                       precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)
    dk = z2 - 2.0 * cross + e2
    m = jnp.min(dk, axis=-1, keepdims=True)
    best = np.asarray(jnp.min(jnp.where(dk <= m, cand, N), axis=-1))

    true_idx = np.asarray(vq_distances_exact(z, embed)).argmin(-1)
    np.testing.assert_array_equal(best, true_idx)
