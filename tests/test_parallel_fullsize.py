"""The SHIPPING full-size symAD config through the sharded paths.

tests/test_parallel.py proves the halo/TP math on small models; this module
executes the canonical symAD_vctk_48000_hop300 architecture (encode
channels 32, code_dim 64, 8x1024 codebooks — ref
config/autoencoder/symAD_vctk_48000_hop300.yaml:28-44) and the full-size
AD-v1 vocoder (channels 512, ref
config/vocoder/AudioDec_v1_symAD_vctk_48000_hop300_clean.yaml:28-45)
through make_sharded_codec (data x seq chunk-halo) and make_tp_codec
(channel parallel) on the 8-virtual-device CPU mesh, asserting the sharded
graphs compile, execute, and reproduce the unsharded indices bit-exactly.

Slow (~minutes on CPU): the point is that the production-size sharded
graphs actually run somewhere, not just at toy widths.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiodec_tpu.models.autoencoder import (
    GeneratorConfig,
    decoder_apply,
    encoder_apply,
    generator_init,
    projector_apply,
)
from audiodec_tpu.models.vocoder import (
    VocoderConfig,
    vocoder_apply,
    vocoder_init,
)
from audiodec_tpu.ops.vq import rvq_forward_index, rvq_lookup
from audiodec_tpu.parallel import (
    encoder_halo_samples,
    make_mesh,
    make_sharded_codec,
)

FULL = GeneratorConfig()  # canonical symAD full size
VOC_V1 = VocoderConfig(in_channels=64, channels=512,
                       upsample_scales=(5, 5, 4, 3),
                       upsample_kernel_sizes=(10, 10, 8, 6),
                       resblock_kernel_sizes=(11,),
                       resblock_dilations=((1, 3, 5),),
                       groups=3, stats=False)


@pytest.fixture(scope="module")
def setup():
    params = generator_init(jax.random.PRNGKey(0), FULL)
    hop = FULL.hop_length
    seq = 4
    # per-shard chunk must cover the full 7209-sample receptive field
    halo = encoder_halo_samples(FULL)
    chunk = ((halo // hop) + 4) * hop
    T = seq * chunk
    assert chunk >= halo
    x = jnp.asarray(0.3 * np.random.default_rng(1)
                    .standard_normal((2, T, 1)).astype(np.float32))
    return params, x


def _unsharded_idx(params, x):
    h = encoder_apply(params["encoder"], x, FULL)
    z = projector_apply(params["projector"], h, FULL)
    _, idx = rvq_forward_index(z, params["quantizer"])
    return idx


def test_fullsize_sharded_codec_bit_exact(setup):
    params, x = setup
    mesh = make_mesh(data=2, seq=4)
    encode, decode = make_sharded_codec(mesh, params, FULL)

    idx_ref = _unsharded_idx(params, x)
    idx = encode(x)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_ref))

    zq_ref = rvq_lookup(idx_ref, params["quantizer"])
    y_ref = decoder_apply(params["decoder"], zq_ref, FULL)
    y = decode(idx)
    # with the shard-0 ReplicationPad head patch the sharded decode is
    # exact to f32 rounding (measured 1.2e-10 on this config)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-6, atol=1e-7)


def test_fullsize_sharded_vocoder_decode(setup):
    params, x = setup
    voc = vocoder_init(jax.random.PRNGKey(3), VOC_V1)
    mesh = make_mesh(data=2, seq=4)
    encode, decode = make_sharded_codec(mesh, params, FULL,
                                        vocoder=(voc, VOC_V1))
    idx = encode(x)
    zq = rvq_lookup(idx, params["quantizer"])
    y_ref = vocoder_apply(voc, zq, VOC_V1)
    y = decode(idx)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


def test_fullsize_sharded_training_step(setup):
    """The canonical config's DP TRAINING graph executes on the 8-device
    mesh: one metric + one adversarial step of full symAD (8.99M params)
    + the full HiFiGAN MSD+MPD discriminator from the shipping YAML,
    through shard_steps (psum'd grads + EMA codebooks, ref
    layers/vq_module.py:74-80 under DP).  Asserts finite losses and that
    the DP-sharded update matches the unsharded full-batch update (same
    global batch): grads are pmean'd over equal shards and EMA stats are
    psum'd sums, so DP == single-device up to float reassociation."""
    import os

    from audiodec_tpu.models.discriminators import (
        hifigan_discriminator_apply,
        hifigan_discriminator_init,
    )
    from audiodec_tpu.train.criterion import build_criterion
    from audiodec_tpu.train.optim import make_optimizer
    from audiodec_tpu.train.steps import make_autoencoder_steps, shard_steps
    from audiodec_tpu.utils.config import (
        discriminator_config,
        generator_config,
        load_config,
    )

    cfg_path = os.path.join(os.path.dirname(__file__), "..", "configs",
                            "autoencoder", "symAD_vctk_48000_hop300.yaml")
    config = load_config(cfg_path)
    gen_cfg = generator_config(config)
    assert gen_cfg.encode_channels == FULL.encode_channels  # shipping size
    disc_cfg = discriminator_config(config)
    crit = build_criterion(config)
    gen_opt = make_optimizer(config, "generator")
    disc_opt = make_optimizer(config, "discriminator")

    gen = generator_init(jax.random.PRNGKey(0), gen_cfg)
    disc = hifigan_discriminator_init(jax.random.PRNGKey(1), disc_cfg)

    def disc_apply(p, x):
        return hifigan_discriminator_apply(p, x, disc_cfg)

    state = {"gen": gen, "disc": disc, "gen_opt": gen_opt.init(gen),
             "disc_opt": disc_opt.init(disc)}

    # one hop-multiple batch: 8 rows (1 per device) x batch_length samples
    bl = int(config["batch_length"])
    x = jnp.asarray(0.1 * np.random.default_rng(7)
                    .standard_normal((8, bl, 1)).astype(np.float32))

    sharded = shard_steps(
        make_autoencoder_steps(gen_cfg, disc_apply, config, crit,
                               gen_opt, disc_opt, axis_name="data",
                               jit=False),
        make_mesh(data=8), "data")
    plain = make_autoencoder_steps(gen_cfg, disc_apply, config, crit,
                                   gen_opt, disc_opt, axis_name=None,
                                   jit=False)

    def tree_allclose(a, b, rtol, atol, what):
        fa = jax.tree_util.tree_leaves(a)
        fb = jax.tree_util.tree_leaves(b)
        assert len(fa) == len(fb)
        for la, lb in zip(fa, fb):
            np.testing.assert_allclose(np.asarray(la, np.float64),
                                       np.asarray(lb, np.float64),
                                       rtol=rtol, atol=atol, err_msg=what)

    def tree_matches_to_float_noise(a, b, lr_budget, what):
        """Same gate structure as test_train_step_parity._tree_close: a
        systematic divergence (wrong psum/EMA semantics) moves the whole
        distribution, while float reassociation across the shard seams can
        flip ISOLATED near-tie Adam steps by up to ~lr (measured here:
        1 element in 1.3M at 4.6e-6)."""
        fa = jax.tree_util.tree_leaves(a)
        fb = jax.tree_util.tree_leaves(b)
        assert len(fa) == len(fb)
        for la, lb in zip(fa, fb):
            d = np.abs(np.asarray(la, np.float64) - np.asarray(lb,
                                                               np.float64))
            assert float(np.median(d)) <= 5e-7, what
            assert float(np.quantile(d, 0.99)) <= 5e-6, what
            assert float(d.max()) <= 1.05 * lr_budget, what

    # metric step: full generator fwd/bwd + EMA under psum
    s_dp, rec_dp = sharded["metric"](state, x)
    s_ref, rec_ref = plain["metric"](state, x)
    assert all(np.isfinite(float(v)) for v in rec_dp.values())
    np.testing.assert_allclose(float(rec_dp["generator_loss"]),
                               float(rec_ref["generator_loss"]),
                               rtol=1e-5)
    gen_lr = float(config["generator_optimizer_params"]["lr"])
    dp_no_q = {k: v for k, v in s_dp["gen"].items() if k != "quantizer"}
    ref_no_q = {k: v for k, v in s_ref["gen"].items() if k != "quantizer"}
    tree_matches_to_float_noise(
        dp_no_q, ref_no_q, 2 * gen_lr,
        "DP metric step must match unsharded full-batch step")
    # quantizer EMA state: a near-tie argmin that flips under float
    # reassociation reroutes one code ASSIGNMENT, moving that codebook
    # row by ~(1-decay)*|z| — legitimate isolated divergence, so gate by
    # sparsity + scale instead of float noise
    for la, lb in zip(jax.tree_util.tree_leaves(s_dp["gen"]["quantizer"]),
                      jax.tree_util.tree_leaves(s_ref["gen"]["quantizer"])):
        d = np.abs(np.asarray(la, np.float64) - np.asarray(lb, np.float64))
        frac = float((d > 1e-6).mean())
        assert frac <= 1e-3, f"quantizer EMA diverges broadly ({frac:.2e})"
        assert float(d.max()) <= 0.05, f"quantizer EMA jump {d.max():.2e}"

    # adversarial step: full MSD+MPD fwd/bwd, disc update, frozen encoder
    s_dp2, rec_dp2 = sharded["adv"](s_dp, x)
    assert all(np.isfinite(float(v)) for v in rec_dp2.values())
    # encoder/projector/quantizer frozen in the efficient paradigm
    tree_allclose(s_dp2["gen"]["encoder"], s_dp["gen"]["encoder"],
                  0, 0, "adv step must not move the encoder")
    # discriminator actually moved
    d0 = jax.tree_util.tree_leaves(s_dp["disc"])[0]
    d1 = jax.tree_util.tree_leaves(s_dp2["disc"])[0]
    assert float(jnp.max(jnp.abs(d1 - d0))) > 0


def test_fullsize_tensor_parallel_codec(setup):
    from jax.sharding import PartitionSpec as P

    from audiodec_tpu.parallel import (
        generator_tp_specs,
        make_tp_codec,
        make_tp_mesh,
    )

    params, x = setup
    mesh = make_tp_mesh(data=2, model=4)
    specs = generator_tp_specs(params, FULL, 4)
    # the full-size plan must actually shard the residual stacks
    unit0 = specs["encoder"]["blocks"][0]["res"][0]
    assert unit0["conv1"]["w"] == P(None, None, "model")
    assert unit0["conv2"]["w"] == P(None, "model", None)

    encode, decode = make_tp_codec(mesh, params, FULL)
    idx_ref = _unsharded_idx(params, x)
    idx = encode(x)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_ref))

    zq_ref = rvq_lookup(idx_ref, params["quantizer"])
    y_ref = decoder_apply(params["decoder"], zq_ref, FULL)
    y = decode(idx)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)
