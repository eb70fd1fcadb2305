"""Folded-time fused residual stack == XLA residual chain (interpret mode).

The folded kernel (ops/pallas/folded_stack.py) reshapes (T, C) to
(T/F, F*C) and runs each dilated causal conv as a block-Toeplitz sum of
full-lane matmuls.  These tests pin:
  - exact math (bf16_dots=False) against the XLA chain for every channel
    width / fold factor the codec uses, including ragged tile edges;
  - the fold-offset bookkeeping (halo sizes, offset sets);
  - the integrated folded encoder/decoder fast paths against the plain
    batch path (bf16-dot tolerance), and their use inside the full
    generator (RVQ indices unchanged on the golden checkpoint).
"""

import numpy as np

import jax
import jax.numpy as jnp
import pytest

from audiodec_tpu.models.autoencoder import (
    GeneratorConfig,
    _res_unit_apply,
    decoder_apply,
    encoder_apply,
    generator_init,
)
from audiodec_tpu.models.fast import (
    decoder_apply_folded,
    encoder_apply_folded,
)
from audiodec_tpu.ops.pallas.folded_stack import (
    _fold_offsets,
    fold_conv_weight,
    folded_residual_stack,
)


def _xla_stack(ups, x, dils):
    for (w1, w2), d in zip(ups, dils):
        x = _res_unit_apply({"conv1": w1, "conv2": w2}, x, dilation=d,
                            act=jax.nn.elu, mode="causal")
    return x


def _rand_units(key, c, k=7, n=3):
    ks = jax.random.split(key, 2 * n)
    return tuple(({"w": 0.3 * jax.random.normal(ks[2 * i], (k, c, c))},
                  {"w": 0.3 * jax.random.normal(ks[2 * i + 1], (1, c, c))})
                 for i in range(n))


@pytest.mark.parametrize("c,t,fold", [
    (32, 1920, 0),    # fold=0 exercises the auto default (F=4)
    (32, 1920, 4),
    (32, 1920, 16),
    (64, 960, 0),
    (128, 480, 0),
    (256, 512, 0),
    (32, 1800, 4),    # T/F=450: no aligned tile divisor (ragged sublanes)
    (32, 1799, 0),    # odd T: fold must pad, not degrade to F=1
    (64, 451, 2),     # odd T with explicit fold (pads to a multiple)
])
def test_folded_stack_matches_xla(c, t, fold):
    key = jax.random.PRNGKey(c + t + fold)
    ups = _rand_units(key, c)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, t, c))
    ref = _xla_stack(ups, x, (1, 3, 9))
    kp = tuple((u[0]["w"], u[1]["w"]) for u in ups)
    out = folded_residual_stack(x, kp, dilations=(1, 3, 9), tile_rows=128,
                                fold=fold, bf16_dots=False, interpret=True)
    # differences are pure f32 reduction-order noise (taps are summed per
    # folded row offset instead of per tap), relative to values of O(10)
    scale = float(np.max(np.abs(np.asarray(ref))))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=5e-5 * scale)


def test_folded_stack_bf16_dots_close():
    """bf16 multiplies stay within bf16-class error of the f32 chain (the
    same class as XLA's TPU conv emitter, which also multiplies in bf16)."""
    c, t = 32, 1920
    ups = _rand_units(jax.random.PRNGKey(0), c)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, t, c))
    ref = _xla_stack(ups, x, (1, 3, 9))
    kp = tuple((u[0]["w"], u[1]["w"]) for u in ups)
    out = folded_residual_stack(x, kp, dilations=(1, 3, 9), tile_rows=128,
                                bf16_dots=True, interpret=True)
    rel = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
    assert rel < 0.03


def test_fold_offsets_and_weights():
    # C=32, F=4, k=7: d=1 -> 3 offsets, d=3 -> 6, d=9 -> 12 (gaps where no
    # (lane phase, tap) pair lands)
    assert _fold_offsets(7, 1, 4) == [-2, -1, 0]
    assert len(_fold_offsets(7, 3, 4)) == 6
    offs9 = _fold_offsets(7, 9, 4)
    assert len(offs9) == 12 and offs9[0] == -14 and offs9[-1] == 0
    # F=1 degenerates to the tap offsets themselves
    assert _fold_offsets(7, 9, 1) == [-54, -45, -36, -27, -18, -9, 0]
    # every tap value appears exactly F times in the folded weights
    w = jnp.arange(7 * 2 * 2, dtype=jnp.float32).reshape(7, 2, 2) + 1
    wf = fold_conv_weight(w, 3, 4)
    assert wf.shape == (6, 8, 8)
    total = float(jnp.sum(wf))
    assert np.isclose(total, 4 * float(jnp.sum(w)))


def test_folded_encoder_decoder_match_plain():
    cfg = GeneratorConfig()
    params = generator_init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(0.3 * np.random.default_rng(0)
                    .standard_normal((1, 4 * 300, 1)).astype(np.float32))
    ref_h = encoder_apply(params["encoder"], x, cfg)
    out_h = encoder_apply_folded(params["encoder"], x, cfg, interpret=True)
    np.testing.assert_allclose(np.asarray(out_h), np.asarray(ref_h),
                               rtol=5e-2, atol=5e-3)
    z = jnp.asarray(0.3 * np.random.default_rng(1)
                    .standard_normal((1, 4, cfg.code_dim)).astype(np.float32))
    ref_y = decoder_apply(params["decoder"], z, cfg)
    out_y = decoder_apply_folded(params["decoder"], z, cfg, interpret=True)
    np.testing.assert_allclose(np.asarray(out_y), np.asarray(ref_y),
                               rtol=5e-2, atol=5e-3)


def test_folded_encoder_bit_exact_indices_vs_golden():
    """RVQ indices through the folded encoder equal the reference torch
    golden (the bf16-dot deviation does not flip nearest-codebook argmins
    on the golden data)."""
    import os

    from audiodec_tpu.models.autoencoder import projector_apply
    from audiodec_tpu.ops.vq import rvq_forward_index
    from audiodec_tpu.utils.torch_import import import_autoencoder

    golden = os.path.join(os.path.dirname(__file__), "golden",
                          "gen_symad.npz")
    data = np.load(golden)
    sd = {k[len("sd__"):]: data[k] for k in data.files
          if k.startswith("sd__")}
    cfg = GeneratorConfig()
    params = import_autoencoder(sd, cfg)
    x = jnp.asarray(data["x"].transpose(0, 2, 1))
    h = encoder_apply_folded(params["encoder"], x, cfg, interpret=True)
    z = projector_apply(params["projector"], h, cfg)
    _, idx = rvq_forward_index(z, params["quantizer"], flatten=True)
    np.testing.assert_array_equal(np.asarray(idx[0]).T, data["idx_stream"])


# ---------------------------------------------------------------------------
# generalized unit: HiFiGAN resblock (k2=k, LeakyReLU, biases)
# ---------------------------------------------------------------------------

def _xla_resblock(p_block, x, dils, slope):
    from audiodec_tpu.models.vocoder import _resblock_apply
    act = lambda v: jnp.where(v > 0, v, slope * v)
    return _resblock_apply(p_block, x, dilations=dils, groups=1,
                           use_additional=True, act=act)


def _rand_resblock(key, c, k, n, bias=True):
    ks = jax.random.split(key, 4 * n)
    p = {"convs1": [], "convs2": []}
    for i in range(n):
        c1 = {"w": 0.3 * jax.random.normal(ks[4 * i], (k, c, c))}
        c2 = {"w": 0.3 * jax.random.normal(ks[4 * i + 1], (k, c, c))}
        if bias:
            c1["b"] = 0.5 * jax.random.normal(ks[4 * i + 2], (c,))
            c2["b"] = 0.5 * jax.random.normal(ks[4 * i + 3], (c,))
        p["convs1"].append(c1)
        p["convs2"].append(c2)
    return p


@pytest.mark.parametrize("bias,tile", [(True, 128), (True, 64),
                                       (False, 128)])
def test_folded_resblock_matches_xla(bias, tile):
    """Vocoder-unit variant: second conv k2=k, LeakyReLU, biases.  Small
    tile_rows force multiple tiles so the halo path and the t<0 bias
    masking (tile 0) are both exercised."""
    c, t, k, dils, slope = 32, 1920, 11, (1, 3, 5), 0.1
    p = _rand_resblock(jax.random.PRNGKey(5), c, k, len(dils), bias)
    x = jax.random.normal(jax.random.PRNGKey(6), (2, t, c))
    ref = _xla_resblock(p, x, dils, slope)
    units = tuple((c1["w"], c2["w"])
                  for c1, c2 in zip(p["convs1"], p["convs2"]))
    biases = tuple((c1["b"], c2["b"])
                   for c1, c2 in zip(p["convs1"], p["convs2"])) if bias \
        else None
    out = folded_residual_stack(x, units, dilations=dils, kernel_size=k,
                                kernel_size2=k, act="leaky_relu",
                                act_param=slope, biases=biases,
                                tile_rows=tile, bf16_dots=False,
                                interpret=True)
    scale = float(np.max(np.abs(np.asarray(ref))))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=5e-5 * scale)


def test_vocoder_apply_folded_matches_plain():
    from audiodec_tpu.models.fast import vocoder_apply_folded
    from audiodec_tpu.models.vocoder import (VocoderConfig, vocoder_apply,
                                             vocoder_init)

    cfg = VocoderConfig(in_channels=16, channels=64,
                        upsample_scales=(5, 5, 4, 3),
                        upsample_kernel_sizes=(10, 10, 8, 6),
                        resblock_kernel_sizes=(11,),
                        resblock_dilations=((1, 3, 5),), groups=3,
                        nonlinear_activation_params=(
                            ("negative_slope", 0.1),))
    p = vocoder_init(jax.random.PRNGKey(2), cfg)
    zq = 0.5 * jax.random.normal(jax.random.PRNGKey(3), (2, 12, 16))
    ref = vocoder_apply(p, zq, cfg)
    out = vocoder_apply_folded(p, zq, cfg, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_vocoder_apply_folded_mrf_matches_plain():
    from audiodec_tpu.models.fast import vocoder_apply_folded
    from audiodec_tpu.models.vocoder import (VocoderConfig, vocoder_apply,
                                             vocoder_init)

    cfg = VocoderConfig(in_channels=16, channels=64,
                        upsample_scales=(5, 5, 4, 3),
                        upsample_kernel_sizes=(10, 10, 8, 6),
                        resblock_kernel_sizes=(3, 7),
                        resblock_dilations=((1, 3), (1, 3)), groups=1,
                        nonlinear_activation_params=(
                            ("negative_slope", 0.1),))
    p = vocoder_init(jax.random.PRNGKey(4), cfg)
    zq = 0.5 * jax.random.normal(jax.random.PRNGKey(5), (2, 12, 16))
    ref = vocoder_apply(p, zq, cfg)
    out = vocoder_apply_folded(p, zq, cfg, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_int8_folded_stack_close_to_f32():
    """int8-dot quantized kernel (decode mode): per-lane weight scales +
    per-row dynamic activation scales keep the stack within ~1e-3 of the
    f32 XLA chain (interpret mode; hardware A/B in tools/folded_probe.py
    --int8)."""
    import jax
    from audiodec_tpu.models.autoencoder import (GeneratorConfig,
                                                 _res_unit_apply,
                                                 generator_init)
    from audiodec_tpu.ops.pallas.folded_stack import (folded_residual_stack,
                                                      res_stack_params)

    cfg = GeneratorConfig()
    params = generator_init(jax.random.PRNGKey(0), cfg)
    for bi, scale in ((0, 1.0), (1, 4.0)):  # C=32 (fold 4) and C=64 (fold 2)
        bp = params["encoder"]["blocks"][bi]
        C = bp["res"][0]["conv1"]["w"].shape[1]
        x = jnp.asarray(scale * np.random.default_rng(bi)
                        .standard_normal((2, 900, C)).astype(np.float32))
        v = x
        for d, u in zip(cfg.res_dilations, bp["res"]):
            v = _res_unit_apply(u, v, dilation=d, act=cfg.act, mode="causal")
        ref = np.asarray(v)
        out = np.asarray(folded_residual_stack(
            x, res_stack_params(bp), interpret=True, int8_dots=True))
        rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
        assert rel < 2e-3, f"C={C}: int8 rel err {rel:.2e}"
        # exact zero propagation before t=0 is preserved (no bias case)
        assert np.isfinite(out).all()
        # scalar-per-tile activation scale (int32 offset accumulation):
        # coarser quantization, same contract (measured slightly larger
        # deviation; hardware A/B in tools/folded_probe.py --int8)
        outt = np.asarray(folded_residual_stack(
            x, res_stack_params(bp), interpret=True, int8_dots=True,
            int8_scale="tile"))
        relt = np.abs(outt - ref).max() / (np.abs(ref).max() + 1e-9)
        assert relt < 5e-3, f"C={C}: int8-tile rel err {relt:.2e}"
