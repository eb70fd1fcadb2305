"""Model sizes match the reference's published parameter counts.

The reference publishes exact generator parameter counts in
About/README.md:15-34 (encoder 3,806,368 / decoder 4,035,264 / vocoder v0
12,932,610 / v1 19,461,090 / v2 6,927,330).  Torch counts trainable
parameters only: RVQ codebooks and vocoder input-normalization stats are
buffers, and the vocoders train weight-norm reparametrized (weight_g +
weight_v both count).  These tests pin our architectures — built from the
ported configs — to those exact counts, in the same accounting.
"""

import numpy as np

import jax

from audiodec_tpu.models.autoencoder import GeneratorConfig, generator_init
from audiodec_tpu.models.vocoder import vocoder_init
from audiodec_tpu.ops.norms import apply_weight_norm_tree
from audiodec_tpu.utils.config import generator_config, load_config


def n_params(tree):
    return sum(int(np.prod(a.shape)) for a in jax.tree_util.tree_leaves(tree))


def test_symad_autoencoder_param_counts():
    p = generator_init(jax.random.PRNGKey(0), GeneratorConfig())
    assert n_params(p["encoder"]) == 3_806_368   # ref About/README.md:20-22
    assert n_params(p["decoder"]) == 4_035_264   # ref About/README.md:23-26
    assert n_params(p["projector"]) == 98_304    # 512*64*3 (k=3, no bias)


def test_vocoder_param_counts():
    published = {  # ref About/README.md:27-34 (weight-normed generators)
        "AudioDec_v0_symAD_vctk_48000_hop300_clean": 12_932_610,
        "AudioDec_v1_symAD_vctk_48000_hop300_clean": 19_461_090,
        "AudioDec_v2_symAD_vctk_48000_hop300_clean": 6_927_330,
    }
    for name, want in published.items():
        cfg = generator_config(load_config(f"configs/vocoder/{name}.yaml"))
        p = vocoder_init(jax.random.PRNGKey(0), cfg)
        tp = tuple(f"upsamples/{i}"
                   for i in range(len(cfg.upsample_scales)))
        p = apply_weight_norm_tree(p, transposed_paths=tp)
        # input-normalization stats are torch buffers, not parameters
        got = n_params(p) - n_params(p.get("mean", ())) \
            - n_params(p.get("scale", ()))
        assert got == want, f"{name}: {got} != {want}"
