"""Can the round-4 batch-fold speed up the TRAINING hot loop? (VERDICT r4
next-1: measure it, don't assert.)

The inference fold wins because at production length (10 s, 1600 frames)
the receptive-field halo is small relative to the chunk: encoder halo
7500 samples is 1.6% of 480000.  The training clip is 0.2 s (9600
samples / 32 code frames), where the same halos are 78% (encoder) and
88% (decoder) of the WHOLE clip — the analytic FLOP amplification of a
fold-F training forward is

    encoder: (T + F*7500) / T      = 2.56x at F=2, 4.13x at F=4
    decoder: (n + F*28) / n        = 2.75x at F=2, 4.50x at F=4

so the fold must deliver >2.5x better MXU tiling at F=2 just to break
even, against the measured 3.3x stack-only / 1.55-2.27x end-to-end gain
it achieves at production length.  This probe measures the actual
metric-phase step (fwd + grad of mel*45 + vq loss, B=16 x 9600) for the
direct path and fold variants, in-process, so the verdict is a number.

Usage: python tools/trainfold_probe.py [--cpu] [--folds 2 4]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from audiodec_tpu.utils.profiling import enable_compile_cache

enable_compile_cache()
import jax.numpy as jnp

from audiodec_tpu.models.autoencoder import (
    GeneratorConfig,
    generator_forward,
    generator_init,
    projector_apply,
)
from audiodec_tpu.models.fast import (
    decoder_apply_batchfold,
    encoder_apply_batchfold,
)
from audiodec_tpu.ops.vq import rvq_forward
from audiodec_tpu.train.criterion import build_criterion
from audiodec_tpu.utils.config import generator_config, load_config


def timeit(f, *args, n=10):
    y = f(*args)
    leaf = jax.tree_util.tree_leaves(y)[0]
    float(jnp.asarray(leaf).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        y = f(*args)
    leaf = jax.tree_util.tree_leaves(y)[0]
    float(jnp.asarray(leaf).ravel()[0])
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--folds", nargs="+", type=int, default=[2, 4])
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    config = load_config("configs/autoencoder/symAD_vctk_48000_hop300.yaml")
    gen_cfg = generator_config(config)
    crit = build_criterion(config)
    gen = generator_init(jax.random.PRNGKey(0), gen_cfg)

    B, T = 16, config.get("batch_length", 9600)
    x = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (B, T, 1),
                                jnp.float32)

    def fold_forward(params, x, enc_fold, dec_fold):
        """generator_forward with the batch-folds substituted (train-mode
        RVQ; the folds are reshapes/slices, fully differentiable)."""
        h = (encoder_apply_batchfold(params["encoder"], x, gen_cfg,
                                     fold=enc_fold) if enc_fold > 1
             else None)
        if h is None:
            from audiodec_tpu.models.autoencoder import encoder_apply
            h = encoder_apply(params["encoder"], x, gen_cfg)
        z = projector_apply(params["projector"], h, gen_cfg)
        zq, vqloss, ppl, _ = rvq_forward(z, params["quantizer"], train=True)
        if dec_fold > 1:
            y = decoder_apply_batchfold(params["decoder"], zq, gen_cfg,
                                        fold=dec_fold)
        else:
            from audiodec_tpu.models.autoencoder import decoder_apply
            y = decoder_apply(params["decoder"], zq, gen_cfg)
        return y, vqloss

    def make_step(enc_fold, dec_fold):
        def loss(gen):
            if enc_fold == 1 and dec_fold == 1:
                y, zq, z, vqloss, ppl, _ = generator_forward(
                    gen, x, gen_cfg, train=True)
            else:
                y, vqloss = fold_forward(gen, x, enc_fold, dec_fold)
            return crit["mel"](y, x) * 45.0 + vqloss.sum()

        @jax.jit
        def step(gen):
            l, g = jax.value_and_grad(loss)(gen)
            return l, jax.tree_util.tree_leaves(g)[0]

        @jax.jit
        def fwd(gen):
            return loss(gen)

        return fwd, step

    n_frames = T // gen_cfg.hop_length
    from audiodec_tpu.parallel.codec import (
        decoder_halo_frames,
        encoder_halo_samples,
    )
    h_enc, h_dec = encoder_halo_samples(gen_cfg), decoder_halo_frames(gen_cfg)

    variants = [("direct", 1, 1)]
    for f in args.folds:
        variants += [(f"fold{f}_enc", f, 1), (f"fold{f}_dec", 1, f),
                     (f"fold{f}_both", f, f)]
    for name, ef, df in variants:
        fwd, step = make_step(ef, df)
        amp_e = (T + ef * h_enc) / T if ef > 1 else 1.0
        amp_d = (n_frames + df * h_dec) / n_frames if df > 1 else 1.0
        t_f = timeit(fwd, gen, n=args.iters)
        t_s = timeit(step, gen, n=args.iters)
        print(f"{name:14s} fwd {t_f*1e3:7.2f} ms  fwd+bwd {t_s*1e3:7.2f} ms"
              f"  (flop amp enc {amp_e:.2f}x dec {amp_d:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
