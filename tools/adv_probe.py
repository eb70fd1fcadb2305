"""Adversarial-step cost breakdown on the chip.

Decomposes the ~64 ms adv train step (B=16 x 9600, canonical symAD +
HiFiGAN MSD+MPD) into: generator forward, discriminator forward,
generator backward (mel+VQ+adv+FM through the frozen disc), discriminator
backward — to find where a fused/folded kernel would pay.

Round-5 extension: --batched A/Bs the stacked one-conv-per-layer
MSD/MPD variants (models/discriminators.{msd,mpd}_apply_batched) against
the sequential applies in the same process (VERDICT r4 next-2: measure,
don't assert).

Usage: python tools/adv_probe.py [--batched]
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax

from audiodec_tpu.utils.profiling import enable_compile_cache

enable_compile_cache()
import jax.numpy as jnp

from audiodec_tpu.models.autoencoder import (
    GeneratorConfig, generator_forward, generator_init)
from audiodec_tpu.models.discriminators import (
    hifigan_discriminator_apply, hifigan_discriminator_init)
from audiodec_tpu.ops.norms import resolve_params
from audiodec_tpu.train.criterion import build_criterion
from audiodec_tpu.utils.config import (
    discriminator_config, generator_config, load_config)


def timeit(f, *args, n=10):
    y = f(*args)
    jax.tree_util.tree_map(lambda a: a.block_until_ready(), y)
    # fetch a scalar as the reliable sync through the tunnel
    leaf = jax.tree_util.tree_leaves(y)[0]
    float(jnp.asarray(leaf).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        y = f(*args)
    leaf = jax.tree_util.tree_leaves(y)[0]
    float(jnp.asarray(leaf).ravel()[0])
    return (time.perf_counter() - t0) / n


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--batched", action="store_true",
                    help="also time the batched (stacked) MSD/MPD variants")
    args = ap.parse_args()
    config = load_config("configs/autoencoder/symAD_vctk_48000_hop300.yaml")
    gen_cfg = generator_config(config)
    disc_cfg = discriminator_config(config)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    gen = generator_init(k1, gen_cfg)
    disc = hifigan_discriminator_init(k2, disc_cfg)
    crit = build_criterion(config)

    B, T = 16, 9600
    x = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (B, T, 1),
                                jnp.float32)

    @jax.jit
    def gen_fwd(gen, x):
        y, zq, z, vqloss, ppl, aux = generator_forward(gen, x, gen_cfg,
                                                       train=True)
        return y

    from functools import partial

    @partial(jax.jit, static_argnums=2)
    def disc_fwd(disc, y, batched=False):
        eff, _ = resolve_params(disc)
        outs = hifigan_discriminator_apply(eff, y, disc_cfg,
                                           batched=batched)
        return [o[-1] for o in outs]

    y = gen_fwd(gen, x)

    @partial(jax.jit, static_argnums=3)
    def gen_bwd(gen, disc, x, batched=False):
        disc_eff, _ = resolve_params(disc)

        def loss(gen):
            y, zq, z, vqloss, ppl, aux = generator_forward(
                gen, x, gen_cfg, train=True)
            p_ = hifigan_discriminator_apply(disc_eff, y, disc_cfg,
                                             batched=batched)
            p = hifigan_discriminator_apply(disc_eff, x, disc_cfg,
                                            batched=batched)
            adv = crit["gen_adv"](p_)
            fm = crit["feat_match"](p_, p)
            mel = crit["mel"](y, x)
            return mel * 45.0 + vqloss.sum() + adv + 2.0 * fm
        g = jax.grad(loss)(gen)
        return jax.tree_util.tree_leaves(g)[0]

    @partial(jax.jit, static_argnums=3)
    def disc_bwd(disc, x, y, batched=False):
        def loss(disc):
            eff, _ = resolve_params(disc)
            p = hifigan_discriminator_apply(eff, x, disc_cfg,
                                            batched=batched)
            p_ = hifigan_discriminator_apply(eff,
                                             jax.lax.stop_gradient(y),
                                             disc_cfg,
                                             batched=batched)
            real, fake = crit["dis_adv"](p_, p)
            return real + fake
        g = jax.grad(loss)(disc)
        return jax.tree_util.tree_leaves(g)[0]

    @jax.jit
    def mel_only_bwd(gen, x):
        def loss(gen):
            y, zq, z, vqloss, ppl, aux = generator_forward(
                gen, x, gen_cfg, train=True)
            return crit["mel"](y, x) * 45.0 + vqloss.sum()
        g = jax.grad(loss)(gen)
        return jax.tree_util.tree_leaves(g)[0]

    cases = [("gen_fwd", gen_fwd, (gen, x)),
             ("disc_fwd", disc_fwd, (disc, y)),
             ("mel_vq_bwd(gen)", mel_only_bwd, (gen, x)),
             ("gen_bwd(full adv)", gen_bwd, (gen, disc, x)),
             ("disc_bwd", disc_bwd, (disc, x, y))]
    if args.batched:
        cases += [("disc_fwd[batched]", disc_fwd, (disc, y, True)),
                  ("gen_bwd[batched]", gen_bwd, (gen, disc, x, True)),
                  ("disc_bwd[batched]", disc_bwd, (disc, x, y, True))]
    for name, f, fargs in cases:
        dt = timeit(f, *fargs)
        print(f"{name:20s} {dt*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
