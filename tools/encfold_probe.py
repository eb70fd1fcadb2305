"""A/B: direct f32 encoder+RVQ vs batch-folded encoder (round-4 lever #2).

Decoder-side batch-folding measured 1.55x (tools/decfold_probe.py); this
probes the encoder: fold the WAVEFORM axis into batch once,
(B, T, 1) -> (B*F, T/F + halo, 1) with an encoder_halo_samples() left halo
(hop-aligned so stride phases survive), run the whole encoder folded, trim
the halo frames, unfold, then projector+RVQ direct.  The encoder is purely
causal (no transposed convs), so chunk 0's zero halo IS batch semantics —
no head patch needed; interior chunks see real context.

The parity question this probe answers: the fold changes XLA's conv
algorithm/rounding at C=32 (f32 on TPU is one-pass-bf16 multiplies either
way — same numeric CLASS, different reassociation), so near-tie RVQ
argmins can flip vs the direct path.  Reports per-fold: encode time,
speedup, max |z| deviation, and index flip count vs the direct f32 path.
If flips stay in the existing ~4-5% near-tie band (the band the default
TPU path already flips vs the CPU reference — BENCHMARKS "numerics on
hardware"), folding both f32 and mixed modes keeps the mixed==f32 index
identity intact while speeding encode; --precision exact/highest stay
unfolded.

Usage: python tools/encfold_probe.py [--batch 16] [--folds 2 4 8 16]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp


def time_fn(f, x0, iters=6):
    @jax.jit
    def loop(x0):
        def body(i, s):
            y = f(x0 + s.astype(x0.dtype))
            return jnp.float32(1e-20) * y.ravel()[0].astype(jnp.float32) \
                + 0.0 * s
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(loop(x0))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(x0))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seconds", type=int, default=10)
    ap.add_argument("--folds", type=int, nargs="*", default=[2, 4, 8, 16])
    args = ap.parse_args()

    from audiodec_tpu.models.autoencoder import (
        GeneratorConfig, encoder_apply, generator_init, projector_apply,
    )
    from audiodec_tpu.ops.vq import rvq_forward_index
    from audiodec_tpu.parallel.codec import encoder_halo_samples

    cfg = GeneratorConfig()
    params = generator_init(jax.random.PRNGKey(0), cfg)
    hop = cfg.hop_length
    B, T = args.batch, args.seconds * 48000
    h_samp = encoder_halo_samples(cfg)
    h_fr = h_samp // hop
    x0 = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (B, T, 1),
                                 jnp.float32)

    def direct(x):
        hh = encoder_apply(params["encoder"], x, cfg)
        z = projector_apply(params["projector"], hh, cfg)
        _, idx = rvq_forward_index(z, params["quantizer"])
        return z, idx

    z_ref, idx_ref = jax.jit(direct)(x0)
    z_scale = float(jnp.max(jnp.abs(z_ref)))
    t_direct = time_fn(lambda x: direct(x)[1], x0)
    n_idx = int(idx_ref.size)
    print(json.dumps({
        "path": "direct", "B": B, "T": T,
        "ms": round(t_direct * 1e3, 2), "n_indices": n_idx,
    }), flush=True)

    for F in args.folds:
        if T % (F * hop):
            continue
        tc = T // F

        def folded(x, F=F, tc=tc):
            b = x.shape[0]
            xp = jnp.pad(x, ((0, 0), (h_samp, 0), (0, 0)))
            chunks = jnp.stack(
                [xp[:, i * tc:i * tc + tc + h_samp] for i in range(F)],
                axis=1).reshape(b * F, tc + h_samp, 1)
            hh = encoder_apply(params["encoder"], chunks, cfg)
            hh = hh[:, h_fr:, :]
            hh = hh.reshape(b, F * (tc // hop), hh.shape[-1])
            z = projector_apply(params["projector"], hh, cfg)
            _, idx = rvq_forward_index(z, params["quantizer"])
            return z, idx

        z_f, idx_f = jax.jit(folded)(x0)
        flips = int(jnp.sum(idx_f != idx_ref))
        zdev = float(jnp.max(jnp.abs(z_f - z_ref))) / z_scale
        t_fold = time_fn(lambda x, F=F, tc=tc: folded(x, F, tc)[1], x0)
        print(json.dumps({
            "path": "folded", "B": B, "T": T, "fold": F,
            "halo_samples": h_samp,
            "ms": round(t_fold * 1e3, 2),
            "speedup_vs_direct": round(t_direct / t_fold, 2),
            "idx_flips_vs_direct": flips,
            "flip_rate": float(f"{flips / n_idx:.2e}"),
            "z_rel_dev": float(f"{zdev:.3e}"),
        }), flush=True)


if __name__ == "__main__":
    main()
