"""A/B: direct full decoder vs batch-folded full decoder (round-4 lever).

Extends tools/batchfold_probe.py from a single residual stack to the WHOLE
symAD decoder: fold the code-frame axis into batch ONCE at the cheap
(B, n_frames, Q) index level with a decoder_halo_frames() left halo of
real context (the chunk-halo recipe of parallel/codec.py, reshape instead
of ppermute), run the full decoder at (B*F, n/F + halo) — which re-tiles
the dominant C=32 stack at T=480000 onto the MXU — and unfold the output
waveform once, patching the first halo*hop samples with an unsharded
head decode (same two reasons as parallel/codec.py dec_head: index-0 halo
!= zero activations, and batch-mode CausalConvTranspose1d ReplicationPad).

Decoder-side only: in the production mixed mode the decoder rides bf16 and
cannot influence RVQ indices, so a bf16-class reassociation is within the
mode's contract; the f32 encoder/RVQ parity path is untouched.

Prints per-F JSON with direct vs folded ms, speedup, and max deviation vs
the f32 reference decode (quality guard: the folded bf16 error must stay
at the direct-bf16 error level).

Usage: python tools/decfold_probe.py [--batch 16] [--folds 2 4 8]
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
    ap.add_argument("--folds", type=int, nargs="*", default=[2, 4, 8])
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--vocoder", default=None, choices=["v1", "v2"],
                    help="probe the AD v1/v2 HiFiGAN vocoder receiver "
                         "instead of the symAD mirror decoder "
                         "(models/fast.vocoder_apply_batchfold)")
    args = ap.parse_args()

    from audiodec_tpu.models.autoencoder import (
        GeneratorConfig, decoder_apply, encoder_apply, generator_init,
        projector_apply,
    )
    from audiodec_tpu.ops.vq import rvq_forward_index, rvq_lookup
    from audiodec_tpu.parallel.codec import decoder_halo_frames

    cfg = GeneratorConfig()
    params = generator_init(jax.random.PRNGKey(0), cfg)
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    def cast(tree):
        return jax.tree_util.tree_map(
            lambda a: a.astype(dt) if a.dtype == jnp.float32 else a, tree)

    hop = cfg.hop_length
    B = args.batch
    T = args.seconds * 48000
    n = T // hop

    if args.vocoder:
        from audiodec_tpu.models.fast import vocoder_apply_batchfold
        from audiodec_tpu.models.vocoder import vocoder_apply, vocoder_init
        from audiodec_tpu.parallel.codec import vocoder_halo_frames
        from audiodec_tpu.utils.config import generator_config, load_config

        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        vc = load_config(os.path.join(
            root, "configs", "vocoder",
            f"AudioDec_{args.vocoder}_symAD_vctk_48000_hop300_clean.yaml"))
        voc_cfg = generator_config(vc)
        voc = vocoder_init(jax.random.PRNGKey(2), voc_cfg)
        voc_dt = cast(voc)
        h = vocoder_halo_frames(voc_cfg)

        def apply_f32(zq):
            return vocoder_apply(voc, zq, voc_cfg)

        def apply_direct(zq):
            return vocoder_apply(voc_dt, zq.astype(dt), voc_cfg)

        def apply_fold(zq, F):
            return vocoder_apply_batchfold(voc_dt, zq.astype(dt), voc_cfg,
                                           fold=F)
    else:
        from audiodec_tpu.models.fast import decoder_apply_batchfold
        from audiodec_tpu.parallel.codec import decoder_halo_frames

        dec_params = cast(params["decoder"])
        h = decoder_halo_frames(cfg)

        def apply_f32(zq):
            return decoder_apply(params["decoder"], zq, cfg)

        def apply_direct(zq):
            return decoder_apply(dec_params, zq.astype(dt), cfg)

        def apply_fold(zq, F):
            return decoder_apply_batchfold(dec_params, zq.astype(dt), cfg,
                                           fold=F)

    # realistic codes: encode a synthetic batch once (outside timing)
    x0 = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (B, T, 1),
                                 jnp.float32)

    @jax.jit
    def enc(x):
        hh = encoder_apply(params["encoder"], x, cfg)
        z = projector_apply(params["projector"], hh, cfg)
        _, idx = rvq_forward_index(z, params["quantizer"])
        return rvq_lookup(idx, params["quantizer"])

    zq0 = jax.block_until_ready(enc(x0))

    def direct(zq):
        return apply_direct(zq).astype(jnp.float32)

    y_ref = jax.jit(apply_f32)(zq0)  # f32 quality anchor
    ref_scale = float(jnp.max(jnp.abs(y_ref)))
    y_direct = jax.jit(direct)(zq0)
    err_direct = float(jnp.max(jnp.abs(y_direct - y_ref))) / ref_scale
    t_direct = time_fn(direct, zq0)
    print(json.dumps({
        "path": "direct", "dtype": args.dtype, "B": B, "T": T,
        "vocoder": args.vocoder, "ms": round(t_direct * 1e3, 2),
        "rel_err_vs_f32": float(f"{err_direct:.3e}"),
    }), flush=True)

    for F in args.folds:
        if n % F:
            continue

        def folded(zq, F=F):
            return apply_fold(zq, F).astype(jnp.float32)

        y_fold = jax.jit(folded)(zq0)
        err_fold = float(jnp.max(jnp.abs(y_fold - y_ref))) / ref_scale
        # deviation from the direct same-dtype path (0 on CPU/f32)
        dev = float(jnp.max(jnp.abs(y_fold - y_direct))) / ref_scale
        t_fold = time_fn(folded, zq0)
        print(json.dumps({
            "path": "folded", "dtype": args.dtype, "B": B, "T": T,
            "vocoder": args.vocoder, "fold": F, "halo_frames": h,
            "ms": round(t_fold * 1e3, 2),
            "speedup_vs_direct": round(t_direct / t_fold, 2),
            "rel_err_vs_f32": float(f"{err_fold:.3e}"),
            "rel_dev_vs_direct": float(f"{dev:.3e}"),
        }), flush=True)


if __name__ == "__main__":
    main()
