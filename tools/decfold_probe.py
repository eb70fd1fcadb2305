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
    dec_params = jax.tree_util.tree_map(
        lambda a: a.astype(dt) if a.dtype == jnp.float32 else a,
        params["decoder"])

    hop = cfg.hop_length
    B = args.batch
    T = args.seconds * 48000
    n = T // hop
    h = decoder_halo_frames(cfg)

    # realistic code indices: encode a synthetic batch once (outside timing)
    x0 = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (B, T, 1),
                                 jnp.float32)

    @jax.jit
    def enc(x):
        hh = encoder_apply(params["encoder"], x, cfg)
        z = projector_apply(params["projector"], hh, cfg)
        _, idx = rvq_forward_index(z, params["quantizer"])
        return idx

    idx = jax.block_until_ready(enc(x0))

    def direct(idx):
        zq = rvq_lookup(idx, params["quantizer"]).astype(dt)
        return decoder_apply(dec_params, zq, cfg).astype(jnp.float32)

    @jax.jit
    def direct_f32(idx):
        zq = rvq_lookup(idx, params["quantizer"])
        return decoder_apply(params["decoder"], zq, cfg)

    y_ref = direct_f32(idx)  # f32 quality anchor
    ref_scale = float(jnp.max(jnp.abs(y_ref)))
    y_direct = jax.jit(direct)(idx)
    err_direct = float(jnp.max(jnp.abs(y_direct - y_ref))) / ref_scale
    t_direct = time_fn(direct, idx)
    print(json.dumps({
        "path": "direct", "dtype": args.dtype, "B": B, "T": T,
        "ms": round(t_direct * 1e3, 2),
        "rel_err_vs_f32": float(f"{err_direct:.3e}"),
    }), flush=True)

    for F in args.folds:
        if n % F:
            continue
        nc = n // F

        def folded(idx, F=F, nc=nc):
            b = idx.shape[0]
            idxp = jnp.pad(idx, ((0, 0), (h, 0), (0, 0)))
            chunks = jnp.stack(
                [idxp[:, f * nc:f * nc + nc + h] for f in range(F)],
                axis=1).reshape(b * F, nc + h, idx.shape[-1])
            zq = rvq_lookup(chunks, params["quantizer"]).astype(dt)
            y = decoder_apply(dec_params, zq, cfg)
            y = y[:, h * hop:, :].reshape(b, F * nc * hop, 1)
            # head patch: first h*hop samples decoded unsharded (index-0
            # halo != zero activations; ReplicationPad on chunk 0)
            zq_h = rvq_lookup(idx[:, :min(2 * h, n)],
                              params["quantizer"]).astype(dt)
            head = decoder_apply(dec_params, zq_h, cfg)[:, :h * hop]
            y = jax.lax.dynamic_update_slice(y, head, (0, 0, 0))
            return y.astype(jnp.float32)

        y_fold = jax.jit(folded)(idx)
        err_fold = float(jnp.max(jnp.abs(y_fold - y_ref))) / ref_scale
        # deviation from the direct same-dtype path (0 on CPU/f32)
        dev = float(jnp.max(jnp.abs(y_fold - y_direct))) / ref_scale
        t_fold = time_fn(folded, idx)
        print(json.dumps({
            "path": "folded", "dtype": args.dtype, "B": B, "T": T,
            "fold": F, "halo_frames": h,
            "ms": round(t_fold * 1e3, 2),
            "speedup_vs_direct": round(t_direct / t_fold, 2),
            "rel_err_vs_f32": float(f"{err_fold:.3e}"),
            "rel_dev_vs_direct": float(f"{dev:.3e}"),
        }), flush=True)


if __name__ == "__main__":
    main()
