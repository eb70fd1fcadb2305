"""Hardware RVQ index flip rate on TRAINED codebooks.

XLA's TPU convs multiply in bf16 under default precision, which can flip
near-tie argmins vs the CPU/torch reference.  Round 1 measured 7/96 flips
on a seeded-random golden (tight codebook margins) and asserted trained
codebooks would flip less; this probe measures it: encode the trained
golden's held-out audio (tests/golden/gen_symad_trained.npz, trained by
the reference's own trainer) on the device under each encoder mode and
count index mismatches vs the torch reference indices.

Usage: python tools/flip_probe.py [--cpu]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--golden", default="gen_symad_trained",
                    help="tests/golden/<name>.npz trained golden to "
                         "measure (e.g. gen_symad_trained_12k)")
    ap.add_argument("--skip-time", action="store_true",
                    help="flip counts only (skip the B=16 x 10 s cost "
                         "loop — minutes on CPU)")
    ap.add_argument("--modes", nargs="+", default=None,
                    help="subset of mode names to run (remote compiles are "
                         "minutes each; the full matrix can exceed a "
                         "tunnel session budget)")
    ap.add_argument("--rank-coverage", action="store_true",
                    help="exactness-coverage validator for --precision "
                         "exact's two-pass argmin: measure the worst rank "
                         "of the TRUE f32 argmin within the pass-1 "
                         "(default-precision) distances over the golden's "
                         "audio + a random corpus, and check it clears "
                         "the k=16 shortlist with margin.  Run whenever "
                         "goldens are re-pinned.")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from audiodec_tpu.models.autoencoder import (
        GeneratorConfig, encoder_apply, projector_apply)
    from audiodec_tpu.ops.vq import rvq_forward_index
    from audiodec_tpu.utils.torch_import import import_autoencoder

    data = np.load(os.path.join(REPO, "tests", "golden",
                                args.golden + ".npz"))
    sd = {k[len("sd__"):]: data[k] for k in data.files
          if k.startswith("sd__")}
    cfg = GeneratorConfig()
    params = import_autoencoder(sd, cfg)
    x = jnp.asarray(data["x"].transpose(0, 2, 1))  # (1, T, 1)
    q = cfg.codebook_num
    ref = data["idx_stream"]  # (Q, frames), flattened with q*N offsets
    offs = (np.arange(q) * cfg.codebook_size)[None, None, :]

    if args.rank_coverage:
        from audiodec_tpu.ops.vq import rvq_shortlist_ranks

        # z exactly as --precision exact produces it (encoder+projector
        # scoped to 'high'); ranks measured against the default-precision
        # pass 1 the shortlist is drawn from
        @jax.jit
        def ranks_of(xb):
            with jax.default_matmul_precision("high"):
                h = encoder_apply(params["encoder"], xb, cfg)
                z = projector_apply(params["projector"], h, cfg)
            return rvq_shortlist_ranks(z.astype(jnp.float32),
                                       params["quantizer"])

        r_golden = np.asarray(ranks_of(x))
        # widen the frame population well past the golden clip
        xr = 0.3 * jax.random.normal(jax.random.PRNGKey(3),
                                     (8, 300 * 1600, 1), jnp.float32)
        r_rand = np.asarray(jax.jit(ranks_of)(xr))
        allr = np.concatenate([r_golden.ravel(), r_rand.ravel()])
        worst = int(allr.max())
        k_default = 16
        out = {
            "probe": "rank_coverage",
            "golden": args.golden,
            "frames_x_layers": int(allr.size),
            "worst_true_argmin_rank": worst,
            "p999_rank": int(np.quantile(allr, 0.999)),
            "nonzero_rank_rate": round(float((allr > 0).mean()), 6),
            "k_default": k_default,
            "k_min_safe": worst + 1,
            "covered_by_default_k": bool(worst < k_default),
            "suggested_k": (k_default if 2 * (worst + 1) <= k_default
                            else int(2 ** np.ceil(np.log2(
                                2 * (worst + 1))))),
            "backend": jax.default_backend(),
        }
        print(json.dumps(out), flush=True)
        if not out["covered_by_default_k"]:
            print(json.dumps({"warning": "true argmin rank exceeds the "
                              "k=16 shortlist: --precision exact is NOT "
                              "exact on this checkpoint; pass --exact-k "
                              f">= {out['suggested_k']}"}), flush=True)
        return

    import contextlib

    from audiodec_tpu.models.fast import encoder_apply_batchfold

    def encode(x, dtype, enc_prec=None, exact_k=None, fold=None):
        p = jax.tree_util.tree_map(
            lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a,
            {"encoder": params["encoder"], "projector": params["projector"]})
        scope = (jax.default_matmul_precision(enc_prec) if enc_prec
                 else contextlib.nullcontext())
        with scope:
            if fold:
                h = encoder_apply_batchfold(p["encoder"], x.astype(dtype),
                                            cfg, fold=fold)
            else:
                h = encoder_apply(p["encoder"], x.astype(dtype), cfg)
            z = projector_apply(p["projector"], h, cfg)
        _, idx = rvq_forward_index(z.astype(jnp.float32),
                                   params["quantizer"], exact_k=exact_k)
        return idx

    # The flip matrix: where do the flips come from (encoder bf16-multiply
    # convs perturbing z vs the RVQ distance matmul), and what is the
    # cheapest 0-flip configuration?  enc_prec scopes ONLY the
    # encoder+projector; exact_k adds the two-pass argmin re-score.
    modes = (
        ("f32_default", jnp.float32, None, None, None),
        # the round-4 shipping default: batch-folded whole-encoder encode
        # (codec_test --encode-fold auto -> fold 8 at production length)
        ("f32_fold8", jnp.float32, None, None, None, 8),
        ("bf16", jnp.bfloat16, None, None, None),
        ("f32_2pass_k16", jnp.float32, None, None, 16),
        ("f32_2pass_k64", jnp.float32, None, None, 64),
        ("f32_enc_high", jnp.float32, None, "high", None),
        ("f32_enc_high_2pass", jnp.float32, None, "high", 16),
        ("f32_enc_highest", jnp.float32, None, "highest", None),
        ("f32_enc_highest_2pass", jnp.float32, None, "highest", 16),
        ("f32_highest", jnp.float32, "highest", None, None),
    )
    # cost measurement: the encode side (encoder+projector+RVQ) on a
    # B=16 x 10 s batch, on-device fori_loop (bench.py methodology), so
    # each mode's flip count is paired with its relative cost
    import time as _time

    xt = 0.3 * jax.random.normal(jax.random.PRNGKey(0), (16, 480000, 1),
                                 jnp.float32)

    def time_mode(dtype, enc_prec, exact_k, fold=None, iters=8):
        @jax.jit
        def loop(xb):
            def body(i, s):
                idx = encode(xb + s.astype(xb.dtype), dtype, enc_prec,
                             exact_k, fold)
                return 1e-20 * idx.ravel()[0].astype(jnp.float32) + 0.0 * s
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

        float(loop(xt))
        best = float("inf")
        for _ in range(3):
            t0 = _time.perf_counter()
            float(loop(xt))
            best = min(best, (_time.perf_counter() - t0) / iters)
        return best * 1e3

    base_ms = None
    for mode, dtype, prec, enc_prec, exact_k, *rest in modes:
        fold = rest[0] if rest else None
        if args.modes and mode not in args.modes and mode != "f32_default":
            continue
        if prec:
            jax.config.update("jax_default_matmul_precision", prec)
        idx = np.asarray(jax.jit(
            lambda x, d=dtype, ep=enc_prec, ek=exact_k, f=fold:
            encode(x, d, ep, ek, f))(x))
        ms = (0.0 if args.skip_time
              else time_mode(dtype, enc_prec, exact_k, fold))
        if prec:
            jax.config.update("jax_default_matmul_precision", None)
        if base_ms is None:
            base_ms = ms or 1.0
        flat = (idx[0] + offs[0]).T  # (Q, frames)
        flips = int((flat != ref).sum())
        total = int(ref.size)
        print(json.dumps({
            "mode": mode, "flips": flips, "total": total,
            "flip_rate": round(flips / total, 5),
            "encode_ms": round(ms, 2),
            "cost_vs_default": round(ms / base_ms, 3),
            "backend": jax.default_backend(),
        }), flush=True)


if __name__ == "__main__":
    main()
