"""A/B: direct XLA residual stack vs batch-folded XLA stack (round-4 lever).

Hypothesis (VERDICT r3 "what's weak" #1): XLA's conv tiling at small C and
very long T may be suboptimal; reshaping (B, T, C) -> (B*F, T/F + halo, C)
with a causal receptive-field halo changes the spatial tiling without
Mosaic, transposes, or phase streams.  The halo is zero-filled on chunk 0,
exactly reproducing batch-mode causal left-padding, so trimmed outputs are
bit-identical to the direct stack (asserted).

Also re-measures the folded-Pallas kernel in the SAME process — the
per-round folded-vs-XLA discipline row (the lead has flipped once with a
runtime update; BENCHMARKS "runtime r2 re-measurement").

Times each encoder residual-stack shape of symAD_vctk_48000_hop300
(C=32/64/128/256 at their true T, B=16) with the on-device fori_loop
methodology (see bench.py).  Two numbers per fold: stack-only (input
pre-folded — the pure conv-tiling effect) and end-to-end (fold gather +
stack + trim/reshape — what a production dispatch would pay).

Usage: python tools/batchfold_probe.py [--dtype float32|bfloat16]
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


def fold_time_to_batch(x, F, halo):
    """(B, T, C) -> (B*F, T/F + halo, C) with zero-filled causal left halo.

    Chunk f covers input samples [f*Tc - halo, (f+1)*Tc); chunk 0's halo is
    zeros — identical to batch-mode causal left padding, so a causal stack
    applied per chunk reproduces the unfolded stack exactly after trimming
    the first `halo` output rows of every chunk."""
    B, T, C = x.shape
    Tc = T // F
    xp = jnp.pad(x, ((0, 0), (halo, 0), (0, 0)))
    # F static overlapping slices + stack: F contiguous copies, ~memcpy
    # cost (a jnp.take gather here lowered ~100x slower on the TPU
    # runtime — measured in the round-4 probe session)
    xc = jnp.stack([xp[:, f * Tc:f * Tc + Tc + halo] for f in range(F)],
                   axis=1)  # (B, F, Tc+halo, C)
    return xc.reshape(B * F, Tc + halo, C)


def unfold_batch_to_time(y, B, F, halo):
    y = y[:, halo:, :]
    BF, Tc, C = y.shape
    return y.reshape(B, F * Tc, C)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--folds", type=int, nargs="*", default=[2, 4, 8, 16])
    ap.add_argument("--shapes", default="32,64,128,256",
                    help="comma-separated channel widths to probe")
    args = ap.parse_args()
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    from audiodec_tpu.models.autoencoder import _res_unit_apply
    from audiodec_tpu.ops.pallas.folded_stack import folded_residual_stack

    B = args.batch
    act = jax.nn.elu
    dils = (1, 3, 9)
    halo = 6 * sum(dils)  # (k-1)*d summed over the three k=7 causal convs
    all_shapes = {32: 480000, 64: 160000, 128: 40000, 256: 8000}
    widths = [int(w) for w in args.shapes.split(",")]

    for C in widths:
        T = all_shapes[C]
        key = jax.random.PRNGKey(C)
        ks = jax.random.split(key, 7)
        ups = tuple(
            ({"w": (0.1 * jax.random.normal(ks[2 * i], (7, C, C))
                    ).astype(dtype)},
             {"w": (0.1 * jax.random.normal(ks[2 * i + 1], (1, C, C))
                    ).astype(dtype)})
            for i in range(3))
        x0 = (0.3 * jax.random.normal(ks[6], (B, T, C))).astype(dtype)

        def xla_stack(x):
            for (w1, w2), d in zip(ups, dils):
                x = _res_unit_apply({"conv1": w1, "conv2": w2}, x,
                                    dilation=d, act=act, mode="causal")
            return x

        ya = jax.jit(xla_stack)(x0)
        t_xla = time_fn(xla_stack, x0)

        # per-round folded-kernel discipline row (same process, same input)
        kp = tuple((u[0]["w"], u[1]["w"]) for u in ups)
        f_k = max(1, 128 // C)
        tile = 1024 if f_k * C <= 256 else (512 if f_k * C <= 512 else 256)

        def fused(x):
            return folded_residual_stack(x, kp, dilations=dils,
                                         bf16_dots=True, fold=f_k,
                                         tile_rows=tile)

        yk = jax.jit(fused)(x0)
        rel_k = float(jnp.max(jnp.abs(ya.astype(jnp.float32)
                                      - yk.astype(jnp.float32)))
                      / (float(jnp.max(jnp.abs(ya.astype(jnp.float32))))
                         + 1e-9))
        t_kernel = time_fn(fused, x0)
        print(json.dumps({
            "C": C, "T": T, "dtype": args.dtype,
            "xla_ms": round(t_xla * 1e3, 2),
            "pallas_folded_ms": round(t_kernel * 1e3, 2),
            "pallas_speedup_vs_xla": round(t_xla / t_kernel, 2),
            "pallas_rel_err": float(f"{rel_k:.3e}"),
        }), flush=True)

        for F in args.folds:
            if T % F:
                continue
            xf = fold_time_to_batch(x0, F, halo)

            def e2e(x, F=F):
                return unfold_batch_to_time(xla_stack(
                    fold_time_to_batch(x, F, halo)), B, F, halo)

            # exactness: trimmed folded output == direct output bitwise
            yb = jax.jit(e2e)(x0)
            exact = bool(jnp.all(yb == ya))
            rel = float(jnp.max(jnp.abs(ya.astype(jnp.float32)
                                        - yb.astype(jnp.float32)))
                        / (float(jnp.max(jnp.abs(ya.astype(jnp.float32))))
                           + 1e-9))
            t_stack = time_fn(xla_stack, xf)
            t_e2e = time_fn(e2e, x0)
            print(json.dumps({
                "C": C, "T": T, "dtype": args.dtype, "batch_fold": F,
                "halo": halo,
                "xla_ms": round(t_xla * 1e3, 2),
                "stack_only_ms": round(t_stack * 1e3, 2),
                "stack_only_speedup": round(t_xla / t_stack, 2),
                "e2e_ms": round(t_e2e * 1e3, 2),
                "e2e_speedup": round(t_xla / t_e2e, 2),
                "bitexact": exact,
                "rel_max_err": float(f"{rel:.3e}"),
            }), flush=True)


if __name__ == "__main__":
    main()
