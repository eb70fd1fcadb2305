"""A/B: XLA residual stack vs folded-time fused Pallas stack, real shapes.

Times each encoder/decoder residual-stack shape of symAD_vctk_48000_hop300
(C=32/64/128/256 at their true T, B=16) under both implementations with the
on-device fori_loop methodology (see bench.py).

Usage: python tools/folded_probe.py [--dtype float32|bfloat16]
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
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--int8", action="store_true",
                    help="also time the int8-dot quantized kernel")
    args = ap.parse_args()
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    from audiodec_tpu.models.autoencoder import _res_unit_apply
    from audiodec_tpu.ops.pallas.folded_stack import folded_residual_stack

    B = args.batch
    act = jax.nn.elu
    dils = (1, 3, 9)
    shapes = [(32, 480000), (64, 160000), (128, 40000), (256, 8000)]

    for C, T in shapes:
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

        kp = tuple((u[0]["w"], u[1]["w"]) for u in ups)
        ya = jax.jit(xla_stack)(x0)
        t_xla = time_fn(xla_stack, x0)

        folds = sorted({max(1, 128 // C), max(1, 256 // C),
                        max(1, 512 // C)})
        for f in folds:
            if T % f:
                continue
            fc = f * C
            tile = 1024 if fc <= 256 else (512 if fc <= 512 else 256)

            def fused(x, f=f, tile=tile):
                return folded_residual_stack(x, kp, dilations=dils,
                                             bf16_dots=True, fold=f,
                                             tile_rows=tile)

            def fused_i8(x, f=f, tile=tile):
                return folded_residual_stack(x, kp, dilations=dils,
                                             int8_dots=True, fold=f,
                                             tile_rows=tile)

            def fused_i8t(x, f=f, tile=tile):
                # scalar-per-tile activation scale: int32 accumulation
                # across offsets, ONE dequant per conv
                return folded_residual_stack(x, kp, dilations=dils,
                                             int8_dots=True,
                                             int8_scale="tile", fold=f,
                                             tile_rows=tile)

            def rel_err(yb):
                return float(jnp.max(jnp.abs(ya.astype(jnp.float32)
                                             - yb.astype(jnp.float32)))
                             / (float(jnp.max(jnp.abs(
                                 ya.astype(jnp.float32)))) + 1e-9))

            yb = jax.jit(fused)(x0)
            rel = rel_err(yb)
            t_fused = time_fn(fused, x0)
            rec = {
                "C": C, "T": T, "dtype": args.dtype, "fold": f,
                "xla_ms": round(t_xla * 1e3, 2),
                "folded_ms": round(t_fused * 1e3, 2),
                "speedup": round(t_xla / t_fused, 2),
                "rel_max_err": float(f"{rel:.3e}"),
            }
            if args.int8:
                yq = jax.jit(fused_i8)(x0)
                rec["int8_rel_err"] = float(f"{rel_err(yq):.3e}")
                t_i8 = time_fn(fused_i8, x0)
                rec["int8_ms"] = round(t_i8 * 1e3, 2)
                rec["int8_speedup_vs_xla"] = round(t_xla / t_i8, 2)
                yqt = jax.jit(fused_i8t)(x0)
                rec["int8t_rel_err"] = float(f"{rel_err(yqt):.3e}")
                t_i8t = time_fn(fused_i8t, x0)
                rec["int8t_ms"] = round(t_i8t * 1e3, 2)
                rec["int8t_speedup_vs_xla"] = round(t_xla / t_i8t, 2)
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
