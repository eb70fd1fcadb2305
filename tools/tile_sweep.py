"""Sweep the folded-stack kernel's tile_rows on the real chip.

Hypothesis: at ~1k rows/tile each (rows,128)@(128,128) dot spends a large
fraction of MXU cycles reloading the stationary weight; longer row streams
amortize the reload.  Measures the C=32 (T=480k) and C=64 (T=160k) encoder
stack shapes, f32 storage, B=16.

Usage: python tools/tile_sweep.py [--dtype float32|bfloat16]
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
    args = ap.parse_args()
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    from audiodec_tpu.ops.pallas.folded_stack import folded_residual_stack

    B = args.batch
    for C, T in [(32, 480000), (64, 160000)]:
        key = jax.random.PRNGKey(C)
        x0 = 0.1 * jax.random.normal(key, (B, T, C), dtype)
        ks = jax.random.split(jax.random.PRNGKey(1), 6)
        units = tuple(
            (0.2 * jax.random.normal(ks[2 * i], (7, C, C), dtype),
             0.2 * jax.random.normal(ks[2 * i + 1], (1, C, C), dtype))
            for i in range(3))
        for tile in (512, 1024, 2048, 4096, 8192, 16384):
            f = lambda x, t=tile: folded_residual_stack(
                x, units, dilations=(1, 3, 9), kernel_size=7, tile_rows=t)
            try:
                dt = time_fn(f, x0)
            except Exception as e:
                print(json.dumps({"C": C, "tile_rows": tile,
                                  "error": str(e)[:120]}), flush=True)
                continue
            print(json.dumps({"C": C, "T": T, "tile_rows": tile,
                              "ms": round(dt * 1e3, 2)}), flush=True)


if __name__ == "__main__":
    main()
