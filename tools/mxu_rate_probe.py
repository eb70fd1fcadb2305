"""Isolate the Mosaic-vs-XLA MXU rate on IDENTICAL dot shapes.

The folded-stack kernel's inner op is a (rows, 128) @ (128, 128) matmul
chain in VMEM.  This probe measures the raw sustained rate of exactly that
op chain under (a) a Pallas/Mosaic kernel, (b) XLA dot_generals, for bf16
/ int8 / f32 operands — separating "Mosaic codegen rate on this runtime"
from any kernel-structure effect.  Two modes per impl: "chained" (each
dot consumes the previous result — measures dependent latency) and
"independent" (offset-sum shape: N dots of one input, accumulated —
measures pipelined throughput, mirroring the folded conv).

Usage: python tools/mxu_rate_probe.py [--rows 1024] [--dots 64]
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
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_pallas_chain(rows, n_dots, n_tiles, dtype, independent=False):
    def kernel(x_ref, w_ref, o_ref):
        if independent:
            # accumulate independent dots of the SAME input — mirrors the
            # folded conv's offset sum, lets the MXU pipeline fill
            y = x_ref[...]
            acc = None
            for i in range(n_dots):
                d = jax.lax.dot_general(
                    y, w_ref[i],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=(jnp.int32 if dtype == jnp.int8
                                            else jnp.float32))
                acc = d if acc is None else acc + d
            o_ref[...] = acc.astype(dtype)
            return
        y = x_ref[...]
        for i in range(n_dots):
            d = jax.lax.dot_general(
                y, w_ref[i],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=(jnp.int32 if dtype == jnp.int8
                                        else jnp.float32))
            if dtype == jnp.int8:
                # requantize: shift down to stay in int8 range
                y = (d // 4096).astype(jnp.int8)
            else:
                y = d.astype(dtype)
        o_ref[...] = y

    def run(x, w):
        return pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((rows, 128), lambda t: (t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(w.shape, lambda t: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((rows, 128), lambda t: (t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_tiles * rows, 128), dtype),
        )(x, w)

    return jax.jit(run)


def make_xla_chain(rows, n_dots, n_tiles, dtype, independent=False):
    def run(x, w):
        y = x.reshape(n_tiles, rows, 128)
        if independent:
            acc = jax.lax.dot_general(
                y, w[0], dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=(jnp.int32 if dtype == jnp.int8
                                        else jnp.float32))

            def body(i, acc):
                return acc + jax.lax.dot_general(
                    y, w[i], dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=(jnp.int32 if dtype == jnp.int8
                                            else jnp.float32))

            acc = jax.lax.fori_loop(1, n_dots, body, acc)
            return acc.astype(dtype).reshape(n_tiles * rows, 128)

        def body(i, y):
            d = jax.lax.dot_general(
                y, w[i],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=(jnp.int32 if dtype == jnp.int8
                                        else jnp.float32))
            if dtype == jnp.int8:
                return (d // 4096).astype(jnp.int8)
            return d.astype(dtype)

        y = jax.lax.fori_loop(0, n_dots, body, y)
        return y.reshape(n_tiles * rows, 128)

    return jax.jit(run)


def time_fn(f, *args, iters=3):
    y = f(*args)
    float(jnp.asarray(y, jnp.float32).ravel()[0])
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        y = f(*args)
        float(jnp.asarray(y, jnp.float32).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1024)
    ap.add_argument("--dots", type=int, default=64)
    ap.add_argument("--tiles", type=int, default=120)
    args = ap.parse_args()
    rows, n_dots, n_tiles = args.rows, args.dots, args.tiles

    rng = np.random.default_rng(0)
    flops = 2.0 * n_tiles * n_dots * rows * 128 * 128

    for dtype_s, dtype in (("bfloat16", jnp.bfloat16), ("int8", jnp.int8),
                           ("float32", jnp.float32)):
        if dtype == jnp.int8:
            x = jnp.asarray(rng.integers(-80, 80, (n_tiles * rows, 128)),
                            jnp.int8)
            w = jnp.asarray(rng.integers(-80, 80, (n_dots, 128, 128)),
                            jnp.int8)
        else:
            x = jnp.asarray(rng.standard_normal((n_tiles * rows, 128)),
                            dtype)
            w = jnp.asarray(rng.standard_normal((n_dots, 128, 128)) * 0.09,
                            dtype)
        for name, mk in (("mosaic", make_pallas_chain),
                         ("xla", make_xla_chain)):
            for indep in (False, True):
                try:
                    f = mk(rows, n_dots, n_tiles, dtype, independent=indep)
                    dt = time_fn(f, x, w)
                    print(json.dumps({
                        "impl": name, "dtype": dtype_s, "rows": rows,
                        "dots_per_tile": n_dots, "tiles": n_tiles,
                        "mode": "independent" if indep else "chained",
                        "ms": round(dt * 1e3, 3),
                        "tflops": round(flops / dt / 1e12, 1),
                    }), flush=True)
                except Exception as e:  # pragma: no cover
                    print(json.dumps({"impl": name, "dtype": dtype_s,
                                      "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
