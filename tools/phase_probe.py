"""A/B: XLA residual stack vs PHASE-FOLDED pure-XLA stack (round 3).

The folded-Pallas kernel pays ~4.2x FLOP amplification because dilated
taps (d=3/9) scatter over 6/13 folded-row offsets (ops/pallas/
folded_stack.py _fold_offsets).  But a causal conv with dilation d is
exactly d independent DENSE convs over the phase streams t mod d
(polyphase identity), and a dense k=7 conv under time-fold F=4 needs only
3 row offsets — so phase-decompose + fold turns every residual-unit conv
into a full-128-lane XLA conv with ~2.0x total amplification (incl. the
block-diagonal 1x1), at XLA's measured C=128 conv rate, with zero Mosaic
involvement (no per-process Mosaic load, immune to Mosaic codegen drift).

Per-shape in-process A/B at the real symAD stack shapes (B=16), f32 and
bf16, plus numeric deviation.  Usage: python tools/phase_probe.py
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

from audiodec_tpu.ops.pallas.folded_stack import (
    _fold_offsets,
    fold_1x1_weight,
    fold_conv_weight,
)


def elu(x):
    return jax.nn.elu(x)


def xla_unit(x, w1, w2, d):
    """Reference residual unit via lax conv (models.autoencoder path)."""
    k = w1.shape[0]
    y = elu(x)
    y = jax.lax.conv_general_dilated(
        y, w1, window_strides=(1,), padding=(((k - 1) * d, 0),),
        rhs_dilation=(d,), dimension_numbers=("NHC", "HIO", "NHC"))
    y = elu(y)
    y = jax.lax.conv_general_dilated(
        y, w2, window_strides=(1,), padding=((0, 0),),
        dimension_numbers=("NHC", "HIO", "NHC"))
    return x + y


def phase_folded_unit(x, w1, w2, d, F):
    """Same unit, phase-decomposed + time-folded, all full-lane XLA ops."""
    B, T, C = x.shape
    k = w1.shape[0]
    blk = F * d
    pad = (-T) % blk
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    Tp = T + pad
    y = elu(x)
    if d > 1:
        # phase-major streams: (B, Q, d, C) -> (B*d, Q, C), Q = Tp/d
        y = y.reshape(B, Tp // d, d, C).transpose(0, 2, 1, 3) \
             .reshape(B * d, Tp // d, C)
    R = y.shape[1] // F
    yf = y.reshape(y.shape[0], R, F * C)

    wf = fold_conv_weight(w1.astype(jnp.float32), 1, F).astype(x.dtype)
    n_off = wf.shape[0]
    h = jax.lax.conv_general_dilated(
        yf, jnp.moveaxis(wf, 0, 0), window_strides=(1,),
        padding=((n_off - 1, 0),), dimension_numbers=("NHC", "HIO", "NHC"))
    h = elu(h)
    w2f = fold_1x1_weight(w2[0].astype(jnp.float32)[None], F).astype(x.dtype)
    o = h @ w2f
    o = o.reshape(y.shape[0], y.shape[1], C)
    if d > 1:
        o = o.reshape(B, d, Tp // d, C).transpose(0, 2, 1, 3) \
             .reshape(B, Tp, C)
    return (x + o)[:, :T]


def stack(fn, x, params, dils, **kw):
    for (w1, w2), d in zip(params, dils):
        x = fn(x, w1, w2, d, **kw)
    return x


def time_fn(f, x0, iters=8):
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
    ap.add_argument("--dtypes", nargs="+", default=["float32", "bfloat16"])
    args = ap.parse_args()
    B = args.batch
    dils = (1, 3, 9)
    shapes = [(32, 480000), (64, 160000), (128, 40000), (256, 8000)]

    rng = np.random.default_rng(0)
    for dtype_s in args.dtypes:
        dt = jnp.float32 if dtype_s == "float32" else jnp.bfloat16
        for C, T in shapes:
            F = max(1, 128 // C)
            params = tuple(
                (jnp.asarray(rng.standard_normal((7, C, C)) * 0.05, dt),
                 jnp.asarray(rng.standard_normal((1, C, C)) * 0.05, dt))
                for _ in dils)
            x = jnp.asarray(0.3 * rng.standard_normal((B, T, C)), dt)

            f_xla = jax.jit(lambda v, p=params: stack(
                lambda a, w1, w2, d: xla_unit(a, w1, w2, d), v, p, dils))
            f_ph = jax.jit(lambda v, p=params: stack(
                phase_folded_unit, v, p, dils, F=F))

            y0 = np.asarray(f_xla(x), np.float32)
            y1 = np.asarray(f_ph(x), np.float32)
            rel = float(np.max(np.abs(y0 - y1)) /
                        max(1e-9, float(np.max(np.abs(y0)))))

            t_x = time_fn(f_xla, x) * 1e3
            t_p = time_fn(f_ph, x) * 1e3
            print(json.dumps({
                "C": C, "T": T, "dtype": dtype_s, "F": F,
                "xla_ms": round(t_x, 2), "phase_ms": round(t_p, 2),
                "speedup": round(t_x / t_p, 2),
                "rel_max_err": round(rel, 6),
            }), flush=True)


if __name__ == "__main__":
    main()
