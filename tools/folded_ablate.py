"""Cost attribution inside the folded residual-stack kernel (C=32 shape).

Times ablated kernel variants to attribute the per-stack cost between MXU
matmuls, ELU (VPU transcendental), per-offset slice materialization, and
accumulate adds.  Ablations change numerics — measurement only.

Usage: python tools/folded_ablate.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from audiodec_tpu.ops.pallas.folded_stack import (
    _elu,
    _fold_offsets,
    _pick_tile,
    fold_1x1_weight,
    fold_conv_weight,
)


def build(x, unit_params, dilations, *, ablate):
    b, t, c = x.shape
    k = 7
    f = max(1, 128 // c)
    fc = f * c
    n_rows = t // f
    per_unit = []
    h_total = 0
    for d in dilations:
        offs = _fold_offsets(k, d, f)
        per_unit.append((offs, -offs[0]))
        h_total += -offs[0]
    xf = x.reshape(b, n_rows, fc)
    rows_tile = _pick_tile(n_rows, 1024)
    n_tiles = n_rows // rows_tile
    xp = jnp.pad(xf, ((0, 0), (h_total, 0), (0, 0)))
    starts = jnp.arange(n_tiles) * rows_tile
    halos = jax.vmap(
        lambda s: jax.lax.dynamic_slice(xp, (0, s, 0), (b, h_total, fc)),
        out_axes=1)(starts)

    flat_w, in_specs = [], [
        pl.BlockSpec((1, 1, h_total, fc), lambda bi, ti: (bi, ti, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, rows_tile, fc), lambda bi, ti: (bi, ti, 0),
                     memory_space=pltpu.VMEM),
    ]
    for (w1, w2), d in zip(unit_params, dilations):
        wf = fold_conv_weight(w1, d, f).astype(jnp.bfloat16)
        w11 = fold_1x1_weight(w2, f).astype(jnp.bfloat16)
        flat_w += [wf, w11]
        in_specs += [
            pl.BlockSpec(wf.shape,
                         (lambda nd: lambda bi, ti: (0,) * nd)(wf.ndim),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w11.shape,
                         (lambda nd: lambda bi, ti: (0,) * nd)(w11.ndim),
                         memory_space=pltpu.VMEM),
        ]

    def kernel(halo_ref, x_ref, *refs):
        # refs = [*weight refs, out_ref] (+ [scratch_ref] for im2col)
        out_ref = refs[-2] if ablate == "im2col" else refs[-1]
        v = jnp.concatenate([halo_ref[0, 0], x_ref[0]], axis=0)
        length = rows_tile + h_total
        ridx = 0
        for offs, o_span in per_unit:
            wf_ref, w11_ref = refs[ridx], refs[ridx + 1]
            ridx += 2
            if ablate == "noelu":
                y1 = v.astype(jnp.bfloat16)
            else:
                y1 = _elu(v).astype(jnp.bfloat16)
            out_len = length - o_span
            if ablate == "im2col":
                # write offset slices into an aligned VMEM scratch (Mosaic
                # cannot lane-concat vectors with mismatched sublane
                # offsets), then ONE dot; the MXU accumulates over K
                # internally (no VPU adds, no dependency chain)
                scratch = refs[-1]
                for i, o in enumerate(offs):
                    s = o + o_span
                    scratch[0:out_len, i * fc:(i + 1) * fc] = \
                        y1[s:s + out_len, :]
                acc = jax.lax.dot_general(
                    scratch[0:out_len, 0:len(offs) * fc],
                    wf_ref[:].reshape(len(offs) * fc, fc),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            elif ablate == "tree":
                parts = [jax.lax.dot_general(
                    y1[o + o_span:o + o_span + out_len, :], wf_ref[i],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                    for i, o in enumerate(offs)]
                while len(parts) > 1:
                    nxt = [parts[i] + parts[i + 1]
                           for i in range(0, len(parts) - 1, 2)]
                    if len(parts) % 2:
                        nxt.append(parts[-1])
                    parts = nxt
                acc = parts[0]
            else:
                acc = jnp.zeros((out_len, fc), jnp.float32)
                for i, o in enumerate(offs):
                    s = 0 if ablate == "noshift" else o + o_span
                    acc += jax.lax.dot_general(
                        y1[s:s + out_len, :], wf_ref[i],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
            a2 = acc if ablate == "noelu" else _elu(acc)
            y2 = jax.lax.dot_general(
                a2.astype(jnp.bfloat16), w11_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            v = v[o_span:, :] + y2.astype(v.dtype)
            length = out_len
        out_ref[0] = v

    n_max = max(len(offs) for offs, _ in per_unit)
    scratch_shapes = []
    if ablate == "im2col":
        scratch_shapes = [pltpu.VMEM((rows_tile + h_total, n_max * fc),
                                     jnp.bfloat16)]
    return pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, rows_tile, fc),
                               lambda bi, ti: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_rows, fc), x.dtype),
        scratch_shapes=scratch_shapes,
    )(halos, xf, *flat_w).reshape(b, t, c)


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
    B, T, C = 16, 480000, 32
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 7)
    ups = tuple((0.1 * jax.random.normal(ks[2 * i], (7, C, C)),
                 0.1 * jax.random.normal(ks[2 * i + 1], (1, C, C)))
                for i in range(3))
    x0 = 0.3 * jax.random.normal(ks[6], (B, T, C))

    for ablate in ("tree", "im2col"):
        f = lambda x, a=ablate: build(x, ups, (1, 3, 9), ablate=a)
        dt = time_fn(f, x0)
        print(json.dumps({"ablate": ablate, "ms": round(dt * 1e3, 2)}),
              flush=True)

    # pure ELU pass cost for reference (XLA, one read+write)
    dt = time_fn(lambda x: jax.nn.elu(x), x0)
    print(json.dumps({"ablate": "xla_single_elu_pass", "ms":
                      round(dt * 1e3, 2)}))


if __name__ == "__main__":
    main()
