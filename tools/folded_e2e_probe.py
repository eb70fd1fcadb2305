"""End-to-end: folded fast-path transcode vs plain XLA path on the chip.

1. Bit-exactness: RVQ indices through the compiled folded encoder vs the
   reference torch golden (tests/golden/gen_symad.npz).
2. Throughput: full transcode (encode -> RVQ -> decode) with folded
   residual stacks vs the plain path, f32 and bf16, on-device loop.

Usage: python tools/folded_e2e_probe.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp


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
    from audiodec_tpu.models.autoencoder import (
        GeneratorConfig,
        decoder_apply,
        encoder_apply,
        generator_init,
        projector_apply,
    )
    from audiodec_tpu.models.fast import (
        decoder_apply_folded,
        encoder_apply_folded,
    )
    from audiodec_tpu.ops.vq import rvq_forward_index
    from audiodec_tpu.utils.torch_import import import_autoencoder

    cfg = GeneratorConfig()

    # --- 1. bit-exact indices vs torch golden, compiled on the chip ---
    golden = os.path.join(os.path.dirname(__file__), "..", "tests",
                          "golden", "gen_symad.npz")
    data = np.load(golden)
    sd = {k[len("sd__"):]: data[k] for k in data.files if k.startswith("sd__")}
    gp = import_autoencoder(sd, cfg)
    xg = jnp.asarray(data["x"].transpose(0, 2, 1))

    @jax.jit
    def enc_idx(params, x):
        h = encoder_apply_folded(params["encoder"], x, cfg)
        z = projector_apply(params["projector"], h, cfg)
        _, idx = rvq_forward_index(z, params["quantizer"], flatten=True)
        return idx

    idx_folded = np.asarray(enc_idx(gp, xg))
    ref_idx = data["idx_stream"]
    exact = bool((idx_folded[0].T == ref_idx).all())
    print(json.dumps({"check": "folded_idx_bit_exact_vs_torch_golden",
                      "equal": exact,
                      "n_frames": int(ref_idx.shape[-1])}), flush=True)

    # --- 2. end-to-end throughput ---
    params = generator_init(jax.random.PRNGKey(0), cfg)
    SR, B, secs = 48000, 16, 10
    T = secs * SR
    audio_s = B * T / SR

    for dtype_name, dtype in (("float32", jnp.float32),
                              ("bfloat16", jnp.bfloat16)):
        p = jax.tree_util.tree_map(
            lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a,
            params)
        x0 = (0.3 * jax.random.normal(jax.random.PRNGKey(0), (B, T, 1),
                                      jnp.float32)).astype(dtype)

        def transcode(x, enc, dec, p=p):
            h = enc(p["encoder"], x, cfg)
            z = projector_apply(p["projector"], h, cfg)
            zq, idx = rvq_forward_index(z.astype(jnp.float32),
                                        p["quantizer"])
            y = dec(p["decoder"], zq.astype(dtype), cfg)
            return y

        for name, enc, dec in (
                ("plain", encoder_apply, decoder_apply),
                ("folded", encoder_apply_folded, decoder_apply_folded)):
            dt = time_fn(lambda x, e=enc, d=dec: transcode(x, e, d), x0)
            print(json.dumps({"path": name, "dtype": dtype_name,
                              "ms_per_iter": round(dt * 1e3, 2),
                              "rtf": round(audio_s / dt, 1)}), flush=True)


if __name__ == "__main__":
    main()
