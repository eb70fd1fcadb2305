"""Clean on-device throughput: f32/bf16 x batch sizes via fori_loop."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from audiodec_tpu.models.autoencoder import (
    GeneratorConfig, generator_init, encoder_apply, projector_apply,
    decoder_apply)
from audiodec_tpu.ops.vq import rvq_forward_index, rvq_lookup

cfg = GeneratorConfig()
params = generator_init(jax.random.PRNGKey(0), cfg)
T = 480000
ITERS = 8


def bench(B, dtype):
    cast = lambda t: jax.tree_util.tree_map(
        lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a, t)
    p = cast(params)

    def transcode(x):
        h = encoder_apply(p["encoder"], x.astype(dtype), cfg)
        z = projector_apply(p["projector"], h, cfg)
        _, idx = rvq_forward_index(z.astype(jnp.float32),
                                   params["quantizer"])
        zq = rvq_lookup(idx, params["quantizer"]).astype(dtype)
        return decoder_apply(p["decoder"], zq, cfg).astype(jnp.float32)

    @jax.jit
    def loop(x):
        def body(i, carry):
            return transcode(carry) + 1e-12 * i
        return jax.lax.fori_loop(0, ITERS, body, x)

    x0 = 0.3 * jax.random.normal(jax.random.PRNGKey(0), (B, T, 1),
                                 jnp.float32)
    y = loop(x0)
    float(y[0, 0, 0])
    t0 = time.perf_counter()
    y = loop(x0)
    float(y[0, 0, 0])
    dt = (time.perf_counter() - t0) / ITERS
    rtf = B * T / 48000 / dt
    print(f"B={B} {np.dtype(dtype).name}: {dt*1000:.1f} ms/iter "
          f"rtf={rtf:.0f}", flush=True)


for B in (16, 32):
    for dt_ in (jnp.float32, jnp.bfloat16):
        bench(B, dt_)
