"""XLA flat vs block-packed transcode on the chip."""
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
from audiodec_tpu.archive.fast_experiments import (
    decoder_apply_blocked, encoder_apply_blocked)
from audiodec_tpu.ops.vq import rvq_forward_index, rvq_lookup

cfg = GeneratorConfig()
params = generator_init(jax.random.PRNGKey(0), cfg)
B, T = 16, 480000
xs = [jnp.asarray(0.3 * np.random.default_rng(i).standard_normal(
    (B, T, 1)).astype(np.float32)) for i in range(3)]


def vq_dec(z, blocked):
    _, idx = rvq_forward_index(z, params["quantizer"])
    zq = rvq_lookup(idx, params["quantizer"])
    if blocked:
        y = decoder_apply_blocked(params["decoder"], zq, cfg)
    else:
        y = decoder_apply(params["decoder"], zq, cfg)
    return idx, y


@jax.jit
def xla_path(params, x):
    h = encoder_apply(params["encoder"], x, cfg)
    z = projector_apply(params["projector"], h, cfg)
    return vq_dec(z, False)


@jax.jit
def blocked_path(params, x):
    h = encoder_apply_blocked(params["encoder"], x, cfg)
    z = projector_apply(params["projector"], h, cfg)
    return vq_dec(z, True)


def timeit(f, name, iters=4):
    idx, y = f(params, xs[0])
    float(y[0, 0, 0])
    t0 = time.perf_counter()
    for i in range(iters):
        idx, y = f(params, xs[i % 3])
        float(y[0, 0, 0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1000:.1f} ms/iter  rtf={B*T/48000/dt:.0f}",
          flush=True)
    return idx


i1 = timeit(xla_path, "xla    ")
i2 = timeit(blocked_path, "blocked")
print("indices equal:", bool(jnp.all(i1 == i2)), flush=True)
