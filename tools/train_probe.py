"""Training-step throughput on the chip: canonical symAD config (batch
16 x 9600 samples), metric phase and adversarial phase (full HiFiGAN
MSD+MPD discriminator).  Reference trains 200k+500k steps on one V100
(README.md:19-23); steps/sec here sets the TPU wall-clock for that schedule.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from audiodec_tpu.models.autoencoder import GeneratorConfig, generator_init
from audiodec_tpu.models.discriminators import (
    hifigan_discriminator_apply, hifigan_discriminator_init)
from audiodec_tpu.train.criterion import build_criterion
from audiodec_tpu.train.optim import make_optimizer
from audiodec_tpu.train.steps import make_autoencoder_steps
from audiodec_tpu.utils.config import (
    discriminator_config, generator_config, load_config)

config = load_config("configs/autoencoder/symAD_vctk_48000_hop300.yaml")
gen_cfg = generator_config(config)
disc_cfg = discriminator_config(config)

k1, k2 = jax.random.split(jax.random.PRNGKey(0))
gen = generator_init(k1, gen_cfg)
disc = hifigan_discriminator_init(k2, disc_cfg)
gen_opt = make_optimizer(config, "generator")
disc_opt = make_optimizer(config, "discriminator")
state = {"gen": gen, "disc": disc, "gen_opt": gen_opt.init(gen),
         "disc_opt": disc_opt.init(disc)}
crit = build_criterion(config)
steps = make_autoencoder_steps(
    gen_cfg, lambda p, x: hifigan_discriminator_apply(p, x, disc_cfg),
    config, crit, gen_opt, disc_opt, jit=True)

B = config.get("batch_size", 16)
T = config.get("batch_length", 9600)
x = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (B, T, 1), jnp.float32)

times = {}
for name in ("metric", "adv"):
    fn = steps[name]
    state, m = fn(state, x)      # compile
    float(m["generator_loss"])
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        state, m = fn(state, x)
    float(m["generator_loss"])
    times[name] = (time.perf_counter() - t0) / n
    print(f"{name} step: {times[name]*1000:.1f} ms  "
          f"({1/times[name]:.1f} steps/s)", flush=True)

total_h = (200000 * times["metric"] + 500000 * times["adv"]) / 3600
print(f"full 700k-step symAD schedule: ~{total_h:.1f} h on one chip",
      flush=True)
