"""Streaming chunk-latency probe: per-hop encode+decode compute latency.

Measures the device-side cost of one streaming step (hop=300 samples =
6.25 ms of audio @ 48 kHz) by timing a `lax.scan` over N hops and dividing —
this isolates kernel latency from the host<->device tunnel overhead of this
environment (which adds ~30 ms per host-driven call and is an artifact of
the axon relay, not the TPU).  Reference comparison: <6 ms GPU decoder
latency (ref README.md:7, figs/latency.jpg).

--batch B measures B concurrent independent streams through one batched
state pytree (the multi-session serving mode; StreamingCodec(batch=B)):
per-hop latency vs B tells how many live calls one chip sustains under the
6 ms budget.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import time

import numpy as np
import jax

from audiodec_tpu.utils.profiling import enable_compile_cache

enable_compile_cache()
import jax.numpy as jnp

from audiodec_tpu.models.autoencoder import GeneratorConfig, generator_init
from audiodec_tpu.streaming.engine import (
    scan_streaming_decode,
    scan_streaming_encode,
)

ap = argparse.ArgumentParser()
ap.add_argument("--batch", type=int, nargs="+", default=[1],
                help="concurrent independent streams (batched state)")
ap.add_argument("--hops", type=int, default=64)
ap.add_argument("--cpu", action="store_true",
                help="force CPU backend (sanity runs)")
ap.add_argument("--decoder", default="sym",
                choices=["sym", "v0", "v1", "v2"],
                help="rx decoder: symAD mirror decoder or the AD v0/v1/v2 "
                     "HiFiGAN vocoder variants (ref figs/latency.jpg rows)")
ap.add_argument("--precision", default="default",
                choices=["default", "exact"],
                help="exact = the StreamingCodec precision='exact' recipe "
                     "(encoder 'high' matmul precision + two-pass argmin) "
                     "— measures the streaming-surface cost of hardware "
                     "bit-exact indices per hop")
args = ap.parse_args()

if args.cpu:
    jax.config.update("jax_platforms", "cpu")

cfg = GeneratorConfig()
params = generator_init(jax.random.PRNGKey(0), cfg)
hop = cfg.hop_length
N = args.hops

voc_cfg = None
if args.decoder != "sym":
    from audiodec_tpu.models.vocoder import vocoder_init
    from audiodec_tpu.utils.config import generator_config, load_config

    VOC_YAML = {
        "v0": "configs/vocoder/AudioDec_v0_symAD_vctk_48000_hop300_clean.yaml",
        "v1": "configs/vocoder/AudioDec_v1_symAD_vctk_48000_hop300_clean.yaml",
        "v2": "configs/vocoder/AudioDec_v2_symAD_vctk_48000_hop300_clean.yaml",
    }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # load_config resolves `inherit:` (v0/v2 extend the v1 yaml)
    vc = load_config(os.path.join(root, VOC_YAML[args.decoder]))
    voc_cfg = generator_config(vc)
    params = dict(params)
    params["vocoder"] = vocoder_init(jax.random.PRNGKey(1), voc_cfg)

ek, ep = ((16, "high") if args.precision == "exact" else (None, None))
enc = jax.jit(lambda p, x: scan_streaming_encode(p, cfg, x, exact_k=ek,
                                                 enc_precision=ep))
dec = jax.jit(lambda p, i: scan_streaming_decode(p, cfg, i,
                                                 voc_cfg=voc_cfg))

for B in args.batch:
    x = jnp.asarray(0.3 * np.random.default_rng(0).standard_normal(
        (B, N * hop, 1)).astype(np.float32))

    idx = enc(params, x)
    float(idx[0, 0, 0])
    y = dec(params, idx)
    float(y[0, 0, 0])

    t0 = time.perf_counter()
    for _ in range(3):
        idx = enc(params, x)
        float(idx[0, 0, 0])
    enc_ms = (time.perf_counter() - t0) / 3 / N * 1000

    t0 = time.perf_counter()
    for _ in range(3):
        y = dec(params, idx)
        float(y[0, 0, 0])
    dec_ms = (time.perf_counter() - t0) / 3 / N * 1000

    print(f"B={B:4d} concurrent streams | per-hop encode: {enc_ms:.3f} ms | "
          f"decode: {dec_ms:.3f} ms | e2e chunk (compute): "
          f"{enc_ms + dec_ms:.3f} ms | hop = {hop / 48000 * 1000:.2f} ms "
          f"audio | under-6ms: {'yes' if enc_ms + dec_ms < 6 else 'NO'}",
          flush=True)
