import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp
from audiodec_tpu.models.autoencoder import GeneratorConfig, generator_init, encoder_apply, projector_apply, decoder_apply
from audiodec_tpu.ops.vq import rvq_forward_index, rvq_lookup
cfg = GeneratorConfig()
params = generator_init(jax.random.PRNGKey(0), cfg)
B, T = 16, 480000
N = 8
xs = [jnp.asarray(0.3*np.random.default_rng(i).standard_normal((B,T,1)).astype(np.float32)) for i in range(N)]

def make_transcode(dtype):
    cast = lambda t: jax.tree_util.tree_map(lambda a: a.astype(dtype) if a.dtype==jnp.float32 else a, t)
    p2 = cast(params)
    @jax.jit
    def transcode(p, x):
        x = x.astype(dtype)
        h = encoder_apply(p['encoder'], x, cfg)
        z = projector_apply(p['projector'], h, cfg)
        _, idx = rvq_forward_index(z.astype(jnp.float32), params['quantizer'])
        zq = rvq_lookup(idx, params['quantizer']).astype(dtype)
        y = decoder_apply(p['decoder'], zq, cfg)
        return idx, y
    return p2, transcode

for name, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
    p2, transcode = make_transcode(dtype)
    # warm
    idx, y = transcode(p2, xs[0]); float(jnp.asarray(y, jnp.float32)[0,0,0])
    # serial sync
    t0 = time.perf_counter()
    for i in range(4):
        idx, y = transcode(p2, xs[i]); float(jnp.asarray(y, jnp.float32)[0,0,0])
    dt_serial = (time.perf_counter()-t0)/4
    # pipelined: dispatch all distinct, then sync all
    t0 = time.perf_counter()
    outs = [transcode(p2, xs[i]) for i in range(N)]
    for idx, y in outs:
        float(jnp.asarray(y, jnp.float32)[0,0,0])
    dt_pipe = (time.perf_counter()-t0)/N
    rt = B*T/48000
    print(f"{name}: serial {dt_serial*1000:.1f} ms/iter (rtf {rt/dt_serial:.0f}) | pipelined {dt_pipe*1000:.1f} ms/iter (rtf {rt/dt_pipe:.0f})")
