"""Microbenchmark: conv efficiency vs channel width / dtype on the chip."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax
import jax.numpy as jnp


def bench_conv(B, T, C_in, C_out, k, dtype, stride=1, dilation=1, iters=5):
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (B, T, C_in)).astype(np.float32)).astype(dtype)
    w = jnp.asarray(0.01 * np.random.default_rng(1).standard_normal(
        (k, C_in, C_out)).astype(np.float32)).astype(dtype)

    @jax.jit
    def f(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (stride,), [( (k-1)*dilation, 0)], rhs_dilation=(dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=dtype)
    y = f(x, w); float(jnp.asarray(y, jnp.float32)[0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(iters):
        y = f(x, w); float(jnp.asarray(y, jnp.float32)[0, 0, 0])
    dt = (time.perf_counter() - t0) / iters
    flops = 2 * B * (T // stride) * k * C_in * C_out
    return dt * 1000, flops / dt / 1e12


if __name__ == "__main__":
    B, T = 16, 480000
    for (ci, co, k, s, d) in [(32, 32, 7, 1, 1), (32, 32, 7, 1, 9),
                              (128, 128, 7, 1, 1), (512, 512, 7, 1, 1)]:
        t_scaled = T // max(1, ci // 32)  # keep work comparable
        for dt_ in (jnp.float32, jnp.bfloat16):
            ms, tf = bench_conv(B, t_scaled, ci, co, k, dt_, s, d)
            print(f"C{ci}->{co} k{k} s{s} d{d} T{t_scaled} "
                  f"{dt_.__name__}: {ms:7.1f} ms  {tf:6.2f} TFLOP/s", flush=True)
