"""Name -> activation function factory (ref: layers/activation_function.py:18-22).

Returns plain jnp-in/jnp-out callables so they can be used inside jit/scan.
Parameter names follow the torch.nn conventions the reference configs use
(e.g. {"negative_slope": 0.1} for LeakyReLU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def get_activation(name: str, params: dict | None = None):
    params = dict(params or {})
    if name == "ELU":
        alpha = params.get("alpha", 1.0)
        return lambda x: jax.nn.elu(x, alpha=alpha)
    if name == "LeakyReLU":
        slope = params.get("negative_slope", 0.01)
        return lambda x: jax.nn.leaky_relu(x, negative_slope=slope)
    if name == "ReLU":
        return jax.nn.relu
    if name == "GELU":
        return jax.nn.gelu
    if name == "SiLU":
        return jax.nn.silu
    if name == "Tanh":
        return jnp.tanh
    if name == "Sigmoid":
        return jax.nn.sigmoid
    if name == "Softplus":
        return jax.nn.softplus
    if name == "Identity":
        return lambda x: x
    raise NotImplementedError(f"Activation {name} is not supported!")
