"""Parameter initializers matching the reference's effective init.

The reference model applies `trunc_normal_(std=0.02)` to every nn.Linear
weight and zeros to biases at the model level
(`models/vmamba_Fusion_efficross.py:836-851`), leaves Conv2d at the torch
default (kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in)), noted "Conv2D is
not intialized !!!" at `:843`), and gives the stacked SSM parameters their own
schemes (dt: `models/cross.py:542-566`; A: S4D-real `:568-583`; D: ones
`:585-595`).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.nn.initializers import Initializer


def trunc_normal(std: float = 0.02) -> Initializer:
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)
    return init


def torch_conv_kernel() -> Initializer:
    """Torch Conv default: U(+-1/sqrt(fan_in)); kernel layout HWIO.

    fan_in = kh * kw * in_ch (in_ch is already the per-group input size for
    HWIO feature-group convs).
    """
    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[0] * shape[1] * shape[2]
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def torch_conv_bias(fan_in: int) -> Initializer:
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def dt_proj_weight(dt_rank: int, dt_scale: float = 1.0) -> Initializer:
    """U(+-dt_rank^-0.5 * dt_scale) (`models/cross.py:548-552`)."""
    def init(key, shape, dtype=jnp.float32):
        std = dt_rank ** -0.5 * dt_scale
        return jax.random.uniform(key, shape, dtype, -std, std)
    return init


def dt_proj_bias(dt_min: float = 0.001, dt_max: float = 0.1,
                 dt_init_floor: float = 1e-4) -> Initializer:
    """Inverse-softplus of log-uniform dt (`models/cross.py:556-564`)."""
    def init(key, shape, dtype=jnp.float32):
        dt = jnp.exp(
            jax.random.uniform(key, shape, dtype)
            * (math.log(dt_max) - math.log(dt_min)) + math.log(dt_min)
        )
        dt = jnp.clip(dt, min=dt_init_floor)
        return dt + jnp.log(-jnp.expm1(-dt))
    return init


def a_log_s4d(d_state: int) -> Initializer:
    """S4D-real: A_log[d, n] = log(n+1) (`models/cross.py:568-583`).

    Shape convention here: (..., d_inner, d_state)."""
    def init(key, shape, dtype=jnp.float32):
        del key
        a = jnp.arange(1, d_state + 1, dtype=dtype)
        return jnp.broadcast_to(jnp.log(a), shape)
    return init
