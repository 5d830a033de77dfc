"""Convolution / pooling primitives on padded batches.

TPU-native equivalents of the reference's Torch C/CUDA kernels
(SURVEY.md §2.5): TemporalConvolution -> `lax.conv_general_dilated`
(NWC layout), TemporalMaxPooling / SpatialMaxPooling ->
`lax.reduce_window`. All ops use VALID padding like the stock Torch
modules; length bookkeeping helpers compute the transformed true
lengths for padded batches.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def _torch_conv_init(key, fan_in, shape, dtype):
    bound = 1.0 / jnp.sqrt(jnp.asarray(fan_in, dtype=jnp.float32))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def temporal_conv_init(
    key, dim_in: int, dim_out: int, k: int, bias: bool = True, dtype=jnp.float32
) -> Params:
    """TemporalConvolution(dim_in, dim_out, k) params; kernel (k, in, out)."""
    kw, kb = jax.random.split(key)
    fan_in = dim_in * k
    p: Params = {"w": _torch_conv_init(kw, fan_in, (k, dim_in, dim_out), dtype)}
    if bias:
        p["b"] = _torch_conv_init(kb, fan_in, (dim_out,), dtype)
    return p


def temporal_conv(params: Params, x: jnp.ndarray, stride: int = 1) -> jnp.ndarray:
    """VALID 1-D conv over time. x: (B, L, C_in) -> (B, L', C_out)."""
    y = jax.lax.conv_general_dilated(
        x,
        params["w"],
        window_strides=(stride,),
        padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    if "b" in params:
        y = y + params["b"]
    return y


def temporal_max_pool(x: jnp.ndarray, k: int, stride: int | None = None) -> jnp.ndarray:
    """TemporalMaxPooling(k, stride). x: (B, L, C)."""
    stride = stride or k
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, 1), (1, stride, 1), "VALID"
    )


def spatial_conv_init(
    key, c_in: int, c_out: int, kh: int, kw: int, dtype=jnp.float32
) -> Params:
    """SpatialConvolutionMM params; kernel (kh, kw, c_in, c_out) for NHWC."""
    k1, k2 = jax.random.split(key)
    fan_in = c_in * kh * kw
    return {
        "w": _torch_conv_init(k1, fan_in, (kh, kw, c_in, c_out), dtype),
        "b": _torch_conv_init(k2, fan_in, (c_out,), dtype),
    }


def spatial_conv(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """VALID 2-D conv. x: (B, H, W, C_in) -> (B, H', W', C_out)."""
    y = jax.lax.conv_general_dilated(
        x,
        params["w"],
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + params["b"]


def spatial_max_pool(
    x: jnp.ndarray, kh: int, kw: int, sh: int, sw: int
) -> jnp.ndarray:
    """SpatialMaxPooling over (H, W) of NHWC."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, kh, kw, 1), (1, sh, sw, 1), "VALID"
    )


def conv_out_length(lengths: jnp.ndarray, k: int, stride: int = 1) -> jnp.ndarray:
    """True-length transform for a VALID conv/pool of size k, stride s."""
    return jnp.maximum((lengths - k) // stride + 1, 0)
