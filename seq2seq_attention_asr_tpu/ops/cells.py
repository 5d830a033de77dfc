"""Recurrent cell math as pure step functions.

Semantics match the reference cells:
  - GRU: /root/reference/GRU.lua:22-30 — bias-free gates computed on
    ``concat([prev_h, x])`` (note the join order), candidate on
    ``concat([r * prev_h, x])``, and the update
    ``h = (1 - z) * prev_h + z * h_cand``.
  - LSTM: /root/reference/LSTM.lua:25-58 — per-gate input and recurrent
    affine maps (both with biases), optional peephole connections
    (prev_c for in/forget gates, next_c for the output gate).

TPU-first notes: cells are pure ``(params, x, state) -> state`` functions
driven by ``lax.scan`` (see ops/rnn.py); the three GRU gate matmuls are
fused into a single MXU matmul by concatenating gate kernels, and the
input-side projection can be hoisted out of the scan entirely
(``gru_input_proj``) so the recurrent step is a lone (H x 3H) matmul.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def _torch_linear_init(key, fan_in: int, shape, dtype) -> jnp.ndarray:
    """Torch's default nn.Linear init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / jnp.sqrt(jnp.asarray(fan_in, dtype=jnp.float32))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


# ---------------------------------------------------------------------------
# GRU
# ---------------------------------------------------------------------------


def gru_init(key, dim_in: int, dim_out: int, dtype=jnp.float32) -> Params:
    """Bias-free GRU parameters (reference GRU.lua uses LinearZeroBias).

    Kernels are stored input-major ``(dim_in + dim_out, dim_out)`` acting on
    ``concat([prev_h, x])``; the z/r gate kernels are fused along the output
    axis into ``w_zr`` of shape ``(H + I, 2H)`` so one matmul feeds both
    sigmoids.
    """
    k1, k2, k3 = jax.random.split(key, 3)
    fan_in = dim_in + dim_out
    w_z = _torch_linear_init(k1, fan_in, (fan_in, dim_out), dtype)
    w_r = _torch_linear_init(k2, fan_in, (fan_in, dim_out), dtype)
    w_h = _torch_linear_init(k3, fan_in, (fan_in, dim_out), dtype)
    return {"w_zr": jnp.concatenate([w_z, w_r], axis=1), "w_h": w_h}


def gru_step(params: Params, x: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """One GRU step. x: (..., I), h: (..., H) -> new h (..., H)."""
    hx = jnp.concatenate([h, x], axis=-1)
    zr = jax.nn.sigmoid(hx @ params["w_zr"])
    z, r = jnp.split(zr, 2, axis=-1)
    rh_x = jnp.concatenate([r * h, x], axis=-1)
    h_cand = jnp.tanh(rh_x @ params["w_h"])
    return (1.0 - z) * h + z * h_cand


def gru_input_proj(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Hoistable input-side projection for a whole sequence.

    Splits each kernel into its recurrent (first H rows) and input
    (last I rows) halves and applies the input halves to ``x`` in one big
    MXU matmul: returns ``x @ [Wz_x | Wr_x | Wh_x]`` of shape (..., 3H).
    Use with :func:`gru_step_preproj` inside the scan.
    """
    h_dim = params["w_zr"].shape[1] // 2
    wx = jnp.concatenate([params["w_zr"][h_dim:], params["w_h"][h_dim:]], axis=1)
    return x @ wx


def gru_step_preproj(params: Params, xproj: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """GRU step given the precomputed input projection (..., 3H).

    Only the recurrent matmuls remain: ``h @ Wzr_h`` (fused z,r) and
    ``(r*h) @ Wh_h``.
    """
    h_dim = params["w_zr"].shape[1] // 2
    w_zr_h = params["w_zr"][:h_dim]
    w_h_h = params["w_h"][:h_dim]
    xz, xr, xh = jnp.split(xproj, 3, axis=-1)
    zr = jax.nn.sigmoid(h @ w_zr_h + jnp.concatenate([xz, xr], axis=-1))
    z, r = jnp.split(zr, 2, axis=-1)
    h_cand = jnp.tanh((r * h) @ w_h_h + xh)
    return (1.0 - z) * h + z * h_cand


# ---------------------------------------------------------------------------
# LSTM
# ---------------------------------------------------------------------------


def lstm_init(
    key, dim_in: int, dim_out: int, peepholes: bool = False, dtype=jnp.float32
) -> Params:
    """LSTM parameters, gate order (in, forget, cell, out).

    Each gate has an input map (I, H) + bias and a recurrent map (H, H)
    + bias, fused along the output axis into ``w_x`` (I, 4H), ``w_h``
    (H, 4H), ``b`` (4H) [two biases summed — mathematically identical to
    the reference's separate i2h/h2h biases at LSTM.lua:26-27].
    Peepholes add diagonal-free full (H, H) maps + biases for the in,
    forget (on prev_c) and out (on next_c) gates, matching the
    reference's nn.Linear peepholes (LSTM.lua:31).
    """
    keys = jax.random.split(key, 16)
    wx = [_torch_linear_init(keys[i], dim_in, (dim_in, dim_out), dtype) for i in range(4)]
    wh = [_torch_linear_init(keys[4 + i], dim_out, (dim_out, dim_out), dtype) for i in range(4)]
    bx = [_torch_linear_init(keys[8 + i], dim_in, (dim_out,), dtype) for i in range(4)]
    bh = [_torch_linear_init(keys[12 + i], dim_out, (dim_out,), dtype) for i in range(4)]
    params: Params = {
        "w_x": jnp.concatenate(wx, axis=1),
        "w_h": jnp.concatenate(wh, axis=1),
        "b": jnp.concatenate([a + b for a, b in zip(bx, bh)], axis=0),
    }
    if peepholes:
        kp = jax.random.split(keys[0], 6)
        params["w_peep"] = {
            "in": _torch_linear_init(kp[0], dim_out, (dim_out, dim_out), dtype),
            "forget": _torch_linear_init(kp[1], dim_out, (dim_out, dim_out), dtype),
            "out": _torch_linear_init(kp[2], dim_out, (dim_out, dim_out), dtype),
            "b_in": _torch_linear_init(kp[3], dim_out, (dim_out,), dtype),
            "b_forget": _torch_linear_init(kp[4], dim_out, (dim_out,), dtype),
            "b_out": _torch_linear_init(kp[5], dim_out, (dim_out,), dtype),
        }
    return params


def lstm_step(
    params: Params, x: jnp.ndarray, state: Tuple[jnp.ndarray, jnp.ndarray]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One LSTM step. state = (h, c); returns (new_h, new_c)."""
    h, c = state
    gates = x @ params["w_x"] + h @ params["w_h"] + params["b"]
    g_in, g_forget, g_cell, g_out = jnp.split(gates, 4, axis=-1)
    peep = params.get("w_peep")
    if peep is not None:
        g_in = g_in + c @ peep["in"] + peep["b_in"]
        g_forget = g_forget + c @ peep["forget"] + peep["b_forget"]
    i = jax.nn.sigmoid(g_in)
    f = jax.nn.sigmoid(g_forget)
    g = jnp.tanh(g_cell)
    new_c = f * c + i * g
    if peep is not None:
        g_out = g_out + new_c @ peep["out"] + peep["b_out"]
    o = jax.nn.sigmoid(g_out)
    new_h = o * jnp.tanh(new_c)
    return new_h, new_c


def lstm_input_proj(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Hoistable input projection ``x @ w_x + b`` for a whole sequence."""
    return x @ params["w_x"] + params["b"]


def lstm_step_preproj(
    params: Params, xproj: jnp.ndarray, state: Tuple[jnp.ndarray, jnp.ndarray]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """LSTM step given precomputed ``x @ w_x + b`` (..., 4H)."""
    h, c = state
    gates = xproj + h @ params["w_h"]
    g_in, g_forget, g_cell, g_out = jnp.split(gates, 4, axis=-1)
    peep = params.get("w_peep")
    if peep is not None:
        g_in = g_in + c @ peep["in"] + peep["b_in"]
        g_forget = g_forget + c @ peep["forget"] + peep["b_forget"]
    i = jax.nn.sigmoid(g_in)
    f = jax.nn.sigmoid(g_forget)
    g = jnp.tanh(g_cell)
    new_c = f * c + i * g
    if peep is not None:
        g_out = g_out + new_c @ peep["out"] + peep["b_out"]
    o = jax.nn.sigmoid(g_out)
    new_h = o * jnp.tanh(new_c)
    return new_h, new_c
