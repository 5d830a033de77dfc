"""Sequence recurrence via lax.scan — the TPU replacement for the
reference's clone-per-timestep BPTT engine (RNN.lua, Recurrent.lua).

The whole clone/parameter-rebinding machinery (RNN.lua:24-62) collapses
into `lax.scan` over the time axis with parameters closed over once;
backprop-through-time is just `jax.grad` through the scan. Input-side
projections are hoisted out of the scan into one large MXU matmul
(cells.gru_input_proj / lstm_input_proj) so the sequential part does
only the recurrent (H x nH) matmuls.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from . import cells
from .masking import flip_sequences

Params = Dict[str, Any]


def _pallas_available(batch: int, hidden: int, dtype=jnp.float32) -> bool:
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    from .pallas import gru_scan as _gs

    # bf16 tiles want 16 sublanes (f32: 8) — gate the batch accordingly.
    if dtype == jnp.bfloat16 and batch % 16 != 0:
        return False
    return _gs.supported(batch, hidden)


def _pallas_interpret() -> bool:
    """Forced-pallas runs off-TPU (tests) use Pallas interpret mode."""
    return jax.default_backend() not in ("tpu", "axon")


def gru_layer(
    params: Params,
    x: jnp.ndarray,
    lengths: jnp.ndarray | None = None,
    reverse: bool = False,
    h0: jnp.ndarray | None = None,
    unroll: int = 1,
    backend: str = "auto",
) -> jnp.ndarray:
    """Run a GRU over a padded batch. x: (B, L, I) -> (B, L, H).

    `reverse=True` runs the scan backward over each sequence's true
    length (reference nn.RNN(reverse) at RNN.lua:143-153): inputs are
    flipped about `lengths`, scanned forward, and flipped back, so
    output[t] for a reverse layer is the state after consuming
    x[t..len-1], with padding untouched.

    backend: "auto" uses the fused Pallas time-scan kernel on TPU when
    shapes are tile-friendly; "xla" forces lax.scan; "pallas" forces
    the kernel.
    """
    h_dim = params["w_zr"].shape[1] // 2
    if reverse:
        if lengths is None:
            x = x[:, ::-1]
        else:
            x = flip_sequences(x, lengths)
    xproj = cells.gru_input_proj(params, x)  # (B, L, 3H) one big matmul
    if h0 is None:
        h0 = jnp.zeros((x.shape[0], h_dim), x.dtype)

    use_pallas = backend == "pallas" or (
        backend == "auto" and _pallas_available(x.shape[0], h_dim, x.dtype)
    )
    if use_pallas:
        from .pallas import gru_scan as _gs

        # gru_step_preproj expects xproj blocks (xz|xr|xh) matching the
        # fused kernel layout; recurrent halves of the stored kernels.
        ys = _gs.gru_scan(
            xproj, h0, params["w_zr"][:h_dim], params["w_h"][:h_dim],
            _pallas_interpret(),
        )
    else:
        def step(h, xp_t):
            h = cells.gru_step_preproj(params, xp_t, h)
            return h, h

        _, ys = jax.lax.scan(step, h0, jnp.swapaxes(xproj, 0, 1), unroll=unroll)
        ys = jnp.swapaxes(ys, 0, 1)  # (B, L, H)
    if reverse:
        if lengths is None:
            ys = ys[:, ::-1]
        else:
            ys = flip_sequences(ys, lengths)
    return ys


def lstm_layer(
    params: Params,
    x: jnp.ndarray,
    lengths: jnp.ndarray | None = None,
    reverse: bool = False,
    unroll: int = 1,
) -> jnp.ndarray:
    """Run an LSTM over a padded batch. x: (B, L, I) -> (B, L, H)."""
    h_dim = params["w_h"].shape[0]
    if reverse:
        if lengths is None:
            x = x[:, ::-1]
        else:
            x = flip_sequences(x, lengths)
    xproj = cells.lstm_input_proj(params, x)
    b = x.shape[0]
    state0 = (jnp.zeros((b, h_dim), x.dtype), jnp.zeros((b, h_dim), x.dtype))

    def step(state, xp_t):
        state = cells.lstm_step_preproj(params, xp_t, state)
        return state, state[0]

    _, ys = jax.lax.scan(step, state0, jnp.swapaxes(xproj, 0, 1), unroll=unroll)
    ys = jnp.swapaxes(ys, 0, 1)
    if reverse:
        if lengths is None:
            ys = ys[:, ::-1]
        else:
            ys = flip_sequences(ys, lengths)
    return ys


def bigru_init(key, dim_in: int, dim_out: int, dtype=jnp.float32) -> Params:
    kf, kb = jax.random.split(key)
    return {
        "fwd": cells.gru_init(kf, dim_in, dim_out, dtype),
        "bwd": cells.gru_init(kb, dim_in, dim_out, dtype),
    }


def bigru_layer(
    params: Params,
    x: jnp.ndarray,
    lengths: jnp.ndarray | None = None,
    unroll: int = 1,
    backend: str = "auto",
) -> jnp.ndarray:
    """Bidirectional GRU: concat(fwd, bwd) along features (B, L, 2H).

    Mirrors the fRNN/bRNN + JoinTable pairs of the Chorowski encoder
    (reference timit/model_chorowski_baseline.lua:22-34). On TPU the
    two directions run in ONE fused Pallas scan (L sequential grid
    steps instead of 2L — the directions are independent, so their
    per-step matmuls pipeline inside one iteration).
    """
    h_dim = params["fwd"]["w_zr"].shape[1] // 2
    if lengths is not None:
        # Padded positions are zeroed on every layer's OUTPUT: the
        # bias-free GRU holds h = 0 exactly under zero input, which
        # lets the fused kernel run the backward direction over the
        # natural-order array (no flip_sequences gathers) — valid
        # positions are bit-identical, padding is zero instead of the
        # reference's don't-care garbage (masked downstream anyway).
        mask = (
            jnp.arange(x.shape[1])[None, :] < lengths[:, None]
        ).astype(x.dtype)[:, :, None]
        x = x * mask
    use_pallas = backend == "pallas" or (
        backend == "auto" and _pallas_available(x.shape[0], h_dim, x.dtype)
    )
    if use_pallas:
        from .pallas import gru_scan as _gs

        xf = cells.gru_input_proj(params["fwd"], x)
        xb = cells.gru_input_proj(params["bwd"], x)
        wzr2 = jnp.stack(
            [params["fwd"]["w_zr"][:h_dim], params["bwd"]["w_zr"][:h_dim]]
        )
        wh2 = jnp.stack(
            [params["fwd"]["w_h"][:h_dim], params["bwd"]["w_h"][:h_dim]]
        )
        fwd, bwd = _gs.bigru_scan2(xf, xb, wzr2, wh2, _pallas_interpret())
        ys = jnp.concatenate([fwd, bwd], axis=-1)
    else:
        fwd = gru_layer(params["fwd"], x, lengths, reverse=False, unroll=unroll, backend=backend)
        bwd = gru_layer(params["bwd"], x, lengths, reverse=True, unroll=unroll, backend=backend)
        ys = jnp.concatenate([fwd, bwd], axis=-1)
    if lengths is not None:
        ys = ys * mask
    return ys


def bilstm_init(
    key, dim_in: int, dim_out: int, peepholes: bool = False, dtype=jnp.float32
) -> Params:
    kf, kb = jax.random.split(key)
    return {
        "fwd": cells.lstm_init(kf, dim_in, dim_out, peepholes, dtype),
        "bwd": cells.lstm_init(kb, dim_in, dim_out, peepholes, dtype),
    }


def bilstm_layer(
    params: Params,
    x: jnp.ndarray,
    lengths: jnp.ndarray | None = None,
    unroll: int = 1,
    backend: str = "auto",
) -> jnp.ndarray:
    """Bidirectional LSTM: concat(fwd, bwd) (B, L, 2H). On TPU both
    directions run in one fused Pallas scan (ops/pallas/lstm_scan.py)
    when the cell has no peepholes and shapes are tile-friendly."""
    h_dim = params["fwd"]["w_h"].shape[0]
    no_peep = "w_peep" not in params["fwd"]
    use_pallas = no_peep and (
        backend == "pallas"
        or (
            backend == "auto"
            and jax.default_backend() in ("tpu", "axon")
            and x.shape[0] % 8 == 0
            and h_dim % 128 == 0
        )
    )
    if use_pallas:
        from .pallas import lstm_scan as _ls

        if lengths is not None:
            xb = flip_sequences(x, lengths)
        else:
            xb = x[:, ::-1]
        xproj2 = jnp.stack(
            [
                cells.lstm_input_proj(params["fwd"], x),
                cells.lstm_input_proj(params["bwd"], xb),
            ]
        )
        z2 = jnp.zeros((2, x.shape[0], h_dim), jnp.float32)
        wh2 = jnp.stack([params["fwd"]["w_h"], params["bwd"]["w_h"]])
        ys2 = _ls.bilstm_scan(xproj2, z2, z2, wh2, _pallas_interpret())
        fwd, bwd = ys2[0], ys2[1]
        if lengths is not None:
            bwd = flip_sequences(bwd, lengths)
        else:
            bwd = bwd[:, ::-1]
        # lstm_scan carries/outputs float32; hand back the input dtype
        # so bf16 models stay bf16 end-to-end (the XLA branch below
        # already does — a f32 annotation under bf16 compute broke the
        # conv_bilstm location conv with a dtype mismatch on TPU).
        return jnp.concatenate([fwd, bwd], axis=-1).astype(x.dtype)
    fwd = lstm_layer(params["fwd"], x, lengths, reverse=False, unroll=unroll)
    bwd = lstm_layer(params["bwd"], x, lengths, reverse=True, unroll=unroll)
    return jnp.concatenate([fwd, bwd], axis=-1)
