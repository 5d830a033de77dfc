"""Fused bidirectional LSTM time-scan kernel.

Same design as gru_scan.bigru_scan (see that module's docstring): both
directions of a BiLSTM layer advance in ONE sequential grid step with
the recurrent kernels resident in VMEM; the input projections
``x @ w_x + b`` are hoisted outside (cells.lstm_input_proj). Used by
the conv+BiLSTM TIMIT encoder (reference timit/timit.lua:122-124 —
fwd/bwd nn.RNN(nn.LSTM(256,128)) pairs; peepholes are OFF there, the
Lua `False` globals at timit.lua:122-123 are nil — SURVEY.md quirks).

Gate math matches cells.lstm_step_preproj exactly (gate order
in/forget/cell/out, LSTM.lua:25-58). The backward kernel recomputes
the gates from (h_prev, c_prev, xproj) — forward saves the cell-state
sequence so no per-gate activation stash is needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gates(xproj_t, h, w_h, hdim):
    gates = xproj_t + jnp.dot(h, w_h, preferred_element_type=jnp.float32)
    i = jax.nn.sigmoid(gates[:, :hdim])
    f = jax.nn.sigmoid(gates[:, hdim : 2 * hdim])
    g = jnp.tanh(gates[:, 2 * hdim : 3 * hdim])
    o = jax.nn.sigmoid(gates[:, 3 * hdim :])
    return i, f, g, o


def _fwd_kernel(xproj_ref, h0_ref, c0_ref, wh_ref, h_out, c_out, h_scr, c_scr):
    """Direction-stacked, time-major blocks: xproj_ref (2, 1, B, 4H),
    h0/c0 (2, B, H), wh_ref (2, H, 4H), outputs (2, 1, B, H)."""
    t = pl.program_id(0)
    hdim = wh_ref.shape[1]

    @pl.when(t == 0)
    def _():
        h_scr[:] = h0_ref[:]
        c_scr[:] = c0_ref[:]

    for d in range(2):
        h, c = h_scr[d], c_scr[d]
        i, f, g, o = _gates(xproj_ref[d, 0], h, wh_ref[d], hdim)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        h_scr[d] = h_new
        c_scr[d] = c_new
        h_out[d, 0] = h_new
        c_out[d, 0] = c_new


def _bwd_kernel(
    xproj_ref, hprev_ref, cprev_ref, dys_ref, wh_ref,
    dxproj_ref, dh0_ref, dc0_ref, dwh_ref,
    dh_scr, dc_scr, dwh_scr,
):
    t = pl.program_id(0)
    n = pl.num_programs(0)
    hdim = wh_ref.shape[1]

    @pl.when(t == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dc_scr[:] = jnp.zeros_like(dc_scr)
        dwh_scr[:] = jnp.zeros_like(dwh_scr)

    for d in range(2):
        h_prev = hprev_ref[d, 0]
        c_prev = cprev_ref[d, 0]
        i, f, g, o = _gates(xproj_ref[d, 0], h_prev, wh_ref[d], hdim)
        c_new = f * c_prev + i * g
        tc = jnp.tanh(c_new)

        dh = dys_ref[d, 0] + dh_scr[d]
        do = dh * tc
        dc = dc_scr[d] + dh * o * (1.0 - tc * tc)
        da_o = do * o * (1.0 - o)
        df = dc * c_prev
        da_f = df * f * (1.0 - f)
        di = dc * g
        da_i = di * i * (1.0 - i)
        dg = dc * i
        da_g = dg * (1.0 - g * g)
        da = jnp.concatenate([da_i, da_f, da_g, da_o], axis=-1)
        dxproj_ref[d, 0] = da
        dh_scr[d] = jnp.dot(da, wh_ref[d].T, preferred_element_type=jnp.float32)
        dc_scr[d] = dc * f
        dwh_scr[d] += jnp.dot(h_prev.T, da, preferred_element_type=jnp.float32)

    @pl.when(t == n - 1)
    def _():
        dh0_ref[:] = dh_scr[:]
        dc0_ref[:] = dc_scr[:]
        dwh_ref[:] = dwh_scr[:]


def _run_fwd(xproj2, h02, c02, wh2, interpret=False):
    _, b, l, _ = xproj2.shape
    h = wh2.shape[1]
    xproj_t = jnp.swapaxes(xproj2, 1, 2)  # (2, L, B, 4H)
    h_t, c_t = pl.pallas_call(
        _fwd_kernel,
        grid=(l,),
        in_specs=[
            pl.BlockSpec((2, 1, b, 4 * h), lambda t: (0, t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, b, h), lambda t: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, b, h), lambda t: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, h, 4 * h), lambda t: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((2, 1, b, h), lambda t: (0, t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 1, b, h), lambda t: (0, t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((2, l, b, h), jnp.float32),
            jax.ShapeDtypeStruct((2, l, b, h), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, b, h), jnp.float32),
            pltpu.VMEM((2, b, h), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * (2 * l * b * h * 4 * h + 16 * l * b * h),
            bytes_accessed=2 * 4 * (l * b * 6 * h + 4 * h * h),
            transcendentals=2 * 5 * l * b * h,
        ),
    )(xproj_t, h02, c02, wh2)
    sw = lambda a: jnp.swapaxes(a, 1, 2)
    return sw(h_t), sw(c_t)


def _run_bwd(xproj2, h_prevs2, c_prevs2, dys2, wh2, interpret=False):
    _, b, l, _ = xproj2.shape
    h = wh2.shape[1]
    rev = lambda t: (0, l - 1 - t, 0, 0)
    const3 = lambda t: (0, 0, 0)
    tm = lambda a: jnp.swapaxes(a, 1, 2)
    dxproj_t, dh0, dc0, dwh = pl.pallas_call(
        _bwd_kernel,
        grid=(l,),
        in_specs=[
            pl.BlockSpec((2, 1, b, 4 * h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 1, b, h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 1, b, h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 1, b, h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, h, 4 * h), const3, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((2, 1, b, 4 * h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, b, h), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, b, h), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, h, 4 * h), const3, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((2, l, b, 4 * h), jnp.float32),
            jax.ShapeDtypeStruct((2, b, h), jnp.float32),
            jax.ShapeDtypeStruct((2, b, h), jnp.float32),
            jax.ShapeDtypeStruct((2, h, 4 * h), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, b, h), jnp.float32),
            pltpu.VMEM((2, b, h), jnp.float32),
            pltpu.VMEM((2, h, 4 * h), jnp.float32),
        ],
        interpret=interpret,
    )(tm(xproj2), tm(h_prevs2), tm(c_prevs2), tm(dys2), wh2)
    return tm(dxproj_t), dh0, dc0, dwh


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def bilstm_scan(xproj2, h02, c02, wh2, interpret=False):
    """Fused bidirectional LSTM over time (no peepholes).

    xproj2: (2, B, L, 4H) precomputed ``x @ w_x + b`` per direction,
    direction 1 already time-flipped into scan order; h02/c02: (2, B, H)
    initial states; wh2: (2, H, 4H) recurrent kernels. Returns hidden
    states (2, B, L, H), direction 1 in scan order.
    """
    return _run_fwd(xproj2, h02, c02, wh2, interpret)[0]


def _vjp_fwd(xproj2, h02, c02, wh2, interpret=False):
    hs, cs = _run_fwd(xproj2, h02, c02, wh2, interpret)
    return hs, (xproj2, h02, c02, wh2, hs, cs)


def _vjp_bwd(interpret, res, dys):
    xproj2, h02, c02, wh2, hs, cs = res
    h_prevs = jnp.concatenate([h02[:, :, None, :], hs[:, :, :-1, :]], axis=2)
    c_prevs = jnp.concatenate([c02[:, :, None, :], cs[:, :, :-1, :]], axis=2)
    return _run_bwd(xproj2, h_prevs, c_prevs, dys, wh2, interpret)


bilstm_scan.defvjp(_vjp_fwd, _vjp_bwd)


def supported(batch: int, hidden: int) -> bool:
    return hidden % 128 == 0 and batch % 8 == 0
