"""Fused Pallas GRU scan — the encoder's hot kernel.

The reference's recurrence bottoms out in per-timestep cuDNN-less
Torch GEMMs dispatched from Lua (RNN.lua:153-164 clone loop). The XLA
version (ops/rnn.py) already hoists the input projections; this kernel
removes the remaining per-step overhead by running the WHOLE time loop
inside one Pallas program:

  - recurrent weights live in VMEM for the entire sequence (no HBM
    re-fetch per step; at H=256 the two kernels are 0.75 MB);
  - the hidden state is a VMEM scratch carried across sequential grid
    steps (TPU grid iterations execute in order on a core);
  - per-step work is two MXU matmuls (B,H)@(H,2H) and (B,H)@(H,H) plus
    VPU gates — nothing else touches HBM except the streamed xproj
    block in and the h block out (auto double-buffered by Pallas).

The backward pass is a second Pallas kernel scanning t = L-1..0 that
recomputes the gates from (h_prev, xproj) — no activation stash beyond
the forward outputs — and accumulates dW in VMEM scratch, exposed via
`jax.custom_vjp`.

Math matches ops/cells.py `gru_step_preproj` exactly (reference
GRU.lua:22-30: bias-free gates on concat(h, x), candidate on
concat(r*h, x), h' = (1-z)*h + z*c).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_kernel(xproj_ref, h0_ref, wzr_ref, wh_ref, out_ref, h_scr):
    """Blocks are time-major: xproj_ref (1, B, 3H), out_ref (1, B, H) —
    the TPU tiling constraint wants the last two dims (sublane, lane)
    aligned, so time is the leading (blocked) axis. IO/matmul operands
    run in the input dtype; the carry stays float32."""
    t = pl.program_id(0)
    hdim = wh_ref.shape[1]
    dt = xproj_ref.dtype

    @pl.when(t == 0)
    def _():
        h_scr[:] = h0_ref[:].astype(jnp.float32)

    h = h_scr[:]
    xzr = xproj_ref[0, :, : 2 * hdim].astype(jnp.float32)
    xh = xproj_ref[0, :, 2 * hdim :].astype(jnp.float32)
    zr = jax.nn.sigmoid(
        jnp.dot(h.astype(dt), wzr_ref[:], preferred_element_type=jnp.float32)
        + xzr
    )
    z = zr[:, :hdim]
    r = zr[:, hdim:]
    c = jnp.tanh(
        jnp.dot(
            (r * h).astype(dt), wh_ref[:], preferred_element_type=jnp.float32
        )
        + xh
    )
    h_new = (1.0 - z) * h + z * c
    h_scr[:] = h_new
    out_ref[0, :, :] = h_new.astype(out_ref.dtype)


def _bwd_kernel(
    xproj_ref, hprev_ref, dys_ref, wzr_ref, wh_ref,
    dxproj_ref, dh0_ref, dwzr_ref, dwh_ref,
    dh_scr, dwzr_scr, dwh_scr,
):
    t = pl.program_id(0)  # 0..L-1, blocks map to time L-1-t
    n = pl.num_programs(0)
    hdim = wh_ref.shape[1]

    @pl.when(t == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dwzr_scr[:] = jnp.zeros_like(dwzr_scr)
        dwh_scr[:] = jnp.zeros_like(dwh_scr)

    dt = xproj_ref.dtype
    h_prev = hprev_ref[0, :, :].astype(jnp.float32)
    xzr = xproj_ref[0, :, : 2 * hdim].astype(jnp.float32)
    xh = xproj_ref[0, :, 2 * hdim :].astype(jnp.float32)
    # recompute forward gates
    zr = jax.nn.sigmoid(
        jnp.dot(
            hprev_ref[0, :, :], wzr_ref[:],
            preferred_element_type=jnp.float32,
        )
        + xzr
    )
    z = zr[:, :hdim]
    r = zr[:, hdim:]
    rh = r * h_prev
    c = jnp.tanh(
        jnp.dot(rh.astype(dt), wh_ref[:], preferred_element_type=jnp.float32)
        + xh
    )

    dh = dys_ref[0, :, :].astype(jnp.float32) + dh_scr[:]
    dz = dh * (c - h_prev)
    da_c = dh * z * (1.0 - c * c)
    drh = jnp.dot(
        da_c.astype(dt), wh_ref[:].T, preferred_element_type=jnp.float32
    )
    dr = drh * h_prev
    da_z = dz * z * (1.0 - z)
    da_r = dr * r * (1.0 - r)
    da_zr = jnp.concatenate([da_z, da_r], axis=1)
    dh_prev = (
        drh * r
        + jnp.dot(
            da_zr.astype(dt), wzr_ref[:].T,
            preferred_element_type=jnp.float32,
        )
        + dh * (1.0 - z)
    )

    dxproj_ref[0, :, : 2 * hdim] = da_zr.astype(dxproj_ref.dtype)
    dxproj_ref[0, :, 2 * hdim :] = da_c.astype(dxproj_ref.dtype)
    dwzr_scr[:] += jnp.dot(
        hprev_ref[0, :, :].T, da_zr.astype(dt),
        preferred_element_type=jnp.float32,
    )
    dwh_scr[:] += jnp.dot(
        rh.astype(dt).T, da_c.astype(dt), preferred_element_type=jnp.float32
    )
    dh_scr[:] = dh_prev

    @pl.when(t == n - 1)
    def _():
        dh0_ref[:] = dh_prev.astype(dh0_ref.dtype)
        dwzr_ref[:] = dwzr_scr[:].astype(dwzr_ref.dtype)
        dwh_ref[:] = dwh_scr[:].astype(dwh_ref.dtype)


def _run_fwd(xproj, h0, w_zr_h, w_h_h, interpret=False):
    b, l, _ = xproj.shape
    h = w_h_h.shape[1]
    xproj_t = jnp.swapaxes(xproj, 0, 1)  # (L, B, 3H) time-major
    ys_t = pl.pallas_call(
        _fwd_kernel,
        grid=(l,),
        in_specs=[
            pl.BlockSpec((1, b, 3 * h), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, h), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, 2 * h), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, h), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, b, h), lambda t: (t, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((l, b, h), xproj.dtype),
        scratch_shapes=[pltpu.VMEM((b, h), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * l * b * h * 3 * h + 12 * l * b * h,
            bytes_accessed=4 * (l * b * 4 * h + 3 * h * h),
            transcendentals=3 * l * b * h,
        ),
    )(xproj_t, h0, w_zr_h, w_h_h)
    return jnp.swapaxes(ys_t, 0, 1)


def _run_bwd(xproj, h_prevs, dys, w_zr_h, w_h_h, interpret=False):
    b, l, _ = xproj.shape
    h = w_h_h.shape[1]
    rev = lambda t: (l - 1 - t, 0, 0)
    const2 = lambda t: (0, 0)
    tm = lambda a: jnp.swapaxes(a, 0, 1)  # time-major
    dxproj_t, dh0, dwzr, dwh = pl.pallas_call(
        _bwd_kernel,
        grid=(l,),
        in_specs=[
            pl.BlockSpec((1, b, 3 * h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, 2 * h), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, h), const2, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, b, 3 * h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, h), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, 2 * h), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, h), const2, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((l, b, 3 * h), xproj.dtype),
            jax.ShapeDtypeStruct((b, h), h_prevs.dtype),
            jax.ShapeDtypeStruct((h, 2 * h), w_zr_h.dtype),
            jax.ShapeDtypeStruct((h, h), w_h_h.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, h), jnp.float32),
            pltpu.VMEM((h, 2 * h), jnp.float32),
            pltpu.VMEM((h, h), jnp.float32),
        ],
        interpret=interpret,
    )(tm(xproj), tm(h_prevs), tm(dys), w_zr_h, w_h_h)
    return tm(dxproj_t), dh0, dwzr, dwh


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def gru_scan(xproj, h0, w_zr_h, w_h_h, interpret=False):
    """Fused GRU over time. xproj: (B, L, 3H) precomputed input
    projections (cells.gru_input_proj); h0: (B, H); recurrent kernels
    w_zr_h (H, 2H), w_h_h (H, H). Returns all hidden states (B, L, H).
    """
    return _run_fwd(xproj, h0, w_zr_h, w_h_h, interpret)


def _vjp_fwd(xproj, h0, w_zr_h, w_h_h, interpret=False):
    ys = _run_fwd(xproj, h0, w_zr_h, w_h_h, interpret)
    return ys, (xproj, h0, w_zr_h, w_h_h, ys)


def _vjp_bwd(interpret, res, dys):
    xproj, h0, w_zr_h, w_h_h, ys = res
    h_prevs = jnp.concatenate([h0[:, None, :], ys[:, :-1, :]], axis=1)
    dxproj, dh0, dwzr, dwh = _run_bwd(
        xproj, h_prevs, dys, w_zr_h, w_h_h, interpret
    )
    return dxproj, dh0, dwzr, dwh


gru_scan.defvjp(_vjp_fwd, _vjp_bwd)


def supported(batch: int, hidden: int) -> bool:
    """Shape gate: lanes want H % 128 == 0, sublanes B % 8 == 0."""
    return hidden % 128 == 0 and batch % 8 == 0


# ---------------------------------------------------------------------------
# Fused bidirectional scan: both directions advance in ONE grid step, so a
# BiGRU layer costs L sequential iterations instead of 2L. The directions
# are independent recurrences (reference runs them as separate nn.RNN
# modules, timit/model_chorowski_baseline.lua:22-34); their per-step
# matmuls are small enough to pipeline back-to-back on the MXU inside one
# iteration, hiding most of the second direction's latency.
# ---------------------------------------------------------------------------


# Timesteps per grid iteration: amortizes the per-grid-step overhead
# (block DMA orchestration, revisit bookkeeping) over TBLK steps — the
# dominant cost at recipe shapes, where each step's matmuls are only a
# few microseconds of MXU time. The callers pad L to a multiple.
TBLK = 8


def _bi_fwd_kernel(xproj_ref, h0_ref, wzr_ref, wh_ref, out_ref, h_scr):
    """Direction-stacked blocks: xproj_ref (2, TBLK, B, 3H), h0_ref
    (2, B, H), wzr_ref (2, H, 2H), wh_ref (2, H, H), out_ref
    (2, TBLK, B, H). Direction 1's xproj rows must already be in scan
    order (time-flipped by the caller)."""
    t = pl.program_id(0)
    hdim = wh_ref.shape[2]

    @pl.when(t == 0)
    def _():
        h_scr[:] = h0_ref[:].astype(jnp.float32)

    # Both directions advance in LOCKSTEP inside each timestep so their
    # independent matmul->sigmoid->matmul->tanh chains interleave on the
    # MXU/VPU instead of serializing (they share no data).
    #
    # Mixed precision: IO blocks and matmul operands use the input dtype
    # (bf16 halves HBM traffic and doubles MXU rate); the hidden-state
    # carry and all accumulation stay float32.
    dt = xproj_ref.dtype
    hs = [h_scr[0], h_scr[1]]  # float32 carries
    for i in range(TBLK):
        zrs = [
            jax.nn.sigmoid(
                jnp.dot(
                    hs[d].astype(dt), wzr_ref[d],
                    preferred_element_type=jnp.float32,
                )
                + xproj_ref[d, i, :, : 2 * hdim].astype(jnp.float32)
            )
            for d in range(2)
        ]
        cs = [
            jnp.tanh(
                jnp.dot(
                    (zrs[d][:, hdim:] * hs[d]).astype(dt),
                    wh_ref[d],
                    preferred_element_type=jnp.float32,
                )
                + xproj_ref[d, i, :, 2 * hdim :].astype(jnp.float32)
            )
            for d in range(2)
        ]
        for d in range(2):
            z = zrs[d][:, :hdim]
            hs[d] = (1.0 - z) * hs[d] + z * cs[d]
            out_ref[d, i, :, :] = hs[d].astype(dt)
    h_scr[0] = hs[0]
    h_scr[1] = hs[1]


def _bi_bwd_kernel(
    xproj_ref, hprev_ref, dys_ref, wzr_ref, wh_ref,
    dxproj_ref, dh0_ref, dwzr_ref, dwh_ref,
    dh_scr, dwzr_scr, dwh_scr,
):
    t = pl.program_id(0)
    n = pl.num_programs(0)
    hdim = wh_ref.shape[2]

    @pl.when(t == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dwzr_scr[:] = jnp.zeros_like(dwzr_scr)
        dwh_scr[:] = jnp.zeros_like(dwh_scr)

    dt = xproj_ref.dtype
    for d in range(2):
        dh_carry = dh_scr[d]
        dwzr_acc = dwzr_scr[d]
        dwh_acc = dwh_scr[d]
        for i in reversed(range(TBLK)):
            h_prev = hprev_ref[d, i, :, :].astype(jnp.float32)
            xzr = xproj_ref[d, i, :, : 2 * hdim].astype(jnp.float32)
            xh = xproj_ref[d, i, :, 2 * hdim :].astype(jnp.float32)
            zr = jax.nn.sigmoid(
                jnp.dot(
                    hprev_ref[d, i, :, :], wzr_ref[d],
                    preferred_element_type=jnp.float32,
                )
                + xzr
            )
            z = zr[:, :hdim]
            r = zr[:, hdim:]
            rh = r * h_prev
            c = jnp.tanh(
                jnp.dot(
                    rh.astype(dt), wh_ref[d],
                    preferred_element_type=jnp.float32,
                )
                + xh
            )

            dh = dys_ref[d, i, :, :].astype(jnp.float32) + dh_carry
            dz = dh * (c - h_prev)
            da_c = dh * z * (1.0 - c * c)
            drh = jnp.dot(
                da_c.astype(dt), wh_ref[d].T,
                preferred_element_type=jnp.float32,
            )
            dr = drh * h_prev
            da_z = dz * z * (1.0 - z)
            da_r = dr * r * (1.0 - r)
            da_zr = jnp.concatenate([da_z, da_r], axis=1)
            dh_carry = (
                drh * r
                + jnp.dot(
                    da_zr.astype(dt), wzr_ref[d].T,
                    preferred_element_type=jnp.float32,
                )
                + dh * (1.0 - z)
            )

            dxproj_ref[d, i, :, : 2 * hdim] = da_zr.astype(dt)
            dxproj_ref[d, i, :, 2 * hdim :] = da_c.astype(dt)
            dwzr_acc += jnp.dot(
                hprev_ref[d, i, :, :].T, da_zr.astype(dt),
                preferred_element_type=jnp.float32,
            )
            dwh_acc += jnp.dot(
                rh.astype(dt).T, da_c.astype(dt),
                preferred_element_type=jnp.float32,
            )
        dwzr_scr[d] = dwzr_acc
        dwh_scr[d] = dwh_acc
        dh_scr[d] = dh_carry

    @pl.when(t == n - 1)
    def _():
        dh0_ref[:] = dh_scr[:].astype(dh0_ref.dtype)
        dwzr_ref[:] = dwzr_scr[:].astype(dwzr_ref.dtype)
        dwh_ref[:] = dwh_scr[:].astype(dwh_ref.dtype)


def _pad_time(a, lp):
    """Zero-pad the time (axis 1 of a (2, L, B, X) array) up to lp."""
    l = a.shape[1]
    if l == lp:
        return a
    return jnp.pad(a, ((0, 0), (0, lp - l), (0, 0), (0, 0)))


def _bi_run_fwd(xproj2, h02, wzr2, wh2, interpret=False):
    _, b, l, _ = xproj2.shape
    h = wh2.shape[2]
    # Scan-order END padding is harmless: padded steps run after every
    # valid one and their outputs are sliced off below.
    lp = -(-l // TBLK) * TBLK
    nblk = lp // TBLK
    xproj_t = _pad_time(jnp.swapaxes(xproj2, 1, 2), lp)  # (2, Lp, B, 3H)
    ys_t = pl.pallas_call(
        _bi_fwd_kernel,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((2, TBLK, b, 3 * h), lambda t: (0, t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, b, h), lambda t: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, h, 2 * h), lambda t: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, h, h), lambda t: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (2, TBLK, b, h), lambda t: (0, t, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((2, lp, b, h), xproj2.dtype),
        scratch_shapes=[pltpu.VMEM((2, b, h), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * (2 * l * b * h * 3 * h + 12 * l * b * h),
            bytes_accessed=2 * 4 * (l * b * 4 * h + 3 * h * h),
            transcendentals=2 * 3 * l * b * h,
        ),
    )(xproj_t, h02, wzr2, wh2)
    return jnp.swapaxes(ys_t[:, :l], 1, 2)  # (2, B, L, H)


def _bi_run_bwd(xproj2, h_prevs2, dys2, wzr2, wh2, interpret=False):
    _, b, l, _ = xproj2.shape
    h = wh2.shape[2]
    lp = -(-l // TBLK) * TBLK
    nblk = lp // TBLK
    # Padded (scan-order tail) steps see dys=0 so every grad they emit
    # is exactly zero and dh carries through them unchanged; they run
    # FIRST in the reversed sweep, before any valid step.
    rev = lambda t: (0, nblk - 1 - t, 0, 0)
    const3 = lambda t: (0, 0, 0)
    tm = lambda a: _pad_time(jnp.swapaxes(a, 1, 2), lp)  # (2, Lp, B, .)
    dxproj_t, dh0, dwzr, dwh = pl.pallas_call(
        _bi_bwd_kernel,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((2, TBLK, b, 3 * h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, TBLK, b, h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, TBLK, b, h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, h, 2 * h), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, h, h), const3, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((2, TBLK, b, 3 * h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, b, h), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, h, 2 * h), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, h, h), const3, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((2, lp, b, 3 * h), xproj2.dtype),
            jax.ShapeDtypeStruct((2, b, h), h_prevs2.dtype),
            jax.ShapeDtypeStruct((2, h, 2 * h), wzr2.dtype),
            jax.ShapeDtypeStruct((2, h, h), wh2.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, b, h), jnp.float32),
            pltpu.VMEM((2, h, 2 * h), jnp.float32),
            pltpu.VMEM((2, h, h), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(tm(xproj2), tm(h_prevs2), tm(dys2), wzr2, wh2)
    return jnp.swapaxes(dxproj_t[:, :l], 1, 2), dh0, dwzr, dwh


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def bigru_scan(xproj2, h02, wzr2, wh2, interpret=False):
    """Fused bidirectional GRU over time.

    xproj2: (2, B, L, 3H) precomputed input projections, direction 0 in
    natural time order and direction 1 already time-flipped into scan
    order; h02: (2, B, H); wzr2: (2, H, 2H); wh2: (2, H, H). Returns all
    hidden states (2, B, L, H), direction 1 in scan order (caller flips
    back).
    """
    return _bi_run_fwd(xproj2, h02, wzr2, wh2, interpret)


def _bi_vjp_fwd(xproj2, h02, wzr2, wh2, interpret=False):
    ys = _bi_run_fwd(xproj2, h02, wzr2, wh2, interpret)
    return ys, (xproj2, h02, wzr2, wh2, ys)


def _bi_vjp_bwd(interpret, res, dys):
    xproj2, h02, wzr2, wh2, ys = res
    h_prevs = jnp.concatenate([h02[:, :, None, :], ys[:, :, :-1, :]], axis=2)
    return _bi_run_bwd(xproj2, h_prevs, dys, wzr2, wh2, interpret)


bigru_scan.defvjp(_bi_vjp_fwd, _bi_vjp_bwd)
