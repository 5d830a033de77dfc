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


# ---------------------------------------------------------------------------
# Flip-free bidirectional scan. The flip_sequences gathers (and the
# direction stack) around bigru_scan cost more than the recurrence at
# recipe shapes. The reference GRU is bias-free (LinearZeroBias,
# GRU.lua:22-30), so the zero state is an exact fixed point under zero
# input: the backward direction can scan the NATURAL-order array from
# the padded tail down — it holds h = 0 exactly through the zero
# padding, then consumes the valid frames in reverse — and write its
# outputs straight into natural positions via a reversed block index
# map. No host-side flips, no stacked copy. Requires zero padding and
# zero-masked layer outputs (ops/rnn.py does both).
# ---------------------------------------------------------------------------


def _bi2_fwd_kernel(
    xf_ref, xb_ref, wzr_ref, wh_ref, outf_ref, outb_ref, h_scr
):
    """xf blocks ascend in time; xb blocks arrive in REVERSED block
    order (dir 1 scans natural positions descending). Both directions
    advance in lockstep so their chains interleave."""
    t = pl.program_id(0)
    hdim = wh_ref.shape[2]
    dt = xf_ref.dtype
    f32 = jnp.float32

    @pl.when(t == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)

    hs = [h_scr[0], h_scr[1]]
    for i in range(TBLK):
        ib = TBLK - 1 - i
        xs = (xf_ref[i], xb_ref[ib])
        zrs = [
            jax.nn.sigmoid(
                jnp.dot(hs[d].astype(dt), wzr_ref[d],
                        preferred_element_type=f32)
                + xs[d][:, : 2 * hdim].astype(f32)
            )
            for d in range(2)
        ]
        cs = [
            jnp.tanh(
                jnp.dot(
                    (zrs[d][:, hdim:] * hs[d]).astype(dt), wh_ref[d],
                    preferred_element_type=f32,
                )
                + xs[d][:, 2 * hdim :].astype(f32)
            )
            for d in range(2)
        ]
        for d in range(2):
            z = zrs[d][:, :hdim]
            hs[d] = (1.0 - z) * hs[d] + z * cs[d]
        outf_ref[i] = hs[0].astype(outf_ref.dtype)
        outb_ref[ib] = hs[1].astype(outb_ref.dtype)
    h_scr[0] = hs[0]
    h_scr[1] = hs[1]


def _bi2_bwd_kernel(
    xf_ref, xb_ref, hpf_ref, hpb_ref, dysf_ref, dysb_ref,
    wzr_ref, wh_ref,
    dxf_ref, dxb_ref, dwzr_ref, dwh_ref,
    dh_scr, dwzr_scr, dwh_scr,
):
    """Reversed sweeps per direction: dir 0's blocks arrive time-
    descending (inner loop descending), dir 1's time-ascending (its
    forward ran descending). hpf[p] = ysf[p-1] (zeros at 0);
    hpb[p] = ysb[p+1] (zeros at the padded tail)."""
    t = pl.program_id(0)
    hdim = wh_ref.shape[2]
    dt = xf_ref.dtype
    f32 = jnp.float32

    @pl.when(t == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dwzr_scr[:] = jnp.zeros_like(dwzr_scr)
        dwh_scr[:] = jnp.zeros_like(dwh_scr)

    carries = [dh_scr[0], dh_scr[1]]
    waccs = [dwzr_scr[0], dwzr_scr[1]]
    haccs = [dwh_scr[0], dwh_scr[1]]
    for i in range(TBLK):
        i0 = TBLK - 1 - i  # dir 0: descending within the reversed block
        i1 = i  # dir 1: ascending within the natural block
        for d, (x_ref, hp_ref, dys_ref, dx_ref, ii) in enumerate((
            (xf_ref, hpf_ref, dysf_ref, dxf_ref, i0),
            (xb_ref, hpb_ref, dysb_ref, dxb_ref, i1),
        )):
            h_prev = hp_ref[ii].astype(f32)
            xzr = x_ref[ii, :, : 2 * hdim].astype(f32)
            xh = x_ref[ii, :, 2 * hdim :].astype(f32)
            zr = jax.nn.sigmoid(
                jnp.dot(hp_ref[ii], wzr_ref[d], preferred_element_type=f32)
                + xzr
            )
            z = zr[:, :hdim]
            r = zr[:, hdim:]
            rh = r * h_prev
            c = jnp.tanh(
                jnp.dot(rh.astype(dt), wh_ref[d], preferred_element_type=f32)
                + xh
            )
            dh = dys_ref[ii].astype(f32) + carries[d]
            dz = dh * (c - h_prev)
            da_c = dh * z * (1.0 - c * c)
            drh = jnp.dot(
                da_c.astype(dt), wh_ref[d].T, preferred_element_type=f32
            )
            dr = drh * h_prev
            da_z = dz * z * (1.0 - z)
            da_r = dr * r * (1.0 - r)
            da_zr = jnp.concatenate([da_z, da_r], axis=1)
            carries[d] = (
                drh * r
                + jnp.dot(
                    da_zr.astype(dt), wzr_ref[d].T,
                    preferred_element_type=f32,
                )
                + dh * (1.0 - z)
            )
            dx_ref[ii, :, : 2 * hdim] = da_zr.astype(dx_ref.dtype)
            dx_ref[ii, :, 2 * hdim :] = da_c.astype(dx_ref.dtype)
            waccs[d] += jnp.dot(
                hp_ref[ii].T, da_zr.astype(dt), preferred_element_type=f32
            )
            haccs[d] += jnp.dot(
                rh.astype(dt).T, da_c.astype(dt), preferred_element_type=f32
            )
    for d in range(2):
        dh_scr[d] = carries[d]
        dwzr_scr[d] = waccs[d]
        dwh_scr[d] = haccs[d]

    @pl.when(t == pl.num_programs(0) - 1)
    def _():
        dwzr_ref[:] = dwzr_scr[:].astype(dwzr_ref.dtype)
        dwh_ref[:] = dwh_scr[:].astype(dwh_ref.dtype)


def _pad_time2(a, lp):
    """Zero-pad time (axis 0 of a (L, B, X) array) up to lp."""
    l = a.shape[0]
    if l == lp:
        return a
    return jnp.pad(a, ((0, lp - l), (0, 0), (0, 0)))


def _bi2_run_fwd(xf, xb, wzr2, wh2, interpret=False):
    b, l, _ = xf.shape
    h = wh2.shape[2]
    lp = -(-l // TBLK) * TBLK
    nblk = lp // TBLK
    tm = lambda a: _pad_time2(jnp.swapaxes(a, 0, 1), lp)  # (Lp, B, 3H)
    nat = lambda t: (t, 0, 0)
    rev = lambda t: (nblk - 1 - t, 0, 0)
    cw = lambda t: (0, 0, 0)
    ysf, ysb = pl.pallas_call(
        _bi2_fwd_kernel,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((TBLK, b, 3 * h), nat, memory_space=pltpu.VMEM),
            pl.BlockSpec((TBLK, b, 3 * h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, h, 2 * h), cw, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, h, h), cw, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TBLK, b, h), nat, memory_space=pltpu.VMEM),
            pl.BlockSpec((TBLK, b, h), rev, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((lp, b, h), xf.dtype),
            jax.ShapeDtypeStruct((lp, b, h), xf.dtype),
        ],
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
    )(tm(xf), tm(xb), wzr2, wh2)
    sw = lambda a: jnp.swapaxes(a[:l], 0, 1)
    return sw(ysf), sw(ysb)


def _bi2_run_bwd(xf, xb, ysf, ysb, dysf, dysb, wzr2, wh2, interpret=False):
    b, l, _ = xf.shape
    h = wh2.shape[2]
    lp = -(-l // TBLK) * TBLK
    nblk = lp // TBLK
    tm = lambda a: _pad_time2(jnp.swapaxes(a, 0, 1), lp)
    # hpf[p] = ysf[p-1] (zeros at 0); hpb[p] = ysb[p+1] (zeros at tail:
    # padded positions of ysb are exactly zero by the fixed-point
    # argument, so the plain time-major pad already provides them).
    ysf_t, ysb_t = tm(ysf), tm(ysb)
    hpf = jnp.concatenate([jnp.zeros_like(ysf_t[:1]), ysf_t[:-1]], axis=0)
    hpb = jnp.concatenate([ysb_t[1:], jnp.zeros_like(ysb_t[:1])], axis=0)
    nat = lambda t: (t, 0, 0)
    rev = lambda t: (nblk - 1 - t, 0, 0)
    cw = lambda t: (0, 0, 0)
    blk = lambda m, x_dim: pl.BlockSpec(
        (TBLK, b, x_dim), m, memory_space=pltpu.VMEM
    )
    dxf_t, dxb_t, dwzr, dwh = pl.pallas_call(
        _bi2_bwd_kernel,
        grid=(nblk,),
        in_specs=[
            blk(rev, 3 * h), blk(nat, 3 * h),
            blk(rev, h), blk(nat, h),
            blk(rev, h), blk(nat, h),
            pl.BlockSpec((2, h, 2 * h), cw, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, h, h), cw, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            blk(rev, 3 * h), blk(nat, 3 * h),
            pl.BlockSpec((2, h, 2 * h), cw, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, h, h), cw, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((lp, b, 3 * h), xf.dtype),
            jax.ShapeDtypeStruct((lp, b, 3 * h), xb.dtype),
            jax.ShapeDtypeStruct(wzr2.shape, wzr2.dtype),
            jax.ShapeDtypeStruct(wh2.shape, wh2.dtype),
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
    )(tm(xf), tm(xb), hpf, hpb, tm(dysf), tm(dysb), wzr2, wh2)
    sw = lambda a: jnp.swapaxes(a[:l], 0, 1)
    return sw(dxf_t), sw(dxb_t), dwzr, dwh


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def bigru_scan2(xf, xb, wzr2, wh2, interpret=False):
    """Flip-free fused bidirectional GRU.

    xf/xb: (B, L, 3H) NATURAL-order input projections for the forward
    and backward directions (zero-padded tails); wzr2 (2, H, 2H),
    wh2 (2, H, H). Returns (ysf, ysb) both in natural time order, with
    ysb exactly zero on padding. Initial states are zeros (the only
    case bigru_layer uses; required by the fixed-point argument).
    """
    return _bi2_run_fwd(xf, xb, wzr2, wh2, interpret)


def _bi2_vjp_fwd(xf, xb, wzr2, wh2, interpret=False):
    ys = _bi2_run_fwd(xf, xb, wzr2, wh2, interpret)
    return ys, (xf, xb, wzr2, wh2, ys[0], ys[1])


def _bi2_vjp_bwd(interpret, res, dys):
    xf, xb, wzr2, wh2, ysf, ysb = res
    dysf, dysb = dys
    return _bi2_run_bwd(xf, xb, ysf, ysb, dysf, dysb, wzr2, wh2, interpret)


bigru_scan2.defvjp(_bi2_vjp_fwd, _bi2_vjp_bwd)
