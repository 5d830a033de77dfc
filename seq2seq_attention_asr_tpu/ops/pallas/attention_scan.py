"""Fused attention-decoder scan — the decoder's hot kernel.

The teacher-forced decoder (ops/attention.py decode_teacher_forced,
re-design of reference Attention.lua:305-322 + RNNAttention.lua:144-185)
is a T-step sequential scan where every step reads the full projected
annotations Vh (B, L, S) and annotations h (B, L, A) from HBM to compute

    e   = w_e . tanh(Vh + Ws s_prev)        (B, L)
    alpha = masked_softmax(e)               (B, L)
    c   = alpha^T h                         (B, A)
    r   = W_dec [W_c c + b_c ; yin_t] + b_dec
    s   = GRU(r, s_prev)

Under lax.scan that is ~(|Vh| + |h|) bytes of HBM traffic PER STEP
(~19 MB at the TIMIT recipe shape) — the decoder is bandwidth-bound.
This kernel runs the whole scan with Vh/h RESIDENT IN VMEM for a block
of the batch: grid (B/BB, T) with t innermost, so the (BB, L, .) blocks
are fetched once per batch block and every step's traffic is just the
small per-step inputs/outputs.

Scope (must match `supported()` below): GRU decoder cell with mem
passthrough, both content-only attention (feature_maps == 0, the
flagship exp_logmel7_chorowski recipe — `_fwd_kernel`/`_bwd_kernel`)
AND location-aware attention (feature_maps > 0, e.g. the conv+BiLSTM
TIMIT recipe — `_fwd_kernel_loc`:~162 / `_bwd_kernel_loc`:~435 fuse the
conv-over-previous-alpha UF term, Attention.lua:73-99, into the same
scan). The XLA scan path remains for LSTM decoder cells, sequence
sharding, and shapes `choose_block` rejects. Penalty-active configs run
fused too: the monotonic ramp is injected OUTSIDE the kernel as an
extra cotangent on the saved alpha sequence
(ops/monotonic.py::monotonic_alignment_seq).

The backward pass is a second Pallas kernel scanning t reversed that
recomputes the step (tanh energies, gates) from the saved (alpha, s, c)
sequences — no (B, T, L, S) activation stash — and accumulates dVh/dh
per batch block and weight grads across the whole grid in resident
output blocks, exposed via `jax.custom_vjp`.

Weight layout note: biases are passed 2D (1, X) so they tile cleanly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30  # matches ops/masking.py


def _conv_pads(filt_size: int):
    """Reference conv padding (Attention.lua:77-85): odd filters pad
    (f-1)/2 both sides; even filters pad f/2 left, f/2-1 right."""
    if filt_size % 2 == 1:
        return (filt_size - 1) // 2, (filt_size - 1) // 2
    return filt_size // 2, filt_size // 2 - 1


def _location_term(alpha_prev, wconv, bconv, u, dt, pl, pr):
    """UF = (conv1d(alpha_prev) + b) @ u on a (BB, L) block -> (BB, L, S).

    The 1-in-channel conv is f shifted outer products in feature space
    (FM is small), then one MXU matmul into score space. Returns
    (uf, feat) — feat (BB, L, FM) is reused by the backward pass.
    """
    bb, l = alpha_prev.shape
    f, fm = wconv.shape
    ap = jnp.pad(alpha_prev, ((0, 0), (pl, pr)))
    # Mosaic-safe conv: the minor-expand of an OFFSET lane slice is an
    # unsupported reshape, so compute each tap's outer product at the
    # full padded width (offset 0) and slice the 3-D result's sublane
    # axis instead.
    ap3 = ap[:, :, None]  # (BB, W, 1), offset 0
    feat = jnp.broadcast_to(
        bconv.astype(jnp.float32)[None, :, :], (bb, l, fm)
    )
    wc = wconv.astype(jnp.float32)
    for j in range(f):
        pj = ap3 * wc[j : j + 1, :][None, :, :]  # (BB, W, FM)
        feat = feat + pj[:, j : j + l, :]
    uf = jnp.dot(
        feat.reshape(bb * l, fm).astype(dt), u,
        preferred_element_type=jnp.float32,
    ).reshape(bb, l, u.shape[1])
    return uf, feat


def _step_core(vh, h, mask, yin_t, s_prev, w, dt, uf=None, cell="gru",
               mem_prev=None):
    """Shared forward math for one decoder step on a (BB, ...) block.

    Returns (alpha, c, s_new, mem_new, a) where a = tanh(z) is kept for
    reuse; mem_new is None for the GRU cell (mem passthrough lives in
    the caller). All math runs float32; `dt` is the IO/matmul-operand
    dtype (bf16 under mixed precision — halves HBM traffic, doubles MXU
    rate). `uf` is the optional location-attention term (BB, L, S).

    cell="gru": w["cell_w1"] = fused z/r gate kernel (2St, 2St),
    w["cell_w2"] = candidate kernel (2St, St), both on concat(s_prev, r)
    (cells.gru_step layout, GRU.lua:22-30 — bias-free).
    cell="lstm": w["cell_w1"] = fused gate kernel (2St, 4St) =
    concat([w_h, w_x], axis=0) acting on concat(s_prev, r),
    w["cell_w2"] = bias row (1, 4St); gate order (in, forget, cell,
    out) per cells.lstm_init (LSTM.lua:25-58, no peepholes).
    """
    st = w["dec_w"].shape[1]
    ws = jnp.dot(
        s_prev.astype(dt), w["ws_w"], preferred_element_type=jnp.float32
    ) + w["ws_b"].astype(jnp.float32)
    z = vh.astype(jnp.float32) + ws[:, None, :]
    if uf is not None:
        z = z + uf
    a = jnp.tanh(z)
    e = jnp.sum(a * w["w_e"][0].astype(jnp.float32)[None, None, :], axis=-1)
    e = jnp.where(mask > 0, e, NEG_INF)
    m = jnp.max(e, axis=-1, keepdims=True)
    p = jnp.exp(e - m) * (mask > 0)
    alpha = p / jnp.sum(p, axis=-1, keepdims=True)
    c = jnp.sum(alpha[:, :, None] * h.astype(jnp.float32), axis=1)  # (BB, A)
    cc = jnp.dot(
        c.astype(dt), w["c_w"], preferred_element_type=jnp.float32
    ) + w["c_b"].astype(jnp.float32)
    rr = jnp.concatenate([cc, yin_t.astype(jnp.float32)], axis=-1)
    r = jnp.dot(
        rr.astype(dt), w["dec_w"], preferred_element_type=jnp.float32
    ) + w["dec_b"].astype(jnp.float32)
    sr = jnp.concatenate([s_prev, r], axis=-1)
    if cell == "lstm":
        gates = jnp.dot(
            sr.astype(dt), w["cell_w1"], preferred_element_type=jnp.float32
        ) + w["cell_w2"].astype(jnp.float32)
        ig = jax.nn.sigmoid(gates[:, :st])
        fg = jax.nn.sigmoid(gates[:, st : 2 * st])
        gg = jnp.tanh(gates[:, 2 * st : 3 * st])
        og = jax.nn.sigmoid(gates[:, 3 * st :])
        mem_new = fg * mem_prev + ig * gg
        s_new = og * jnp.tanh(mem_new)
        return alpha, c, s_new, mem_new, a
    zr = jax.nn.sigmoid(
        jnp.dot(sr.astype(dt), w["cell_w1"], preferred_element_type=jnp.float32)
    )
    zg, rg = zr[:, :st], zr[:, st:]
    cand = jnp.tanh(
        jnp.dot(
            jnp.concatenate([rg * s_prev, r], axis=-1).astype(dt),
            w["cell_w2"],
            preferred_element_type=jnp.float32,
        )
    )
    s_new = (1.0 - zg) * s_prev + zg * cand
    return alpha, c, s_new, None, a


def _weights_dict(ws_w, ws_b, w_e, c_w, c_b, dec_w, dec_b, cell_w1, cell_w2):
    return {
        "ws_w": ws_w[:], "ws_b": ws_b[:], "w_e": w_e[:],
        "c_w": c_w[:], "c_b": c_b[:], "dec_w": dec_w[:], "dec_b": dec_b[:],
        "cell_w1": cell_w1[:], "cell_w2": cell_w2[:],
    }


def _fwd_kernel(
    vh_ref, h_ref, mask_ref, yin_ref,
    ws_w, ws_b, w_e, c_w, c_b, dec_w, dec_b, gru_wzr, gru_wh,
    s_out, c_out, alpha_out,
    s_scr,
):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        s_scr[:] = jnp.zeros_like(s_scr)

    w = _weights_dict(ws_w, ws_b, w_e, c_w, c_b, dec_w, dec_b, gru_wzr, gru_wh)
    dt = vh_ref.dtype
    alpha, c, s_new, _, _ = _step_core(
        vh_ref[:], h_ref[:], mask_ref[:].astype(jnp.float32), yin_ref[0],
        s_scr[:], w, dt,
    )
    s_scr[:] = s_new
    s_out[0] = s_new.astype(s_out.dtype)
    c_out[0] = c.astype(c_out.dtype)
    alpha_out[0] = alpha.astype(alpha_out.dtype)


def _fwd_kernel_lstm(
    vh_ref, h_ref, mask_ref, yin_ref,
    ws_w, ws_b, w_e, c_w, c_b, dec_w, dec_b, cell_w1, cell_w2,
    s_out, c_out, alpha_out, mem_out,
    s_scr, mem_scr,
):
    """LSTM decoder-cell variant (conv_bilstm recipe, timit.lua:137):
    the cell state `mem` is a second VMEM-scratch carry and is ALSO
    written out per step — the backward recompute needs mem_prev."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        s_scr[:] = jnp.zeros_like(s_scr)
        mem_scr[:] = jnp.zeros_like(mem_scr)

    w = _weights_dict(ws_w, ws_b, w_e, c_w, c_b, dec_w, dec_b, cell_w1, cell_w2)
    dt = vh_ref.dtype
    alpha, c, s_new, mem_new, _ = _step_core(
        vh_ref[:], h_ref[:], mask_ref[:].astype(jnp.float32), yin_ref[0],
        s_scr[:], w, dt, cell="lstm", mem_prev=mem_scr[:],
    )
    s_scr[:] = s_new
    mem_scr[:] = mem_new
    s_out[0] = s_new.astype(s_out.dtype)
    c_out[0] = c.astype(c_out.dtype)
    alpha_out[0] = alpha.astype(alpha_out.dtype)
    mem_out[0] = mem_new.astype(mem_out.dtype)


def _fwd_kernel_loc(
    pl_pr,
    vh_ref, h_ref, mask_ref, yin_ref,
    ws_w, ws_b, w_e, c_w, c_b, dec_w, dec_b, gru_wzr, gru_wh,
    wconv, bconv, u_ref,
    s_out, c_out, alpha_out,
    s_scr, alpha_scr,
):
    """Location-aware variant: the conv-over-previous-alignment UF term
    (Attention.lua:73-99) is fused into the step; alpha is carried in a
    VMEM scratch (the reference's per-utterance alpha state,
    Attention.lua:305-322, initialised to zeros)."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        s_scr[:] = jnp.zeros_like(s_scr)
        alpha_scr[:] = jnp.zeros_like(alpha_scr)

    w = _weights_dict(ws_w, ws_b, w_e, c_w, c_b, dec_w, dec_b, gru_wzr, gru_wh)
    dt = vh_ref.dtype
    uf, _ = _location_term(
        alpha_scr[:], wconv[:], bconv[:], u_ref[:], dt, *pl_pr
    )
    alpha, c, s_new, _, _ = _step_core(
        vh_ref[:], h_ref[:], mask_ref[:].astype(jnp.float32), yin_ref[0],
        s_scr[:], w, dt, uf=uf,
    )
    s_scr[:] = s_new
    alpha_scr[:] = alpha
    s_out[0] = s_new.astype(s_out.dtype)
    c_out[0] = c.astype(c_out.dtype)
    alpha_out[0] = alpha.astype(alpha_out.dtype)


def _fwd_kernel_loc_lstm(
    pl_pr,
    vh_ref, h_ref, mask_ref, yin_ref,
    ws_w, ws_b, w_e, c_w, c_b, dec_w, dec_b, cell_w1, cell_w2,
    wconv, bconv, u_ref,
    s_out, c_out, alpha_out, mem_out,
    s_scr, alpha_scr, mem_scr,
):
    """Location-aware + LSTM decoder cell (the conv_bilstm recipe:
    featMaps 16, LSTM decoder — timit.lua:128-155)."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        s_scr[:] = jnp.zeros_like(s_scr)
        alpha_scr[:] = jnp.zeros_like(alpha_scr)
        mem_scr[:] = jnp.zeros_like(mem_scr)

    w = _weights_dict(ws_w, ws_b, w_e, c_w, c_b, dec_w, dec_b, cell_w1, cell_w2)
    dt = vh_ref.dtype
    uf, _ = _location_term(
        alpha_scr[:], wconv[:], bconv[:], u_ref[:], dt, *pl_pr
    )
    alpha, c, s_new, mem_new, _ = _step_core(
        vh_ref[:], h_ref[:], mask_ref[:].astype(jnp.float32), yin_ref[0],
        s_scr[:], w, dt, uf=uf, cell="lstm", mem_prev=mem_scr[:],
    )
    s_scr[:] = s_new
    alpha_scr[:] = alpha
    mem_scr[:] = mem_new
    s_out[0] = s_new.astype(s_out.dtype)
    c_out[0] = c.astype(c_out.dtype)
    alpha_out[0] = alpha.astype(alpha_out.dtype)
    mem_out[0] = mem_new.astype(mem_out.dtype)


def _run_fwd(
    vh, h, enc_mask, yin,
    ws_w, ws_b, w_e, c_w, c_b, dec_w, dec_b, cell_w1, cell_w2,
    block_b, interpret, loc=None, cell="gru",
):
    """loc: optional (wconv (f, FM), bconv (1, FM), u (FM, S)) for the
    fused location-aware (feature_maps > 0) attention. cell="lstm"
    additionally returns the cell-state sequence mem_seq (the backward
    recompute needs mem_prev per step)."""
    b, l, s_dim = vh.shape
    a_dim = h.shape[2]
    t_len = yin.shape[1]
    st = dec_w.shape[1]
    bb = min(block_b, b)
    assert b % bb == 0, (b, bb)
    nb = b // bb
    c2 = lambda i, t: (0, 0)
    lstm = cell == "lstm"
    # Per-step (T, B, X) arrays are TIME-MAJOR so their blocks are
    # (1, bb, X) — the TPU tiling wants the last two dims (sublane,
    # lane) aligned, so time must be the leading (blocked) axis.
    yin_t = jnp.swapaxes(yin, 0, 1)  # (T, B, St)
    in_specs = [
        pl.BlockSpec((bb, l, s_dim), lambda i, t: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bb, l, a_dim), lambda i, t: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bb, l), lambda i, t: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bb, st), lambda i, t: (t, i, 0), memory_space=pltpu.VMEM),
    ] + [
        pl.BlockSpec(wgt.shape, c2, memory_space=pltpu.VMEM)
        for wgt in (ws_w, ws_b, w_e, c_w, c_b, dec_w, dec_b, cell_w1, cell_w2)
    ]
    args = [vh, h, enc_mask, yin_t, ws_w, ws_b, w_e, c_w, c_b, dec_w,
            dec_b, cell_w1, cell_w2]
    scratch = [pltpu.VMEM((bb, st), jnp.float32)]
    if loc is None:
        kernel = _fwd_kernel_lstm if lstm else _fwd_kernel
    else:
        wconv, bconv, u = loc
        kernel = functools.partial(
            _fwd_kernel_loc_lstm if lstm else _fwd_kernel_loc,
            _conv_pads(wconv.shape[0]),
        )
        in_specs += [
            pl.BlockSpec(wconv.shape, c2, memory_space=pltpu.VMEM),
            pl.BlockSpec(bconv.shape, c2, memory_space=pltpu.VMEM),
            pl.BlockSpec(u.shape, c2, memory_space=pltpu.VMEM),
        ]
        args += [wconv, bconv, u]
        scratch.append(pltpu.VMEM((bb, l), jnp.float32))
    out_specs = [
        pl.BlockSpec((1, bb, st), lambda i, t: (t, i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bb, a_dim), lambda i, t: (t, i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bb, l), lambda i, t: (t, i, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((t_len, b, st), vh.dtype),
        jax.ShapeDtypeStruct((t_len, b, a_dim), vh.dtype),
        jax.ShapeDtypeStruct((t_len, b, l), vh.dtype),
    ]
    if lstm:
        out_specs.append(
            pl.BlockSpec((1, bb, st), lambda i, t: (t, i, 0), memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((t_len, b, st), vh.dtype))
        scratch.append(pltpu.VMEM((bb, st), jnp.float32))  # mem carry
    outs = pl.pallas_call(
        kernel,
        grid=(nb, t_len),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t_len * l * (s_dim + a_dim),
            bytes_accessed=4 * (b * l * (s_dim + a_dim) + b * t_len * (st + a_dim + l)),
            transcendentals=b * t_len * l * s_dim,
        ),
    )(*args)
    sw = lambda a: jnp.swapaxes(a, 0, 1)
    return tuple(sw(o) for o in outs)


def _bwd_kernel(
    vh_ref, h_ref, mask_ref, yin_ref,
    ws_w, ws_b, w_e, c_w, c_b, dec_w, dec_b, gru_wzr, gru_wh,
    sprev_ref, c_ref, ds_ref, dc_ref, dalpha_ref,
    dvh_ref, dh_ref, dyin_ref,
    dws_w, dws_b, dw_e, dc_w, dc_b, ddec_w, ddec_b, dgru_wzr, dgru_wh,
    ds_scr,
):
    """Grid (nb, T), t counts 0..T-1 but blocks map to step T-1-t."""
    i = pl.program_id(0)
    t = pl.program_id(1)
    n = pl.num_programs(1)
    st = dec_w.shape[1]

    @pl.when(t == 0)
    def _():
        ds_scr[:] = jnp.zeros_like(ds_scr)
        dvh_ref[:] = jnp.zeros_like(dvh_ref)
        dh_ref[:] = jnp.zeros_like(dh_ref)

    @pl.when(jnp.logical_and(i == 0, t == 0))
    def _():
        dws_w[:] = jnp.zeros_like(dws_w)
        dws_b[:] = jnp.zeros_like(dws_b)
        dw_e[:] = jnp.zeros_like(dw_e)
        dc_w[:] = jnp.zeros_like(dc_w)
        dc_b[:] = jnp.zeros_like(dc_b)
        ddec_w[:] = jnp.zeros_like(ddec_w)
        ddec_b[:] = jnp.zeros_like(ddec_b)
        dgru_wzr[:] = jnp.zeros_like(dgru_wzr)
        dgru_wh[:] = jnp.zeros_like(dgru_wh)

    w = _weights_dict(ws_w, ws_b, w_e, c_w, c_b, dec_w, dec_b, gru_wzr, gru_wh)
    _bwd_core(
        t, n, w, vh_ref.dtype,
        vh_ref, h_ref, mask_ref, yin_ref,
        sprev_ref, c_ref, ds_ref, dc_ref, dalpha_ref,
        dvh_ref, dh_ref, dyin_ref,
        dws_w, dws_b, dw_e, dc_w, dc_b, ddec_w, ddec_b, dgru_wzr, dgru_wh,
        ds_scr,
    )


def _bwd_core(
    t, n, w, dt,
    vh_ref, h_ref, mask_ref, yin_ref,
    sprev_ref, c_ref, ds_ref, dc_ref, dalpha_ref,
    dvh_ref, dh_ref, dyin_ref,
    dws_w, dws_b, dw_e, dc_w, dc_b, ddec_w, ddec_b, dcell_w1, dcell_w2,
    ds_scr,
    uf=None, dalpha_extra=None,
    cell="gru", memprev_ref=None, dmem_ref=None, dmem_scr=None,
):
    """Shared backward step: recompute the forward (float32 math, `dt`
    matmul operands), then backprop through the cell / decoder MLP /
    context / masked softmax / energies, accumulating into the grad
    refs.

    `uf` is the optional location term for the recompute;
    `dalpha_extra` an extra alpha cotangent (the location kernel's
    cross-step carry). cell="lstm" additionally consumes memprev_ref
    (the saved cell-state sequence shifted by one), dmem_ref (the
    external mem_seq cotangent) and dmem_scr (the cross-step dmem
    chain). Returns (dz, alpha, s_prev) for the caller's
    location-gradient section.
    """
    st = w["dec_w"].shape[1]
    f32 = jnp.float32
    vh = vh_ref[:].astype(f32)
    h = h_ref[:].astype(f32)
    mask = mask_ref[:].astype(f32)
    yin_t = yin_ref[0].astype(f32)
    # s_prev: the saved s sequence shifted by one; the (clamped) block
    # at step 0 is garbage and replaced by the zero initial state.
    rev_is_first = t == n - 1  # reversed-time step 0
    s_prev = jnp.where(rev_is_first, 0.0, sprev_ref[0].astype(f32))
    c_saved = c_ref[0].astype(f32)

    # --- recompute the step (float32 math, dt matmul operands) ---
    mm = lambda x, ww: jnp.dot(x.astype(dt), ww, preferred_element_type=f32)
    mmT = lambda x, ww: jnp.dot(
        x.astype(dt), ww.T, preferred_element_type=f32
    )
    ws = mm(s_prev, w["ws_w"]) + w["ws_b"].astype(f32)
    z = vh + ws[:, None, :]
    if uf is not None:
        z = z + uf
    a = jnp.tanh(z)
    e = jnp.sum(a * w["w_e"][0].astype(f32)[None, None, :], axis=-1)
    e = jnp.where(mask > 0, e, NEG_INF)
    m = jnp.max(e, axis=-1, keepdims=True)
    p = jnp.exp(e - m) * (mask > 0)
    alpha = p / jnp.sum(p, axis=-1, keepdims=True)
    cc = mm(c_saved, w["c_w"]) + w["c_b"].astype(f32)
    rr = jnp.concatenate([cc, yin_t], axis=-1)
    r = mm(rr, w["dec_w"]) + w["dec_b"].astype(f32)
    sr = jnp.concatenate([s_prev, r], axis=-1)
    ds = ds_ref[0].astype(f32) + ds_scr[:]
    if cell == "lstm":
        # recompute gates + cell state (order in/forget/cell/out,
        # cells.lstm_step without peepholes)
        mem_prev = jnp.where(rev_is_first, 0.0, memprev_ref[0].astype(f32))
        gates = mm(sr, w["cell_w1"]) + w["cell_w2"].astype(f32)
        ig = jax.nn.sigmoid(gates[:, :st])
        fg = jax.nn.sigmoid(gates[:, st : 2 * st])
        gg = jnp.tanh(gates[:, 2 * st : 3 * st])
        og = jax.nn.sigmoid(gates[:, 3 * st :])
        mem_new = fg * mem_prev + ig * gg
        tm = jnp.tanh(mem_new)

        # --- backward through the LSTM ---
        dmem_total = (
            ds * og * (1.0 - tm * tm)
            + dmem_ref[0].astype(f32)
            + dmem_scr[:]
        )
        do_ = ds * tm * og * (1.0 - og)
        di_ = dmem_total * gg * ig * (1.0 - ig)
        df_ = dmem_total * mem_prev * fg * (1.0 - fg)
        dg_ = dmem_total * ig * (1.0 - gg * gg)
        dmem_scr[:] = dmem_total * fg  # chains to step t-1
        dgates = jnp.concatenate([di_, df_, dg_, do_], axis=-1)
        dsr = mmT(dgates, w["cell_w1"])
        ds_prev = dsr[:, :st]
        dr = dsr[:, st:]
        dcell_w1[:] += jnp.dot(
            sr.astype(dt).T, dgates.astype(dt), preferred_element_type=f32
        )
        dcell_w2[:] += jnp.sum(dgates, axis=0, keepdims=True)
    else:
        zr = jax.nn.sigmoid(mm(sr, w["cell_w1"]))
        zg, rg = zr[:, :st], zr[:, st:]
        rgs = rg * s_prev
        cand_in = jnp.concatenate([rgs, r], axis=-1)
        cand = jnp.tanh(mm(cand_in, w["cell_w2"]))

        # --- backward through the GRU ---
        dzg = ds * (cand - s_prev)
        dcand = ds * zg
        da_cand = dcand * (1.0 - cand * cand)
        dcand_in = mmT(da_cand, w["cell_w2"])
        drgs = dcand_in[:, :st]
        dr = dcand_in[:, st:]
        drg = drgs * s_prev
        da_z = dzg * zg * (1.0 - zg)
        da_r = drg * rg * (1.0 - rg)
        da_zr = jnp.concatenate([da_z, da_r], axis=-1)
        dsr = mmT(da_zr, w["cell_w1"])
        ds_prev = dsr[:, :st] + drgs * rg + ds * (1.0 - zg)
        dr = dr + dsr[:, st:]
        dcell_w2[:] += jnp.dot(
            cand_in.astype(dt).T, da_cand.astype(dt), preferred_element_type=f32
        )
        dcell_w1[:] += jnp.dot(
            sr.astype(dt).T, da_zr.astype(dt), preferred_element_type=f32
        )

    # --- backward through the decoder-input MLP ---
    drr = mmT(dr, w["dec_w"])
    ddec_w[:] += jnp.dot(
        rr.astype(dt).T, dr.astype(dt), preferred_element_type=f32
    )
    ddec_b[:] += jnp.sum(dr, axis=0, keepdims=True)
    dcc = drr[:, :st]
    dyin_ref[0] = drr[:, st:].astype(dyin_ref.dtype)
    dc = mmT(dcc, w["c_w"])
    dc_w[:] += jnp.dot(
        c_saved.astype(dt).T, dcc.astype(dt), preferred_element_type=f32
    )
    dc_b[:] += jnp.sum(dcc, axis=0, keepdims=True)
    dc = dc + dc_ref[0].astype(f32)

    # --- backward through the context (+ optional alpha-chain carry) ---
    dalpha = jnp.sum(dc[:, None, :] * h, axis=-1) + dalpha_ref[0].astype(f32)
    if dalpha_extra is not None:
        dalpha = dalpha + dalpha_extra
    dh_ref[:] += alpha[:, :, None] * dc[:, None, :]

    # --- backward through the masked softmax ---
    de = alpha * (dalpha - jnp.sum(dalpha * alpha, axis=-1, keepdims=True))

    # --- backward through the energies ---
    da = de[:, :, None] * w["w_e"][0].astype(f32)[None, None, :]
    dw_e[:] += jnp.sum(a * de[:, :, None], axis=(0, 1))[None, :]
    dz = da * (1.0 - a * a)
    dvh_ref[:] += dz
    dws = jnp.sum(dz, axis=1)  # (BB, S)
    ds_prev = ds_prev + mmT(dws, w["ws_w"])
    dws_w[:] += jnp.dot(
        s_prev.astype(dt).T, dws.astype(dt), preferred_element_type=f32
    )
    # NOTE: summing dws (itself an axis-1 reduction of dz) over axis 0
    # trips a Mosaic relayout bug ("non-singleton logical dimension is
    # replicated in destination but not in source"); the fused (0, 1)
    # reduction of dz lowers cleanly.
    dws_b[:] += jnp.sum(dz, axis=(0, 1))[None, :]

    ds_scr[:] = ds_prev
    return dz, alpha, s_prev


def _bwd_kernel_lstm(
    vh_ref, h_ref, mask_ref, yin_ref,
    ws_w, ws_b, w_e, c_w, c_b, dec_w, dec_b, cell_w1, cell_w2,
    sprev_ref, memprev_ref, c_ref, ds_ref, dmem_ref, dc_ref, dalpha_ref,
    dvh_ref, dh_ref, dyin_ref,
    dws_w, dws_b, dw_e, dc_w, dc_b, ddec_w, ddec_b, dcell_w1, dcell_w2,
    ds_scr, dmem_scr,
):
    """LSTM decoder-cell backward (grid (nb, T), t reversed): identical
    structure to _bwd_kernel with the cell-state chain carried in a
    second scratch and the saved mem sequence consumed like s_prev."""
    i = pl.program_id(0)
    t = pl.program_id(1)
    n = pl.num_programs(1)

    @pl.when(t == 0)
    def _():
        ds_scr[:] = jnp.zeros_like(ds_scr)
        dmem_scr[:] = jnp.zeros_like(dmem_scr)
        dvh_ref[:] = jnp.zeros_like(dvh_ref)
        dh_ref[:] = jnp.zeros_like(dh_ref)

    @pl.when(jnp.logical_and(i == 0, t == 0))
    def _():
        dws_w[:] = jnp.zeros_like(dws_w)
        dws_b[:] = jnp.zeros_like(dws_b)
        dw_e[:] = jnp.zeros_like(dw_e)
        dc_w[:] = jnp.zeros_like(dc_w)
        dc_b[:] = jnp.zeros_like(dc_b)
        ddec_w[:] = jnp.zeros_like(ddec_w)
        ddec_b[:] = jnp.zeros_like(ddec_b)
        dcell_w1[:] = jnp.zeros_like(dcell_w1)
        dcell_w2[:] = jnp.zeros_like(dcell_w2)

    w = _weights_dict(ws_w, ws_b, w_e, c_w, c_b, dec_w, dec_b, cell_w1, cell_w2)
    _bwd_core(
        t, n, w, vh_ref.dtype,
        vh_ref, h_ref, mask_ref, yin_ref,
        sprev_ref, c_ref, ds_ref, dc_ref, dalpha_ref,
        dvh_ref, dh_ref, dyin_ref,
        dws_w, dws_b, dw_e, dc_w, dc_b, ddec_w, ddec_b, dcell_w1, dcell_w2,
        ds_scr,
        cell="lstm", memprev_ref=memprev_ref, dmem_ref=dmem_ref,
        dmem_scr=dmem_scr,
    )


def _bwd_kernel_loc_lstm(
    pl_pr,
    vh_ref, h_ref, mask_ref, yin_ref,
    ws_w, ws_b, w_e, c_w, c_b, dec_w, dec_b, cell_w1, cell_w2,
    wconv, bconv, u_ref,
    sprev_ref, memprev_ref, aprev_ref, c_ref, ds_ref, dmem_ref, dc_ref,
    dalpha_ref,
    dvh_ref, dh_ref, dyin_ref,
    dws_w, dws_b, dw_e, dc_w, dc_b, ddec_w, ddec_b, dcell_w1, dcell_w2,
    dwconv_ref, dbconv_ref, du_ref,
    ds_scr, dalpha_scr, dmem_scr,
):
    """Location-aware + LSTM decoder cell backward (the conv_bilstm
    recipe): _bwd_kernel_loc's structure with the LSTM cell chain."""
    i = pl.program_id(0)
    t = pl.program_id(1)
    n = pl.num_programs(1)
    pls, prs = pl_pr

    @pl.when(t == 0)
    def _():
        ds_scr[:] = jnp.zeros_like(ds_scr)
        dalpha_scr[:] = jnp.zeros_like(dalpha_scr)
        dmem_scr[:] = jnp.zeros_like(dmem_scr)
        dvh_ref[:] = jnp.zeros_like(dvh_ref)
        dh_ref[:] = jnp.zeros_like(dh_ref)

    @pl.when(jnp.logical_and(i == 0, t == 0))
    def _():
        dws_w[:] = jnp.zeros_like(dws_w)
        dws_b[:] = jnp.zeros_like(dws_b)
        dw_e[:] = jnp.zeros_like(dw_e)
        dc_w[:] = jnp.zeros_like(dc_w)
        dc_b[:] = jnp.zeros_like(dc_b)
        ddec_w[:] = jnp.zeros_like(ddec_w)
        ddec_b[:] = jnp.zeros_like(ddec_b)
        dcell_w1[:] = jnp.zeros_like(dcell_w1)
        dcell_w2[:] = jnp.zeros_like(dcell_w2)
        dwconv_ref[:] = jnp.zeros_like(dwconv_ref)
        dbconv_ref[:] = jnp.zeros_like(dbconv_ref)
        du_ref[:] = jnp.zeros_like(du_ref)

    w = _weights_dict(ws_w, ws_b, w_e, c_w, c_b, dec_w, dec_b, cell_w1, cell_w2)
    dt = vh_ref.dtype
    f32 = jnp.float32
    rev_is_first = t == n - 1
    alpha_prev = jnp.where(rev_is_first, 0.0, aprev_ref[0].astype(f32))
    bb, l = alpha_prev.shape
    uf, feat = _location_term(alpha_prev, wconv[:], bconv[:], u_ref[:], dt,
                              pls, prs)
    dz, _, _ = _bwd_core(
        t, n, w, dt,
        vh_ref, h_ref, mask_ref, yin_ref,
        sprev_ref, c_ref, ds_ref, dc_ref, dalpha_ref,
        dvh_ref, dh_ref, dyin_ref,
        dws_w, dws_b, dw_e, dc_w, dc_b, ddec_w, ddec_b, dcell_w1, dcell_w2,
        ds_scr,
        uf=uf, dalpha_extra=dalpha_scr[:],
        cell="lstm", memprev_ref=memprev_ref, dmem_ref=dmem_ref,
        dmem_scr=dmem_scr,
    )

    # --- backward through the location term (as in _bwd_kernel_loc) ---
    fm = wconv.shape[1]
    dz_flat = dz.reshape(bb * l, dz.shape[2])
    dfeat = jnp.dot(
        dz_flat.astype(dt), u_ref[:].T, preferred_element_type=f32
    ).reshape(bb, l, fm)
    du_ref[:] += jnp.dot(
        feat.reshape(bb * l, fm).astype(dt).T, dz_flat.astype(dt),
        preferred_element_type=f32,
    )
    dbconv_ref[:] += jnp.sum(dfeat, axis=(0, 1))[None, :]
    ap3 = jnp.pad(alpha_prev, ((0, 0), (pls, prs)))[:, :, None]
    f = wconv.shape[0]
    dap = jnp.zeros((bb, l + f - 1), f32)
    for j in range(f):
        dfp = jnp.pad(dfeat, ((0, 0), (j, f - 1 - j), (0, 0)))
        dwconv_ref[j : j + 1, :] += jnp.sum(ap3 * dfp, axis=(0, 1))[None, :]
        g_j = jnp.sum(
            dfeat * wconv[j : j + 1, :].astype(f32)[None, :, :], axis=-1
        )
        dap = dap + jnp.pad(g_j, ((0, 0), (j, f - 1 - j)))
    dalpha_scr[:] = dap[:, pls : pls + l]


def _bwd_kernel_loc(
    pl_pr,
    vh_ref, h_ref, mask_ref, yin_ref,
    ws_w, ws_b, w_e, c_w, c_b, dec_w, dec_b, gru_wzr, gru_wh,
    wconv, bconv, u_ref,
    sprev_ref, aprev_ref, c_ref, ds_ref, dc_ref, dalpha_ref,
    dvh_ref, dh_ref, dyin_ref,
    dws_w, dws_b, dw_e, dc_w, dc_b, ddec_w, ddec_b, dgru_wzr, dgru_wh,
    dwconv_ref, dbconv_ref, du_ref,
    ds_scr, dalpha_scr,
):
    """Location-aware backward: recomputes the UF term from the saved
    previous alignment, adds the alpha-chain gradient (alpha_t feeds
    step t+1's conv — carried in dalpha_scr across the reversed sweep),
    and accumulates conv/bias/u grads."""
    i = pl.program_id(0)
    t = pl.program_id(1)
    n = pl.num_programs(1)
    st = dec_w.shape[1]
    pls, prs = pl_pr

    @pl.when(t == 0)
    def _():
        ds_scr[:] = jnp.zeros_like(ds_scr)
        dalpha_scr[:] = jnp.zeros_like(dalpha_scr)
        dvh_ref[:] = jnp.zeros_like(dvh_ref)
        dh_ref[:] = jnp.zeros_like(dh_ref)

    @pl.when(jnp.logical_and(i == 0, t == 0))
    def _():
        dws_w[:] = jnp.zeros_like(dws_w)
        dws_b[:] = jnp.zeros_like(dws_b)
        dw_e[:] = jnp.zeros_like(dw_e)
        dc_w[:] = jnp.zeros_like(dc_w)
        dc_b[:] = jnp.zeros_like(dc_b)
        ddec_w[:] = jnp.zeros_like(ddec_w)
        ddec_b[:] = jnp.zeros_like(ddec_b)
        dgru_wzr[:] = jnp.zeros_like(dgru_wzr)
        dgru_wh[:] = jnp.zeros_like(dgru_wh)
        dwconv_ref[:] = jnp.zeros_like(dwconv_ref)
        dbconv_ref[:] = jnp.zeros_like(dbconv_ref)
        du_ref[:] = jnp.zeros_like(du_ref)

    w = _weights_dict(ws_w, ws_b, w_e, c_w, c_b, dec_w, dec_b, gru_wzr, gru_wh)
    dt = vh_ref.dtype
    f32 = jnp.float32
    rev_is_first = t == n - 1  # reversed-time step 0
    alpha_prev = jnp.where(rev_is_first, 0.0, aprev_ref[0].astype(f32))
    bb, l = alpha_prev.shape
    uf, feat = _location_term(alpha_prev, wconv[:], bconv[:], u_ref[:], dt,
                              pls, prs)
    # alpha_t feeds step t+1's location conv; that cotangent was stored
    # by the (earlier-processed) step t+1 in dalpha_scr.
    dz, _, _ = _bwd_core(
        t, n, w, dt,
        vh_ref, h_ref, mask_ref, yin_ref,
        sprev_ref, c_ref, ds_ref, dc_ref, dalpha_ref,
        dvh_ref, dh_ref, dyin_ref,
        dws_w, dws_b, dw_e, dc_w, dc_b, ddec_w, ddec_b, dgru_wzr, dgru_wh,
        ds_scr,
        uf=uf, dalpha_extra=dalpha_scr[:],
    )

    # --- backward through the location term ---
    fm = wconv.shape[1]
    dz_flat = dz.reshape(bb * l, dz.shape[2])
    dfeat = jnp.dot(
        dz_flat.astype(dt), u_ref[:].T, preferred_element_type=f32
    ).reshape(bb, l, fm)  # dz @ u^T
    du_ref[:] += jnp.dot(
        feat.reshape(bb * l, fm).astype(dt).T, dz_flat.astype(dt),
        preferred_element_type=f32,
    )
    dbconv_ref[:] += jnp.sum(dfeat, axis=(0, 1))[None, :]
    ap3 = jnp.pad(alpha_prev, ((0, 0), (pls, prs)))[:, :, None]
    f = wconv.shape[0]
    dap = jnp.zeros((bb, l + f - 1), f32)  # grad wrt padded alpha
    for j in range(f):
        # dwconv[j] = sum_{b,l} ap[b, l+j] * dfeat[b, l, :] — pad dfeat
        # up to the full width so the ap3 operand stays offset-0.
        dfp = jnp.pad(dfeat, ((0, 0), (j, f - 1 - j), (0, 0)))
        dwconv_ref[j : j + 1, :] += jnp.sum(ap3 * dfp, axis=(0, 1))[None, :]
        # g_j[b, l] = sum_m dfeat[b, l, m] wconv[j, m]; dap[k] += g_j[k-j]
        g_j = jnp.sum(
            dfeat * wconv[j : j + 1, :].astype(f32)[None, :, :], axis=-1
        )
        dap = dap + jnp.pad(g_j, ((0, 0), (j, f - 1 - j)))
    dalpha_scr[:] = dap[:, pls : pls + l]


def _run_bwd(
    vh, h, enc_mask, yin,
    ws_w, ws_b, w_e, c_w, c_b, dec_w, dec_b, cell_w1, cell_w2,
    s_seq, c_seq, ds_seq, dc_seq, dalpha_seq,
    block_b, interpret, cell="gru", mem_seq=None, dmem_seq=None,
):
    b, l, s_dim = vh.shape
    a_dim = h.shape[2]
    t_len = yin.shape[1]
    st = dec_w.shape[1]
    bb = min(block_b, b)
    nb = b // bb
    lstm = cell == "lstm"
    c2 = lambda i, t: (0, 0)
    rev = lambda i, t: (t_len - 1 - t, i, 0)
    # s_prev at reversed step t is s_seq[T-2-t]; clamp at the last
    # reversed step (true step 0) — the kernel replaces it with zeros.
    prev = lambda i, t: (jnp.maximum(t_len - 2 - t, 0), i, 0)
    sw = lambda a: jnp.swapaxes(a, 0, 1)  # (T, B, X) time-major
    step_st_prev = pl.BlockSpec((1, bb, st), prev, memory_space=pltpu.VMEM)
    step_st_rev = pl.BlockSpec((1, bb, st), rev, memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((bb, l, s_dim), lambda i, t: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bb, l, a_dim), lambda i, t: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bb, l), lambda i, t: (i, 0), memory_space=pltpu.VMEM),
        step_st_rev,
    ] + [
        pl.BlockSpec(wgt.shape, c2, memory_space=pltpu.VMEM)
        for wgt in (ws_w, ws_b, w_e, c_w, c_b, dec_w, dec_b, cell_w1, cell_w2)
    ] + [step_st_prev]
    args = [vh, h, enc_mask, sw(yin), ws_w, ws_b, w_e, c_w, c_b, dec_w,
            dec_b, cell_w1, cell_w2, sw(s_seq)]
    if lstm:
        in_specs.append(step_st_prev)  # memprev
        args.append(sw(mem_seq))
    in_specs += [
        pl.BlockSpec((1, bb, a_dim), rev, memory_space=pltpu.VMEM),  # c
        step_st_rev,  # ds
    ]
    args += [sw(c_seq), sw(ds_seq)]
    if lstm:
        in_specs.append(step_st_rev)  # dmem (external cotangent)
        args.append(sw(dmem_seq))
    in_specs += [
        pl.BlockSpec((1, bb, a_dim), rev, memory_space=pltpu.VMEM),  # dc
        pl.BlockSpec((1, bb, l), rev, memory_space=pltpu.VMEM),  # dalpha
    ]
    args += [sw(dc_seq), sw(dalpha_seq)]
    scratch = [pltpu.VMEM((bb, st), jnp.float32)]
    if lstm:
        scratch.append(pltpu.VMEM((bb, st), jnp.float32))  # dmem chain
    outs = pl.pallas_call(
        _bwd_kernel_lstm if lstm else _bwd_kernel,
        grid=(nb, t_len),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((bb, l, s_dim), lambda i, t: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, l, a_dim), lambda i, t: (i, 0, 0), memory_space=pltpu.VMEM),
            step_st_rev,
        ] + [
            pl.BlockSpec(wgt.shape, c2, memory_space=pltpu.VMEM)
            for wgt in (ws_w, ws_b, w_e, c_w, c_b, dec_w, dec_b,
                        cell_w1, cell_w2)
        ],
        out_shape=[
            jax.ShapeDtypeStruct(vh.shape, jnp.float32),
            jax.ShapeDtypeStruct(h.shape, jnp.float32),
            jax.ShapeDtypeStruct((t_len, b, st), jnp.float32),
        ] + [
            jax.ShapeDtypeStruct(wgt.shape, jnp.float32)
            for wgt in (ws_w, ws_b, w_e, c_w, c_b, dec_w, dec_b,
                        cell_w1, cell_w2)
        ],
        scratch_shapes=scratch,
        # the recompute-heavy step keeps ~19 MB of blocks+temps live at
        # the recipe shapes; raise the default 16 MB scoped-vmem cap.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*args)
    outs = list(outs)
    outs[2] = jnp.swapaxes(outs[2], 0, 1)  # dyin back to (B, T, St)
    # Cotangents must match the primal dtypes (the kernel accumulates
    # everything in float32; one cast after full accumulation).
    primals = (vh, h, yin, ws_w, ws_b, w_e, c_w, c_b, dec_w, dec_b,
               cell_w1, cell_w2)
    outs = [o.astype(p.dtype) for o, p in zip(outs, primals)]
    return tuple(outs)


def _run_bwd_loc(
    vh, h, enc_mask, yin,
    ws_w, ws_b, w_e, c_w, c_b, dec_w, dec_b, cell_w1, cell_w2,
    wconv, bconv, u,
    s_seq, c_seq, alpha_seq, ds_seq, dc_seq, dalpha_seq,
    block_b, interpret, cell="gru", mem_seq=None, dmem_seq=None,
):
    b, l, s_dim = vh.shape
    a_dim = h.shape[2]
    t_len = yin.shape[1]
    st = dec_w.shape[1]
    bb = min(block_b, b)
    nb = b // bb
    lstm = cell == "lstm"
    c2 = lambda i, t: (0, 0)
    rev = lambda i, t: (t_len - 1 - t, i, 0)
    prev = lambda i, t: (jnp.maximum(t_len - 2 - t, 0), i, 0)
    sw = lambda a: jnp.swapaxes(a, 0, 1)
    per_step = lambda x_dim: pl.BlockSpec(
        (1, bb, x_dim), rev, memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec((bb, l, s_dim), lambda i, t: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bb, l, a_dim), lambda i, t: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bb, l), lambda i, t: (i, 0), memory_space=pltpu.VMEM),
        per_step(st),
    ] + [
        pl.BlockSpec(wgt.shape, c2, memory_space=pltpu.VMEM)
        for wgt in (ws_w, ws_b, w_e, c_w, c_b, dec_w, dec_b, cell_w1,
                    cell_w2, wconv, bconv, u)
    ] + [pl.BlockSpec((1, bb, st), prev, memory_space=pltpu.VMEM)]
    args = [vh, h, enc_mask, sw(yin),
            ws_w, ws_b, w_e, c_w, c_b, dec_w, dec_b, cell_w1, cell_w2,
            wconv, bconv, u, sw(s_seq)]
    if lstm:
        in_specs.append(pl.BlockSpec((1, bb, st), prev, memory_space=pltpu.VMEM))
        args.append(sw(mem_seq))  # memprev
    in_specs += [
        pl.BlockSpec((1, bb, l), prev, memory_space=pltpu.VMEM),  # aprev
        per_step(a_dim),  # c
        per_step(st),  # ds
    ]
    args += [sw(alpha_seq), sw(c_seq), sw(ds_seq)]
    if lstm:
        in_specs.append(per_step(st))  # dmem
        args.append(sw(dmem_seq))
    in_specs += [per_step(a_dim), per_step(l)]  # dc, dalpha
    args += [sw(dc_seq), sw(dalpha_seq)]
    scratch = [
        pltpu.VMEM((bb, st), jnp.float32),
        pltpu.VMEM((bb, l), jnp.float32),
    ]
    if lstm:
        scratch.append(pltpu.VMEM((bb, st), jnp.float32))  # dmem chain
    outs = pl.pallas_call(
        functools.partial(
            _bwd_kernel_loc_lstm if lstm else _bwd_kernel_loc,
            _conv_pads(wconv.shape[0]),
        ),
        grid=(nb, t_len),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((bb, l, s_dim), lambda i, t: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, l, a_dim), lambda i, t: (i, 0, 0), memory_space=pltpu.VMEM),
            per_step(st),
        ] + [
            pl.BlockSpec(wgt.shape, c2, memory_space=pltpu.VMEM)
            for wgt in (ws_w, ws_b, w_e, c_w, c_b, dec_w, dec_b,
                        cell_w1, cell_w2, wconv, bconv, u)
        ],
        out_shape=[
            jax.ShapeDtypeStruct(vh.shape, jnp.float32),
            jax.ShapeDtypeStruct(h.shape, jnp.float32),
            jax.ShapeDtypeStruct((t_len, b, st), jnp.float32),
        ] + [
            jax.ShapeDtypeStruct(wgt.shape, jnp.float32)
            for wgt in (ws_w, ws_b, w_e, c_w, c_b, dec_w, dec_b,
                        cell_w1, cell_w2, wconv, bconv, u)
        ],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*args)
    outs = list(outs)
    outs[2] = jnp.swapaxes(outs[2], 0, 1)  # dyin back to (B, T, St)
    primals = (vh, h, yin, ws_w, ws_b, w_e, c_w, c_b, dec_w, dec_b,
               cell_w1, cell_w2, wconv, bconv, u)
    return tuple(o.astype(p.dtype) for o, p in zip(outs, primals))


@functools.partial(jax.custom_vjp, nondiff_argnums=(16, 17))
def attention_decode_scan_loc(
    vh, h, enc_mask, yin,
    ws_w, ws_b, w_e, c_w, c_b, dec_w, dec_b, gru_wzr, gru_wh,
    wconv, bconv, u,
    block_b=8, interpret=False,
):
    """Fused location-aware teacher-forced decoder (feature_maps > 0,
    GRU cell): the conv over the previous alignment (Attention.lua:
    73-99) runs inside the kernel with the alignment carried in VMEM.
    wconv: (f, FM) conv taps; bconv: (1, FM); u: (FM, S)."""
    return _run_fwd(
        vh, h, enc_mask, yin,
        ws_w, ws_b, w_e, c_w, c_b, dec_w, dec_b, gru_wzr, gru_wh,
        block_b, interpret, loc=(wconv, bconv, u),
    )


def _vjp_fwd_loc(
    vh, h, enc_mask, yin,
    ws_w, ws_b, w_e, c_w, c_b, dec_w, dec_b, gru_wzr, gru_wh,
    wconv, bconv, u, block_b, interpret,
):
    out = _run_fwd(
        vh, h, enc_mask, yin,
        ws_w, ws_b, w_e, c_w, c_b, dec_w, dec_b, gru_wzr, gru_wh,
        block_b, interpret, loc=(wconv, bconv, u),
    )
    s_seq, c_seq, alpha_seq = out
    res = (
        vh, h, enc_mask, yin,
        ws_w, ws_b, w_e, c_w, c_b, dec_w, dec_b, gru_wzr, gru_wh,
        wconv, bconv, u, s_seq, c_seq, alpha_seq,
    )
    return out, res


def _vjp_bwd_loc(block_b, interpret, res, grads):
    (
        vh, h, enc_mask, yin,
        ws_w, ws_b, w_e, c_w, c_b, dec_w, dec_b, gru_wzr, gru_wh,
        wconv, bconv, u, s_seq, c_seq, alpha_seq,
    ) = res
    ds_seq, dc_seq, dalpha_seq = grads
    outs = _run_bwd_loc(
        vh, h, enc_mask, yin,
        ws_w, ws_b, w_e, c_w, c_b, dec_w, dec_b, gru_wzr, gru_wh,
        wconv, bconv, u,
        s_seq, c_seq, alpha_seq, ds_seq, dc_seq, dalpha_seq,
        block_b, interpret,
    )
    (dvh, dh, dyin, dws_w, dws_b, dw_e, dc_w, dc_b, ddec_w, ddec_b,
     dgru_wzr, dgru_wh, dwconv, dbconv, du) = outs
    dmask = jnp.zeros_like(enc_mask)
    return (
        dvh, dh, dmask, dyin,
        dws_w, dws_b, dw_e, dc_w, dc_b, ddec_w, ddec_b, dgru_wzr,
        dgru_wh, dwconv, dbconv, du,
    )


attention_decode_scan_loc.defvjp(_vjp_fwd_loc, _vjp_bwd_loc)


def _run_bwd_xla(
    vh, h, enc_mask, yin,
    ws_w, ws_b, w_e, c_w, c_b, dec_w, dec_b, gru_wzr, gru_wh,
    s_seq, c_seq, ds_seq, dc_seq, dalpha_seq,
):
    """Reverse-scan backward in plain XLA — same math as _bwd_kernel.

    Used while the Pallas backward is gated off (and as a correctness
    cross-check for it): the forward still runs as the fused kernel, so
    the XLA fwd pass is never re-executed; this pass recomputes each
    step's gates from the saved (s, c) sequences exactly like the
    kernel does.
    """
    st = dec_w.shape[1]
    b = vh.shape[0]
    mask_pos = enc_mask > 0
    s_prevs = jnp.concatenate(
        [jnp.zeros_like(s_seq[:, :1]), s_seq[:, :-1]], axis=1
    )

    def step(carry, xs):
        ds_carry, dvh, dh, dW = carry
        s_prev, c_saved, yin_t, ds_t, dc_t, dalpha_t = xs
        ws = s_prev @ ws_w + ws_b
        z = vh + ws[:, None, :]
        a = jnp.tanh(z)
        e = jnp.sum(a * w_e[0][None, None, :], axis=-1)
        e = jnp.where(mask_pos, e, NEG_INF)
        m = jnp.max(e, axis=-1, keepdims=True)
        p = jnp.exp(e - m) * mask_pos
        alpha = p / jnp.sum(p, axis=-1, keepdims=True)
        cc = c_saved @ c_w + c_b
        rr = jnp.concatenate([cc, yin_t], axis=-1)
        r = rr @ dec_w + dec_b
        sr = jnp.concatenate([s_prev, r], axis=-1)
        zr = jax.nn.sigmoid(sr @ gru_wzr)
        zg, rg = zr[:, :st], zr[:, st:]
        rgs = rg * s_prev
        cand_in = jnp.concatenate([rgs, r], axis=-1)
        cand = jnp.tanh(cand_in @ gru_wh)

        ds = ds_t + ds_carry
        dzg = ds * (cand - s_prev)
        dcand = ds * zg
        da_cand = dcand * (1.0 - cand * cand)
        dcand_in = da_cand @ gru_wh.T
        drgs = dcand_in[:, :st]
        dr = dcand_in[:, st:]
        drg = drgs * s_prev
        da_z = dzg * zg * (1.0 - zg)
        da_r = drg * rg * (1.0 - rg)
        da_zr = jnp.concatenate([da_z, da_r], axis=-1)
        dsr = da_zr @ gru_wzr.T
        ds_prev = dsr[:, :st] + drgs * rg + ds * (1.0 - zg)
        dr = dr + dsr[:, st:]

        drr = dr @ dec_w.T
        dcc = drr[:, :st]
        dyin_t = drr[:, st:]
        dc = dcc @ c_w.T + dc_t

        dalpha = jnp.sum(dc[:, None, :] * h, axis=-1) + dalpha_t
        dh_step = alpha[:, :, None] * dc[:, None, :]
        de = alpha * (dalpha - jnp.sum(dalpha * alpha, axis=-1, keepdims=True))
        da = de[:, :, None] * w_e[0][None, None, :]
        dz = da * (1.0 - a * a)
        dws = jnp.sum(dz, axis=1)
        ds_prev = ds_prev + dws @ ws_w.T

        dW_step = (
            s_prev.T @ dws,                              # dws_w
            jnp.sum(dws, axis=0, keepdims=True),         # dws_b
            jnp.sum(a * de[:, :, None], axis=(0, 1))[None, :],  # dw_e
            c_saved.T @ dcc,                             # dc_w
            jnp.sum(dcc, axis=0, keepdims=True),         # dc_b
            rr.T @ dr,                                   # ddec_w
            jnp.sum(dr, axis=0, keepdims=True),          # ddec_b
            sr.T @ da_zr,                                # dgru_wzr
            cand_in.T @ da_cand,                         # dgru_wh
        )
        dW = jax.tree.map(jnp.add, dW, dW_step)
        return (ds_prev, dvh + dz, dh + dh_step, dW), dyin_t

    dW0 = (
        jnp.zeros_like(ws_w), jnp.zeros_like(ws_b), jnp.zeros_like(w_e),
        jnp.zeros_like(c_w), jnp.zeros_like(c_b),
        jnp.zeros_like(dec_w), jnp.zeros_like(dec_b),
        jnp.zeros_like(gru_wzr), jnp.zeros_like(gru_wh),
    )
    carry0 = (
        jnp.zeros((b, st), vh.dtype), jnp.zeros_like(vh), jnp.zeros_like(h), dW0
    )
    tm = lambda x: jnp.swapaxes(x, 0, 1)
    xs = tuple(
        map(tm, (s_prevs, c_seq, yin, ds_seq, dc_seq, dalpha_seq))
    )
    (ds0, dvh, dh, dW), dyin_t = jax.lax.scan(step, carry0, xs, reverse=True)
    return (dvh, dh, tm(dyin_t)) + dW


# Pallas backward: live. Two Mosaic issues were fixed to enable it —
# the dws_b reduction relayout (see note in _bwd_kernel) and the 16 MB
# scoped-vmem default (raised via CompilerParams). The XLA reverse scan
# above remains as a correctness cross-check (tests) and a fallback
# (flip this off to use it).
USE_PALLAS_BWD = True


@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14))
def attention_decode_scan(
    vh, h, enc_mask, yin,
    ws_w, ws_b, w_e, c_w, c_b, dec_w, dec_b, gru_wzr, gru_wh,
    block_b=8, interpret=False,
):
    """Fused teacher-forced attention decoder (feature_maps=0, GRU cell).

    vh: (B, L, S) projected annotations; h: (B, L, A); enc_mask: (B, L);
    yin: (B, T, St) = y_prev @ W_y + b_y. Biases are 2D (1, X).
    Returns (s_seq (B,T,St), c_seq (B,T,A), alpha_seq (B,T,L)).
    """
    return _run_fwd(
        vh, h, enc_mask, yin,
        ws_w, ws_b, w_e, c_w, c_b, dec_w, dec_b, gru_wzr, gru_wh,
        block_b, interpret,
    )


def _vjp_fwd(
    vh, h, enc_mask, yin,
    ws_w, ws_b, w_e, c_w, c_b, dec_w, dec_b, gru_wzr, gru_wh,
    block_b, interpret,
):
    out = _run_fwd(
        vh, h, enc_mask, yin,
        ws_w, ws_b, w_e, c_w, c_b, dec_w, dec_b, gru_wzr, gru_wh,
        block_b, interpret,
    )
    s_seq, c_seq, alpha_seq = out
    res = (
        vh, h, enc_mask, yin,
        ws_w, ws_b, w_e, c_w, c_b, dec_w, dec_b, gru_wzr, gru_wh,
        s_seq, c_seq,
    )
    return out, res


def _vjp_bwd(block_b, interpret, res, grads):
    (
        vh, h, enc_mask, yin,
        ws_w, ws_b, w_e, c_w, c_b, dec_w, dec_b, gru_wzr, gru_wh,
        s_seq, c_seq,
    ) = res
    ds_seq, dc_seq, dalpha_seq = grads
    if USE_PALLAS_BWD or interpret:
        outs = _run_bwd(
            vh, h, enc_mask, yin,
            ws_w, ws_b, w_e, c_w, c_b, dec_w, dec_b, gru_wzr, gru_wh,
            s_seq, c_seq, ds_seq, dc_seq, dalpha_seq,
            block_b, interpret,
        )
    else:
        outs = _run_bwd_xla(
            vh, h, enc_mask, yin,
            ws_w, ws_b, w_e, c_w, c_b, dec_w, dec_b, gru_wzr, gru_wh,
            s_seq, c_seq, ds_seq, dc_seq, dalpha_seq,
        )
    (dvh, dh, dyin, dws_w, dws_b, dw_e, dc_w, dc_b, ddec_w, ddec_b,
     dgru_wzr, dgru_wh) = outs
    dmask = jnp.zeros_like(enc_mask)
    return (
        dvh, dh, dmask, dyin,
        dws_w, dws_b, dw_e, dc_w, dc_b, ddec_w, ddec_b, dgru_wzr, dgru_wh,
    )


attention_decode_scan.defvjp(_vjp_fwd, _vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14))
def attention_decode_scan_lstm(
    vh, h, enc_mask, yin,
    ws_w, ws_b, w_e, c_w, c_b, dec_w, dec_b, lstm_w, lstm_b,
    block_b=8, interpret=False,
):
    """Fused teacher-forced attention decoder with an LSTM decoder cell
    (feature_maps=0; the conv_bilstm family's cell — timit.lua:137).

    lstm_w: (2St, 4St) = concat([w_h, w_x], axis=0) on concat(s, r),
    gate order (in, forget, cell, out); lstm_b: (1, 4St). Returns
    (s_seq, c_seq, alpha_seq, mem_seq) — mem_seq is exposed because
    the backward recompute needs the cell state; callers may ignore it.
    """
    return _run_fwd(
        vh, h, enc_mask, yin,
        ws_w, ws_b, w_e, c_w, c_b, dec_w, dec_b, lstm_w, lstm_b,
        block_b, interpret, cell="lstm",
    )


def _vjp_fwd_lstm(
    vh, h, enc_mask, yin,
    ws_w, ws_b, w_e, c_w, c_b, dec_w, dec_b, lstm_w, lstm_b,
    block_b, interpret,
):
    out = _run_fwd(
        vh, h, enc_mask, yin,
        ws_w, ws_b, w_e, c_w, c_b, dec_w, dec_b, lstm_w, lstm_b,
        block_b, interpret, cell="lstm",
    )
    s_seq, c_seq, alpha_seq, mem_seq = out
    res = (
        vh, h, enc_mask, yin,
        ws_w, ws_b, w_e, c_w, c_b, dec_w, dec_b, lstm_w, lstm_b,
        s_seq, c_seq, mem_seq,
    )
    return out, res


def _vjp_bwd_lstm(block_b, interpret, res, grads):
    (
        vh, h, enc_mask, yin,
        ws_w, ws_b, w_e, c_w, c_b, dec_w, dec_b, lstm_w, lstm_b,
        s_seq, c_seq, mem_seq,
    ) = res
    ds_seq, dc_seq, dalpha_seq, dmem_seq = grads
    outs = _run_bwd(
        vh, h, enc_mask, yin,
        ws_w, ws_b, w_e, c_w, c_b, dec_w, dec_b, lstm_w, lstm_b,
        s_seq, c_seq, ds_seq, dc_seq, dalpha_seq,
        block_b, interpret, cell="lstm", mem_seq=mem_seq,
        dmem_seq=dmem_seq,
    )
    (dvh, dh, dyin, dws_w, dws_b, dw_e, dc_w, dc_b, ddec_w, ddec_b,
     dlstm_w, dlstm_b) = outs
    dmask = jnp.zeros_like(enc_mask)
    return (
        dvh, dh, dmask, dyin,
        dws_w, dws_b, dw_e, dc_w, dc_b, ddec_w, ddec_b, dlstm_w, dlstm_b,
    )


attention_decode_scan_lstm.defvjp(_vjp_fwd_lstm, _vjp_bwd_lstm)


@functools.partial(jax.custom_vjp, nondiff_argnums=(16, 17))
def attention_decode_scan_loc_lstm(
    vh, h, enc_mask, yin,
    ws_w, ws_b, w_e, c_w, c_b, dec_w, dec_b, lstm_w, lstm_b,
    wconv, bconv, u,
    block_b=8, interpret=False,
):
    """Location-aware (feature_maps > 0) + LSTM decoder cell — the
    conv_bilstm recipe's decoder (timit.lua:128-155). Returns
    (s_seq, c_seq, alpha_seq, mem_seq)."""
    return _run_fwd(
        vh, h, enc_mask, yin,
        ws_w, ws_b, w_e, c_w, c_b, dec_w, dec_b, lstm_w, lstm_b,
        block_b, interpret, loc=(wconv, bconv, u), cell="lstm",
    )


def _vjp_fwd_loc_lstm(
    vh, h, enc_mask, yin,
    ws_w, ws_b, w_e, c_w, c_b, dec_w, dec_b, lstm_w, lstm_b,
    wconv, bconv, u, block_b, interpret,
):
    out = _run_fwd(
        vh, h, enc_mask, yin,
        ws_w, ws_b, w_e, c_w, c_b, dec_w, dec_b, lstm_w, lstm_b,
        block_b, interpret, loc=(wconv, bconv, u), cell="lstm",
    )
    s_seq, c_seq, alpha_seq, mem_seq = out
    res = (
        vh, h, enc_mask, yin,
        ws_w, ws_b, w_e, c_w, c_b, dec_w, dec_b, lstm_w, lstm_b,
        wconv, bconv, u, s_seq, c_seq, alpha_seq, mem_seq,
    )
    return out, res


def _vjp_bwd_loc_lstm(block_b, interpret, res, grads):
    (
        vh, h, enc_mask, yin,
        ws_w, ws_b, w_e, c_w, c_b, dec_w, dec_b, lstm_w, lstm_b,
        wconv, bconv, u, s_seq, c_seq, alpha_seq, mem_seq,
    ) = res
    ds_seq, dc_seq, dalpha_seq, dmem_seq = grads
    outs = _run_bwd_loc(
        vh, h, enc_mask, yin,
        ws_w, ws_b, w_e, c_w, c_b, dec_w, dec_b, lstm_w, lstm_b,
        wconv, bconv, u,
        s_seq, c_seq, alpha_seq, ds_seq, dc_seq, dalpha_seq,
        block_b, interpret, cell="lstm", mem_seq=mem_seq,
        dmem_seq=dmem_seq,
    )
    (dvh, dh, dyin, dws_w, dws_b, dw_e, dc_w, dc_b, ddec_w, ddec_b,
     dlstm_w, dlstm_b, dwconv, dbconv, du) = outs
    dmask = jnp.zeros_like(enc_mask)
    return (
        dvh, dh, dmask, dyin,
        dws_w, dws_b, dw_e, dc_w, dc_b, ddec_w, ddec_b, dlstm_w,
        dlstm_b, dwconv, dbconv, du,
    )


attention_decode_scan_loc_lstm.defvjp(_vjp_fwd_loc_lstm, _vjp_bwd_loc_lstm)


_VMEM_BUDGET = 100 * 1024 * 1024  # matches CompilerParams above


def choose_block(batch: int, l: int, s_dim: int, a_dim: int,
                 dtype=jnp.float32) -> int:
    """Largest batch block whose scoped-VMEM footprint fits.

    Bigger blocks matter twice: at block 8 the per-step matmuls occupy
    only 8/128 MXU sublanes (backward measured 6x slower than block
    16/32 at TIMIT recipe shapes), and the grid is (B/bb, T) with every
    cell SEQUENTIAL — halving cell count halves the per-cell
    fill/drain tax the recurrence pays. The footprint model
    ~5 * bb*L*(S+A)*4 bytes is calibrated against Mosaic's reported
    scoped allocations (19 MB at bb=8, L=144, S=A=512 backward, f32).
    Under bf16 the resident Vh/h IO blocks are 2-byte while the f32
    step intermediates keep their size — measured scaling factor ~3.25
    (i.e. block 64 bf16 fits the same budget block 32 f32 does).
    bf16 tiles want 16 sublanes, so blocks of 8 are float32-only.

    ATTN_SCAN_BLOCK_B overrides for experiments (tools/block_tune.py).
    """
    import os

    # Measured bf16 block choices on v5e (r4): bigger blocks win when
    # they fit the budget — conv_bilstm (L'=16): bb=128 3.01 ms vs
    # bb=32 4.08 ms (XLA 3.17); chorowski L=96: bb=64 5.77 vs bb=32
    # 6.09 ms. bb=64 at chorowski L=144 (122 MB modeled, over budget)
    # FAILS TO COMPILE (runs/block_tune.json) — the 3.25x bytes-scale
    # gate below correctly excludes it, so larger candidates are safe
    # to list first. f32 keeps the original tuple (its budget admits
    # larger blocks only at shapes with no chip measurement yet).
    if dtype == jnp.bfloat16:
        blocks, bytes_scale, sublane = (128, 64, 32, 16), 3.25, 16
    else:
        blocks, bytes_scale, sublane = (32, 16, 8), 5.0, 8
    forced = int(os.environ.get("ATTN_SCAN_BLOCK_B", "0"))
    if forced:
        # experiment hook, still gated: a leftover export must not send
        # production runs into the known-bad Mosaic shapes (sublane
        # mismatch / scoped-VMEM blowup) with an opaque compile error
        if forced % sublane != 0 or batch % forced != 0:
            return 0
        return forced
    for bb in blocks:
        if (batch % bb == 0
                and bytes_scale * bb * l * (s_dim + a_dim) * 4 <= _VMEM_BUDGET):
            return bb
    return 0


def supported(cfg, batch: int, l: int = 144, dtype=jnp.float32) -> bool:
    """Usable for this config/batch? GRU or no-peephole LSTM decoder
    cell (plain or location-aware attention — feature_maps > 0 runs
    the _loc kernels), tile-friendly L, and a (batch, L) block that
    fits in VMEM. Penalty-active configs (mono_align &&
    penalty_lambda > 0) ARE supported: the penalty value and ramp
    injection are applied OUTSIDE the kernel on the saved alpha
    sequence (ops/monotonic.py::monotonic_alignment_seq via
    decode_teacher_forced) — no kernel involvement."""
    sublane = 16 if dtype == jnp.bfloat16 else 8
    cell_ok = cfg.cell == "gru" or (
        cfg.cell == "lstm" and not getattr(cfg, "peepholes", False)
    )
    return (
        cell_ok
        and batch >= 8
        and l % sublane == 0
        and choose_block(batch, l, cfg.score_depth, cfg.annotation_depth,
                         dtype) > 0
    )
