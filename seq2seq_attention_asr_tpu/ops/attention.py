"""Location-aware hybrid attention decoder — the heart of the library.

Re-design of /root/reference/Attention.lua (442 LoC of nngraph clones)
as pure functions + `lax.scan`:

  - annotation projection Vh hoisted out of the decoder loop
    (Attention.lua:40-47) -> `precompute_vh`, one big MXU matmul;
  - state projection Ws (stock TemporalConvolution-as-matmul WITH bias,
    Attention.lua:64-67) broadcast over L;
  - location term UF = 1x1-zero-bias-conv(conv(pad(alpha_prev)))
    enabled iff feature_maps > 0 (Attention.lua:73-99), with the
    reference's odd/even padding rule (Attention.lua:77-85);
  - energies e = w . tanh(Ws + Vh [+ UF]) via a zero-bias 1x1 conv
    (Attention.lua:103-113) -> a matvec against `w_e`;
  - alpha = masked softmax over encoder positions (Attention.lua:117;
    masking is new — the reference runs one utterance at a time);
  - optional monotonic-alignment gradient penalty (ops/monotonic.py);
  - context c = alpha^T h (Attention.lua:129-136);
  - decoder input Linear(2S->S)(concat(Linear(c), Linear(y_prev)))
    (Attention.lua:149-151);
  - recurrent core producing (s, mem) — GRU with mem passthrough
    (model_chorowski_baseline.lua:48-51) or LSTM (timit/timit.lua:137);
  - readout decoder_mlp(concat(s, c)) (Attention.lua:159-165), applied
    OUTSIDE the scan over all T steps in one batched matmul stack.

Teacher forcing uses prev_y = one-hot label at t-1 and a zero vector at
t = 1 (RNNAttention.lua:144-185 `zeros_y`); initial alpha/s/mem states
are zeros (Recurrent.lua:79-127 zero-state templates).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from . import cells, readout
from .masking import masked_softmax
from .monotonic import (
    make_ramp,
    monotonic_alignment,
    monotonic_alignment_seq,
    monotonic_penalty_value,
)

Params = Dict[str, Any]


def _halo_exchange(x: jnp.ndarray, left: int, right: int, axis_name: str) -> jnp.ndarray:
    """Concat [left-halo | x | right-halo] along the last axis, where the
    halos come from the neighboring sequence shards via `ppermute`
    (zeros at the chain ends — matching the zero padding the unsharded
    conv uses at the sequence boundary)."""
    n = jax.lax.axis_size(axis_name)
    parts = []
    if left > 0:
        from_left = jax.lax.ppermute(
            x[..., -left:], axis_name, [(i, i + 1) for i in range(n - 1)]
        )
        parts.append(from_left)
    parts.append(x)
    if right > 0:
        from_right = jax.lax.ppermute(
            x[..., :right], axis_name, [(i + 1, i) for i in range(n - 1)]
        )
        parts.append(from_right)
    return jnp.concatenate(parts, axis=-1)


@dataclasses.dataclass(frozen=True)
class AttentionConfig:
    score_depth: int  # scoreDepth
    filt_size: int  # hybridAttendFilterSize
    feature_maps: int  # hybridAttendFeatureMaps (0 = content+state only)
    state_depth: int
    annotation_depth: int
    output_depth: int
    cell: str = "gru"  # decoder_recurrent: "gru" (mem passthrough) | "lstm"
    peepholes: bool = False
    mono_align: bool = True
    penalty_lambda: float = 0.0
    readout: Tuple[Tuple, ...] = (("maxout", 64, 7), ("linear", 62))


def _torch_init(key, fan_in, shape, dtype):
    bound = 1.0 / jnp.sqrt(jnp.asarray(fan_in, dtype=jnp.float32))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def attention_init(key, cfg: AttentionConfig, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 12)
    p: Params = {}
    # Vh: TemporalConvolutionZeroBias(annotationDepth, scoreDepth, 1) — no bias
    p["v"] = _torch_init(ks[0], cfg.annotation_depth, (cfg.annotation_depth, cfg.score_depth), dtype)
    # Ws: stock TemporalConvolution(1, scoreDepth, stateDepth) — has bias
    p["ws"] = {
        "w": _torch_init(ks[1], cfg.state_depth, (cfg.state_depth, cfg.score_depth), dtype),
        "b": _torch_init(ks[1], cfg.state_depth, (cfg.score_depth,), dtype),
    }
    if cfg.feature_maps > 0:
        # F: stock TemporalConvolution(1, featMaps, filtSize) — has bias
        p["loc_conv"] = {
            "w": _torch_init(ks[2], cfg.filt_size, (cfg.filt_size, 1, cfg.feature_maps), dtype),
            "b": _torch_init(ks[2], cfg.filt_size, (cfg.feature_maps,), dtype),
        }
        # U: zero-bias 1x1 conv featMaps -> scoreDepth
        p["u"] = _torch_init(ks[3], cfg.feature_maps, (cfg.feature_maps, cfg.score_depth), dtype)
    # e: zero-bias 1x1 conv scoreDepth -> 1
    p["w_e"] = _torch_init(ks[4], cfg.score_depth, (cfg.score_depth,), dtype)
    # decoder-input projections (all stock nn.Linear, with bias)
    p["c_in"] = readout.linear_init(ks[5], cfg.annotation_depth, cfg.state_depth, dtype=dtype)
    p["y_in"] = readout.linear_init(ks[6], cfg.output_depth, cfg.state_depth, dtype=dtype)
    p["dec_in"] = readout.linear_init(ks[7], 2 * cfg.state_depth, cfg.state_depth, dtype=dtype)
    # decoder_recurrent cell
    if cfg.cell == "gru":
        p["cell"] = cells.gru_init(ks[8], cfg.state_depth, cfg.state_depth, dtype)
    elif cfg.cell == "lstm":
        p["cell"] = cells.lstm_init(ks[8], cfg.state_depth, cfg.state_depth, cfg.peepholes, dtype)
    else:
        raise ValueError(cfg.cell)
    # readout MLP on concat(s, c)
    p["readout"] = readout.stack_init(
        ks[9], cfg.state_depth + cfg.annotation_depth, cfg.readout, dtype
    )
    return p


def precompute_vh(params: Params, h: jnp.ndarray) -> jnp.ndarray:
    """Hoisted annotation projection: (B, L, A) -> (B, L, S)."""
    return h @ params["v"]


def location_features(
    params: Params,
    cfg: AttentionConfig,
    alpha_prev: jnp.ndarray,
    axis_name: Optional[str] = None,
) -> jnp.ndarray:
    """UF term: conv over previous alignment. (B, L) -> (B, L, score).

    Padding matches Attention.lua:77-85: odd filter pads (f-1)/2 both
    sides; even filter pads f/2 left, f/2-1 right (producing exactly L
    output frames). Under sequence sharding (`axis_name`) the filter
    support crossing shard boundaries is satisfied by a ppermute halo
    exchange instead of zero padding.
    """
    f = cfg.filt_size
    if f % 2 == 1:
        pad = ((f - 1) // 2, (f - 1) // 2)
    else:
        pad = (f // 2, f // 2 - 1)
    if axis_name is None:
        x = alpha_prev[:, :, None]  # (B, L, 1)
        padding = [pad]
    else:
        x = _halo_exchange(alpha_prev, pad[0], pad[1], axis_name)[:, :, None]
        padding = [(0, 0)]
    feat = jax.lax.conv_general_dilated(
        x,
        params["loc_conv"]["w"],
        window_strides=(1,),
        padding=padding,
        dimension_numbers=("NWC", "WIO", "NWC"),
    ) + params["loc_conv"]["b"]
    return feat @ params["u"]  # (B, L, score)


def attention_weights(
    params: Params,
    cfg: AttentionConfig,
    s_prev: jnp.ndarray,
    alpha_prev: jnp.ndarray,
    vh: jnp.ndarray,
    enc_mask: jnp.ndarray,
    axis_name: Optional[str] = None,
) -> jnp.ndarray:
    """One step of alignment: returns alpha (B, L[/shards])."""
    ws = s_prev @ params["ws"]["w"] + params["ws"]["b"]  # (B, S)
    z = vh + ws[:, None, :]
    if cfg.feature_maps > 0:
        z = z + location_features(params, cfg, alpha_prev, axis_name)
    e = jnp.tanh(z) @ params["w_e"]  # (B, L)
    return masked_softmax(e, enc_mask, axis_name=axis_name)


def _cell_step(params: Params, cfg: AttentionConfig, r, s, mem):
    """decoder_recurrent: returns (s_new, mem_new).

    GRU variant passes prev_mem through untouched
    (model_chorowski_baseline.lua:48-51); LSTM treats (s, mem) = (h, c).
    """
    if cfg.cell == "gru":
        return cells.gru_step(params["cell"], r, s), mem
    return cells.lstm_step(params["cell"], r, (s, mem))


def attention_step(
    params: Params,
    cfg: AttentionConfig,
    state: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],
    y_prev: jnp.ndarray,
    vh: jnp.ndarray,
    h: jnp.ndarray,
    enc_mask: jnp.ndarray,
    ramp: Optional[jnp.ndarray] = None,
    unit_ramp: Optional[jnp.ndarray] = None,
    axis_name: Optional[str] = None,
) -> Tuple[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray], Dict[str, jnp.ndarray]]:
    """One full decoder step (attend -> recur). Returns new state and a
    dict with s, c, alpha, penalty (readout applied separately, see
    decode fns).

    state = (alpha_prev, s_prev, mem_prev); y_prev one-hot (B, V).
    ramp: lambda-scaled gradient-injection ramp (None disables the
    monotonic penalty); unit_ramp: lambda-free ramp for the penalty
    value (defaults to computing from ramp being None -> zeros).
    Under sequence sharding (`axis_name`), h/vh/enc_mask/alpha/ramps are
    sharded over encoder positions; s/c/mem stay replicated.
    """
    alpha_prev, s_prev, mem_prev = state
    alpha = attention_weights(
        params, cfg, s_prev, alpha_prev, vh, enc_mask, axis_name
    )
    if unit_ramp is not None:
        penalty = monotonic_penalty_value(alpha, alpha_prev, unit_ramp, axis_name)
    else:
        penalty = jnp.zeros(alpha.shape[0], alpha.dtype)
    if cfg.mono_align and ramp is not None:
        alpha = monotonic_alignment(alpha, alpha_prev, ramp, penalty)
    c = jnp.einsum("bl,bld->bd", alpha, h)
    if axis_name is not None:
        c = jax.lax.psum(c, axis_name)
    r = readout.linear_apply(
        params["dec_in"],
        jnp.concatenate(
            [
                readout.linear_apply(params["c_in"], c),
                readout.linear_apply(params["y_in"], y_prev),
            ],
            axis=-1,
        ),
    )
    s, mem = _cell_step(params, cfg, r, s_prev, mem_prev)
    # reported penalty is lambda-scaled like the reference scalar
    # (MonotonicAlignment.lua:27-39); `active` for injection uses the
    # unscaled value (same sign).
    return (alpha, s, mem), {
        "s": s, "c": c, "alpha": alpha, "penalty": cfg.penalty_lambda * penalty,
    }


def init_state(
    cfg: AttentionConfig, batch: int, enc_len: int, dtype=jnp.float32
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Zero initial (alpha, s, mem) — Recurrent.lua zero-state templates."""
    return (
        jnp.zeros((batch, enc_len), dtype),
        jnp.zeros((batch, cfg.state_depth), dtype),
        jnp.zeros((batch, cfg.state_depth), dtype),
    )


def apply_readout(
    params: Params,
    cfg: AttentionConfig,
    s: jnp.ndarray,
    c: jnp.ndarray,
    *,
    dropout_rng=None,
    train: bool = False,
) -> jnp.ndarray:
    """decoder_mlp(concat(s, c)) -> log-probs. Works on any batch shape."""
    return readout.stack_apply(
        params["readout"],
        cfg.readout,
        jnp.concatenate([s, c], axis=-1),
        dropout_rng=dropout_rng,
        train=train,
    )


def decode_teacher_forced(
    params: Params,
    cfg: AttentionConfig,
    h: jnp.ndarray,
    enc_lengths: jnp.ndarray,
    labels_onehot: jnp.ndarray,
    dec_mask: jnp.ndarray,
    *,
    dropout_rng=None,
    train: bool = False,
    unroll: int = 1,
    axis_name: Optional[str] = None,
    backend: str = "auto",
    with_readout: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Teacher-forced decode over all T output steps.

    h: (B, L, A) encoder annotations; labels_onehot: (B, T, V);
    dec_mask: (B, T) decoder-step validity. Returns dict with
    logprobs (B, T, V), alpha (B, T, L), penalty (B, T).

    with_readout=False returns {s, c, alpha, penalty} without running
    the readout MLP — the sequence-sharded wrapper
    (parallel/seq_attention.py) hoists the readout OUT of its shard_map
    so it runs once under GSPMD instead of redundantly per sp shard,
    and so its dropout mask is drawn at global batch shape (bitwise
    identical across mesh shapes).

    The readout MLP runs outside the scan over the stacked (s, c) pairs
    so its matmuls are (B*T)-batched on the MXU.

    Under sequence sharding (`axis_name` inside shard_map), h is the
    LOCAL (B, L/n, A) shard and enc_lengths/positions are global; pass
    `pos_offset` semantics via enc_mask construction here: the local
    shard's global positions are inferred from the axis index.
    """
    b, loc_l = h.shape[0], h.shape[1]
    if axis_name is None:
        pos = jnp.arange(loc_l)
    else:
        pos = loc_l * jax.lax.axis_index(axis_name) + jnp.arange(loc_l)
    enc_mask = (pos[None, :] < enc_lengths[:, None]).astype(h.dtype)
    vh = precompute_vh(params, h)
    use_penalty = cfg.mono_align and cfg.penalty_lambda > 0.0
    if use_penalty:
        lens = enc_lengths.astype(h.dtype)[:, None]
        unit_ramp = jnp.maximum(lens - pos[None, :].astype(h.dtype), 0.0)
        base_ramp = cfg.penalty_lambda * unit_ramp
    else:
        unit_ramp = base_ramp = None
    # prev_y sequence: zeros at t=0, labels shifted right by one
    # (RNNAttention.lua:153-156 zeros_y, :174 y[t-1]).
    y_prev = jnp.concatenate(
        [jnp.zeros_like(labels_onehot[:, :1]), labels_onehot[:, :-1]], axis=1
    )
    # Fused Pallas decoder scan (ops/pallas/attention_scan.py): the
    # whole T-step loop in one kernel with vh/h resident in VMEM.
    # Covers GRU recipes both content-only (feature_maps=0) and
    # location-aware (feature_maps>0, the _loc kernels); the lax.scan
    # path below remains for LSTM cells, the active penalty ramp, and
    # sequence sharding.
    if axis_name is None and backend in ("auto", "pallas"):
        from .pallas import attention_scan as _as

        interpret = jax.default_backend() not in ("tpu", "axon")
        if _as.supported(cfg, b, loc_l, h.dtype) and (
            backend == "pallas" or not interpret
        ):
            yin = y_prev @ params["y_in"]["w"] + params["y_in"]["b"]
            block_b = _as.choose_block(
                b, loc_l, cfg.score_depth, cfg.annotation_depth, h.dtype
            )
            if cfg.cell == "lstm":
                # fused gate kernel on concat(s_prev, r): recurrent
                # rows first (cells.lstm_step: gates = x@w_x + h@w_h)
                cw1 = jnp.concatenate(
                    [params["cell"]["w_h"], params["cell"]["w_x"]], axis=0
                )
                cw2 = params["cell"]["b"][None, :]
            else:
                cw1 = params["cell"]["w_zr"]
                cw2 = params["cell"]["w_h"]
            common = (
                vh, h, enc_mask, yin,
                params["ws"]["w"], params["ws"]["b"][None, :],
                params["w_e"][None, :],
                params["c_in"]["w"], params["c_in"]["b"][None, :],
                params["dec_in"]["w"], params["dec_in"]["b"][None, :],
                cw1, cw2,
            )
            lstm = cfg.cell == "lstm"
            if cfg.feature_maps > 0:
                lc = params["loc_conv"]
                fn = (_as.attention_decode_scan_loc_lstm if lstm
                      else _as.attention_decode_scan_loc)
                outs = fn(
                    *common,
                    lc["w"][:, 0, :], lc["b"][None, :], params["u"],
                    block_b, interpret,
                )
            else:
                fn = (_as.attention_decode_scan_lstm if lstm
                      else _as.attention_decode_scan)
                outs = fn(*common, block_b, interpret)
            s_seq, c_seq, alpha_seq = outs[:3]  # LSTM also returns mem
            if use_penalty:
                # Penalty value from the saved alignment sequence (the
                # weighted-sum form, see ops/monotonic.py) and the ramp
                # injection as an extra cotangent on alpha_seq — the
                # fused kernel needs no penalty-specific code.
                a32 = alpha_seq.astype(jnp.float32)
                ap32 = jnp.concatenate(
                    [jnp.zeros_like(a32[:, :1]), a32[:, :-1]], axis=1
                )
                pen_unit = jnp.maximum(
                    jnp.einsum(
                        "btl,bl->bt", a32 - ap32,
                        unit_ramp.astype(jnp.float32),
                    ),
                    0.0,
                )
                alpha_seq = monotonic_alignment_seq(
                    alpha_seq, base_ramp, dec_mask.astype(base_ramp.dtype),
                    pen_unit,
                )
                # Couple the injected alignment into the DIFFERENTIATED
                # graph. The training loss consumes only logprobs (alpha
                # is aux under value_and_grad(has_aux=True)), so without
                # this zero-valued term JAX prunes the custom_vjp above
                # and penalty-active configs silently train with no
                # penalty gradient. The kernel's own alpha->context path
                # contributes the dc@h^T part of d(alpha) internally, so
                # the external cotangent must be EXACTLY the ramp
                # injection — which this 0*sum coupling delivers (its
                # own cotangent contribution is numerically zero).
                s_seq = s_seq + (
                    0.0 * jnp.sum(alpha_seq, axis=-1, keepdims=True)
                ).astype(s_seq.dtype)
                penalty = (
                    cfg.penalty_lambda * pen_unit * dec_mask
                ).astype(dec_mask.dtype)
            else:
                penalty = jnp.zeros_like(dec_mask)
            out = {"alpha": alpha_seq, "penalty": penalty}
            if not with_readout:
                out.update(s=s_seq, c=c_seq)
                return out
            out["logprobs"] = apply_readout(
                params, cfg, s_seq, c_seq, dropout_rng=dropout_rng, train=train
            )
            return out
    # Zero initial state (Recurrent.lua zero-state templates), derived
    # from the traced inputs so it inherits their varying-manual-axes
    # under shard_map (alpha varies with h over dp/sp; s/mem vary with
    # the labels over dp only). Outside shard_map this is plain zeros.
    state0 = (
        jnp.zeros_like(h[:, :, 0]),
        jnp.zeros((b, cfg.state_depth), h.dtype)
        + 0.0 * labels_onehot[:, 0, :1].astype(h.dtype),
        jnp.zeros((b, cfg.state_depth), h.dtype)
        + 0.0 * labels_onehot[:, 0, :1].astype(h.dtype),
    )

    def step(state, inputs):
        y_prev_t, step_mask_t = inputs
        ramp = None
        if base_ramp is not None:
            ramp = base_ramp * step_mask_t[:, None]
        new_state, out = attention_step(
            params, cfg, state, y_prev_t, vh, h, enc_mask,
            ramp=ramp, unit_ramp=unit_ramp, axis_name=axis_name,
        )
        pen = out["penalty"] * step_mask_t
        return new_state, (out["s"], out["c"], out["alpha"], pen)

    xs = (jnp.swapaxes(y_prev, 0, 1), jnp.swapaxes(dec_mask, 0, 1))
    _, (s_seq, c_seq, alpha_seq, pen_seq) = jax.lax.scan(step, state0, xs, unroll=unroll)
    s_seq = jnp.swapaxes(s_seq, 0, 1)  # (B, T, S)
    c_seq = jnp.swapaxes(c_seq, 0, 1)  # (B, T, A)
    out = {
        "alpha": jnp.swapaxes(alpha_seq, 0, 1),
        "penalty": jnp.swapaxes(pen_seq, 0, 1),
    }
    if not with_readout:
        out.update(s=s_seq, c=c_seq)
        return out
    out["logprobs"] = apply_readout(
        params, cfg, s_seq, c_seq, dropout_rng=dropout_rng, train=train
    )
    return out
