"""Chorowski baseline: 3-layer BiGRU encoder + location-aware attention
decoder with GRU recurrence and maxout readout.

Re-design of /root/reference/timit/model_chorowski_baseline.lua (and its
LibriSpeech twin librispeech/model_chorowski_baseline.lua):
  - encoder: 3 stacked BiGRU layers, feature dims
    inputFrameSize -> 2*hidden -> 2*hidden -> 2*output (:22-34), no time
    downsampling;
  - decoder_recurrent: GRU(stateDepth, stateDepth) with prev_mem passed
    through untouched (:48-51);
  - readout: Maxout(state+annotation -> mlpDepth, window 7) ->
    Linear(mlpDepth -> outputDepth) -> LogSoftMax (:53-59), with an
    optional Dropout before the Maxout
    (model_chorowski_baseline_dropout.lua:56);
  - attention: scoreDepth 512, filterSize 10, featureMaps 0 by default
    (pure content+state attention unless overridden), monoAlign=true
    (:38-70).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import attention, rnn

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class ChorowskiConfig:
    input_frame_size: int = 123
    hidden_frame_size: int = 256
    output_frame_size: int = 256
    score_depth: int = 512
    filt_size: int = 10
    feature_maps: int = 0
    state_depth: int = 256
    mlp_depth: int = 64
    output_depth: int = 62  # numPhonemes (TIMIT) / numchars (LibriSpeech)
    penalty_lambda: float = 0.0
    mono_align: bool = True
    dropout: float = 0.0  # >0 reproduces model_chorowski_baseline_dropout
    scan_unroll: int = 1
    rnn_backend: str = "auto"  # "auto" | "xla" | "pallas" (fused GRU scan)
    attn_backend: str = "auto"  # "auto" | "xla" | "pallas" (fused decoder scan)
    # "bfloat16" runs the forward/backward compute in bf16 with float32
    # master params, carries, accumulation, and log-softmax (mixed
    # precision; ~2x step time on the MXU-bound parts). "float32" is
    # bit-compatible with the reference numerics.
    compute_dtype: str = "float32"

    @property
    def annotation_depth(self) -> int:
        return 2 * self.output_frame_size

    def attention_config(self) -> attention.AttentionConfig:
        ro = []
        if self.dropout > 0.0:
            ro.append(("dropout", self.dropout))
        ro += [("maxout", self.mlp_depth, 7), ("linear", self.output_depth)]
        return attention.AttentionConfig(
            score_depth=self.score_depth,
            filt_size=self.filt_size,
            feature_maps=self.feature_maps,
            state_depth=self.state_depth,
            annotation_depth=self.annotation_depth,
            output_depth=self.output_depth,
            cell="gru",
            mono_align=self.mono_align,
            penalty_lambda=self.penalty_lambda,
            readout=tuple(ro),
        )


def init(key, cfg: ChorowskiConfig, dtype=jnp.float32) -> Params:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "encoder": {
            "bigru1": rnn.bigru_init(k1, cfg.input_frame_size, cfg.hidden_frame_size, dtype),
            "bigru2": rnn.bigru_init(k2, 2 * cfg.hidden_frame_size, cfg.hidden_frame_size, dtype),
            "bigru3": rnn.bigru_init(k3, 2 * cfg.hidden_frame_size, cfg.output_frame_size, dtype),
        },
        "decoder": attention.attention_init(k4, cfg.attention_config(), dtype),
    }


def encode(
    params: Params, cfg: ChorowskiConfig, x: jnp.ndarray, lengths: jnp.ndarray
) -> jnp.ndarray:
    """x: (B, L, input_frame_size) -> annotations (B, L, 2*output_frame_size)."""
    enc = params["encoder"]
    u = cfg.scan_unroll
    be = cfg.rnn_backend
    h = rnn.bigru_layer(enc["bigru1"], x, lengths, unroll=u, backend=be)
    h = rnn.bigru_layer(enc["bigru2"], h, lengths, unroll=u, backend=be)
    h = rnn.bigru_layer(enc["bigru3"], h, lengths, unroll=u, backend=be)
    return h


def forward(
    params: Params,
    cfg: ChorowskiConfig,
    x: jnp.ndarray,
    x_lengths: jnp.ndarray,
    labels_onehot: jnp.ndarray,
    dec_mask: jnp.ndarray,
    *,
    dropout_rng: Optional[jax.Array] = None,
    train: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Full autoencoder forward (reference autoencoder gModule,
    model_chorowski_baseline.lua:73-75): encode then teacher-forced decode.

    Returns dict with logprobs (B, T, V), alpha (B, T, L), penalty (B, T).
    """
    dt = jnp.dtype(cfg.compute_dtype)
    if dt != jnp.float32:
        cast = lambda a: a.astype(dt) if a.dtype == jnp.float32 else a
        params = jax.tree.map(cast, params)
        x = cast(x)
        labels_onehot = cast(labels_onehot)
        dec_mask = cast(dec_mask)
    h = encode(params, cfg, x, x_lengths)
    return attention.decode_teacher_forced(
        params["decoder"],
        cfg.attention_config(),
        h,
        x_lengths,
        labels_onehot,
        dec_mask,
        dropout_rng=dropout_rng,
        train=train,
        unroll=cfg.scan_unroll,
        backend=cfg.attn_backend,
    )
