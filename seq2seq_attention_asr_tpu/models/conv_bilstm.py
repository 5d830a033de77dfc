"""Conv + BiLSTM TIMIT model — the inline architecture at
/root/reference/timit/timit.lua:98-169.

Encoder: 3 x (TemporalConvolution(kW=3, VALID) + ReLU +
TemporalMaxPooling(2,2)) giving 8x time downsampling (:108-120), then
forward+backward LSTM(hidden=256 -> 128) concatenated (:122-125).
Decoder: LSTM decoder_recurrent (stateDepth 400, :137), MLP readout
Linear(state+annotation -> 2V) -> ReLU -> Linear(-> V) -> LogSoftMax
(:138-145), attention scoreDepth 150, filterSize 5, featureMaps 16
(:128-135).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..ops import attention, conv, rnn

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class ConvBiLSTMConfig:
    input_frame_size: int = 123
    hidden_frame_size: int = 256
    output_frame_size: int = 128
    kw: int = 3
    score_depth: int = 150
    filt_size: int = 5
    feature_maps: int = 16
    state_depth: int = 400
    output_depth: int = 62
    penalty_lambda: float = 0.0
    mono_align: bool = True
    peepholes: bool = False
    scan_unroll: int = 1
    rnn_backend: str = "auto"  # "auto" | "xla" | "pallas" (fused BiLSTM scan)
    attn_backend: str = "auto"  # "auto" | "xla" | "pallas" (fused LSTM decoder)
    # "bfloat16": bf16 compute with f32 master params and log-softmax
    compute_dtype: str = "float32"

    @property
    def annotation_depth(self) -> int:
        return 2 * self.output_frame_size

    def attention_config(self) -> attention.AttentionConfig:
        return attention.AttentionConfig(
            score_depth=self.score_depth,
            filt_size=self.filt_size,
            feature_maps=self.feature_maps,
            state_depth=self.state_depth,
            annotation_depth=self.annotation_depth,
            output_depth=self.output_depth,
            cell="lstm",
            peepholes=self.peepholes,
            mono_align=self.mono_align,
            penalty_lambda=self.penalty_lambda,
            readout=(
                ("linear", 2 * self.output_depth),
                ("relu",),
                ("linear", self.output_depth),
            ),
        )


def init(key, cfg: ConvBiLSTMConfig, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 5)
    return {
        "encoder": {
            "conv1": conv.temporal_conv_init(ks[0], cfg.input_frame_size, cfg.hidden_frame_size, cfg.kw, dtype=dtype),
            "conv2": conv.temporal_conv_init(ks[1], cfg.hidden_frame_size, cfg.hidden_frame_size, cfg.kw, dtype=dtype),
            "conv3": conv.temporal_conv_init(ks[2], cfg.hidden_frame_size, cfg.hidden_frame_size, cfg.kw, dtype=dtype),
            "bilstm": rnn.bilstm_init(ks[3], cfg.hidden_frame_size, cfg.output_frame_size, dtype=dtype),
        },
        "decoder": attention.attention_init(ks[4], cfg.attention_config(), dtype),
    }


def encode_lengths(cfg: ConvBiLSTMConfig, lengths: jnp.ndarray) -> jnp.ndarray:
    """Length transform of the 3 conv+pool blocks (timit.lua:112,116,120)."""
    for _ in range(3):
        lengths = conv.conv_out_length(lengths, cfg.kw)  # VALID conv
        lengths = conv.conv_out_length(lengths, 2, 2)  # pool
    return lengths


def encode(params: Params, cfg: ConvBiLSTMConfig, x: jnp.ndarray, lengths: jnp.ndarray):
    """x: (B, L, F) -> (annotations (B, L', 2*out), lengths' (B,))."""
    enc = params["encoder"]
    h = x
    for name in ("conv1", "conv2", "conv3"):
        h = jax.nn.relu(conv.temporal_conv(enc[name], h))
        h = conv.temporal_max_pool(h, 2)
    out_lengths = encode_lengths(cfg, lengths)
    h = rnn.bilstm_layer(enc["bilstm"], h, out_lengths, unroll=cfg.scan_unroll,
                         backend=cfg.rnn_backend)
    return h, out_lengths


def forward(
    params: Params,
    cfg: ConvBiLSTMConfig,
    x: jnp.ndarray,
    x_lengths: jnp.ndarray,
    labels_onehot: jnp.ndarray,
    dec_mask: jnp.ndarray,
    *,
    dropout_rng: Optional[jax.Array] = None,
    train: bool = False,
) -> Dict[str, jnp.ndarray]:
    dt = jnp.dtype(cfg.compute_dtype)
    if dt != jnp.float32:
        cast = lambda a: a.astype(dt) if a.dtype == jnp.float32 else a
        params = jax.tree.map(cast, params)
        x = cast(x)
        labels_onehot = cast(labels_onehot)
        dec_mask = cast(dec_mask)
    h, enc_lengths = encode(params, cfg, x, x_lengths)
    return attention.decode_teacher_forced(
        params["decoder"],
        cfg.attention_config(),
        h,
        enc_lengths,
        labels_onehot,
        dec_mask,
        dropout_rng=dropout_rng,
        train=train,
        unroll=cfg.scan_unroll,
        backend=cfg.attn_backend,
    )
