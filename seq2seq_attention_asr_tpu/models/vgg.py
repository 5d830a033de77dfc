"""LibriSpeech VGG model — conv-only encoder on 3-channel stacked
features (/root/reference/librispeech/model_vgg.lua).

Encoder (:24-54): VGG block on (B, L, freq, 3) NHWC inputs —
conv3x3(3->64), ReLU, conv3x3(64->64), ReLU, freq-only maxpool(1x2),
conv3x3(64->128), ReLU, conv3x3(128->128), ReLU, maxpool(2x2) — giving
time' = floor((L-8)/2) and freq' = floor((floor((freq-4)/2)-4)/2); then a
height-collapse reshape to (B, L', 128*freq') and a 4-layer 1x1-conv MLP
128*freq' -> 2048 -> 2048 -> 2048 -> outputFrameSize with ReLU.

Decoder (:58-93): same attention recipe with annotationDepth =
outputFrameSize (no x2, :63) and a two-layer maxout readout (:74-82).

Torch's SpatialMaxPooling(2,1,2,1) takes (kW, kH) width-first with the
spatial layout (C, time, freq) — i.e. the first pool halves only the
FREQUENCY axis; the comment block at :35-43 confirms time shrinks by 8
then halves once.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..ops import attention, conv, readout

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class VGGConfig:
    input_frame_size: int = 40  # freq bins per channel (stacked logmel)
    output_frame_size: int = 512
    score_depth: int = 512
    filt_size: int = 10
    feature_maps: int = 0
    state_depth: int = 256
    mlp_depth: int = 64
    output_depth: int = 62
    penalty_lambda: float = 0.0
    mono_align: bool = True
    scan_unroll: int = 1
    # "bfloat16": bf16 compute with f32 master params and log-softmax
    compute_dtype: str = "float32"

    @property
    def annotation_depth(self) -> int:
        return self.output_frame_size  # no x2 (model_vgg.lua:63)

    @property
    def collapsed_freq(self) -> int:
        h = self.input_frame_size
        h = (h - 4) // 2
        h = (h - 4) // 2
        return 128 * h

    def attention_config(self) -> attention.AttentionConfig:
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
            readout=(
                ("maxout", self.mlp_depth, 7),
                ("linear", self.mlp_depth),
                ("maxout", self.mlp_depth, 7),
                ("linear", self.output_depth),
            ),
        )


def init(key, cfg: VGGConfig, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 10)
    return {
        "encoder": {
            "c1": conv.spatial_conv_init(ks[0], 3, 64, 3, 3, dtype),
            "c2": conv.spatial_conv_init(ks[1], 64, 64, 3, 3, dtype),
            "c3": conv.spatial_conv_init(ks[2], 64, 128, 3, 3, dtype),
            "c4": conv.spatial_conv_init(ks[3], 128, 128, 3, 3, dtype),
            "fc1": readout.linear_init(ks[4], cfg.collapsed_freq, 2048, dtype=dtype),
            "fc2": readout.linear_init(ks[5], 2048, 2048, dtype=dtype),
            "fc3": readout.linear_init(ks[6], 2048, 2048, dtype=dtype),
            "fc4": readout.linear_init(ks[7], 2048, cfg.output_frame_size, dtype=dtype),
        },
        "decoder": attention.attention_init(ks[8], cfg.attention_config(), dtype),
    }


def encode_lengths(cfg: VGGConfig, lengths: jnp.ndarray) -> jnp.ndarray:
    """time' = floor((L - 8) / 2) (model_vgg.lua:35-36)."""
    return jnp.maximum((lengths - 8) // 2, 0)


def encode(params: Params, cfg: VGGConfig, x: jnp.ndarray, lengths: jnp.ndarray):
    """x: (B, L, freq, 3) NHWC -> (annotations (B, L', out), lengths')."""
    enc = params["encoder"]
    h = jax.nn.relu(conv.spatial_conv(enc["c1"], x))
    h = jax.nn.relu(conv.spatial_conv(enc["c2"], h))
    h = conv.spatial_max_pool(h, 1, 2, 1, 2)  # freq-only pool
    h = jax.nn.relu(conv.spatial_conv(enc["c3"], h))
    h = jax.nn.relu(conv.spatial_conv(enc["c4"], h))
    h = conv.spatial_max_pool(h, 2, 2, 2, 2)
    b, lt, fr, c = h.shape
    h = h.reshape(b, lt, fr * c)  # height-collapse (Transpose2+View, :45-46)
    for name in ("fc1", "fc2", "fc3", "fc4"):
        h = jax.nn.relu(readout.linear_apply(enc[name], h))
    return h, encode_lengths(cfg, lengths)


def forward(
    params: Params,
    cfg: VGGConfig,
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
    )
