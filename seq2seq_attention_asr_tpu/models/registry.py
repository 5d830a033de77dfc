"""Uniform model facade — replaces the reference's `loadmodel(opt)`
contract (timit/model_chorowski_baseline.lua:10,78-82) with a typed
registry. Every model family exposes the same surface:

  init(key) -> params
  forward(params, x, x_len, labels_onehot, dec_mask, *, dropout_rng,
          train) -> dict(logprobs, alpha, penalty)
  encode(params, x, x_len) -> (annotations, annotation_lengths)
  attention_cfg  (for decoding)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict

import jax.numpy as jnp

from . import chorowski, conv_bilstm, vgg


@dataclasses.dataclass(frozen=True)
class Model:
    name: str
    cfg: Any
    init: Callable
    forward: Callable
    encode: Callable
    attention_cfg: Any

    @property
    def output_depth(self) -> int:
        return self.cfg.output_depth


def build(name: str, **overrides) -> Model:
    """name: chorowski | chorowski_dropout | conv_bilstm | vgg.

    Overrides are config-dataclass fields (e.g. output_depth=30 for a
    LibriSpeech char vocab — the reference's librispeech twin model is
    the same architecture with numchars outputs,
    librispeech/model_chorowski_baseline.lua + exp0_scriptchecker:42).
    """
    if name == "chorowski_dropout":
        overrides.setdefault("dropout", 0.5)
        name = "chorowski"
    if name == "chorowski":
        cfg = chorowski.ChorowskiConfig(**overrides)
        return Model(
            name=name,
            cfg=cfg,
            init=lambda key, dtype=jnp.float32: chorowski.init(key, cfg, dtype),
            forward=lambda p, x, xl, oh, dm, **kw: chorowski.forward(
                p, cfg, x, xl, oh, dm, **kw
            ),
            encode=lambda p, x, xl: (chorowski.encode(p, cfg, x, xl), xl),
            attention_cfg=cfg.attention_config(),
        )
    if name == "conv_bilstm":
        cfg = conv_bilstm.ConvBiLSTMConfig(**overrides)
        return Model(
            name=name,
            cfg=cfg,
            init=lambda key, dtype=jnp.float32: conv_bilstm.init(key, cfg, dtype),
            forward=lambda p, x, xl, oh, dm, **kw: conv_bilstm.forward(
                p, cfg, x, xl, oh, dm, **kw
            ),
            encode=lambda p, x, xl: conv_bilstm.encode(p, cfg, x, xl),
            attention_cfg=cfg.attention_config(),
        )
    if name == "vgg":
        cfg = vgg.VGGConfig(**overrides)
        return Model(
            name=name,
            cfg=cfg,
            init=lambda key, dtype=jnp.float32: vgg.init(key, cfg, dtype),
            forward=lambda p, x, xl, oh, dm, **kw: vgg.forward(
                p, cfg, x, xl, oh, dm, **kw
            ),
            encode=lambda p, x, xl: vgg.encode(p, cfg, x, xl),
            attention_cfg=cfg.attention_config(),
        )
    raise ValueError(f"unknown model {name!r}")
