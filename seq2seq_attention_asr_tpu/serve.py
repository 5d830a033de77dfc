"""End-to-end on-device transcription — the serving surface.

The reference has no inference API at all (decoding only happens inside
the training script's Evaluate loop, timit/timit.lua:368-417). For
production serving the whole pipeline must live on device behind one
jit: raw PCM -> fused log-mel front end (ops/pallas/logmel.py) ->
encoder -> batched beam search (fused single-step attention kernel) ->
token ids; only the final detokenization is host-side.

Static-shape discipline: PCM lengths are bucketed so every bucket
compiles once (frame counts round to multiples of 16 — the fused
kernels' tile-friendly encoder axis).

Throughput scales with batch size: beam decoding is a sequential
while_loop whose per-step cost is nearly batch-independent up to the
fused kernel's VMEM-fitting block, so transcribe() big batches
(decode-bench throughput at b=128 is ~11k audio-s/s on one v5e chip;
a batch of 4 measures ~60). Verified end to end on the chip.

Usage:
    t = Transcriber(model, params, mean=mean, std=std, eos_id=61,
                    id_to_text=lambda ids: " ".join(vocab.phones[i] for i in ids))
    texts = t.transcribe(list_of_pcm_float_arrays)
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence

import numpy as np

from .data import features
from .decode import beam as beam_lib

HOP = features.HOP
SR = 16000


@dataclasses.dataclass
class Transcription:
    ids: np.ndarray  # token ids, eos stripped
    score: float  # total beam logprob
    text: Optional[str] = None


def pack_bucket(pcms, idxs, frames, l_pad: int):
    """Pack bucket members into one (n, l_pad*HOP - 1) PCM matrix.

    The buffer is the WIDEST length that still frames to exactly l_pad
    (a member has len(p) <= l_pad*HOP - 1, else it would frame to
    l_pad + 1), so no trailing samples are ever dropped. Each row's tail
    is filled with the reflect continuation of its signal — the centered
    STFT's right padding (features.stft_np pads mode="reflect" about the
    TRUE signal end) — so the last frame's features match the offline
    per-utterance pipeline (tests/test_serve.py pins this against
    features.logmel_np)."""
    n_samp = l_pad * HOP - 1
    x = np.zeros((len(idxs), n_samp), np.float32)
    nf = np.zeros((len(idxs),), np.int32)
    ns = np.zeros((len(idxs),), np.int32)
    for j, i in enumerate(idxs):
        p = np.asarray(pcms[i], np.float32)
        x[j, : len(p)] = p
        tail = min(n_samp - len(p), len(p) - 1)
        if tail > 0:
            x[j, len(p) : len(p) + tail] = np.pad(
                p, (0, tail), mode="reflect"
            )[len(p):]
        nf[j] = frames[i]
        ns[j] = len(p)
    return x, nf, ns


class Transcriber:
    """Batched PCM -> text. One jit-compiled program per length bucket.

    mean/std: corpus normalization stats from preprocessing
    (tools/preprocess_timit.py writes mean_std.npz); pad_frames
    replicates the offline pipeline's zero-frame padding both ends
    (preprocess_timit.py:261-286, pad=10 for TIMIT, 1 for LibriSpeech).
    """

    def __init__(
        self,
        model,
        params,
        *,
        eos_id: int,
        mean=None,
        std=None,
        pad_frames: int = 10,
        beam_k: int = 5,
        len_factor: float = 1.0,
        frontend: str = "pallas",  # "pallas" | "xla"
        exact: bool = True,
        id_to_text: Optional[Callable[[Sequence[int]], str]] = None,
        frame_bucket: int = 16,
    ):
        import jax
        import jax.numpy as jnp

        self._jax, self._jnp = jax, jnp
        self.model = model
        # device-resident ONCE: params loaded from a checkpoint are
        # host numpy arrays, and a host-resident jit arg re-uploads the
        # whole model every transcribe() call (catastrophic over a slow
        # host<->device link — measured 1.33 s/call vs 34 ms on the
        # tunneled chip).
        self.params = jax.tree.map(jnp.asarray, params)
        self.eos_id = int(eos_id)
        self.mean = None if mean is None else np.asarray(mean, np.float32)
        self.std = None if std is None else np.asarray(std, np.float32)
        self.pad_frames = int(pad_frames)
        self.beam_k = int(beam_k)
        self.len_factor = float(len_factor)
        self.frontend = frontend
        # exact: features bit-match the offline per-utterance pipeline
        # (reflect-mapped gathers + length-clamped deltas, logmel_jax
        # n_samples mode) for every bucket member; False runs the fused
        # Pallas kernel over the padded buffer (faster, tail frames'
        # features deviate within the batch padding convention).
        # Measured cost of exact=True (one v5e chip, BENCH r4): p50
        # 94.7 ms vs 82.1 ms at b=1, 151.4 vs 126.8 ms at b=8 —
        # ~15-19%. Keep the default for parity; flip to False when
        # front-end bit-exactness does not matter.
        self.exact = bool(exact)
        self.id_to_text = id_to_text
        self.frame_bucket = int(frame_bucket)
        self._fns = {}  # padded frame count -> jitted pipeline

    # -- static-shape pipeline ------------------------------------------

    def _pipeline(self, l_pad: int):
        fn = self._fns.get(l_pad)
        if fn is not None:
            return fn
        jax, jnp = self._jax, self._jnp
        model, pad = self.model, self.pad_frames
        interpret = jax.default_backend() not in ("tpu", "axon")
        frontend = "xla" if (self.frontend == "pallas" and interpret) else self.frontend
        mean = None if self.mean is None else jnp.asarray(self.mean)
        std = None if self.std is None else jnp.asarray(self.std)
        cap = int(np.ceil(self.len_factor * (l_pad + 2 * pad)))

        exact = self.exact

        def run(params, pcm, n_frames, n_samples, eos):
            feats = features.logmel_device(
                pcm, SR, mean=mean, std=std, backend=frontend,
                n_samples=n_samples if exact else None,
            )
            if pad:
                z = jnp.zeros((feats.shape[0], pad, feats.shape[2]), feats.dtype)
                feats = jnp.concatenate([z, feats, z], axis=1)
            feat_len = n_frames + 2 * pad
            h, h_len = model.encode(params, feats, feat_len)
            max_steps = jnp.minimum(
                (self.len_factor * h_len).astype(jnp.int32), cap
            )
            return beam_lib.beam_search(
                params["decoder"], model.attention_cfg, h, h_len, eos,
                k=self.beam_k, max_steps=max_steps, max_steps_cap=cap,
            )

        fn = jax.jit(run)
        self._fns[l_pad] = fn
        return fn

    # -- public API -------------------------------------------------------

    def transcribe(self, pcms: Sequence[np.ndarray]) -> List[Transcription]:
        """pcms: float arrays in [-1, 1) at 16 kHz (any lengths).

        Groups utterances into frame-count buckets, runs each bucket as
        one batch, returns results in input order.
        """
        jnp = self._jnp
        n = len(pcms)
        frames = [features.frames_for_samples(len(p)) for p in pcms]
        buckets = {}
        for i, f in enumerate(frames):
            l_pad = -(-f // self.frame_bucket) * self.frame_bucket
            buckets.setdefault(l_pad, []).append(i)

        out: List[Optional[Transcription]] = [None] * n
        for l_pad, idxs in sorted(buckets.items()):
            x, nf, ns = pack_bucket(pcms, idxs, frames, l_pad)
            eos = np.full((len(idxs),), self.eos_id, np.int32)
            res = self._pipeline(l_pad)(
                self.params, jnp.asarray(x), jnp.asarray(nf),
                jnp.asarray(ns), jnp.asarray(eos),
            )
            toks = np.asarray(res.tokens)
            lens = np.asarray(res.lengths)
            scores = np.asarray(res.scores)
            for j, i in enumerate(idxs):
                ids = toks[j, : int(lens[j])]
                if len(ids) and ids[-1] == self.eos_id:
                    ids = ids[:-1]
                t = Transcription(ids=ids, score=float(scores[j]))
                if self.id_to_text is not None:
                    t.text = self.id_to_text(ids)
                out[i] = t
        return out  # type: ignore[return-value]
