"""Fused Pallas log-mel front end: framing -> windowed real DFT power
-> mel filterbank -> log amplitude (+ per-frame RMS energy).

TPU-native replacement for the reference's offline librosa pipeline
(/root/reference/timit/preprocess_timit.py:196-209 — STFT n_fft=2048
hop=512 hann + mel-128 + logamplitude + rmse). The reference runs this
in a separate Python 2 process on the host; here the whole front end is
ONE on-device kernel so raw PCM can be fed straight to the encoder with
no host round trip.

Kernel design (everything rides the MXU):
  - n_fft = 2048 = 4*hop, so a block of FB frames is built from a
    (FB+3, hop) chunk matrix by concatenating 4 sublane-shifted static
    slices — no gather, no per-frame loop;
  - the Hann window is folded into the DFT matrices
    (w ⊙ f) @ C == f @ (diag(w) C), removing the elementwise pass;
  - the real DFT is two f32 matmuls per 128-wide frequency tile
    (grid axis k streams the (2048, 128) cos/sin tiles through VMEM);
    power accumulates in a VMEM scratch (FB, FPAD);
  - on the last tile: one (FPAD, n_mels) mel matmul, 10*log10(max(amin,.))
    and energy = sqrt(mean_f power) are computed and written out.

Per-utterance top_db clipping, the nfreqs slice, deltas and corpus
normalization happen in the thin XLA wrapper below (elementwise / tiny
convs that XLA fuses); numerics match data/features.py:logmel_np.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...data import features as F

NFFT = F.N_FFT  # 2048
HOP = F.HOP  # 512
NCHUNK = NFFT // HOP  # 4 — frame = 4 consecutive hop-chunks
NFREQ = 1 + NFFT // 2  # 1025 real bins
FPAD = 1152  # 9 * 128 lane tiles
KTILE = 128
NK = FPAD // KTILE  # 9 frequency tiles
FB = 128  # frames per block
N_MELS = 128
OUT_W = 256  # lane-aligned output: 128 mels | energy (col 128) | pad


@functools.lru_cache(maxsize=4)
def _dft_mel_consts(sr: int):
    """Window-folded real-DFT cos/sin (NFFT, FPAD) and melW (FPAD, 128)."""
    n = np.arange(NFFT, dtype=np.float64)[:, None]
    k = np.arange(NFREQ, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n * k / NFFT
    w = np.hanning(NFFT + 1)[:-1][:, None]  # periodic hann (features.py:115)
    cw = np.zeros((NFFT, FPAD), np.float32)
    sw = np.zeros((NFFT, FPAD), np.float32)
    cw[:, :NFREQ] = (w * np.cos(ang)).astype(np.float32)
    sw[:, :NFREQ] = (w * np.sin(ang)).astype(np.float32)
    mel = np.zeros((FPAD, N_MELS), np.float32)
    mel[:NFREQ, :] = F.mel_filterbank(sr, NFFT, N_MELS).T.astype(np.float32)
    return cw, sw, mel


def _kernel(yp_ref, cw_ref, sw_ref, mel_ref, out_ref, fr_scr, pw_scr):
    j = pl.program_id(1)
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        # Frame block j: samples [j*FB*hop, (j*FB + FB+3)*hop) of this
        # row, chunked to (FB+NCHUNK-1, hop); frame f = chunks[f:f+4].
        start = pl.multiple_of(j * (FB * HOP), HOP)
        # Four hop-shifted reshaped loads (Mosaic cannot concatenate
        # sublane-offset slices of one load, so re-slice the row).
        for c in range(NCHUNK):
            fr_scr[:, c * HOP : (c + 1) * HOP] = yp_ref[
                0, 0, pl.ds(start + c * HOP, FB * HOP)
            ].reshape(FB, HOP)

    frames = fr_scr[:]
    re = jnp.dot(frames, cw_ref[:], preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    im = jnp.dot(frames, sw_ref[:], preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    pw_scr[:, pl.ds(k * KTILE, KTILE)] = re * re + im * im

    @pl.when(k == NK - 1)
    def _():
        power = pw_scr[:]
        mel = jnp.dot(power, mel_ref[:], preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
        out_ref[0, :, :N_MELS] = 10.0 * jnp.log10(jnp.maximum(F.AMIN, mel))
        # RMS over the NFREQ real bins (padded columns are zero); lives
        # in column N_MELS of the lane-aligned 256-wide output block.
        en = jnp.sqrt(jnp.sum(power, axis=1, keepdims=True) / NFREQ)
        out_ref[0, :, N_MELS:] = jnp.broadcast_to(en, (FB, OUT_W - N_MELS))


def stft_logmel_power(yp, sr: int, interpret: bool = False):
    """(B, S) padded PCM -> (lm (B, L, 128) dB, energy (B, L)).

    `yp` must already be reflect-padded by n_fft//2 on both ends and
    zero-padded so that S >= (ceil(L/FB)*FB + NCHUNK - 1) * hop, with
    L = 1 + (S_reflect - n_fft)//hop frames of interest.
    """
    b, s = yp.shape
    nframes = 1 + (s - NFFT) // HOP
    j = max(1, -(-nframes // FB))
    need = (j * FB + NCHUNK - 1) * HOP
    if s < need:
        yp = jnp.pad(yp, ((0, 0), (0, need - s)))
        s = need
    cw, sw, mel = _dft_mel_consts(sr)
    out = pl.pallas_call(
        _kernel,
        grid=(b, j, NK),
        in_specs=[
            # (B, 1, S) so the trailing block dims equal the array dims
            # (Mosaic requires (8,128)-divisible or full-dim blocks).
            pl.BlockSpec((1, 1, s), lambda bi, ji, ki: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NFFT, KTILE), lambda bi, ji, ki: (0, ki),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NFFT, KTILE), lambda bi, ji, ki: (0, ki),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((FPAD, N_MELS), lambda bi, ji, ki: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, FB, OUT_W), lambda bi, ji, ki: (bi, ji, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, j * FB, OUT_W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((FB, NFFT), jnp.float32),
            pltpu.VMEM((FB, FPAD), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * j * FB * NFFT * (2 * FPAD) + 2 * b * j * FB * FPAD * N_MELS,
            bytes_accessed=4 * (b * s + NK * 2 * NFFT * KTILE + b * j * FB * (N_MELS + 1)),
            transcendentals=b * j * FB * N_MELS,
        ),
        interpret=interpret,
    )(yp[:, None, :], cw, sw, mel)
    return out[:, :nframes, :N_MELS], out[:, :nframes, N_MELS]


def _deltas(spectr):
    """Width-9 ramp delta + delta-delta (shared helper in features.py)."""
    d1 = F.delta_batched_jax(spectr)
    return d1, F.delta_batched_jax(d1)


def logmel_pallas(y, sr: int = 16000, nfreqs: int = 40, mean=None, std=None,
                  interpret: bool = False):
    """(B, N) PCM -> (B, L, 3*(nfreqs+1)) — fused-kernel twin of
    data/features.py:logmel_jax (same numerics, same layout)."""
    pad = NFFT // 2
    yp = jnp.pad(y.astype(jnp.float32), ((0, 0), (pad, pad)), mode="reflect")
    lm, en = stft_logmel_power(yp, sr, interpret=interpret)
    peak = jnp.max(lm, axis=(1, 2), keepdims=True)
    lm = jnp.maximum(lm, peak - F.TOP_DB)[..., :nfreqs]
    spectr = jnp.concatenate([lm, en[..., None]], axis=-1)
    d1, d2 = _deltas(spectr)
    feats = jnp.concatenate([spectr, d1, d2], axis=-1)
    if mean is not None:
        feats = (feats - jnp.asarray(mean, jnp.float32)) / jnp.asarray(
            std, jnp.float32)
    return feats


def logmel_stacked_pallas(y, sr: int = 16000, nfreqs: int = 40,
                          interpret: bool = False):
    """(B, N) PCM -> (B, 3, L, nfreqs) channel-stacked logmel/Δ/ΔΔ —
    fused-kernel twin of features.py:logmel_stacked_np (VGG input)."""
    pad = NFFT // 2
    yp = jnp.pad(y.astype(jnp.float32), ((0, 0), (pad, pad)), mode="reflect")
    lm, _ = stft_logmel_power(yp, sr, interpret=interpret)
    peak = jnp.max(lm, axis=(1, 2), keepdims=True)
    lm = jnp.maximum(lm, peak - F.TOP_DB)[..., :nfreqs]
    d1, d2 = _deltas(lm)
    return jnp.stack([lm, d1, d2], axis=1)
