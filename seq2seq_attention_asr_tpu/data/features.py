"""Acoustic feature front end: STFT -> log-mel (+energy, deltas).

Numerics follow the reference's offline extractors
(/root/reference/timit/preprocess_timit.py:196-253 and
librispeech/preprocess.py:116-224), which used Python-2-era librosa:

  - STFT: n_fft=2048, hop=512, hann window, center=True w/ reflect pad;
  - mel: 128 slaney-normalized filters over [0, sr/2], power=2 spectrum,
    then the first ``nfreqs``(=40) rows are kept;
  - logamplitude: 10*log10(max(amin, S)) with amin=1e-10, ref=1.0, then
    clipped below max-80dB (top_db);
  - RMS energy: sqrt(mean(|STFT|^2, freq)) per frame (old librosa rmse);
  - delta: width-9 centered linear ramp correlation with edge padding,
    unnormalized (old librosa lfilter delta) — note the subsequent
    global mean/variance normalization makes the normalization constant
    irrelevant;
  - feature layouts: ``logmel`` -> (L, nfreqs+1 [+2x(nfreqs+1)]) = L x 123,
    ``logmel_stacked`` -> (3, L, nfreqs) channel stack;
  - corpus normalization: per-dim train-set mean/std, then ``pad``
    zero frames both ends (preprocess_timit.py:261-286).

Both a NumPy path (offline preprocessing, exact parity target) and a
batched JAX path (on-device extraction; jit/pjit-able, feeds straight
into the encoder without a host round trip) are provided; they share
filterbank construction. The CQT variants offer method="pseudo"
(log-spaced filterbank on the STFT — fast, resolution-limited below
~bin 24) and method="exact" (direct constant-Q kernels, cqt_exact_np —
the mathematically exact transform librosa's multirate CQT computes);
tests/test_data.py measures the pseudo variant's per-bin deviation.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

N_FFT = 2048
HOP = 512
AMIN = 1e-10
TOP_DB = 80.0


# ---------------------------------------------------------------------------
# Filterbanks (NumPy; built once, constants under jit)
# ---------------------------------------------------------------------------


def hz_to_mel(f):
    """Slaney mel scale (librosa htk=False default)."""
    f = np.asanyarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    mel = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mel)


def mel_to_hz(m):
    m = np.asanyarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = f_sp * m
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


@functools.lru_cache(maxsize=8)
def mel_filterbank(sr: int, n_fft: int = N_FFT, n_mels: int = 128) -> np.ndarray:
    """(n_mels, 1 + n_fft//2) slaney-normalized triangular filters."""
    fmax = sr / 2.0
    fft_freqs = np.linspace(0.0, sr / 2.0, 1 + n_fft // 2)
    mel_pts = mel_to_hz(np.linspace(hz_to_mel(0.0), hz_to_mel(fmax), n_mels + 2))
    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_pts[2 : n_mels + 2] - mel_pts[:n_mels])
    return (weights * enorm[:, None]).astype(np.float64)


@functools.lru_cache(maxsize=8)
def pseudo_cqt_filterbank(
    sr: int, n_fft: int = N_FFT, n_bins: int = 84, fmin: Optional[float] = None, bins_per_octave: int = 12
) -> np.ndarray:
    """Log-spaced triangular filterbank approximating CQT bin centers.

    Documented deviation: librosa.cqt is a multirate filterbank; this
    projects the STFT onto geometrically spaced triangles (pseudo-CQT).
    """
    fmin = fmin or 32.703195662574829  # C1, librosa default
    freqs = fmin * 2.0 ** (np.arange(n_bins) / bins_per_octave)
    edges = fmin * 2.0 ** ((np.arange(n_bins + 2) - 1) / bins_per_octave)
    fft_freqs = np.linspace(0.0, sr / 2.0, 1 + n_fft // 2)
    ramps = edges[:, None] - fft_freqs[None, :]
    fdiff = np.diff(edges)
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    return weights.astype(np.float64), freqs


# ---------------------------------------------------------------------------
# NumPy offline path (preprocessing parity)
# ---------------------------------------------------------------------------


def stft_np(y: np.ndarray, n_fft: int = N_FFT, hop: int = HOP) -> np.ndarray:
    """Centered STFT -> (1 + n_fft//2, n_frames) complex."""
    pad = n_fft // 2
    y = np.pad(y, pad, mode="reflect")
    n_frames = 1 + (len(y) - n_fft) // hop
    window = np.hanning(n_fft + 1)[:-1]  # periodic hann (scipy/librosa)
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = y[idx] * window[None, :]
    return np.fft.rfft(frames, n=n_fft, axis=1).T


def power_to_db(S: np.ndarray, amin: float = AMIN, top_db: float = TOP_DB) -> np.ndarray:
    """librosa.core.logamplitude with ref=1.0."""
    log_spec = 10.0 * np.log10(np.maximum(amin, S))
    if top_db is not None:
        log_spec = np.maximum(log_spec, log_spec.max() - top_db)
    return log_spec


def delta_np(data: np.ndarray, width: int = 9, order: int = 1, axis: int = -1) -> np.ndarray:
    """Old-librosa delta: centered ramp correlation, edge pad, unnormalized.

    delta[i] = sum_{k=1..h} k * (x[i+k] - x[i-k]), h = width//2.
    order=2 applies it twice.
    """
    half = width // 2
    kernel = np.arange(-half, half + 1, dtype=np.float64)
    out = data.astype(np.float64)
    for _ in range(order):
        pad = [(0, 0)] * out.ndim
        pad[axis] = (half, half)
        padded = np.pad(out, pad, mode="edge")
        # np.correlate(a, v)[i] = sum_n a[i+n] v[n]; with v[n] = n - half
        # this is delta[i] = sum_m m * x[i+m].
        out = np.apply_along_axis(
            lambda m: np.correlate(m, kernel, mode="valid"), axis, padded
        )
    return out


def rms_energy_np(S_power: np.ndarray) -> np.ndarray:
    """Per-frame RMS from the power spectrogram (old librosa rmse)."""
    return np.sqrt(np.mean(S_power, axis=0))


def logmel_np(
    y: np.ndarray,
    sr: int,
    n_fft: int = N_FFT,
    hop: int = HOP,
    nfreqs: int = 40,
    n_mels: int = 128,
) -> np.ndarray:
    """(L, 3*(nfreqs+1)) = logmel+energy with delta and delta-delta.

    Parity target: preprocess_timit.py:196-209 (nfreqs=40 -> 123 dims).
    """
    S = np.abs(stft_np(y, n_fft, hop)) ** 2
    mel = mel_filterbank(sr, n_fft, n_mels) @ S
    lm = power_to_db(mel)[:nfreqs]
    energy = rms_energy_np(S)[None, :]
    spectr = np.vstack([lm, energy])
    d1 = delta_np(spectr, order=1)
    d2 = delta_np(spectr, order=2)
    return np.vstack([spectr, d1, d2]).T


def logmel_stacked_np(
    y: np.ndarray, sr: int, n_fft: int = N_FFT, hop: int = HOP, nfreqs: int = 40, n_mels: int = 128
) -> np.ndarray:
    """(3, L, nfreqs) channel-stacked logmel/delta/delta-delta
    (preprocess_timit.py:211-225) — input for the VGG encoder."""
    S = np.abs(stft_np(y, n_fft, hop)) ** 2
    mel = mel_filterbank(sr, n_fft, n_mels) @ S
    lm = power_to_db(mel)[:nfreqs]
    d1 = delta_np(lm, order=1)
    d2 = delta_np(lm, order=2)
    return np.stack([lm.T, d1.T, d2.T], axis=0)


def cqt_exact_np(
    y: np.ndarray,
    sr: int,
    n_bins: int = 84,
    hop: int = HOP,
    fmin: Optional[float] = None,
    bins_per_octave: int = 12,
) -> np.ndarray:
    """Exact constant-Q magnitude transform -> (n_bins, n_frames).

    The mathematically exact transform librosa's multirate CQT
    (preprocess_timit.py:228-253 calls librosa.cqt) computes
    efficiently: per bin k, the magnitude of the correlation of the
    (center-padded) signal with a hann-windowed complex exponential at
    f_k whose length N_k = ceil(Q * sr / f_k), Q = 1/(2^(1/bpo) - 1) —
    i.e. constant Q = f_k / bandwidth per bin. Kernels are L1-normalized
    (unit window sum) so a unit-amplitude tone at f_k reads ~0.5 in
    every bin regardless of frequency. Multirate decimation is an
    EFFICIENCY device, not a semantics change, so the direct form is
    the correctness reference; tests/test_data.py measures the
    pseudo-CQT's deviation from this (large below ~bin 24 where the
    2048-pt STFT can't resolve constant-Q bandwidths, small above).
    """
    fmin = fmin or 32.703195662574829  # C1, librosa default
    q = 1.0 / (2.0 ** (1.0 / bins_per_octave) - 1.0)
    freqs = fmin * 2.0 ** (np.arange(n_bins) / bins_per_octave)
    n_frames = 1 + len(y) // hop
    centers = hop * np.arange(n_frames)
    n_max = int(np.ceil(q * sr / freqs[0]))
    ypad = np.pad(y.astype(np.float64), n_max // 2 + 1)
    out = np.empty((n_bins, n_frames))
    for k, f in enumerate(freqs):
        n_k = int(np.ceil(q * sr / f))
        win = np.hanning(n_k)
        t = (np.arange(n_k) - n_k / 2.0) / sr
        kernel = win * np.exp(2j * np.pi * f * t)
        kernel /= win.sum()
        # frames centered at each hop position in the padded signal
        start = centers + (n_max // 2 + 1) - n_k // 2
        idx = start[:, None] + np.arange(n_k)[None, :]
        out[k] = np.abs(ypad[idx] @ kernel)
    return out


def _cqt_parts(y: np.ndarray, sr: int, n_bins: int, hop: int, nfreqs,
               method: str = "pseudo"):
    """Shared CQT pipeline: spectrogram, CQT magnitudes, deltas.

    method="pseudo": log-spaced triangles on the 2048-pt STFT (fast,
    resolution-limited at low bins); "exact": direct constant-Q kernels
    (cqt_exact_np). Both feed the same delta/energy assembly."""
    S = np.abs(stft_np(y, N_FFT, hop)) ** 2
    if method == "pseudo":
        fb, _ = pseudo_cqt_filterbank(sr, N_FFT, n_bins)
        cqt = np.sqrt(fb @ S)
    elif method == "exact":
        cqt = cqt_exact_np(y, sr, n_bins, hop)
        cqt = cqt[:, : S.shape[1]]
    else:
        raise ValueError(f"method must be 'pseudo' or 'exact', got {method!r}")
    if nfreqs is not None:
        cqt = cqt[:nfreqs]
    return S, cqt, delta_np(cqt, order=1), delta_np(cqt, order=2)


def cqt_np(
    y: np.ndarray, sr: int, n_bins: int = 84, hop: int = HOP,
    nfreqs: Optional[int] = None, method: str = "pseudo",
) -> np.ndarray:
    """CQT variant of preprocess_timit.py:228-240: (L, 3*nb+1)."""
    S, cqt, d1, d2 = _cqt_parts(y, sr, n_bins, hop, nfreqs, method)
    energy = rms_energy_np(S)[None, :]
    return np.vstack([cqt, d1, d2, energy]).T


def cqt_stacked_np(
    y: np.ndarray, sr: int, n_bins: int = 84, hop: int = HOP,
    nfreqs: Optional[int] = None, method: str = "pseudo",
) -> np.ndarray:
    """(3, L, nb) channel-stacked CQT/delta/delta-delta — the
    CQT_stacked dataset variant (preprocess_timit.py:241-253)."""
    _, cqt, d1, d2 = _cqt_parts(y, sr, n_bins, hop, nfreqs, method)
    return np.stack([cqt.T, d1.T, d2.T], axis=0)


def normalize_corpus(train_feats, *other_splits, pad: int = 10):
    """Train-set mean/std normalization + zero padding both ends.

    train_feats / splits are lists of (L_i, D) arrays (or (3, L_i, D)
    stacked). Mutates nothing; returns (normalized splits..., mean, std).
    Parity: preprocess_timit.py:261-314.
    """
    stacked = train_feats[0].ndim == 3
    axis = 1 if stacked else 0
    cat = np.concatenate(train_feats, axis=axis)
    mean = cat.mean(axis=axis, keepdims=True)
    std = cat.std(axis=axis, keepdims=True)

    def norm(split):
        out = []
        for f in split:
            g = (f - mean) / std
            if stacked:
                z = np.zeros((f.shape[0], pad, f.shape[2]))
                g = np.concatenate([z, g, z], axis=1)
            else:
                z = np.zeros((pad, f.shape[1]))
                g = np.vstack([z, g, z])
            out.append(g)
        return out

    results = [norm(train_feats)] + [norm(s) for s in other_splits]
    return (*results, mean, std)


# ---------------------------------------------------------------------------
# JAX on-device batched path
# ---------------------------------------------------------------------------


def delta_batched_jax(x, width: int = 9, n_frames=None):
    """Batched on-device delta: (B, L, D) -> (B, L, D).

    Twin of delta_np (width-9 centered ramp, edge pad, unnormalized) —
    the single source of truth for both the XLA (logmel_jax) and fused
    Pallas (ops/pallas/logmel.py) front ends.

    n_frames: optional (B,) true frame counts. When given, the edge
    padding clamps at each utterance's OWN last frame (index arithmetic,
    static shapes) so a short member of a padded batch gets exactly the
    per-utterance offline deltas instead of a window bleeding into the
    batch padding.
    """
    import jax
    import jax.numpy as jnp

    half = width // 2
    kernel = jnp.asarray(np.arange(-half, half + 1, dtype=np.float32))
    if n_frames is None:
        xp = jnp.pad(x, ((0, 0), (half, half), (0, 0)), mode="edge")
        idxs = np.arange(x.shape[1])[:, None] + np.arange(2 * half + 1)[None, :]
        return jnp.einsum("blkd,k->bld", xp[:, idxs], kernel,
                          precision=jax.lax.Precision.HIGHEST)
    nf = jnp.asarray(n_frames, jnp.int32)[:, None, None]  # (B,1,1)
    li = (
        np.arange(x.shape[1])[None, :, None]
        + np.arange(-half, half + 1)[None, None, :]
    )  # (1, L, W)
    li = jnp.clip(li, 0, jnp.maximum(nf, 1) - 1)
    win = jax.vmap(lambda xb, ib: xb[ib])(x, li)  # (B, L, W, D)
    return jnp.einsum("blkd,k->bld", win, kernel,
                      precision=jax.lax.Precision.HIGHEST)


def logmel_jax(
    y,
    sr: int = 16000,
    n_fft: int = N_FFT,
    hop: int = HOP,
    nfreqs: int = 40,
    n_mels: int = 128,
    mean=None,
    std=None,
    n_samples=None,
):
    """Batched on-device log-mel front end. y: (B, N) padded PCM ->
    (B, L, 3*(nfreqs+1)) float32 features.

    jit-able; frames via gather + one rfft + one MXU matmul against the
    mel filterbank. Per-utterance top_db clipping uses each sample's own
    max like the offline path. Optionally applies corpus (mean, std).

    n_samples: optional (B,) true PCM lengths. When given, the centered
    STFT's reflect padding happens about each utterance's OWN signal end
    via reflect-mapped gather indices (and the deltas edge-clamp at its
    true frame count, the top_db peak masks padding frames), so every
    member of a padded batch gets features bit-matching the offline
    per-utterance pipeline (logmel_np) on its true frames — static
    shapes, pure index arithmetic. Frames past a member's true count
    hold reflect-continuation content and must be masked downstream.
    """
    import jax
    import jax.numpy as jnp

    pad = n_fft // 2
    n_frames = 1 + y.shape[1] // hop
    window = jnp.asarray(np.hanning(n_fft + 1)[:-1], jnp.float32)
    if n_samples is None:
        yp = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")
        idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
        frames = yp[:, idx] * window  # (B, L, n_fft)
        nf_true = None
    else:
        n = jnp.asarray(n_samples, jnp.int32)[:, None, None]  # (B,1,1)
        nf_true = 1 + jnp.asarray(n_samples, jnp.int32) // hop  # (B,)
        pos = (
            (hop * np.arange(n_frames))[None, :, None]
            - pad
            + np.arange(n_fft)[None, None, :]
        )  # (1, L, n_fft) signal positions incl. out-of-range
        # np.pad(mode="reflect") index map for arbitrary positions:
        # fold into the period 2n-2 triangle wave
        period = jnp.maximum(2 * n - 2, 1)
        q = jnp.mod(pos, period)
        r = jnp.minimum(q, period - q)
        frames = jax.vmap(lambda yb, rb: yb[rb])(y, r) * window
    spec = jnp.fft.rfft(frames.astype(jnp.float32), axis=-1)
    S = jnp.abs(spec) ** 2  # (B, L, F)

    fb = jnp.asarray(mel_filterbank(sr, n_fft, n_mels).T, jnp.float32)
    # full f32 MXU passes: at TPU-default bf16 precision the mel matmul
    # alone costs ~2 dB of feature error (measured vs the float64 path)
    mel = jnp.matmul(S, fb, precision=jax.lax.Precision.HIGHEST)
    lm = 10.0 * jnp.log10(jnp.maximum(AMIN, mel))
    if nf_true is None:
        peak = jnp.max(lm, axis=(1, 2), keepdims=True)
    else:
        fmask = np.arange(n_frames)[None, :, None] < nf_true[:, None, None]
        peak = jnp.max(
            jnp.where(fmask, lm, -jnp.inf), axis=(1, 2), keepdims=True
        )
    lm = jnp.maximum(lm, peak - TOP_DB)[..., :nfreqs]
    energy = jnp.sqrt(jnp.mean(S, axis=-1, keepdims=True))
    spectr = jnp.concatenate([lm, energy], axis=-1)  # (B, L, nf+1)

    d1 = delta_batched_jax(spectr, n_frames=nf_true)
    d2 = delta_batched_jax(d1, n_frames=nf_true)
    feats = jnp.concatenate([spectr, d1, d2], axis=-1)
    if mean is not None:
        feats = (feats - jnp.asarray(mean, jnp.float32)) / jnp.asarray(std, jnp.float32)
    return feats


def logmel_device(y, sr: int = 16000, nfreqs: int = 40, mean=None, std=None,
                  backend: str = "pallas", interpret: bool = False,
                  n_samples=None):
    """Batched on-device log-mel front end with backend selection.

    backend='pallas': one fused framing+windowed-DFT+mel+log kernel
    (ops/pallas/logmel.py — faster and, at TPU default matmul
    precision, substantially more accurate than the rfft path);
    backend='xla': jnp.fft.rfft + mel matmul (logmel_jax).

    n_samples: optional (B,) true PCM lengths for exact per-utterance
    parity with the offline pipeline (see logmel_jax) — the fused kernel
    frames the whole padded buffer, so exact mode routes to the XLA path.
    """
    if n_samples is not None:
        return logmel_jax(y, sr, nfreqs=nfreqs, mean=mean, std=std,
                          n_samples=n_samples)
    if backend == "pallas":
        from ..ops.pallas import logmel as _lm

        return _lm.logmel_pallas(y, sr, nfreqs=nfreqs, mean=mean, std=std,
                                 interpret=interpret)
    if backend == "xla":
        return logmel_jax(y, sr, nfreqs=nfreqs, mean=mean, std=std)
    raise ValueError(f"unknown backend {backend!r}")


def frames_for_samples(n_samples: int, n_fft: int = N_FFT, hop: int = HOP) -> int:
    """Number of centered-STFT frames for an n_samples signal."""
    return 1 + n_samples // hop


def pca_fit(train_feats, n_components: int):
    """Fit PCA on stacked train frames (reference preprocess_timit.py:
    316-333 uses sklearn PCA; this is the plain SVD equivalent).

    Returns (components (D, n), mean (D,)).
    """
    frames = np.concatenate([np.asarray(f) for f in train_feats], axis=0)
    mu = frames.mean(axis=0)
    centered = frames - mu
    # economy SVD of (N, D): right singular vectors are the components
    _, _, vt = np.linalg.svd(centered, full_matrices=False)
    return vt[:n_components].T.astype(np.float32), mu.astype(np.float32)


def pca_apply(feats, components: np.ndarray, mean: np.ndarray):
    """Project each (L, D) utterance onto the fitted components."""
    return [((np.asarray(f) - mean) @ components).astype(np.float32) for f in feats]
