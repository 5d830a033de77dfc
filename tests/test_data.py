"""Feature front end, batching, vocab, and HDF5 round-trip tests."""

import os
import struct
import tempfile

import numpy as np
import pytest

from seq2seq_attention_asr_tpu.data import audio, batching, features, timit
from seq2seq_attention_asr_tpu.data import librispeech as ls


def test_mel_filterbank_properties():
    fb = features.mel_filterbank(16000, 2048, 128)
    assert fb.shape == (128, 1025)
    assert np.all(fb >= 0)
    # every filter has support; centers increase
    assert np.all(fb.sum(axis=1) > 0)
    centers = np.argmax(fb, axis=1)
    assert np.all(np.diff(centers) >= 0)


def test_stft_sine_peak():
    sr, f0 = 16000, 1000.0
    t = np.arange(sr) / sr
    y = np.sin(2 * np.pi * f0 * t)
    S = np.abs(features.stft_np(y)) ** 2
    peak_bin = np.argmax(S[:, S.shape[1] // 2])
    assert abs(peak_bin * sr / 2048 - f0) < 20.0


def test_logmel_shape_and_finite():
    y = np.random.RandomState(0).randn(16000) * 0.1
    f = features.logmel_np(y, 16000)
    assert f.shape[1] == 123  # 40 mel + energy, x3 (SURVEY §3.5)
    assert np.all(np.isfinite(f))
    fs = features.logmel_stacked_np(y, 16000)
    assert fs.shape[0] == 3 and fs.shape[2] == 40


def test_delta_linear_ramp():
    # delta of a linear ramp is constant in the interior:
    # sum_k k*(x[i+k]-x[i-k]) with slope s gives s * 2*sum k^2 = 60*s
    x = (np.arange(30, dtype=np.float64) * 2.0)[None, :]
    d = features.delta_np(x, width=9, order=1)
    np.testing.assert_allclose(d[0, 8:-8], 2.0 * 60.0, rtol=1e-12)


def test_logmel_jax_matches_np():
    y = np.random.RandomState(1).randn(8192) * 0.3
    f_np = features.logmel_np(y, 16000)
    f_j = np.asarray(features.logmel_jax(y[None, :], 16000))[0]
    assert f_j.shape == f_np.shape
    # same numerics modulo float32 (log-domain, tolerate 1e-3)
    np.testing.assert_allclose(f_j, f_np, rtol=1e-3, atol=2e-2)


def test_normalize_corpus_stats_and_pad():
    rng = np.random.RandomState(2)
    tr = [rng.randn(20, 5) * 3 + 1, rng.randn(14, 5) * 3 + 1]
    te = [rng.randn(9, 5)]
    (ntr, nte, mean, std) = features.normalize_corpus(tr, te, pad=4)
    cat = np.concatenate([n[4:-4] for n in ntr], axis=0)
    np.testing.assert_allclose(cat.mean(axis=0), 0.0, atol=1e-10)
    np.testing.assert_allclose(cat.std(axis=0), 1.0, atol=1e-10)
    assert ntr[0].shape == (28, 5)
    np.testing.assert_array_equal(ntr[0][:4], 0.0)
    assert nte[0].shape == (17, 5)


def _toy_dataset(n=10, seed=0, d=6, vmax=7):
    rng = np.random.RandomState(seed)
    ds = timit.Dataset(uids=[], x=[], y=[], y39=[], start=[], finish=[])
    for i in range(n):
        li = rng.randint(5, 40)
        ti = rng.randint(2, 10)
        ds.uids.append(f"u{i}")
        ds.x.append(rng.randn(li, d).astype(np.float32))
        ds.y.append(rng.randint(0, vmax, ti).astype(np.int32))
        ds.y39.append(rng.randint(0, 5, ti).astype(np.int32))
        ds.start.append(np.zeros(ti, np.int64))
        ds.finish.append(np.zeros(ti, np.int64))
    return ds


def test_bucketed_batcher_reconstruction():
    ds = _toy_dataset(17)
    b = batching.BucketedBatcher.from_dataset(ds, batch_size=4, n_buckets=3)
    seen = {}
    for batch in b.batches(ds, shuffle=True, seed=1):
        assert batch.x.shape[0] == len(batch.uids)
        assert batch.x.shape[1] in b.l_buckets
        for j, uid in enumerate(batch.uids):
            i = int(uid[1:])
            li = int(batch.x_len[j])
            np.testing.assert_array_equal(batch.x[j, :li], ds.x[i][:li])
            np.testing.assert_array_equal(
                batch.y[j, : int(batch.y_len[j])], ds.y[i]
            )
            # padding is zero
            assert np.all(batch.x[j, li:] == 0)
            np.testing.assert_array_equal(
                batch.dec_mask[j],
                (np.arange(batch.y.shape[1]) < len(ds.y[i])).astype(np.float32),
            )
            seen[uid] = seen.get(uid, 0) + 1
    assert sorted(seen) == sorted(ds.uids)
    assert all(v == 1 for v in seen.values())


def test_vocab_standard():
    v = timit.Vocab.standard()
    assert v.size == 62  # 61 phones + <EOS> — reference outputDepth
    assert v.fold39["zh"] == "sh" and v.fold39["ix"] == "ih"
    ids = v.to_ids(["aa", "zh", timit.EOS])
    m39 = v.map_ids_61_to_39(ids)
    assert v.index39["sh"] == m39[1]
    assert m39[2] == v.index39[timit.EOS]
    # eos is the last index in both spaces
    assert ids[2] == v.size - 1


def test_hdf5_roundtrip(tmp_path):
    pytest.importorskip("h5py")
    ds = _toy_dataset(5)
    p = str(tmp_path / "d.h5")
    timit.save_hdf5(ds, p)
    ds2 = timit.load_hdf5(p)
    assert ds2.uids == sorted(ds.uids)
    i = ds.uids.index(ds2.uids[0])
    np.testing.assert_array_equal(ds2.x[0], ds.x[i])
    np.testing.assert_array_equal(ds2.y[0], ds.y[i])


def test_librispeech_vocab_and_chunks(tmp_path):
    pytest.importorskip("h5py")
    v = ls.build_vocab(["hello world", "abc"])
    assert v.charmap[ls.EOS] == v.num_chars - 1
    ids = v.chars_to_ids("abc")
    assert ids[-1] == v.charmap[ls.EOS]
    assert v.ids_to_chars(ids) == "abc"
    ds = _toy_dataset(7)
    ds.y39 = None
    paths = ls.save_chunked(ds, str(tmp_path), n_chunks=3)
    assert len(paths) == 3
    total = 0
    for chunk in ls.iter_chunks(str(tmp_path), shuffle=True, seed=3):
        total += len(chunk)
    assert total == 7
    ls.save_meta(str(tmp_path), {"inputFrameSize": 6, "numchars": 5})
    assert ls.load_meta(str(tmp_path))["inputFrameSize"] == 6


def test_wav_readers(tmp_path):
    # RIFF wav
    sr = 16000
    pcm = (np.sin(np.arange(800) / 10.0) * 20000).astype(np.int16)
    p = str(tmp_path / "a.wav")
    import scipy.io.wavfile as wavfile

    wavfile.write(p, sr, pcm)
    y, got_sr = audio.read_audio(p)
    assert got_sr == sr
    np.testing.assert_allclose(y, pcm / 32768.0, atol=1e-9)

    # NIST SPHERE
    hdr = (
        b"NIST_1A\n    1024\n"
        + f"sample_rate -i {sr}\nsample_count -i {len(pcm)}\n"
        f"sample_n_bytes -i 2\nsample_byte_format -s2 01\n"
        f"sample_coding -s3 pcm\nend_head\n".encode()
    )
    sph = hdr + b" " * (1024 - len(hdr)) + pcm.tobytes()
    p2 = str(tmp_path / "b.wav")
    with open(p2, "wb") as f:
        f.write(sph)
    y2, sr2 = audio.read_audio(p2)
    assert sr2 == sr
    np.testing.assert_allclose(y2, pcm / 32768.0, atol=1e-9)


def test_pca_fit_apply():
    """PCA projection (preprocess_timit.py:316-333 parity): orthonormal
    components, variance ordering, exact reconstruction at full rank."""
    import numpy as np

    from seq2seq_attention_asr_tpu.data import features

    rng = np.random.RandomState(0)
    base = rng.randn(200, 4) @ np.diag([5.0, 2.0, 0.5, 0.1])
    feats = [base[:100], base[100:]]
    comps, mu = features.pca_fit(feats, 2)
    assert comps.shape == (4, 2)
    np.testing.assert_allclose(comps.T @ comps, np.eye(2), atol=1e-5)
    out = features.pca_apply(feats, comps, mu)
    assert out[0].shape == (100, 2)
    v = np.concatenate(out).var(axis=0)
    assert v[0] > v[1]
    # full rank round-trips
    comps4, mu4 = features.pca_fit(feats, 4)
    proj = features.pca_apply(feats, comps4, mu4)
    rec = proj[0] @ comps4.T + mu4
    np.testing.assert_allclose(rec, feats[0], atol=1e-4)


def test_prefetcher_preserves_batches_and_order():
    """Prefetcher (async feeder thread + device_put) yields the same
    batches in the same order, with feeder errors re-raised."""
    import jax.numpy as jnp
    import pytest

    from seq2seq_attention_asr_tpu.data import batching

    rng = np.random.RandomState(0)
    raw = [
        batching.Batch(
            x=rng.randn(2, 8, 3).astype(np.float32),
            x_len=np.array([8, 5], np.int32),
            y=rng.randint(0, 5, (2, 4)).astype(np.int32),
            y_len=np.array([4, 2], np.int32),
            y39=None,
            uids=[f"u{i}a", f"u{i}b"],
        )
        for i in range(5)
    ]
    got = list(batching.Prefetcher(iter(raw), depth=2))
    assert len(got) == 5
    for b, g in zip(raw, got):
        np.testing.assert_array_equal(np.asarray(g.x), b.x)
        np.testing.assert_array_equal(np.asarray(g.y), b.y)
        np.testing.assert_array_equal(np.asarray(g.dec_mask), b.dec_mask)
        assert g.uids == b.uids

    def boom():
        yield raw[0]
        raise RuntimeError("feeder exploded")

    it = iter(batching.Prefetcher(boom(), depth=1))
    next(it)
    with pytest.raises(RuntimeError, match="feeder exploded"):
        next(it)


def test_cached_device_batcher_semantics():
    """CachedDeviceBatcher: one transfer per batch ever, per-dataset
    caches, order-only reshuffle covering every batch each epoch."""
    from seq2seq_attention_asr_tpu.data import batching, synthetic

    ds, _, _ = synthetic.make_corpus(
        20, n_phones=4, feat_dim=5, min_len=2, max_len=4, seed=0
    )
    ds2, _, _ = synthetic.make_corpus(
        6, n_phones=4, feat_dim=5, min_len=2, max_len=4, seed=3
    )
    base = batching.BucketedBatcher(l_buckets=[32], batch_size=8)
    cb = batching.CachedDeviceBatcher(base, seed=1)

    e1 = list(cb.batches(ds, shuffle=True, seed=10))
    e2 = list(cb.batches(ds, shuffle=True, seed=11))
    assert len(e1) == len(e2) == 3  # 20 utts / 8 -> 2 full + ragged
    # same DeviceBatch objects, possibly different order, full coverage
    assert {id(b) for b in e1} == {id(b) for b in e2}
    assert sorted(u for b in e1 for u in b.uids) == sorted(ds.uids)
    # inputs live on device already (no per-epoch np arrays)
    import jax

    assert isinstance(e1[0].x, jax.Array)
    # a different dataset gets its own cache
    o = list(cb.batches(ds2))
    assert sorted(u for b in o for u in b.uids) == sorted(ds2.uids)


def test_device_synth_staging_matches_host():
    """DeviceSynth: staged batches match host staging exactly in
    membership/targets/lengths/masks; with noise=0 the on-device
    feature synthesis reproduces the host features bit-for-bit
    (prototype lookup + zero padding); with noise>0 only the noise
    draw differs (per-frame deviation bounded by the noise scale)."""
    import jax

    from seq2seq_attention_asr_tpu.data import batching, synthetic

    for noise in (0.0, 0.3):
        ds, protos, _ = synthetic.make_corpus(
            24, n_phones=5, feat_dim=7, min_len=2, max_len=6,
            noise=noise, seed=2,
        )
        base = batching.BucketedBatcher(l_buckets=[16, 32], batch_size=8)
        plain = batching.CachedDeviceBatcher(base, seed=1)
        synth = batching.CachedDeviceBatcher(
            base, seed=1,
            synth=batching.DeviceSynth(protos, noise=noise, seed=0),
        )
        hb = list(plain.batches(ds))
        sb = list(synth.batches(ds))
        assert len(hb) == len(sb)
        for h, s in zip(hb, sb):
            assert h.uids == s.uids
            np.testing.assert_array_equal(np.asarray(h.y), np.asarray(s.y))
            np.testing.assert_array_equal(
                np.asarray(h.x_len), np.asarray(s.x_len)
            )
            np.testing.assert_array_equal(
                np.asarray(h.dec_mask), np.asarray(s.dec_mask)
            )
            assert isinstance(s.x, jax.Array)
            hx, sx = np.asarray(h.x), np.asarray(s.x)
            assert hx.shape == sx.shape
            if noise == 0.0:
                np.testing.assert_allclose(hx, sx, atol=1e-6)
            else:
                # same prototype signal under independent noise draws
                assert np.max(np.abs(hx - sx)) < 10 * noise
                # padded region stays exactly zero
                for r in range(sx.shape[0]):
                    assert np.all(sx[r, int(s.x_len[r]):] == 0.0)


def test_cqt_exact_tone_response():
    """cqt_exact_np is a true constant-Q transform: a pure tone at bin
    k's center frequency peaks at bin k with ~0.5 magnitude (unit-L1
    hann kernel), at every octave."""
    from seq2seq_attention_asr_tpu.data import features

    sr = 16000
    fmin = 32.703195662574829
    t = np.arange(int(2.0 * sr)) / sr
    for k in (12, 30, 48, 66):
        f = fmin * 2.0 ** (k / 12.0)
        y = np.sin(2 * np.pi * f * t)
        C = features.cqt_exact_np(y, sr, n_bins=84)
        mid = C[:, C.shape[1] // 2]
        assert int(np.argmax(mid)) == k, (k, int(np.argmax(mid)))
        assert 0.4 < mid[k] < 0.6, mid[k]


def test_pseudo_cqt_error_vs_exact_measured():
    """Quantified pseudo-CQT deviation (VERDICT r1 item #9), measured
    against the exact constant-Q transform on multi-tone audio:

      * after per-bin scale calibration (the two filterbanks use
        different normalizations) the relative Frobenius error is
        ~4-8% across the range — asserted < 12% so the bound stays
        documented and stable;
      * the REAL deviation is low-bin frequency resolution: at 55 Hz
        (bin 9) the constant-Q bandwidth (3.3 Hz) is below the 2048-pt
        STFT's 7.8 Hz bin width, so the pseudo variant smears a pure
        tone across neighbors (+/-2-bin leakage ~50%) where the exact
        transform localizes it (~4%)."""
    from seq2seq_attention_asr_tpu.data import features

    sr = 16000
    rng = np.random.RandomState(0)
    t = np.arange(int(3.0 * sr)) / sr
    y = sum(
        a * np.sin(2 * np.pi * f * t + p)
        for a, f, p in zip(
            [1.0, 0.7, 0.5, 0.4, 0.3],
            [110.0, 440.0, 1320.0, 2640.0, 5280.0],
            rng.uniform(0, 6.28, 5),
        )
    ) + 0.01 * rng.randn(len(t))
    exact = features.cqt_exact_np(y, sr, n_bins=84)
    S = np.abs(features.stft_np(y, features.N_FFT, features.HOP)) ** 2
    fb, _ = features.pseudo_cqt_filterbank(sr, features.N_FFT, 84)
    pseudo = np.sqrt(fb @ S)[:, : exact.shape[1]]

    for lo, hi, bound in ((0, 24, 0.12), (24, 84, 0.12)):
        e, p = exact[lo:hi], pseudo[lo:hi]
        scale = (e * p).sum(1) / np.maximum((p * p).sum(1), 1e-12)
        rel = np.linalg.norm(e - scale[:, None] * p) / np.linalg.norm(e)
        assert rel < bound, (lo, hi, rel)

    # low-bin resolution: 55 Hz pure tone (bin 9)
    fmin = 32.703195662574829
    y9 = np.sin(2 * np.pi * (fmin * 2 ** (9 / 12.0)) * t)
    ex9 = features.cqt_exact_np(y9, sr, n_bins=84)
    S9 = np.abs(features.stft_np(y9, features.N_FFT, features.HOP)) ** 2
    ps9 = np.sqrt(fb @ S9)[:, : ex9.shape[1]]
    mid_e = ex9[:, ex9.shape[1] // 2]
    mid_p = ps9[:, ps9.shape[1] // 2]
    assert int(np.argmax(mid_e)) == 9 and int(np.argmax(mid_p)) == 9
    leak = lambda m: max(m[7], m[11]) / m[9]
    assert leak(mid_e) < 0.1  # exact localizes
    assert leak(mid_p) > 0.3  # pseudo smears — the documented deviation


def test_synthetic_unique_phones():
    """unique_phones=True samples each utterance's phones without
    replacement (content-only attention over local-receptive-field
    encoders cannot disambiguate repeats — data/synthetic.py)."""
    from seq2seq_attention_asr_tpu.data import synthetic

    ds, protos, v = synthetic.make_corpus(
        20, n_phones=30, feat_dim=8, min_len=5, max_len=12,
        unique_phones=True, seed=3,
    )
    assert v == 31
    for y in ds.y:
        body = y[:-1]  # strip <EOS>
        assert len(set(body.tolist())) == len(body), body
    # disjoint valid split reuses the SAME prototypes
    ds2, _, _ = synthetic.make_corpus(
        5, prototypes=protos, min_len=5, max_len=12,
        unique_phones=True, seed=4,
    )
    assert all(len(set(y[:-1].tolist())) == len(y) - 1 for y in ds2.y)
