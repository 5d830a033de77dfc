"""FLAC decoding + LibriSpeech word-target ingestion.

Covers VERDICT r1 missing items #2/#3: native FLAC decode (the
reference reads FLAC via audiolab, librispeech/preprocess.py:116-140)
and labelset='words' training (librispeech/train.lua:28,
utils_librispeech.lua:49-66). The test encoder (flac_encoder.py) emits
spec-conformant streams over every subframe type; the C++ decoder must
match the pure-Python reference bit for bit."""

import os

import numpy as np
import pytest

from flac_encoder import encode_flac
from seq2seq_attention_asr_tpu.data import audio, flac


def _signal(n=4000, seed=0):
    rng = np.random.RandomState(seed)
    t = np.arange(n)
    return (2500 * np.sin(t / 40.0) + 150 * rng.randn(n)).astype(np.int32)


@pytest.mark.parametrize(
    "mode,kwargs",
    [
        ("constant", {}),
        ("verbatim", dict(blocksize=192)),
        ("fixed0", {}),
        ("fixed1", dict(npart_order=2)),
        ("fixed2", {}),
        ("fixed3", dict(blocksize=512)),
        ("fixed4", {}),
        ("lpc2", dict(npart_order=3, blocksize=512)),
    ],
)
def test_flac_python_decode_roundtrip(mode, kwargs):
    pcm = (
        np.full(1000, -777, np.int32) if mode == "constant" else _signal()
    )
    data = encode_flac(pcm, mode=mode, **kwargs)
    got, sr = flac.decode_flac_py(data)
    assert sr == 16000
    np.testing.assert_array_equal(got[:, 0], pcm)


@pytest.mark.parametrize("mode", ["left_side", "right_side", "mid_side", "fixed2"])
def test_flac_stereo_decorrelation(mode):
    left = _signal(3000, seed=1)
    right = (left * 0.6).astype(np.int32) + _signal(3000, seed=2) // 10
    pcm = np.stack([left, right], axis=1)
    data = encode_flac(pcm, mode=mode)
    got, _ = flac.decode_flac_py(data)
    np.testing.assert_array_equal(got, pcm)


def test_flac_native_matches_python():
    """C++ decoder (native/flacdec.cpp) is bit-exact vs the Python
    reference across subframe types, partitions, and stereo modes."""
    flacdec = pytest.importorskip("seq2seq_attention_asr_tpu.native.flacdec")
    mono = _signal(5000)
    stereo = np.stack([mono[:2000], (mono[:2000] // 2)], axis=1)
    streams = [
        encode_flac(mono, mode="fixed2"),
        encode_flac(mono, mode="lpc2", npart_order=2, blocksize=1024),
        encode_flac(mono, mode="verbatim", blocksize=192),
        encode_flac(stereo, mode="mid_side"),
        encode_flac(stereo, mode="left_side"),
    ]
    for data in streams:
        py, sr_py = flac.decode_flac_py(data)
        cc, sr_cc = flacdec.decode(data)
        assert sr_py == sr_cc
        np.testing.assert_array_equal(py, cc)


def test_read_audio_dispatches_flac(tmp_path):
    pcm = _signal(2000)
    p = str(tmp_path / "utt.flac")
    with open(p, "wb") as f:
        f.write(encode_flac(pcm, mode="fixed2"))
    mono, sr = audio.read_audio(p)
    assert sr == 16000
    np.testing.assert_allclose(mono, pcm / 32768.0, atol=1e-12)


def _mini_flac_corpus(root, n_utts=4):
    """LibriSpeech-shaped tree: spk/chap/*.flac + *.trans.txt."""
    texts = [
        "THE CAT SAT",
        "A DOG RAN FAST",
        "THE DOG SAT",
        "A CAT RAN",
    ][:n_utts]
    d = os.path.join(root, "1", "2")
    os.makedirs(d, exist_ok=True)
    lines = []
    for i, txt in enumerate(texts):
        uid = f"1-2-{i:04d}"
        pcm = _signal(3200 + 320 * i, seed=i)
        with open(os.path.join(d, uid + ".flac"), "wb") as f:
            f.write(encode_flac(pcm, mode="fixed2"))
        lines.append(f"{uid} {txt}")
    with open(os.path.join(d, "1-2.trans.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    return texts


def test_librispeech_words_end_to_end(tmp_path):
    """Mini FLAC corpus -> build_datasets(labelset='words') -> one
    jitted train step on word targets (VERDICT r1 item #3 'done'
    criterion)."""
    import jax
    import jax.numpy as jnp

    from seq2seq_attention_asr_tpu.data import batching, librispeech as ls
    from seq2seq_attention_asr_tpu.models import registry
    from seq2seq_attention_asr_tpu.train import optim as optim_lib
    from seq2seq_attention_asr_tpu.train import trainer as trainer_lib

    root = str(tmp_path / "LS")
    texts = _mini_flac_corpus(root)
    datasets, vocab, mean, std = ls.build_datasets(
        {"train": root, "valid": root}, labelset="words"
    )
    train = datasets["train"]
    # word ids round-trip and differ from the char encoding
    assert vocab.num_words == len({w for t in texts for w in t.split()}) + 1
    assert len(train.y[0]) == len(texts[0].split()) + 1  # words + <eos>
    assert vocab.ids_to_words(train.y[1][:-1]) == texts[1]

    model = registry.build(
        "chorowski", input_frame_size=int(train.x[0].shape[-1]),
        hidden_frame_size=8, output_frame_size=8, score_depth=8,
        state_depth=8, mlp_depth=8, output_depth=vocab.size("words"),
        feature_maps=0, filt_size=5,
    )
    tcfg = trainer_lib.TrainConfig(batch_size=4, normalize_nll=True, prefetch=0)
    ocfg = optim_lib.OptimConfig()
    tr = trainer_lib.Trainer(model, ocfg, tcfg)
    tr.init(model.init(jax.random.PRNGKey(0)))
    batcher = batching.BucketedBatcher.from_dataset(train, 4, n_buckets=1)
    row = tr.train_epoch(train, batcher, 1)
    assert np.isfinite(row["train_nll"])
