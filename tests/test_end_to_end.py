"""End-to-end smoke test — the reference's exp0_scriptchecker idea
(SURVEY.md §4): synthesize a miniature TIMIT-shaped corpus on disk,
run the offline preprocessing pipeline, train a tiny model for two
epochs, and beam-decode. Exercises every layer boundary: audio readers
-> features -> HDF5 -> batcher -> trainer -> decoder -> PER."""

import dataclasses
import os
import struct

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from seq2seq_attention_asr_tpu.data import batching, features, timit
from seq2seq_attention_asr_tpu.train import experiment as exp_lib
from seq2seq_attention_asr_tpu.train import trainer as trainer_lib


def _write_sphere(path, pcm, sr=16000):
    hdr = (
        b"NIST_1A\n    1024\n"
        + f"sample_rate -i {sr}\nsample_count -i {len(pcm)}\n"
        f"sample_n_bytes -i 2\nsample_byte_format -s2 01\n"
        f"sample_coding -s3 pcm\nend_head\n".encode()
    )
    with open(path, "wb") as f:
        f.write(hdr + b" " * (1024 - len(hdr)) + pcm.astype("<i2").tobytes())


def _make_corpus(root, speakers, n_utts=2, sr=16000):
    rng = np.random.RandomState(0)
    phones = ["h#", "aa", "b", "iy", "t"]
    for split, spks in speakers.items():
        for spk in spks:
            d = os.path.join(root, split, "DR1", spk)
            os.makedirs(d, exist_ok=True)
            for u in range(n_utts):
                n = sr // 2
                pcm = (rng.randn(n) * 2000).astype(np.int16)
                stem = f"SX{u}"
                _write_sphere(os.path.join(d, stem + ".WAV"), pcm, sr)
                # 4 phones spanning the file
                seg = n // 4
                with open(os.path.join(d, stem + ".PHN"), "w") as f:
                    for k in range(4):
                        p = phones[(u + k) % len(phones)]
                        f.write(f"{k*seg} {(k+1)*seg} {p}\n")
                with open(os.path.join(d, stem + ".WRD"), "w") as f:
                    f.write(f"0 {n} word\n")


def test_scriptchecker_end_to_end(tmp_path):
    root = str(tmp_path / "TIMIT")
    _make_corpus(
        root,
        {
            "TRAIN": ["MAAA0", "MBBB0", "MTLB0"],  # MTLB0 is a valid speaker
            "TEST": ["MCCC0"],
        },
    )
    train, valid, test, vocab, mean, std = timit.build_datasets(
        root, feature_fn=features.logmel_np, pad=2
    )
    assert len(train) == 4 and len(valid) == 2 and len(test) == 2
    assert train.x[0].shape[-1] == 123
    assert vocab.size == 62

    # HDF5 round trip like the real tool
    data_dir = str(tmp_path / "data")
    os.makedirs(data_dir)
    timit.save_hdf5(train, os.path.join(data_dir, "train.h5"))
    timit.save_hdf5(valid, os.path.join(data_dir, "valid.h5"))
    train2 = timit.load_hdf5(os.path.join(data_dir, "train.h5"))

    exp = exp_lib.scriptchecker(save_dir=str(tmp_path / "run"))
    exp.model_kwargs.update(
        input_frame_size=123, hidden_frame_size=12, output_frame_size=12,
        score_depth=12, state_depth=12, mlp_depth=8, output_depth=vocab.size,
    )
    import jax

    params = exp.init_params(jax.random.PRNGKey(0))
    tr = trainer_lib.Trainer(
        exp.build_model(), exp.optim, exp.train, vocab=vocab,
        save_dir=exp.save_dir,
    )
    tr.init(params)
    batcher = batching.BucketedBatcher.from_dataset(train2, 2, n_buckets=2)
    rows = list(tr.fit(train2, valid, batcher, decode_every=2))
    assert len(rows) == 2
    assert np.isfinite(rows[-1]["train_nll"])
    assert "valid_per" in rows[-1]
    # untrained models can emit up to maxseqlen tokens, so PER may far
    # exceed 1.0 (distance / target length) — sanity-bound only
    assert 0.0 <= rows[-1]["valid_per"] <= 10.0
    # log + checkpoints exist
    assert os.path.exists(os.path.join(exp.save_dir, "log.jsonl"))
    from seq2seq_attention_asr_tpu.train import checkpoint

    assert checkpoint.exists(os.path.join(exp.save_dir, "ckpt_latest"))


def test_trainer_resume(tmp_path):
    """Checkpoint/resume parity (reference timit.lua:85-96, 469-490):
    a new Trainer resumes epoch counter, best metrics, and train state,
    and continues where the first run stopped."""
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    ds = timit.Dataset(
        uids=[f"u{i}" for i in range(4)],
        x=[rng.randn(rng.randint(10, 16), 8).astype(np.float32) for _ in range(4)],
        y=[rng.randint(0, 6, rng.randint(3, 6)).astype(np.int32) for _ in range(4)],
        y39=None, start=[np.zeros(0)] * 4, finish=[np.zeros(0)] * 4,
    )
    exp = exp_lib.scriptchecker(save_dir=str(tmp_path / "run"))
    exp.model_kwargs.update(
        input_frame_size=8, hidden_frame_size=8, output_frame_size=8,
        score_depth=8, state_depth=8, mlp_depth=8, output_depth=7,
    )
    exp.train = __import__("dataclasses").replace(
        exp.train, num_epochs=2, max_samples=None
    )
    model = exp.build_model()
    params = exp.init_params(jax.random.PRNGKey(0))
    batcher = batching.BucketedBatcher.from_dataset(ds, 2, n_buckets=1)

    tr1 = trainer_lib.Trainer(model, exp.optim, exp.train, save_dir=exp.save_dir)
    tr1.init(params)
    rows1 = list(tr1.fit(ds, ds, batcher, decode_every=0))
    assert len(rows1) == 2

    # second trainer with a higher epoch budget resumes from epoch 2
    exp.train = __import__("dataclasses").replace(exp.train, num_epochs=3)
    tr2 = trainer_lib.Trainer(model, exp.optim, exp.train, save_dir=exp.save_dir)
    tr2.init(exp.init_params(jax.random.PRNGKey(99)))  # junk init, overwritten
    rows2 = list(tr2.fit(ds, ds, batcher, resume=True, decode_every=0))
    assert tr2.epoch == 3 and len(rows2) == 1  # only epoch 3 ran
    # resumed state matches tr1's final params, not the junk init
    a = jax.tree.leaves(tr1.state[0])[0]
    b = jax.tree.leaves(tr2.state[0])[0]
    assert a.shape == b.shape


def test_bfloat16_mixed_precision_matches_float32():
    """compute_dtype='bfloat16' (bf16 IO/matmuls, f32 master params,
    carries, and log-softmax) tracks the float32 forward closely and
    trains with the same NLL trajectory at step level."""
    import jax
    import jax.numpy as jnp

    from seq2seq_attention_asr_tpu.models import registry

    kw = dict(input_frame_size=8, hidden_frame_size=16,
              output_frame_size=16, score_depth=24, state_depth=16,
              mlp_depth=12, output_depth=7, feature_maps=0, filt_size=5,
              penalty_lambda=0.0)
    m32 = registry.build("chorowski", **kw)
    m16 = registry.build("chorowski", compute_dtype="bfloat16", **kw)
    params = m32.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    b, l, t, v = 2, 16, 5, 7
    x = jnp.asarray(rng.randn(b, l, 8), jnp.float32)
    x_len = jnp.asarray([16, 11])
    y = jnp.asarray(rng.randint(0, v, (b, t)))
    dm = jnp.ones((b, t), jnp.float32)
    oh = jax.nn.one_hot(y, v) * dm[..., None]
    o32 = m32.forward(params, x, x_len, oh, dm, train=False)
    o16 = m16.forward(params, x, x_len, oh, dm, train=False)
    assert o16["logprobs"].dtype == jnp.float32  # f32 log-softmax
    np.testing.assert_allclose(
        np.asarray(o16["logprobs"]), np.asarray(o32["logprobs"]), atol=0.05
    )
    # grads flow back to the float32 master params
    def nll(model, p):
        out = model.forward(p, x, x_len, oh, dm, train=False)
        return -jnp.sum(out["logprobs"] * oh)
    g = jax.grad(lambda p: nll(m16, p))(params)
    assert all(a.dtype == jnp.float32 for a in jax.tree.leaves(g))


def test_nan_restore_rolls_back_and_continues(tmp_path):
    """fit(on_nan='restore'): the NaN tripwire rolls back to the last
    checkpoint and keeps training (elastic recovery the reference
    lacks — a crash kills its run, SURVEY.md §5)."""
    import jax
    import jax.numpy as jnp

    from seq2seq_attention_asr_tpu.data import batching, timit
    from seq2seq_attention_asr_tpu.train import experiment as exp_lib
    from seq2seq_attention_asr_tpu.train import trainer as trainer_lib

    rng = np.random.RandomState(0)
    n = 6
    ds = timit.Dataset(
        x=[rng.randn(12 + i, 123).astype(np.float32) for i in range(n)],
        y=[rng.randint(0, 61, (3 + i % 2,)).astype(np.int32) for i in range(n)],
        y39=None,
        uids=[f"u{i}" for i in range(n)],
        start=[None] * n,
        finish=[None] * n,
    )
    exp = exp_lib.scriptchecker(save_dir=str(tmp_path / "run"))
    exp.model_kwargs.update(
        input_frame_size=123, hidden_frame_size=8, output_frame_size=8,
        score_depth=8, state_depth=8, mlp_depth=8, output_depth=62,
    )
    exp.train = dataclasses.replace(exp.train, num_epochs=3, beam_k=2)
    tr = trainer_lib.Trainer(
        exp.build_model(), exp.optim, exp.train, save_dir=exp.save_dir
    )
    tr.init(exp.init_params(jax.random.PRNGKey(0)))
    batcher = batching.BucketedBatcher.from_dataset(ds, 3, n_buckets=2)

    # poison exactly one step at the start of epoch 2
    real_step = tr.step_fn
    state = {"calls": 0}

    def poisoned(s, b):
        state["calls"] += 1
        new_s, m = real_step(s, b)
        if state["calls"] == 3:  # first batch of epoch 2 (2 batches/epoch)
            m = dict(m)
            m["loss"] = jnp.float32(float("nan"))
        return new_s, m

    tr.step_fn = poisoned
    rows = list(tr.fit(ds, ds, batcher, decode_every=0, on_nan="restore"))
    events = [r for r in tr.log.rows if r.get("event") == "nan_restore"]
    assert len(events) == 1
    assert len(rows) == 3  # all epochs completed despite the NaN
    assert all(np.isfinite(r["train_nll"]) for r in rows)


def test_chunked_out_of_core_training(tmp_path):
    """fit(chunked=...) iterates HDF5 chunk files one at a time in a
    shuffled per-epoch order (librispeech/train.lua:82-103 parity)."""
    import jax

    from seq2seq_attention_asr_tpu.data import batching, librispeech as ls, timit
    from seq2seq_attention_asr_tpu.train import experiment as exp_lib
    from seq2seq_attention_asr_tpu.train import trainer as trainer_lib

    rng = np.random.RandomState(0)

    def mk_ds(n, off):
        return timit.Dataset(
            x=[rng.randn(10 + i, 16).astype(np.float32) for i in range(n)],
            y=[rng.randint(0, 7, (3,)).astype(np.int32) for i in range(n)],
            y39=None, uids=[f"c{off}_{i}" for i in range(n)],
            start=[np.zeros(0)] * n, finish=[np.zeros(0)] * n,
        )

    data_dir = str(tmp_path / "chunks")
    os.makedirs(data_dir)
    paths = []
    for c in range(2):
        p = os.path.join(data_dir, f"train_chunk{c}.h5")
        timit.save_hdf5(mk_ds(4, c), p)
        paths.append(p)
    with open(os.path.join(data_dir, "train.db"), "w") as f:
        f.write("\n".join(paths) + "\n")
    loaded_paths = ls.load_manifest(data_dir)
    assert len(loaded_paths) == 2

    exp = exp_lib.scriptchecker(save_dir=str(tmp_path / "run"))
    exp.model_kwargs.update(
        input_frame_size=16, hidden_frame_size=8, output_frame_size=8,
        score_depth=8, state_depth=8, mlp_depth=8, output_depth=7,
    )
    exp.train = dataclasses.replace(exp.train, num_epochs=2, beam_k=2)
    tr = trainer_lib.Trainer(
        exp.build_model(), exp.optim, exp.train, save_dir=exp.save_dir
    )
    tr.init(exp.init_params(jax.random.PRNGKey(0)))
    valid = timit.load_hdf5(paths[0])
    batcher = batching.BucketedBatcher.from_dataset(valid, 4, n_buckets=2)
    load_chunk = lambda i: timit.load_hdf5(loaded_paths[i])
    bf = lambda ds: batching.BucketedBatcher.from_dataset(ds, 4, n_buckets=2)
    rows = list(tr.fit(None, valid, batcher, decode_every=0,
                       chunked=(load_chunk, 2, bf)))
    assert len(rows) == 2
    assert all(np.isfinite(r["train_nll"]) for r in rows)
    # both chunks' samples were seen each epoch (4 + 4)
    assert rows[0]["train_samples_per_s"] > 0


def test_eval_artifact_dumps(tmp_path):
    """Per-epoch eval artifacts match the reference's log.h5 field list
    (timit.lua:540-562): alpha maps, Ws/Vh PROJECTIONS (not raw weight
    matrices), output logprobs, and the valid set's beam predictions
    with best-metric copies."""
    import jax
    import jax.numpy as jnp

    from seq2seq_attention_asr_tpu.data import batching, timit
    from seq2seq_attention_asr_tpu.models import registry
    from seq2seq_attention_asr_tpu.train import optim as optim_lib
    from seq2seq_attention_asr_tpu.train import trainer as trainer_lib

    rng = np.random.RandomState(0)
    n = 4
    ds = timit.Dataset(
        x=[rng.randn(12 + i, 8).astype(np.float32) for i in range(n)],
        y=[rng.randint(0, 6, (3 + i % 2,)).astype(np.int32) for i in range(n)],
        y39=None, uids=[f"u{i}" for i in range(n)],
        start=[np.zeros(0)] * n, finish=[np.zeros(0)] * n,
    )
    model = registry.build(
        "chorowski", input_frame_size=8, hidden_frame_size=8,
        output_frame_size=8, score_depth=12, state_depth=8, mlp_depth=8,
        output_depth=7, feature_maps=0, filt_size=5,
    )
    tcfg = trainer_lib.TrainConfig(
        num_epochs=1, batch_size=4, beam_k=2, prefetch=0,
        dump_attention=True, dump_predictions=True,
    )
    tr = trainer_lib.Trainer(
        model, optim_lib.OptimConfig(), tcfg, save_dir=str(tmp_path)
    )
    tr.init(model.init(jax.random.PRNGKey(0)))
    batcher = batching.BucketedBatcher.from_dataset(ds, 4, n_buckets=1)
    rows = list(tr.fit(ds, ds, batcher, decode_every=1))
    assert len(rows) == 1

    attn = np.load(tmp_path / "attn_epoch1.npz")
    b, t_pad = attn["alpha"].shape[:2]
    assert attn["alpha"].shape[0] == n
    # projections, not weights: Ws (B, T, score), Vh (B, L, score)
    assert attn["ws"].shape == (b, t_pad, 12)
    assert attn["vh"].shape[0] == b and attn["vh"].shape[2] == 12
    assert attn["output"].shape == (b, t_pad, 7)
    # alpha rows are a softmax over encoder positions
    np.testing.assert_allclose(attn["alpha"].sum(-1), 1.0, atol=1e-5)

    preds = np.load(tmp_path / "predictions_epoch1.npz")
    assert list(preds["uids"]) == [f"u{i}" for i in range(n)]
    assert preds["tokens"].shape[0] == n
    assert preds["targets"].shape[0] == n
    assert np.all(preds["lengths"] >= 1)
    # epoch 1 is trivially the best epoch -> best-metric copies exist
    assert (tmp_path / "predictions_best_valid_accuracy.npz").exists()
    assert (tmp_path / "predictions_best_valid_PER.npz").exists()
