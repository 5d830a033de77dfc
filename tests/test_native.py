"""Native C++ helpers vs their NumPy fallbacks."""

import shutil

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None, reason="no C++ toolchain"
)


def test_native_edit_distance_matches_numpy():
    from seq2seq_attention_asr_tpu.decode.metrics import edit_distance_np
    from seq2seq_attention_asr_tpu.native import editdist

    rng = np.random.RandomState(7)
    for _ in range(100):
        a = rng.randint(0, 6, size=rng.randint(0, 20))
        b = rng.randint(0, 6, size=rng.randint(0, 20))
        assert editdist.edit_distance(a, b) == edit_distance_np(a, b)


def test_native_batch_edit_distance():
    from seq2seq_attention_asr_tpu.decode.metrics import edit_distance_np
    from seq2seq_attention_asr_tpu.native import editdist

    rng = np.random.RandomState(8)
    B, M = 16, 12
    a = rng.randint(0, 5, size=(B, M)).astype(np.int32)
    b = rng.randint(0, 5, size=(B, M)).astype(np.int32)
    al = rng.randint(0, M + 1, size=B)
    bl = rng.randint(0, M + 1, size=B)
    got = editdist.batch_edit_distance(a, al, b, bl)
    want = [edit_distance_np(a[i, : al[i]], b[i, : bl[i]]) for i in range(B)]
    np.testing.assert_array_equal(got, want)


def test_batcher_uses_native_packer(tmp_path):
    """BucketedBatcher._pad must route through the C++ packer and match
    the NumPy fallback bit-for-bit."""
    import dataclasses

    from seq2seq_attention_asr_tpu.data import batching

    rng = np.random.RandomState(11)
    n = 10

    @dataclasses.dataclass
    class DS:
        uids: list
        x: list
        y: list
        y39: list

        def __len__(self):
            return len(self.x)

    ds = DS(
        uids=[f"u{i}" for i in range(n)],
        x=[rng.randn(rng.randint(4, 20), 5).astype(np.float32) for _ in range(n)],
        y=[rng.randint(1, 9, size=rng.randint(2, 8)).astype(np.int32) for _ in range(n)],
        y39=[rng.randint(1, 5, size=3).astype(np.int32) for _ in range(n)],
    )
    # y39 lengths must match y lengths for a real dataset; fix them up
    ds.y39 = [np.resize(a, len(y)) for a, y in zip(ds.y39, ds.y)]
    b = batching.BucketedBatcher(l_buckets=[8, 16, 32], batch_size=4)
    idxs = [3, 7, 1]
    native = b._pad_native(ds, idxs, 16, 8)
    fallback = b._pad_np(ds, idxs, 16, 8)
    assert getattr(ds, "_ragged_views", None) is not None  # cache built
    np.testing.assert_array_equal(native.x, fallback.x)
    np.testing.assert_array_equal(native.x_len, fallback.x_len)
    np.testing.assert_array_equal(native.y, fallback.y)
    np.testing.assert_array_equal(native.y_len, fallback.y_len)
    np.testing.assert_array_equal(native.y39, fallback.y39)
    assert native.uids == fallback.uids
    # the public _pad must take the native path when the lib builds
    got = b._pad(ds, idxs, 16)
    np.testing.assert_array_equal(got.x, fallback.x)


def test_native_packing_matches_python():
    from seq2seq_attention_asr_tpu.native import packing

    rng = np.random.RandomState(9)
    utts = [rng.randn(rng.randint(3, 15), 4).astype(np.float32) for _ in range(10)]
    labs = [rng.randint(0, 9, size=rng.randint(1, 7)).astype(np.int32) for _ in range(10)]
    rf = packing.RaggedFeatures(utts)
    rl = packing.RaggedLabels(labs)
    sel = [7, 2, 9]
    x, xl = packing.pack_batch(rf, sel, l_pad=12)
    y, yl = packing.pack_labels(rl, sel, t_pad=8)
    for j, u in enumerate(sel):
        n = min(len(utts[u]), 12)
        assert xl[j] == n
        np.testing.assert_array_equal(x[j, :n], utts[u][:n])
        assert np.all(x[j, n:] == 0)
        m = min(len(labs[u]), 8)
        assert yl[j] == m
        np.testing.assert_array_equal(y[j, :m], labs[u][:m])
        assert np.all(y[j, m:] == 0)
