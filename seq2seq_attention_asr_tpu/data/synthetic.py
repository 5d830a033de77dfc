"""Synthetic learnable speech-shaped corpora for convergence testing.

The reference has no test suite and no published quality numbers
(SURVEY.md §4/§6); its north star is a beam-search PER on real TIMIT
(/root/reference/timit/timit.lua:397-415). Real corpora are not
redistributable, so the framework's convergence harness trains on a
synthetic task with the SAME structure the attention model must learn
on TIMIT: a sequence of discrete "phones", each emitting a variable
number of feature frames drawn from a per-phone prototype plus noise.
An encoder-attention-decoder that cannot learn monotonic alignment,
the per-phone feature identity, and EOS termination cannot drive PER
to zero here — so a falling PER trajectory on this corpus is a real
end-to-end learning signal for the whole recipe (features excepted).

`make_corpus` returns a data.timit.Dataset, so every downstream layer
(bucketed batcher, trainer, beam decoder, PER scorer) runs unmodified.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from .timit import Dataset


def prototype_table(
    n_phones: int, feat_dim: int, seed: int = 0
) -> np.ndarray:
    """The per-phone prototype vectors `make_corpus(seed=seed)` uses —
    well-separated scaled random rows, deterministic in (n_phones,
    feat_dim, seed). Exposed so batching.DeviceSynth can re-evaluate
    the emission formula on device without shipping features."""
    proto_rng = np.random.RandomState(10_000 + seed)
    prototypes = proto_rng.randn(n_phones, feat_dim).astype(np.float32)
    prototypes /= np.linalg.norm(prototypes, axis=1, keepdims=True)
    return prototypes * 2.0


def make_corpus(
    n_utts: int,
    n_phones: int = 7,
    feat_dim: int = 16,
    min_len: int = 3,
    max_len: int = 8,
    frames_per_phone: Tuple[int, int] = (3, 7),
    noise: float = 0.3,
    seed: int = 0,
    prototypes: Optional[np.ndarray] = None,
    unique_phones: bool = False,
) -> Tuple[Dataset, np.ndarray, int]:
    """Build a learnable corpus of `n_utts` utterances.

    Vocabulary: ids 0..n_phones-1 are emitting phones; id n_phones is
    <EOS> (appended to every target, matching preprocess_timit.py:99-102
    semantics). Each phone id owns a fixed random prototype vector;
    a phone token emits uniform(min,max) frames of prototype + N(0,
    noise^2). Returns (dataset, prototypes, vocab_size). Pass the
    returned `prototypes` back in to draw a disjoint split (e.g. a
    validation set) from the SAME underlying phone->feature mapping.

    unique_phones=True samples each utterance's phones WITHOUT
    replacement (requires n_phones >= max_len). Needed for models whose
    encoder receptive field is local (VGG's 8-frame convs): with
    repeated phones, two encoder positions emit near-identical
    annotations and CONTENT-ONLY attention (featureMaps=0, the VGG
    recipe) cannot disambiguate them in free-running decode — a corpus
    artifact, not a model bug (real speech disambiguates repeats by
    coarticulation context; a recurrent encoder by carried state).
    """
    rng = np.random.RandomState(seed)
    if prototypes is None:
        prototypes = prototype_table(n_phones, feat_dim, seed)
    else:
        n_phones = prototypes.shape[0]
        feat_dim = prototypes.shape[1]
    eos = n_phones
    vocab_size = n_phones + 1

    xs, ys, starts, finishes, uids = [], [], [], [], []
    for i in range(n_utts):
        t = rng.randint(min_len, max_len + 1)
        if unique_phones:
            phones = rng.permutation(n_phones)[:t]
        else:
            phones = rng.randint(0, n_phones, size=t)
        frames, st, fi = [], [], []
        pos = 0
        for p in phones:
            d = rng.randint(frames_per_phone[0], frames_per_phone[1] + 1)
            f = prototypes[p][None, :] + noise * rng.randn(d, feat_dim)
            frames.append(f.astype(np.float32))
            st.append(pos)
            fi.append(pos + d)
            pos += d
        x = np.concatenate(frames, axis=0)
        y = np.concatenate([phones, [eos]]).astype(np.int32)
        xs.append(x)
        ys.append(y)
        # <EOS> repeats the last phone's span (preprocess_timit.py:99-102)
        starts.append(np.asarray(st + [st[-1]], np.int64))
        finishes.append(np.asarray(fi + [fi[-1]], np.int64))
        uids.append(f"syn{seed}_{i}")

    ds = Dataset(uids=uids, x=xs, y=ys, y39=None, start=starts, finish=finishes)
    return ds, prototypes, vocab_size


def train_valid(
    n_train: int,
    n_valid: int,
    seed: int = 0,
    **kwargs,
) -> Tuple[Dataset, Dataset, int]:
    """Disjoint train/valid splits over one phone->feature mapping."""
    train, protos, v = make_corpus(n_train, seed=seed, **kwargs)
    kwargs.pop("n_phones", None)
    kwargs.pop("feat_dim", None)
    valid, _, _ = make_corpus(
        n_valid, seed=seed + 1, prototypes=protos, **kwargs
    )
    return train, valid, v


def timit_shaped(
    n_train: int,
    n_valid: int,
    *,
    noise: float = 0.35,
    seed: int = 1,
    min_len: int = 8,
    max_len: int = 50,
    frames_per_phone: Tuple[int, int] = (2, 5),
):
    """TIMIT-shaped corpus: the standard 61-phone(+<EOS>) vocabulary,
    TIMIT-like utterance shapes, and y39 targets so evaluation scores
    the REAL TIMIT PER metric (61->39 fold + beam search,
    /root/reference/timit/timit.lua:397-415, utils.lua:3).

    Shape parity with real TIMIT: 8-50 phones per utterance (TIMIT
    averages ~38 with short SX prompts at the low end; the uniform
    8-50 mix leans shorter — measured here, attention alignment cannot
    bootstrap at all on an all-long corpus, so the short tail is what
    makes the task learnable, exactly as on real speech) at 2-5 frames
    per phone (~80 ms mean duration at the 512-sample/16 kHz hop) ->
    ~16-250 frames, 123-dim features.

    Returns (train, valid, vocab) where vocab is data.timit.Vocab
    (pass it to Trainer so evaluate() maps hypotheses 61->39 exactly as
    the reference does).
    """
    import dataclasses

    from .timit import Vocab

    vocab = Vocab.standard()
    n_ph = vocab.size - 1  # 61 emitting phones; <EOS> = 61 is last
    shape = dict(
        min_len=min_len, max_len=max_len,
        frames_per_phone=frames_per_phone, noise=noise,
    )
    train, protos, v = make_corpus(
        n_train, n_phones=n_ph, feat_dim=123, seed=seed, **shape
    )
    valid, _, _ = make_corpus(
        n_valid, seed=seed + 1, prototypes=protos, **shape
    )
    assert v == vocab.size
    fold = lambda ds: dataclasses.replace(
        ds, y39=[vocab.map_ids_61_to_39(y) for y in ds.y]
    )
    return fold(train), fold(valid), vocab
