"""LibriSpeech corpus pipeline: walk, char/word vocab, chunked HDF5.

Re-implementation of /root/reference/librispeech/preprocess.py and the
Lua-side loaders (librispeech/utils_librispeech.lua):
  - corpus walk pairing .trans .txt files with audio (:63-81). The
    reference reads FLAC via audiolab; here FLAC decodes natively
    (native/flacdec.cpp with the data/flac.py pure-Python fallback);
  - char & word vocabularies over the transcriptions with <eos>
    appended per utterance (:83-111) — 0-based here (Torch used
    1-based); `labelset` selects which one becomes the target ids;
  - chunked training set: N HDF5 chunk files + a `train.db` manifest +
    `meta.txt` (inputFrameSize, sample counts, vocab sizes) (:246-307),
    enabling out-of-core training (librispeech/train.lua:82-103);
  - `--script_test`-style truncation via `max_utts` (:35-39).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

from . import audio, features
from .timit import Dataset  # same in-memory container (y39 unused -> None)

EOS = "<eos>"


@dataclasses.dataclass
class CharVocab:
    charmap: Dict[str, int]
    wordmap: Dict[str, int]

    @property
    def num_chars(self) -> int:
        return len(self.charmap)

    @property
    def num_words(self) -> int:
        return len(self.wordmap)

    def chars_to_ids(self, text: str) -> np.ndarray:
        return np.array(
            [self.charmap[c] for c in text] + [self.charmap[EOS]], np.int32
        )

    def ids_to_chars(self, ids) -> str:
        inv = {v: k for k, v in self.charmap.items()}
        return "".join(inv[int(i)] for i in ids if inv.get(int(i)) != EOS)

    def words_to_ids(self, text: str) -> np.ndarray:
        """Word-level targets (labelset='words',
        utils_librispeech.lua:49-66; vocab built at preprocess.py:95-104)."""
        return np.array(
            [self.wordmap[w] for w in text.split()] + [self.wordmap[EOS]],
            np.int32,
        )

    def ids_to_words(self, ids) -> str:
        inv = {v: k for k, v in self.wordmap.items()}
        return " ".join(inv[int(i)] for i in ids if inv.get(int(i)) != EOS)

    def to_ids(self, text: str, labelset: str = "chars") -> np.ndarray:
        if labelset == "chars":
            return self.chars_to_ids(text)
        if labelset == "words":
            return self.words_to_ids(text)
        raise ValueError(f"labelset must be 'chars' or 'words', got {labelset!r}")

    def size(self, labelset: str = "chars") -> int:
        """Model output_depth for the chosen labelset (numchars /
        numwords in meta.txt, preprocess.py:299-304)."""
        return self.num_chars if labelset == "chars" else self.num_words


def build_vocab(transcripts: List[str]) -> CharVocab:
    """Sorted char/word maps + <eos> (preprocess.py:83-104)."""
    chars, words = set(), set()
    for t in transcripts:
        chars.update(t)
        words.update(t.split())
    charmap = {c: i for i, c in enumerate(sorted(chars))}
    wordmap = {w: i for i, w in enumerate(sorted(words))}
    charmap[EOS] = len(charmap)
    wordmap[EOS] = len(wordmap)
    return CharVocab(charmap, wordmap)


def walk_corpus(rootdir: str) -> List[Tuple[str, str, str]]:
    """Returns [(utt_id, audio_path, transcription)]. Pairs
    `<id> <TEXT>` lines in *.trans.txt / *.txt with sibling audio files
    (.flac or converted .wav/.npy)."""
    trans: Dict[str, str] = {}
    audio_paths: Dict[str, str] = {}
    for dirname, _, fnames in sorted(os.walk(rootdir)):
        for f in sorted(fnames):
            p = os.path.join(dirname, f)
            if f.endswith(".txt"):
                with open(p) as fh:
                    for line in fh:
                        parts = line.strip().split(None, 1)
                        if len(parts) == 2:
                            trans[parts[0]] = parts[1]
            elif f.endswith((".flac", ".wav", ".WAV", ".npy")):
                audio_paths[os.path.splitext(f)[0]] = p
    return [
        (uid, audio_paths[uid], txt)
        for uid, txt in sorted(trans.items())
        if uid in audio_paths
    ]


def build_datasets(
    roots: Dict[str, str],
    feature_fn: Callable[[np.ndarray, int], np.ndarray] = features.logmel_np,
    pad: int = 1,
    max_utts: Optional[int] = None,
    vocab: Optional[CharVocab] = None,
    labelset: str = "chars",
) -> Tuple[Dict[str, Dataset], CharVocab, np.ndarray, np.ndarray]:
    """roots: {"train": dir, "valid": dir, "test": dir}. Returns
    ({split: Dataset}, vocab, mean, std). Normalization stats come from
    the train split; pad=1 matches preprocess.py:286. labelset selects
    character or word targets (opt.labelset, librispeech/train.lua:28 +
    utils_librispeech.lua:49-66); the model's output_depth must then be
    vocab.size(labelset)."""
    walked = {k: walk_corpus(v) for k, v in roots.items()}
    if max_utts:
        walked = {k: v[:max_utts] for k, v in walked.items()}
    if vocab is None:
        vocab = build_vocab([t for split in walked.values() for _, _, t in split])

    def extract(split):
        out = []
        for _, path, _ in split:
            pcm, sr = audio.read_audio(path)
            out.append(feature_fn(pcm, sr))
        return out

    names = list(walked.keys())
    featsets = [extract(walked[n]) for n in names]
    train_idx = names.index("train") if "train" in names else 0
    ordered = [featsets[train_idx]] + [
        f for i, f in enumerate(featsets) if i != train_idx
    ]
    normed_and_stats = features.normalize_corpus(*ordered, pad=pad)
    mean, std = normed_and_stats[-2], normed_and_stats[-1]
    normed = list(normed_and_stats[:-2])
    feats = {}
    feats[names[train_idx]] = normed[0]
    rest = iter(normed[1:])
    for i, n in enumerate(names):
        if i != train_idx:
            feats[n] = next(rest)

    def mk(split, fs):
        return Dataset(
            uids=[uid for uid, _, _ in split],
            x=[f.astype(np.float32) for f in fs],
            y=[vocab.to_ids(t, labelset) for _, _, t in split],
            y39=None,
            start=[np.zeros(0, np.int64)] * len(split),
            finish=[np.zeros(0, np.int64)] * len(split),
        )

    return (
        {n: mk(walked[n], feats[n]) for n in names},
        vocab,
        mean,
        std,
    )


# ---------------------------------------------------------------------------
# Chunked out-of-core format (train.db manifest + trainN.h5 + meta.txt;
# preprocess.py:246-307, loaded chunk-at-a-time like train.lua:82-103)
# ---------------------------------------------------------------------------


def save_chunked(
    ds: Dataset, outdir: str, n_chunks: int = 1, prefix: str = "train"
) -> List[str]:
    from .timit import save_hdf5

    os.makedirs(outdir, exist_ok=True)
    n = len(ds)
    per = -(-n // n_chunks)
    paths = []
    for c in range(n_chunks):
        lo, hi = c * per, min((c + 1) * per, n)
        if lo >= hi:
            break
        sub = Dataset(
            uids=ds.uids[lo:hi], x=ds.x[lo:hi], y=ds.y[lo:hi],
            y39=None, start=ds.start[lo:hi], finish=ds.finish[lo:hi],
        )
        p = os.path.join(outdir, f"{prefix}{c}.h5")
        save_hdf5(sub, p)
        paths.append(p)
    with open(os.path.join(outdir, f"{prefix}.db"), "w") as f:
        f.write("\n".join(paths) + "\n")
    return paths


def load_manifest(outdir: str, prefix: str = "train") -> List[str]:
    with open(os.path.join(outdir, f"{prefix}.db")) as f:
        return [l.strip() for l in f if l.strip()]


def save_meta(outdir: str, meta: Dict[str, int]) -> None:
    with open(os.path.join(outdir, "meta.txt"), "w") as f:
        for k, v in sorted(meta.items(), key=lambda kv: kv[1]):
            f.write(f"{k} {v}\n")


def load_meta(outdir: str) -> Dict[str, int]:
    meta = {}
    with open(os.path.join(outdir, "meta.txt")) as f:
        for line in f:
            k, v = line.split()
            meta[k] = int(v)
    return meta


def iter_chunks(outdir: str, prefix: str = "train", shuffle: bool = False, seed: int = 0):
    """Yield one in-memory Dataset per chunk file (shuffled order like
    train.lua:84-88)."""
    from .timit import load_hdf5

    paths = load_manifest(outdir, prefix)
    order = np.arange(len(paths))
    if shuffle:
        np.random.RandomState(seed).shuffle(order)
    for i in order:
        yield load_hdf5(paths[i])
