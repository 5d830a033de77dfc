"""Length-bucketed padded batching — the capability the reference lacks.

The reference trains strictly one utterance at a time with dynamic
shapes ("since data is variable length, we do each sample individually",
/root/reference/timit/timit.lua:239-240). On TPU, dynamic shapes force
recompilation, so batches are padded to a small fixed set of bucket
boundaries: each (L_pad, T_pad) pair compiles exactly once and is
reused for every batch in that bucket.

`Batch` carries everything a train/eval step needs: padded features,
encoder lengths, padded labels (61- and 39-space), decoder mask, and
uids for logging. One-hot label expansion (the reference's scatter
labelmask, timit.lua:262) happens on device in the train step.
"""

from __future__ import annotations

import dataclasses
import queue
import threading
from typing import Any, Iterator, List, Optional, Sequence, Tuple

import numpy as np


@dataclasses.dataclass
class Batch:
    x: np.ndarray  # (B, L_pad, D) float32
    x_len: np.ndarray  # (B,) int32
    y: np.ndarray  # (B, T_pad) int32, padded with 0
    y_len: np.ndarray  # (B,) int32
    y39: Optional[np.ndarray]  # (B, T_pad) int32 or None
    uids: List[str]

    @property
    def dec_mask(self) -> np.ndarray:
        t = self.y.shape[1]
        return (np.arange(t)[None, :] < self.y_len[:, None]).astype(np.float32)


def _round_up(n: int, boundaries: Sequence[int]) -> int:
    for b in boundaries:
        if n <= b:
            return b
    return boundaries[-1]


def make_buckets(
    lengths: Sequence[int], n_buckets: int = 8, multiple: int = 16
) -> List[int]:
    """Quantile-based bucket boundaries, rounded up to `multiple`.

    16 keeps every bucket eligible for the fused bf16 decoder kernel
    (bf16 tiles want 16 sublanes on the encoder axis); the extra
    padding vs 8 is negligible."""
    qs = np.quantile(np.asarray(lengths), np.linspace(0, 1, n_buckets + 1)[1:])
    out = sorted({int(-(-q // multiple) * multiple) for q in qs})
    return out


@dataclasses.dataclass
class BucketedBatcher:
    """Groups utterances into (L-bucket) batches and pads.

    Bucketing is by encoder length; the decoder axis is padded to the
    batch's own max rounded to `t_multiple` (a second, coarser bucket
    axis), keeping the number of distinct compiled shapes ~ n_buckets
    x few.
    """

    l_buckets: List[int]
    batch_size: int
    t_multiple: int = 16

    @classmethod
    def from_dataset(cls, ds, batch_size: int, n_buckets: int = 8) -> "BucketedBatcher":
        return cls(
            l_buckets=make_buckets([len(x) for x in ds.x], n_buckets),
            batch_size=batch_size,
        )

    def batches(
        self,
        ds,
        shuffle: bool = False,
        seed: int = 0,
        drop_remainder: bool = False,
        max_samples: Optional[int] = None,
    ) -> Iterator[Batch]:
        order = np.arange(len(ds))
        if shuffle:
            np.random.RandomState(seed).shuffle(order)
        if max_samples:
            order = order[:max_samples]
        pools: dict = {}
        for i in order:
            lb = _round_up(len(ds.x[i]), self.l_buckets)
            pools.setdefault(lb, []).append(i)
            if len(pools[lb]) == self.batch_size:
                yield self._pad(ds, pools.pop(lb), lb)
        if not drop_remainder:
            for lb, idxs in sorted(pools.items()):
                yield self._pad(ds, idxs, lb)

    @staticmethod
    def _ragged(ds):
        """Ragged (concatenated) views of ds for the native packer,
        built once per dataset and cached on the dataset object."""
        cached = getattr(ds, "_ragged_views", None)
        if cached is not None:
            return cached
        from ..native import packing

        views = (
            packing.RaggedFeatures(ds.x),
            packing.RaggedLabels(ds.y),
            packing.RaggedLabels(ds.y39) if ds.y39 is not None else None,
        )
        ds._ragged_views = views
        return views

    def _pad(self, ds, idxs: List[int], l_pad: int) -> Batch:
        t_max = max(len(ds.y[i]) for i in idxs)
        t_pad = -(-t_max // self.t_multiple) * self.t_multiple
        if ds.x[idxs[0]].ndim != 2:
            # channel-stacked features (L, freq, C) — e.g. the VGG
            # recipe's 3-channel logmel — go through the shape-generic
            # NumPy path (the C++ packer is 2-D strided copies)
            return self._pad_np(ds, idxs, l_pad, t_pad)
        try:
            return self._pad_native(ds, idxs, l_pad, t_pad)
        except Exception:
            return self._pad_np(ds, idxs, l_pad, t_pad)

    def _pad_native(self, ds, idxs: List[int], l_pad: int, t_pad: int) -> Batch:
        """C++ strided-copy packing (native/packing.cpp)."""
        from ..native import packing

        rf, rl, rl39 = self._ragged(ds)
        x, x_len = packing.pack_batch(rf, idxs, l_pad)
        y, y_len = packing.pack_labels(rl, idxs, t_pad)
        y39 = packing.pack_labels(rl39, idxs, t_pad)[0] if rl39 is not None else None
        return Batch(
            x=x, x_len=x_len.astype(np.int32), y=y,
            y_len=y_len.astype(np.int32), y39=y39,
            uids=[ds.uids[i] for i in idxs],
        )

    def _pad_np(self, ds, idxs: List[int], l_pad: int, t_pad: int) -> Batch:
        """NumPy fallback (no C++ toolchain); semantics identical to
        _pad_native — parity asserted in tests/test_native.py."""
        b = len(idxs)
        x = np.zeros((b, l_pad) + ds.x[idxs[0]].shape[1:], np.float32)
        y = np.zeros((b, t_pad), np.int32)
        y39 = np.zeros((b, t_pad), np.int32) if ds.y39 is not None else None
        x_len = np.zeros((b,), np.int32)
        y_len = np.zeros((b,), np.int32)
        for j, i in enumerate(idxs):
            li, ti = len(ds.x[i]), len(ds.y[i])
            x[j, :li] = ds.x[i][:l_pad]
            x_len[j] = min(li, l_pad)
            y[j, :ti] = ds.y[i]
            y_len[j] = ti
            if y39 is not None:
                y39[j, :ti] = ds.y39[i]
        return Batch(
            x=x, x_len=x_len, y=y, y_len=y_len, y39=y39,
            uids=[ds.uids[i] for i in idxs],
        )


class CachedDeviceBatcher:
    """Device-resident batches with per-epoch ORDER shuffling.

    Builds every batch once (one shuffle fixes the batch membership),
    transfers them to device once, and each epoch yields them in a
    freshly shuffled order. Steady-state host->device traffic is zero —
    the right trade on hosts whose device link is slow relative to the
    step (e.g. a tunneled chip: a 1.3 MB batch can cost 40x the step
    itself in transfer). The SGD cost is that within-batch composition
    is fixed across epochs (batch ORDER still reshuffles); bucketed
    batches are like-length groups anyway, so the composition freedom
    given up is small. Drop-in for BucketedBatcher in Trainer.fit.
    """

    def __init__(self, base: "BucketedBatcher", seed: int = 0,
                 synth: Optional["DeviceSynth"] = None):
        self._base = base
        self._seed = seed
        self._synth = synth
        self._caches: dict = {}  # id(ds) -> (ds ref, [DeviceBatch])

    def _cache_for(self, ds):
        key = id(ds)
        hit = self._caches.get(key)
        if hit is not None:
            return hit[1]
        if self._synth is not None:
            cache = self._synth.stage(
                ds, self._base.batches(ds, shuffle=True, seed=self._seed)
            )
            self._caches[key] = (ds, cache)
            return cache
        import jax

        cache = []
        for b in self._base.batches(ds, shuffle=True, seed=self._seed):
            cache.append(DeviceBatch(
                x=jax.device_put(b.x),
                x_len=jax.device_put(b.x_len),
                y=jax.device_put(b.y),
                dec_mask=jax.device_put(b.dec_mask),
                y_len=b.y_len,
                y39=b.y39,
                uids=b.uids,
            ))
        self._caches[key] = (ds, cache)  # hold ds so id() stays unique
        return cache

    def batches(self, ds, shuffle: bool = False, seed: int = 0,
                drop_remainder: bool = False,
                max_samples: Optional[int] = None):
        cache = self._cache_for(ds)
        order = np.arange(len(cache))
        if shuffle:
            np.random.RandomState(seed).shuffle(order)
        n = 0
        for i in order:
            b = cache[i]
            if max_samples and n >= max_samples:
                return
            n += len(b.uids)
            yield b


class DeviceSynth:
    """On-device feature synthesis for staged synthetic corpora.

    Staging a TIMIT-sized synthetic corpus (data/synthetic.py) as f32
    features costs ~200+ MB of host->device transfer — ~30 minutes over
    the ~8 MB/s tunneled-chip link. But the features ARE a formula:

        x[t] = prototypes[phone_at_frame[t]] + noise * N(0, 1)

    so this stager ships only uint8 frame->phone index maps (and uint8
    targets), ~100x less traffic, and evaluates the formula on device in
    one jitted call per bucket shape. Batch membership, targets,
    lengths, and the zeroed padding region are bit-identical to the
    host path; the Gaussian noise is a different but identically
    distributed draw (jax PRNG keyed per bucket instead of the host
    RandomState) — with noise=0 the staged features match the host
    features exactly (pinned by tests/test_data.py::
    test_device_synth_staging_matches_host).

    Requires ds.start/ds.finish per-token frame spans (synthetic
    corpora carry them; make_corpus emits no frames for <EOS>, so
    tokens >= len(prototypes) are skipped when painting the map).
    """

    def __init__(self, prototypes: np.ndarray, noise: float, seed: int = 0):
        self.protos = np.asarray(prototypes, np.float32)
        self.noise = float(noise)
        self.seed = int(seed)

    def stage(self, ds, host_batches) -> List["DeviceBatch"]:
        import jax
        import jax.numpy as jnp

        assert ds.start is not None and ds.finish is not None, (
            "DeviceSynth needs per-token frame spans (ds.start/finish)"
        )
        by_uid = {u: i for i, u in enumerate(ds.uids)}
        n_ph = self.protos.shape[0]
        # The index maps and targets ship as uint8 (that's the whole
        # transfer saving); a wider corpus would silently wrap ids into
        # wrong prototypes/targets, so refuse it loudly.
        assert n_ph <= 255, f"DeviceSynth needs <=255 prototypes, got {n_ph}"
        max_tok = max((int(np.max(y)) for y in ds.y if len(y)), default=0)
        assert max_tok < 256, (
            f"DeviceSynth stages uint8 targets; corpus has token id {max_tok}"
        )
        groups: dict = {}  # (L_pad, T_pad) -> [(ordinal, Batch, idx u8)]
        n_total = 0
        for b in host_batches:
            idx = np.zeros((b.x.shape[0], b.x.shape[1]), np.uint8)
            for r, u in enumerate(b.uids):
                i = by_uid[u]
                y, st, fi = ds.y[i], ds.start[i], ds.finish[i]
                for j in range(len(y)):
                    if y[j] < n_ph:  # skip <EOS>: it emits no frames
                        idx[r, st[j]:fi[j]] = y[j]
            # key includes B: ragged tail batches stack separately
            groups.setdefault(
                (b.x.shape[0], b.x.shape[1], b.y.shape[1]), []
            ).append((n_total, b, idx))
            n_total += 1

        protos_dev = jax.device_put(self.protos)
        noise = self.noise

        @jax.jit
        def build(protos, idx_all, x_len_all, y_all, y_len_all, key):
            x = jnp.take(protos, idx_all.astype(jnp.int32), axis=0)
            x = x + noise * jax.random.normal(key, x.shape, jnp.float32)
            l_mask = (
                jnp.arange(x.shape[-2]) < x_len_all[..., None]
            )  # (n, B, L)
            x = x * l_mask[..., None]
            dec_mask = (
                jnp.arange(y_all.shape[-1]) < y_len_all[..., None]
            ).astype(jnp.float32)
            return x, y_all.astype(jnp.int32), dec_mask

        key = jax.random.PRNGKey(self.seed)
        cache: List[Optional[DeviceBatch]] = [None] * n_total
        for gi, (_shape, members) in enumerate(sorted(groups.items())):
            # one put per field per bucket shape: put LATENCY (~1 s over
            # the tunnel) dominates these tiny arrays, so batches stack
            idx_all = np.stack([m[2] for m in members])
            x_len_all = np.stack([m[1].x_len for m in members])
            y_all = np.stack([m[1].y for m in members]).astype(np.uint8)
            y_len_all = np.stack([m[1].y_len for m in members])
            x_dev, y_dev, dm_dev = build(
                protos_dev,
                jax.device_put(idx_all),
                jax.device_put(x_len_all),
                jax.device_put(y_all),
                jax.device_put(y_len_all),
                jax.random.fold_in(key, gi),
            )
            xl_dev = jnp.asarray(x_len_all)
            for i, (pos, b, _) in enumerate(members):
                cache[pos] = DeviceBatch(
                    x=x_dev[i], x_len=xl_dev[i], y=y_dev[i],
                    dec_mask=dm_dev[i], y_len=b.y_len, y39=b.y39,
                    uids=b.uids,
                )
        return cache


@dataclasses.dataclass
class DeviceBatch:
    """A Batch whose step inputs already live on device.

    The feeder thread did the host->device transfer (and the dec_mask
    expansion) while the previous step was still running, so the train
    loop never blocks on input marshalling. y39/y_len stay host-side
    (they feed the host PER scorer).
    """

    x: Any
    x_len: Any
    y: Any
    dec_mask: Any
    y_len: np.ndarray
    y39: Optional[np.ndarray]
    uids: List[str]


class Prefetcher:
    """Bounded-depth async prefetch over a Batch iterator.

    The reference loads each utterance synchronously inside the train
    loop (timit.lua:215-247). Here a daemon thread pads + transfers
    `depth` batches ahead; with JAX's async dispatch the device is
    never input-starved. BucketedBatcher._pad does the padding through
    the native C++ packer (native/packing.cpp) when it builds, so the
    feeder thread's per-batch work is two memcpy-speed calls.
    """

    _DONE = object()

    def __init__(self, it: Iterator[Batch], depth: int = 2):
        import jax

        self._jax = jax
        self._q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
        self._stop = threading.Event()
        self._thread = threading.Thread(
            target=self._feed, args=(it,), daemon=True
        )
        self._thread.start()

    def _put(self, item) -> bool:
        """Bounded put that gives up when the consumer has closed us —
        otherwise an abandoned iterator (e.g. the NaN tripwire raising
        mid-epoch) would park this thread on a full queue forever,
        pinning `depth` device-resident batches."""
        while not self._stop.is_set():
            try:
                self._q.put(item, timeout=0.2)
                return True
            except queue.Full:
                pass
        return False

    def _feed(self, it):
        jax = self._jax
        try:
            for b in it:
                dev = DeviceBatch(
                    x=jax.device_put(b.x),
                    x_len=jax.device_put(b.x_len),
                    y=jax.device_put(b.y),
                    dec_mask=jax.device_put(b.dec_mask),
                    y_len=b.y_len,
                    y39=b.y39,
                    uids=b.uids,
                )
                if not self._put(dev):
                    return
        except BaseException as e:  # surface feeder errors to the consumer
            self._put(e)
            return
        self._put(self._DONE)

    def close(self):
        """Stop the feeder and release queued batches. Idempotent."""
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass

    def __iter__(self):
        try:
            while True:
                item = self._q.get()
                if item is self._DONE:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            # Runs on normal exhaustion, consumer exceptions, and
            # generator close — always reaps the feeder.
            self.close()
