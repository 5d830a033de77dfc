"""Training/eval driver — the framework API the reference keeps as
script globals (/root/reference/timit/timit.lua `Train`/`Evaluate`,
librispeech/train.lua).

Differences by design (SURVEY.md §7): batched padded execution instead
of per-utterance dynamic shapes; one jitted train step instead of an
optimfunc closure over a flat parameter vector; the AWN/weight-noise
sampling lives INSIDE the jitted step with explicit PRNG keys
(reference resamples into the flat vector on host, timit.lua:248-253);
beam-search eval is batched on device.

`opt`-table parity map (timit.lua:17-37):
  batchSize -> TrainConfig.batch_size (the reference iterates samples
    individually even for batchSize>1, timit.lua:239-240 — here batches
    really batch), normalizeNLL -> normalize_nll, normalizeGrad ->
    normalize_grad, maxnorm/weightDecay/gradnoise_* -> OptimConfig,
    colnormconstr/maxcolnorm -> OptimConfig.colnorm*, adaweightnoise /
    weightnoise -> noise, K -> beam_k, maxnumsamples -> max_samples,
    numEpochs -> num_epochs, predict/save -> Trainer.fit(log_dir).
"""

from __future__ import annotations

import dataclasses
import json
import math
import os
import time
from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data import batching
from ..decode import beam as beam_lib
from ..decode import metrics as metrics_lib
from . import awn as awn_lib
from . import optim as optim_lib
from .loss import masked_nll, token_accuracy

Params = Any


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    num_epochs: int = 100
    batch_size: int = 16
    normalize_nll: bool = False  # opt.normalizeNLL
    normalize_grad: bool = False  # opt.normalizeGrad (grad /= T)
    noise: str = "none"  # "none" | "awn" | "weight" (opt.adaweightnoise / weightnoise)
    # opt.adalambda: KL weight, ~= 1/num_train_samples (Graves 2011).
    # The reference defaults it to 1 (AdaptiveWeightNoise.lua:18) but
    # every real recipe passes 1/B; too-large values make the KL
    # shrinkage dominate the NLL gradient and stall learning.
    awn_lambda: float = 1.0
    awn_sigma_init: float = 0.075
    weight_noise_sigma: float = 0.0
    beam_k: int = 5  # opt.K
    max_samples: Optional[int] = None  # opt.maxnumsamples
    eval_len_factor: float = 1.0  # beam maxseqlen = factor * L (2.0 for librispeech)
    dump_attention: bool = False  # per-epoch alpha/Ws/Vh dump (timit.lua:540-550)
    dump_predictions: bool = False  # per-epoch beam outputs (predictions.t7, timit.lua:552)
    nan_debug: bool = True  # NaN tripwire (TrainUtils.lua:55-93 parity)
    prefetch: int = 2  # async feeder-thread depth (0 disables)
    seed: int = 1


def _one_hot_labels(y, dec_mask, v):
    """labelmask scatter (timit.lua:262): one-hot zeroed at padded steps."""
    return jax.nn.one_hot(y, v, dtype=dec_mask.dtype) * dec_mask[..., None]


def make_init_fn(tx: optax.GradientTransformation, tcfg: TrainConfig):
    """State constructor shared by the single-chip and sharded steps:
    (model params, rng key) -> (train_params, opt_state, rng), where
    train_params is an AWNState when tcfg.noise == "awn"."""
    use_awn = tcfg.noise == "awn"

    def init_fn(params: Params, rng: jax.Array):
        train_params = (
            awn_lib.init(params, tcfg.awn_sigma_init) if use_awn else params
        )
        return (train_params, tx.init(train_params), rng)

    return init_fn


def make_step_core(
    forward_fn: Callable[..., Dict[str, jnp.ndarray]],
    tx: optax.GradientTransformation,
    ocfg: optim_lib.OptimConfig,
    tcfg: TrainConfig,
    output_depth: int,
):
    """The ONE loss/grad/update core, shared by the single-chip jitted
    step (make_train_step) and the dp x sp sharded step
    (parallel/dp.py) so that noise sampling, dropout rng, the monotonic
    penalty reporting, and the column-norm projection behave identically
    on both paths.

    forward_fn(params, x, x_len, labels_onehot, dec_mask, dropout_rng,
    train) -> dict(logprobs, alpha, penalty).

    step_fn(state, batch) -> (state, metrics); state = (train_params,
    opt_state, rng) where train_params is the model pytree, or an
    AWNState when tcfg.noise == "awn". batch = (x, x_len, y, dec_mask).
    Loss is the batch MEAN of per-utterance NLL (reference averages
    accumulated per-sample grads, timit.lua:292-295). normalize_nll
    divides each utterance's REPORTED nll by its own T (timit.lua:
    268-271) without touching the gradient; normalize_grad divides the
    backward signal by T (timit.lua:278-281) without touching the
    report — independent knobs, as in the reference.
    """
    use_awn = tcfg.noise == "awn"
    use_wn = tcfg.noise == "weight"

    def _loss(model_params, x, x_len, onehot, dec_mask, dropout_rng):
        out = forward_fn(
            model_params, x, x_len, onehot, dec_mask,
            dropout_rng=dropout_rng, train=True,
        )
        per_step = -jnp.sum(onehot * out["logprobs"], axis=-1) * dec_mask
        per_utt = jnp.sum(per_step, axis=-1)
        lens = jnp.maximum(jnp.sum(dec_mask, axis=-1), 1.0)
        # Mean over REAL utterances: a row with an all-zero dec_mask is
        # batch padding (the mesh trainer pads ragged batches up to the
        # dp divisor with dead copies) and must affect neither the loss
        # value nor its scale. For full batches this is jnp.mean.
        row = (jnp.sum(dec_mask, axis=-1) > 0).astype(per_utt.dtype)

        def rowmean(v):
            return jnp.sum(v * row) / jnp.maximum(jnp.sum(row), 1.0)

        # normalize_nll and normalize_grad are INDEPENDENT knobs
        # (timit.lua:268-271 chooses the reported nll scale; :278-281
        # divides only dLdlogp by T). The differentiated scalar follows
        # normalize_grad; the reported NLL follows normalize_nll; the
        # aux value carries the report so grads never see its scale.
        loss_grad = rowmean(per_utt / lens if tcfg.normalize_grad else per_utt)
        loss_report = rowmean(per_utt / lens if tcfg.normalize_nll else per_utt)
        return loss_grad, (out, loss_report)

    def step_fn(state, batch):
        train_params, opt_state, rng = state
        x, x_len, y, dec_mask = batch
        rng, noise_rng, dropout_rng = jax.random.split(rng, 3)
        onehot = _one_hot_labels(y, dec_mask, output_depth)

        if use_awn:
            w = awn_lib.sample(noise_rng, train_params)
            (_, (out, loss)), grads_w = jax.value_and_grad(_loss, has_aux=True)(
                w, x, x_len, onehot, dec_mask, dropout_rng
            )
            # The reference averages the per-sample NLL grads over the
            # batch and then adds the FULL lambda-weighted KL grads once
            # per optimizer step (timit.lua:292-295 then :325-330), so
            # the per-step objective is mean NLL + lambda*KL. lambda is
            # opt.adalambda ~= 1/num_train_samples (Graves 2011;
            # AdaptiveWeightNoise.lua:18 "equals 1/B").
            grads = awn_lib.grads(train_params, grads_w, tcfg.awn_lambda)
            # reported objective: mean NLL + lambda*KL (AWN:updateOutput)
            loss_report = loss + tcfg.awn_lambda * awn_lib.kl(train_params)
        else:
            model_params = train_params
            if use_wn:
                model_params = awn_lib.weight_noise_sample(
                    noise_rng, train_params, tcfg.weight_noise_sigma
                )
            (_, (out, loss)), grads = jax.value_and_grad(_loss, has_aux=True)(
                model_params, x, x_len, onehot, dec_mask, dropout_rng
            )
            loss_report = loss

        gnorm = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, opt_state, train_params)
        train_params = optax.apply_updates(train_params, updates)
        if ocfg.colnorm:
            if use_awn:
                train_params = awn_lib.AWNState(
                    mu=optim_lib.colnorm_project(train_params.mu, ocfg.colnorm_maxval),
                    s=train_params.s,
                )
            else:
                train_params = optim_lib.colnorm_project(
                    train_params, ocfg.colnorm_maxval
                )

        correct, total = token_accuracy(out["logprobs"], y, dec_mask)
        pnorm = optax.global_norm(
            train_params.mu if use_awn else train_params
        )
        metrics = {
            "loss": loss_report,
            "nll": loss,
            "grad_norm": gnorm,
            "param_norm": pnorm,
            "correct": correct,
            "total": total,
            "penalty": jnp.sum(out["penalty"]),
        }
        if use_awn:
            # Posterior-noise observability: the AWN failure mode is mu
            # draining toward the prior mean / sigma inflating toward
            # alpha_sigma2 (adadelta gives the consistent KL direction
            # full-size steps regardless of lambda — see
            # docs/AWN_NOTES.md). param_norm above is |mu|; this is the
            # rms sampling noise actually applied each step.
            n_tot = sum(l.size for l in jax.tree.leaves(train_params.s))
            sig2 = sum(
                jnp.sum(jnp.exp(l)) for l in jax.tree.leaves(train_params.s)
            )
            metrics["awn_sigma_rms"] = jnp.sqrt(sig2 / n_tot)
        return (train_params, opt_state, rng), metrics

    return step_fn


def make_train_step(
    forward_fn: Callable[..., Dict[str, jnp.ndarray]],
    tx: optax.GradientTransformation,
    ocfg: optim_lib.OptimConfig,
    tcfg: TrainConfig,
    output_depth: int,
):
    """Returns (init_fn, step_fn) — see make_step_core for semantics."""
    return (
        make_init_fn(tx, tcfg),
        make_step_core(forward_fn, tx, ocfg, tcfg, output_depth),
    )


def eval_params(tcfg: TrainConfig, train_params):
    """Weights used for evaluation: AWN mode() = mu, else the params
    themselves (timit.lua:375-379)."""
    return train_params.mu if tcfg.noise == "awn" else train_params


def make_eval_step(
    forward_fn: Callable[..., Dict[str, jnp.ndarray]], output_depth: int
):
    """Teacher-forced eval: summed NLL + accuracy counts (timit.lua:384-394)."""

    def eval_fn(params, batch):
        x, x_len, y, dec_mask = batch
        onehot = _one_hot_labels(y, dec_mask, output_depth)
        out = forward_fn(
            params, x, x_len, onehot, dec_mask, dropout_rng=None, train=False
        )
        per_step = -jnp.sum(onehot * out["logprobs"], axis=-1) * dec_mask
        nll = jnp.sum(per_step)
        correct, total = token_accuracy(out["logprobs"], y, dec_mask)
        # n counts REAL rows (any unmasked decoder step) so dead padding
        # rows from the mesh trainer don't dilute the per-utterance NLL.
        return {
            "nll": nll,
            "correct": correct,
            "total": total,
            "n": jnp.sum((jnp.sum(dec_mask, axis=-1) > 0).astype(jnp.float32)),
        }

    return eval_fn


def make_decode_step(
    encode_fn: Callable[..., Tuple[jnp.ndarray, jnp.ndarray]],
    attention_cfg,
    beam_k: int,
    len_factor: float = 1.0,
    backend: str = "auto",
    compute_dtype: str = "float32",
):
    """Beam-search decode over a batch: encode then search.

    encode_fn(params, x, x_len) -> (annotations, annotation_lengths)
    (models downsample time, so lengths transform). eos per sample is
    the final target token (timit.lua:398). backend feeds the fused
    single-step attention kernel selection (decode/beam.py).
    compute_dtype follows the model's mixed-precision operating point:
    under "bfloat16" the encoder/decoder matmuls and the fused step
    kernel's vh/h blocks run bf16 (the beam's scores/softmax stay f32
    inside the kernels' f32 math).
    """
    dt = jnp.dtype(compute_dtype)

    def decode_fn(params, x, x_len, eos_id, max_steps_cap: int):
        if dt != jnp.float32:
            cast = lambda a: a.astype(dt) if a.dtype == jnp.float32 else a
            params = jax.tree.map(cast, params)
            x = cast(x)
        h, h_len = encode_fn(params, x, x_len)
        max_steps = jnp.minimum(
            (len_factor * h_len).astype(jnp.int32), max_steps_cap
        )
        return beam_lib.beam_search(
            params["decoder"], attention_cfg, h, h_len, eos_id,
            k=beam_k, max_steps=max_steps, max_steps_cap=max_steps_cap,
            backend=backend,
        )

    return decode_fn


# ---------------------------------------------------------------------------
# Epoch-level driver
# ---------------------------------------------------------------------------


class MetricLog:
    """JSONL metrics log (replaces the reference's HDF5 log.h5 scalar
    series, timit.lua:428-445; attention-map dumps live in
    tools/extract_alpha.py)."""

    def __init__(self, path: Optional[str]):
        self.path = path
        self.rows = []
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def append(self, row: Dict[str, Any]):
        row = {
            k: (float(v) if hasattr(v, "item") or isinstance(v, (int, float)) else v)
            for k, v in row.items()
        }
        self.rows.append(row)
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(row) + "\n")

    @staticmethod
    def load(path: str):
        with open(path) as f:
            return [json.loads(l) for l in f if l.strip()]


class Trainer:
    """Epoch loop: Train() + Evaluate() + checkpoints + logs.

    Mirrors the reference run loop (timit/timit.lua:493-565): per-epoch
    shuffled training, teacher-forced valid NLL/accuracy, beam-search
    PER/CER, JSONL metric log, checkpoints for latest / best accuracy /
    best PER, resume from the latest checkpoint, and per-epoch
    optimizer-hyperparameter resets (optimConfigResets,
    timit.lua:496-502).
    """

    def __init__(
        self,
        model,
        ocfg: optim_lib.OptimConfig,
        tcfg: TrainConfig,
        *,
        vocab=None,  # timit.Vocab for 61->39 PER scoring; None -> CER on raw ids
        save_dir: Optional[str] = None,
        optim_resets: Optional[Dict[int, optim_lib.OptimConfig]] = None,
        jit: bool = True,
        mesh=None,  # jax.sharding.Mesh -> dp x sp sharded fit/eval/decode
    ):
        self.model = model
        self.ocfg = ocfg
        self.tcfg = tcfg
        self.vocab = vocab
        self.save_dir = save_dir
        self.optim_resets = optim_resets or {}
        self.mesh = mesh
        # multi-controller SPMD (one process per host, SURVEY.md §2.6):
        # every host runs this same Trainer over its host_shard of the
        # data; batches assemble into global dp-sharded arrays.
        self.n_proc = jax.process_count() if mesh is not None else 1
        self.log = MetricLog(
            os.path.join(save_dir, "log.jsonl")
            if save_dir and jax.process_index() == 0
            else None
        )
        self._build(ocfg, jit)
        self.state = None
        self.epoch = 0
        self.best = {"valid_accuracy": -1.0, "valid_per": float("inf")}

    def _build(self, ocfg, jit=True):
        tx = optim_lib.build_optimizer(ocfg)
        self.init_fn = make_init_fn(tx, self.tcfg)
        if self.mesh is not None:
            # the mesh-wired driver: the SAME step cores, jitted with
            # dp-sharded batches + replicated state (parallel/dp.py) —
            # the "distributed driver" the reference never had
            # (timit.lua:493-565 is single-GPU).
            from ..parallel import dp as dp_lib

            self.step_fn = dp_lib.make_sharded_train_step(
                self.model, tx, self.tcfg, ocfg, self.mesh
            )
            self.eval_fn = dp_lib.make_sharded_eval_step(self.model, self.mesh)
            self.decode_fn = dp_lib.make_sharded_decode_step(
                self.model, self.mesh, self.tcfg.beam_k,
                self.tcfg.eval_len_factor,
                compute_dtype=getattr(self.model.cfg, "compute_dtype", "float32"),
            )
            return
        step_fn = make_step_core(
            self.model.forward, tx, ocfg, self.tcfg, self.model.output_depth
        )
        eval_fn = make_eval_step(self.model.forward, self.model.output_depth)
        decode_fn = make_decode_step(
            self.model.encode,
            self.model.attention_cfg,
            self.tcfg.beam_k,
            self.tcfg.eval_len_factor,
            backend=getattr(self.model.cfg, "attn_backend", "auto"),
            compute_dtype=getattr(self.model.cfg, "compute_dtype", "float32"),
        )
        if jit:
            self.step_fn = jax.jit(step_fn, donate_argnums=0)
            self.eval_fn = jax.jit(eval_fn)
            self.decode_fn = jax.jit(decode_fn, static_argnames=("max_steps_cap",))
        else:
            self.step_fn, self.eval_fn, self.decode_fn = step_fn, eval_fn, decode_fn

    # -- state management ---------------------------------------------------

    def _replicate(self, tree):
        """Place a pytree replicated over the mesh (no-op without one)."""
        if self.mesh is None:
            return jax.tree.map(jnp.asarray, tree)
        from ..parallel.mesh import put_replicated

        return put_replicated(self.mesh, tree)

    def init(self, params):
        self.state = self._replicate(
            self.init_fn(params, jax.random.PRNGKey(self.tcfg.seed))
        )
        return self.state

    def _ckpt_path(self, tag: str) -> str:
        return os.path.join(self.save_dir, f"ckpt_{tag}")

    def save_checkpoint(self, tag: str = "latest"):
        from . import checkpoint

        if not self.save_dir:
            return
        # multi-controller runs: state is replicated, so host 0 writes
        # the single source of truth (every host reads it on resume)
        if jax.process_index() == 0:
            checkpoint.save(
                self._ckpt_path(tag),
                {"state": self.state, "epoch": self.epoch, "best": self.best},
            )
        if self.n_proc > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(f"ckpt_{tag}_{self.epoch}")

    def resume(self) -> bool:
        from . import checkpoint

        if not self.save_dir or self.state is None:
            return False
        path = self._ckpt_path("latest")
        if not checkpoint.exists(path):
            return False
        like = {"state": self.state, "epoch": 0, "best": dict(self.best)}
        blob = checkpoint.load(path, like=like)
        self.state = self._replicate(blob["state"])
        self.epoch = int(blob["epoch"])
        self.best = {k: float(v) for k, v in blob["best"].items()}
        return True

    # -- epoch phases -------------------------------------------------------

    def _prepare_batch(self, batch, with_eos: bool = False):
        """Host batch -> step-ready arrays.

        Without a mesh: jnp conversion. With one: the leading axis pads
        up to the per-host dp divisor with DEAD copies of row 0
        (dec_mask all zero — contributes nothing to loss/metrics/
        penalty; real content so lengths stay valid for the attention
        softmax), and under multi-controller SPMD the per-host local
        arrays stitch into one global dp-sharded batch
        (multihost.global_batch).

        Returns (arrays, n_real_local, y_len, eos) — y_len/eos padded
        to match; eos (the per-utterance final target token,
        timit.lua:398) is None unless with_eos.
        """
        y_len = np.asarray(batch.y_len)
        if self.mesh is None:
            # NO np.asarray here: the Prefetcher's feeder thread already
            # put these on device (DeviceBatch) — a host round trip
            # would re-cross the (slow) host<->device link twice per
            # step and serialize the pipeline on it.
            arrs = (
                jnp.asarray(batch.x),
                jnp.asarray(batch.x_len),
                jnp.asarray(batch.y),
                jnp.asarray(batch.dec_mask),
            )
            n = arrs[0].shape[0]
            eos = None
            if with_eos:
                # eos = final target token (timit.lua:398)
                eos = arrs[2][jnp.arange(n), jnp.asarray(y_len) - 1]
            return arrs, n, y_len, eos
        arrs = (
            np.asarray(batch.x),
            np.asarray(batch.x_len),
            np.asarray(batch.y),
            np.asarray(batch.dec_mask),
        )
        n = arrs[0].shape[0]
        eos = None
        if with_eos:
            eos = arrs[2][np.arange(n), y_len - 1].astype(np.int32)
        dp = self.mesh.shape["dp"] // self.n_proc or 1
        b_pad = -(-n // dp) * dp
        if b_pad != n:
            k = b_pad - n
            rep = lambda a: np.concatenate([a, np.repeat(a[:1], k, axis=0)])
            x, x_len, y, dec_mask = (rep(a) for a in arrs)
            dec_mask = dec_mask.copy()
            dec_mask[n:] = 0.0  # dead rows
            arrs = (x, x_len, y, dec_mask)
            y_len = rep(y_len)
            if eos is not None:
                eos = rep(eos)
        if self.n_proc > 1:
            from ..parallel import multihost

            tree = arrs if eos is None else arrs + (eos,)
            tree = multihost.global_batch(self.mesh, tree)
            arrs, eos = tree[:4], (tree[4] if len(tree) == 5 else None)
        return arrs, n, y_len, eos

    def _batch_arrays(self, batch):
        return self._prepare_batch(batch)[0]

    # Device/host sync stride: metrics accumulate ON DEVICE and are read
    # back (forcing a sync) only every this many batches, so dispatch
    # stays ahead of the chip instead of serializing on a float() read
    # per step. The NaN tripwire fires with this granularity.
    SYNC_EVERY = 50

    _AGG_KEYS = ("loss", "nll", "correct", "total", "grad_norm", "penalty")

    def train_epoch(self, ds, batcher, epoch: int) -> Dict[str, float]:
        agg = {k: 0.0 for k in self._AGG_KEYS}
        t0 = time.time()
        n_batches, n_samples = self._train_pass(ds, batcher, epoch, agg)
        return self._train_row(agg, n_batches, n_samples,
                               time.time() - t0, epoch)

    def train_epoch_chunked(
        self, load_chunk, n_chunks: int, batcher_fn, epoch: int
    ) -> Dict[str, float]:
        """Out-of-core epoch: iterate the train chunks in a shuffled
        order with ONE chunk resident at a time (the reference's
        chunked LibriSpeech loop, librispeech/train.lua:82-103).

        load_chunk(i) -> Dataset; batcher_fn(ds) -> a batcher for it.
        """
        agg = {k: 0.0 for k in self._AGG_KEYS}
        t0 = time.time()
        nb = ns = 0
        order = np.random.RandomState(self.tcfg.seed + epoch).permutation(
            n_chunks
        )
        for k, ci in enumerate(order):
            ds = load_chunk(int(ci))
            b, s = self._train_pass(
                ds, batcher_fn(ds), epoch * 1000 + k, agg
            )
            nb += b
            ns += s
        return self._train_row(agg, nb, ns, time.time() - t0, epoch)

    def _train_row(self, agg, n_batches, n_samples, dt, epoch):
        row = {
            "epoch": epoch,
            "train_loss": agg["loss"] / max(n_batches, 1),
            "train_nll": agg["nll"] / max(n_batches, 1),
            "train_accuracy": agg["correct"] / max(agg["total"], 1.0),
            "grad_norm": agg["grad_norm"] / max(n_batches, 1),
            "penalty": agg["penalty"] / max(n_samples, 1),
            "train_seconds": dt,
            "train_samples_per_s": n_samples / max(dt, 1e-9),
        }
        # AWN observability (end-of-epoch posterior noise + |mu|): the
        # known failure mode is slow mu drain / sigma inflation under
        # the KL pull — visible here long before PER notices.
        for k in ("awn_sigma_rms", "param_norm"):
            if k in agg:
                row[k] = agg[k]
        return row

    def _train_pass(self, ds, batcher, epoch: int, agg) -> Tuple[int, int]:
        keys = self._AGG_KEYS
        agg_dev = None  # device-side running sums
        n_batches = 0
        n_samples = 0

        def drain():
            nonlocal agg_dev
            if agg_dev is not None:
                for k in keys:
                    agg[k] += float(agg_dev[k])
                agg_dev = None

        it = batcher.batches(
            ds, shuffle=True, seed=self.tcfg.seed + epoch,
            max_samples=self.tcfg.max_samples,
        )
        if self.tcfg.prefetch > 0:
            it = batching.Prefetcher(it, depth=self.tcfg.prefetch)
        for batch in it:
            self.state, m = self.step_fn(self.state, self._batch_arrays(batch))
            n_batches += 1
            n_samples += len(batch.uids)
            md = {k: m[k] for k in keys}
            agg_dev = md if agg_dev is None else jax.tree.map(
                jnp.add, agg_dev, md
            )
            if n_batches % self.SYNC_EVERY == 0:
                drain()
                if self.tcfg.nan_debug and not math.isfinite(agg["loss"]):
                    # TrainUtils.lua:55-93 tripwire parity: abort with
                    # the offending parameter paths, not train on.
                    from ..utils import debug as _dbg

                    bad = _dbg.find_nonfinite(self.state[0])
                    raise _dbg.NonFiniteError(
                        f"loss went non-finite by epoch {epoch} batch "
                        f"{n_batches} (uids {list(batch.uids)[:4]}...)",
                        bad or ["<params finite; non-finite loss only>"],
                    )
        drain()
        if n_batches and "awn_sigma_rms" in m:
            # end-of-epoch snapshot (one extra sync per epoch)
            agg["awn_sigma_rms"] = float(m["awn_sigma_rms"])
            agg["param_norm"] = float(m["param_norm"])
        if self.tcfg.nan_debug and not math.isfinite(agg["loss"]):
            from ..utils import debug as _dbg

            bad = _dbg.find_nonfinite(self.state[0])
            raise _dbg.NonFiniteError(
                f"loss went non-finite in epoch {epoch}",
                bad or ["<params finite; non-finite loss only>"],
            )
        return n_batches, n_samples

    def evaluate(self, ds, batcher, decode: bool = True) -> Dict[str, float]:
        """Teacher-forced NLL/accuracy + beam-search PER/CER
        (timit.lua:368-417)."""
        params = eval_params(self.tcfg, self.state[0])
        acc_dev = None  # device-side running sums (one sync at the end)
        dists, tlens = [], []
        dump_pred = (
            decode and self.tcfg.dump_predictions and self.save_dir
        )
        pred_rows = []  # (uids, pred, plen, scores, targets, tlen)
        t0 = time.time()
        first = True
        eval_it = batcher.batches(
            ds, shuffle=False, max_samples=self.tcfg.max_samples
        )
        if self.tcfg.prefetch > 0:
            eval_it = batching.Prefetcher(eval_it, depth=self.tcfg.prefetch)
        for batch in eval_it:
            if first:
                first = False
                self._maybe_dump_attention(params, batch)
            arrs, n_real, y_len, eos = self._prepare_batch(batch, with_eos=True)
            m = self.eval_fn(params, arrs)
            md = {k: m[k] for k in ("nll", "correct", "total", "n")}
            acc_dev = md if acc_dev is None else jax.tree.map(
                jnp.add, acc_dev, md
            )
            if decode:
                x, x_len, y, _ = arrs
                # The token buffer must hold factor*L hypotheses: the
                # LibriSpeech recipe decodes up to 2L steps
                # (librispeech/train.lua:251-252), which EXCEEDS the
                # padded input length — capping at L_pad would silently
                # chop the budget for any utterance longer than L_pad/2.
                cap = int(math.ceil(self.tcfg.eval_len_factor * x.shape[1]))
                res = self.decode_fn(params, x, x_len, eos, max_steps_cap=cap)
                # mesh decode results come back replicated/global: this
                # host scores ITS contiguous slice of the global batch
                off = jax.process_index() * len(y_len)
                sl = slice(off, off + n_real)
                pred = np.asarray(res.tokens)[sl]
                plen = np.asarray(res.lengths)[sl]
                if self.vocab is not None and batch.y39 is not None:
                    targets = np.asarray(batch.y39)
                    pred = self.vocab.map_ids_61_to_39(pred)
                else:
                    targets = np.asarray(batch.y)
                # corpus scoring via the native batch kernel
                # (native/editdist.cpp::asr_batch_edit_distance)
                d = metrics_lib.batch_edit_distance(
                    pred, plen, targets, batch.y_len
                )
                tl = np.maximum(np.asarray(batch.y_len), 1)
                dists.extend((d / tl).tolist())
                tlens.extend(tl.tolist())
                if dump_pred:
                    pred_rows.append((
                        list(batch.uids), pred, plen,
                        np.asarray(res.scores)[sl], targets,
                        np.asarray(batch.y_len),
                    ))
        if dump_pred and pred_rows:
            self._dump_predictions(pred_rows)
        acc = {k: float(v) for k, v in (acc_dev or {}).items()}
        out = {
            "valid_nll": acc.get("nll", 0.0) / max(acc.get("n", 0.0), 1.0),
            "valid_accuracy": acc.get("correct", 0.0)
            / max(acc.get("total", 0.0), 1.0),
            "valid_seconds": time.time() - t0,
        }
        if decode and dists:
            if self.n_proc > 1:
                # global PER: per-host (sum, count) pairs all-gathered so
                # every controller reports the same corpus mean
                from jax.experimental import multihost_utils

                agg = multihost_utils.process_allgather(
                    np.asarray([float(np.sum(dists)), float(len(dists))])
                )
                out["valid_per"] = float(
                    np.sum(agg[:, 0]) / max(np.sum(agg[:, 1]), 1.0)
                )
            else:
                out["valid_per"] = float(np.mean(dists))
        return out

    def _dump_predictions(self, rows):
        """Per-epoch beam-output dump — parity with predictions.t7
        (timit.lua:552: the whole valid set's decoded hypotheses saved
        every epoch; best-metric copies in fit()). One npz with the
        padded token matrices, lengths, scores, and targets."""
        m = max(r[1].shape[1] for r in rows)
        tm = max(r[4].shape[1] for r in rows)
        pad = lambda a, w: np.pad(a, ((0, 0), (0, w - a.shape[1])))
        np.savez(
            os.path.join(self.save_dir, f"predictions_epoch{self.epoch + 1}.npz"),
            uids=np.asarray([u for r in rows for u in r[0]]),
            tokens=np.concatenate([pad(r[1], m) for r in rows]),
            lengths=np.concatenate([r[2] for r in rows]),
            scores=np.concatenate([r[3] for r in rows]),
            targets=np.concatenate([pad(r[4], tm) for r in rows]),
            target_lengths=np.concatenate([r[5] for r in rows]),
        )

    def _copy_predictions(self, tag: str):
        """predictions_best_*.t7 parity (timit.lua:555-562): snapshot
        the current epoch's prediction dump under the best-metric name.

        With decode_every > 1 the best-metric epoch may not have written
        a dump; fall back to the most recent predictions_epoch*.npz (and
        log which one) so the best_* snapshot never silently goes stale
        relative to the checkpoint it accompanies."""
        if not (self.tcfg.dump_predictions and self.save_dir):
            return
        import glob
        import re
        import shutil

        src = os.path.join(self.save_dir, f"predictions_epoch{self.epoch}.npz")
        if not os.path.exists(src):
            cands = glob.glob(
                os.path.join(self.save_dir, "predictions_epoch*.npz")
            )
            key = lambda p: int(re.search(r"epoch(\d+)", p).group(1))
            cands = sorted((p for p in cands if re.search(r"epoch(\d+)", p)),
                           key=key)
            if not cands:
                return
            src = cands[-1]
            self.log.append({
                "epoch": self.epoch, "event": "predictions_fallback",
                "tag": tag, "source": os.path.basename(src),
            })
        shutil.copyfile(
            src, os.path.join(self.save_dir, f"predictions_{tag}.npz")
        )

    def _maybe_dump_attention(self, params, batch):
        """Per-epoch attention introspection dump — parity with the
        reference's HDF5 log fields (timit.lua:540-550): the alpha maps
        plus the Ws/Vh PROJECTIONS (decoder:Ws() = Ws(s_{t-1}) per
        output step and decoder.Vh.output = Vh(h) per encoder frame —
        graph introspection Attention.lua:214-250) and the output
        logprobs, for the first valid batch. Writes attn_epoch{N}.npz."""
        if not (self.tcfg.dump_attention and self.save_dir):
            return
        from ..ops import attention as attention_ops

        x, x_len, y, dec_mask = self._batch_arrays(batch)
        onehot = _one_hot_labels(y, dec_mask, self.model.output_depth)
        dec = params["decoder"]
        cfg = self.model.attention_cfg
        h, h_len = self.model.encode(params, x, x_len)
        out = attention_ops.decode_teacher_forced(
            dec, cfg, h, h_len, onehot, dec_mask, with_readout=False
        )
        logprobs = attention_ops.apply_readout(dec, cfg, out["s"], out["c"])
        # Ws(s_{t-1}): the state projection each step's energies used;
        # s_prev is the saved s sequence shifted right with zero init.
        s_prev = jnp.concatenate(
            [jnp.zeros_like(out["s"][:, :1]), out["s"][:, :-1]], axis=1
        )
        ws_proj = s_prev @ dec["ws"]["w"] + dec["ws"]["b"]
        vh_proj = attention_ops.precompute_vh(dec, h)
        np.savez(
            os.path.join(self.save_dir, f"attn_epoch{self.epoch + 1}.npz"),
            alpha=np.asarray(out["alpha"]),
            ws=np.asarray(ws_proj),  # (B, T, scoreDepth)
            vh=np.asarray(vh_proj),  # (B, L, scoreDepth)
            output=np.asarray(logprobs),
            uids=np.asarray(batch.uids),
            x_len=np.asarray(batch.x_len),
            y_len=np.asarray(batch.y_len),
        )

    # -- full fit -----------------------------------------------------------

    def fit(self, train_ds, valid_ds, batcher, *, resume: bool = False,
            decode_every: int = 1, on_nan: str = "raise",
            max_nan_restores: int = 3, chunked=None, ckpt_every: int = 1):
        """Epoch loop. on_nan: "raise" aborts on the NaN tripwire
        (reference behavior — a crash kills the run); "restore" rolls
        back to the last checkpoint with a reshuffled epoch seed and
        continues, up to `max_nan_restores` times — the elastic-recovery
        capability the reference lacks (SURVEY.md §5).

        ckpt_every: epochs between "latest" checkpoint writes (the
        reference saves every epoch, timit.lua:551 — keep 1 for parity;
        raise it when the save itself is a meaningful fraction of an
        epoch). Best-metric checkpoints always save.

        chunked: optional (load_chunk, n_chunks, batcher_fn) triple for
        out-of-core training (one chunk resident at a time,
        librispeech/train.lua:82-103); `train_ds` is ignored then and
        `batcher` only serves the validation pass."""
        if resume:
            self.resume()
        nan_restores = 0
        while self.epoch < self.tcfg.num_epochs:
            epoch = self.epoch + 1
            if epoch in self.optim_resets:
                # optimConfigResets: swap hyperparameters, keep params
                # (reference resets optimConfig/optimState per epoch,
                # timit.lua:496-502)
                new_ocfg = self.optim_resets[epoch]
                train_params, _, rng = self.state
                self._build(new_ocfg)
                self.state = (train_params, optim_lib.build_optimizer(new_ocfg).init(train_params), rng)
            try:
                if chunked is not None:
                    row = self.train_epoch_chunked(*chunked, epoch)
                else:
                    row = self.train_epoch(train_ds, batcher, epoch)
            except Exception as e:
                from ..utils import debug as _dbg

                recoverable = (
                    on_nan == "restore"
                    and isinstance(e, _dbg.NonFiniteError)
                    and nan_restores < max_nan_restores
                    and self.save_dir is not None
                )
                if not recoverable:
                    raise
                if not self.resume():
                    raise  # nothing checkpointed yet to roll back to
                nan_restores += 1
                self.log.append({
                    "epoch": epoch, "event": "nan_restore",
                    "restores": nan_restores, "detail": str(e)[:200],
                })
                # different shuffle on retry so a poison batch ordering
                # does not reproduce the blow-up deterministically
                self.tcfg = dataclasses.replace(
                    self.tcfg, seed=self.tcfg.seed + 101 * nan_restores
                )
                continue
            do_decode = decode_every > 0 and epoch % decode_every == 0
            row.update(self.evaluate(valid_ds, batcher, decode=do_decode))
            self.epoch = epoch
            self.log.append(row)
            if ckpt_every > 0 and (
                epoch % ckpt_every == 0 or epoch >= self.tcfg.num_epochs
            ):
                self.save_checkpoint("latest")
            if row["valid_accuracy"] > self.best["valid_accuracy"]:
                self.best["valid_accuracy"] = row["valid_accuracy"]
                self.save_checkpoint("best_valid_accuracy")
                self._copy_predictions("best_valid_accuracy")
            if row.get("valid_per", float("inf")) < self.best["valid_per"]:
                self.best["valid_per"] = row["valid_per"]
                self.save_checkpoint("best_valid_PER")
                self._copy_predictions("best_valid_PER")
            yield row
