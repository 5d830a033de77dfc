"""Experiment configs — typed replacement for the reference's global
`opt`-table exp files (L8: exp_logmel7_chorowski_normNLL_colnorm.lua,
exp0_scriptchecker.lua).

An Experiment bundles model choice + model kwargs + TrainConfig +
OptimConfig + data location, and can self-archive its defining source
into the run directory for reproducibility (the reference exp files
copy their own .lua sources, exp_logmel7:16-22)."""

from __future__ import annotations

import dataclasses
import json
import os
import shutil
from typing import Any, Dict, Optional

from . import optim as optim_lib
from .trainer import TrainConfig


@dataclasses.dataclass
class Experiment:
    name: str
    model: str = "chorowski"  # registry name
    model_kwargs: Dict[str, Any] = dataclasses.field(default_factory=dict)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    optim: optim_lib.OptimConfig = dataclasses.field(
        default_factory=optim_lib.OptimConfig
    )
    data_path: Optional[str] = None  # HDF5 dir/file or corpus root
    save_dir: Optional[str] = None
    init_std: Optional[float] = None  # autoencoder:reset(std)
    orthogonalize: bool = True  # TrainUtils.orthogonalizeGraph
    optim_resets: Dict[int, optim_lib.OptimConfig] = dataclasses.field(
        default_factory=dict
    )

    def build_model(self):
        from ..models import registry

        return registry.build(self.model, **self.model_kwargs)

    def init_params(self, key):
        import jax

        from . import initializers

        model = self.build_model()
        params = model.init(key)
        if self.init_std is not None:
            key, sub = jax.random.split(key)
            params = initializers.gaussian_reset(sub, params, self.init_std)
        if self.orthogonalize:
            params = initializers.orthogonalize_params(params)
        return params

    def archive(self, source_file: Optional[str] = None) -> None:
        """Copy the defining config source + a JSON dump into save_dir."""
        if not self.save_dir:
            return
        os.makedirs(self.save_dir, exist_ok=True)
        if source_file and os.path.exists(source_file):
            shutil.copy(source_file, self.save_dir)
        with open(os.path.join(self.save_dir, "experiment.json"), "w") as f:
            json.dump(dataclasses.asdict(self), f, indent=2, default=str)


def timit_chorowski_normnll_colnorm(
    data_path: Optional[str] = None, save_dir: Optional[str] = None
) -> Experiment:
    """The canonical TIMIT recipe
    (exp_logmel7_chorowski_normNLL_colnorm.lua:24-41): adadelta(0.95,
    1e-8), normalized NLL, column-norm constraint maxval 1, clip off,
    orthogonal init, no weight/grad noise, beam K=5. Batch semantics
    adapted: the reference runs batchSize 1."""
    return Experiment(
        name="exp_logmel7_chorowski_normNLL_colnorm",
        model="chorowski",
        model_kwargs=dict(
            input_frame_size=123, hidden_frame_size=256, output_frame_size=256,
            score_depth=512, state_depth=256, mlp_depth=64, output_depth=62,
            feature_maps=0, filt_size=10, mono_align=True,
        ),
        train=TrainConfig(
            num_epochs=100, batch_size=16, normalize_nll=True, beam_k=5,
        ),
        optim=optim_lib.OptimConfig(
            rho=0.95, eps=1e-8, maxnorm=1e20, weight_decay=0.0,
            gradnoise_eta=0.0, colnorm=True, colnorm_maxval=1.0,
        ),
        data_path=data_path,
        save_dir=save_dir,
        orthogonalize=True,
    )


def timit_chorowski_dropout(**kw) -> Experiment:
    """model_chorowski_baseline_dropout.lua variant."""
    exp = timit_chorowski_normnll_colnorm(**kw)
    exp.name = "exp_chorowski_dropout"
    exp.model_kwargs["dropout"] = 0.5
    return exp


def librispeech_chorowski(
    num_chars: int, data_path: Optional[str] = None, save_dir: Optional[str] = None
) -> Experiment:
    """librispeech/model_chorowski_baseline.lua: same architecture with
    numchars outputs, CER eval with maxseqlen = 2L
    (librispeech/train.lua:251-252)."""
    exp = timit_chorowski_normnll_colnorm(data_path=data_path, save_dir=save_dir)
    exp.name = "exp_librispeech_chorowski"
    exp.model_kwargs["output_depth"] = num_chars
    exp.train = dataclasses.replace(exp.train, eval_len_factor=2.0)
    return exp


def librispeech_chorowski_words(
    num_words: int, data_path: Optional[str] = None, save_dir: Optional[str] = None
) -> Experiment:
    """Word-target LibriSpeech recipe (opt.labelset = 'words',
    librispeech/train.lua:28 + utils_librispeech.lua:49-66): identical
    architecture, output layer sized to the word vocabulary, WER
    scoring (the generic edit-distance metric over word ids)."""
    exp = librispeech_chorowski(
        num_chars=num_words, data_path=data_path, save_dir=save_dir
    )
    exp.name = "exp_librispeech_chorowski_words"
    return exp


def timit_conv_bilstm(
    data_path: Optional[str] = None, save_dir: Optional[str] = None
) -> Experiment:
    """The inline TIMIT conv+BiLSTM model (timit/timit.lua:98-169):
    3x(conv k=3 + ReLU + maxpool 2) 8x time downsampling, BiLSTM(256,128),
    LSTM decoder, location-aware attention featMaps=16 filt=5."""
    return Experiment(
        name="exp_timit_conv_bilstm",
        model="conv_bilstm",
        model_kwargs=dict(
            input_frame_size=123, hidden_frame_size=256, output_frame_size=128,
            kw=3, score_depth=150, filt_size=5, feature_maps=16,
            state_depth=400, output_depth=62,
        ),
        train=TrainConfig(num_epochs=100, batch_size=16, normalize_nll=True, beam_k=5),
        optim=optim_lib.OptimConfig(rho=0.95, eps=1e-8, maxnorm=1e20),
        data_path=data_path,
        save_dir=save_dir,
        orthogonalize=True,
    )


def librispeech_vgg(
    num_chars: int, data_path: Optional[str] = None, save_dir: Optional[str] = None
) -> Experiment:
    """librispeech/model_vgg.lua: VGG conv encoder on 3-channel stacked
    logmel, annotationDepth = outputFrameSize (:63), two-layer maxout
    readout (:74-82)."""
    return Experiment(
        name="exp_librispeech_vgg",
        model="vgg",
        model_kwargs=dict(
            input_frame_size=40, output_frame_size=512, score_depth=512,
            filt_size=10, feature_maps=0, state_depth=256, mlp_depth=64,
            output_depth=num_chars,
        ),
        train=TrainConfig(
            num_epochs=100, batch_size=16, normalize_nll=True, beam_k=5,
            eval_len_factor=2.0,
        ),
        optim=optim_lib.OptimConfig(
            rho=0.95, eps=1e-8, colnorm=True, colnorm_maxval=1.0
        ),
        data_path=data_path,
        save_dir=save_dir,
        orthogonalize=True,
    )


def scriptchecker(save_dir: Optional[str] = None) -> Experiment:
    """exp0_scriptchecker.lua: tiny end-to-end smoke config (3 samples,
    small model, gaussian+orthogonal init)."""
    return Experiment(
        name="exp0_scriptchecker",
        model="chorowski",
        model_kwargs=dict(
            input_frame_size=123, hidden_frame_size=32, output_frame_size=32,
            score_depth=32, state_depth=32, mlp_depth=16, output_depth=30,
            feature_maps=0, filt_size=10,
        ),
        train=TrainConfig(
            num_epochs=2, batch_size=2, normalize_nll=True, beam_k=3,
            max_samples=3, eval_len_factor=2.0,
        ),
        optim=optim_lib.OptimConfig(colnorm=True),
        save_dir=save_dir,
        init_std=0.01,
        orthogonalize=True,
    )


def run_cli(builder, dataset: str, argv=None, source_file: Optional[str] = None):
    """Shared CLI runner for experiment config scripts (configs/exp_*.py)
    and tools/train.py — the equivalent of the reference's
    `dofile(modelfile); dofile(trainfile)` bottom half
    (exp_logmel7_chorowski_normNLL_colnorm.lua:42-50).

    dataset: "timit" | "librispeech" | "scriptchecker". The builder is
    called with (data_path=..., save_dir=...) plus num_chars=... for
    LibriSpeech experiments.
    """
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True)
    ap.add_argument("--save", default=None)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--max-samples", type=int, default=None)
    ap.add_argument("--decode-every", type=int, default=1)
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--dp", type=int, default=0,
                    help="data-parallel mesh axis (0 = unsharded driver)")
    ap.add_argument("--sp", type=int, default=1,
                    help="sequence-sharding mesh axis (needs --dp)")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from ..data import batching
    from ..data import librispeech as ls
    from ..data import timit as timit_data
    from .trainer import Trainer

    vocab = None
    chunked = None
    if dataset == "timit":
        exp = builder(data_path=args.data, save_dir=args.save)
        train_ds = timit_data.load_hdf5(os.path.join(args.data, "train.h5"))
        valid_ds = timit_data.load_hdf5(os.path.join(args.data, "valid.h5"))
        vocab = timit_data.Vocab.standard()
    elif dataset == "librispeech":
        meta = ls.load_meta(args.data)
        # output depth follows the labelset the chunks were built with
        # (meta.txt numchars/numwords, utils_librispeech.lua:38-46)
        n_out = (
            meta["numwords"]
            if meta.get("labelset_words", 0)
            else meta["numchars"]
        )
        exp = builder(n_out, data_path=args.data, save_dir=args.save)
        # Out-of-core: one chunk resident at a time, shuffled chunk
        # order per epoch (librispeech/train.lua:82-103).
        chunk_paths = ls.load_manifest(args.data)
        load_chunk = lambda i: timit_data.load_hdf5(chunk_paths[i])
        train_ds = load_chunk(0)  # shapes/vocab probing only
        if len(chunk_paths) > 1:
            chunked = (
                load_chunk,
                len(chunk_paths),
                lambda ds: batching.BucketedBatcher.from_dataset(
                    ds, batch_size=exp.train.batch_size
                ),
            )
        valid_ds = timit_data.load_hdf5(os.path.join(args.data, "valid.h5"))
    elif dataset == "scriptchecker":
        exp = builder(save_dir=args.save)
        train_ds = timit_data.load_hdf5(os.path.join(args.data, "train.h5"))
        valid_ds = timit_data.load_hdf5(os.path.join(args.data, "valid.h5"))
        # size the output layer to the data's label space (out-of-range
        # ids would silently one-hot to zero rows)
        vmax = int(max(int(y.max()) for y in train_ds.y + valid_ds.y)) + 1
        exp.model_kwargs["output_depth"] = max(
            exp.model_kwargs.get("output_depth", 0), vmax
        )
        if train_ds.y39 is not None:
            vocab = timit_data.Vocab.standard()
    else:
        raise ValueError(dataset)

    if args.epochs:
        exp.train = dataclasses.replace(exp.train, num_epochs=args.epochs)
    if args.batch_size:
        exp.train = dataclasses.replace(exp.train, batch_size=args.batch_size)
    if args.max_samples:
        exp.train = dataclasses.replace(exp.train, max_samples=args.max_samples)
    # frame size: last axis for flat (L, D) features, the freq axis for
    # channel-stacked (L, freq, C) features (VGG NHWC input)
    x0 = train_ds.x[0]
    frame_size = int(x0.shape[-2] if x0.ndim == 3 else x0.shape[-1])
    if exp.model_kwargs.get("input_frame_size") != frame_size:
        exp.model_kwargs["input_frame_size"] = frame_size
    exp.archive(source_file)

    mesh = None
    if args.dp or args.sp > 1:
        from ..parallel import make_mesh

        mesh = make_mesh(dp=args.dp or None, sp=args.sp)
    model = exp.build_model()
    params = exp.init_params(jax.random.PRNGKey(exp.train.seed))
    tr = Trainer(
        model, exp.optim, exp.train, vocab=vocab, save_dir=exp.save_dir,
        optim_resets=exp.optim_resets, mesh=mesh,
    )
    tr.init(params)
    batcher = batching.BucketedBatcher.from_dataset(
        train_ds, batch_size=exp.train.batch_size
    )
    for row in tr.fit(
        train_ds, valid_ds, batcher, resume=args.resume,
        decode_every=args.decode_every, chunked=chunked,
    ):
        keys = ("epoch", "train_nll", "train_accuracy", "valid_nll",
                "valid_accuracy", "valid_per", "train_seconds",
                "train_samples_per_s")
        print(
            "  ".join(
                f"{k}={row[k]:.4f}" if isinstance(row.get(k), float)
                else f"{k}={row.get(k)}"
                for k in keys if k in row
            ),
            flush=True,
        )
    return tr
