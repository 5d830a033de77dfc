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
