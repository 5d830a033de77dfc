"""End-to-end learning-quality harness (VERDICT r1 top item: nothing
previously demonstrated that the recipe LEARNS).

Memorization benchmark: train the flagship Chorowski recipe (BiGRU
encoder + content+state attention + GRU decoder + maxout readout +
adadelta, the reference's canonical configuration at
/root/reference/timit/model_chorowski_baseline.lua +
exp_logmel7_chorowski_normNLL_colnorm.lua) on a tiny synthetic
phone-emission corpus until beam-search PER < 5%. A model that cannot
learn alignment, per-phone identity, and EOS termination cannot pass;
calibration runs converge to PER = 0.0 with exact beam matches by
~epoch 250. The full-size trajectory harness is tools/convergence.py.
"""

import time

import jax
import numpy as np
import pytest

from seq2seq_attention_asr_tpu.data import batching, synthetic
from seq2seq_attention_asr_tpu.models import registry
from seq2seq_attention_asr_tpu.train import optim as optim_lib
from seq2seq_attention_asr_tpu.train import trainer as trainer_lib


def test_memorization_beam_per_under_5pct():
    train, _, v = synthetic.train_valid(
        12, 2, n_phones=7, feat_dim=16, min_len=3, max_len=6, seed=0
    )
    model = registry.build(
        "chorowski", input_frame_size=16, hidden_frame_size=32,
        output_frame_size=32, score_depth=32, state_depth=32, mlp_depth=24,
        output_depth=v, feature_maps=0, filt_size=5,
    )
    tcfg = trainer_lib.TrainConfig(
        num_epochs=400, batch_size=6, normalize_nll=True, beam_k=3,
        prefetch=0,
    )
    tr = trainer_lib.Trainer(model, optim_lib.OptimConfig(maxnorm=100.0), tcfg)
    tr.init(model.init(jax.random.PRNGKey(0)))
    batcher = batching.BucketedBatcher.from_dataset(train, 6, n_buckets=1)
    best = float("inf")
    for row in tr.fit(train, train, batcher, decode_every=25):
        if "valid_per" in row:
            best = min(best, row["valid_per"])
            if best < 0.05:
                break
    assert best < 0.05, (
        f"beam-search PER never dropped below 5% (best {best:.3f}) — "
        "the recipe is not learning end to end"
    )
    # the winning hypotheses actually match the targets token for token
    params = trainer_lib.eval_params(tcfg, tr.state[0])
    import jax.numpy as jnp

    b = next(batcher.batches(train))
    x, xl, y = jnp.asarray(b.x), jnp.asarray(b.x_len), np.asarray(b.y)
    eos = y[np.arange(len(y)), np.asarray(b.y_len) - 1]
    res = tr.decode_fn(params, x, xl, jnp.asarray(eos), max_steps_cap=int(x.shape[1]))
    exact = sum(
        int(b.y_len[i]) == int(res.lengths[i])
        and np.array_equal(
            y[i][: b.y_len[i]], np.asarray(res.tokens[i])[: int(res.lengths[i])]
        )
        for i in range(len(y))
    )
    assert exact >= len(y) - 1, f"only {exact}/{len(y)} exact beam matches"
