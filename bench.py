"""Benchmark: Chorowski-baseline training throughput on one chip.

Prints ONE JSON line:
  {"metric": "train_audio_s_per_s_per_chip", "value": N,
   "unit": "audio-s/s/chip", "vs_baseline": N}

Metric: seconds of audio processed per wall-clock second per chip while
running full training steps (forward + BPTT + adadelta update) on the
reference-recipe model (123-dim log-mel input, 3x BiGRU-256 encoder,
location-aware attention decoder, 62-way output — the
exp_logmel7_chorowski recipe shape). Audio seconds follow the
front-end's 512-sample hop at 16 kHz (preprocess_timit.py:196: hop=512).

vs_baseline is against BASELINE.json's throughput target definition:
the reference publishes no numbers (BASELINE.md), so the baseline unit
is real-time (1.0 audio-second per second per chip) — the natural floor
for a single-GPU batch-1 Torch recipe; values >> 1 are the batched
TPU win.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from seq2seq_attention_asr_tpu.models import registry
    from seq2seq_attention_asr_tpu.train import optim as optim_lib
    from seq2seq_attention_asr_tpu.train import trainer as trainer_lib

    # Reference-recipe model (timit/model_chorowski_baseline.lua +
    # exp_logmel7_chorowski_normNLL_colnorm.lua). Mixed precision:
    # bf16 compute with f32 master params/carries/log-softmax — the
    # per-step NLL trajectory matches float32 to 4 decimals on this
    # recipe (see BASELINE.md), so this is the production operating
    # point, not a benchmark special.
    model = registry.build(
        "chorowski",
        input_frame_size=123,
        hidden_frame_size=256,
        output_frame_size=256,
        score_depth=512,
        state_depth=256,
        mlp_depth=64,
        output_depth=62,
        feature_maps=0,
        filt_size=10,
        mono_align=True,
        penalty_lambda=0.0,
        scan_unroll=8,
        compute_dtype="bfloat16",
    )
    tcfg = trainer_lib.TrainConfig(normalize_nll=True)
    ocfg = optim_lib.OptimConfig(colnorm=True, colnorm_maxval=1.0)
    tx = optim_lib.build_optimizer(ocfg)
    init_fn, step_fn = trainer_lib.make_train_step(
        model.forward, tx, ocfg, tcfg, model.output_depth
    )
    step_jit = jax.jit(step_fn, donate_argnums=0)

    b, l, t = 128, 144, 56  # TIMIT-ish padded shapes (~4.6 s audio each)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, l, 123), jnp.float32)
    x_len = jnp.asarray(np.full(b, l, np.int32))
    y = jnp.asarray(rng.randint(0, 62, (b, t)))
    dec_mask = jnp.ones((b, t), jnp.float32)
    batch = (x, x_len, y, dec_mask)

    params = model.init(jax.random.PRNGKey(0))
    state = init_fn(params, jax.random.PRNGKey(1))

    # warmup / compile
    for _ in range(3):
        state, m = step_jit(state, batch)
    float(m["loss"])

    # Timing: steps chain through the donated train state, so the device
    # must run them sequentially; fetching the FINAL step's loss value
    # proves the whole chain executed. (On the tunneled axon platform
    # `jax.block_until_ready` returns before the computation finishes,
    # so a value read is the only trustworthy sync — but reading it
    # EVERY step would add a host<->device round trip per step that is
    # not part of device throughput.)
    n_steps = 100
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, m = step_jit(state, batch)
    float(m["loss"])
    dt = time.perf_counter() - t0

    audio_s_per_batch = b * l * 512.0 / 16000.0
    value = audio_s_per_batch * n_steps / dt
    print(
        json.dumps(
            {
                "metric": "train_audio_s_per_s_per_chip",
                "value": round(value, 2),
                "unit": "audio-s/s/chip",
                "vs_baseline": round(value / 1.0, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
