#!/usr/bin/env python3
"""Train-step time decomposition on one chip — where the non-MFU time
goes (VERDICT r2 Weak #3: "MFU 0.222 with no breakdown").

Times each pipeline stage at the bench shapes by chaining N dependent
executions inside ONE jit (a lax.scan whose carry feeds the next
iteration's input), so the axon tunnel's ~1 ms per-dispatch floor is
amortized away and XLA cannot CSE the repeats:

  encoder      3x BiGRU scan (fused Pallas gru_scan)
  decoder      teacher-forced attention scan (fused attention_scan)
  readout+loss readout MLP + masked NLL
  forward      the whole loss fn
  fwd+grad     jax.value_and_grad of it
  full step    grad + adadelta + colnorm (the bench step)

Derived: backward = fwd+grad - forward, optimizer = step - fwd+grad.
For each stage the analytic matmul-FLOP and HBM-byte counts give the
MXU-roofline and bandwidth-roofline floors; the gap to the measured
time is sequential-bubble/launch overhead. Writes one JSON; the
interpretation lives in docs/PERF.md.

Usage: python tools/perf_breakdown.py --out runs/perf_breakdown.json
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

HOP, SR = 512, 16000.0
PEAK_BF16 = {"v4": 275e12, "v5e": 197e12, "v5p": 459e12, "v6e": 918e12}
HBM_GBS = {"v4": 1228e9, "v5e": 819e9, "v5p": 2765e9, "v6e": 1638e9}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--b", type=int, default=128)
    ap.add_argument("--l", type=int, default=144)
    ap.add_argument("--t", type=int, default=56)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from seq2seq_attention_asr_tpu.models import registry
    from seq2seq_attention_asr_tpu.ops import attention as att_ops
    from seq2seq_attention_asr_tpu.train import optim as optim_lib
    from seq2seq_attention_asr_tpu.train import trainer as trainer_lib

    b, l, t = args.b, args.l, args.t
    dims = dict(input=123, hidden=256, out_frame=256, score=512,
                state=256, mlp=64, vocab=62)
    model = registry.build(
        "chorowski", input_frame_size=123, hidden_frame_size=256,
        output_frame_size=256, score_depth=512, state_depth=256,
        mlp_depth=64, output_depth=62, feature_maps=0, filt_size=10,
        mono_align=True, penalty_lambda=0.0, scan_unroll=8,
        compute_dtype="bfloat16",
    )
    tcfg = trainer_lib.TrainConfig(normalize_nll=True)
    ocfg = optim_lib.OptimConfig(colnorm=True, colnorm_maxval=1.0)
    tx = optim_lib.build_optimizer(ocfg)
    init_fn, step_fn = trainer_lib.make_train_step(
        model.forward, tx, ocfg, tcfg, 62
    )

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, l, 123), jnp.float32)
    x_len = jnp.asarray(np.full(b, l, np.int32))
    y = jnp.asarray(rng.randint(0, 62, (b, t)))
    dec_mask = jnp.ones((b, t), jnp.float32)
    onehot = jax.nn.one_hot(y, 62) * dec_mask[..., None]
    params = model.init(jax.random.PRNGKey(0))
    state = init_fn(params, jax.random.PRNGKey(1))
    h0, hlen0 = model.encode(params, x, x_len)
    cfg = model.attention_cfg

    reps = args.reps

    def timed(make_body, label):
        """Chain `reps` dependent executions in one jit: the scan carry
        (a scalar derived from each iteration's output) perturbs the
        next input by exactly 0.0, forcing true sequential execution."""

        @jax.jit
        def many(c0):
            def body(c, _):
                out = make_body(c)
                leaf = jax.tree.leaves(out)[0]
                return (leaf.reshape(-1)[0].astype(jnp.float32) * 0.0 + c,
                        ())

            c, _ = jax.lax.scan(body, c0, None, length=reps)
            return c

        float(many(jnp.float32(0.0)))  # compile + warmup
        t0 = time.perf_counter()
        v = many(jnp.float32(0.0))
        float(v)
        dt = (time.perf_counter() - t0) / reps
        print(f"{label:14s} {dt * 1e3:8.3f} ms", flush=True)
        return dt

    jit0 = lambda a, c: a + jnp.zeros((), a.dtype) * c.astype(a.dtype)

    t_enc = timed(lambda c: model.encode(params, jit0(x, c), x_len)[0],
                  "encoder")
    t_dec = timed(
        lambda c: att_ops.decode_teacher_forced(
            params["decoder"], cfg, jit0(h0, c), hlen0, onehot, dec_mask,
            unroll=8, with_readout=False,
        )["s"],
        "decoder(scan)",
    )
    t_dec_ro = timed(
        lambda c: att_ops.decode_teacher_forced(
            params["decoder"], cfg, jit0(h0, c), hlen0, onehot, dec_mask,
            unroll=8, with_readout=True,
        )["logprobs"],
        "decoder+readout",
    )

    def loss_fn(p, xx):
        out = model.forward(p, xx, x_len, onehot, dec_mask,
                            dropout_rng=None, train=True)
        per = -jnp.sum(onehot * out["logprobs"], axis=-1) * dec_mask
        return jnp.mean(jnp.sum(per, -1) / jnp.sum(dec_mask, -1))

    t_fwd = timed(lambda c: loss_fn(params, jit0(x, c)), "forward")

    # The timing carry must consume EVERY output of the stage, or XLA
    # dead-code-eliminates the unconsumed compute: consuming only one
    # grad leaf drops the encoder backward entirely, and consuming only
    # m["loss"] from the train step drops the whole backward+optimizer
    # (measured: "full step" 3.3 ms == forward, vs 9.4 ms for real
    # steps in bench.py). Tree-reduce everything into the carry; the
    # extra full-pytree sum is ~25 MB of HBM reads, ~0.03 ms.
    tsum = lambda tree: jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda l: jnp.sum(l.astype(jnp.float32)), tree),
    )
    t_grad = timed(
        lambda c: tsum(jax.grad(loss_fn)(params, jit0(x, c))),
        "fwd+grad",
    )

    def full_step(c):
        st, m = step_fn(state, (jit0(x, c), x_len, y, dec_mask))
        return tsum(st) + m["loss"]

    t_step = timed(full_step, "full step")

    # analytic floors (bf16 matmul FLOPs; HBM bytes: weights re-fetched
    # per scan iteration + activations in/out once)
    import bench

    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "v5e")
    peak, bw = PEAK_BF16[gen], HBM_GBS[gen]
    fl = bench.model_flops_per_sample(l, t, dims)
    h, a, s, st_d, v, mlp = (dims["hidden"], 2 * dims["out_frame"],
                             dims["score"], dims["state"], dims["vocab"],
                             dims["mlp"])
    gru_w = lambda xd: (h + xd) * 3 * h
    enc_w_bytes = 2 * (gru_w(123) + gru_w(2 * h) + gru_w(2 * h)) * 2
    dec_w_bytes = (st_d * s + l * 0 + a * st_d + v * st_d
                   + 2 * st_d * st_d * 3 + (st_d + a) * mlp * 7
                   + mlp * v) * 2
    enc_flops = b * l * 2 * (gru_w(123) + gru_w(2 * h) + gru_w(2 * h))
    dec_flops = b * fl - enc_flops  # remainder incl. Vh + readout
    rows = {
        "shapes": {"b": b, "l": l, "t": t, "dtype": "bfloat16"},
        "tpu_gen": gen,
        "measured_ms": {
            "encoder": t_enc * 1e3,
            "decoder_scan": t_dec * 1e3,
            "decoder_with_readout": t_dec_ro * 1e3,
            "forward": t_fwd * 1e3,
            "fwd_grad": t_grad * 1e3,
            "full_step": t_step * 1e3,
            "backward_derived": (t_grad - t_fwd) * 1e3,
            "optimizer_derived": (t_step - t_grad) * 1e3,
        },
        "floors_ms": {
            # MXU floor: analytic matmul FLOPs / peak
            "encoder_mxu": enc_flops / peak * 1e3,
            "decoder_mxu": dec_flops / peak * 1e3,
            # sequential weight-stream floor: every scan step re-reads
            # the cell weights from VMEM (resident) — HBM floor instead
            # counts one weight fetch + activations per pass
            "encoder_hbm": (enc_w_bytes + b * l * (123 + 6 * h) * 4)
            / bw * 1e3,
            "decoder_hbm": (dec_w_bytes + b * (l * (a + s) + t * (st_d + a + v)) * 2)
            / bw * 1e3,
        },
        "mfu_fwd_only": b * fl / peak / t_fwd,
        "mfu_train_step": 3.0 * b * fl / peak / t_step,
        "seq_steps": {"encoder": l, "decoder": t},
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)
    print(json.dumps(rows["measured_ms"]), flush=True)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    # one chip client at a time (CLAUDE.md; utils/lease.py)
    from seq2seq_attention_asr_tpu.utils.lease import chip_lease

    with chip_lease("perf_breakdown.py"):
        main()
