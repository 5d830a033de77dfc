#!/usr/bin/env python3
"""Data-parallel scaling harness — throughput at dp = 1, 2, 4, ...
(BASELINE.json: audio-s/s reported at 1 chip / 1 host / >=2 hosts with
a linear-DP-scaling target; the reference is strictly single-GPU).

On real hardware this reports per-chip and aggregate audio-s/s over
the slice. Without a pod it still runs the FULL sharded step
(parallel/dp.py: replicated params, dp-sharded batch, XLA gradient
psum) on a virtual CPU mesh — validating that the collective program
scales structurally; CPU "chips" share host cores, so the absolute
curve is only meaningful on TPUs. Writes one JSON with the curve.

Usage:
  python tools/dp_scaling.py --out runs/dp_scaling.json \
      [--dps 1,2,4,8] [--cpu-devices 8] [--steps 20] [--small]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--dps", default="1,2,4,8")
    ap.add_argument("--cpu-devices", type=int, default=0,
                    help=">0 forces a virtual CPU platform with N devices")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--per-chip-batch", type=int, default=16)
    ap.add_argument("--small", action="store_true")
    args = ap.parse_args()

    if args.cpu_devices:
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.cpu_devices)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from seq2seq_attention_asr_tpu.models import registry
    from seq2seq_attention_asr_tpu.parallel import dp as dp_lib
    from seq2seq_attention_asr_tpu.parallel import make_mesh
    from seq2seq_attention_asr_tpu.train import optim as optim_lib
    from seq2seq_attention_asr_tpu.train import trainer as trainer_lib

    dims = (
        dict(hidden_frame_size=32, output_frame_size=32, score_depth=64,
             state_depth=32, mlp_depth=16)
        if args.small
        else dict(hidden_frame_size=256, output_frame_size=256,
                  score_depth=512, state_depth=256, mlp_depth=64)
    )
    model = registry.build(
        "chorowski", input_frame_size=123, output_depth=62,
        feature_maps=0, filt_size=10,
        compute_dtype="float32" if args.small else "bfloat16",
        scan_unroll=4, **dims,
    )
    tcfg = trainer_lib.TrainConfig(normalize_nll=True)
    ocfg = optim_lib.OptimConfig()
    tx = optim_lib.build_optimizer(ocfg)
    init_fn = trainer_lib.make_init_fn(tx, tcfg)

    l, t = (48, 16) if args.small else (144, 56)
    rng = np.random.RandomState(0)
    rows = []
    for dp in [int(d) for d in args.dps.split(",")]:
        if dp > len(jax.devices()):
            print(f"dp={dp}: skipped ({len(jax.devices())} devices)", flush=True)
            continue
        mesh = make_mesh(dp=dp, sp=1, devices=jax.devices()[:dp])
        step = dp_lib.make_sharded_train_step(model, tx, tcfg, ocfg, mesh)
        b = args.per_chip_batch * dp
        x = jnp.asarray(rng.randn(b, l, 123), jnp.float32)
        x_len = jnp.asarray(np.full(b, l, np.int32))
        y = jnp.asarray(rng.randint(0, 62, (b, t)))
        dm = jnp.ones((b, t), jnp.float32)
        batch = (x, x_len, y, dm)
        state = init_fn(model.init(jax.random.PRNGKey(0)), jax.random.PRNGKey(1))
        for _ in range(3):
            state, m = step(state, batch)
        float(m["nll"])
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, m = step(state, batch)
        float(m["nll"])
        dt = time.perf_counter() - t0
        audio = b * l * 512.0 / 16000.0 * args.steps
        row = {
            "dp": dp,
            "global_batch": b,
            "audio_s_per_s": round(audio / dt, 2),
            "audio_s_per_s_per_chip": round(audio / dt / dp, 2),
            "step_ms": round(dt / args.steps * 1e3, 2),
        }
        rows.append(row)
        print(row, flush=True)
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(
                {"backend": jax.default_backend(),
                 "devices": len(jax.devices()),
                 "model": dims, "curve": rows},
                f, indent=1,
            )
    if len(rows) > 1:
        s = rows[-1]["audio_s_per_s"] / rows[0]["audio_s_per_s"]
        print(f"scaling {rows[0]['dp']}->{rows[-1]['dp']}: {s:.2f}x", flush=True)


if __name__ == "__main__":
    main()
