#!/usr/bin/env python3
"""Multi-host SPMD launch recipe — runnable without a pod.

Every host runs THIS script (the standard JAX multi-controller model).
It wires jax.distributed, shards the dataset per host
(parallel/multihost.host_shard), assembles global dp-sharded batches
from host-local arrays (multihost.global_batch), and runs real sharded
train steps (parallel/dp.py) over the global mesh — the workflow a
TPU pod uses verbatim (there the launcher sets the coordinator env and
the backend is "tpu"; nothing else changes).

Single-machine demo (2 simulated hosts x 2 CPU devices each):

  python tools/multihost_demo.py --launch 2 --local-devices 2

which re-execs itself as N worker processes:

  python tools/multihost_demo.py --process-id I --num-processes N \
      --coordinator 127.0.0.1:29501 --local-devices 2 --cpu

exercised by tests/test_multihost.py::test_two_process_demo.
"""

import argparse
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def worker(args):
    if args.cpu:
        import jax

        # force the CPU platform even where a TPU plugin is on the
        # path, give each process `local_devices` virtual devices, and
        # use gloo for cross-process CPU collectives
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.local_devices)
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    import jax

    from seq2seq_attention_asr_tpu.parallel import multihost

    multihost.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    assert jax.process_count() == args.num_processes, (
        jax.process_count(), args.num_processes
    )

    import jax.numpy as jnp
    import numpy as np

    from seq2seq_attention_asr_tpu.data import batching, synthetic
    from seq2seq_attention_asr_tpu.models import registry
    from seq2seq_attention_asr_tpu.parallel import dp as dp_lib
    from seq2seq_attention_asr_tpu.parallel import make_mesh
    from seq2seq_attention_asr_tpu.train import optim as optim_lib
    from seq2seq_attention_asr_tpu.train import trainer as trainer_lib

    # identical corpus everywhere; each host takes its deterministic slice
    ds, _, v = synthetic.make_corpus(
        32, n_phones=5, feat_dim=8, min_len=2, max_len=4, seed=0
    )
    local_ds = multihost.host_shard(ds)
    mesh = make_mesh(dp=jax.device_count(), sp=1)

    model = registry.build(
        "chorowski", input_frame_size=8, hidden_frame_size=8,
        output_frame_size=8, score_depth=8, state_depth=8, mlp_depth=8,
        output_depth=v, feature_maps=0, filt_size=5,
    )
    tcfg = trainer_lib.TrainConfig(normalize_nll=True)
    ocfg = optim_lib.OptimConfig()
    tx = optim_lib.build_optimizer(ocfg)
    step = dp_lib.make_sharded_train_step(model, tx, tcfg, ocfg, mesh)
    state = trainer_lib.make_init_fn(tx, tcfg)(
        model.init(jax.random.PRNGKey(0)), jax.random.PRNGKey(1)
    )

    # every host pads its local shard identically, then the local
    # arrays stitch into one global dp-sharded batch
    per_host = len(local_ds)
    batcher = batching.BucketedBatcher(l_buckets=[32], batch_size=per_host)
    losses = []
    for _ in range(2):
        for b in batcher.batches(local_ds):
            batch = multihost.global_batch(
                mesh, (b.x, b.x_len.astype(np.int32), b.y, b.dec_mask)
            )
            state, m = step(state, batch)
            losses.append(float(m["nll"]))
    print(
        f"proc {args.process_id}/{args.num_processes}: "
        f"devices={jax.device_count()} nll {losses[0]:.4f} -> {losses[-1]:.4f}",
        flush=True,
    )
    assert losses[-1] < losses[0], "nll did not fall across hosts"
    print(f"MULTIHOST_OK proc={args.process_id}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--launch", type=int, default=0,
                    help="spawn N single-machine worker processes")
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--num-processes", type=int, default=1)
    ap.add_argument("--coordinator", default="127.0.0.1:29501")
    ap.add_argument("--local-devices", type=int, default=2)
    ap.add_argument("--cpu", action="store_true", default=True)
    args = ap.parse_args()

    if args.launch:
        procs = [
            subprocess.Popen([
                sys.executable, os.path.abspath(__file__),
                "--process-id", str(i),
                "--num-processes", str(args.launch),
                "--coordinator", args.coordinator,
                "--local-devices", str(args.local_devices),
            ])
            for i in range(args.launch)
        ]
        rc = [p.wait() for p in procs]
        sys.exit(max(rc))
    worker(args)


if __name__ == "__main__":
    main()
