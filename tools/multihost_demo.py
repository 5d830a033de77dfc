#!/usr/bin/env python3
"""Multi-host SPMD launch recipe — runnable without a pod.

Every host runs THIS script (the standard JAX multi-controller model).
It wires jax.distributed, shards the dataset per host
(parallel/multihost.host_shard), then hands the mesh to the Trainer and
calls fit() — the full epoch driver (global dp-sharded batches, sharded
train/eval/beam steps, cross-host PER, host-0 checkpoints) runs over
the global mesh. A TPU pod uses this workflow verbatim (there the
launcher sets the coordinator env and the backend is "tpu"; nothing
else changes).

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

    from seq2seq_attention_asr_tpu.data import batching, synthetic
    from seq2seq_attention_asr_tpu.models import registry
    from seq2seq_attention_asr_tpu.parallel import make_mesh
    from seq2seq_attention_asr_tpu.train import optim as optim_lib
    from seq2seq_attention_asr_tpu.train import trainer as trainer_lib

    # identical corpus everywhere; each host takes its deterministic
    # slice. The Trainer does the rest: global dp-sharded batches
    # (multihost.global_batch), dead-row padding for ragged batches,
    # replicated decode results, cross-host PER aggregation, and
    # host-0 checkpoints behind a barrier.
    train, valid, v = synthetic.train_valid(
        32, 8, n_phones=5, feat_dim=8, min_len=2, max_len=4, seed=0
    )
    local_train = multihost.host_shard(train)
    local_valid = multihost.host_shard(valid)
    mesh = make_mesh(dp=jax.device_count(), sp=1)

    model = registry.build(
        "chorowski", input_frame_size=8, hidden_frame_size=8,
        output_frame_size=8, score_depth=8, state_depth=8, mlp_depth=8,
        output_depth=v, feature_maps=0, filt_size=5,
    )
    tcfg = trainer_lib.TrainConfig(
        num_epochs=2, batch_size=8, normalize_nll=True, beam_k=2,
        prefetch=0,
    )
    tr = trainer_lib.Trainer(
        model, optim_lib.OptimConfig(), tcfg, mesh=mesh,
        save_dir=args.save_dir or None,
    )
    tr.init(model.init(jax.random.PRNGKey(0)))
    rows = list(tr.fit(local_train, local_valid,
                       batching.BucketedBatcher(l_buckets=[32], batch_size=8),
                       decode_every=2))
    print(
        f"proc {args.process_id}/{args.num_processes}: "
        f"devices={jax.device_count()} "
        f"nll {rows[0]['train_nll']:.4f} -> {rows[-1]['train_nll']:.4f} "
        f"per {rows[-1].get('valid_per', float('nan')):.4f}",
        flush=True,
    )
    assert rows[-1]["train_nll"] < rows[0]["train_nll"], "nll did not fall"
    assert "valid_per" in rows[-1], "cross-host beam PER missing"
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
    ap.add_argument("--save-dir", default="",
                    help="shared checkpoint dir (host 0 writes)")
    args = ap.parse_args()

    if args.launch:
        procs = [
            subprocess.Popen([
                sys.executable, os.path.abspath(__file__),
                "--process-id", str(i),
                "--num-processes", str(args.launch),
                "--coordinator", args.coordinator,
                "--local-devices", str(args.local_devices),
                "--save-dir", args.save_dir,
            ])
            for i in range(args.launch)
        ]
        rc = [p.wait() for p in procs]
        sys.exit(max(rc))
    worker(args)


if __name__ == "__main__":
    main()
