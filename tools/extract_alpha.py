#!/usr/bin/env python3
"""Attention-alignment extraction — replacement for
/root/reference/timit/ExtractAlpha.lua.

Loads a checkpoint, runs teacher-forced forwards on N utterances, and
dumps per-utterance attention matrices (T x L) with phone start/finish
times to an HDF5 file for alignment visualization.

Usage:
  python tools/extract_alpha.py --ckpt runs/exp1/ckpt_latest \
      --data data/logmel --out alpha_sample.h5 [--n 20]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--data", required=True)
    ap.add_argument("--out", default="alpha_sample.h5")
    ap.add_argument("--n", type=int, default=20)
    ap.add_argument("--split", default="valid")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import h5py
    import jax
    import jax.numpy as jnp

    from seq2seq_attention_asr_tpu.data import timit as timit_data
    from seq2seq_attention_asr_tpu.train import checkpoint, experiment as exp_lib
    from seq2seq_attention_asr_tpu.train import trainer as trainer_lib

    run_dir = os.path.dirname(os.path.abspath(args.ckpt))
    exp_json = os.path.join(run_dir, "experiment.json")
    if os.path.exists(exp_json):
        import json

        with open(exp_json) as f:
            blob = json.load(f)
        model_name, model_kwargs = blob["model"], blob["model_kwargs"]
        noise = blob["train"].get("noise", "none")
    else:
        model_name, model_kwargs, noise = "chorowski", {}, "none"

    from seq2seq_attention_asr_tpu.models import registry

    model = registry.build(model_name, **model_kwargs)
    blob = checkpoint.load(args.ckpt)
    state = blob["state"]
    train_params = state[0] if isinstance(state, (tuple, list)) else state["0"]
    tcfg = trainer_lib.TrainConfig(noise=noise)
    params = trainer_lib.eval_params(tcfg, train_params)
    params = jax.tree.map(jnp.asarray, params)

    ds = timit_data.load_hdf5(os.path.join(args.data, f"{args.split}.h5"))
    with h5py.File(args.out, "w") as f:
        for i in range(min(args.n, len(ds))):
            x = jnp.asarray(ds.x[i][None])
            x_len = jnp.asarray([len(ds.x[i])])
            y = ds.y[i]
            onehot = jax.nn.one_hot(jnp.asarray(y[None]), model.output_depth)
            dec_mask = jnp.ones((1, len(y)), jnp.float32)
            out = model.forward(params, x, x_len, onehot, dec_mask, train=False)
            g = f.create_group(ds.uids[i])
            g.create_dataset("alpha", data=np.asarray(out["alpha"][0]))
            g.create_dataset("y", data=y)
            g.create_dataset("start", data=ds.start[i])
            g.create_dataset("finish", data=ds.finish[i])
            print(f"{ds.uids[i]}: alpha {out['alpha'][0].shape}")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
