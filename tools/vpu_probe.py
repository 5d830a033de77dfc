#!/usr/bin/env python3
"""VPU elementwise-rate probe: is the flagship decoder's energies chain
(z = vh + ws; a = tanh(z); e = sum(a * w_e)) faster in bf16 than f32 on
this chip's VPU?

The batch-scaling curve (runs/batch_scaling.json) shows the fused
decoder scan is VPU-throughput-bound: per-block-step cost ~11 us at
bb=32/L=144/S=512 matches the ~24M-VPU-op estimate of the f32 energies
chain, and step time scales linearly with batch. If the VPU executes
bf16 elementwise at 2x f32 rate, computing the chain in bf16 roughly
halves decoder time; if not, that lever is dead.

VERDICT OF THE EXPERIMENT (r5): the lever is dead — see docs/PERF.md.
This probe's isolated chain measured bf16 at 2.09x f32, but the
per-call dispatch floor polluted the absolute numbers, and wiring bf16
energies into the REAL fused kernels (fwd+bwd, with the f32-reshape-
then-cast workarounds Mosaic's bf16 minor-expand restriction forces)
measured 11.29 ms/step vs 9.95 f32-internals at the flagship shape —
13% SLOWER (relayout/conversion overhead eats the VPU-rate gain) and
~1.5-4x farther from f32 ground-truth gradients. The kernels keep f32
internals; re-run this probe + the kernel A/B before revisiting.

Usage: python tools/vpu_probe.py [--cpu]
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

BB, L, S, T = 32, 144, 512, 56


def _kernel(compute_dtype, vh_ref, ws_ref, we_ref, e_out):
    t = None  # grid cell; chain-free on purpose (VPU throughput probe)
    import jax.numpy as jnp

    cd = compute_dtype
    z = vh_ref[:].astype(cd) + ws_ref[0].astype(cd)[:, None, :]
    a = jnp.tanh(z)
    e = jnp.sum(a * we_ref[:].astype(cd)[None, None, :], axis=-1)
    e_out[0] = e.astype(e_out.dtype)


def run(dt_name, reps=20):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cd = jnp.bfloat16 if dt_name == "bf16" else jnp.float32
    io = jnp.bfloat16  # IO dtype matches the real kernel (bf16 models)
    rng = np.random.RandomState(0)
    vh = jnp.asarray(rng.randn(BB, L, S), io)
    ws = jnp.asarray(rng.randn(T, BB, S), io)
    we = jnp.asarray(rng.randn(S), io)

    fn = pl.pallas_call(
        functools.partial(_kernel, cd),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((BB, L, S), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, S), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S,), lambda t: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BB, L), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, BB, L), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )

    # Chain `reps` dependent executions inside ONE jit (CLAUDE.md
    # timing rule: per-call dispatch on the tunnel has a ~1 ms+ floor
    # that would swamp the kernel).
    @jax.jit
    def many(c0):
        def body(c, _):
            out = fn(vh + jnp.zeros((), io) * c.astype(io), ws, we)
            return out.reshape(-1)[0] * 0.0 + c, ()

        c, _ = jax.lax.scan(body, c0, None, length=reps)
        return c

    float(many(jnp.float32(0.0)))  # compile + warmup
    t0 = time.perf_counter()
    float(many(jnp.float32(0.0)))
    dt = (time.perf_counter() - t0) / reps
    per_step_us = dt / T * 1e6
    print(f"{dt_name}: {dt*1e3:.3f} ms/call, {per_step_us:.2f} us/step",
          flush=True)
    return per_step_us


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from seq2seq_attention_asr_tpu.utils.lease import chip_lease

    with chip_lease("vpu_probe.py"):
        f32 = run("f32")
        bf16 = run("bf16")
    print(json.dumps({"f32_us_per_step": round(f32, 2),
                      "bf16_us_per_step": round(bf16, 2),
                      "speedup": round(f32 / bf16, 3)}))


if __name__ == "__main__":
    main()
