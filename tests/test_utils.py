"""Aux-subsystem tests: NaN tripwires, jaxpr graph dump, step timer."""

import jax.numpy as jnp
import numpy as np
import pytest

from seq2seq_attention_asr_tpu.utils import debug, profiling


def test_find_nonfinite_paths():
    tree = {"a": jnp.ones(3), "b": {"c": jnp.array([1.0, np.nan])}}
    bad = debug.find_nonfinite(tree)
    assert len(bad) == 1 and "c" in bad[0]
    with pytest.raises(debug.NonFiniteError) as e:
        debug.check_finite(tree, "grads")
    assert "grads" in str(e.value)
    debug.check_finite({"a": jnp.ones(3)})  # no raise


def test_nonfinite_count_jit():
    import jax

    f = jax.jit(debug.nonfinite_count)
    assert int(f({"a": jnp.array([1.0, jnp.inf, jnp.nan])})) == 2
    assert int(f({"a": jnp.ones(4), "b": jnp.zeros(2)})) == 0


def test_jaxpr_dot():
    def fn(x):
        return jnp.tanh(x) @ x.T

    dot = debug.jaxpr_dot(fn, jnp.ones((3, 3)))
    assert "digraph" in dot and "tanh" in dot and "dot_general" in dot


def test_step_timer():
    t = profiling.StepTimer(skip_first=0)
    t.start()
    t.tick(frames=16000 // 512 * 10)  # ~10 s of audio
    rep = t.report()
    assert rep["steps_per_s"] > 0
    assert rep["audio_s_per_s"] > 0
