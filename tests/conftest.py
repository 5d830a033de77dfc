"""Test config: run everything on a virtual 8-device CPU mesh.

Must set env vars before jax is first imported anywhere (SURVEY.md §4:
the reference has no tests; we use JAX's standard CPU-mesh fakes for
collective/sharding tests without a pod).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# Belt and braces: if a pytest plugin imported jax before this conftest
# ran, the env var above came too late — force the platform through the
# config as well (the tunneled TPU must never be grabbed by unit tests).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
