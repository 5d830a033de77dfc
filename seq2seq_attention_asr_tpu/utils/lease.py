"""Single-client chip lease — mechanical enforcement of the one-chip-
client rule.

The tunneled TPU chip tolerates exactly ONE live client: a second
client started mid-run either hangs inside its first device op or
degrades the first run (motivating incident: BENCH_r03 ran at 22:27
while the convergence run started 21:28 still held the chip; that
run's epoch-420 validation took 2,110 s vs 0.2 s for its non-decode
epochs — lease contention / recompile-over-tunnel). A client killed
mid-operation additionally wedges the remote lease for ~20-30 min.

Every chip-using entry point (bench.py, tools/convergence.py,
tools/bucket_sweep.py, tools/perf_breakdown.py) therefore calls
`chip_lease()` BEFORE initializing the backend; a second client fails
fast with a clear message instead of silently corrupting both
measurements. CPU-only runs (BENCH_CPU / JAX_PLATFORMS=cpu) skip the
lease.

This is advisory same-host locking (the tunnel is per-host anyway):
the lock file holds the owner's pid + argv; a lock whose pid is dead
is stale and is reclaimed automatically.
"""

from __future__ import annotations

import errno
import json
import os
import sys
from contextlib import contextmanager

LOCK_PATH = os.environ.get("TPU_CHIP_LEASE", "/tmp/seq2seq_asr_tpu_chip.lease")


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except OSError as e:
        return e.errno == errno.EPERM  # alive but not ours
    return True


def _owner(path: str):
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def _would_use_chip() -> bool:
    """True when this process will talk to the real chip: not forced to
    CPU via BENCH_CPU, JAX_PLATFORMS=cpu, or a tool's --cpu flag (the
    chip tools translate --cpu into jax.config before backend init)."""
    if os.environ.get("BENCH_CPU"):
        return False
    if "--cpu" in sys.argv:
        return False
    plats = os.environ.get("JAX_PLATFORMS", "")
    if plats and "axon" not in plats and "tpu" not in plats:
        return False
    return True


@contextmanager
def chip_lease(tag: str = "", path: str | None = None, force: bool = False):
    """Acquire the exclusive chip lease for the duration of the block.

    Exits the process (SystemExit, rc=3) if another LIVE client holds
    it — per CLAUDE.md, prefer letting the running client finish over
    killing it (a mid-operation kill wedges the remote lease far
    longer than any run). `force=True` (or env TPU_CHIP_LEASE_FORCE=1)
    skips the check for emergency use. No-op for CPU-only runs.
    """
    path = path or LOCK_PATH
    if force or os.environ.get("TPU_CHIP_LEASE_FORCE") or not _would_use_chip():
        yield
        return
    me = {"pid": os.getpid(), "tag": tag or " ".join(sys.argv[:3])}
    # Acquire by atomic os.link of a fully-written temp file: the lock
    # is never observable in a half-written state (a reader of an empty
    # file would misclassify a LIVE lock as stale), and creation+content
    # are one atomic step.
    tmp = f"{path}.{os.getpid()}.tmp"
    with open(tmp, "w") as f:
        json.dump(me, f)
    try:
        while True:
            try:
                os.link(tmp, path)
                break
            except FileExistsError:
                pass
            owner = _owner(path)
            if owner and _pid_alive(int(owner.get("pid", -1))):
                print(
                    f"chip lease held by pid {owner['pid']} "
                    f"({owner.get('tag', '?')}) — one chip client at a "
                    f"time (see CLAUDE.md). Let it finish, or if it is "
                    f"truly gone remove {path}.",
                    file=sys.stderr,
                )
                raise SystemExit(3) from None
            # Stale lock (owner dead, or unreadable leftover): exactly
            # ONE contender reclaims it via atomic rename — a plain
            # unlink could delete a FRESH lock some other contender
            # just installed in the race window.
            stale = f"{path}.stale.{os.getpid()}"
            try:
                os.rename(path, stale)
            except FileNotFoundError:
                continue  # someone else reclaimed it; retry the link
            try:
                os.unlink(stale)
            except FileNotFoundError:
                pass
    finally:
        try:
            os.unlink(tmp)
        except FileNotFoundError:
            pass
    try:
        yield
    finally:
        try:
            if (_owner(path) or {}).get("pid") == me["pid"]:
                os.unlink(path)
        except OSError:
            pass
