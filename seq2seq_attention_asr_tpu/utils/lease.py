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

This is advisory same-host locking (the tunnel is per-host anyway),
built on `fcntl.flock`: the kernel releases the lock the instant the
owner dies, so there is no stale-lock reclaim logic to race on
(ADVICE r4: the previous pid-liveness + rename scheme had a window
where two contenders could both reclaim and run concurrently). The
lock file's contents (owner pid + argv) are diagnostics only.
"""

from __future__ import annotations

import fcntl
import json
import os
import sys
from contextlib import contextmanager

LOCK_PATH = os.environ.get("TPU_CHIP_LEASE", "/tmp/seq2seq_asr_tpu_chip.lease")


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
    # Acquire via flock: atomic, and released by the kernel the moment
    # the holder exits (even on SIGKILL), so a dead owner needs no
    # staleness detection at all. The file persists between holders;
    # its json contents are diagnostics for the "held by" message.
    while True:
        fd = os.open(path, os.O_RDWR | os.O_CREAT, 0o644)
        try:
            fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
        except OSError:
            owner = _owner(path) or {}
            print(
                f"chip lease held by pid {owner.get('pid', '?')} "
                f"({owner.get('tag', '?')}) — one chip client at a "
                f"time (see CLAUDE.md). Let it finish, or if it is "
                f"truly gone remove {path}.",
                file=sys.stderr,
            )
            os.close(fd)
            raise SystemExit(3) from None
        # Guard the unlink-at-release race: if the previous holder
        # unlinked the path between our open() and flock(), we hold a
        # lock on an orphaned inode while a third client could lock the
        # fresh file — retry on the current path instead.
        try:
            fresh = os.stat(path).st_ino == os.fstat(fd).st_ino
        except FileNotFoundError:
            fresh = False
        if fresh:
            break
        os.close(fd)
    os.ftruncate(fd, 0)
    os.write(fd, json.dumps(me).encode())
    try:
        yield
    finally:
        try:
            # Remove only if the path still names OUR inode (it always
            # should — nobody else can write while we hold the flock).
            if os.stat(path).st_ino == os.fstat(fd).st_ino:
                os.unlink(path)
        except OSError:
            pass
        os.close(fd)  # releases the flock
