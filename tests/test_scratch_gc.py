"""Pruning rules for the process-unique /tmp scratch dirs that back the
persisted-catalog queries (ADVICE r6 + r8): dead-owner dirs go, reused
pids are detected via /proc starttime, and a LIVE owner's dir is never
deleted on age alone (r8: the old mtime-only rule deleted a >1-day
session's memoized bench catalogs out from under lazy reads; with
/proc available, only start-vs-mtime decides — age is consulted only
when liveness is unknowable)."""

from __future__ import annotations

import hashlib
import os
import tempfile
import time


def _proc_start_epoch(pid: int) -> float:
    with open(f"/proc/{pid}/stat", "rb") as fh:
        ticks = int(fh.read().rsplit(b")", 1)[1].split()[19])
    with open("/proc/uptime") as fh:
        uptime = float(fh.read().split()[0])
    return time.time() - uptime + ticks / os.sysconf("SC_CLK_TCK")


def test_scratch_dir_prune_rules(tmp_path, monkeypatch):
    import pytest

    if not os.path.isdir("/proc"):
        pytest.skip("needs /proc for the liveness rules")

    from vector_io_spark import queries as q

    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))
    sf = "/root/testdata/sf-gc-test"
    tag = hashlib.md5(sf.encode()).hexdigest()[:12]
    stem = f"gcx_{tag}_"

    dead = tmp_path / f"{stem}999999999"  # no such pid
    dead.mkdir()

    # pid 1 is alive but STARTED long after mtime=0 — a reused pid,
    # not the owner (an owner's start predates every mtime of its dir)
    reused = tmp_path / f"{stem}1"
    reused.mkdir()
    os.utime(reused, (0.0, 0.0))

    # our parent pid is alive and its start predates the dir's mtime
    # (set just past its own start, i.e. as OLD as constructible for a
    # real live owner) — must be kept: with /proc present there is no
    # age-based pruning at all, only the start-vs-mtime ownership test
    ppid = os.getppid()
    owner = tmp_path / f"{stem}{ppid}"
    owner.mkdir()
    t0 = _proc_start_epoch(ppid) + 30.0
    os.utime(owner, (t0, t0))

    mine = q._scratch_dir("gcx", sf)
    assert mine == str(tmp_path / f"{stem}{os.getpid()}")
    assert not dead.exists(), "dead-owner dir must be pruned"
    assert not reused.exists(), "reused-pid dir must be pruned"
    assert owner.exists(), (
        "a live owner's dir must never be pruned on age (ADVICE r8)"
    )
