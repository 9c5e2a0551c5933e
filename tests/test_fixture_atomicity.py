"""Concurrency hardening of the metadata-table fixture builds.

The fixtures live at fixed /tmp paths shared by every harness process
(oracle check, pytest, bench), so two concurrent FIRST runs could race the
build (VERDICT r3 "What's wrong" #2).  `_build_once` serializes them with
an O_EXCL lock file and a ready marker written after the final commit;
these tests pin the three behaviors that make that safe.
"""

from __future__ import annotations

import os
import threading
import time

import pytest

from iceberg_table_generator_spark.operators.metadata_tables import (
    _READY_MARKER,
    _build_once,
)


def _mk(path):
    os.makedirs(path, exist_ok=True)


def test_ready_marker_short_circuits(tmp_path):
    path = str(tmp_path / "fx")
    _mk(path)
    with open(os.path.join(path, _READY_MARKER), "w") as f:
        f.write("ok\n")
    calls = []
    _build_once(path, lambda: calls.append(1))
    assert calls == []


def test_single_builder_runs_once_and_publishes(tmp_path):
    path = str(tmp_path / "fx")
    calls = []

    def build():
        _mk(path)
        calls.append(1)

    _build_once(path, build)
    _build_once(path, build)
    assert calls == [1]
    assert os.path.exists(os.path.join(path, _READY_MARKER))
    assert not os.path.exists(path + ".lock")


def test_waiter_blocks_until_ready_without_building(tmp_path):
    path = str(tmp_path / "fx")
    _mk(path)
    lock = path + ".lock"
    fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)  # pose as builder
    calls = []
    done = threading.Event()

    def waiter():
        _build_once(path, lambda: calls.append(1), timeout_s=10.0)
        done.set()

    t = threading.Thread(target=waiter, daemon=True)
    t.start()
    time.sleep(0.6)
    assert not done.is_set()  # still waiting on the marker
    with open(os.path.join(path, _READY_MARKER), "w") as f:
        f.write("ok\n")
    t.join(timeout=10)
    assert done.is_set() and calls == []
    os.close(fd)
    os.unlink(lock)


def test_undetermined_lock_times_out_with_clear_error(tmp_path):
    # A lock whose PID was never written (holder crashed inside the
    # open→write window) can't be proven stale — waiters time out loudly.
    path = str(tmp_path / "fx")
    _mk(path)
    lock = path + ".lock"
    fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    try:
        with pytest.raises(TimeoutError, match="never appeared"):
            _build_once(path, lambda: None, timeout_s=0.6)
    finally:
        os.close(fd)
        os.unlink(lock)


def test_failed_build_releases_lock_for_retry(tmp_path):
    # ADVICE r4: a raising build() must not poison the path — the lock is
    # released and the NEXT caller rebuilds instead of hanging 300s.
    path = str(tmp_path / "fx")

    def boom():
        _mk(path)
        raise RuntimeError("build failed")

    with pytest.raises(RuntimeError, match="build failed"):
        _build_once(path, boom)
    assert not os.path.exists(path + ".lock")
    calls = []

    def ok():
        _mk(path)
        calls.append(1)

    _build_once(path, ok, timeout_s=5.0)
    assert calls == [1]
    assert os.path.exists(os.path.join(path, _READY_MARKER))


def test_waiter_takes_over_after_holder_failure(tmp_path):
    # A CONCURRENT waiter must loop back to acquisition when the holder's
    # build raises (previously it polled only for the marker and hung).
    path = str(tmp_path / "fx")
    calls = []
    started = threading.Event()

    def slow_boom():
        _mk(path)
        started.set()
        time.sleep(0.8)
        raise RuntimeError("holder dies")

    def ok():
        _mk(path)
        calls.append("waiter")

    holder_err = []

    def holder():
        try:
            _build_once(path, slow_boom)
        except RuntimeError as e:
            holder_err.append(e)

    t_holder = threading.Thread(target=holder, daemon=True)
    t_holder.start()
    started.wait(timeout=5)
    t_waiter = threading.Thread(
        target=lambda: _build_once(path, ok, timeout_s=10.0), daemon=True
    )
    t_waiter.start()
    t_holder.join(timeout=10)
    t_waiter.join(timeout=10)
    assert holder_err and calls == ["waiter"]
    assert os.path.exists(os.path.join(path, _READY_MARKER))


def test_dead_pid_lock_treated_as_stale(tmp_path):
    # A hard-killed builder leaves a lock naming a dead PID; the next
    # caller must remove it and build instead of timing out forever.
    import subprocess

    p = subprocess.Popen(["true"])
    p.wait()
    path = str(tmp_path / "fx")
    _mk(path)
    with open(path + ".lock", "w") as f:
        f.write(str(p.pid))
    calls = []

    def ok():
        calls.append(1)

    _build_once(path, ok, timeout_s=5.0)
    assert calls == [1]
    assert not os.path.exists(path + ".lock")
