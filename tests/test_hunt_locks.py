"""Pin the hunt tools' advisory-lock contract.

Two hunts (bench_hunt + scaling_hunt, possibly launched from different
operator sessions) must never run Spark work concurrently: an observed
collision had both sessions' benches at ~7% run steal and the first
finisher's lock cleanup crashed the second hunt. These tests pin the
fix: each hunt skips windows where ANY hunt lock is held, and lock
removal tolerates a vanished file.
"""

from __future__ import annotations

from tools import bench_hunt, scaling_hunt


def test_hunt_in_progress_sees_own_and_peer_locks(tmp_path, monkeypatch):
    own = tmp_path / "bench_hunt.lock"
    peer = tmp_path / "scaling_hunt.lock"
    monkeypatch.setattr(bench_hunt, "LOCK", str(own))
    monkeypatch.setattr(bench_hunt, "PEER_LOCKS", (str(peer),))

    assert bench_hunt.hunt_in_progress() is None
    peer.write_text("probe\n")
    assert bench_hunt.hunt_in_progress() == str(peer)
    peer.unlink()
    own.write_text("bench\n")
    assert bench_hunt.hunt_in_progress() == str(own)


def test_membw_probe_returns_plausible_bandwidth():
    # tiny arrays — correctness of units, not a real bandwidth reading
    bw = bench_hunt.membw_gbps(mb=8, reps=1)
    assert 0.1 < bw < 1000.0


def test_scaling_hunt_remove_lock_tolerates_missing(tmp_path, monkeypatch):
    lock = tmp_path / "scaling_hunt.lock"
    monkeypatch.setattr(scaling_hunt, "LOCK", str(lock))
    scaling_hunt._remove_lock()  # nothing to remove — must not raise
    lock.write_text("session\n")
    scaling_hunt._remove_lock()
    assert not lock.exists()
