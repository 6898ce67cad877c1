"""Pin the hunt tools' advisory-lock contract (tools/huntlock.py).

Two hunts (bench_hunt + scaling_hunt, possibly launched from different
operator sessions) must never run Spark work concurrently: an observed
collision had both sessions' benches at ~7% run steal and the first
finisher's lock cleanup crashed the second hunt. The round-5 review
found two residual holes in the first fix — a check-then-act race (the
peer check ran seconds before the lock write) and leaked locks
deadlocking both tools after a crash. These tests pin the protocol that
closes them: atomic own-lock acquisition THEN peer check, pid-stamped
locks with stale-holder clearing, release-tolerates-missing.
"""

from __future__ import annotations

import os

from tools import bench_hunt, huntlock, scaling_hunt


def test_acquire_is_exclusive_and_sees_peer(tmp_path):
    own = str(tmp_path / "bench_hunt.lock")
    peer = str(tmp_path / "scaling_hunt.lock")

    assert huntlock.acquire(own, (peer,), "bench")
    # second acquisition of a LIVE lock (our own pid) must fail
    assert not huntlock.acquire(own, (peer,), "bench")
    huntlock.release(own)

    # a live peer lock blocks acquisition AND our own lock is rolled back
    fd = os.open(peer, os.O_CREAT | os.O_WRONLY)
    os.write(fd, f"{os.getpid()} probe\n".encode())
    os.close(fd)
    assert not huntlock.acquire(own, (peer,), "bench")
    assert not os.path.exists(own), "failed acquire must not leak its own lock"


def test_stale_locks_are_cleared(tmp_path):
    own = str(tmp_path / "bench_hunt.lock")
    peer = str(tmp_path / "scaling_hunt.lock")

    # dead-pid peer lock (pid 1 is init — alive; use an impossible pid)
    with open(peer, "w") as f:
        f.write("999999999 session\n")
    assert huntlock.acquire(own, (peer,), "bench"), "dead-holder peer lock must clear"
    assert not os.path.exists(peer)
    huntlock.release(own)

    # pre-pid-convention lock content (old format: no pid) is stale too
    with open(own, "w") as f:
        f.write("bench\n")
    assert huntlock.acquire(own, (peer,), "bench")
    with open(own) as f:
        pid_tok, tag = f.read().split()
    assert int(pid_tok) == os.getpid() and tag == "bench"
    huntlock.release(own)


def test_retag_and_release_tolerate_lifecycle(tmp_path):
    lock = str(tmp_path / "scaling_hunt.lock")
    huntlock.release(lock)  # nothing to remove — must not raise
    assert huntlock.acquire(lock, (), "probe")
    huntlock.retag(lock, "session")
    with open(lock) as f:
        assert f.read().split()[1] == "session"
    huntlock.release(lock)
    assert not os.path.exists(lock)


def test_hunt_tools_share_the_protocol():
    # both tools point at each other's locks and use huntlock (no local
    # exists()-check reimplementations left to drift)
    assert bench_hunt.LOCK in scaling_hunt.PEER_LOCKS
    assert scaling_hunt.LOCK in bench_hunt.PEER_LOCKS
    assert bench_hunt.huntlock is huntlock and scaling_hunt.huntlock is huntlock


def test_membw_probe_returns_plausible_bandwidth():
    # tiny arrays — correctness of UNITS, not a real bandwidth reading.
    # Bounds are deliberately loose: under a concurrently-running full
    # suite (32 Spark threads) this probe can be starved well below any
    # physical floor (observed <0.1 GB/s), and that must not flake here.
    bw = bench_hunt.membw_gbps(mb=8, reps=3)
    assert 0.001 < bw < 10000.0
