"""Advisory lock protocol shared by bench_hunt and scaling_hunt.

The two hunt tools must never run Spark work (or even their steal /
bandwidth probes) concurrently — they contaminate each other's
measurements (observed: a double-hunt window with both sessions at ~7%
run steal). The original convention — check `os.path.exists(peer)`,
then later `open(LOCK, "w")` — had two failure modes a round-5 review
pinned:

1. check-then-act race: several seconds of probe work ran between the
   existence check and the lock write, so two hunts launched in that
   window both proceeded;
2. leaked locks: a crash between write and removal left the file on
   disk, and once both tools started CHECKING locks, a leaked file
   deadlocked every future window of both tools until an operator
   deleted it by hand.

Protocol here:

- acquire() creates the caller's own lock ATOMICALLY
  (os.open O_CREAT|O_EXCL) and only THEN checks peer locks, releasing
  and backing off if any peer is live. Two racing hunts can both back
  off (safe), but can never both proceed: for A to proceed it must hold
  its own lock across the peer check, so B's later check sees it.
- lock files carry the holder's pid; any lock whose pid is dead (or
  that predates the pid convention) is cleared as stale before
  acquisition, so a crash can no longer deadlock future windows.
- callers release() in a finally block around ALL work done under the
  lock, including full capture sessions, not just the probe.
"""

from __future__ import annotations

import os


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True  # exists, owned by someone else
    return True


def _clear_if_stale(path: str) -> None:
    """Remove `path` when its recorded holder pid is dead or absent
    (pre-pid-convention files count as stale: their writers are gone)."""
    try:
        with open(path) as f:
            first = f.read().split()
    except (FileNotFoundError, OSError):
        return
    pid = int(first[0]) if first and first[0].isdigit() else None
    if pid is None or not _pid_alive(pid):
        try:
            os.remove(path)
        except FileNotFoundError:
            pass


def acquire(lock: str, peers: tuple[str, ...], tag: str) -> bool:
    """Try to take `lock`; True iff this process now holds it AND no
    live peer lock exists. On a peer conflict the just-taken lock is
    released before returning False."""
    for p in (lock, *peers):
        _clear_if_stale(p)
    try:
        fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        return False
    with os.fdopen(fd, "w") as f:
        f.write(f"{os.getpid()} {tag}\n")
    if any(os.path.exists(p) for p in peers):
        release(lock)
        return False
    return True


def retag(lock: str, tag: str) -> None:
    """Update the held lock's tag (e.g. probe → session)."""
    with open(lock, "w") as f:
        f.write(f"{os.getpid()} {tag}\n")


def release(lock: str) -> None:
    try:
        os.remove(lock)
    except FileNotFoundError:
        pass
