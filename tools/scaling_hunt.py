"""Hunt for a quiet host window and capture a clean scaling session.

The sandbox shares a physical host with other tenants; hypervisor steal
varies by 2-3× over hours (see BENCH/BASELINE.md session table). This
loop cheaply probes the 8-core trial; when a probe beats the threshold
(= the window is quiet), it immediately runs a full 3×2-trial session
via scaling_bench.main(), which appends to BENCH/scaling_sessions.jsonl
and regenerates BASELINE.md from the best session.

A lockfile (/tmp/scaling_hunt.lock) marks probe/session activity so an
operator can avoid launching concurrent Spark work.

Env: HUNT_ROUNDS (default 14), HUNT_SLEEP_S (default 480),
     HUNT_THRESHOLD_S (default 27.0 — yesterday's quiet best was 21.3s),
     HUNT_MIN_MEMBW_GBPS (default 0 = off — skip windows whose
     single-thread triad bandwidth probe reads below this, the same gate
     bench_hunt grew in round 5: co-tenant memory-bus contention is
     invisible to CPU steal but depresses BOTH phases unevenly, and the
     bandwidth-poor sessions it produces dilute the efficiency median;
     the probe costs milliseconds and runs BEFORE the ~20 s 8-core
     probe, so gated-out windows are nearly free).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools import huntlock, scaling_bench as sb  # noqa: E402

LOCK = "/tmp/scaling_hunt.lock"
# bench_hunt holds this one while IT runs Spark work; skip such windows
# instead of contending (observed two-hunt collision: both sessions at
# ~7% run steal). Acquisition protocol — atomic own-lock-then-peer-check
# with stale-pid clearing — lives in tools/huntlock.py.
PEER_LOCKS = ("/tmp/bench_hunt.lock",)


def main() -> None:
    rounds = int(os.environ.get("HUNT_ROUNDS", "14"))
    sleep_s = int(os.environ.get("HUNT_SLEEP_S", "480"))
    threshold = float(os.environ.get("HUNT_THRESHOLD_S", "27.0"))
    probe_cpus = int(os.environ.get("HUNT_PROBE_CPUS", "8"))
    min_membw = float(os.environ.get("HUNT_MIN_MEMBW_GBPS", "0"))
    pages_path = os.environ.get("SPARK_GRAFT_PAGES_PATH", "/tmp/scaling_pages")

    best = None

    def window(i: int) -> bool:
        """One locked probe/session window; True = clean session
        captured, stop hunting. Runs with the lock HELD (the caller's
        finally releases it) so a peer can't start Spark work mid-probe
        and contaminate the measurement."""
        nonlocal best
        if min_membw:
            from bench import membw_gbps

            bw = membw_gbps()
            if bw < min_membw:
                print(
                    f"probe {i}: membw {bw:.1f} < {min_membw} GB/s — skipping window",
                    flush=True,
                )
                return False
        try:
            r = sb.run_once(probe_cpus, pages_path)
        except Exception as exc:  # noqa: BLE001 — keep hunting on trial failure
            print(f"probe {i}: failed ({exc})", flush=True)
            return False
        t8 = r["sec"]
        print(f"probe {i}: {probe_cpus}-core {t8:.1f}s (threshold {threshold})", flush=True)
        if best is None or t8 < best:
            best = t8
        if t8 > threshold:
            return False
        print("quiet window — running full session", flush=True)
        huntlock.retag(LOCK, "session")
        sys.argv = [sys.argv[0]]  # no --report-only
        sb.main()
        import json

        # stop only on a clean session captured by THIS run (the log
        # may already hold a good historical session)
        last = json.loads([line for line in open(sb.SESSIONS_LOG) if line.strip()][-1])
        if last["scaling_efficiency_n_to_4n"] >= 0.8:
            print(
                f"captured clean session (eff {last['scaling_efficiency_n_to_4n']}); done",
                flush=True,
            )
            return True
        return False

    # Materialize the pages input up front (untimed, and BEFORE any
    # probe): the probe reads pages_path directly, so a cleaned /tmp
    # used to fail every window of the hunt with a read error.
    if huntlock.acquire(LOCK, PEER_LOCKS, "materialize"):
        try:
            sb.ensure_pages(pages_path)
        finally:
            huntlock.release(LOCK)

    for i in range(rounds):
        if not huntlock.acquire(LOCK, PEER_LOCKS, "probe"):
            print(f"probe {i}: another hunt holds a lock — skipping window", flush=True)
            time.sleep(sleep_s)
            continue
        try:
            # the lock is held for the whole window, INCLUDING the full
            # session — a crash anywhere still releases it (review
            # finding: sb.main() used to run outside any try/finally,
            # and a leaked lock deadlocked both hunts' future windows)
            if window(i):
                return
        finally:
            huntlock.release(LOCK)
        time.sleep(sleep_s)
    print(f"hunt exhausted; best 8-core probe {best}", flush=True)


if __name__ == "__main__":
    main()
