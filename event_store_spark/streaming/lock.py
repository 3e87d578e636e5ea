"""Single-writer lock + monitor (X4): one replicator instance per store.

Re-expresses the reference's advisory-lock pair:

- `LockManager.java:45-84` — `pg_try_advisory_lock` keyed by the lock name;
  session-scoped, so re-acquiring from the holder succeeds and the lock
  dies with the session. Here: an atomically created lease FILE holding the
  owner id, with a heartbeat mtime standing in for session liveness — a
  lease older than ``lease_seconds`` is considered orphaned (holder died)
  and may be stolen, exactly the role of Postgres dropping the session.
- `LockMonitor.java:52-58` — periodically re-asserts the lock and calls
  `System.exit(1)` on loss ("another instance running?"). Here:
  :class:`LockMonitor.check_once` re-asserts and invokes ``on_loss`` (the
  testable `exit` seam); the in-loop equivalent is the Replicator
  heartbeating at every micro-batch and failing the query on loss
  (fail-fast X6 — the streaming analog of killing the process).

Steal race: two stealers of one expired lease can both `os.replace`; the
last writer wins and the loser's NEXT heartbeat sees a foreign owner and
fails. The window equals one heartbeat interval — the same at-most-one-
writer-per-lease-interval guarantee a DB lease lock gives. On a shared
filesystem (HDFS/NFS/object store with atomic rename) the same protocol
holds; a real cluster deployment can swap in a DB advisory lock behind
this interface unchanged.
"""

from __future__ import annotations

import os
import tempfile
import time
import uuid

LOCK_NAME = "_event_replicator_lock"  # parity: LockManager.java LOCK_NAME


class LockManager:
    """Lease-file lock: atomic create + owner id + heartbeat mtime."""

    def __init__(self, root: str, owner: str | None = None, lease_seconds: float = 30.0):
        self.path = os.path.join(root, LOCK_NAME)
        self.owner = owner or uuid.uuid4().hex
        self.lease_seconds = lease_seconds
        os.makedirs(root, exist_ok=True)

    # ----------------------------------------------------------- protocol

    def acquire(self) -> bool:
        """Try to take (or re-assert) the lock; never blocks.

        True when this owner holds the lease afterwards: fresh acquire,
        reentrant re-acquire (refreshes the heartbeat, like the advisory
        lock's session scope), or takeover of an expired lease.
        """
        try:
            fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            with os.fdopen(fd, "w") as f:
                f.write(self.owner)
            return True
        except FileExistsError:
            pass
        holder = self._holder()
        if holder == self.owner:
            os.utime(self.path)  # heartbeat on re-assert
            return True
        if holder is not None and self._expired():
            # orphaned lease (holder died without releasing) — steal via
            # atomic replace; a concurrent stealer may win, in which case
            # our next heartbeat detects the foreign owner
            fd, tmp = tempfile.mkstemp(dir=os.path.dirname(self.path))
            with os.fdopen(fd, "w") as f:
                f.write(self.owner)
            os.replace(tmp, self.path)
            return self._holder() == self.owner
        return False

    def heartbeat(self) -> bool:
        """Refresh the lease; False means the lock was lost (foreign owner
        or vanished file) — the caller must stop writing."""
        if self._holder() != self.owner:
            return False
        os.utime(self.path)
        return True

    def release(self) -> None:
        if self._holder() == self.owner:
            os.unlink(self.path)

    # ------------------------------------------------------------ helpers

    def _holder(self) -> str | None:
        try:
            with open(self.path) as f:
                return f.read().strip()
        except FileNotFoundError:
            return None

    def _expired(self) -> bool:
        try:
            return (time.time() - os.path.getmtime(self.path)) > self.lease_seconds
        except FileNotFoundError:
            return False


class LockMonitor:
    """Re-asserts the lock; on loss, fails fast (`LockMonitor.java:52-58`).

    ``on_loss(code)`` is the testable `exit` seam — the default raises
    SystemExit(1), the production wiring inside a streaming query raises to
    fail the query, and tests record the code instead.
    """

    def __init__(self, manager: LockManager, on_loss=None):
        self.manager = manager
        self.on_loss = on_loss or self._default_exit

    @staticmethod
    def _default_exit(code: int) -> None:
        raise SystemExit(code)

    def check_once(self) -> bool:
        if not self.manager.acquire():
            self.on_loss(1)
            return False
        return True

    def run_forever(self, interval_seconds: float = 5.0) -> None:
        """Blocking monitor loop (run in a daemon thread in deployments)."""
        while self.check_once():
            time.sleep(interval_seconds)
