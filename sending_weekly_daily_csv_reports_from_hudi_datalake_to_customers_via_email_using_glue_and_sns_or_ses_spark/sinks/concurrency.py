"""Multi-writer safety for KeyedTable (SURVEY.md §2.5 P9): optimistic
concurrency control in the shape Hudi's public OCC model defines
(hoodie.write.concurrency.mode=OPTIMISTIC_CONCURRENCY_CONTROL plus a
lock provider — the reference configures the DynamoDB provider,
generate_hudi_table.py:174-175 / template.py:48; this emulation ships
the filesystem and in-process providers, Hudi's other two public
options).

The protocol, matching Hudi's documented behavior:

  1. A writer snapshots the table's latest completed instant at
     transaction start (``base_instant``).
  2. The write is planned optimistically — no lock held while the
     incoming batch is combined/deduped.
  3. The COMMIT phase runs under the table lock: detect conflicts
     (any concurrent commit since ``base_instant`` whose touched
     record keys overlap this write's keys), then merge-and-publish.
     Non-overlapping concurrent commits are NOT conflicts — the merge
     under the lock reads the now-current snapshot, so the write
     rebases onto them automatically.
  4. On overlap the writer aborts with ``CommitConflictError`` and the
     caller retries (Hudi: ``HoodieWriteConflictException``).

Scale note: the conflict check is one broadcast-able left-semi join of
the concurrent commits' log rows (bounded: commits-since-base only)
against the incoming keys — never a table scan. Holding the lock for
the merge+publish serializes only the commit phase, exactly the
critical section Hudi's timeline lock covers.
"""

from __future__ import annotations

import os
import threading
import time


class LockAcquireTimeout(Exception):
    """Could not acquire the table lock within the timeout."""


class CommitConflictError(Exception):
    """A concurrent commit touched overlapping record keys; retry the
    write (Hudi's HoodieWriteConflictException equivalent)."""

    def __init__(self, conflicting_commits: list[str], n_overlapping: int):
        self.conflicting_commits = conflicting_commits
        self.n_overlapping = n_overlapping
        super().__init__(
            f"{n_overlapping} overlapping key(s) written by concurrent "
            f"commit(s) {conflicting_commits}; retry the transaction"
        )


class InProcessLockProvider:
    """Hudi's InProcessLockProvider equivalent: serializes writers that
    share one JVM/driver process (threads in one Spark application)."""

    def __init__(self) -> None:
        self._lock = threading.Lock()

    def try_lock(self, timeout_s: float = 60.0) -> bool:
        return self._lock.acquire(timeout=timeout_s)

    def unlock(self) -> None:
        self._lock.release()


class FileSystemLockProvider:
    """Hudi's FileSystemBasedLockProvider equivalent: an atomically
    created lock file under the table root serializes writers across
    processes. Atomic-create (O_EXCL) is the mutual-exclusion primitive
    — valid on local FS and HDFS; on S3 prefer a conditional-put or
    external lock service, same caveat Hudi documents.

    ``ttl_s`` bounds crashed-writer livelock: a lock file older than the
    TTL is presumed abandoned and broken (Hudi's
    FILESYSTEM_LOCK_EXPIRE equivalent).
    """

    def __init__(self, lock_path: str, ttl_s: float = 600.0) -> None:
        self.lock_path = lock_path
        self.ttl_s = ttl_s

    def try_lock(self, timeout_s: float = 60.0, poll_s: float = 0.05) -> bool:
        deadline = time.monotonic() + timeout_s
        while True:
            try:
                fd = os.open(self.lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                try:
                    os.write(fd, f"{os.getpid()} {time.time()}".encode())
                finally:
                    os.close(fd)
                return True
            except FileExistsError:
                self._break_if_stale()
                if time.monotonic() >= deadline:
                    return False
                time.sleep(poll_s)

    def _break_if_stale(self) -> None:
        try:
            age = time.time() - os.stat(self.lock_path).st_mtime
            if age > self.ttl_s:
                os.remove(self.lock_path)
        except FileNotFoundError:
            pass  # holder released (or another waiter broke it) — race is benign

    def unlock(self) -> None:
        try:
            os.remove(self.lock_path)
        except FileNotFoundError:
            pass
