"""Object-store-semantics `CommitBackend` — the second implementation
of the storage seam (`store.CommitBackend`), proving the snapshot
protocol against a medium whose ONLY primitives are:

- conditional PUT (create-if-absent) — S3 ``If-None-Match: *`` /
  GCS ``ifGenerationMatch=0`` / ABFS ETag precondition,
- plain PUT (atomic whole-object, last-writer-wins),
- GET / HEAD (read-after-write consistent per key),
- LIST by prefix (MAY lag recent puts — eventual list consistency),
- DELETE.

No rename. No hard links. No directories. No partial writes (an
object is visible in full or not at all). These are exactly the
guarantees every major object store provides, so a real S3/GCS/ABFS
backend is this class with the dict swapped for an SDK client; the
snapshot protocol (`store.SnapshotStore`) runs unmodified on either
backend — pinned by running the store concurrency/crash test matrix
under both (tests/test_mor.py, test_zonemap.py, test_bloom.py,
test_objectstore.py).

The emulation is a process-global namespace (`_NS`) so multiple
`SnapshotStore` instances — concurrent writers in the race tests —
share one object space exactly like two writers sharing a bucket.
Atomicity per key is one lock (a real store's internal linearization
point). Fault injection:

- ``list_lag=N`` makes every LIST omit the N most recently CREATED
  keys — the classic eventual-list-consistency hazard (pre-2020 S3,
  GCS today under some conditions). The protocol must stay correct:
  commits resolve via the HEAD cache + per-key forward probe, never
  via listing freshness (tests/test_objectstore.py pins it).
- ``fail_next(op)`` arms a one-shot exception raised BEFORE the named
  op commits — the crash-window injection used by the exactly-once
  replay tests.

Reference analog: the reference's pluggable persistence seam
(`packages/core/src/persistence/storage.ts`,
`file_system_storage.ts:1-100`) with the filesystem swapped out.
"""

from __future__ import annotations

import threading

from .store import CommitBackend


class _Namespace:
    """path -> (create_seq, content); one lock = per-key atomicity."""

    def __init__(self) -> None:
        self.lock = threading.Lock()
        self.objects: dict[str, tuple[int, str]] = {}
        self.seq = 0


_NS = _Namespace()


def reset_object_store() -> None:
    """Test hygiene: drop every emulated object (a fresh bucket)."""
    with _NS.lock:
        _NS.objects.clear()
        _NS.seq = 0


def object_count() -> int:
    with _NS.lock:
        return len(_NS.objects)


class ObjectStoreCommitBackend(CommitBackend):
    """See module docstring. `list_lag` keys created most recently are
    invisible to `list_names` (but fully visible to GET/HEAD — per-key
    reads are strongly consistent on every major store)."""

    def __init__(self, list_lag: int = 0):
        assert list_lag >= 0
        self.list_lag = int(list_lag)
        self._fail_next: str | None = None

    # -- fault injection ---------------------------------------------------

    def fail_next(self, op: str) -> None:
        """Arm a one-shot injected failure before the next `op`
        ('create_exclusive' | 'write_advisory') commits — simulates a
        crash in the window where the request never reached the store."""
        self._fail_next = op

    def _maybe_fail(self, op: str) -> None:
        if self._fail_next == op:
            self._fail_next = None
            raise OSError(
                f"injected {op} failure (simulated crash before the PUT "
                "committed — the object must NOT exist)"
            )

    # -- write primitives ----------------------------------------------------

    def create_exclusive(self, path: str, content: str) -> bool:
        self._maybe_fail("create_exclusive")
        with _NS.lock:
            if path in _NS.objects:
                return False
            _NS.seq += 1
            _NS.objects[path] = (_NS.seq, content)
            return True

    def write_advisory(self, path: str, content: str) -> None:
        self._maybe_fail("write_advisory")
        with _NS.lock:
            prev = _NS.objects.get(path)
            if prev is not None:
                # overwrite: content replaced, create seq unchanged — the
                # key was already listable, and an overwrite must NOT
                # advance the global seq either: the LIST horizon is
                # seq - list_lag, so bumping it here would prematurely
                # reveal the lag-hidden most-recently-CREATED keys and
                # weaken the fault injection the docstring promises
                _NS.objects[path] = (prev[0], content)
            else:
                _NS.seq += 1  # fresh key enters the lag window
                _NS.objects[path] = (_NS.seq, content)

    # -- read primitives -------------------------------------------------------

    def read_text(self, path: str) -> str:
        with _NS.lock:
            if path not in _NS.objects:
                raise FileNotFoundError(path)
            return _NS.objects[path][1]

    def exists(self, path: str) -> bool:
        with _NS.lock:
            return path in _NS.objects

    def list_names(self, dirpath: str) -> list[str]:
        prefix = dirpath.rstrip("/") + "/"
        with _NS.lock:
            horizon = _NS.seq - self.list_lag
            out = []
            for p, (cseq, _) in _NS.objects.items():
                if p.startswith(prefix) and cseq <= horizon:
                    rest = p[len(prefix):]
                    if "/" not in rest:  # prefix listing with delimiter
                        out.append(rest)
        return sorted(out)

    def remove(self, path: str) -> None:
        with _NS.lock:
            _NS.objects.pop(path, None)
