"""Maintenance lease: TTL'd mutual exclusion for plain-parquet lakes.

A plain parquet lake has no commit ledger, so two concurrent
copy-on-write maintainers can silently lose rows: each captures a file
listing at read time, and whichever dynamic-partition-overwrite lands
last replaces the partition from its STALE snapshot — the other
writer's rows vanish without an error (proven in
tests/test_lake_lease.py).  Table formats solve this with optimistic
commit protocols; for this lake the maintenance operations
(:func:`~..sources.lake.compact_lake`, ``delete_from_lake``,
``merge_into_lake``) and the streaming sinks serialize instead behind
one coarse lease — maintenance is rare and partition-granular, so a
single writer at a time costs nothing at 100 TB while removing the
lost-update race entirely.

Mechanics — scheme-portable (file://, hdfs://, s3a:// with a
consistent store) because everything goes through the Hadoop
FileSystem API:

- acquire = atomic ``create(path, overwrite=False)`` of
  ``<lake>/_maintenance.lock`` (underscore-prefixed: invisible to
  Spark's readers).  The payload records holder + a random token.
- a crashed holder cannot deadlock the lake: a lock older than
  ``ttl_sec`` (by the filesystem's own modification time — no clock
  agreement between holders needed) is broken and re-acquired.  Live
  holders must finish within the TTL; pick ``ttl_sec`` above the
  longest expected maintenance run.
- release deletes the lock only if it still carries OUR token — a
  holder whose expired lease was broken must not delete the new
  owner's lock.
"""

from __future__ import annotations

import json
import time
import uuid

LOCK_NAME = "_maintenance.lock"


class LeaseHeldError(RuntimeError):
    """The lake's maintenance lease is held by another live writer."""


class LakeLease:
    """Context manager serializing read-modify-write lake maintenance.

    >>> with LakeLease(spark, lake_path, holder="compactor"):
    ...     # exclusive: no other leased maintainer or sink can interleave
    """

    def __init__(
        self,
        spark,
        lake_path: str,
        holder: str = "maintenance",
        ttl_sec: float = 600.0,
        timeout_sec: float = 60.0,
        poll_sec: float = 0.25,
        lock_path: str | None = None,
    ) -> None:
        self._spark = spark
        self._holder = holder
        self._ttl_sec = float(ttl_sec)
        self._timeout_sec = float(timeout_sec)
        self._poll_sec = float(poll_sec)
        self._token = uuid.uuid4().hex
        # default: inside the lake (underscore file, invisible to scans).
        # Operations that REPLACE the whole directory (IVF rebalance
        # swap) must pass a lock_path OUTSIDE it, or deleting the dir
        # would free the lease mid-swap and let a waiter recreate the
        # directory under the rename.
        self._lock_path = lock_path or (lake_path.rstrip("/") + "/" + LOCK_NAME)
        self._held = False

    # -- Hadoop FS plumbing -------------------------------------------------
    def _fs_and_path(self):
        jpath = self._spark._jvm.org.apache.hadoop.fs.Path(self._lock_path)
        fs = jpath.getFileSystem(self._spark._jsc.hadoopConfiguration())
        return fs, jpath

    def _local_path(self) -> str | None:
        """The POSIX path when the lock lives on the local filesystem,
        else None. Matters for atomicity: Hadoop's LOCAL create(...,
        overwrite=False) is exists-check-then-open — two contending
        threads can both pass the check and both believe they hold the
        lease (caught by the contention stress test). POSIX
        O_CREAT|O_EXCL is genuinely atomic, so local locks go through
        it; on HDFS-like stores create IS an atomic namespace op and
        the Hadoop path is correct."""
        if "://" not in self._lock_path:
            return self._lock_path
        if self._lock_path.startswith("file:"):
            jpath = self._spark._jvm.org.apache.hadoop.fs.Path(self._lock_path)
            return jpath.toUri().getPath()
        return None

    def _try_create(self) -> bool:
        payload = json.dumps(
            {"holder": self._holder, "token": self._token, "ttl_sec": self._ttl_sec}
        ).encode()
        local = self._local_path()
        if local is not None:
            import os as _os

            _os.makedirs(_os.path.dirname(local) or ".", exist_ok=True)
            try:
                fd = _os.open(local, _os.O_CREAT | _os.O_EXCL | _os.O_WRONLY)
            except FileExistsError:
                return False
            except OSError:
                return False
            try:
                _os.write(fd, payload)
            finally:
                _os.close(fd)
            return True
        fs, jpath = self._fs_and_path()
        try:
            out = fs.create(jpath, False)  # atomic on HDFS-like stores
        except Exception:  # FileAlreadyExistsException via py4j
            return False
        try:
            out.write(bytearray(payload))
        finally:
            out.close()
        return True

    def _read_payload(self) -> dict | None:
        fs, jpath = self._fs_and_path()
        try:
            stream = fs.open(jpath)
        except Exception:
            return None  # vanished between exists-check and open
        try:
            try:
                # one py4j call for the whole payload (commons-io ships
                # on the Spark classpath)
                buf = bytes(
                    self._spark._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
                )
            except Exception:
                # fallback: byte-at-a-time (tiny payloads, ~100 bytes)
                acc = bytearray()
                for _ in range(4096):
                    b = stream.read()
                    if b < 0:
                        break
                    acc.append(b)
                buf = bytes(acc)
        finally:
            stream.close()
        try:
            return json.loads(bytes(buf).decode())
        except ValueError:
            return {}

    def _age_sec(self) -> float | None:
        fs, jpath = self._fs_and_path()
        try:
            st = fs.getFileStatus(jpath)
        except Exception:
            return None
        return max(0.0, time.time() - st.getModificationTime() / 1000.0)

    # -- lease protocol ------------------------------------------------------
    def acquire(self) -> "LakeLease":
        deadline = time.time() + self._timeout_sec
        while True:
            if self._try_create():
                self._held = True
                return self
            # the deadline bounds EVERY retry path — including create
            # failing for a non-exists reason (permissions, fs outage),
            # where the lock file never appears and age stays None
            if time.time() >= deadline:
                current = self._read_payload() or {}
                raise LeaseHeldError(
                    f"could not acquire maintenance lease on {self._lock_path} "
                    f"within {self._timeout_sec:.0f}s (held by "
                    f"{current.get('holder', '?')})"
                )
            age = self._age_sec()
            if age is None:
                time.sleep(self._poll_sec)  # just released, or create errors
                continue
            current = self._read_payload() or {}
            ttl = float(current.get("ttl_sec", self._ttl_sec))
            if age > ttl:
                # expired: break it and race to re-create (one winner)
                fs, jpath = self._fs_and_path()
                try:
                    fs.delete(jpath, False)
                except Exception:
                    pass
                continue
            time.sleep(self._poll_sec)

    def release(self) -> None:
        if not self._held:
            return
        self._held = False
        current = self._read_payload()
        if current is not None and current.get("token") not in (None, self._token):
            return  # our lease expired and was taken over: not ours to delete
        fs, jpath = self._fs_and_path()
        try:
            fs.delete(jpath, False)
        except Exception:
            pass

    def __enter__(self) -> "LakeLease":
        return self.acquire()

    def __exit__(self, *exc) -> None:
        self.release()
