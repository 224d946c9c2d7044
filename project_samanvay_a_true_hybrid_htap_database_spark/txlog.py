"""File-backed per-table transaction log — the table-format seam, emulated.

SCALE.md's 100 TB story for the HTAP base ends at "base = Iceberg/Delta
table, overlay = its transaction log"; the sandbox has neither package, so
this module provides the minimal working form of that contract (VERDICT
r12 #6): an append-only directory of numbered manifest files where

  - each commit is ONE small JSON file named by its version
    (``_txlog/%012d.json``) holding the table's FULL layout snapshot
    (base generation, delta segment, external path, row counts) — the
    "replace manifests" style: no action replay is needed, the newest
    readable manifest IS the table state, so the epoch swap readers see
    is O(1) in the base size;
  - the commit point is an atomic put-if-absent: the manifest is written
    to a scratch name and ``os.link``ed to its version name, which FAILS
    if that version was already claimed — the same optimistic-concurrency
    primitive Delta Lake's log store builds on (public protocol: the
    PUT-if-absent of ``_delta_log/<version>.json``);
  - history is retained (bounded) for inspection/audit via
    ``history()``; the engine's physical GC stays vacuum-on-commit
    (retention 0 — old generation DIRS are collected immediately, the
    behavior tests/test_durability.py pins), so manifests older than the
    live one describe layouts whose files are gone, exactly like a
    vacuumed Delta table's history.

Reference anchor: this is the LSM manifest swap of the reference engine
(sstable.hpp write-then-rename; compaction.hpp level manifest) done as a
versioned log instead of a single mutable sidecar pointer — the engine's
``_schemas.json`` sidecar remains the SCHEMA registry, while layout
versioning lives here.

Crash matrix (asserted in tests/test_durability.py):
  - crash before commit: the version file does not exist; recovery reads
    the previous manifest — the freshly written gen/delta dir is garbage
    the next GC retires.
  - crash between txlog commit and sidecar persist: recovery prefers the
    txlog layout (the referenced dirs were fully written BEFORE the
    commit); the not-yet-truncated WAL replays on top, which is
    idempotent under newest-wins merge semantics.
  - torn manifest (unreadable JSON at the newest version): skipped;
    recovery falls back to the newest READABLE version.
"""

from __future__ import annotations

import json
import os
import time


class TxConflictError(RuntimeError):
    """Another writer claimed the version this commit expected to create."""


class TableTxLog:
    """Append-only versioned layout log for one table directory."""

    DIRNAME = "_txlog"
    HISTORY_KEEP = 32  # manifests retained behind the live one
    TMP_SWEEP_AGE_S = 300  # crash-orphaned scratch files older than this are swept

    def __init__(self, table_dir: str) -> None:
        self.table_dir = table_dir
        self.log_dir = os.path.join(table_dir, self.DIRNAME)

    # -- reading ------------------------------------------------------------

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.log_dir, f"{version:012d}.json")

    def versions(self) -> list[int]:
        """Committed versions on disk, ascending (unreadable files included —
        readability is resolved by latest()/read())."""
        if not os.path.isdir(self.log_dir):
            return []
        out = []
        for entry in os.listdir(self.log_dir):
            stem, ext = os.path.splitext(entry)
            if ext == ".json" and stem.isdigit():
                out.append(int(stem))
        return sorted(out)

    def read(self, version: int) -> dict:
        with open(self._manifest_path(version)) as fh:
            return json.load(fh)

    def latest(self) -> tuple[int, dict] | None:
        """Newest READABLE manifest — a torn newest file (crash mid-write of
        a non-atomic copy, manual corruption) falls back one version."""
        for v in reversed(self.versions()):
            try:
                return v, self.read(v)
            except (OSError, json.JSONDecodeError):
                continue
        return None

    def latest_version(self) -> int:
        got = self.latest()
        return got[0] if got else 0

    def history(self, n: int = 10) -> list[dict]:
        """The n newest readable manifests, newest first, each with its
        version under ``"v"`` — the table-format DESCRIBE HISTORY shape."""
        out = []
        for v in reversed(self.versions()):
            if len(out) >= n:
                break
            try:
                doc = self.read(v)
            except (OSError, json.JSONDecodeError):
                continue
            doc.setdefault("v", v)
            out.append(doc)
        return out

    def live_refs(self) -> set[str]:
        """Directory names (relative to the table dir) the newest manifest
        references — the GC keep-set."""
        return self.retained_refs(0)

    def retained_refs(self, retention: int = 0) -> set[str]:
        """GC keep-set spanning the newest ``retention + 1`` readable
        manifests — the time-travel contract (r14): every generation or
        delta dir a RETAINED version references must survive vacuum, so
        ``VERSION AS OF`` stays readable that far back."""
        refs: set[str] = set()
        for m in self.history(retention + 1):
            if m.get("base_dir"):
                refs.add(m["base_dir"])
            if m.get("delta_dir"):
                refs.add(m["delta_dir"])
        return refs

    # -- writing ------------------------------------------------------------

    def commit(self, manifest: dict, expect: int | None = None) -> int:
        """Claim the next version with ``manifest`` (full layout snapshot).

        ``expect`` is the optimistic-concurrency token: the version the
        writer believes is current. If another writer committed since,
        the put-if-absent link fails and TxConflictError surfaces — the
        caller re-reads and retries (the engine itself is single-writer
        under its lock; the check is the multi-writer contract the seam
        needs at cluster scale)."""
        os.makedirs(self.log_dir, exist_ok=True)
        current = self.latest_version()
        if expect is not None and current != expect:
            raise TxConflictError(
                f"expected version {expect}, log is at {current}"
            )
        version = current + 1
        doc = dict(manifest)
        doc["v"] = version
        doc["committed_at"] = time.time()
        tmp = os.path.join(
            self.log_dir, f".tmp.{os.getpid()}.{time.monotonic_ns()}.{version}"
        )
        with open(tmp, "w") as fh:
            json.dump(doc, fh)
            fh.flush()
            os.fsync(fh.fileno())
        final = self._manifest_path(version)
        try:
            # put-if-absent: link fails with EEXIST if the version was
            # claimed by a concurrent writer — never silently overwrite.
            os.link(tmp, final)
        except FileExistsError as exc:
            self._reclaim_or_conflict(tmp, final, version, exc)
        finally:
            try:
                os.unlink(tmp)
            except OSError:
                pass
        self._fsync_dir()
        self._prune(version)
        return version

    def _reclaim_or_conflict(
        self, tmp: str, final: str, version: int, exc: FileExistsError
    ) -> None:
        """Handle EEXIST on the put-if-absent link.

        A link-committed manifest is atomically complete, so an
        existing-but-UNREADABLE file at this slot can only be external
        garbage (latest() already skipped it, which is how ``version``
        landed on it). Reclaim the slot instead of wedging every future
        commit behind a permanent conflict; a READABLE occupant is a
        genuine concurrent commit and conflicts.

        The reclaim avoids the check-then-replace TOCTOU: the occupant is
        atomically RENAMED ASIDE first and only then inspected. If what we
        displaced turns out to be a readable manifest — a genuine commit
        that raced into the slot between our read and the rename — it is
        restored via the same put-if-absent link and the commit conflicts;
        nothing is ever silently overwritten. (Residual window: if a THIRD
        writer claims the vacated slot before the restore link, the
        displaced commit and the new claimant both believe they own the
        version — that needs a compare-and-swap the filesystem doesn't
        offer, can only trigger when external garbage was injected
        mid-flight, and is surfaced loudly as TxConflictError here.)
        """
        try:
            self.read(version)
        except (OSError, json.JSONDecodeError):
            pass
        else:
            raise TxConflictError(
                f"version {version} already committed"
            ) from exc
        quarantine = f"{tmp}.displaced"
        try:
            os.replace(final, quarantine)  # atomically vacate the slot
        except FileNotFoundError:
            pass  # occupant vanished (another reclaimer won); retry the link
        try:
            displaced_readable = False
            try:
                with open(quarantine) as fh:
                    json.load(fh)
                displaced_readable = True
            except (OSError, json.JSONDecodeError):
                pass
            if displaced_readable:
                # We displaced a genuine commit that raced in after our
                # read: put it back (put-if-absent again) and conflict.
                try:
                    os.link(quarantine, final)
                except FileExistsError:
                    pass  # slot re-claimed meanwhile; conflict either way
                raise TxConflictError(
                    f"version {version} already committed"
                ) from exc
            # Occupant was garbage and the slot is vacated: retry the
            # put-if-absent. A new EEXIST is a genuine racing commit.
            try:
                os.link(tmp, final)
            except FileExistsError as exc2:
                raise TxConflictError(
                    f"version {version} already committed"
                ) from exc2
        finally:
            try:
                os.unlink(quarantine)
            except OSError:
                pass

    def _fsync_dir(self) -> None:
        """Persist the _txlog directory entry itself — without this, a
        power loss after os.link can lose the 'committed' version even
        though the manifest bytes were fsynced (commit-point contract)."""
        try:
            fd = os.open(self.log_dir, os.O_RDONLY)
        except OSError:
            return
        try:
            os.fsync(fd)
        except OSError:
            pass
        finally:
            os.close(fd)

    def _prune(self, live_version: int) -> None:
        self._sweep_stale_tmp()
        floor = live_version - self.HISTORY_KEEP
        if floor <= 0:
            return
        for v in self.versions():
            if v < floor:
                try:
                    os.unlink(self._manifest_path(v))
                except OSError:
                    pass

    def _sweep_stale_tmp(self) -> None:
        """Remove crash-orphaned ``.tmp.*`` scratch files. The creating
        call unlinks its own tmp in a finally:, but a crash between write
        and cleanup leaves it forever; age-gate so a LIVE concurrent
        writer's in-flight scratch is never yanked out from under it."""
        now = time.time()
        try:
            entries = os.listdir(self.log_dir)
        except OSError:
            return
        for entry in entries:
            if not entry.startswith(".tmp."):
                continue
            path = os.path.join(self.log_dir, entry)
            try:
                if now - os.path.getmtime(path) > self.TMP_SWEEP_AGE_S:
                    os.unlink(path)
            except OSError:
                pass
