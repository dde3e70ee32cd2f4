"""Iceberg-style chunk store: manifests + snapshots + atomic commit.

The store replaces the reference's single output Parquet file (converter ctor
+ close, ref NQ:3385-3398/3772-3774) with a resumable table of compressed
column chunks:

    <root>/chunks/chunk-p<pid>-s<seq>-<tag>.owrc     column payloads + footer
    <root>/manifests/manifest-<n>.parquet            one row per column chunk
    <root>/snapshots/snapshot-<n>.json               manifest list + lineage
    <root>/_current                                  name of live snapshot

Commit protocol (single-writer, Iceberg-flavored): write the new manifest
parquet, write snapshot-<n>.json referencing parent snapshot + all live
manifests, then atomically os.replace() the _current pointer. A crash before
the pointer flip leaves the previous snapshot live and the new chunk files
orphaned (ignored by readers, removable by GC). Resume = the set of committed
partition ids in the live snapshot; the encode job anti-joins its work units
against it (SURVEY.md §2.2).

No Iceberg runtime jar exists in this sandbox (verified); the snapshot JSON
convention keeps identical semantics and would swap for Iceberg REPLACE
commits on a real deployment.
"""

from __future__ import annotations

import json
import os
import time
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

from omi_cpp_parquet_wide_record_spark.version import (
    engine_fingerprint as _engine_fingerprint,
)

MANIFEST_SCHEMA = pa.schema([
    ("chunk_file", pa.string()),
    ("pid", pa.int32()),          # resume/partition unit
    ("seq", pa.int32()),          # chunk sequence within pid
    ("column", pa.string()),
    ("codec", pa.string()),
    ("params", pa.string()),      # JSON
    ("rows", pa.int64()),
    ("nulls", pa.int64()),
    ("bytes_in", pa.int64()),     # plain-equivalent input bytes
    ("bytes_out", pa.int64()),
    ("offset", pa.int64()),
    ("length", pa.int64()),
    ("sha256", pa.string()),
    ("run_id", pa.string()),
    # zone maps: JSON-encoded min/max of the chunk's non-null values
    # (Iceberg's lower_bounds/upper_bounds) — readers prune whole chunk
    # files whose stats cannot satisfy a predicate
    ("stat_min", pa.string()),
    ("stat_max", pa.string()),
    # per-chunk Bloom filter over bytes-like columns (Iceberg's
    # bloom-filter metadata): base64 bitset for equality pruning where
    # min/max ranges are too wide to help (high-cardinality urls).
    # Nullable — older manifests pad, non-eligible columns stay null.
    ("bloom", pa.string()),
])


class CommitConflict(RuntimeError):
    """Optimistic-concurrency failure: the table head moved between the
    snapshot a commit was derived from and the commit itself (Iceberg's
    validation failure). Re-derive and retry."""


class ChunkStore:
    def __init__(self, root: str):
        self.root = root
        self.chunks_dir = os.path.join(root, "chunks")
        self.manifests_dir = os.path.join(root, "manifests")
        self.snapshots_dir = os.path.join(root, "snapshots")
        self.deletes_dir = os.path.join(root, "deletes")
        self.current_path = os.path.join(root, "_current")
        self.refs_path = os.path.join(root, "refs.json")

    def create(self) -> "ChunkStore":
        for d in (self.chunks_dir, self.manifests_dir, self.snapshots_dir,
                  self.deletes_dir):
            os.makedirs(d, exist_ok=True)
        return self

    # ------------------------------------------------------------- reading

    def current_snapshot(self) -> dict | None:
        if not os.path.exists(self.current_path):
            return None
        with open(self.current_path) as f:
            name = f.read().strip()
        with open(os.path.join(self.snapshots_dir, name)) as f:
            return json.load(f)

    def snapshot_at(self, n: int) -> dict:
        """Time travel: load committed snapshot #n (Iceberg's
        snapshot-id / as-of read). Raises if expired or never committed."""
        path = os.path.join(self.snapshots_dir, f"snapshot-{n:05d}.json")
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"snapshot {n} not found under {self.snapshots_dir} "
                "(expired by GC or never committed)")
        with open(path) as f:
            return json.load(f)

    # ------------------------------------------------------- refs (tags)

    def refs(self) -> dict:
        """Named snapshot refs (Iceberg table refs):
        {"tags": {name: n}, "branches": {name: n}}. Tags are immutable
        pointers into history; branches are mutable heads that advance
        with branch commits (the write-audit-publish staging lane). GC
        retains ref'd snapshots (and everything they reference)
        regardless of keep_last."""
        if not os.path.exists(self.refs_path):
            return {"tags": {}, "branches": {}}
        with open(self.refs_path) as f:
            out = json.load(f)
        out.setdefault("tags", {})
        out.setdefault("branches", {})
        return out

    def _write_refs(self, refs: dict) -> None:
        tmp = self.refs_path + f".tmp.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(refs, f)
        os.replace(tmp, self.refs_path)

    def _commit_lock(self, timeout_s: float = 120.0,
                     stale_s: float = 600.0):
        """Exclusive lock over the metadata critical section (parent
        read -> snapshot/refs write -> pointer flip). Two concurrent
        commits previously raced read-modify-write on `_current`/
        `refs.json` — the loser's commit silently vanished from the
        lineage. O_CREAT|O_EXCL on a lock file serializes writers on a
        POSIX filesystem (commits are metadata-fast, so contention is
        milliseconds); a holder that crashed is broken after
        ``stale_s`` via the lock file's mtime. On an object store this
        slot is where a catalog's atomic compare-and-swap goes —
        exactly Iceberg's commit protocol."""
        from contextlib import contextmanager

        @contextmanager
        def _lock():
            path = os.path.join(self.root, "_commit.lock")
            deadline = time.time() + timeout_s
            token = f"{os.getpid()}-{uuid.uuid4().hex}"
            while True:
                try:
                    fd = os.open(path,
                                 os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                    os.write(fd, token.encode())
                    os.close(fd)
                    break
                except FileExistsError:
                    try:
                        if time.time() - os.path.getmtime(path) > stale_s:
                            # break a crashed holder by RENAME, not
                            # remove: two waiters both judging the lock
                            # stale race their breaks, and a remove
                            # could delete the lock a faster waiter
                            # already re-acquired (double-holder); only
                            # ONE rename of the same source succeeds,
                            # the loser gets ENOENT and loops
                            os.rename(path, path +
                                      f".stale.{uuid.uuid4().hex[:8]}")
                            continue
                    except OSError:
                        continue                # vanished: retry acquire
                    if time.time() > deadline:
                        raise TimeoutError(
                            f"commit lock at {path} held for over "
                            f"{timeout_s}s — concurrent writer stuck?")
                    time.sleep(0.02)
            try:
                yield
            finally:
                # release only OUR lock: if this holder overran stale_s
                # and a waiter broke+reacquired, the file now carries a
                # different token — removing it would unseat the new
                # holder (double-holder)
                try:
                    with open(path) as f:
                        if f.read() == token:
                            os.remove(path)
                except OSError:
                    pass
        return _lock()

    def create_tag(self, name: str, snapshot: int | None = None) -> dict:
        """Tag a committed snapshot (default: the live one). Rejects
        duplicates — retag by removing first (tags are immutable)."""
        import re
        if not re.fullmatch(r"[A-Za-z0-9._-]+", name or ""):
            raise ValueError(f"invalid tag name {name!r} "
                             "(use letters, digits, . _ -)")
        snap = self.snapshot_at(snapshot) if snapshot is not None \
            else self.current_snapshot()
        if snap is None:
            raise FileNotFoundError(f"no committed snapshot under "
                                    f"{self.root}")
        with self._commit_lock():
            refs = self.refs()
            if name in refs["tags"]:
                raise ValueError(f"tag {name!r} already exists "
                                 f"(at snapshot {refs['tags'][name]})")
            if name == "main" or name in refs["branches"]:
                raise ValueError(f"tag name {name!r} collides with "
                                 "'main' or an existing branch")
            refs["tags"][name] = int(snap["n"])
            self._write_refs(refs)
        return {"tag": name, "snapshot": int(snap["n"])}

    def remove_tag(self, name: str) -> dict:
        with self._commit_lock():
            refs = self.refs()
            if name not in refs["tags"]:
                raise KeyError(f"no tag {name!r} "
                               f"(tags: {sorted(refs['tags'])})")
            n = refs["tags"].pop(name)
            self._write_refs(refs)
        return {"tag": name, "snapshot": int(n)}

    def resolve_ref(self, ref: str) -> dict:
        """Snapshot a ref name points at (branch or tag lookup; 'main'
        is the live snapshot). Branches shadow tags on a name clash
        (creation rejects clashes, so only pre-existing stores hit
        this)."""
        if ref == "main":
            snap = self.current_snapshot()
            if snap is None:
                raise FileNotFoundError(
                    f"no committed snapshot under {self.root}")
            return snap
        refs = self.refs()
        if ref in refs["branches"]:
            return self.snapshot_at(int(refs["branches"][ref]))
        if ref not in refs["tags"]:
            raise KeyError(
                f"no ref {ref!r} (tags: {sorted(refs['tags'])}, "
                f"branches: {sorted(refs['branches'])})")
        return self.snapshot_at(int(refs["tags"][ref]))

    def branch_head(self, branch: str) -> dict | None:
        """The snapshot a branch currently points at, or — before the
        branch's first commit — the fork point (the live main snapshot),
        or None on an empty store."""
        refs = self.refs()
        if branch in refs["branches"]:
            return self.snapshot_at(int(refs["branches"][branch]))
        return self.current_snapshot()

    def _next_n(self) -> int:
        """Globally unique next commit number: branch commits and main
        commits share one n sequence (snapshot filenames embed n), so
        the next n is max-over-all-snapshots + 1, not parent.n + 1."""
        ns = [-1]
        if os.path.isdir(self.snapshots_dir):
            for name in os.listdir(self.snapshots_dir):
                try:
                    ns.append(int(name.split("-")[1].split(".")[0]))
                except (IndexError, ValueError):
                    pass
        return max(ns) + 1

    def fast_forward(self, branch: str) -> dict:
        """Publish a branch (Iceberg fast_forward / the P of
        write-audit-publish): flip `_current` to the branch head in one
        atomic pointer swap — every row staged on the branch becomes
        visible to main readers at once, or not at all. Requires the
        current main head to be an ancestor of the branch head (walked
        over parent_id), so a fast-forward can never silently discard
        main commits that landed after the fork."""
        with self._commit_lock():
            return self._fast_forward_locked(branch)

    def _fast_forward_locked(self, branch: str) -> dict:
        refs = self.refs()
        if branch not in refs["branches"]:
            raise KeyError(f"no branch {branch!r} "
                           f"(branches: {sorted(refs['branches'])})")
        head_n = int(refs["branches"][branch])
        head = self.snapshot_at(head_n)
        cur = self.current_snapshot()
        if cur is not None:
            # one snapshots() load, dict-walked — the per-ancestor
            # re-scan was O(chain x snapshots) file reads under the lock
            by_id = {s["snapshot_id"]: s for s in self.snapshots()
                     if "snapshot_id" in s}
            ids = set()
            walk: dict | None = head
            while walk is not None:
                ids.add(walk["snapshot_id"])
                walk = by_id.get(walk.get("parent_id"))
            if cur["snapshot_id"] not in ids:
                raise ValueError(
                    f"cannot fast-forward: main head {cur['n']} is not "
                    f"an ancestor of branch {branch!r} head {head_n} — "
                    "main advanced since the fork; re-stage the branch")
        tmp = self.current_path + f".tmp.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            f.write(f"snapshot-{head_n:05d}.json")
        os.replace(tmp, self.current_path)
        return {"branch": branch, "published": head_n}

    def drop_branch(self, branch: str) -> dict:
        with self._commit_lock():
            refs = self.refs()
            if branch not in refs["branches"]:
                raise KeyError(f"no branch {branch!r} "
                               f"(branches: {sorted(refs['branches'])})")
            n = refs["branches"].pop(branch)
            self._write_refs(refs)
        return {"branch": branch, "snapshot": int(n)}

    def rollback_to(self, snapshot: int, run_id: str | None = None) -> dict:
        """Iceberg rollback: commit a NEW snapshot whose content is
        exactly snapshot #``snapshot``'s — manifests, deletes, schema,
        aliases, rewrite state all restored — under a fresh commit
        number. History is preserved: the undone snapshots stay readable
        by time travel until GC expires them, and the rollback itself is
        one atomic pointer flip."""
        with self._commit_lock():
            return self._rollback_locked(snapshot, run_id)

    def _rollback_locked(self, snapshot: int, run_id: str | None) -> dict:
        target = self.snapshot_at(int(snapshot))
        head = self.current_snapshot()
        if head is None:
            raise FileNotFoundError(f"no committed snapshot under "
                                    f"{self.root}")
        n = self._next_n()
        snap = {
            **target,
            "n": n,
            "snapshot_id": uuid.uuid4().hex,
            "parent_id": head["snapshot_id"],
            "created_ms": int(time.time() * 1000),
            "run_id": run_id or uuid.uuid4().hex,
            "rollback_of": int(snapshot),
        }
        sname = f"snapshot-{n:05d}.json"
        self._write_snapshot_json(sname, snap)
        tmp = self.current_path + f".tmp.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            f.write(sname)
        os.replace(tmp, self.current_path)
        return snap

    def snapshots(self) -> list[dict]:
        """All retained snapshots, oldest first (the table history)."""
        out = []
        for name in sorted(os.listdir(self.snapshots_dir)):
            with open(os.path.join(self.snapshots_dir, name)) as f:
                out.append(json.load(f))
        return out

    @staticmethod
    def manifest_commit_n(snap: dict, manifest_name: str) -> int:
        """Commit (sequence) number of one manifest in a snapshot — from
        the snapshot's manifest_n record, falling back to the number
        encoded in pre-sharding manifest filenames. The single source of
        truth for delete-scoping epochs (decode_store AND the owrc
        DataSource reader)."""
        man_n = snap.get("manifest_n", {})
        if manifest_name in man_n:
            return int(man_n[manifest_name])
        return int(manifest_name.split("-")[1])

    def committed_pids(self) -> set[int]:
        snap = self.current_snapshot()
        return set(snap["committed_pids"]) if snap else set()

    def committed_run_ids(self, snapshot: dict | None = None) -> set[str]:
        """Every run_id in the live (or given — e.g. a branch head's)
        snapshot's manifest lineage (commits append parent manifests, so
        this covers the whole history) — the epoch-level replay guard
        for streaming encode. Reads ONLY the run_id column of each
        manifest: the streaming sink calls this per micro-batch and a
        full manifest_table() read grew linearly with stream history."""
        snap = snapshot if snapshot is not None \
            else self.current_snapshot()
        if not snap:
            return set()
        out: set[str] = set()
        for m in snap.get("manifests", []):
            t = pq.read_table(os.path.join(self.manifests_dir, m),
                              columns=["run_id"])
            out.update(t.column("run_id").to_pylist())
        return out

    @staticmethod
    def alias_map(snap: dict | None) -> dict[str, list[str]]:
        """Schema-evolution aliases: {live column name: [retired physical
        names, oldest first]}. A chunk written before a rename carries a
        retired name; readers resolve it to the live name. Name reuse is
        blocked at evolve time (``retired_names``), so a physical name
        maps to at most one live column — the poor man's Iceberg field
        id."""
        return {k: list(v)
                for k, v in ((snap or {}).get("column_aliases") or {})
                .items()}

    @staticmethod
    def live_name_of(snap: dict | None, physical: str) -> str:
        """The live column name a physical (chunk/delete-file) column
        resolves to under this snapshot's aliases — itself if never
        renamed."""
        for live, olds in ChunkStore.alias_map(snap).items():
            if physical in olds:
                return live
        return physical

    @staticmethod
    def rewritten_pids_for(snap: dict | None, manifest_name: str
                           ) -> set[int]:
        """Pids whose rows in ``manifest_name`` were superseded by a
        later pid-scoped rewrite in this snapshot's lineage: every pid p
        with pid_rewrites[p] > the manifest's commit number. Readers
        must drop those rows — the rewrite manifest holds their live
        replacement."""
        rw = (snap or {}).get("pid_rewrites") or {}
        if not rw:
            return set()
        n_m = ChunkStore.manifest_commit_n(snap, manifest_name)
        return {int(p) for p, rn in rw.items() if int(rn) > n_m}

    def manifest_table(self, snapshot: dict | None = None,
                       with_commit_n: bool = False) -> pa.Table:
        """All LIVE manifest rows of a snapshot (default: the live one)
        — rows superseded by a pid-scoped rewrite are dropped here, so
        every driver-side consumer (planning, metrics, pruning, GC's
        per-snapshot liveness) sees the post-rewrite view.

        ``with_commit_n=True`` appends each row's manifest COMMIT number
        as an int32 ``commit_n`` column (from the snapshot's manifest_n
        record — driver-side metadata, no extra I/O). Sequence-scoped
        delete reads derive per-chunk epochs from this instead of
        re-reading every manifest parquet on the driver (VERDICT r4 #6)."""
        snap = snapshot or self.current_snapshot()
        empty = MANIFEST_SCHEMA.empty_table()
        if with_commit_n:
            empty = empty.append_column(
                "commit_n", pa.array([], type=pa.int32()))
        if not snap or not snap["manifests"]:
            return empty
        tables = []
        for m in snap["manifests"]:
            t = pq.read_table(os.path.join(self.manifests_dir, m))
            # manifests written before the zone-map columns: pad with nulls
            for f in MANIFEST_SCHEMA:
                if f.name not in t.schema.names:
                    t = t.append_column(
                        f.name, pa.nulls(t.num_rows, type=f.type))
            t = t.select(MANIFEST_SCHEMA.names)
            dropped = self.rewritten_pids_for(snap, m)
            if dropped:
                import pyarrow.compute as pc
                t = t.filter(pc.invert(pc.is_in(
                    t.column("pid"),
                    value_set=pa.array(sorted(dropped),
                                       type=t.schema.field("pid").type))))
            if t.num_rows == 0:
                continue
            if with_commit_n:
                n = self.manifest_commit_n(snap, m)
                t = t.append_column("commit_n", pa.array(
                    [n] * t.num_rows, type=pa.int32()))
            tables.append(t)
        if not tables:
            return empty
        out = pa.concat_tables(tables)
        # schema evolution: canonicalize retired physical column names to
        # their live names, so every driver-side consumer (zone/bloom/null
        # pruning, metrics, rewrite selection) sees ONE logical column per
        # live name — pre-rename chunks keep pruning after the rename
        aliases = self.alias_map(snap)
        if aliases:
            import pyarrow.compute as pc
            col = out.column("column")
            for live, olds in aliases.items():
                col = pc.if_else(
                    pc.is_in(col, value_set=pa.array(olds)),
                    pa.scalar(live), col)
            out = out.set_column(out.schema.get_field_index("column"),
                                 out.schema.field("column"),
                                 col.combine_chunks()
                                 if isinstance(col, pa.ChunkedArray)
                                 else col)
        return out

    def arrow_schema(self, snapshot: dict | None = None) -> pa.Schema:
        snap = snapshot or self.current_snapshot()
        if snap is None:
            raise FileNotFoundError(f"no committed snapshot under {self.root}")
        import base64
        return pa.ipc.read_schema(
            pa.py_buffer(base64.b64decode(snap["schema_ipc"])))

    # ------------------------------------------------------------ commit

    def commit(self, manifest: pa.Table | list[str], schema: pa.Schema,
               run_id: str, stats: dict | None = None,
               replace: bool = False,
               new_pids: set[int] | None = None,
               add_delete: tuple[pa.Table, str] | None = None,
               rewrite_pids: set[int] | None = None,
               column_aliases: dict[str, list[str]] | None = None,
               retired_names: list[str] | None = None,
               branch: str | None = None,
               expected_parent_id: str | None = None) -> dict:
        """Append a manifest and flip the snapshot pointer atomically.

        ``manifest`` is either a driver-held Arrow table (written here as
        one manifest file) or a list of manifest SHARD file names the
        encode tasks already wrote executor-side into ``manifests_dir``.
        The sharded form is the at-scale path: chunk-level manifest rows
        scale with the data (one row per chunk column — tens of millions
        at corpus scale), so they must never be collected to the driver;
        only the shard NAMES (one per task) and the pid-level rollup reach
        the commit. ``new_pids`` is required with the sharded form.

        ``replace=True`` is the Iceberg REPLACE commit: the new snapshot
        references only this manifest (prior data, deletes, and pids drop
        out of the live view but stay readable via time travel until GC).

        ``add_delete=(keys, key_col)`` commits an equality-delete file IN
        THE SAME snapshot as the appended manifest (the MERGE/upsert
        shape): the delete is sequence-scoped at this commit's n, so it
        anti-joins only data from manifests committed BEFORE it — the
        rows appended here are exempt. One atomic pointer flip gives
        replace-by-key semantics with no intermediate deleted-but-not-
        replaced state ever visible to readers.

        ``rewrite_pids`` marks this commit as a pid-scoped REWRITE
        (Iceberg rewrite_data_files): the committed manifest holds the
        compacted replacement for those work units, and the snapshot's
        ``pid_rewrites`` map records {pid: this n} so readers drop each
        rewritten pid's rows from every manifest committed BEFORE this
        one — the same sequence-scoping deletes use, at pid granularity.
        This commit's manifests are also recorded in
        ``rewrite_manifests`` so INCREMENTAL readers (since_snapshot)
        skip them: a rewrite reorganizes bytes, it appends no logical
        rows (Iceberg's incremental scans skip replace snapshots the
        same way).

        ``column_aliases`` / ``retired_names`` replace the carried-forward
        schema-evolution state (set by ``evolve_schema`` when a commit
        renames or drops columns); by default both carry over from the
        parent unchanged.

        ``branch="name"`` stages the commit on a branch (Iceberg
        write-audit-publish): the parent is the branch head (or the
        current main snapshot at the fork), and the commit advances the
        branch ref instead of `_current` — main readers see nothing
        until ``fast_forward`` publishes the branch in one atomic
        pointer flip.

        The whole parent-read -> write -> pointer-flip section runs
        under the store's commit lock (see ``_commit_lock``), so
        concurrent writers serialize instead of silently losing the
        race on `_current`/`refs.json`.

        ``expected_parent_id`` is the optimistic-concurrency check
        (Iceberg's commit CAS): the caller derived this commit's
        content from a snapshot read BEFORE the lock — schema
        evolution from the head schema, a pid rewrite from a planned
        file set — and a head that moved in between would make that
        derivation stale (lost columns, lost rows). On mismatch the
        commit raises ``CommitConflict`` instead of clobbering.
        """
        self.create()
        with self._commit_lock():
            return self._commit_locked(
                manifest, schema, run_id, stats, replace, new_pids,
                add_delete, rewrite_pids, column_aliases, retired_names,
                branch, expected_parent_id)

    def _commit_locked(self, manifest, schema, run_id, stats, replace,
                       new_pids, add_delete, rewrite_pids,
                       column_aliases, retired_names, branch,
                       expected_parent_id=None) -> dict:
        import base64
        import re
        if branch is not None:
            if not re.fullmatch(r"[A-Za-z0-9._-]+", branch):
                raise ValueError(f"invalid branch name {branch!r} "
                                 "(use letters, digits, . _ -)")
            if branch == "main" or branch in self.refs()["tags"]:
                raise ValueError(
                    f"branch name {branch!r} collides with 'main' or an "
                    "existing tag")
            parent = self.branch_head(branch)
        else:
            parent = self.current_snapshot()
        if expected_parent_id is not None and (
                parent is None
                or parent.get("snapshot_id") != expected_parent_id):
            raise CommitConflict(
                f"head moved since this commit was derived (expected "
                f"parent {expected_parent_id}, found "
                f"{parent.get('snapshot_id') if parent else None}) — "
                "re-derive against the new head and retry")
        # retired-name guard UNDER the lock (ADVICE r5): writers check it
        # against the head they read before the lock, but a concurrent
        # evolve can retire a name in between — re-validate against the
        # true parent here, for every commit path (batch encode and the
        # streaming sink both land in this function). Evolve commits pass
        # their own alias/retired sets and are exempt (their schema is
        # derived from the head under their own CAS).
        if (parent is not None and not replace and schema is not None
                and retired_names is None and column_aliases is None):
            bad = set(parent.get("retired_names", [])) & set(schema.names)
            if bad:
                raise CommitConflict(
                    f"column name(s) {sorted(bad)} were retired by a "
                    "concurrent schema evolution and cannot be reused; "
                    "pick a fresh name")
        n = self._next_n()
        if isinstance(manifest, list):
            if new_pids is None:
                raise ValueError("sharded commit needs new_pids")
            mnames = list(manifest)
            new_pids = set(int(p) for p in new_pids)
        else:
            mname = f"manifest-{n:05d}-{uuid.uuid4().hex[:8]}.parquet"
            pq.write_table(manifest.cast(MANIFEST_SCHEMA),
                           os.path.join(self.manifests_dir, mname))
            mnames = [mname]
            new_pids = set(manifest.column("pid").to_pylist())
        keep_parent = parent is not None and not replace
        committed = (set(parent["committed_pids"]) if keep_parent
                     else set()) | new_pids
        delete_files = self.delete_files(parent) if keep_parent else []
        if add_delete is not None:
            keys, key_col = add_delete
            dname = f"delete-{n:05d}-{uuid.uuid4().hex[:8]}.parquet"
            pq.write_table(keys, os.path.join(self.deletes_dir, dname))
            delete_files = delete_files + [
                {"file": dname, "key": key_col, "n": n}]
        snap = {
            "n": n,
            "snapshot_id": uuid.uuid4().hex,
            "parent_id": parent["snapshot_id"] if parent else None,
            "created_ms": int(time.time() * 1000),
            "run_id": run_id,
            "manifests": (parent["manifests"] if keep_parent else [])
            + mnames,
            # commit number per manifest (Iceberg sequence number) — the
            # delete-scoping reader needs it, and shard filenames written
            # executor-side cannot encode a number the driver only
            # assigns at commit time
            "manifest_n": {
                **(parent.get("manifest_n", {}) if keep_parent else {}),
                **{m: n for m in mnames},
            },
            "committed_pids": sorted(committed),
            "delete_files": delete_files,
            # pid-scoped rewrite epochs (JSON keys are strings) + the
            # manifests incremental readers must skip
            "pid_rewrites": {
                **(parent.get("pid_rewrites", {}) if keep_parent else {}),
                **({str(p): n for p in rewrite_pids} if rewrite_pids
                   else {}),
            },
            "rewrite_manifests": (
                (parent.get("rewrite_manifests", [])
                 if keep_parent else [])
                + (mnames if rewrite_pids else [])),
            # schema-evolution state: live-name -> retired physical names,
            # and every name ever renamed-away or dropped (reuse blocked)
            "column_aliases": (
                column_aliases if column_aliases is not None
                else (parent.get("column_aliases", {})
                      if keep_parent else {})),
            "retired_names": (
                retired_names if retired_names is not None
                else (parent.get("retired_names", [])
                      if keep_parent else [])),
            "schema_ipc": base64.b64encode(schema.serialize().to_pybytes()).decode(),
            "stats": stats or {},
            # content hash of the encode/decode code that wrote this
            # snapshot — cached-store reuse checks it against the loaded
            # code so a codec edit can never serve stale bytes
            "engine_fingerprint": _engine_fingerprint(),
        }
        sname = f"snapshot-{n:05d}.json"
        self._write_snapshot_json(sname, snap)
        if branch is not None:
            # staged commit: advance the branch ref, leave `_current`
            # (and thus every main reader) untouched
            refs = self.refs()
            refs["branches"][branch] = n
            self._write_refs(refs)
            return snap
        tmp = self.current_path + f".tmp.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            f.write(sname)
        os.replace(tmp, self.current_path)   # atomic pointer flip
        return snap


    def _write_snapshot_json(self, sname: str, snap: dict) -> None:
        """Write-then-rename: a crash mid-write must never leave a
        truncated snapshot JSON (readers and GC would choke on it)."""
        dst = os.path.join(self.snapshots_dir, sname)
        tmp = dst + f".tmp.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(snap, f)
        os.replace(tmp, dst)

    # ----------------------------------------------------------- deletes

    def delete_files(self, snapshot: dict | None = None) -> list[dict]:
        """Live (or given) snapshot's delete files:
        [{"file": name, "key": key_col}, ...]."""
        snap = snapshot or self.current_snapshot()
        return list((snap or {}).get("delete_files", []))

    def commit_deletes(self, keys: pa.Table, key_col: str,
                       run_id: str) -> dict:
        """Merge-on-read row deletes (Iceberg equality-delete files): write
        the key values as a delete file and commit a snapshot that carries
        it; readers anti-join the keys at decode time. Data chunks are
        untouched — compaction can materialize the deletes later.

        Runs under the commit lock with the GLOBAL commit-number
        sequence: the old parent.n+1 numbering could collide with (and
        os.replace!) a branch-staged snapshot file sharing that n, and
        the unlocked read-modify-write raced concurrent commits."""
        self.create()
        with self._commit_lock():
            return self._commit_deletes_locked(keys, key_col, run_id)

    def _commit_deletes_locked(self, keys: pa.Table, key_col: str,
                               run_id: str) -> dict:
        parent = self.current_snapshot()
        if parent is None:
            raise FileNotFoundError("cannot delete from an empty store")
        n = self._next_n()
        dname = f"delete-{n:05d}-{uuid.uuid4().hex[:8]}.parquet"
        pq.write_table(keys, os.path.join(self.deletes_dir, dname))
        snap = dict(parent)
        snap.update({
            "n": n,
            "snapshot_id": uuid.uuid4().hex,
            "parent_id": parent["snapshot_id"],
            "created_ms": int(time.time() * 1000),
            "run_id": run_id,
            # "n" scopes the delete (Iceberg sequence numbers): it applies
            # only to data from manifests committed BEFORE this snapshot,
            # so re-inserting a deleted key later stays visible (ADVICE r2)
            "delete_files": self.delete_files(parent)
            + [{"file": dname, "key": key_col, "n": n}],
        })
        sname = f"snapshot-{n:05d}.json"
        self._write_snapshot_json(sname, snap)
        tmp = self.current_path + f".tmp.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            f.write(sname)
        os.replace(tmp, self.current_path)
        return snap

    # ------------------------------------------------------------ stats

    def metrics(self) -> dict:
        """Rollup over the live snapshot's manifest rows."""
        m = self.manifest_table()
        if m.num_rows == 0:
            return {"chunks": 0, "bytes_in": 0, "bytes_out": 0, "ratio": None}
        import pyarrow.compute as pc
        bi = pc.sum(m.column("bytes_in")).as_py()
        bo = pc.sum(m.column("bytes_out")).as_py()
        by_codec = {}
        for codec in pc.unique(m.column("codec")).to_pylist():
            mask = pc.equal(m.column("codec"), codec)
            sub = m.filter(mask)
            by_codec[codec] = {
                "bytes_in": pc.sum(sub.column("bytes_in")).as_py(),
                "bytes_out": pc.sum(sub.column("bytes_out")).as_py(),
                "chunks": sub.num_rows,
            }
        # rows per chunk FILE (max over its column rows — identical by
        # construction), summed: a first-column filter under-counted
        # chunks lacking that column (schema evolution)
        _per_file = m.group_by("chunk_file").aggregate([("rows", "max")])
        return {"chunks": m.num_rows, "pids": len(set(m.column("pid").to_pylist())),
                "rows": pc.sum(_per_file.column("rows_max")).as_py()
                if m.num_rows else 0,
                "bytes_in": bi, "bytes_out": bo,
                "ratio": (bi / bo) if bo else None, "by_codec": by_codec}
