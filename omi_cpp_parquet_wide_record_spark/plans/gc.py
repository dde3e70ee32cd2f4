"""Snapshot expiry + orphan cleanup for the chunk store (Iceberg-style
maintenance: expire_snapshots / remove_orphan_files).

A crashed run leaves chunk files no manifest references (the commit pointer
never flipped); expired snapshots leave manifests no live snapshot
references. Both are safe to delete because readers only ever follow
_current -> snapshot -> manifests -> chunk files.
"""

from __future__ import annotations

import json
import os

from omi_cpp_parquet_wide_record_spark.plans.snapshot import ChunkStore


def expire_snapshots(store: ChunkStore, keep_last: int = 1) -> dict:
    """Drop all but the newest `keep_last` snapshots plus any manifests and
    chunk files only they referenced. Returns a deletion report."""
    snaps = sorted(os.listdir(store.snapshots_dir))
    # the snapshot _current points to is live unconditionally — a crash
    # between snapshot-json write and the pointer flip leaves a lexically
    # newer snapshot file that _current does NOT reference; keep-last must
    # never delete the pointed-to one (ADVICE r1 #3)
    live = set(snaps[-keep_last:])
    if os.path.exists(store.current_path):
        with open(store.current_path) as f:
            live.add(f.read().strip())
    dead = [s for s in snaps if s not in live]
    live = sorted(live)
    live_manifests: set[str] = set()
    for name in live:
        with open(os.path.join(store.snapshots_dir, name)) as f:
            live_manifests.update(json.load(f)["manifests"])
    removed_manifests = []
    for name in dead:
        os.remove(os.path.join(store.snapshots_dir, name))
    for m in os.listdir(store.manifests_dir):
        if m not in live_manifests:
            os.remove(os.path.join(store.manifests_dir, m))
            removed_manifests.append(m)
    orphans = remove_orphan_chunks(store)
    removed_deletes = _remove_orphan_delete_files(store)
    return {"removed_snapshots": dead,
            "removed_manifests": removed_manifests,
            "removed_orphan_chunks": orphans,
            "removed_delete_files": removed_deletes}


def remove_orphan_chunks(store: ChunkStore) -> list[str]:
    """Delete chunk files not referenced by ANY retained snapshot's
    manifests (failed-attempt leftovers; the commit protocol makes them
    invisible). A REPLACE commit drops old manifests from the live view,
    but expire_snapshots(keep_last>1) retains older snapshots whose time
    travel contract still needs their chunk files — so the referenced set
    is the union over every snapshot still on disk, not just _current
    (ADVICE r2 #1)."""
    referenced: set[str] = set()
    for snap in store.snapshots():
        referenced.update(
            store.manifest_table(snap).column("chunk_file").to_pylist())
    removed = []
    for f in os.listdir(store.chunks_dir):
        if f not in referenced:
            os.remove(os.path.join(store.chunks_dir, f))
            removed.append(f)
    return removed


def _remove_orphan_delete_files(store: ChunkStore) -> list[str]:
    """Delete equality-delete files no retained snapshot references (same
    union-over-retained-snapshots rule as chunks)."""
    referenced = {d["file"] for snap in store.snapshots()
                  for d in snap.get("delete_files", [])}
    removed = []
    if os.path.isdir(store.deletes_dir):
        for f in os.listdir(store.deletes_dir):
            if f not in referenced:
                os.remove(os.path.join(store.deletes_dir, f))
                removed.append(f)
    return removed
