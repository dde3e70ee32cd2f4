"""Spark Python DataSource for the engine's chunk store (format "owrc").

The reference's only source is a pcap file iterator (O1, ref NQ:3777-3809);
the engine's native format deserves a first-class Spark source AND sink:

    from omi_cpp_parquet_wide_record_spark.sources.owrc_source import (
        OwrcDataSource)
    spark.dataSource.register(OwrcDataSource)
    df = spark.read.format("owrc").load("/path/to/store")
    df.write.format("owrc").mode("overwrite").save("/path/to/store")

Read: one input partition per chunk file (so a 10^12-row store fans out
over the cluster), column pruning pushed into the chunk footer (only
requested columns are decoded), batches stream out as Arrow. Write: each
task encodes its partition's Arrow batches into chunk files and returns
only manifest rows as its commit message; the driver's commit() writes the
manifest and flips the snapshot pointer atomically — Spark's two-phase
writer protocol mapped 1:1 onto the store's Iceberg-style commit, so a
failed job leaves only invisible orphan chunks. The engine's kernels never
materialize Python rows on either path.

For resume-from-checkpoint and content-derived work units use
operators.encode.encode_dataframe; this sink is the plain df.write idiom
(work unit = Spark partition).
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource, DataSourceArrowWriter, DataSourceReader, InputPartition,
    WriterCommitMessage,
)


# per-python-worker cache of delete-key arrays (delete files are
# immutable, uuid-named); size-capped as a leak guard
_DELETE_KEY_CACHE: dict = {}


class OwrcInputPartition(InputPartition):
    def __init__(self, path: str, deletes: list[tuple[str, str, str]] = (),  # noqa: B006
                 aliases: dict[str, list[str]] | None = None):
        self.path = path
        # [(delete_file_path, physical_key_col, live_key_col), ...]
        # applicable to THIS chunk's commit epoch (sequence-scoped,
        # matching decode_store semantics)
        self.deletes = list(deletes)
        # schema-evolution aliases of the snapshot being read:
        # {live column name: [retired physical names]}
        self.aliases = dict(aliases or {})


class OwrcReader(DataSourceReader):
    def __init__(self, schema, options):
        self.schema = schema
        self.root = options.get("path")
        # snapshot=N time-travels; sinceSnapshot=M reads incrementally
        # (only manifests committed after M); ref="tag" reads a named
        # ref — all mirror decode_store
        self._snapshot = options.get("snapshot")
        self._since = options.get("sincesnapshot",
                                  options.get("since_snapshot"))
        self._ref = options.get("ref")
        if self._ref is not None and self._snapshot is not None:
            raise ValueError("owrc: pass snapshot or ref, not both")
        self._zone_filters: list[tuple[str, str, object]] = []
        if not self.root:
            raise ValueError("owrc source needs a path")

    def pushFilters(self, filters):
        """Use comparison filters for zone-map chunk pruning, but yield
        every filter back as unhandled: pruning is conservative (chunk
        granularity), so Spark must still apply the exact predicate."""
        from pyspark.sql.datasource import (
            EqualTo, GreaterThan, GreaterThanOrEqual, In, IsNotNull,
            IsNull, LessThan, LessThanOrEqual, StringStartsWith,
        )
        ops = {EqualTo: "==", GreaterThan: ">", GreaterThanOrEqual: ">=",
               LessThan: "<", LessThanOrEqual: "<=",
               StringStartsWith: "startswith"}
        null_ops = {IsNull: "is_null", IsNotNull: "is_not_null"}
        for f in filters:
            if type(f) in ops and len(f.attribute) == 1:
                self._zone_filters.append(
                    (f.attribute[0], ops[type(f)], f.value))
            elif type(f) in null_ops and len(f.attribute) == 1:
                # null-count pruning (no literal value)
                self._zone_filters.append(
                    (f.attribute[0], null_ops[type(f)], None))
            elif type(f) is In and len(f.attribute) == 1:
                # df.filter(col.isin(...)) prunes via zone maps + blooms
                # (a chunk drops only when EVERY member is provably absent)
                self._zone_filters.append(
                    (f.attribute[0], "in", list(f.value)))
            yield f

    def partitions(self):
        import os
        import pyarrow.parquet as pq
        from omi_cpp_parquet_wide_record_spark.operators.decode import (
            prune_files,
        )
        from omi_cpp_parquet_wide_record_spark.plans.snapshot import ChunkStore
        store = ChunkStore(self.root)
        if self._ref is not None:
            snap = store.resolve_ref(self._ref)
        elif self._snapshot is not None:
            snap = store.snapshot_at(int(self._snapshot))
        else:
            snap = store.current_snapshot()
        if self._since is not None:
            base = store.snapshot_at(int(self._since))
            # skip pid-rewrite commits and read the ORIGINAL appended
            # rows (same incremental semantics as decode_store)
            seen = set(base["manifests"]) | set(
                snap.get("rewrite_manifests", []))
            snap = {**snap, "manifests": [m for m in snap["manifests"]
                                          if m not in seen],
                    "pid_rewrites": {}}
        manifest = store.manifest_table(snap)
        if self._zone_filters:
            files = prune_files(manifest, self._zone_filters)
        else:
            files = sorted(set(manifest.column("chunk_file").to_pylist()))
        deletes = store.delete_files(snap)
        commit_n: dict[str, int] = {}
        if deletes and any(d.get("n") is not None for d in deletes):
            for m in snap["manifests"]:
                n_m = ChunkStore.manifest_commit_n(snap, m)
                t = pq.read_table(os.path.join(store.manifests_dir, m),
                                  columns=["chunk_file"])
                for fname in set(t.column("chunk_file").to_pylist()):
                    commit_n.setdefault(fname, n_m)

        # rename evolution: delete-file keys are physical names at delete
        # time; resolve to live names for filtering alias-resolved tables
        aliases = ChunkStore.alias_map(snap)
        _live_of = {o: l for l, olds in aliases.items() for o in olds}

        def applicable(fname: str) -> list[tuple[str, str, str]]:
            # a delete committed at snapshot n applies only to chunks
            # from earlier commits (Iceberg sequence-number scoping),
            # mirroring decode_store
            out = []
            for d in deletes:
                if d.get("n") is not None and \
                        commit_n.get(fname, 0) >= int(d["n"]):
                    continue
                out.append((os.path.join(store.deletes_dir, d["file"]),
                            d["key"], _live_of.get(d["key"], d["key"])))
            return out

        return [OwrcInputPartition(os.path.join(store.chunks_dir, f),
                                   applicable(f), aliases)
                for f in files]

    def read(self, partition: OwrcInputPartition):
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        from omi_cpp_parquet_wide_record_spark.operators.decode import (
            read_chunk_file,
        )
        cols = [f.name for f in self.schema.fields]
        del_keys = [lk for _, _, lk in partition.deletes if lk not in cols]
        want = cols + del_keys
        aliases = partition.aliases
        old_names = [o for c in want for o in aliases.get(c, [])]
        table = read_chunk_file(partition.path,
                                columns=want + old_names)
        # rename evolution: chunks written before a rename carry retired
        # physical names — relabel them to the live names
        if old_names:
            present = set(table.schema.names)
            relabel = {}
            for live in want:
                if live in present:
                    continue
                for old in aliases.get(live, []):
                    if old in present:
                        relabel[old] = live
                        break
            if relabel:
                table = table.rename_columns(
                    [relabel.get(n, n) for n in table.schema.names])
        # merge-on-read equality deletes (sequence-scoped in partitions()).
        # Delete-key arrays cache per python worker: every chunk partition
        # applies the same few delete files, and delete files are
        # immutable (uuid-named), so without the cache a store with F
        # chunks and D deletes performs F x D parquet reads per scan.
        for dpath, key, live_key in partition.deletes:
            if live_key not in table.schema.names:
                continue     # chunk predates the key column: nothing matches
            ck = (dpath, key)
            if ck not in _DELETE_KEY_CACHE:
                if len(_DELETE_KEY_CACHE) > 256:
                    _DELETE_KEY_CACHE.clear()
                _DELETE_KEY_CACHE[ck] = pq.read_table(
                    dpath, columns=[key]).column(key).combine_chunks()
            table = table.filter(
                pc.invert(pc.is_in(table.column(live_key),
                                   value_set=_DELETE_KEY_CACHE[ck])))
        # schema evolution: null-fill columns added after this chunk
        # committed (same read-time semantics as decode_store)
        from pyspark.sql.pandas.types import to_arrow_schema
        target = to_arrow_schema(self.schema)
        for f in target:
            if f.name not in table.schema.names:
                table = table.append_column(
                    f.name, pa.nulls(table.num_rows, type=f.type))
        yield from table.select(cols).to_batches()


class OwrcCommitMessage(WriterCommitMessage):
    def __init__(self, rows: list[dict]):
        self.rows = rows


class OwrcArrowWriter(DataSourceArrowWriter):
    def __init__(self, schema, options, overwrite: bool):
        import uuid
        from omi_cpp_parquet_wide_record_spark.plans.snapshot import ChunkStore
        self.root = options.get("path")
        if not self.root:
            raise ValueError("owrc sink needs a path")
        self.schema = schema
        self.chunk_rows = int(options.get("chunk_rows", 65536))
        self.chunk_bytes = int(options.get("chunk_bytes", 64 << 20))
        self.run_id = uuid.uuid4().hex
        # overwrite maps to a REPLACE commit at commit() time — the old
        # table stays intact (and visible) until the atomic pointer flip,
        # so a failed overwrite job never destroys existing data
        self.overwrite = overwrite
        ChunkStore(self.root).create()

    def write(self, iterator):
        """Executor side: Arrow batches -> encoded chunk files; only
        manifest metadata travels back to the driver."""
        import os
        import uuid
        import pyarrow as pa
        from pyspark import TaskContext
        from omi_cpp_parquet_wide_record_spark.operators.encode import (
            _write_chunk,
        )
        tc = TaskContext.get()
        pid = tc.partitionId() if tc else 0
        tag = f"{self.run_id[:8]}-w{uuid.uuid4().hex[:6]}"
        chunks_dir = os.path.join(self.root, "chunks")
        plan_cache: dict = {}
        rows: list[dict] = []
        acc: list[pa.RecordBatch] = []
        acc_rows = acc_bytes = seq = 0

        def flush():
            nonlocal acc, acc_rows, acc_bytes, seq
            if not acc:
                return
            tbl = pa.Table.from_batches(acc)
            rows.extend(_write_chunk(chunks_dir, pid, seq, tbl, plan_cache,
                                     self.run_id, tag))
            seq += 1
            acc, acc_rows, acc_bytes = [], 0, 0

        for batch in iterator:
            if batch.num_rows == 0:
                continue
            acc.append(batch)
            acc_rows += batch.num_rows
            acc_bytes += batch.nbytes
            if acc_rows >= self.chunk_rows or acc_bytes >= self.chunk_bytes:
                flush()
        flush()
        return OwrcCommitMessage(rows)

    def commit(self, messages):
        """Driver side: one atomic snapshot commit over every task's
        manifest rows (the two-phase protocol's visibility flip)."""
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema
        from omi_cpp_parquet_wide_record_spark.plans.snapshot import (
            MANIFEST_SCHEMA, ChunkStore,
        )
        rows = [r for m in messages for r in m.rows]
        cols = {f.name: [r[f.name] for r in rows] for f in MANIFEST_SCHEMA}
        manifest = pa.Table.from_pydict(cols, schema=MANIFEST_SCHEMA)
        store = ChunkStore(self.root)
        prior = store.current_snapshot()
        if prior is not None and not self.overwrite:
            # retired names (schema evolution) can never be reused —
            # same guard as encode_dataframe
            bad = set(prior.get("retired_names", [])) & \
                {f.name for f in self.schema.fields}
            if bad:
                raise ValueError(
                    f"column name(s) {sorted(bad)} were retired by a "
                    "schema evolution and cannot be reused")
        store.commit(manifest, to_arrow_schema(self.schema),
                     self.run_id, replace=self.overwrite)

    def abort(self, messages):
        # nothing to undo: the pointer never flipped, so the written chunk
        # files are invisible orphans (removable by plans/gc.py)
        pass


class OwrcDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "owrc"

    def schema(self):
        import pyarrow as pa
        from pyspark.sql.pandas.types import from_arrow_schema
        from omi_cpp_parquet_wide_record_spark.plans.snapshot import ChunkStore
        store = ChunkStore(self.options["path"])
        # time-travel/ref reads present THAT snapshot's schema (it may
        # predate a rename/drop evolution)
        if self.options.get("ref") is not None:
            s = store.arrow_schema(store.resolve_ref(self.options["ref"]))
        elif self.options.get("snapshot") is not None:
            s = store.arrow_schema(
                store.snapshot_at(int(self.options["snapshot"])))
        else:
            s = store.arrow_schema()
        # nullable like decode_store: add-column evolution null-fills rows
        # from chunks committed before a column existed
        return from_arrow_schema(pa.schema(
            [pa.field(f.name, f.type, nullable=True) for f in s]))

    def reader(self, schema):
        return OwrcReader(schema, self.options)

    def writer(self, schema, overwrite: bool):
        return OwrcArrowWriter(schema, self.options, overwrite)
