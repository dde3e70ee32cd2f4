"""Spark Python DataSource for the engine's chunk store (format "owrc").

The reference's only source is a pcap file iterator (O1, ref NQ:3777-3809);
the engine's native format deserves a first-class Spark source in return:

    from omi_cpp_parquet_wide_record_spark.sources.owrc_source import (
        OwrcDataSource)
    spark.dataSource.register(OwrcDataSource)
    df = spark.read.format("owrc").load("/path/to/store")

One input partition per chunk file (so a 10^12-row store fans out over the
cluster), column pruning pushed into the chunk footer (only requested
columns are decoded), and batches stream out as Arrow — the engine's decode
kernels never materialize Python rows.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class OwrcInputPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class OwrcReader(DataSourceReader):
    def __init__(self, schema, options):
        self.schema = schema
        self.root = options.get("path")
        if not self.root:
            raise ValueError("owrc source needs a path")

    def partitions(self):
        import os
        from omi_cpp_parquet_wide_record_spark.plans.snapshot import ChunkStore
        store = ChunkStore(self.root)
        manifest = store.manifest_table()
        files = sorted(set(manifest.column("chunk_file").to_pylist()))
        return [OwrcInputPartition(os.path.join(store.chunks_dir, f))
                for f in files]

    def read(self, partition: OwrcInputPartition):
        from omi_cpp_parquet_wide_record_spark.operators.decode import (
            read_chunk_file,
        )
        cols = [f.name for f in self.schema.fields]
        table = read_chunk_file(partition.path, columns=cols)
        yield from table.select(cols).to_batches()


class OwrcDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "owrc"

    def schema(self):
        from pyspark.sql.pandas.types import from_arrow_schema
        from omi_cpp_parquet_wide_record_spark.plans.snapshot import ChunkStore
        return from_arrow_schema(ChunkStore(self.options["path"]).arrow_schema())

    def reader(self, schema):
        return OwrcReader(schema, self.options)
