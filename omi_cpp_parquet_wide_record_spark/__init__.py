"""PySpark-native per-column lightweight-compression engine.

A from-scratch re-expression of the capabilities of the reference
``Open-Markets-Initiative/omi-cpp-parquet-wide-record`` (two C++ pcap -> wide-record
Parquet converters, ref NQ:3777-3849 / JX:1832-1903) as an idiomatic Spark engine:

- per-column lightweight codecs (DICT / RLE / BITPACK / FOR / DELTA / FSST / PLAIN)
  with a sampling-based auto-selector (SURVEY.md section 2.3),
- vectorized Arrow kernels only (zero per-row Python) run through ``mapInArrow``,
- Iceberg-style chunk + manifest + snapshot layout with resumable commits,
- skew-aware salted repartitioning,
- a decode path proven bit-identical to the input by pytest.

Nothing here is a port: the reference tells us WHAT to compute (the wide-record data
model, the envelope/explode/dispatch operators, the round-trip invariant); the HOW is
DataFrame + Arrow throughout.
"""

__version__ = "0.1.0"

from omi_cpp_parquet_wide_record_spark.session import get_spark  # noqa: F401
