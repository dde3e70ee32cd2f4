"""Reference-parity proof (FIXTURES.md F2/F3): the engine round-trips the
reference converters' own wide-record output shapes bit-identically and
beats the reference writer configuration on size.

The fixtures mirror record::nodes() (ref NQ:3078-3148, JX:1446-1480) with the
per-type null pattern of the parsers (ref NQ:3557-3769, JX:1741-1824); the
golden parquet uses the reference writer config (dictionary, UNCOMPRESSED,
1,000-row groups — ref NQ:3396-3397)."""

from __future__ import annotations

import os

import pytest

from omi_cpp_parquet_wide_record_spark import fixtures as FX
from omi_cpp_parquet_wide_record_spark.codecs import (
    decode_column, encode_column,
)
from omi_cpp_parquet_wide_record_spark.selector import choose_codec
from tests.conftest import arrays_equal

ROWS = 6000


@pytest.mark.parametrize("which", ["nasdaq", "jnx"])
def test_wide_record_columns_roundtrip_and_size(tmp_path, which):
    t = FX.wide_itch_table(ROWS, which)
    total_out = 0
    for name in t.column_names:
        arr = t[name].combine_chunks()
        c = choose_codec(arr)
        e = encode_column(arr, c.codec)
        d = decode_column(e.payload, e.params)
        assert arrays_equal(arr, d), (name, c.codec)
        total_out += len(e.payload)
    golden = str(tmp_path / f"golden_{which}.parquet")
    golden_bytes = FX.write_golden_parquet(t, golden)
    # north rule: our chunks beat the reference writer config on its own shape
    assert total_out <= golden_bytes, (total_out, golden_bytes)
    # and by a real margin (sparse wide records compress hard)
    assert total_out < 0.7 * golden_bytes, (total_out, golden_bytes)


@pytest.mark.parametrize("which", ["nasdaq", "jnx"])
def test_wide_record_spark_pipeline(spark, tmp_path, which):
    """Full pipeline on the wide-record shape: encode via mapInArrow ->
    decode -> distributed bit-identity (envelope key: pcap_index is dense,
    but rows are unique on (pcap_index, message_index) -> use a derived key)."""
    from pyspark.sql import functions as F
    from omi_cpp_parquet_wide_record_spark.operators.decode import decode_store
    from omi_cpp_parquet_wide_record_spark.operators.encode import (
        encode_dataframe,
    )
    from omi_cpp_parquet_wide_record_spark.operators.verify import (
        verify_roundtrip,
    )
    t = FX.wide_itch_table(3000, which)
    df = spark.createDataFrame(t.to_pandas()).withColumn(
        "row_key",
        F.col("pcap_index") * 100 + F.col("message_index"))
    out = str(tmp_path / f"store_{which}")
    res = encode_dataframe(df, out, partition_by=["message_type"],
                           salt_key="row_key", num_pids=8, salt=2)
    assert res.rows == 3000
    decoded = decode_store(spark, out)
    v = verify_roundtrip(df, decoded, key="row_key")
    assert v.ok, v


@pytest.mark.parametrize("which", ["nasdaq", "jnx"])
def test_packet_parse_matches_wide_fixture(which):
    """parse(serialize(wide)) == wide: the protocol decode (O4-O10) is
    faithful to the reference's message formats, bit for bit."""
    import numpy as np
    import pyarrow as pa
    from omi_cpp_parquet_wide_record_spark.operators.wide_record import (
        parse_packets_batch,
    )
    wide = FX.wide_itch_table(2000, which)
    pkts = FX.packets_table(2000, which)
    b = pa.RecordBatch.from_arrays(
        [pa.array(np.arange(1, pkts.num_rows + 1), type=pa.int64())] +
        [pkts.column(c).combine_chunks() for c in pkts.column_names],
        names=["pcap_index"] + pkts.column_names)
    parsed = pa.Table.from_batches([parse_packets_batch(b, which)])
    assert parsed.equals(wide)


def test_packet_parse_malformed_payloads_safe():
    """Bounds safety on hostile input: truncated envelopes, lying message
    lengths, and dense >64-message packets must neither fault nor read a
    neighbor packet's bytes (torn-tail semantics per packet)."""
    import numpy as np
    import pyarrow as pa
    from omi_cpp_parquet_wide_record_spark.operators.wide_record import (
        parse_packets_batch,
    )

    def env(session, seq, count):
        return (session.ljust(10)[:10].encode()
                + seq.to_bytes(8, "big") + count.to_bytes(2, "big"))

    msg = (38).to_bytes(2, "big") + b"X" + b"\x00" * 37   # order-cancel 'X'
    payloads = [
        b"",                                   # empty payload
        b"short",                              # < 20B envelope
        env("S1", 100, 2) + msg + msg,         # healthy 2-message packet
        env("S2", 200, 3) + msg + msg,         # count LIES (3 > 2 present)
        env("S3", 300, 1)
        + (9999).to_bytes(2, "big") + b"X",    # message length lies
        env("S4", 400, 100) + msg * 100,       # 100 messages (> old 64 cap)
    ]
    n = len(payloads)
    b = pa.RecordBatch.from_arrays(
        [pa.array(np.arange(1, n + 1), type=pa.int64()),
         pa.array(np.full(n, 1_700_000_000), type=pa.int64()),
         pa.array(np.zeros(n), type=pa.int64()),
         pa.array(payloads, type=pa.binary())],
        names=["pcap_index", "pcap_sec", "pcap_usec", "payload"])
    t = pa.Table.from_batches([parse_packets_batch(b, "nasdaq")])
    per_pkt = dict(zip(*np.unique(
        t.column("pcap_index").to_numpy(), return_counts=True)))
    assert per_pkt == {3: 2, 4: 2, 6: 100}, per_pkt
    # torn packets kept what fit; sessions stay per-packet correct
    sess = set(t.column("session").to_pylist())
    assert sess == {"S1".ljust(10), "S2".ljust(10), "S4".ljust(10)}


def test_packet_pipeline_spark_end_to_end(spark, tmp_path):
    """Full reference pipeline in Spark: binary capture -> dense index ->
    vectorized parse -> wide record -> columnar encode -> decode -> verify."""
    from pyspark.sql import functions as F
    from omi_cpp_parquet_wide_record_spark.operators.decode import decode_store
    from omi_cpp_parquet_wide_record_spark.operators.encode import (
        encode_dataframe,
    )
    from omi_cpp_parquet_wide_record_spark.operators.verify import (
        verify_roundtrip,
    )
    from omi_cpp_parquet_wide_record_spark.operators.wide_record import (
        parse_packets,
    )
    pkts = FX.packets_table(2000, "nasdaq")
    pdf = spark.createDataFrame(pkts.to_pandas()).repartition(4)
    wide_df = parse_packets(pdf, "nasdaq")
    assert wide_df.count() == 2000

    expected = spark.createDataFrame(FX.wide_itch_table(2000, "nasdaq")
                                     .to_pandas())
    key = (F.col("pcap_index") * 100 + F.col("message_index")).alias("row_key")
    out = str(tmp_path / "store")
    encode_dataframe(wide_df.withColumn("row_key", key),
                     out, partition_by=["message_type"], salt_key="row_key",
                     num_pids=8, salt=2)
    decoded = decode_store(spark, out)
    v = verify_roundtrip(expected.withColumn("row_key", key), decoded,
                         key="row_key")
    assert v.ok, v
