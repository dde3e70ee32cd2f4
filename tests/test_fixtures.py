"""Fixture generator invariants (FIXTURES.md F1-F4)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from omi_cpp_parquet_wide_record_spark import fixtures as FX, schema as S


def test_web_pages_shape_and_determinism():
    t = FX.web_pages_table(2000)
    assert t.schema.equals(S.WEB_PAGES_ARROW)
    assert t.num_rows == 2000
    # unique urls (join key), byte-identical across batchings (F1 invariant)
    assert len(pc.unique(t["url"])) == 2000
    assert FX.web_pages_table(2000, batch=333).equals(t)
    # no nulls anywhere
    for name in t.column_names:
        assert t[name].null_count == 0


def test_web_pages_value_properties():
    t = FX.web_pages_table(3000)
    langs = set(pc.unique(t["lang"]).to_pylist())
    assert langs <= set(S.LANGS)
    # zipf skew: en majority-ish
    counts = pc.value_counts(t["lang"]).to_pylist()
    top = max(counts, key=lambda r: r["counts"])
    assert top["values"] == "en" and top["counts"] > 1000
    # text length within spec-ish bounds, html sizes 0 or 512..8191
    hl = pc.binary_length(t["html"]).to_numpy()
    assert ((hl == 0) | ((hl >= 512) & (hl < 8192))).all()
    # warc_ts near-monotone
    ts = t["warc_ts"].cast(pa.int64()).to_numpy()
    assert (np.diff(ts) > -2_000_000).all()


def test_web_pages_skew_variant():
    t = FX.web_pages_table(2000, skew=True)
    counts = {r["values"]: r["counts"] for r in pc.value_counts(t["lang"]).to_pylist()}
    assert counts["en"] / 2000 > 0.85


def test_wide_itch_schemas():
    assert len(S.NASDAQ_WIDE.names) == 67   # ref NQ:3078-3148
    assert len(S.JNX_WIDE.names) == 31      # ref JX:1446-1480
    nq = FX.wide_itch_table(3000, "nasdaq")
    jx = FX.wide_itch_table(1000, "jnx")
    assert nq.schema.equals(S.NASDAQ_WIDE) and jx.schema.equals(S.JNX_WIDE)
    assert FX.wide_itch_table(3000, "nasdaq", batch=271).equals(nq)


def test_wide_itch_null_pattern():
    """Payload columns non-null iff the row's message type carries them
    (per-type parsers ref NQ:3557-3769)."""
    t = FX.wide_itch_table(4000, "nasdaq")
    mt = t["message_type"].to_numpy()
    for col, carriers in [
        ("stock", "RHYLKAJFPQIN"),
        ("locate_code", "Y"),                 # Reg-SHO only, NQ:3718-3724
        ("order_reference_number", "ACDEFPX"),
        ("event_code", "S"),
    ]:
        valid = pc.is_valid(t[col]).to_numpy(zero_copy_only=False)
        want = np.isin(mt, [ord(c) for c in carriers])
        assert (valid == want).all(), col
    # envelope is never null; message_sequence = header+index off-by-one kept
    for env in ("pcap_index", "pcap_timestamp", "session", "message_sequence",
                "message_index", "message_type"):
        assert t[env].null_count == 0
    seq = t["message_sequence"].to_numpy()
    idx = t["message_index"].to_numpy()
    assert (seq - idx == (t["pcap_index"].to_numpy() - 1) * 7 + 1).all()


def test_golden_writer_config(tmp_path):
    t = FX.web_pages_table(2500)
    path = str(tmp_path / "g.parquet")
    size = FX.write_golden_parquet(t, path)
    assert size > 0
    md = pq.ParquetFile(path).metadata
    # row groups capped at 1000 rows, UNCOMPRESSED (ref NQ:3396-3397)
    assert md.num_row_groups == 3
    rg = md.row_group(0)
    assert rg.num_rows == 1000
    for ci in range(rg.num_columns):
        assert rg.column(ci).compression == "UNCOMPRESSED"
