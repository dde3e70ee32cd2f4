"""Engine schemas: the web-pages input table and the reference wide-record shapes.

- ``WEB_PAGES``: the BASELINE.json input_hint shape
  (url:string, warc_ts:timestamp, html:binary, text:string, lang:string).
- ``NASDAQ_WIDE`` / ``JNX_WIDE``: the reference converters' exact output
  schemas — 67 columns mirroring record::nodes() at ref NQ:3078-3148 and 31
  columns at ref JX:1446-1480 — with the reference's REQUIRED/OPTIONAL
  repetition as nullability and the unsigned converted types widened to the
  same signed physical lanes (UINT_8/16/32 in INT32, UINT_64 in INT64;
  Spark/Arrow carry no unsigned, SURVEY.md §1.4).
- ``NASDAQ_TYPE_FIELDS`` / ``JNX_TYPE_FIELDS``: which payload columns each
  message type populates — extracted from the per-type parsers at ref
  NQ:3557-3769 and JX:1741-1824; every other payload column stays NULL for
  that row (the record::reset() overlay semantics, ref NQ:3013-3075).
"""

from __future__ import annotations

import pyarrow as pa
from pyspark.sql import types as T

# ---------------------------------------------------------------- web pages

WEB_PAGES = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("warc_ts", T.TimestampType(), False),
    T.StructField("html", T.BinaryType(), False),
    T.StructField("text", T.StringType(), False),
    T.StructField("lang", T.StringType(), False),
])

WEB_PAGES_ARROW = pa.schema([
    pa.field("url", pa.string(), nullable=False),
    pa.field("warc_ts", pa.timestamp("us"), nullable=False),
    pa.field("html", pa.binary(), nullable=False),
    pa.field("text", pa.string(), nullable=False),
    pa.field("lang", pa.string(), nullable=False),
])

LANGS = ["en", "de", "fr", "es", "zh", "ru", "ja", "pt", "it", "nl"]

# ------------------------------------------------------- NASDAQ wide record
# Column order matches record::nodes(), ref NQ:3080-3148. Groups per
# FIXTURES.md F2 / the field structs (e.g. attribution NQ:283-311,
# stock_locate NQ:2711-2735, timestamp u48 NQ:2753-2782).

_NQ_ENVELOPE = [
    ("pcap_index", "i64"), ("pcap_timestamp", "ts"), ("session", "s10"),
    ("message_sequence", "i64"), ("message_index", "i32"), ("message_type", "i32"),
]

# payload: name -> (kind, param)   kind: u8 (ASCII code int), u16, u32, u64,
# u48, strN (space-trimmed fixed ASCII of width N)
_NQ_PAYLOAD = {
    "attribution": ("str", 4), "auction_collar_extension": ("u32", 0),
    "auction_collar_reference_price": ("u32", 0), "authenticity": ("u8", 0),
    "breached_level": ("u8", 0), "buy_sell_indicator": ("u8", 0),
    "canceled_shares": ("u32", 0), "cross_price": ("u32", 0),
    "cross_shares": ("u64", 0), "cross_type": ("u8", 0),
    "current_reference_price": ("u32", 0), "etp_flag": ("u8", 0),
    "etp_leverage_factor": ("u32", 0), "event_code": ("u8", 0),
    "executed_shares": ("u32", 0), "execution_price": ("u32", 0),
    "far_price": ("u32", 0), "financial_status_indicator": ("u8", 0),
    "imbalance_direction": ("u8", 0), "imbalance_shares": ("u64", 0),
    "interest_flag": ("u8", 0), "inverse_indicator": ("u8", 0),
    "ipo_flag": ("u8", 0), "ipo_price": ("u32", 0),
    "ipo_quotation_release_qualifier": ("u8", 0),
    "ipo_quotation_release_time": ("u32", 0), "issue_classification": ("u8", 0),
    "issue_sub_type": ("str", 2), "level_1": ("u64", 0), "level_2": ("u64", 0),
    "level_3": ("u64", 0), "locate_code": ("u16", 0),
    "lower_auction_collar_price": ("u32", 0),
    "luld_reference_price_tier": ("u8", 0), "market_category": ("u8", 0),
    "market_maker_mode": ("u8", 0), "market_participant_state": ("u8", 0),
    "match_number": ("u64", 0), "mpid": ("str", 4), "near_price": ("u32", 0),
    "new_order_reference_number": ("u64", 0),
    "order_reference_number": ("u64", 0),
    "original_order_reference_number": ("u64", 0), "paired_shares": ("u64", 0),
    "price": ("u32", 0), "price_variation_indicator": ("u8", 0),
    "primary_market_maker": ("u8", 0), "printable": ("u8", 0),
    "reason": ("str", 4), "reg_sho_action": ("u8", 0), "reserved": ("u8", 0),
    "round_lot_size": ("u32", 0), "round_lots_only": ("u8", 0),
    "shares": ("u32", 0), "short_sale_threshold_indicator": ("u8", 0),
    "stock": ("str", 8), "stock_locate": ("u16", 0), "timestamp": ("u48", 0),
    "tracking_number": ("u16", 0), "trading_state": ("u8", 0),
    "upper_auction_collar_price": ("u32", 0),
}

# per-message-type populated payload columns, from the parsers NQ:3557-3769
NASDAQ_TYPE_FIELDS: dict[str, list[str]] = {
    "A": ["stock_locate", "tracking_number", "timestamp", "order_reference_number",
          "buy_sell_indicator", "shares", "stock", "price"],
    "B": ["stock_locate", "tracking_number", "timestamp", "match_number"],
    "C": ["stock_locate", "tracking_number", "timestamp", "order_reference_number",
          "executed_shares", "match_number", "printable", "execution_price"],
    "D": ["stock_locate", "tracking_number", "timestamp", "order_reference_number"],
    "E": ["stock_locate", "tracking_number", "timestamp", "order_reference_number",
          "executed_shares", "match_number"],
    "F": ["stock_locate", "tracking_number", "timestamp", "order_reference_number",
          "buy_sell_indicator", "shares", "stock", "price", "attribution"],
    "H": ["stock_locate", "tracking_number", "timestamp", "stock", "trading_state",
          "reserved", "reason"],
    "I": ["stock_locate", "tracking_number", "timestamp", "paired_shares",
          "imbalance_shares", "imbalance_direction", "stock", "far_price",
          "near_price", "current_reference_price", "cross_type",
          "price_variation_indicator"],
    "J": ["stock_locate", "tracking_number", "timestamp", "stock",
          "auction_collar_reference_price", "upper_auction_collar_price",
          "lower_auction_collar_price", "auction_collar_extension"],
    "K": ["stock_locate", "tracking_number", "timestamp", "stock",
          "ipo_quotation_release_time", "ipo_quotation_release_qualifier",
          "ipo_price"],
    "L": ["stock_locate", "tracking_number", "timestamp", "mpid", "stock",
          "primary_market_maker", "market_maker_mode",
          "market_participant_state"],
    "N": ["stock_locate", "tracking_number", "timestamp", "stock",
          "interest_flag"],
    "P": ["stock_locate", "tracking_number", "timestamp", "order_reference_number",
          "buy_sell_indicator", "shares", "stock", "price", "match_number"],
    "Q": ["stock_locate", "tracking_number", "timestamp", "cross_shares", "stock",
          "cross_price", "match_number", "cross_type"],
    "R": ["stock_locate", "tracking_number", "timestamp", "stock",
          "market_category", "financial_status_indicator", "round_lot_size",
          "round_lots_only", "issue_classification", "issue_sub_type",
          "authenticity", "short_sale_threshold_indicator", "ipo_flag",
          "luld_reference_price_tier", "etp_flag", "etp_leverage_factor",
          "inverse_indicator"],
    "S": ["stock_locate", "tracking_number", "timestamp", "event_code"],
    "U": ["stock_locate", "tracking_number", "timestamp",
          "original_order_reference_number", "new_order_reference_number",
          "shares", "price"],
    "V": ["stock_locate", "tracking_number", "timestamp", "level_1", "level_2",
          "level_3"],
    "W": ["stock_locate", "tracking_number", "timestamp", "breached_level"],
    "X": ["stock_locate", "tracking_number", "timestamp",
          "order_reference_number", "canceled_shares"],
    # Reg-SHO is the one type that fills locate_code instead of stock_locate
    # (two distinct columns for the same wire slot, ref NQ:3718-3724)
    "Y": ["locate_code", "tracking_number", "timestamp", "stock",
          "reg_sho_action"],
}

# --------------------------------------------------------------- JNX record
# order per JX:1446-1480; parsers JX:1741-1824
_JNX_PAYLOAD = {
    "attribution": ("str", 4), "buy_sell_indicator": ("u8", 0),
    "executed_quantity": ("u32", 0), "group": ("str", 4),
    "lower_price_limit": ("u32", 0), "match_number": ("u64", 0),
    "new_order_number": ("u64", 0), "order_number": ("u64", 0),
    "order_type": ("u8", 0), "orderbook_code": ("str", 12),
    "orderbook_id": ("u32", 0), "original_order_number": ("u64", 0),
    "price": ("u32", 0), "price_decimals": ("u32", 0),
    "price_start": ("u32", 0), "price_tick_size": ("u32", 0),
    "price_tick_size_table_id": ("u32", 0), "quantity": ("u32", 0),
    "round_lot_size": ("u32", 0), "short_selling_state": ("u8", 0),
    "system_event": ("u8", 0), "timestamp_nanoseconds": ("u32", 0),
    "timestamp_seconds": ("u32", 0), "trading_state": ("u8", 0),
    "upper_price_limit": ("u32", 0),
}

JNX_TYPE_FIELDS: dict[str, list[str]] = {
    "A": ["timestamp_nanoseconds", "order_number", "buy_sell_indicator",
          "quantity", "orderbook_id", "group", "price"],
    "D": ["timestamp_nanoseconds", "order_number"],
    "E": ["timestamp_nanoseconds", "order_number", "executed_quantity",
          "match_number"],
    "F": ["timestamp_nanoseconds", "order_number", "buy_sell_indicator",
          "quantity", "orderbook_id", "group", "price", "attribution",
          "order_type"],
    "H": ["timestamp_nanoseconds", "orderbook_id", "group", "trading_state"],
    "L": ["timestamp_nanoseconds", "price_tick_size_table_id",
          "price_tick_size", "price_start"],
    "R": ["timestamp_nanoseconds", "orderbook_id", "orderbook_code", "group",
          "round_lot_size", "price_tick_size_table_id", "price_decimals",
          "upper_price_limit", "lower_price_limit"],
    "S": ["timestamp_nanoseconds", "group", "system_event"],
    # 'T' carries ONLY timestamp_seconds (JX:1815-1817); the converter never
    # joins it with timestamp_nanoseconds — both stay raw (SURVEY.md §2.1)
    "T": ["timestamp_seconds"],
    "U": ["timestamp_nanoseconds", "original_order_number", "new_order_number",
          "quantity", "price"],
    "Y": ["timestamp_nanoseconds", "orderbook_id", "group",
          "short_selling_state"],
}


def _kind_to_arrow(kind: str) -> pa.DataType:
    # u32 rides in int64: the reference stores full-range UINT_32 in the
    # INT32 physical lane (converted type), and Spark itself surfaces
    # parquet UINT_32 as LongType — int64 keeps values >= 2^31 (e.g. large
    # share counts) unwrapped (ADVICE r1 #5)
    return {
        "u8": pa.int32(), "u16": pa.int32(), "u32": pa.int64(),
        "u48": pa.int64(), "u64": pa.int64(),
        "i32": pa.int32(), "i64": pa.int64(),
        "ts": pa.timestamp("us"), "str": pa.string(), "s10": pa.string(),
    }[kind]


def _wide_schema(payload: dict[str, tuple[str, int]]) -> pa.Schema:
    fields = [
        pa.field(n, _kind_to_arrow(k), nullable=False)
        for n, k in _NQ_ENVELOPE
    ]
    for name in sorted(payload):
        kind, _ = payload[name]
        fields.append(pa.field(name, _kind_to_arrow(kind), nullable=True))
    return pa.schema(fields)


NASDAQ_WIDE: pa.Schema = _wide_schema(_NQ_PAYLOAD)
JNX_WIDE: pa.Schema = _wide_schema(_JNX_PAYLOAD)
NASDAQ_PAYLOAD_KINDS = _NQ_PAYLOAD
JNX_PAYLOAD_KINDS = _JNX_PAYLOAD

# unsigned value bound per kind (exclusive), for fixture generation
KIND_BOUND = {
    "u8": 1 << 7, "u16": 1 << 16, "u32": 1 << 32,  # full unsigned range
    "u48": 1 << 48, "u64": 1 << 62,
}
