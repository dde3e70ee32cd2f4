"""Deterministic synthetic fixtures (FIXTURES.md F1-F4), vectorized.

Every value is a pure function of the global row id via splitmix64 lanes, so
the *distributed* generator (mapInArrow over spark.range slices) produces the
same table no matter how rows are partitioned — the property that lets the
same fixture back unit tests (1k rows, single process) and the 100k+-row
bench slices, and that would let a 1000-executor cluster synthesize the
10^12-row corpus without any coordination.

The golden Parquet writer reproduces the reference converters' exact writer
configuration — default properties (dictionary + PLAIN fallback), compression
NONE, row groups capped at 1,000 rows (ref NQ:3391+3396-3397, JX:1615+1620-1621)
— giving the ≤-size denominator from BASELINE.md.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from omi_cpp_parquet_wide_record_spark import schema as S

GOLDEN_ROW_GROUP = 1000  # max_row_group_size = 1000, ref NQ:3381+3397

_M = np.uint64(0xFFFFFFFFFFFFFFFF)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64: uint64 -> uint64 (public-domain constants)."""
    z = (x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15))
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def lowbias32(x: np.ndarray) -> np.ndarray:
    """Vectorized 32-bit integer hash (lowbias32 constants), computed in
    int64 so every intermediate stays < 2^63 — the property that lets a SQL
    oracle (DuckDB BIGINT, which errors on overflow instead of wrapping)
    reproduce it term-for-term. Input ints must be non-negative and < ~2^31.
    """
    v = (x.astype(np.int64) * 2654435761) % 4294967296
    v = ((v ^ (v >> 16)) * 73244475) % 4294967296
    v = ((v ^ (v >> 16)) * 73244475) % 4294967296
    return v ^ (v >> 16)


def _lane(ids: np.ndarray, salt: int, seed: int) -> np.ndarray:
    key = splitmix64(np.array([(seed * 1315423911 + salt) & 0xFFFFFFFFFFFFFFFF],
                              dtype=np.uint64))[0]
    return splitmix64(ids.astype(np.uint64) ^ key)


def _u01(ids: np.ndarray, salt: int, seed: int) -> np.ndarray:
    return _lane(ids, salt, seed).astype(np.float64) / 2.0**64


def _zipf_cdf(n: int, a: float) -> np.ndarray:
    p = 1.0 / np.arange(1, n + 1) ** a
    return np.cumsum(p / p.sum())


# ---------------------------------------------------------------- F1 corpus

_N_DOMAINS = 1000
_TS_BASE = 1735689600000000  # 2025-01-01T00:00:00Z in micros


def _bin_array(pieces: list[bytes], target: pa.DataType) -> pa.Array:
    """Binary-like array from a list of bytes via join+from_buffers — ~30x
    faster than pa.array(list) for large payloads."""
    n = len(pieces)
    flat = b"".join(pieces)
    lens = np.fromiter((len(p) for p in pieces), dtype=np.int64, count=n)
    off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=off[1:])
    arr = pa.Array.from_buffers(
        pa.large_binary(), n,
        [None, pa.py_buffer(off.tobytes()), pa.py_buffer(flat)])
    return arr.cast(target)


def _domains() -> list[bytes]:
    tlds = [b".com", b".org", b".net", b".io", b".dev"]
    return [b"www.site%04d%s" % (i, tlds[i % 5]) for i in range(_N_DOMAINS)]


import functools


@functools.lru_cache(maxsize=8)
def _noise_pool(seed: int) -> np.ndarray:
    """1 MiB deterministic high-entropy byte pool; rows slice it at per-row
    offsets so html tails are incompressible without per-byte hashing."""
    words = splitmix64(np.arange(1 << 17, dtype=np.uint64) + np.uint64(seed * 31))
    return words.view(np.uint8).copy()


@functools.lru_cache(maxsize=8)
def _phrases(seed: int) -> dict[str, list[bytes]]:
    """32 deterministic phrases per language, built from a per-lang vocab."""
    out: dict[str, list[bytes]] = {}
    for li, lang in enumerate(S.LANGS):
        hv = splitmix64(np.arange(64, dtype=np.uint64)
                        + np.uint64(seed * 977 + li * 131)) % np.uint64(99983)
        vocab = [f"{lang}w{int(h):x}" for h in hv]
        phrases = []
        for p in range(32):
            h = splitmix64(np.arange(p * 16, p * 16 + 7, dtype=np.uint64)
                           + np.uint64(seed + li * 7919))
            words = [vocab[int(x) % 64] for x in h]
            phrases.append((" ".join(words) + ". ").encode())
        out[lang] = phrases
    return out


def web_pages_batch(start: int, end: int, seed: int = 42,
                    skew: bool = False) -> pa.RecordBatch:
    """Rows [start, end) of the deterministic web_pages corpus (F1)."""
    n = end - start
    ids = np.arange(start, end, dtype=np.uint64)

    # lang: Zipf(1.5) over 10 langs; skew variant pins 90% to 'en'
    lang_cdf = _zipf_cdf(len(S.LANGS), 1.5)
    u = _u01(ids, 1, seed)
    lang_idx = np.searchsorted(lang_cdf, u).clip(0, len(S.LANGS) - 1)
    if skew:
        lang_idx = np.where(_u01(ids, 11, seed) < 0.9, 0, lang_idx)
    lang_arr = pa.DictionaryArray.from_arrays(
        pa.array(lang_idx.astype(np.int32)),
        pa.array(S.LANGS)).cast(pa.string())

    # url: https://{zipf domain}/{hex path}/{row-id hex} — unique per row.
    # Values are vectorized; final join is C-level bytes concatenation.
    dom_cdf = _zipf_cdf(_N_DOMAINS, 1.3)
    dom_idx = np.searchsorted(dom_cdf, _u01(ids, 2, seed)).clip(0, _N_DOMAINS - 1)
    if skew:
        dom_idx = np.where(_u01(ids, 12, seed) < 0.5, 7, dom_idx)
    domains = _domains()
    path_h = _lane(ids, 3, seed) & np.uint64(0xFFFFFF)
    urls = [b"https://%s/%06x/%08x" % (domains[d], p, i)
            for d, p, i in zip(dom_idx.tolist(), path_h.tolist(),
                               ids.astype(np.int64).tolist())]
    url = _bin_array(urls, pa.string())

    # warc_ts: near-monotone micros — base + id*997ms + bounded jitter
    jitter = (_lane(ids, 4, seed) % np.uint64(2_000_000)).astype(np.int64) - 1_000_000
    ts = (_TS_BASE + ids.astype(np.int64) * 997_000 + jitter)
    ts_arr = pa.array(ts, type=pa.int64()).cast(pa.timestamp("us"))

    # html: 0.5-8 KiB; 70% repeating template head, 30% entropy tail sliced
    # from a deterministic noise pool at a per-row offset; 0.1% empty rows
    sizes = (512 + _lane(ids, 5, seed) % np.uint64(7680)).astype(np.int64)
    sizes[_u01(ids, 6, seed) < 0.001] = 0
    tmpl = (b"<html><body><div class=\"c\"><p>lorem ipsum dolor sit amet</p>"
            b"</div></body>")
    tmpl_big = tmpl * (8192 // len(tmpl) + 2)
    pool = _noise_pool(seed)
    pool_b = pool.tobytes()
    keys = (_lane(ids, 7, seed) % np.uint64(len(pool) - 8192)).astype(np.int64)
    head_l = (sizes * 7) // 10
    htmls = [tmpl_big[:h] + pool_b[key:key + (sz - h)]
             for sz, h, key in zip(sizes.tolist(), head_l.tolist(),
                                   keys.tolist())]
    html = _bin_array(htmls, pa.binary())

    # text: 2-24 phrases from the row's lang (repeated phrases -> FSST food)
    phrases = _phrases(seed)
    all_ph = [p for lang in S.LANGS for p in phrases[lang]]
    k = (2 + _lane(ids, 8, seed) % np.uint64(23)).astype(np.int64)
    row_rep = np.repeat(np.arange(n), k)
    ends = np.cumsum(k)
    pos_rep = np.arange(int(ends[-1])) - np.repeat(ends - k, k)
    ph_pick = (splitmix64(np.repeat(ids, k) * np.uint64(31)
                          + pos_rep.astype(np.uint64)) % np.uint64(32)).astype(np.int64)
    ph_idx = (lang_idx[row_rep] * 32 + ph_pick).tolist()
    bounds = np.concatenate(([0], ends)).tolist()
    texts = [b"".join([all_ph[j] for j in ph_idx[bounds[r]:bounds[r + 1]]])
             for r in range(n)]
    text = _bin_array(texts, pa.string())

    return pa.RecordBatch.from_arrays(
        [url, ts_arr, html, text, lang_arr],
        schema=S.WEB_PAGES_ARROW)


def web_pages_table(rows: int, seed: int = 42, skew: bool = False,
                    batch: int = 65536) -> pa.Table:
    batches = [web_pages_batch(s, min(s + batch, rows), seed, skew)
               for s in range(0, rows, batch)]
    return pa.Table.from_batches(batches, schema=S.WEB_PAGES_ARROW)


def web_pages_df(spark, rows: int, seed: int = 42, skew: bool = False,
                 partitions: int | None = None):
    """Distributed generator: each task synthesizes its id-range slice."""
    from pyspark.sql import functions as F  # noqa: F401
    parts = partitions or spark.sparkContext.defaultParallelism
    rng = spark.range(0, rows, 1, parts)

    def gen(it):
        for b in it:
            ids = b.column(0).to_numpy()
            if len(ids) == 0:
                continue
            # spark.range slices are contiguous per batch
            yield web_pages_batch(int(ids[0]), int(ids[-1]) + 1, seed, skew)

    return rng.mapInArrow(gen, S.WEB_PAGES)


# ------------------------------------------------------ F2/F3 wide records

_NQ_TYPES = list(S.NASDAQ_TYPE_FIELDS)        # 22 incl. both add-order forms
_NQ_WEIGHTS = {"A": 22, "D": 18, "E": 14, "X": 10, "U": 9, "F": 6, "P": 5,
               "C": 3, "Q": 2, "B": 1, "I": 2, "R": 1, "H": 1, "L": 1,
               "S": 1, "Y": 1, "J": 1, "K": 1, "N": 1, "V": 1, "W": 1}
_JNX_TYPES = list(S.JNX_TYPE_FIELDS)
_JNX_WEIGHTS = {"A": 24, "D": 18, "E": 14, "U": 10, "F": 6, "R": 2, "H": 1,
                "S": 1, "T": 3, "L": 1, "Y": 1}

_STOCKS = [("SYM%04d" % i).encode() for i in range(200)]


def wide_itch_batch(start: int, end: int, which: str = "nasdaq",
                    seed: int = 42) -> pa.RecordBatch:
    """Rows [start, end) of the golden wide-record fixture (F2/F3).

    One row per protocol message; envelope always set, payload columns
    non-null iff the drawn message type carries them (parsers NQ:3557-3769 /
    JX:1741-1824). Messages are grouped into synthetic packets of 1-8
    messages to exercise the envelope operators (O3-O6)."""
    n = end - start
    ids = np.arange(start, end, dtype=np.uint64)
    if which == "nasdaq":
        types, weights, payload = _NQ_TYPES, _NQ_WEIGHTS, S.NASDAQ_PAYLOAD_KINDS
        type_fields, sch = S.NASDAQ_TYPE_FIELDS, S.NASDAQ_WIDE
    else:
        types, weights, payload = _JNX_TYPES, _JNX_WEIGHTS, S.JNX_PAYLOAD_KINDS
        type_fields, sch = S.JNX_TYPE_FIELDS, S.JNX_WIDE

    w = np.array([weights[t] for t in types], dtype=np.float64)
    cdf = np.cumsum(w / w.sum())
    t_idx = np.searchsorted(cdf, _u01(ids, 21, seed)).clip(0, len(types) - 1)
    t_codes = np.array([ord(t) for t in types], dtype=np.int32)[t_idx]

    # synthetic packet structure: packet id = id // (1 + id%8-ish); simpler:
    # fixed-size blocks of 1..8 messages derived from block hash
    blk = ids // np.uint64(4)  # avg 4 messages per packet
    message_index = (ids % np.uint64(4)).astype(np.int32) + 1
    pcap_index = blk.astype(np.int64) + 1                     # dense counter (O3)
    header_seq = blk.astype(np.int64) * 7 + 1
    # per-message sequence: header seq incremented before EVERY write incl.
    # the first — the reference's observed off-by-one (ref NQ:3457, NQ:157-159)
    message_sequence = header_seq + message_index.astype(np.int64)
    # one capture timestamp per PACKET (shared by its messages, ref NQ:60-83)
    pcap_ts = _TS_BASE + blk.astype(np.int64) * 1000 + (
        _lane(blk, 22, seed) % np.uint64(900)).astype(np.int64)

    cols: list[pa.Array] = [
        pa.array(pcap_index, type=pa.int64()),
        pa.array(pcap_ts, type=pa.int64()).cast(pa.timestamp("us")),
        pa.array(np.repeat(np.array(["SESSION%03d" % (seed % 1000)]), n)),
        pa.array(message_sequence, type=pa.int64()),
        pa.array(message_index, type=pa.int32()),
        pa.array(t_codes, type=pa.int32()),
    ]

    # which columns each row populates
    carrier: dict[str, np.ndarray] = {}
    for ti, t in enumerate(types):
        mask = t_idx == ti
        for f in type_fields[t]:
            carrier.setdefault(f, np.zeros(n, dtype=bool))[mask] = True

    for ci, name in enumerate(sorted(payload)):
        kind, width = payload[name]
        valid = carrier.get(name, np.zeros(n, dtype=bool))
        h = _lane(ids, 100 + ci, seed)
        if kind == "str":
            if name == "stock":
                sidx = np.searchsorted(_zipf_cdf(len(_STOCKS), 1.2),
                                       _u01(ids, 200 + ci, seed)).clip(0, 199)
                choices = _STOCKS
                pick = sidx
            else:
                choices = [bytes((b"VAL%d" % k)[:max(width, 2)])
                           for k in range(7)] + [b""]
                pick = (h % np.uint64(len(choices))).astype(np.int64)
            vals = pa.DictionaryArray.from_arrays(
                pa.array(pick.astype(np.int32)),
                pa.array([c.decode() for c in choices])).cast(pa.string())
            arr = pa.Array.from_pandas(vals.to_pandas().where(valid, None))
            cols.append(pa.array(arr, type=pa.string()))
        else:
            bound = S.KIND_BOUND[kind]
            if kind == "u8":
                # ASCII code ints, small alphabet (enum chars, e.g. NQ:416-440)
                v = (h % np.uint64(5)).astype(np.int64) + 65
            else:
                v = (h % np.uint64(bound)).astype(np.int64)
            target = pa.int64() if kind in ("u32", "u48", "u64") \
                else pa.int32()
            np_vals = v if target == pa.int64() else v.astype(np.int32)
            cols.append(pa.array(np_vals, type=target,
                                 mask=~valid))
    return pa.RecordBatch.from_arrays(cols, schema=sch)


def wide_itch_table(rows: int, which: str = "nasdaq", seed: int = 42,
                    batch: int = 65536) -> pa.Table:
    batches = [wide_itch_batch(s, min(s + batch, rows), which, seed)
               for s in range(0, rows, batch)]
    sch = S.NASDAQ_WIDE if which == "nasdaq" else S.JNX_WIDE
    return pa.Table.from_batches(batches, schema=sch)


# --------------------------------------------------------- F4 golden writer

def write_golden_parquet(table: pa.Table, path: str) -> int:
    """Write with the reference converters' exact writer config: default
    properties (dictionary on, PLAIN fallback), UNCOMPRESSED, row groups
    <= 1,000 rows (ref NQ:3391+3396-3397; JX:1615+1620-1621). Returns bytes."""
    import os
    pq.write_table(table, path, compression="NONE",
                   row_group_size=GOLDEN_ROW_GROUP,
                   use_dictionary=True,
                   write_statistics=True)
    return os.path.getsize(path)


# ------------------------------------------- binary packet capture fixture

_KIND_WIDTH = {"u8": 1, "u16": 2, "u32": 4, "u48": 6, "u64": 8}


def packets_table(rows: int, which: str = "nasdaq",
                  seed: int = 42) -> pa.Table:
    """Binary packet capture equivalent of wide_itch_table(rows):
    (pcap_sec, pcap_usec, payload) with MoldUDP64-style payloads —
    session(10B ASCII) + sequence(8B BE) + count(2B BE) + per message
    [length(2B BE) + type(1B) + fields in the reference parse order
    (NQ:3557-3769 / JX:1741-1824)].

    Serializing the wide fixture and parsing it back with
    operators.wide_record.parse_packets must reproduce wide_itch_table
    exactly — the engine-side proof that the protocol decode (O4-O10) is
    faithful to the reference."""
    from omi_cpp_parquet_wide_record_spark import schema as S
    wide = wide_itch_table(rows, which, seed)
    kinds = S.NASDAQ_PAYLOAD_KINDS if which == "nasdaq" else S.JNX_PAYLOAD_KINDS
    type_fields = S.NASDAQ_TYPE_FIELDS if which == "nasdaq" else S.JNX_TYPE_FIELDS
    cols = {name: wide.column(name).to_pylist() for name in wide.column_names}
    n = wide.num_rows
    session = cols["session"][0].encode()

    payloads: list[bytes] = []
    secs: list[int] = []
    usecs: list[int] = []
    i = 0
    while i < n:
        blk = (cols["pcap_index"][i] - 1)
        msgs = []
        j = i
        while j < n and cols["pcap_index"][j] == blk + 1:
            mtype = cols["message_type"][j]
            body = bytearray()
            for f in type_fields[chr(mtype)]:
                kind, width = kinds[f]
                v = cols[f][j]
                if kind == "str":
                    b = (v or "").encode()[:width]
                    body += b + b" " * (width - len(b))
                else:
                    body += int(v).to_bytes(_KIND_WIDTH[kind], "big")
            # MoldUDP64 convention: length covers type byte + body
            msgs.append((len(body) + 1).to_bytes(2, "big") + bytes([mtype])
                        + bytes(body))
            j += 1
        header_seq = blk * 7 + 1
        payloads.append(session + header_seq.to_bytes(8, "big")
                        + len(msgs).to_bytes(2, "big") + b"".join(msgs))
        ts = int(wide.column("pcap_timestamp")[i].cast(pa.int64()).as_py())
        secs.append(ts // 1_000_000)
        usecs.append(ts % 1_000_000)
        i = j

    return pa.table({
        "pcap_sec": pa.array(secs, type=pa.int64()),
        "pcap_usec": pa.array(usecs, type=pa.int64()),
        "payload": _bin_array(payloads, pa.binary()),
    })


# --------------------------------------------------- F5 pcap capture fixture

def _ipv4_header(payload_len: int, proto: int, ident: int,
                 opts: bytes = b"") -> bytes:
    ihl = 5 + len(opts) // 4
    total = 20 + len(opts) + payload_len
    return (bytes([0x40 | ihl, 0]) + total.to_bytes(2, "big")
            + (ident & 0xFFFF).to_bytes(2, "big") + b"\x00\x00"
            + bytes([64, proto]) + b"\x00\x00"
            + bytes([10, 0, 0, 1]) + bytes([239, 192, 0, 1]) + opts)


def pcap_capture(rows: int, which: str = "nasdaq", seed: int = 42) -> bytes:
    """Serialize packets_table(rows) into a real pcap byte stream.

    Frames are Ethernet / optional stacked VLAN tags / IPv4 (some with
    header options, IHL=6) / UDP / MoldUDP64 payload. Deterministic non-UDP
    noise frames (TCP segments, ARP requests) are interleaved — the protocol
    filter must drop them while still bumping pcap_index (ref NQ:3403).
    """
    from omi_cpp_parquet_wide_record_spark.sources.pcap import (
        write_pcap_header,
    )
    pkts = packets_table(rows, which, seed)
    secs = pkts.column("pcap_sec").to_pylist()
    usecs = pkts.column("pcap_usec").to_pylist()
    pays = pkts.column("payload").to_pylist()
    n = len(pays)
    draws = splitmix64(np.arange(n, dtype=np.uint64) + np.uint64(seed * 31337))

    mac = b"\x02\x00\x00\x00\x00\x01" + b"\x02\x00\x00\x00\x00\x02"
    out = [write_pcap_header()]

    def record(sec: int, usec: int, frame: bytes) -> bytes:
        return (sec.to_bytes(4, "little") + usec.to_bytes(4, "little")
                + len(frame).to_bytes(4, "little") * 2 + frame)

    for i in range(n):
        d = int(draws[i])
        # deterministic noise frames BEFORE some data packets
        if d % 5 == 0:          # TCP segment: IPv4 but not UDP
            tcp = b"\x30\x39\x00\x50" + b"\x00" * 16 + b"noise"
            frame = mac + b"\x08\x00" + _ipv4_header(len(tcp), 6, i) + tcp
            out.append(record(secs[i], max(usecs[i] - 1, 0), frame))
        if d % 11 == 3:         # ARP request: not IPv4 at all
            arp = (b"\x00\x01\x08\x00\x06\x04\x00\x01" + b"\x00" * 20)
            frame = mac + b"\x08\x06" + arp
            out.append(record(secs[i], max(usecs[i] - 1, 0), frame))
        vlans = b""
        if d % 3 == 0:          # single VLAN tag
            vlans = b"\x81\x00\x00\x2a"
        if d % 9 == 1:          # stacked QinQ pair
            vlans = b"\x81\x00\x00\x64\x81\x00\x00\x2a"
        opts = b"\x01\x01\x01\x01" if d % 7 == 0 else b""   # IHL=6 variant
        udp = (b"\x30\x39" + b"\x67\x6d"
               + (8 + len(pays[i])).to_bytes(2, "big") + b"\x00\x00"
               + pays[i])
        frame = (mac + vlans + b"\x08\x00"
                 + _ipv4_header(len(udp), 17, i, opts) + udp)
        out.append(record(secs[i], usecs[i], frame))
    return b"".join(out)


def reference_parse_pcap(data: bytes, which: str = "nasdaq") -> pa.Table:
    """Independent scalar re-implementation of the reference converter's
    packet loop — row-at-a-time, exactly the shape of the C++ original
    (pcap loop NQ:3792-3808, protocol strip NQ:3401-3434, message loop
    NQ:3451-3462, per-type field parse NQ:3557-3769). Used only to produce
    golden tables at test scale: the vectorized Spark path and this scalar
    path are two independent implementations that must agree bit-for-bit.
    """
    from omi_cpp_parquet_wide_record_spark import schema as S
    kinds = S.NASDAQ_PAYLOAD_KINDS if which == "nasdaq" else S.JNX_PAYLOAD_KINDS
    type_fields = (S.NASDAQ_TYPE_FIELDS if which == "nasdaq"
                   else S.JNX_TYPE_FIELDS)
    sch = S.NASDAQ_WIDE if which == "nasdaq" else S.JNX_WIDE

    endian = "big" if data[:4] == b"\xa1\xb2\xc3\xd4" else "little"
    rows: list[dict] = []
    pos, pcap_index = 24, 0
    while pos + 16 <= len(data):
        sec = int.from_bytes(data[pos:pos + 4], endian)
        usec = int.from_bytes(data[pos + 4:pos + 8], endian)
        incl = int.from_bytes(data[pos + 8:pos + 12], endian)
        if pos + 16 + incl > len(data):
            break       # truncated tail record — mirror frame_records
        frame = data[pos + 16:pos + 16 + incl]
        pos += 16 + incl
        pcap_index += 1                       # bumps for EVERY frame, NQ:3403
        # ethernet + VLAN stepping (NQ:3410-3412), bounded at 8 stacked
        # tags to mirror the vectorized path's defensive cap exactly
        et = 12
        hops = 0
        while frame[et] << 8 | frame[et + 1] == 0x8100 and hops < 8:
            et += 4
            hops += 1
        if frame[et] << 8 | frame[et + 1] != 0x0800:
            continue
        ip = et + 2
        ihl = (frame[ip] & 0x0F) * 4
        if frame[ip + 9] != 17:               # UDP test, NQ:3421
            continue
        udp = ip + ihl
        udp_len = frame[udp + 4] << 8 | frame[udp + 5]
        pay = frame[udp + 8:udp + udp_len]
        # MoldUDP64 envelope (NQ:3447-3449) + message loop (NQ:3451-3462)
        session = pay[:10].decode()
        header_seq = int.from_bytes(pay[10:18], "big")
        count = int.from_bytes(pay[18:20], "big")
        cur = 20
        for m in range(1, count + 1):
            mlen = int.from_bytes(pay[cur:cur + 2], "big")
            cur += 2
            mtype = pay[cur]
            body = pay[cur + 1:cur + mlen]
            cur += mlen
            row = dict.fromkeys(sch.names)
            row.update(pcap_index=pcap_index,
                       pcap_timestamp=sec * 1_000_000 + usec,
                       session=session,
                       message_sequence=header_seq + m,   # off-by-one kept
                       message_index=m, message_type=mtype)
            o = 0
            for f in type_fields[chr(mtype)]:
                kind, width = kinds[f]
                if kind == "str":
                    # trim at FIRST space (NQ:2678-2685)
                    row[f] = body[o:o + width].split(b" ")[0].decode()
                    o += width
                else:
                    w = _KIND_WIDTH[kind]
                    row[f] = int.from_bytes(body[o:o + w], "big")
                    o += w
            rows.append(row)

    arrays = []
    for field in sch:
        vals = [r[field.name] for r in rows]
        if pa.types.is_timestamp(field.type):
            arrays.append(pa.array(vals, type=pa.int64()).cast(field.type))
        else:
            arrays.append(pa.array(vals, type=field.type))
    return pa.Table.from_arrays(arrays, schema=sch)


# ----------------------------------------------- F6 media feature golden

def reference_media_features(n: int, seed: int = 42,
                             resize_to: tuple[int, int] = (8, 8)) -> pa.Table:
    """Scalar per-image golden for the multimodal kernels: generates each
    fake payload and computes (width, height, mean, std, phash) plus the
    md5 of the resized payload one image at a time — the independent
    implementation the whole-batch kernels must agree with, same pattern as
    reference_parse_pcap. Payloads depend only on (id, seed), never on the
    table sf, so a golden for ids 0..n-1 covers any driver scale factor."""
    import hashlib
    from omi_cpp_parquet_wide_record_spark.operators.multimodal import (
        FAKE_MAGIC,
    )
    out_w, out_h = resize_to
    rows = {"id": [], "width": [], "height": [], "mean": [], "std": [],
            "phash": [], "resize_md5": []}
    for i in range(n):
        ii = np.array([i], dtype=np.uint64)
        w = int(8 + splitmix64(ii + np.uint64(seed))[0] % np.uint64(24))
        h = int(8 + splitmix64(ii * np.uint64(3) + np.uint64(seed))[0]
                % np.uint64(24))
        body = (splitmix64(np.arange(w * h // 8 + 1, dtype=np.uint64)
                           + np.uint64(i)).view(np.uint8)[: w * h])
        img = body.reshape(h, w)
        pix = img.astype(np.float64)
        npix = w * h
        mean = float(pix.sum() / npix)
        std = float(np.sqrt(max((pix * pix).sum() / npix - mean * mean, 0.0)))
        ys = (np.arange(8) * h) // 8
        xs = (np.arange(8) * w) // 8
        small = img[ys][:, xs].astype(np.float64)
        bits = (small > small.mean()).astype(np.uint64).ravel()
        phash = (bits << np.arange(64, dtype=np.uint64)).sum()
        rys = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
        rxs = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
        resized = (FAKE_MAGIC + out_w.to_bytes(2, "little")
                   + out_h.to_bytes(2, "little")
                   + img[rys][:, rxs].tobytes())
        rows["id"].append(i)
        rows["width"].append(w)
        rows["height"].append(h)
        rows["mean"].append(float(np.round(mean, 4)))
        rows["std"].append(float(np.round(std, 4)))
        rows["phash"].append(int(np.uint64(phash).view(np.int64)))
        rows["resize_md5"].append(hashlib.md5(resized).hexdigest())
    return pa.table({
        "id": pa.array(rows["id"], type=pa.int64()),
        "width": pa.array(rows["width"], type=pa.int32()),
        "height": pa.array(rows["height"], type=pa.int32()),
        "mean": pa.array(rows["mean"], type=pa.float64()),
        "std": pa.array(rows["std"], type=pa.float64()),
        "phash": pa.array(rows["phash"], type=pa.int64()),
        "resize_md5": pa.array(rows["resize_md5"], type=pa.string()),
    })
