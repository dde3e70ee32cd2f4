"""Real pcap-file ingestion: O1 + O2 on actual capture bytes.

The reference opens an offline capture and iterates packets
(`pcap_open_offline` + `pcap_next_ex`, ref NQ:3777-3809 / JX:1832-1864),
then strips Ethernet (+VLAN tags, 4-byte stepping loop), parses the IPv4
header, and keeps only UDP — non-UDP packets are dropped but still bump the
1-based packet counter (`try_get_nasdaq_itch`, ref NQ:3401-3434; VLAN loop
3410-3412; UDP test 3421; counter bump before the filter, NQ:3403).

Spark shape: `spark.read.format("binaryFile")` fans capture files out over
the cluster (one task per file — captures are the natural work unit, the
in-file record chain is inherently sequential, exactly as in the
reference's single pcap loop). Inside a task, the per-record header walk
touches only the 16-byte pcap record headers; every per-packet byte
operation (ethertype reads, VLAN stepping, IHL/protocol extraction, UDP
payload slicing) is whole-array numpy over all records at once.

Output: (pcap_index, pcap_sec, pcap_usec, payload) — the packets table the
wide-record parser (operators/wide_record.py, O4-O10) consumes, with
pcap_index already dense per file including dropped non-UDP packets.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession

PCAP_MAGIC_LE = b"\xd4\xc3\xb2\xa1"   # 0xa1b2c3d4 written little-endian
PCAP_MAGIC_BE = b"\xa1\xb2\xc3\xd4"
LINKTYPE_ETHERNET = 1

ETHERTYPE_VLAN = 0x8100
ETHERTYPE_IPV4 = 0x0800
IPPROTO_UDP = 17


def write_pcap_header(snaplen: int = 65535) -> bytes:
    """24-byte pcap global header (LE byte order, v2.4, Ethernet link)."""
    return (PCAP_MAGIC_LE
            + (2).to_bytes(2, "little") + (4).to_bytes(2, "little")
            + (0).to_bytes(4, "little", signed=True)   # thiszone
            + (0).to_bytes(4, "little")                # sigfigs
            + snaplen.to_bytes(4, "little")
            + LINKTYPE_ETHERNET.to_bytes(4, "little"))


def frame_records(data: bytes) -> tuple[np.ndarray, np.ndarray,
                                        np.ndarray, np.ndarray]:
    """Walk the pcap record chain: (sec, usec, frame_off, frame_len) arrays.

    The chain is a sequential dependency (each record header holds the
    length that locates the next), mirroring the reference's pcap_next_ex
    loop (NQ:3792-3808); only the 16-byte headers are touched here — all
    per-packet payload work downstream is vectorized. Parallelism at scale
    comes from many capture files, not from inside one chain.
    """
    if data[:4] == PCAP_MAGIC_BE:
        endian = "big"
    elif data[:4] == PCAP_MAGIC_LE:
        endian = "little"
    else:
        raise ValueError("not a pcap file (bad magic)")
    mv = memoryview(data)
    size = len(data)
    secs, usecs, offs, lens = [], [], [], []
    pos = 24
    while pos + 16 <= size:
        incl = int.from_bytes(mv[pos + 8:pos + 12], endian)
        if pos + 16 + incl > size:
            break       # truncated tail record (killed capture) — drop it
        secs.append(int.from_bytes(mv[pos:pos + 4], endian))
        usecs.append(int.from_bytes(mv[pos + 4:pos + 8], endian))
        offs.append(pos + 16)
        lens.append(incl)
        pos += 16 + incl
    return (np.asarray(secs, dtype=np.int64),
            np.asarray(usecs, dtype=np.int64),
            np.asarray(offs, dtype=np.int64),
            np.asarray(lens, dtype=np.int64))


def _be16(corpus: np.ndarray, off: np.ndarray) -> np.ndarray:
    return (corpus[off].astype(np.int64) << 8) | corpus[off + 1]


def strip_to_udp(corpus: np.ndarray, offs: np.ndarray, lens: np.ndarray,
                 max_vlan_tags: int = 8
                 ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized eth/VLAN/IPv4/UDP strip over all frames at once.

    Returns (keep_rows, payload_off, payload_len): indices of UDP frames and
    their UDP payload byte ranges. Mirrors try_get_nasdaq_itch
    (ref NQ:3401-3434): VLAN tags stepped 4 bytes at a time while the
    ethertype reads 0x8100 (NQ:3410-3412), IPv4 header length from the IHL
    nibble, protocol test against UDP (NQ:3421). Speculative gathers are
    clipped to the corpus bounds and masked afterwards, so short non-IP
    frames never read out of range.
    """
    n = len(offs)
    if n == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z, z
    hi = len(corpus) - 2

    def g16(off):
        return _be16(corpus, np.minimum(off, hi))

    etype_off = offs + 12
    etype = g16(etype_off)
    for _ in range(max_vlan_tags):          # VLAN stepping loop, NQ:3410-3412
        vlan = etype == ETHERTYPE_VLAN
        if not vlan.any():
            break
        etype_off = np.where(vlan, etype_off + 4, etype_off)
        etype = np.where(vlan, g16(etype_off), etype)
    ip_off = etype_off + 2
    is_ip = (etype == ETHERTYPE_IPV4) & (ip_off + 20 <= offs + lens)
    ihl = (corpus[np.minimum(ip_off, hi)] & 0x0F).astype(np.int64) * 4
    proto = corpus[np.minimum(ip_off + 9, hi)]
    keep = is_ip & (proto == IPPROTO_UDP)    # UDP test, NQ:3421

    rows = np.flatnonzero(keep)
    udp_off = ip_off[rows] + ihl[rows]
    udp_len = g16(udp_off + 4)
    pay_off = udp_off + 8
    pay_len = np.maximum(udp_len - 8, 0)
    # never run past the captured frame
    frame_end = (offs + lens)[rows]
    pay_len = np.minimum(pay_len, np.maximum(frame_end - pay_off, 0))
    return rows, pay_off, pay_len


def packets_from_capture(data: bytes) -> pa.RecordBatch:
    """One capture file -> (pcap_index, pcap_sec, pcap_usec, payload) batch.

    pcap_index is 1-based over ALL frames — dropped non-UDP frames bump it
    without emitting a row (ref NQ:3403: the counter increments before the
    protocol filter).
    """
    sec, usec, offs, lens = frame_records(data)
    corpus = np.frombuffer(data, dtype=np.uint8)
    rows, pay_off, pay_len = strip_to_udp(corpus, offs, lens)

    # gather payload bytes into one contiguous block (whole-array)
    out_offs = np.zeros(len(rows) + 1, dtype=np.int64)
    np.cumsum(pay_len, out=out_offs[1:])
    total = int(out_offs[-1])
    pos = np.arange(total, dtype=np.int64) - np.repeat(out_offs[:-1], pay_len)
    flat = corpus[np.repeat(pay_off, pay_len) + pos]
    payload = pa.Array.from_buffers(
        pa.large_binary(), len(rows),
        [None, pa.py_buffer(out_offs.tobytes()), pa.py_buffer(flat.tobytes())],
    ).cast(pa.binary())

    return pa.RecordBatch.from_arrays(
        [pa.array(rows + 1, type=pa.int64()),
         pa.array(sec[rows], type=pa.int64()),
         pa.array(usec[rows], type=pa.int64()),
         payload],
        names=["pcap_index", "pcap_sec", "pcap_usec", "payload"])


def read_pcap(spark: SparkSession, path: str) -> DataFrame:
    """Distributed pcap scan: capture files -> packets DataFrame.

    `binaryFile` assigns whole files to tasks (a 100 TB corpus is many
    capture files; each decodes independently). The emitted pcap_index is
    per-file, like the reference's per-run counter.
    """
    import os
    reader = spark.read.format("binaryFile")
    if os.path.isdir(path):
        reader = reader.option("recursiveFileLookup", "true") \
                       .option("pathGlobFilter", "*.pcap")
    files = reader.load(path).select("content")

    def task(batches):
        for b in batches:
            content = b.column("content")
            for i in range(len(content)):
                out = packets_from_capture(content[i].as_py())
                if out.num_rows:
                    yield out

    return files.mapInArrow(
        task, "pcap_index long, pcap_sec long, pcap_usec long, payload binary")


# ------------------------------------------------ registered Spark format

def _list_captures(path: str) -> list[str]:
    import glob
    import os
    if os.path.isdir(path):
        return sorted(glob.glob(os.path.join(path, "**", "*.pcap"),
                                recursive=True))
    return sorted(glob.glob(path))


try:
    from pyspark.sql.datasource import (
        DataSource, DataSourceReader, InputPartition,
    )

    class _PcapPartition(InputPartition):
        def __init__(self, path: str):
            self.path = path

    class _PcapReader(DataSourceReader):
        def __init__(self, options):
            self.path = options.get("path")
            if not self.path:
                raise ValueError("pcap source needs a path")

        def partitions(self):
            files = _list_captures(self.path)
            if not files:
                raise FileNotFoundError(f"no .pcap files under {self.path}")
            return [_PcapPartition(f) for f in files]

        def read(self, partition: _PcapPartition):
            with open(partition.path, "rb") as f:
                batch = packets_from_capture(f.read())
            if batch.num_rows:
                yield batch

    class PcapDataSource(DataSource):
        """spark.read.format("pcap").load(path): one task per capture file
        (local/shared filesystem paths; use read_pcap() + binaryFile for
        object stores). Register with
        spark.dataSource.register(PcapDataSource)."""

        @classmethod
        def name(cls) -> str:
            return "pcap"

        def schema(self):
            return ("pcap_index long, pcap_sec long, pcap_usec long, "
                    "payload binary")

        def reader(self, schema):
            return _PcapReader(self.options)
except ImportError:       # pragma: no cover - older pyspark without the API
    PcapDataSource = None
