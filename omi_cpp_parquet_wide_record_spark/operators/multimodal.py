"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video travel as `binary` columns with a metadata struct; decode /
feature-extract / resize / frame-sample run as Arrow-batched kernels over
mapInArrow so the Spark-side shape (schema, partitioning, batch handling) is
real and tested even though the actual media codecs are NOT present in this
environment. The decode step is therefore stubbed: `decode_image` raises
NotImplementedError unless a known deterministic fake header is detected,
and `fake_media` generates exactly such payloads for tests/benches.

Payload convention of the deterministic fake: b"OWRIMG1" + u16 width +
u16 height + raw bytes (w*h). A real deployment swaps `_decode_payload` for
Pillow/ffmpeg and nothing else changes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame, functions as F

FAKE_MAGIC = b"OWRIMG1"


def fake_media_df(df: DataFrame, id_col: str = "doc_id",
                  seed: int = 42) -> DataFrame:
    """Attach a deterministic fake image payload per row: (id, media, meta)."""
    src = df.select(F.col(id_col).alias("id"))

    def task(batches):
        from omi_cpp_parquet_wide_record_spark.fixtures import splitmix64
        for b in batches:
            ids = b.column("id").to_numpy()
            if len(ids) == 0:
                continue
            w = (8 + splitmix64(ids.astype(np.uint64) + np.uint64(seed)) %
                 np.uint64(24)).astype(np.int64)
            h = (8 + splitmix64(ids.astype(np.uint64) * np.uint64(3) +
                                np.uint64(seed)) % np.uint64(24)).astype(np.int64)
            payloads = []
            for i, (wi, hi) in enumerate(zip(w.tolist(), h.tolist())):
                body = (splitmix64(np.arange(wi * hi // 8 + 1, dtype=np.uint64)
                                   + np.uint64(ids[i]))
                        .view(np.uint8)[: wi * hi])
                payloads.append(FAKE_MAGIC + wi.to_bytes(2, "little")
                                + hi.to_bytes(2, "little") + body.tobytes())
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, type=pa.int64()),
                 pa.array(payloads, type=pa.binary()),
                 pa.StructArray.from_arrays(
                     [pa.array(w, type=pa.int32()),
                      pa.array(h, type=pa.int32()),
                      pa.array(["image/owr-fake"] * len(ids))],
                     names=["width", "height", "mime"])],
                names=["id", "media", "meta"])

    return src.mapInArrow(
        task, "id long, media binary, "
              "meta struct<width:int, height:int, mime:string>")


def _decode_payload(buf: bytes) -> np.ndarray:
    """Stub decoder. Real media codecs are not available in this container;
    only the deterministic fake format decodes. SURVEY-mandated stub."""
    if buf[:7] != FAKE_MAGIC:
        raise NotImplementedError(
            "real image/audio decode requires Pillow/ffmpeg, absent in this "
            "environment; only the OWRIMG1 deterministic fake is supported")
    w = int.from_bytes(buf[7:9], "little")
    h = int.from_bytes(buf[9:11], "little")
    return np.frombuffer(buf[11:11 + w * h], dtype=np.uint8).reshape(h, w)


def media_features(df: DataFrame, media_col: str = "media",
                   id_col: str = "id") -> DataFrame:
    """Feature extraction over binary media: (id, width, height, mean, std,
    phash: long). Arrow-batched; per-image decode is numpy-only."""

    def task(batches):
        for b in batches:
            ids = b.column(id_col).to_numpy()
            media = b.column(media_col)
            rows = {"id": [], "width": [], "height": [], "mean": [],
                    "std": [], "phash": []}
            for i in range(len(ids)):
                img = _decode_payload(media[i].as_py())
                rows["id"].append(int(ids[i]))
                rows["width"].append(img.shape[1])
                rows["height"].append(img.shape[0])
                rows["mean"].append(round(float(img.mean()), 4))
                rows["std"].append(round(float(img.std()), 4))
                # 8x8 average-hash: resize by block mean, threshold at mean
                bh = _avg_hash(img)
                rows["phash"].append(int(np.int64(np.uint64(bh))))
            yield pa.RecordBatch.from_pydict(
                rows, schema=pa.schema([
                    ("id", pa.int64()), ("width", pa.int32()),
                    ("height", pa.int32()), ("mean", pa.float64()),
                    ("std", pa.float64()), ("phash", pa.int64())]))

    return df.mapInArrow(
        task, "id long, width int, height int, mean double, std double, "
              "phash long")


def _avg_hash(img: np.ndarray) -> int:
    h, w = img.shape
    ys = (np.arange(8) * h) // 8
    xs = (np.arange(8) * w) // 8
    small = img[np.minimum(ys, h - 1)][:, np.minimum(xs, w - 1)].astype(np.float64)
    bits = (small > small.mean()).astype(np.uint64).ravel()
    return int((bits << np.arange(64, dtype=np.uint64)).sum())


def resize_media(df: DataFrame, out_w: int = 8, out_h: int = 8,
                 media_col: str = "media", id_col: str = "id") -> DataFrame:
    """Resize (nearest-neighbor) inside the fake format — exercises the
    binary-in/binary-out transform shape used for real thumbnailing."""

    def task(batches):
        for b in batches:
            ids = b.column(id_col).to_numpy()
            media = b.column(media_col)
            out = []
            for i in range(len(ids)):
                img = _decode_payload(media[i].as_py())
                h, w = img.shape
                ys = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
                xs = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
                small = img[ys][:, xs]
                out.append(FAKE_MAGIC + out_w.to_bytes(2, "little")
                           + out_h.to_bytes(2, "little") + small.tobytes())
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, type=pa.int64()),
                 pa.array(out, type=pa.binary())],
                names=["id", "media"])

    return df.mapInArrow(task, "id long, media binary")
