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
            n = len(ids)
            w = (8 + splitmix64(ids.astype(np.uint64) + np.uint64(seed)) %
                 np.uint64(24)).astype(np.int64)
            h = (8 + splitmix64(ids.astype(np.uint64) * np.uint64(3) +
                                np.uint64(seed)) % np.uint64(24)).astype(np.int64)
            npix = w * h
            # pixel bodies, whole-batch: per image i the body bytes are
            # splitmix64(arange(npix_i//8+1) + id_i) viewed as u8, truncated
            # to npix_i — generated for all images via one segmented arange
            nlane = npix // 8 + 1
            lseg = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(nlane, out=lseg[1:])
            lane_pos = np.arange(int(lseg[-1]), dtype=np.int64) \
                - np.repeat(lseg[:-1], nlane)
            lanes = splitmix64(lane_pos.astype(np.uint64)
                               + np.repeat(ids, nlane).astype(np.uint64))
            lane_bytes = lanes.view(np.uint8)     # 8 bytes per lane, ordered
            # output layout: per image 11-byte header + npix pixel bytes
            out_len = 11 + npix
            oseg = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(out_len, out=oseg[1:])
            flat = np.zeros(int(oseg[-1]), dtype=np.uint8)
            starts = oseg[:-1]
            magic = np.frombuffer(FAKE_MAGIC, dtype=np.uint8)
            for j in range(7):
                flat[starts + j] = magic[j]
            flat[starts + 7] = w & 0xFF
            flat[starts + 8] = w >> 8
            flat[starts + 9] = h & 0xFF
            flat[starts + 10] = h >> 8
            ppos = np.arange(int(npix.sum()), dtype=np.int64) \
                - np.repeat(np.concatenate(([0], np.cumsum(npix)))[:-1], npix)
            flat[np.repeat(starts + 11, npix) + ppos] = \
                lane_bytes[np.repeat(lseg[:-1] * 8, npix) + ppos]
            media = pa.Array.from_buffers(
                pa.large_binary(), n,
                [None, pa.py_buffer(oseg.tobytes()),
                 pa.py_buffer(flat.tobytes())]).cast(pa.binary())
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, type=pa.int64()), media,
                 pa.StructArray.from_arrays(
                     [pa.array(w, type=pa.int32()),
                      pa.array(h, type=pa.int32()),
                      pa.array(["image/owr-fake"] * n)],
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


def _decode_batch(media: pa.Array) -> tuple[np.ndarray, np.ndarray,
                                            np.ndarray, np.ndarray]:
    """Whole-batch fake-format decode: (w, h, body_off, corpus) for every
    payload at once — the batch analogue of _decode_payload. A payload that
    is not the fake format routes through _decode_payload to raise the
    documented NotImplementedError."""
    from omi_cpp_parquet_wide_record_spark.codecs.base import bytes_block
    lens, corpus_mv = bytes_block(media.cast(pa.large_binary()))
    corpus = np.frombuffer(corpus_mv, dtype=np.uint8)
    starts = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=starts[1:])
    starts = starts[:-1]
    magic = np.frombuffer(FAKE_MAGIC, dtype=np.uint8)
    ok = lens >= 11
    w = np.zeros(len(lens), dtype=np.int64)
    h = np.zeros(len(lens), dtype=np.int64)
    if len(corpus) and ok.any():
        hi = len(corpus) - 1
        for j in range(7):
            ok &= corpus[np.minimum(starts + j, hi)] == magic[j]
        w = (corpus[np.minimum(starts + 7, hi)].astype(np.int64)
             | (corpus[np.minimum(starts + 8, hi)].astype(np.int64) << 8))
        h = (corpus[np.minimum(starts + 9, hi)].astype(np.int64)
             | (corpus[np.minimum(starts + 10, hi)].astype(np.int64) << 8))
        # a truncated body must error like the scalar decoder, not silently
        # gather the next payload's bytes
        ok &= lens >= 11 + w * h
    else:
        ok = np.zeros(len(lens), dtype=bool)
    if not ok.all():
        bad = int(np.flatnonzero(~ok)[0])
        _decode_payload(bytes(corpus[starts[bad]:starts[bad] + lens[bad]]))
        raise ValueError("malformed media payload (truncated body)")
    return w, h, starts + 11, corpus


def _sample_grid(w: np.ndarray, h: np.ndarray, body_off: np.ndarray,
                 corpus: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """(n, out_h, out_w) nearest-neighbor sample of every image at once:
    one fancy-index gather, no per-image loop."""
    ys = np.minimum((np.arange(out_h)[None, :] * h[:, None]) // out_h,
                    (h - 1)[:, None])                       # (n, out_h)
    xs = np.minimum((np.arange(out_w)[None, :] * w[:, None]) // out_w,
                    (w - 1)[:, None])                       # (n, out_w)
    idx = (body_off[:, None, None]
           + ys[:, :, None] * w[:, None, None]
           + xs[:, None, :])                                # (n, out_h, out_w)
    return corpus[idx]


def media_features(df: DataFrame, media_col: str = "media",
                   id_col: str = "id") -> DataFrame:
    """Feature extraction over binary media: (id, width, height, mean, std,
    phash: long). Whole-batch numpy: per-image mean/std are segmented
    reduceat folds over one flat pixel gather; the 8x8 average-hash is one
    (n, 8, 8) gather — zero per-row Python (north rule)."""

    def task(batches):
        for b in batches:
            ids = b.column(id_col).to_numpy()
            if len(ids) == 0:
                continue
            w, h, body_off, corpus = _decode_batch(b.column(media_col))
            npix = w * h
            nz = npix > 0
            seg = np.zeros(len(ids) + 1, dtype=np.int64)
            np.cumsum(npix, out=seg[1:])
            pos = np.arange(int(seg[-1]), dtype=np.int64) \
                - np.repeat(seg[:-1], npix)
            pix = corpus[np.repeat(body_off, npix) + pos].astype(np.float64)
            # reduceat over the NON-EMPTY segments only: a zero-area image
            # (w*h == 0 is a legal payload) would otherwise crash reduceat
            # at the array end or silently absorb its neighbor's first
            # pixel; empty images get deterministic zero stats
            sums = np.zeros(len(ids))
            sq = np.zeros(len(ids))
            if len(pix):
                sums[nz] = np.add.reduceat(pix, seg[:-1][nz])
                sq[nz] = np.add.reduceat(pix * pix, seg[:-1][nz])
            div = np.maximum(npix, 1)
            means = sums / div
            stds = np.sqrt(np.maximum(sq / div - means * means, 0.0))

            # sample the grid with empty rows redirected to a safe 1x1
            # window at offset 0, then zero their hash after
            gw, gh = np.maximum(w, 1), np.maximum(h, 1)
            goff = np.where(nz, body_off, 0)
            if len(corpus):
                small = _sample_grid(gw, gh, goff, corpus, 8, 8) \
                    .astype(np.float64)
                bits = (small > small.mean(axis=(1, 2))[:, None, None]) \
                    .astype(np.uint64).reshape(len(ids), 64)
                phash = (bits << np.arange(64, dtype=np.uint64)).sum(axis=1)
                phash = np.where(nz, phash, np.uint64(0))
            else:
                phash = np.zeros(len(ids), dtype=np.uint64)

            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, type=pa.int64()),
                 pa.array(w.astype(np.int32), type=pa.int32()),
                 pa.array(h.astype(np.int32), type=pa.int32()),
                 pa.array(np.round(means, 4), type=pa.float64()),
                 pa.array(np.round(stds, 4), type=pa.float64()),
                 pa.array(phash.view(np.int64), type=pa.int64())],
                names=["id", "width", "height", "mean", "std", "phash"])

    return df.mapInArrow(
        task, "id long, width int, height int, mean double, std double, "
              "phash long")


def resize_media(df: DataFrame, out_w: int = 8, out_h: int = 8,
                 media_col: str = "media", id_col: str = "id") -> DataFrame:
    """Resize (nearest-neighbor) inside the fake format — binary-in/
    binary-out thumbnailing, whole-batch: every output image is one slab of
    a single (n, 11 + out_pixels) uint8 matrix (constant-width rows, so the
    Arrow offsets are an arange); pixels arrive via one gather."""
    header = np.frombuffer(
        FAKE_MAGIC + out_w.to_bytes(2, "little") + out_h.to_bytes(2, "little"),
        dtype=np.uint8)
    out_pix = out_w * out_h
    row_len = 11 + out_pix

    def task(batches):
        for b in batches:
            ids = b.column(id_col).to_numpy()
            if len(ids) == 0:
                continue
            w, h, body_off, corpus = _decode_batch(b.column(media_col))
            n = len(ids)
            flat = np.empty((n, row_len), dtype=np.uint8)
            flat[:, :11] = header
            # zero-area inputs thumbnail to all-zero pixels (the safe-1x1
            # redirect mirrors media_features)
            nz = (w * h) > 0
            if len(corpus):
                flat[:, 11:] = _sample_grid(
                    np.maximum(w, 1), np.maximum(h, 1),
                    np.where(nz, body_off, 0), corpus,
                    out_w, out_h).reshape(n, out_pix)
                flat[~nz, 11:] = 0
            else:
                flat[:, 11:] = 0
            offs = np.arange(n + 1, dtype=np.int64) * row_len
            media = pa.Array.from_buffers(
                pa.large_binary(), n,
                [None, pa.py_buffer(offs.tobytes()),
                 pa.py_buffer(flat.tobytes())]).cast(pa.binary())
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, type=pa.int64()), media],
                names=["id", "media"])

    return df.mapInArrow(task, "id long, media binary")
