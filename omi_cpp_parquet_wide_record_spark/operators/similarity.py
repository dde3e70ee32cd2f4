"""Similarity search over embedding columns (array<float>).

- cosine_topk: brute-force exact top-k, expressed entirely in JVM-side
  column functions (zip_with + aggregate + window) — the correctness
  baseline. The query side is broadcast; the corpus side streams, so the
  plan is a broadcast nested-loop that scales linearly in corpus size.
- lsh_cosine_*: random-hyperplane (SimHash-for-angles) bucketing, hyperplane
  matrix derived from splitmix64 so it is deterministic and identical on
  every executor without shipping state. Buckets keep candidate generation
  sub-quadratic at 10^12-vector scale; exact cosine re-ranks candidates.
- ivf_topk: IVF-style coarse quantizer — k-means-lite centroids sampled
  deterministically, vectors assigned to nearest centroid (numpy matmul in
  mapInArrow); queries probe the nearest `nprobe` centroids only.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from pyspark.sql import DataFrame, Window, functions as F

from omi_cpp_parquet_wide_record_spark.operators.dedup import (
    _rotate_cache, _spread,
)


def trunc(col, digits: int):
    """floor-truncation: deterministic across engines (round() half-up vs
    banker's differs between Spark and DuckDB; floor does not)."""
    m = 10 ** digits
    return F.floor(col * m) / m


def valid_vector(col):
    """Catalyst predicate for a scorable vector: non-null, non-empty, no
    null elements. The declarative twin of the kernel-side
    _fixed_vector_rows contract — every similarity operator applies one
    of the two, so NULL-bearing embedding tables (driver data carries
    them; r5 null-surface audit) can never poison a cosine to NULL/NaN
    or misalign a flattened batch."""
    c = F.col(col) if isinstance(col, str) else col
    return c.isNotNull() & (F.size(c) > 0) & \
        ~F.exists(c, lambda x: x.isNull())


def _cosine(a, b):
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                            F.lit(0.0), lambda acc, v: acc + v))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x),
                            F.lit(0.0), lambda acc, v: acc + v))
    return dot / (na * nb)


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding",
                round_to: int = 4) -> DataFrame:
    """Exact top-k: (query_id, neighbor_id, cosine), self-match excluded.

    queries is expected small (it is broadcast); corpus streams through the
    executors once — the scalable brute-force shape.
    """
    q = queries.filter(valid_vector(vec_col)) \
        .select(F.col(id_col).alias("query_id"),
                F.col(vec_col).cast("array<double>").alias("qv"))
    # spread the streaming side (guide §2.5): the per-pair fold is the
    # whole cost and a single-scan-task corpus would serialize it
    c = _spread(corpus.filter(valid_vector(vec_col))
                .select(F.col(id_col).alias("neighbor_id"),
                        F.col(vec_col).cast("array<double>").alias("cv")))
    scored = (F.broadcast(q).crossJoin(c)
              .filter(F.col("query_id") != F.col("neighbor_id"))
              .withColumn("cosine", trunc(_cosine(F.col("qv"),
                                                   F.col("cv")), round_to)))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .select("query_id", "neighbor_id", "cosine", "rk"))


def cosine_pairs(df: DataFrame, threshold: float = 0.9,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 round_to: int = 4) -> DataFrame:
    """Embedding near-duplicate pairs: all (a<b) with cosine >= threshold.
    Exact O(n^2) form — the oracle baseline; use LSH for the scale path."""
    df = df.filter(valid_vector(vec_col))
    a = df.select(F.col(id_col).alias("id_a"),
                  F.col(vec_col).cast("array<double>").alias("va"))
    b = df.select(F.col(id_col).alias("id_b"),
                  F.col(vec_col).cast("array<double>").alias("vb"))
    return (a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
            .withColumn("cosine", trunc(_cosine(F.col("va"),
                                                 F.col("vb")), round_to))
            .filter(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine"))


# ------------------------------------------------- LSH (random hyperplane)

LSH_SCALE = 1 << 20      # fixed-point quantization of embedding values


def _pair_cosine_quantized(pairs: DataFrame, id_a: str, id_b: str,
                           va: str, vb: str, round_to: int = 4) -> DataFrame:
    """(id_a, id_b, cosine) — numpy re-rank kernel for candidate pairs
    (VERDICT r2 #6: replaces the Catalyst zip_with/aggregate chain on
    array<double>, ~10x per-batch).

    Deterministic to the bit ACROSS ENGINES, not just across executors:
    vectors quantize to fixed point (floor(v * 2^20), exact in binary FP),
    so dot products and squared norms are exact integers < 2^48 — every
    double that touches an inexact operation (sqrt, divide) is IEEE
    correctly-rounded from exact inputs, and the SQL oracle reproduces
    the identical value with list_dot_product over the same quantized
    lists. Summation order cannot matter because no rounding ever happens
    in the sums.

    Rows with a null vector are dropped before the kernel (the Catalyst
    expression this replaced produced a null cosine that the downstream
    >= threshold filter discarded — same observable result); ragged
    vector lengths fail loudly instead of flatten() silently misaligning
    every row after the first bad one."""

    def _flat(col, n, name):
        lst = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col
        if n:
            vl = pa.compute.min_max(lst.value_lengths())
            if vl["min"].as_py() != vl["max"].as_py():
                raise ValueError(
                    f"ragged {name} vectors: lengths {vl['min']}..."
                    f"{vl['max']} (embedding dims must be uniform)")
        return lst.flatten().to_numpy(zero_copy_only=False) \
            .astype(np.float64)

    def task(batches):
        for b in batches:
            if b.num_rows == 0:
                continue
            keep = pa.compute.and_(b.column(va).is_valid(),
                                   b.column(vb).is_valid())
            if not pa.compute.all(keep).as_py():
                b = b.filter(keep)
            n = b.num_rows
            if n == 0:
                continue
            ia = b.column(id_a).to_numpy()
            ib = b.column(id_b).to_numpy()
            fa = _flat(b.column(va), n, va)
            fb = _flat(b.column(vb), n, vb)
            A = np.floor(fa * LSH_SCALE).astype(np.int64).reshape(n, -1)
            B = np.floor(fb * LSH_SCALE).astype(np.int64).reshape(n, -1)
            dot = np.einsum("ij,ij->i", A, B)          # exact int64
            na = np.einsum("ij,ij->i", A, A)
            nb = np.einsum("ij,ij->i", B, B)
            m = 10.0 ** round_to
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = np.floor(dot / (np.sqrt(na) * np.sqrt(nb)) * m) / m
            yield pa.RecordBatch.from_arrays(
                [pa.array(ia, type=pa.int64()),
                 pa.array(ib, type=pa.int64()),
                 pa.array(cos, type=pa.float64())],
                names=[id_a, id_b, "cosine"])

    return pairs.mapInArrow(task, f"{id_a} long, {id_b} long, cosine double")


def _hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    """Deterministic gaussian-ish hyperplanes from splitmix64 lanes
    (sum of 4 uniforms, CLT-normalized) — identical on every executor."""
    from omi_cpp_parquet_wide_record_spark.fixtures import splitmix64
    raw = splitmix64(np.arange(dim * n_planes * 4, dtype=np.uint64)
                     + np.uint64(seed * 2654435761))
    u = raw.astype(np.float64) / 2.0**64 - 0.5
    return u.reshape(n_planes, dim, 4).sum(axis=2)


def int_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    """Integer hyperplanes, weights in [-1000, 1000], from lowbias32 over
    small ints. Identical on every executor AND reproducible in plain SQL
    (every intermediate < 2^63) — so bucket membership itself is
    oracle-checkable, not just the re-rank."""
    from omi_cpp_parquet_wide_record_spark.fixtures import lowbias32
    x = np.arange(n_planes * dim, dtype=np.int64) + seed * 131071
    return (lowbias32(x) % 2001 - 1000).reshape(n_planes, dim)


def lsh_bucket_signatures(df: DataFrame, n_planes: int = 16,
                          id_col: str = "vec_id", vec_col: str = "embedding",
                          seed: int = 42) -> DataFrame:
    """(id, bucket: long) — sign pattern of hyperplane projections.

    The projection is exact integer arithmetic: embedding values are
    quantized to fixed-point (floor(v * 2^20) — exact in binary FP since the
    scale is a power of two) and dotted with integer hyperplanes, so the
    sign, and therefore the bucket, is bit-deterministic across executors,
    engines, and BLAS summation orders. numpy int64 matmul per Arrow batch;
    zero per-row Python."""
    src = _spread(df.select(F.col(id_col).alias("id"),
                            F.col(vec_col).alias("v")))
    state = {"planes": None}

    def task(batches):
        for b in batches:
            b, lst = _fixed_vector_rows(b)
            ids = b.column("id").to_numpy()
            flat = lst.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
            n = len(ids)
            if n == 0:
                continue
            dim = len(flat) // n
            if state["planes"] is None or state["planes"].shape[1] != dim:
                state["planes"] = int_hyperplanes(dim, n_planes, seed)
            q = np.floor(flat * LSH_SCALE).astype(np.int64).reshape(n, dim)
            proj = q @ state["planes"].T                      # (n, planes)
            bits = (proj > 0).astype(np.uint64)
            bucket = np.zeros(n, dtype=np.uint64)
            for j in range(n_planes):
                bucket |= bits[:, j] << np.uint64(j)
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, type=pa.int64()),
                 pa.array(bucket.view(np.int64), type=pa.int64())],
                names=["id", "bucket"])

    return src.mapInArrow(task, "id long, bucket long")


def lsh_cosine_candidates(df: DataFrame, n_planes: int = 12, bands: int = 3,
                          id_col: str = "vec_id",
                          vec_col: str = "embedding",
                          threshold: float = 0.8, seed: int = 42) -> DataFrame:
    """Near-neighbor pairs: banded hyperplane buckets -> candidates ->
    exact cosine re-rank >= threshold. Sub-quadratic candidate generation."""
    width = n_planes // bands
    sigs = lsh_bucket_signatures(df, n_planes, id_col, vec_col, seed)
    band_cols = [F.struct(
        F.lit(b).alias("band"),
        F.shiftrightunsigned("bucket", b * width).bitwiseAND(
            F.lit((1 << width) - 1)).alias("bh")).alias(f"b{b}")
        for b in range(bands)]
    # both self-join sides consume the signature kernel's output — cache
    # the NARROW (id, bucket, band, bh) rows so the mapInArrow subtree
    # runs once per input, not twice (and not at all on a repeated
    # identical call)
    bk = _rotate_cache("lsh_bands", sigs
                       .select("id", "bucket",
                               F.explode(F.array(*band_cols)).alias("bk"))
                       .select("id", "bucket", "bk.band", "bk.bh"))
    l = bk.select(F.col("id").alias("id_a"),
                  F.col("bucket").alias("bkt_a"), "band", "bh")
    r = bk.select(F.col("id").alias("id_b"),
                  F.col("bucket").alias("bkt_b"), "band", "bh")
    # first-matching-band emission instead of DISTINCT (same rewrite as
    # the dedup LSH operators): a pair is kept only in the lowest band
    # where the bucket slices agree, so every candidate appears exactly
    # once without a duplicate-eliminating exchange
    xor = F.col("bkt_a").bitwiseXOR(F.col("bkt_b"))
    mask = (1 << width) - 1
    earlier = [F.shiftrightunsigned(xor, b * width)
               .bitwiseAND(F.lit(mask)) == 0 for b in range(bands)]
    no_earlier = F.lit(True)
    for b in range(bands - 1, 0, -1):
        prior = earlier[0]
        for bb in range(1, b):
            prior = prior | earlier[bb]
        no_earlier = F.when(F.col("band") == b, ~prior) \
            .otherwise(no_earlier)
    cand = (l.join(r, ["band", "bh"])
            .filter((F.col("id_a") < F.col("id_b")) & no_earlier)
            .select("id_a", "id_b"))
    va = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    scored = _pair_cosine_quantized(
        cand.join(va, "id_a").join(vb, "id_b")
            .select("id_a", "id_b", "va", "vb"), "id_a", "id_b", "va", "vb")
    return (scored.filter(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine"))


# --------------------------------------------------------------- IVF-lite

def _fixed_vector_rows(b: pa.RecordBatch, col: str = "v"):
    """(batch, list_column) with INVALID vector rows DROPPED and ragged
    lengths rejected — the vector-kernel contract established by
    _pair_cosine_quantized and extended for the r5 null-surface audit:
    a vector participates only if it is non-null, non-empty, and has no
    null ELEMENTS (a null component cannot be quantized; the join-plan
    re-rank drops such pairs, so every plan shape observes the same
    result). Surviving rows must share one dim — genuinely ragged clean
    vectors still fail loudly instead of flatten() silently misaligning
    every row after the first bad one."""
    lst = b.column(col)
    if isinstance(lst, pa.ChunkedArray):          # pragma: no cover
        lst = lst.combine_chunks()
    # null rows and empty vectors out first (empty ⇒ zero norm ⇒ NaN
    # cosine, which Spark and SQL engines order differently)
    lens0 = pc.fill_null(pc.list_value_length(lst), 0)
    keep = pc.and_(lst.is_valid(),
                   pc.greater(lens0, 0))
    if not (pc.all(keep).as_py() if b.num_rows else True):
        b = b.filter(keep)
        lst = b.column(col)
        if isinstance(lst, pa.ChunkedArray):      # pragma: no cover
            lst = lst.combine_chunks()
    # rows with null elements out next (segmented child-validity count)
    if b.num_rows:
        flat = lst.flatten()
        if flat.null_count:
            lens = pc.list_value_length(lst) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            cv = flat.is_valid().to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            seg = np.zeros(len(lens) + 1, dtype=np.int64)
            np.cumsum(lens, out=seg[1:])
            rowok = np.add.reduceat(cv, seg[:-1]) == lens
            b = b.filter(pa.array(rowok))
            lst = b.column(col)
            if isinstance(lst, pa.ChunkedArray):  # pragma: no cover
                lst = lst.combine_chunks()
    if b.num_rows:
        vl = pc.min_max(lst.value_lengths())
        if vl["min"].as_py() != vl["max"].as_py():
            raise ValueError(
                f"ragged {col} vectors: lengths {vl['min']}..."
                f"{vl['max']} (embedding dims must be uniform)")
    return b, lst


def ivf_assign(df: DataFrame, n_centroids: int = 16,
               id_col: str = "vec_id", vec_col: str = "embedding",
               seed: int = 42) -> DataFrame:
    """(id, centroid) — max-inner-product assignment to n deterministic
    centroids. The coarse-quantizer half of an IVF index: at scale, vectors
    are repartitioned by centroid so a query probes only nprobe partitions.

    Exact integer arithmetic end to end (fixed-point quantized vectors x
    lowbias32 integer centroids, ties broken by lower centroid id), so the
    assignment is bit-deterministic and reproducible in plain SQL — the
    driver oracle checks the quantizer itself."""
    src = _spread(df.select(F.col(id_col).alias("id"),
                            F.col(vec_col).alias("v")))
    state = {"cents": None}

    def task(batches):
        for b in batches:
            b, lst = _fixed_vector_rows(b)
            ids = b.column("id").to_numpy()
            flat = lst.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
            n = len(ids)
            if n == 0:
                continue
            dim = len(flat) // n
            if state["cents"] is None or state["cents"].shape[1] != dim:
                state["cents"] = int_hyperplanes(dim, n_centroids, seed + 1)
            q = np.floor(flat * LSH_SCALE).astype(np.int64).reshape(n, dim)
            scores = q @ state["cents"].T           # exact int64
            assign = scores.argmax(axis=1).astype(np.int32)  # first max wins
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, type=pa.int64()),
                 pa.array(assign, type=pa.int32())],
                names=["id", "centroid"])

    return src.mapInArrow(task, "id long, centroid int")


def _int_scores(df: DataFrame, n_centroids: int, seed: int,
                id_col: str, vec_col: str) -> DataFrame:
    """(id, centroid, score) — exact integer inner products against every
    centroid (the ranking surface behind ivf_assign / probe selection)."""
    # queries are small (broadcast side): spreading them into
    # parallelism-many tiny tasks costs more than the kernel saves
    src = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    state = {"cents": None}

    def task(batches):
        for b in batches:
            b, lst = _fixed_vector_rows(b)
            ids = b.column("id").to_numpy()
            flat = lst.flatten().to_numpy(zero_copy_only=False) \
                .astype(np.float64)
            n = len(ids)
            if n == 0:
                continue
            dim = len(flat) // n
            if state["cents"] is None or state["cents"].shape[1] != dim:
                state["cents"] = int_hyperplanes(dim, n_centroids, seed + 1)
            q = np.floor(flat * LSH_SCALE).astype(np.int64).reshape(n, dim)
            scores = q @ state["cents"].T                  # (n, n_centroids)
            cid = np.tile(np.arange(n_centroids, dtype=np.int32), n)
            yield pa.RecordBatch.from_arrays(
                [pa.array(np.repeat(ids, n_centroids), type=pa.int64()),
                 pa.array(cid, type=pa.int32()),
                 pa.array(scores.ravel(), type=pa.int64())],
                names=["id", "centroid", "score"])

    return src.mapInArrow(task, "id long, centroid int, score long")


# queries at or below this count take the fused broadcast-kernel path
# (one corpus pass, one window); above it, the join-based plan
IVF_BROADCAST_QUERY_CAP = 8192


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             nprobe: int = 2, n_centroids: int = 16,
             id_col: str = "vec_id", vec_col: str = "embedding",
             seed: int = 42) -> DataFrame:
    """IVF probe search: corpus vectors live in their assigned centroid
    cell; each query probes only its `nprobe` best cells and exact-cosine
    re-ranks the candidates — the classic two-level ANN index shape, where
    at 10^12 vectors the corpus is *repartitioned by centroid* and a query
    touches nprobe partitions instead of the whole table.

    Assignment and probe selection are exact integer arithmetic (ties to
    the lower centroid id), so the whole index structure — not just the
    re-rank — is deterministic and SQL-reproducible.

    Plan shape: the query side is small by contract (same contract as
    cosine_topk's broadcast side). When it fits under
    IVF_BROADCAST_QUERY_CAP rows it is collected ONCE (a bounded,
    metadata-scale collect) and shipped inside the kernel closure, so the
    whole search is ONE mapInArrow pass over the corpus — assignment,
    probe matching, exact integer cosine, and per-batch top-k pruning
    fused — followed by a single window for the global top-k. Per-batch
    pruning bounds the shuffle to k rows per (query, batch): the global
    top-k under (cosine DESC, neighbor_id ASC) is a subset of the union
    of per-batch top-k under the same order. A larger query side falls
    back to the join-based plan (_ivf_topk_join).

    NOTE: choosing between the two plans runs an EAGER bounded action
    (limit(cap+1).collect() of the query side) at call time — this
    function is not side-effect-free plan construction, and the fused
    result is frozen to the query rows collected here rather than
    re-evaluated on each downstream action."""
    qrows = queries.select(F.col(id_col).alias("id"),
                           F.col(vec_col).cast("array<double>").alias("v")) \
        .limit(IVF_BROADCAST_QUERY_CAP + 1).collect()
    if len(qrows) <= IVF_BROADCAST_QUERY_CAP:
        return _ivf_topk_fused(corpus, qrows, k, nprobe, n_centroids,
                               id_col, vec_col, seed)
    return _ivf_topk_join(corpus, queries, k, nprobe, n_centroids,
                          id_col, vec_col, seed)


def _ivf_topk_fused(corpus: DataFrame, qrows, k: int, nprobe: int,
                    n_centroids: int, id_col: str, vec_col: str,
                    seed: int, round_to: int = 4,
                    assign_col: str | None = None) -> DataFrame:
    spark = corpus.sparkSession
    # invalid query vectors (null / empty / null elements) can never score
    # (the join plan's kernels drop them); drop here for the same result
    qrows = [r for r in qrows
             if r["v"] is not None and len(r["v"]) > 0
             and all(x is not None for x in r["v"])]
    if not qrows:
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, cosine double, rk int")
    qids = np.asarray([r["id"] for r in qrows], dtype=np.int64)
    qmat = np.asarray([r["v"] for r in qrows], dtype=np.float64)
    dim = qmat.shape[1]
    cents = int_hyperplanes(dim, n_centroids, seed + 1)
    Q = np.floor(qmat * LSH_SCALE).astype(np.int64)          # exact
    qscores = Q @ cents.T                                    # (nq, nc) int64
    # probe selection: top-nprobe by (score DESC, centroid ASC) — stable
    # argsort on the negated scores keeps ties in ascending-centroid order
    probe_cells = np.argsort(-qscores, axis=1, kind="stable")[:, :nprobe]
    # probes_by_cell[c] = indices into qids of queries probing cell c
    probes_by_cell = [np.nonzero(
        (probe_cells == c).any(axis=1))[0] for c in range(n_centroids)]
    qnorm = np.sqrt(np.einsum("ij,ij->i", Q, Q).astype(np.float64))
    m = 10.0 ** round_to

    def task(batches):
        for b in batches:
            b, lst = _fixed_vector_rows(b)
            n = b.num_rows
            if n == 0:
                continue
            nids = b.column("id").to_numpy()
            flat = lst.flatten().to_numpy(zero_copy_only=False) \
                .astype(np.float64)
            C = np.floor(flat * LSH_SCALE).astype(np.int64).reshape(n, -1)
            if "assign" in b.schema.names:
                # materialized index: assignment was computed at build
                # time and stored alongside the vectors — skip the matmul
                assign = b.column("assign").to_numpy(zero_copy_only=False)
            else:
                assign = (C @ cents.T).argmax(axis=1)    # first max wins
            cnorm = np.sqrt(np.einsum("ij,ij->i", C, C).astype(np.float64))
            out_q, out_n, out_c = [], [], []
            for c in range(n_centroids):
                qi = probes_by_cell[c]
                if qi.size == 0:
                    continue
                rows = np.nonzero(assign == c)[0]
                if rows.size == 0:
                    continue
                dot = Q[qi] @ C[rows].T                  # exact int64
                with np.errstate(divide="ignore", invalid="ignore"):
                    cos = np.floor(
                        dot / (qnorm[qi, None] * cnorm[None, rows]) * m) / m
                qq = np.repeat(qids[qi], rows.size)
                nn = np.tile(nids[rows], qi.size)
                cc = cos.ravel()
                keep = qq != nn                          # self-match
                out_q.append(qq[keep]); out_n.append(nn[keep])
                out_c.append(cc[keep])
            if not out_q:
                continue
            qq = np.concatenate(out_q); nn = np.concatenate(out_n)
            cc = np.concatenate(out_c)
            # per-batch top-k under (cosine DESC, neighbor ASC): a proven
            # superset of each query's global top-k under the same order
            order = np.lexsort((nn, -cc, qq))
            qq, nn, cc = qq[order], nn[order], cc[order]
            starts = np.r_[0, np.nonzero(np.diff(qq))[0] + 1]
            rank = np.arange(len(qq)) - np.repeat(
                starts, np.diff(np.r_[starts, len(qq)]))
            keep = rank < k
            yield pa.RecordBatch.from_arrays(
                [pa.array(qq[keep], type=pa.int64()),
                 pa.array(nn[keep], type=pa.int64()),
                 pa.array(cc[keep], type=pa.float64())],
                names=["query_id", "neighbor_id", "cosine"])

    cols = [F.col(id_col).alias("id"), F.col(vec_col).alias("v")]
    if assign_col is not None:
        cols.append(F.col(assign_col).cast("int").alias("assign"))
    src = corpus.select(*cols)
    scored = src.mapInArrow(
        task, "query_id long, neighbor_id long, cosine double")
    rw = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rk", F.row_number().over(rw))
            .filter(F.col("rk") <= k)
            .select("query_id", "neighbor_id", "cosine", "rk"))


def _ivf_topk_join(corpus: DataFrame, queries: DataFrame, k: int = 5,
                   nprobe: int = 2, n_centroids: int = 16,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   seed: int = 42) -> DataFrame:
    """Join-based IVF probe plan for a query side too large to broadcast:
    corpus assignment + probe selection as DataFrame joins, numpy re-rank."""
    ca = ivf_assign(corpus, n_centroids, id_col, vec_col, seed) \
        .withColumnRenamed("id", "neighbor_id")
    w = Window.partitionBy("id").orderBy(F.col("score").desc(),
                                         F.col("centroid").asc())
    probes = (_int_scores(queries, n_centroids, seed, id_col, vec_col)
              .withColumn("prk", F.row_number().over(w))
              .filter(F.col("prk") <= nprobe)
              .select(F.col("id").alias("query_id"), "centroid"))
    qv = queries.select(F.col(id_col).alias("query_id"),
                        F.col(vec_col).alias("qv"))
    cv = corpus.select(F.col(id_col).alias("neighbor_id"),
                       F.col(vec_col).alias("cv"))
    cand = (F.broadcast(probes).join(ca, "centroid")
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id"))
    scored = _pair_cosine_quantized(
        cand.join(F.broadcast(qv), "query_id").join(cv, "neighbor_id")
            .select("query_id", "neighbor_id", "qv", "cv"),
        "query_id", "neighbor_id", "qv", "cv")
    rw = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rk", F.row_number().over(rw))
            .filter(F.col("rk") <= k)
            .select("query_id", "neighbor_id", "cosine", "rk"))


# ------------------------------------------------- materialized IVF index

def build_ivf_index(corpus: DataFrame, store_dir: str,
                    n_centroids: int = 16, id_col: str = "vec_id",
                    vec_col: str = "embedding", seed: int = 42,
                    num_pids: int | None = None, chunk_rows: int = 8192):
    """Materialize the IVF index ONCE into a chunk store (VERDICT r4 #5):
    every corpus vector is assigned to its centroid (the same exact
    integer quantizer as ivf_assign) and the (id, centroid, vector) rows
    are written partitioned + sorted by centroid, so each chunk file's
    centroid zone map is a tight cell range. ivf_topk_indexed then reads
    ONLY the files whose zones intersect the probed cells —
    ~nprobe/n_centroids of the index instead of the whole corpus, the
    repartition-by-centroid story ivf_topk's docstring promises, made
    real. Invalid vectors (null/empty/null elements) are excluded at
    build time, matching every other plan shape.

    Returns the encode result (rows/bytes/snapshot)."""
    from omi_cpp_parquet_wide_record_spark.operators.encode import (
        encode_dataframe,
    )
    assigned = ivf_assign(corpus, n_centroids, id_col, vec_col, seed)
    vecs = corpus.filter(valid_vector(vec_col)).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    idx = assigned.join(vecs, "id").select("id", "centroid", "v")
    return encode_dataframe(
        idx, store_dir, partition_by=["centroid"], salt_key="id",
        num_pids=num_pids or n_centroids * 4, salt=1,
        sort_by=["centroid"], chunk_rows=chunk_rows)


def ivf_topk_indexed(spark, index_store: str, queries: DataFrame,
                     k: int = 5, nprobe: int = 2, n_centroids: int = 16,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     seed: int = 42) -> DataFrame:
    """IVF probe search against a build_ivf_index store: probe cells are
    chosen from the collected query side (same bounded-collect contract
    and cap as ivf_topk's fused path), the store scan carries a
    ``centroid IN probed_cells`` filter so zone maps open only the
    probed cells' chunk files, and the stored assignment feeds the fused
    kernel directly (no re-assignment matmul). Bit-identical to
    ivf_topk(corpus, queries, ...) on the same corpus/params — pinned by
    pytest parity."""
    from omi_cpp_parquet_wide_record_spark.operators.decode import (
        decode_store,
    )
    qrows = queries.filter(valid_vector(vec_col)).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v")) \
        .limit(IVF_BROADCAST_QUERY_CAP + 1).collect()
    if len(qrows) > IVF_BROADCAST_QUERY_CAP:
        raise ValueError(
            f"indexed IVF probe requires a query side under "
            f"{IVF_BROADCAST_QUERY_CAP} rows (got more); use ivf_topk's "
            "join plan for large query sides")
    if not qrows:
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, cosine double, rk int")
    qmat = np.asarray([r["v"] for r in qrows], dtype=np.float64)
    cents = int_hyperplanes(qmat.shape[1], n_centroids, seed + 1)
    Q = np.floor(qmat * LSH_SCALE).astype(np.int64)
    qscores = Q @ cents.T
    probe_cells = np.argsort(-qscores, axis=1, kind="stable")[:, :nprobe]
    cells = sorted(int(c) for c in np.unique(probe_cells))
    corpus = decode_store(spark, index_store,
                          filters=[("centroid", "in", cells)])
    return _ivf_topk_fused(corpus, qrows, k, nprobe, n_centroids,
                           "id", "v", seed, assign_col="centroid")
