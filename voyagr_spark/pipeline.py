"""Training-data pipeline operators beyond the search core.

Large-scale corpus-curation ops a 100 TB training-data pipeline needs,
built Spark-first (vectorized Arrow UDFs + built-in ops, no per-row Python):

* SimHash fingerprints + banded near-dup candidate pairs (hamming <= k)
* random-hyperplane LSH for embedding-cosine near-dup / ANN bucketing
* exact brute-force cosine verification of candidate pairs
* multimodal binary-column plumbing: schema, batched decode/feature UDFs
  (actual image/audio decoding is stubbed — the libs are not in this
  container — but the Spark-side schema, partitioning, and batch shapes are
  real and tested with a deterministic fake decoder)

Exact dedup, MinHash/LSH over token sets, Jaccard pairs, quality scoring,
language-ID, and fingerprints live in relational.py (they are SQL-checkable
and oracle-paired there).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from itertools import chain

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .analysis import analyze_series

# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 64
SIMHASH_BANDS = 4  # 4 x 16-bit bands for candidate generation


def _hash_terms(uniques: np.ndarray) -> np.ndarray:
    """64-bit hash per unique term (md5 prefix; hashed once per vocab entry)."""
    return np.array(
        [
            int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "little")
            for t in uniques
        ],
        dtype=np.uint64,
    )


def simhash_frame(doc_ids: np.ndarray, texts: pd.Series) -> pd.DataFrame:
    """Vectorized SimHash over one batch: tf-weighted bit votes -> sign."""
    terms, _ = analyze_series(texts)
    doclens = terms.map(len).to_numpy(dtype=np.int64)
    total = int(doclens.sum())
    out = np.zeros(doc_ids.size, dtype=np.uint64)
    if total:
        flat = np.fromiter(chain.from_iterable(terms), dtype=object, count=total)
        codes, uniques = pd.factorize(flat)
        hashes = _hash_terms(uniques)
        # bits matrix for the vocab only (nuniq x 64) in {-1, +1}
        shifts = np.arange(SIMHASH_BITS, dtype=np.uint64)
        bits = ((hashes[:, None] >> shifts) & np.uint64(1)).astype(np.int64)
        pm = bits * 2 - 1
        docidx = np.repeat(np.arange(doc_ids.size, dtype=np.int64), doclens)
        votes = np.zeros((doc_ids.size, SIMHASH_BITS), dtype=np.int64)
        np.add.at(votes, docidx, pm[codes])
        sig_bits = (votes > 0).astype(np.uint64)
        out = (sig_bits << shifts).sum(axis=1, dtype=np.uint64)
    return pd.DataFrame({"doc_id": doc_ids, "simhash": out.astype(np.int64)})


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, simhash int64) via mapInArrow — one numpy pass per batch."""
    sel = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("simhash", T.LongType())]
    )

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            pdf = b.to_pandas()
            out = simhash_frame(
                pdf["doc_id"].to_numpy(dtype=np.int64), pdf["text"]
            )
            yield pa.RecordBatch.from_pandas(out, preserve_index=False)

    return sel.mapInArrow(kernel, schema)


def simhash_near_dup_pairs(
    sigs: DataFrame, max_hamming: int = 3, bucket_cap: int | None = None
) -> DataFrame:
    """Banded candidate join + exact hamming filter (doc_a < doc_b).

    Pigeonhole: hamming <= 3 over 4 bands => at least one band equal, so the
    band join loses no true pair.  Scales as a shuffle on 16-bit band values
    (salt-friendly), never a cross join.

    bucket_cap=N bounds degenerate hot buckets (boilerplate-identical docs):
    members of a bucket larger than N pair only with the bucket minimum and
    their id-order neighbor — linear, and identical keep/drop decisions for
    identical-signature clusters (every non-min member still pairs with the
    min at hamming 0).
    """
    if max_hamming >= SIMHASH_BANDS:
        raise ValueError(
            f"max_hamming={max_hamming} breaks the pigeonhole guarantee: "
            f"with {SIMHASH_BANDS} bands only hamming < {SIMHASH_BANDS} "
            "ensures a shared band; raise SIMHASH_BANDS or lower the radius"
        )
    from pyspark.sql import Window

    bands = []
    for j in range(SIMHASH_BANDS):
        bands.append(
            sigs.select(
                "doc_id",
                "simhash",
                F.lit(j).alias("band"),
                F.shiftrightunsigned("simhash", j * 16).bitwiseAND(F.lit(0xFFFF)).alias("bkey"),
            )
        )
    u = bands[0]
    for b in bands[1:]:
        u = u.unionAll(b)
    if bucket_cap is None:
        a, b = u.alias("a"), u.alias("b")
        cand = (
            a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.bkey") == F.col("b.bkey")))
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
                F.col("a.simhash").alias("sig_a"),
                F.col("b.simhash").alias("sig_b"),
            )
            .distinct()
        )
    else:
        w = Window.partitionBy("band", "bkey")
        wo = w.orderBy("doc_id")
        u2 = (
            u.withColumn("n", F.count("*").over(w))
            .withColumn("mn", F.min("doc_id").over(w))
            .withColumn("mn_sig", F.first("simhash").over(wo))
            .withColumn("prev", F.lag("doc_id").over(wo))
            .withColumn("prev_sig", F.lag("simhash").over(wo))
        )
        small = u2.filter(F.col("n") <= bucket_cap)
        a, b = (
            small.select("band", "bkey", "doc_id", "simhash").alias("a"),
            small.select("band", "bkey", "doc_id", "simhash").alias("b"),
        )
        cand_small = (
            a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.bkey") == F.col("b.bkey")))
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(
                F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"),
                F.col("a.simhash").alias("sig_a"), F.col("b.simhash").alias("sig_b"),
            )
        )
        big = u2.filter(F.col("n") > bucket_cap)
        min_links = big.filter(F.col("doc_id") != F.col("mn")).select(
            F.col("mn").alias("doc_a"), F.col("doc_id").alias("doc_b"),
            F.col("mn_sig").alias("sig_a"), F.col("simhash").alias("sig_b"),
        )
        neighbor_links = big.filter(
            F.col("prev").isNotNull() & (F.col("prev") != F.col("mn"))
        ).select(
            F.col("prev").alias("doc_a"), F.col("doc_id").alias("doc_b"),
            F.col("prev_sig").alias("sig_a"), F.col("simhash").alias("sig_b"),
        )
        cand = cand_small.unionAll(min_links).unionAll(neighbor_links).distinct()
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


# ---------------------------------------------------------------------------
# embedding LSH (random hyperplanes) + exact cosine verify
# ---------------------------------------------------------------------------


def _hyperplanes(dim: int, nbits: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((dim, nbits)).astype(np.float32)


def embedding_lsh_signatures(
    emb: DataFrame, dim: int, nbits: int = 16, seed: int = 42,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Sign-of-projection LSH signature per vector (one matmul per batch)."""
    planes = _hyperplanes(dim, nbits, seed)
    schema = T.StructType(
        [T.StructField("vec_id", T.LongType()), T.StructField("bucket", T.LongType())]
    )
    sel = emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec"))

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            pdf = b.to_pandas()
            if not len(pdf):
                continue
            mat = np.vstack(pdf["vec"].to_numpy()).astype(np.float32)
            proj = mat @ planes  # (n, nbits)
            bits = (proj > 0).astype(np.uint64)
            bucket = (bits << np.arange(nbits, dtype=np.uint64)).sum(
                axis=1, dtype=np.uint64
            )
            out = pd.DataFrame(
                {"vec_id": pdf["vec_id"].astype(np.int64),
                 "bucket": bucket.astype(np.int64)}
            )
            yield pa.RecordBatch.from_pandas(out, preserve_index=False)

    return sel.mapInArrow(kernel, schema)


def embedding_near_dup_pairs(
    emb: DataFrame, dim: int, threshold: float = 0.9, nbits: int = 12, seed: int = 42,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """LSH-bucketed candidate pairs verified by exact cosine >= threshold.

    The bucket join replaces the O(n^2) cross join; recall depends on nbits
    (smaller buckets = higher precision, lower recall) — the standard
    hyperplane-LSH trade-off; brute-force ann_topk in relational.py is the
    exact baseline.
    """
    sigs = embedding_lsh_signatures(emb, dim, nbits, seed, id_col, vec_col)
    e = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    ).join(sigs, "vec_id")
    a, b = e.alias("a"), e.alias("b")
    cand = a.join(b, F.col("a.bucket") == F.col("b.bucket")).filter(
        F.col("a.vec_id") < F.col("b.vec_id")
    )
    dot = F.aggregate(
        F.zip_with("a.vec", "b.vec", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    n1 = F.sqrt(F.aggregate(F.transform("a.vec", lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    n2 = F.sqrt(F.aggregate(F.transform("b.vec", lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    return (
        cand.select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            (dot / (n1 * n2)).alias("cos"),
        )
        .distinct()
        .filter(F.col("cos") >= threshold)
    )


# ---------------------------------------------------------------------------
# multimodal binary columns: typed metadata + mapInPandas decode/feature
# kernels; WAV (RIFF PCM16) and PPM (P6) decode is real, pure numpy
# ---------------------------------------------------------------------------

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.StructType([
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("codec", T.StringType()),
        ])),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def decode_wav(payload) -> np.ndarray:
    """Minimal RIFF/WAVE PCM16 decoder, pure numpy: chunk walk + one
    frombuffer.  Returns mono float32 samples in [-1, 1)."""
    b = bytes(payload)
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i, fmt, data = 12, None, None
    while i + 8 <= len(b):
        cid = b[i: i + 4]
        sz = int.from_bytes(b[i + 4: i + 8], "little")
        body = b[i + 8: i + 8 + sz]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        i += 8 + sz + (sz & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt = int.from_bytes(fmt[0:2], "little")
    n_ch = max(1, int.from_bytes(fmt[2:4], "little"))
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_fmt != 1 or bits != 16:
        raise ValueError(f"only PCM16 supported (fmt={audio_fmt}, bits={bits})")
    frame = 2 * n_ch
    smp = np.frombuffer(
        data[: len(data) - (len(data) % frame)], dtype="<i2"
    ).astype(np.float32) / np.float32(32768.0)
    return smp.reshape(-1, n_ch).mean(axis=1)  # downmix to mono


def decode_ppm(payload) -> np.ndarray:
    """Minimal binary PPM (P6, maxval<=255) decoder -> (h, w, 3) uint8,
    including '#' comment handling per the netpbm spec."""
    b = bytes(payload)
    if b[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    fields, i = [], 2
    while len(fields) < 3:
        while i < len(b) and b[i: i + 1].isspace():
            i += 1
        if b[i: i + 1] == b"#":  # comment to end of line
            while i < len(b) and b[i] not in (0x0A, 0x0D):
                i += 1
            continue
        j = i
        while j < len(b) and not b[j: j + 1].isspace():
            j += 1
        fields.append(int(b[i:j]))
        i = j
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    i += 1  # exactly one whitespace byte before the raster
    raster = np.frombuffer(b, dtype=np.uint8, count=w * h * 3, offset=i)
    return raster.reshape(h, w, 3)


def wav_feature(samples: np.ndarray, dim: int) -> np.ndarray:
    """RMS energy over `dim` equal windows (cumsum-of-squares, one pass)."""
    n = samples.size
    if n == 0:
        return np.zeros(dim, dtype=np.float32)
    edges = np.linspace(0, n, dim + 1).astype(np.int64)
    sq = np.concatenate(([0.0], np.cumsum(samples.astype(np.float64) ** 2)))
    e = sq[edges[1:]] - sq[edges[:-1]]
    cnt = np.maximum(edges[1:] - edges[:-1], 1)
    return np.sqrt(e / cnt).astype(np.float32)


def ppm_feature(img: np.ndarray, dim: int) -> np.ndarray:
    """Normalized `dim`-bin luma histogram (ITU-R 601 weights)."""
    luma = img.astype(np.float32) @ np.array([0.299, 0.587, 0.114], np.float32)
    hist, _ = np.histogram(luma, bins=dim, range=(0.0, 256.0))
    return (hist / np.float32(luma.size)).astype(np.float32)


def decode_payload_feature(payload, dim: int) -> np.ndarray:
    """Dispatch on the payload magic: WAV -> windowed RMS, PPM -> luma
    histogram.  Raises ValueError on formats outside the two supported
    container-free codecs."""
    b = bytes(payload)
    if b[:4] == b"RIFF":
        return wav_feature(decode_wav(b), dim)
    if b[:2] == b"P6":
        return ppm_feature(decode_ppm(b), dim)
    raise ValueError(f"unsupported media magic {b[:4]!r}")


def extract_features(media: DataFrame, dim: int = 16, fake: bool = False) -> DataFrame:
    """Batched decode -> feature-extract over opaque binary payloads.

    The real path (fake=False) decodes WAV (RIFF PCM16) and PPM (P6)
    payloads with the pure-numpy parsers above — no media libraries needed
    — and emits a dim-length float32 feature (windowed RMS for audio, luma
    histogram for images).  fake=True keeps the deterministic hash-derived
    stand-in for exercising the Spark plumbing against arbitrary bytes.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                if fake:
                    h = hashlib.sha256(bytes(payload)).digest()
                    v = np.frombuffer(
                        (h * ((dim * 4) // len(h) + 1))[: dim * 4],
                        dtype=np.uint32,
                    )
                    feats.append(
                        (v.astype(np.float32) / np.float32(2**32)).tolist()
                    )
                else:
                    feats.append(decode_payload_feature(payload, dim).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": feats,
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                }
            )

    return media.select("media_id", "payload").mapInPandas(kernel, FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# IVF (inverted-file) approximate nearest neighbor — the coarse-quantizer
# scale path beside the brute-force baseline (relational.ann_topk) and the
# hyperplane-LSH bucketing above.
# ---------------------------------------------------------------------------


def _l2_normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def ivf_train_centroids(
    emb: DataFrame,
    n_centroids: int = 16,
    sample_rows: int = 20_000,
    iters: int = 10,
    seed: int = 42,
    sample_fraction: float | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Seeded Lloyd's k-means on a driver-side sample -> (n_centroids, dim).

    The IVF train phase: at 100 TB the quantizer is fit on a tiny uniform
    sample collected to the driver (standard coarse-quantizer practice —
    the centroid table is KBs and is broadcast afterwards).  Vectors are
    L2-normalized first so nearest-centroid-by-dot == nearest-by-cosine.
    """
    src = emb.select(vec_col)
    if sample_fraction is not None:
        # seeded uniform pre-thin for huge tables: sample first so the
        # ordered take below touches ~fraction of the rows
        src = src.sample(False, sample_fraction, seed=seed)
    # seeded uniform take by default: orderBy(rand).limit compiles to
    # TakeOrderedAndProject (per-partition top-k + driver merge, no global
    # sort), so the training sample is unbiased even on clustered tables —
    # a bare limit() would read only the first partitions
    pdf = src.orderBy(F.rand(seed)).limit(sample_rows).toPandas()
    x = _l2_normalize(np.array(pdf[vec_col].tolist(), dtype=np.float64))
    return ivf_kmeans(x, n_centroids=n_centroids, iters=iters, seed=seed)


def ivf_assign(
    emb: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """-> DataFrame(vec_id, cell, embedding): nearest-centroid cell per
    vector, one matmul per Arrow batch (the posting-list build of IVF).

    At scale the result is written partitioned/bucketed by `cell`, so a
    query touches only the probed cells' files — the same partition-pruning
    story as the inverted text index.
    """
    cents = _l2_normalize(np.asarray(centroids, dtype=np.float64))
    sel = emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec"))
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("cell", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            pdf = b.to_pandas()
            if not len(pdf):
                continue
            x = _l2_normalize(np.array(pdf["vec"].tolist(), dtype=np.float64))
            cell = np.argmax(x @ cents.T, axis=1).astype(np.int64)
            yield pa.RecordBatch.from_pydict(
                {"vec_id": pdf["vec_id"].to_numpy(),
                 "cell": cell,
                 "embedding": pdf["vec"]},
                schema=pa.schema(
                    [pa.field("vec_id", pa.int64()),
                     pa.field("cell", pa.int64()),
                     pa.field("embedding", pa.list_(pa.float32()))]
                ),
            )

    return sel.mapInArrow(kernel, schema)


def ivf_topk(
    assigned: DataFrame,
    centroids: np.ndarray,
    query_vec: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    exclude_vec_id: int | None = None,
) -> DataFrame:
    """-> DataFrame(rank, vec_id, cos4): cosine top-k probing only the
    `nprobe` cells nearest the query (IVF search phase).

    The cell filter is a plain Catalyst predicate over the assigned table
    (partition-prunable when the table is written bucketed by cell); the
    in-cell scoring is one matmul per Arrow batch.  nprobe=n_centroids
    degrades to exact brute force — the correctness anchor the tests pin.
    """
    cents = _l2_normalize(np.asarray(centroids, dtype=np.float64))
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / (np.linalg.norm(q) or 1.0)
    probe = np.argsort(-(cents @ qn))[:nprobe].tolist()

    sel = assigned.filter(F.col("cell").isin(probe))
    if exclude_vec_id is not None:
        sel = sel.filter(F.col("vec_id") != int(exclude_vec_id))
    schema = T.StructType(
        [T.StructField("vec_id", T.LongType()),
         T.StructField("cos4", T.DoubleType())]
    )

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            pdf = b.to_pandas()
            if not len(pdf):
                continue
            x = _l2_normalize(
                np.array(pdf["embedding"].tolist(), dtype=np.float64)
            )
            cos = np.round(x @ qn, 4)
            yield pa.RecordBatch.from_pydict(
                {"vec_id": pdf["vec_id"].to_numpy(), "cos4": cos},
                schema=pa.schema([pa.field("vec_id", pa.int64()),
                                  pa.field("cos4", pa.float64())]),
            )

    scored = sel.select("vec_id", "embedding").mapInArrow(kernel, schema)
    from .relational import _ranked, distributed_topk

    # per-partition top-k then a k-row global merge: the IVF scale path must
    # not funnel every probed cell's candidates through one window reducer
    by = [("cos4", False), ("vec_id", True)]
    return _ranked(distributed_topk(scored, k, by), by, ["vec_id", "cos4"])


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the compressed ANN scale path beyond SQ8.
#
# Public reference: Jegou, Douze, Schmid, "Product Quantization for Nearest
# Neighbor Search" (TPAMI 2011) — split the vector into M subspaces, run
# k-means per subspace (ksub centroids each), store M small codes per
# vector, and answer queries by Asymmetric Distance Computation (ADC): a
# per-query (M, ksub) lookup table of subquery-centroid dot products, so a
# vector's score is M table gathers + a sum.  Memory: M bytes/vector at
# ksub<=256 vs 4*dim float32 — the path that makes billion-vector corpora
# scannable.  Same engine discipline as IVF above: train on a seeded
# driver-side sample (codebook is KBs, broadcast), encode/score one numpy
# matmul per Arrow batch, top-k via distributed_topk (never a single
# reducer).
# ---------------------------------------------------------------------------


def pq_kmeans(
    x: np.ndarray,
    m: int = 4,
    ksub: int = 16,
    iters: int = 10,
    seed: int = 42,
) -> np.ndarray:
    """Seeded per-subspace Lloyd's k-means over an already L2-normalized
    float64 sample matrix -> (m, ksub, dim//m) codebooks.

    Pure numpy and fully deterministic in the input row order — the
    DuckDB-oracle generator re-trains on the identically-ordered sample
    and gets bit-identical codebooks (see __spark_entry__ ann_pq_topk)."""
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, ksub, dsub), dtype=np.float64)
    for j in range(m):
        sub = x[:, j * dsub:(j + 1) * dsub]
        k = min(ksub, sub.shape[0])
        cents = sub[rng.choice(sub.shape[0], size=k, replace=False)]
        for _ in range(iters):
            # nearest by euclidean distance within the subspace
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(cents.shape[0]):
                members = sub[assign == c]
                if members.shape[0]:
                    cents[c] = members.mean(axis=0)
        if k < ksub:  # degenerate tiny sample: pad by repeating
            cents = np.concatenate(
                [cents, np.repeat(cents[:1], ksub - k, axis=0)])
        books[j] = cents
    return books


def pq_train_codebooks(
    emb: DataFrame,
    m: int = 4,
    ksub: int = 16,
    sample_rows: int = 20_000,
    iters: int = 10,
    seed: int = 42,
    vec_col: str = "embedding",
) -> np.ndarray:
    """Seeded per-subspace Lloyd's k-means -> (m, ksub, dim//m) codebooks.

    Vectors are L2-normalized first (cosine ANN); dim must divide by m.
    Same sampling shape as ivf_train_centroids: orderBy(rand(seed)).limit
    compiles to TakeOrderedAndProject — an unbiased seeded sample with no
    global sort."""
    pdf = emb.select(vec_col).orderBy(F.rand(seed)).limit(sample_rows) \
        .toPandas()
    x = _l2_normalize(np.array(pdf[vec_col].tolist(), dtype=np.float64))
    return pq_kmeans(x, m=m, ksub=ksub, iters=iters, seed=seed)


def pq_encode(
    emb: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    carry: tuple = (),
) -> DataFrame:
    """-> DataFrame(vec_id, *carry, code array<long> len m): per-subspace
    nearest centroid, one distance matmul per subspace per Arrow batch.
    `carry` names long-typed columns passed through untouched (the
    IVFADC layout rides this with carry=("cell",))."""
    books = np.asarray(codebooks, dtype=np.float64)
    m, ksub, dsub = books.shape
    sel = emb.select(F.col(id_col).alias("vec_id"),
                     *[F.col(c) for c in carry],
                     F.col(vec_col).alias("vec"))
    schema = T.StructType(
        [T.StructField("vec_id", T.LongType())]
        + [T.StructField(c, T.LongType()) for c in carry]
        + [T.StructField("code", T.ArrayType(T.LongType()))]
    )

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            pdf = b.to_pandas()
            if not len(pdf):
                continue
            x = _l2_normalize(np.array(pdf["vec"].tolist(), dtype=np.float64))
            codes = np.empty((x.shape[0], m), dtype=np.int64)
            for j in range(m):
                sub = x[:, j * dsub:(j + 1) * dsub]
                # ||s-c||^2 = ||s||^2 - 2 s.c + ||c||^2; ||s||^2 constant
                # per row, so argmin over (-2 s.c + ||c||^2)
                d = -2.0 * (sub @ books[j].T) + (books[j] ** 2).sum(axis=1)
                codes[:, j] = np.argmin(d, axis=1)
            cols = {"vec_id": pdf["vec_id"].to_numpy()}
            cols.update({c: pdf[c].to_numpy() for c in carry})
            cols["code"] = list(codes)
            yield pa.RecordBatch.from_pydict(
                cols,
                schema=pa.schema(
                    [pa.field("vec_id", pa.int64())]
                    + [pa.field(c, pa.int64()) for c in carry]
                    + [pa.field("code", pa.list_(pa.int64()))]),
            )

    return sel.mapInArrow(kernel, schema)


def pq_adc_table(codebooks: np.ndarray, query_vec: np.ndarray) -> np.ndarray:
    """The per-query ADC lookup table -> (m, ksub) of subquery-centroid
    dot products (cosine form: both sides unit-normalized)."""
    books = np.asarray(codebooks, dtype=np.float64)
    m, ksub, dsub = books.shape
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / (np.linalg.norm(q) or 1.0)
    return np.stack([books[j] @ qn[j * dsub:(j + 1) * dsub]
                     for j in range(m)])


def pq_topk(
    codes: DataFrame,
    codebooks: np.ndarray,
    query_vec: np.ndarray,
    k: int = 10,
    exclude_vec_id: int | None = None,
) -> DataFrame:
    """-> DataFrame(rank, vec_id, adc4): top-k by the ADC approximate
    cosine — per batch, M table gathers + a sum; the codes table is the
    only thing scanned (M int codes/vector, not the float vectors)."""
    lut = pq_adc_table(codebooks, query_vec)
    m = lut.shape[0]
    sel = codes
    if exclude_vec_id is not None:
        sel = sel.filter(F.col("vec_id") != int(exclude_vec_id))
    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("adc4", T.DoubleType()),
    ])

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            pdf = b.to_pandas()
            if not len(pdf):
                continue
            c = np.array(pdf["code"].tolist(), dtype=np.int64)
            adc = np.zeros(c.shape[0], dtype=np.float64)
            for j in range(m):
                adc += lut[j][c[:, j]]
            yield pa.RecordBatch.from_pydict(
                {"vec_id": pdf["vec_id"].to_numpy(),
                 "adc4": np.round(adc, 4)},
                schema=pa.schema([pa.field("vec_id", pa.int64()),
                                  pa.field("adc4", pa.float64())]),
            )

    scored = sel.select("vec_id", "code").mapInArrow(kernel, schema)
    from .relational import _ranked, distributed_topk

    by = [("adc4", False), ("vec_id", True)]
    return _ranked(distributed_topk(scored, k, by), by, ["vec_id", "adc4"])


def ivf_kmeans(x: np.ndarray, n_centroids: int = 8, iters: int = 10,
               seed: int = 42) -> np.ndarray:
    """Seeded Lloyd's k-means over an already L2-normalized float64
    matrix -> (n_centroids, dim) unit centroids — the same loop
    ivf_train_centroids runs after its Spark-side sample, factored out so
    a deterministic full-table caller (the gate / its DuckDB oracle
    generator) re-trains bit-identical centroids."""
    rng = np.random.default_rng(seed)
    cents = x[rng.choice(x.shape[0], size=min(n_centroids, x.shape[0]),
                         replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ cents.T, axis=1)
        for c in range(cents.shape[0]):
            members = x[assign == c]
            if members.shape[0]:
                cents[c] = members.mean(axis=0)
        cents = _l2_normalize(cents)
    return cents


def ivfpq_encode(assigned: DataFrame, codebooks: np.ndarray) -> DataFrame:
    """-> DataFrame(vec_id, cell, code): the IVFADC storage layout —
    coarse cell + PQ code per vector (Jegou, Douze, Schmid, "Product
    Quantization for Nearest Neighbor Search", IEEE TPAMI 2011, §V —
    the non-residual variant: ONE global codebook over the vectors
    themselves, so the code is cell-independent and re-bucketing never
    re-encodes).

    Scale shape: one Arrow-batch encode pass over the ivf_assign output
    (pq_encode's kernel with the cell column carried through); at 100 TB
    the result is written partitioned/bucketed by `cell`, so a query
    reads only the probed cells' code files — M bytes/vector instead of
    4*dim, the reason IVFADC is the standard billion-scale layout."""
    out = pq_encode(assigned, codebooks, carry=("cell",))
    return out.select("vec_id", "cell", "code")


def ivfpq_topk(
    index_df: DataFrame,
    codebooks: np.ndarray,
    centroids: np.ndarray,
    query_vec: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    exclude_vec_id: int | None = None,
) -> DataFrame:
    """IVFADC search (Jegou et al., TPAMI 2011, Algorithm: coarse probe
    + asymmetric distance over codes): filter the (vec_id, cell, code)
    table to the `nprobe` cells nearest the query — a plain Catalyst
    predicate that partition-prunes when the table is bucketed by cell —
    then the standard PQ ADC top-k over the surviving codes.
    nprobe = n_centroids degrades to exact pq_topk over every code (the
    correctness anchor the tests pin)."""
    cents = _l2_normalize(np.asarray(centroids, dtype=np.float64))
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / (np.linalg.norm(q) or 1.0)
    probe = np.argsort(-(cents @ qn))[:nprobe].tolist()
    sel = index_df.filter(F.col("cell").isin(probe))
    return pq_topk(sel, codebooks, query_vec, k=k,
                   exclude_vec_id=exclude_vec_id)


def pq_reconstruct(codebooks: np.ndarray, code: np.ndarray) -> np.ndarray:
    """Decode one PQ code back to its centroid concatenation (the ADC
    identity anchor: adc(q, code) == dot(q_norm, reconstruct(code)))."""
    books = np.asarray(codebooks, dtype=np.float64)
    return np.concatenate([books[j][int(code[j])]
                           for j in range(books.shape[0])])


def pq_oracle_sql(
    codebooks: np.ndarray,
    lut: np.ndarray,
    k: int = 10,
    exclude_vec_id: int | None = 0,
    table: str = "embeddings",
    coarse_cents: np.ndarray | None = None,
    probe_cells: list[int] | None = None,
) -> str:
    """Render the whole PQ pipeline (encode + ADC top-k) as one DuckDB
    statement with the trained codebooks and the per-query ADC table
    embedded as literals — the hash-exact oracle for the ann_pq_topk gate.

    The codebook/LUT floats round-trip exactly through repr(); the only
    arithmetic the SQL recomputes is the per-vector L2-normalize and the
    per-subspace argmin (distance = -2*dot + ||c||^2, c-asc tie-break) plus
    the left-to-right float64 LUT fold — the same formulas pq_encode /
    pq_topk evaluate.  Summation order inside a dot product may differ from
    BLAS at the last ulp; tests/test_pq.py asserts the argmin runner-up
    margins and round-boundary distances on the gate corpus dwarf that."""
    books = np.asarray(codebooks, dtype=np.float64)
    m, ksub, dsub = books.shape
    lut = np.asarray(lut, dtype=np.float64)
    assert lut.shape == (m, ksub)
    # ::DOUBLE on every literal — bare decimal literals bind as DECIMAL in
    # DuckDB, which would silently move all the arithmetic off float64
    cent_rows = []
    for j in range(m):
        cn2 = (books[j] ** 2).sum(axis=1)
        for c in range(ksub):
            vals = ", ".join(f"{float(v)!r}::DOUBLE" for v in books[j, c])
            cent_rows.append(f"({j}, {c}, {float(cn2[c])!r}::DOUBLE, {vals})")
    vcols = ", ".join(f"v{i}" for i in range(1, dsub + 1))
    lut_rows = ", ".join(
        f"({j}, {c}, {float(lut[j, c])!r}::DOUBLE)"
        for j in range(m) for c in range(ksub)
    )
    dot = " + ".join(
        f"x.emb[ct.j*{dsub}+{i}]/x.nrm*ct.v{i}" for i in range(1, dsub + 1)
    )
    fold = "max(CASE WHEN j = 0 THEN lv END)"
    for j in range(1, m):
        fold = f"({fold} + max(CASE WHEN j = {j} THEN lv END))"
    excl = (f"WHERE vec_id <> {int(exclude_vec_id)}"
            if exclude_vec_id is not None else "")
    # optional IVFADC coarse stage: assign each vector to its nearest
    # (max-dot, tie -> lowest cell like np.argmax) embedded centroid and
    # keep only the probed cells' vectors — the SQL twin of
    # ivf_assign + ivfpq_topk's cell predicate
    coarse_ctes, src = "", "xn"
    if coarse_cents is not None:
        if not probe_cells:
            raise ValueError(
                "coarse_cents given but probe_cells is empty — an empty "
                "IN () is invalid SQL; pass the probed cell ids")
        cc = np.asarray(coarse_cents, dtype=np.float64)
        dim = cc.shape[1]
        cc_rows = ", ".join(
            "(" + f"{int(i)}, " + ", ".join(
                f"{float(v)!r}::DOUBLE" for v in cc[i]) + ")"
            for i in range(cc.shape[0])
        )
        wcols = ", ".join(f"w{i}" for i in range(1, dim + 1))
        cdot = " + ".join(f"x.emb[{i}]/x.nrm*cc.w{i}"
                          for i in range(1, dim + 1))
        probes = ", ".join(str(int(p)) for p in (probe_cells or []))
        coarse_ctes = f"""
ccent(cc, {wcols}) AS (VALUES {cc_rows}),
cellassign AS (
  SELECT vec_id, cc FROM (
    SELECT x.vec_id, cc.cc,
           row_number() OVER (PARTITION BY x.vec_id
                              ORDER BY ({cdot}) DESC, cc.cc ASC) AS rn
    FROM xn x CROSS JOIN ccent cc
  ) WHERE rn = 1
),
xp AS (
  SELECT x.* FROM xn x JOIN cellassign ca USING (vec_id)
  WHERE ca.cc IN ({probes})
),"""
        src = "xp"
    return f"""
WITH xv AS (
  SELECT vec_id,
         list_transform(embedding, e -> CAST(e AS DOUBLE)) AS emb
  FROM {table} {excl}
),
xn AS (
  SELECT vec_id, emb,
         sqrt(list_sum(list_transform(emb, e -> e * e))) AS nrm
  FROM xv
),{coarse_ctes}
cent(j, c, cn2, {vcols}) AS (VALUES {", ".join(cent_rows)}),
d AS (
  SELECT x.vec_id, ct.j, ct.c,
         -2 * ({dot}) + ct.cn2 AS dist
  FROM {src} x CROSS JOIN cent ct
),
code AS (
  SELECT vec_id, j, c FROM (
    SELECT vec_id, j, c,
           row_number() OVER (PARTITION BY vec_id, j
                              ORDER BY dist ASC, c ASC) AS rn
    FROM d
  ) WHERE rn = 1
),
lut(j, c, lv) AS (VALUES {lut_rows}),
joined AS (
  SELECT code.vec_id, code.j AS j, lut.lv AS lv
  FROM code JOIN lut ON code.j = lut.j AND code.c = lut.c
),
adc AS (
  SELECT vec_id, {fold} AS adc
  FROM joined
  GROUP BY vec_id
)
SELECT row_number() OVER (ORDER BY round(adc, 4) DESC, vec_id ASC)::BIGINT
         AS rank,
       vec_id, round(adc, 4) AS adc4
FROM adc
ORDER BY round(adc, 4) DESC, vec_id ASC
LIMIT {int(k)}
"""
