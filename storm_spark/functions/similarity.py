"""Similarity search over embedding columns (``array<float>``).

- :func:`cosine_topk` — exact brute-force top-k neighbors, the correctness
  baseline. All math in Column expressions (``zip_with`` + ``aggregate``),
  double precision, codegen'd. Scale: a blocked cross join — broadcast the
  (much smaller) query side, shuffle-partition the corpus; cost is
  |Q| × |corpus| dot products spread over the cluster.
- :func:`lsh_bucket_topk` — the scale path: random-hyperplane LSH buckets
  shrink the candidate set; exact re-rank inside buckets. Hyperplanes are
  derived deterministically from md5, so results are reproducible anywhere
  (no RNG state).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity of two numeric arrays, computed in double."""
    ad = a.cast("array<double>")
    bd = b.cast("array<double>")
    return _dot(ad, bd) / (_norm(ad) * _norm(bd))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    include_self: bool = False,
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector in the corpus.

    Returns (query_id, neighbor_id, cos_sim, rank). Tie-break: higher
    similarity first, then smaller neighbor id (fully deterministic).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("__qv__")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).cast("array<double>").alias("__cv__")
    )
    pairs = F.broadcast(q).crossJoin(c)
    if not include_self:
        pairs = pairs.filter(F.col("query_id") != F.col("neighbor_id"))
    sim = pairs.select(
        "query_id",
        "neighbor_id",
        (_dot(F.col("__qv__"), F.col("__cv__")) / (_norm(F.col("__qv__")) * _norm(F.col("__cv__")))).alias(
            "cos_sim"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim"), "rank")
    )


def _hyperplanes(dim: int, n_planes: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from md5 — reproducible with
    no RNG dependency (each component is md5(p:i) mapped to [-1, 1))."""
    import hashlib

    planes = []
    for p in range(n_planes):
        comps = []
        for i in range(dim):
            h = int(hashlib.md5(f"{p}:{i}".encode()).hexdigest()[:8], 16)
            comps.append((h / 0x7FFFFFFF) - 1.0)
        planes.append(comps)
    return planes


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 8,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: random-hyperplane signature buckets + exact
    re-rank within each bucket. ~2^n_planes-fold candidate reduction; recall
    depends on bucket granularity (an IVF-style probe-multiple-buckets
    extension is the next notch). No SQL oracle — approximate by design."""
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    planes = _hyperplanes(dim, n_planes)

    def signature(vc: Column) -> Column:
        v = vc.cast("array<double>")
        bits = []
        for p, comps in enumerate(planes):
            plane = F.array(*[F.lit(x) for x in comps])
            bits.append(F.when(_dot(v, plane) >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
        out = bits[0]
        for b in bits[1:]:
            out = out + b
        return out

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("__cv__"),
        signature(F.col(vec_col)).alias("__sig__"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("__qv__"),
        signature(F.col(vec_col)).alias("__sig__"),
    )
    pairs = q.join(c, on="__sig__").filter(F.col("query_id") != F.col("neighbor_id"))
    sim = pairs.select(
        "query_id",
        "neighbor_id",
        (_dot(F.col("__qv__"), F.col("__cv__")) / (_norm(F.col("__qv__")) * _norm(F.col("__cv__")))).alias(
            "cos_sim"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim"), "rank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: partition the corpus into
    ``n_lists`` Voronoi cells, probe the ``n_probe`` nearest cells per query,
    exact re-rank inside the probed cells.

    Centroids are the ``n_lists`` smallest-id corpus vectors — deterministic
    (and SQL-expressible) rather than k-means-trained; swap in trained
    centroids for recall without touching the plan shape. Scale: the
    centroid set is tiny and broadcast twice (corpus assignment, query
    probing); the corpus shuffles once on cell id; per-query work is
    |probe cells| instead of |corpus|.
    """
    cents = (
        corpus.orderBy(F.col(id_col).asc())
        .limit(n_lists)
        .select(
            F.col(id_col).alias("cent_id"),
            F.col(vec_col).cast("array<double>").alias("__cent__"),
        )
    )

    def cos(a: Column, b: Column) -> Column:
        return _dot(a, b) / (_norm(a) * _norm(b))

    # corpus → nearest centroid (rank 1 by cosine, centroid id tie-break)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).cast("array<double>").alias("__cv__")
    )
    w_assign = Window.partitionBy("neighbor_id").orderBy(
        F.col("__cc__").desc(), F.col("cent_id").asc()
    )
    assigned = (
        c.crossJoin(F.broadcast(cents))
        .withColumn("__cc__", cos(F.col("__cv__"), F.col("__cent__")))
        .withColumn("__r__", F.row_number().over(w_assign))
        .filter(F.col("__r__") == 1)
        .select("neighbor_id", "__cv__", F.col("cent_id").alias("__cell__"))
    )
    # query → n_probe nearest centroids
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("__qv__")
    )
    w_probe = Window.partitionBy("query_id").orderBy(F.col("__qc__").desc(), F.col("cent_id").asc())
    probed = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("__qc__", cos(F.col("__qv__"), F.col("__cent__")))
        .withColumn("__r__", F.row_number().over(w_probe))
        .filter(F.col("__r__") <= n_probe)
        .select("query_id", "__qv__", F.col("cent_id").alias("__cell__"))
    )
    pairs = probed.join(assigned, on="__cell__").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    # each corpus vector lives in exactly one cell and probed cells are
    # distinct, so (query, neighbor) pairs are already unique — no dedup
    sim = pairs.select(
        "query_id",
        "neighbor_id",
        cos(F.col("__qv__"), F.col("__cv__")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim"), "rank")
    )


def quantize_embeddings(
    df: DataFrame, vec_col: str = "embedding", out_col: str = "q_embedding"
) -> DataFrame:
    """Symmetric int8 quantization: per-vector scale = max|x| / 127, stored
    as (array<tinyint>, scale float). Shrinks the vector payload 4× vs
    float32 — at 100 TB the ANN candidate shuffles and the broadcast corpus
    move 4× less data; cosine on dequantized values is within ~1e-2 of
    exact, and the exact re-rank step can read the full-precision column."""
    v = F.col(vec_col).cast("array<double>")
    scale = F.greatest(
        F.aggregate(v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x))) / F.lit(127.0),
        F.lit(1e-12),
    )
    return df.withColumn("__scale__", scale).withColumn(
        out_col,
        F.transform(v, lambda x: F.round(x / F.col("__scale__")).cast("tinyint")),
    ).withColumnRenamed("__scale__", f"{out_col}_scale")


def dequantized_cosine(qa: Column, sa: Column, qb: Column, sb: Column) -> Column:
    """Cosine over two quantized vectors — scales cancel in the cosine, so
    this is just the int dot product normalized (cheap: int8 multiply-adds)."""
    a = qa.cast("array<double>")
    b = qb.cast("array<double>")
    return _dot(a, b) / (_norm(a) * _norm(b))


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 8,
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, sim >= threshold)
    via LSH buckets + exact verify — the embedding-space analogue of
    minhash dedup."""
    topk = lsh_bucket_topk(df, df, id_col, vec_col, k=1000, n_planes=n_planes, dim=dim)
    return (
        topk.filter((F.col("cos_sim") >= threshold) & (F.col("query_id") < F.col("neighbor_id")))
        .select(
            F.col("query_id").alias("id_a"),
            F.col("neighbor_id").alias("id_b"),
            F.col("cos_sim"),
        )
    )
