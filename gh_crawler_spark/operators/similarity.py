"""Similarity search over an embedding column (array<float>).

* brute-force cosine top-k — the exact baseline: broadcast the (small) query
  set against the corpus, dot products via zip_with/aggregate (JVM-side),
  window top-k. Linear scan shape: at 10^10 vectors this is one map stage +
  a bounded-size per-query heap (the rank filter), no all-pairs blowup.
* LSH-bucketed ANN — the scale path: random-hyperplane signatures (sign of
  dot with deterministic hash-derived planes), equi-join on bucket, exact
  re-rank inside buckets. Same join-shape rule as the text dedup family:
  never all-pairs, always an equi-join on a short key.
* cosine near-dup pairs — embedding analog of near-dup detection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, v: s + v * v))


def cosine_expr(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` is broadcast (queries ≪ corpus); the corpus is scanned once.
    Ties broken by neighbor id for full determinism.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"))
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", F.round(cosine_expr(F.col("qvec"), F.col("cvec")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rk")
    )


def _plane(dim: int, plane_id: int):
    """Deterministic pseudo-random hyperplane: component j is a hash-derived
    value in [-1, 1) — xxhash64-based, so identical on any cluster layout."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (
            F.pmod(F.xxhash64(F.concat_ws(":", F.lit("plane"), F.lit(plane_id), j.cast("string"))), F.lit(20000))
            - 10000
        ).cast("double")
        / 10000.0,
    )


def lsh_bucket_expr(vec, dim: int, n_planes: int = 12, plane_offset: int = 0):
    """Random-hyperplane LSH bucket id: n_planes sign bits packed to a long.
    ``plane_offset`` selects an independent plane set (multi-table LSH)."""
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        sign = F.when(
            _dot(vec, _plane(dim, plane_offset + p)) >= 0, F.lit(1 << p).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        bucket = bucket.bitwiseOR(sign)
    return bucket


def _table_buckets(vec, dim: int, n_planes: int, n_tables: int):
    """array<struct<tbl, bucket>> — one bucket per hash table, computed in a
    single pass over the vector (the corpus is scanned once regardless of
    n_tables)."""
    return F.array(
        *[
            F.struct(
                F.lit(t).alias("tbl"),
                lsh_bucket_expr(vec, dim, n_planes, plane_offset=t * n_planes).alias("bucket"),
            )
            for t in range(n_tables)
        ]
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 10,
    n_tables: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: candidates share the query's LSH bucket in ANY of
    ``n_tables`` independent hash tables; exact cosine re-rank over the
    union of candidates.

    Recall/compute trade (standard multi-probe-free LSH): per-table collision
    probability for vectors at angle θ is (1 − θ/π)^n_planes; n_tables
    independent tables lift recall to 1 − (1 − p)^n_tables while candidate
    count (≈ |corpus| · n_tables / 2^n_planes per query) stays bounded.
    tests/test_similarity.py pins recall ≥ 0.9 vs brute force at the default
    (n_planes=6, n_tables=4) on 64-dim data. The corpus is scanned once; the
    per-table buckets come from one explode, and duplicate candidate pairs
    are dropped before the (more expensive) exact re-rank.
    """
    cb = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        F.explode(_table_buckets(F.col(vec_col), dim, n_planes, n_tables)).alias("b"),
    ).select("neighbor_id", "cvec", "b.tbl", "b.bucket")
    qb = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.explode(_table_buckets(F.col(vec_col), dim, n_planes, n_tables)).alias("b"),
    ).select("query_id", "qvec", "b.tbl", "b.bucket")
    cands = (
        cb.join(F.broadcast(qb), ["tbl", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cands.withColumn(
        "cosine", F.round(cosine_expr(F.col("qvec"), F.col("cvec")), 6)
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rk")
    )


def ivf_build_centroids(
    corpus: DataFrame,
    n_cells: int = 16,
    lloyd_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantizer: (cell, centroid ARRAY<DOUBLE>).

    Seeds = the ``n_cells`` corpus vectors with the smallest xxhash64(id)
    (deterministic at any parallelism — no RNG), refined by ``lloyd_iters``
    k-means rounds. Each Lloyd round is: assign (one scan × n_cells dot
    products, centroids broadcast) then re-average via posexplode + one
    groupBy — no driver-side math, centroids never leave the cluster except
    as a broadcast. n_cells is small (√n rule of thumb), so every stage here
    is a dim-table job next to the corpus scan.
    """
    # orderBy+limit compiles to TakeOrderedAndProject (distributed partial
    # top-k) — a global row_number window here would sort the corpus into one
    # partition. The tiny result then gets its cell ordinal from a window
    # over ≤ n_cells rows.
    topn = (
        corpus.select(
            F.xxhash64(F.col(id_col).cast("string")).alias("__h"),
            F.col(id_col).alias("__id"),
            F.col(vec_col).alias("centroid"),
        )
        .orderBy("__h", "__id")
        .limit(n_cells)
    )
    w = Window.orderBy("__h", "__id")
    seeds = topn.select(
        (F.row_number().over(w) - 1).alias("cell"), "centroid"
    )
    cents = seeds
    for _ in range(lloyd_iters):
        assigned = ivf_assign(corpus, cents, id_col=id_col, vec_col=vec_col)
        refined = (
            assigned.select("cell", F.posexplode(vec_col).alias("pos", "v"))
            .groupBy("cell", "pos")
            .agg(F.avg("v").alias("m"))
            .groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("cell", F.transform("pm", lambda s: s["m"]).alias("centroid"))
        )
        # empty-cluster fallback: a cell that lost all members keeps its
        # previous centroid (the re-average groupBy only emits assigned
        # cells; without this the quantizer silently shrinks below n_cells
        # and nprobe≈n_cells quietly loses candidate space)
        cents = (
            cents.select("cell", F.col("centroid").alias("__prev"))
            .join(refined.select("cell", F.col("centroid").alias("__new")), "cell", "left")
            .select("cell", F.coalesce("__new", "__prev").alias("centroid"))
        )
    return cents


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its ``nprobe`` nearest centroid cells (cosine).
    Centroids are broadcast; one corpus scan, rank per vector."""
    c = centroids.select("cell", F.col("centroid"))
    scored = corpus.join(F.broadcast(c)).withColumn(
        "__sim", cosine_expr(F.col(vec_col), F.col("centroid"))
    )
    w = Window.partitionBy(id_col).orderBy(F.col("__sim").desc(), F.col("cell").asc())
    return (
        scored.withColumn("__crk", F.row_number().over(w))
        .filter(F.col("__crk") <= nprobe)
        .drop("centroid", "__sim", "__crk")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    lloyd_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN top-k: exact cosine re-rank restricted to the ``nprobe``
    cells nearest each query — the inverted-file pattern (corpus is
    partitionable by cell on disk at scale; a probe reads nprobe/n_cells of
    the data instead of all of it). Recall grows with nprobe; nprobe =
    n_cells degenerates to exact brute force."""
    cents = ivf_build_centroids(corpus, n_cells, lloyd_iters, id_col, vec_col)
    cells = ivf_assign(corpus, cents, nprobe=1, id_col=id_col, vec_col=vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"), "cell"
    )
    qcells = ivf_assign(queries, cents, nprobe=nprobe, id_col=id_col, vec_col=vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"), "cell"
    )
    return _ivf_rank(cells, qcells, k)


def _ivf_rank(cells: DataFrame, qcells: DataFrame, k: int) -> DataFrame:
    """Shared IVF re-rank: candidates share a probed cell; exact cosine
    top-k per query (broadcast query side, bounded rank)."""
    scored = (
        cells.join(F.broadcast(qcells), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("cosine", F.round(cosine_expr(F.col("qvec"), F.col("cvec")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rk")
    )


def ivf_write_index(
    index_table,
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist the cell-assigned corpus as a CELL-PARTITIONED snapshot table
    — the inverted file. Every data file then belongs to exactly one cell,
    so a probe can read nprobe/n_cells of the files instead of the corpus
    (the same partition-pruning machinery the frontier uses for buckets)."""
    assigned = ivf_assign(corpus, centroids, nprobe=1, id_col=id_col, vec_col=vec_col)
    index_table.overwrite_partitions(
        assigned.select(id_col, vec_col, "cell"), "cell",
        {"op": "ivf_index"}, replace_all=True,
    )


def ivf_probe_index(
    spark,
    index_table,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe a cell-partitioned IVF index: rank queries' nprobe nearest
    cells, then scan ONLY those cells' files (file-level partition pruning)
    for the exact re-rank. The collect here is the tiny distinct probed-cell
    set (≤ |queries|·nprobe ints), never vector data."""
    qcells = ivf_assign(queries, centroids, nprobe=nprobe, id_col=id_col, vec_col=vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"), "cell"
    )
    probe_cells = sorted(
        int(r["cell"]) for r in qcells.select("cell").distinct().collect()
    )
    cells = index_table.read_partitions(spark, "cell", probe_cells).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"), "cell"
    )
    return _ivf_rank(cells, qcells, k)


def cosine_near_dup_pairs(
    corpus: DataFrame, threshold: float = 0.95, id_col: str = "vec_id",
    vec_col: str = "embedding", dim: int | None = None,
) -> DataFrame:
    """Embedding near-dup pairs (cosine ≥ t) via LSH buckets + exact verify.

    Pass ``dim`` explicitly to keep the builder action-free; omitting it
    falls back to a one-row probe job (fine interactively, avoid in loops)."""
    if dim is None:
        dim = int(corpus.select(F.size(vec_col).alias("d")).first()["d"])
    b = corpus.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        lsh_bucket_expr(F.col(vec_col), dim, 8).alias("bucket"),
    )
    x, y = b.alias("x"), b.alias("y")
    return (
        x.join(y, (F.col("x.bucket") == F.col("y.bucket")) & (F.col("x.vid") < F.col("y.vid")))
        .withColumn("cosine", F.round(cosine_expr(F.col("x.vec"), F.col("y.vec")), 6))
        .filter(F.col("cosine") >= threshold)
        .select(F.col("x.vid").alias("d1"), F.col("y.vid").alias("d2"), "cosine")
    )
