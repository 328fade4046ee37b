"""Document deduplication: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup — the training-data-pipeline dedup family.

Scale notes (the whole point of each design):

* **exact**: groupBy fingerprint — one shuffle on a 128-bit key, map-side
  partial agg; at 10^10 docs this is the cheapest possible dedup.
* **n-gram Jaccard**: exact pairwise similarity via shingle inverted index
  (explode -> self-join on shingle -> count). Correct but O(pairs-sharing-a-
  shingle); used as the verifier stage and the small-scale oracle.
* **MinHash+LSH**: k minhash values from xxhash64(shingle, seed_i) (all
  JVM-side — xxhash64 of a concatenated seed prefix), banded into b bands;
  candidate pairs = equi-join on (band_id, band_hash) — a shuffle on short
  keys, never all-pairs. Candidates are then verified with exact Jaccard.
  This is the canonical web-dedup pipeline shape (MinHashLSH as in Broder '97
  resemblance sketches).
* **SimHash**: 64-bit signature = sign-sum of per-token hash bits; near-dups
  = pairs within Hamming distance d, found by splitting the signature into
  d+1 chunks (pigeonhole: any pair at distance ≤ d shares a chunk exactly) —
  again an equi-join, never all-pairs.
* **embedding cosine**: see operators/similarity.py (same join-shape rules).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gh_crawler_spark.operators.textops import fingerprint_expr, tokens_expr


def shingles_df(docs: DataFrame, k: int = 3, text_col: str = "text") -> DataFrame:
    """Distinct word-k-gram shingles per doc: (doc_id, shingle)."""
    toks = tokens_expr(F.col(text_col))
    sh = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - k, F.lit(-1))),
        lambda i: F.array_join(F.slice(toks, i + 1, k), " "),
    )
    return (
        docs.select("doc_id", F.explode(sh).alias("shingle"))
        .dropDuplicates(["doc_id", "shingle"])
    )


def dedup_exact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup groups: keeper = min doc_id per normalized-text fingerprint."""
    return (
        docs.select("doc_id", fingerprint_expr(F.col(text_col)).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keeper_doc_id"), F.count("*").alias("group_size"))
    )


def ngram_jaccard_pairs(
    docs: DataFrame, k: int = 3, threshold: float = 0.5, text_col: str = "text"
) -> DataFrame:
    """Exact Jaccard-similar pairs over word-k-gram shingle sets.

    Inverted-index self-join: pairs are generated only for docs sharing at
    least one shingle. Hot shingles behave like hot join keys — AQE skew-join
    (enabled in session.py) splits them; at extreme scale drop top-frequency
    shingles first (they carry ~no signal and all the skew).
    """
    sh = shingles_df(docs, k, text_col)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .agg(F.count("*").alias("common"))
    )
    sa = sizes.select(F.col("doc_id").alias("d1"), F.col("n_sh").alias("n1"))
    sb = sizes.select(F.col("doc_id").alias("d2"), F.col("n_sh").alias("n2"))
    jac = F.col("common") / (F.col("n1") + F.col("n2") - F.col("common"))
    return (
        common.join(sa, "d1").join(sb, "d2")
        .withColumn("jaccard", F.round(jac, 4))
        .filter(F.col("jaccard") >= threshold)
        .select("d1", "d2", "jaccard")
    )


def minhash_signatures(
    docs: DataFrame, n_hashes: int = 32, k: int = 3, text_col: str = "text"
) -> DataFrame:
    """(doc_id, sig ARRAY<BIGINT>): sig[i] = min over shingles of
    xxhash64(i || shingle). All built-in exprs — no UDF."""
    sh = shingles_df(docs, k, text_col)
    mins = [
        F.min(F.xxhash64(F.concat(F.lit(f"mh{i}:"), F.col("shingle")))).alias(f"h{i}")
        for i in range(n_hashes)
    ]
    agg = sh.groupBy("doc_id").agg(*mins)
    return agg.select("doc_id", F.array(*[F.col(f"h{i}") for i in range(n_hashes)]).alias("sig"))


def minhash_lsh_pairs(
    docs: DataFrame,
    n_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
) -> DataFrame:
    """MinHash-LSH candidate generation + exact-Jaccard verification.

    bands=8 × rows=4 at threshold 0.5 gives ~s^4 per-band collision — the
    standard S-curve. Candidates are verified, so precision is exact; recall
    depends on (bands, rows) as usual.
    """
    rows_per_band = n_hashes // bands
    sig = minhash_signatures(docs, n_hashes, k, text_col)
    band_cols = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            *[
                                F.element_at("sig", b * rows_per_band + r + 1).cast("string")
                                for r in range(rows_per_band)
                            ],
                        )
                    ).alias("band_hash"),
                )
                for b in range(bands)
            ]
        )
    ).alias("bh")
    buckets = sig.select("doc_id", band_cols).select("doc_id", "bh.band", "bh.band_hash")
    a = buckets.alias("a")
    b_ = buckets.alias("b")
    candidates = (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .distinct()
    )
    # verify candidates with exact Jaccard (inverted index restricted to them)
    exact = ngram_jaccard_pairs(docs, k=k, threshold=threshold, text_col=text_col)
    return candidates.join(exact, ["d1", "d2"])


def simhash_expr(text_col, n_bits: int = 64):
    """64-bit SimHash as a column expression: per-token xxhash64, sum of
    per-bit signs, sign -> bit. Pure exprs (aggregate over token array)."""
    toks = tokens_expr(text_col)
    hashes = F.transform(toks, lambda t: F.xxhash64(t))

    def bit(i: int):
        votes = F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(h.bitwiseAND(F.lit(1 << i) if i < 63 else F.lit(-(2**63))) != 0, 1).otherwise(-1),
        )
        return F.when(votes > 0, F.lit(1 << i) if i < 63 else F.lit(-(2**63))).otherwise(F.lit(0))

    sig = bit(0)
    for i in range(1, n_bits):
        sig = sig.bitwiseOR(bit(i))
    return sig


def simhash_signatures(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return docs.select("doc_id", simhash_expr(F.col(text_col)).alias("simhash"))


def simhash_near_pairs(
    docs: DataFrame, max_hamming: int = 3, text_col: str = "text"
) -> DataFrame:
    """Pairs within Hamming distance d via the pigeonhole chunk join:
    split the 64-bit signature into d+1 chunks; any pair at distance ≤ d
    agrees exactly on ≥1 chunk — candidates come from an equi-join on
    (chunk_id, chunk_value), then are verified with bit_count(xor)."""
    n_chunks = max_hamming + 1
    width = 64 // n_chunks
    sig = simhash_signatures(docs, text_col)
    chunks = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk_id"),
                        F.shiftrightunsigned(F.col("simhash"), c * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("chunk_val"),
                    )
                    for c in range(n_chunks)
                ]
            )
        ).alias("ch"),
    ).select("doc_id", "simhash", "ch.chunk_id", "ch.chunk_val")
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk_id") == F.col("b.chunk_id"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("d1"),
            F.col("b.doc_id").alias("d2"),
            F.col("a.simhash").alias("s1"),
            F.col("b.simhash").alias("s2"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("s1").bitwiseXOR(F.col("s2")))
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("d1", "d2", "hamming")
    )


def dedup_keep_first(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """Resolve near-dup pairs to a keep/drop decision: drop the larger doc_id
    of every pair (deterministic union-find-lite; exact transitive closure
    would iterate — at pipeline scale one sweep removes the bulk)."""
    drops = pairs.select(F.col("d2").alias("doc_id")).distinct()
    return docs.join(drops, "doc_id", "left_anti")
