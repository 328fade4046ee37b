"""Seed-list ingestion (SURVEY.md S1/S2, F1/F2).

The reference's input is JSON seed files with the shape
``{language, summary, repositories: [{url, stars, language[]}]}``
(``src/models.py:10-33``, loaded by ``load_input_data``
``src/io_handler.py:15-39`` and multi-file ``load_multiple_input_files``
``src/io_handler.py:42-52``). The engine reads the same shape declaratively:

  * explicit schema — never infer at 10^10 scale (SURVEY.md §1.3)
  * multi-path read = implicit union (S2)
  * ``explode(repositories)`` to one row per seed URL
  * seed-priority filter = the star-threshold filter (F1,
    ``src/crawler.py:33``) — pushed down by Catalyst
  * URL-validity predicate (F2, ``src/utils.py:72-79``) as a regexp filter
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SEED_FILE_SCHEMA = T.StructType(
    [
        T.StructField("language", T.StringType()),
        T.StructField(
            "summary",
            T.StructType(
                [
                    T.StructField("total_repositories", T.LongType()),
                    T.StructField("total_stars", T.LongType()),
                    T.StructField("average_stars", T.DoubleType()),
                ]
            ),
        ),
        T.StructField(
            "repositories",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("url", T.StringType()),
                        T.StructField("stars", T.LongType()),
                        T.StructField("language", T.ArrayType(T.StringType())),
                    ]
                )
            ),
        ),
    ]
)

# reference URL-validity regex (src/utils.py:72-79), generalized: the engine
# accepts any http(s) URL; reference mode pins the github.com shape
URL_VALID_RE = r"^https?://[^\s/]+\.[^\s/]+(/.*)?$"
URL_VALID_RE_REFERENCE = r"^https://github\.com/[^/]+/[^/]+/?$"


def load_seeds_json(
    spark: SparkSession,
    paths: list[str] | str,
    min_priority: float | None = None,
    url_regex: str = URL_VALID_RE,
) -> DataFrame:
    """Seed files -> (url, priority, tags) rows, validated and filtered.

    ``min_priority`` is the star-threshold filter (F1); ``priority`` = stars.
    """
    raw = spark.read.schema(SEED_FILE_SCHEMA).option("multiLine", "true").json(paths)
    seeds = (
        raw.select(F.explode("repositories").alias("r"))
        .select(
            F.col("r.url").alias("url"),
            F.col("r.stars").cast("double").alias("priority"),
            F.coalesce(F.col("r.language"), F.array()).alias("tags"),
        )
        .filter(F.col("url").isNotNull() & F.regexp_like(F.col("url"), F.lit(url_regex)))
    )
    if min_priority is not None:
        seeds = seeds.filter(F.col("priority") >= min_priority)
    return seeds


def seed_summary(seeds: DataFrame) -> DataFrame:
    """Recompute the reference's InputSummary (``src/models.py:19-24``) as an
    aggregate — derived, never stored (SURVEY.md §1.1)."""
    return seeds.agg(
        F.count("*").alias("total_repositories"),
        F.sum("priority").cast("long").alias("total_stars"),
        F.round(F.avg("priority"), 4).alias("average_stars"),
        F.max_by("url", "priority").alias("top_repository_url"),
    )
