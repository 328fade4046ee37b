from gh_crawler_spark.sources.pages import (  # noqa: F401
    PAGES_SCHEMA,
    generate_pages,
    generate_robots,
    generate_seeds,
)
