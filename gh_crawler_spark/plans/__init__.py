from gh_crawler_spark.plans.inspect import explain_str  # noqa: F401
