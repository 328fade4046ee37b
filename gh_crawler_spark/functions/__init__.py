from gh_crawler_spark.functions.urls import (  # noqa: F401
    canonicalize_url_expr,
    canonicalize_url_py,
    registrable_domain_expr,
    registrable_domain_py,
    url_hash_expr,
)
from gh_crawler_spark.functions.text import (  # noqa: F401
    extract_text_py,
    extract_outlinks_py,
    extract_text_udf,
    extract_outlinks_udf,
)
