from txtlogparser_spark.operators.route import (  # noqa: F401
    survival_prefilter,
    filter_predicate,
    route_tag_column,
)
from txtlogparser_spark.operators.aggregate import (  # noqa: F401
    filter_metrics,
    search_metrics,
)
from txtlogparser_spark.operators.enrich import enrich_with_sources  # noqa: F401
from txtlogparser_spark.operators.windowing import page  # noqa: F401
