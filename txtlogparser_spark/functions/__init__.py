from txtlogparser_spark.functions.spans import (  # noqa: F401
    SPAN_TYPE,
    SPAN_FIELDS,
    make_span_extractor,
    extract_line_spans,
)
from txtlogparser_spark.functions.detokenize import (  # noqa: F401
    make_detokenizer,
    detokenize_expr,
)
