"""Operator registry: importing this package registers every operator
table (the analog of the merged syntax tables at
/root/reference/src/cddr/ksml/eval.clj:230-237)."""

from . import (  # noqa: F401
    consumed,
    dedup,
    grouping,
    joins,
    multimodal,
    relational,
    sampling,
    similarity,
    sinks,
    sources,
    stateful,
    stateless,
    stores,
)
from ..functions import corpus  # noqa: F401  (lm-score / pmi / bpe-pairs / tfidf-topk)
from ..functions import text  # noqa: F401  (tokenize / lang-id / quality ops)
from ..streaming import runtime  # noqa: F401  (with-watermark, latest_by)
from ..streaming import serving  # noqa: F401  (serve / key lookup)
from .. import plans  # noqa: F401  (topology introspection op)
