"""Operator registry: importing this package registers every operator
table (the analog of the merged syntax tables at
/root/reference/src/cddr/ksml/eval.clj:230-237)."""

from . import (  # noqa: F401
    consumed,
    grouping,
    joins,
    relational,
    sinks,
    sources,
    stateless,
    stores,
)
