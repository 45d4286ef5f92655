"""ksml-spark: a PySpark-native stream/batch analytics engine with the
query capabilities of cddr/ksml (see SURVEY.md).

Public API (the analog of /root/reference/src/cddr/ksml/core.clj):

* ``ksml(form, spark=...)``  — evaluate a data-as-query form (``ksml*``,
  core.clj:18-23).
* ``vthread(x, *steps)``     — the ``v->`` pipeline combinator
  (core.clj:43-53).
* ``pipe(x, *steps)``        — vthread + ksml in one call.
* ``get_spark()``            — SparkSession with scale-aware defaults.

>>> from ksml_spark import pipe
>>> counts = pipe(
...     ["stream", df, {"key": "key", "time": "event_time"}],
...     ["flat-map-values", ["value-mapper", "split(lower(text), '\\\\W+')"], {"as": "word"}],
...     ["where", "word <> ''"],
...     ["group-by", ["key-value-mapper", {"word": "word"}]],
...     ["count"],
... )
"""

from .errors import ArityError, KsmlError, TypeDispatchError, UnknownOperatorError
from .eval import OPERATORS, Ctx, defop, keval, ksml, pipe, vthread
from .model import (
    BranchedRel,
    GlobalKTableRel,
    GroupedRel,
    KStreamRel,
    KTableRel,
    Rel,
    WindowSpec,
)
from .operators.util import release_pinned
from .session import get_spark

__all__ = [
    "ksml",
    "release_pinned",
    "pipe",
    "vthread",
    "keval",
    "defop",
    "Ctx",
    "OPERATORS",
    "get_spark",
    "Rel",
    "KStreamRel",
    "KTableRel",
    "GlobalKTableRel",
    "GroupedRel",
    "BranchedRel",
    "WindowSpec",
    "KsmlError",
    "UnknownOperatorError",
    "ArityError",
    "TypeDispatchError",
]

__version__ = "0.1.0"
