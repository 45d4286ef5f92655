"""Expression layer: lambda-form wrappers and Column coercion.

The reference wraps user functions in Kafka Streams functional interfaces
without evaluating them (/root/reference/src/cddr/ksml/eval.clj:239-339,
the ``lambda`` table: Predicate, KeyValueMapper, ValueMapper, ValueJoiner,
ForeachAction, Initializer, Aggregator, Reducer, Merger, StreamPartitioner,
Serializer/Deserializer). We keep the same named wrappers, but each one can
carry three kinds of payload:

* a **Python callable over Columns** (symbolic): it is invoked with
  ``pyspark.sql.Column`` arguments and must return Column(s) / dict of named
  Columns. This keeps the expression inside Catalyst (JVM, codegen) — the
  idiomatic fast path.
* a **SQL expression string**: compiled with ``F.expr`` against the operand
  DataFrame's columns. Also fully Catalyst-optimizable.
* an **opaque row-at-a-time Python callable** (``opaque=True``): compiled to
  an Arrow-batched pandas UDF — the compatibility path for black-box lambdas
  (the only thing the reference supports). ~10-100x slower; documented as
  such.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Optional, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .errors import ArityError

ExprLike = Union[Column, str]


def to_col(x: ExprLike) -> Column:
    """Coerce a SQL string or Column to a Column."""
    if isinstance(x, Column):
        return x
    if isinstance(x, str):
        return F.expr(x)
    from .errors import TypeDispatchError

    raise TypeDispatchError(f"cannot coerce {type(x).__name__} to Column")


def named_cols(result: Any, default_name: str) -> dict[str, Column]:
    """Normalize a lambda result into {name: Column}.

    A bare Column/str becomes {default_name: col}; a dict maps names to
    Columns/SQL strings; a list/tuple of 2 for key-value mappers is handled
    by callers.
    """
    if isinstance(result, dict):
        return {k: to_col(v) for k, v in result.items()}
    return {default_name: to_col(result)}


@dataclass
class Lambda:
    """A wrapped user function (reference: eval.clj:239-339).

    ``fn`` is a Column-level callable, SQL string, or (with ``opaque``)
    a plain-Python callable. ``returns`` is the Spark DDL return type for
    opaque fns (required for UDF compilation).
    """

    fn: Any
    opaque: bool = False
    returns: Optional[str] = None

    def __call__(self, *args):
        return self.fn(*args)

    def is_sql(self) -> bool:
        return isinstance(self.fn, str)

    def as_pandas_udf(self):
        """Compile an opaque per-row fn into an Arrow-batched pandas UDF."""
        if not self.opaque:
            raise ValueError("as_pandas_udf only applies to opaque lambdas")
        rtype = self.returns or "string"
        fn = self.fn

        import pandas as pd  # noqa: F401

        @F.pandas_udf(rtype)
        def _udf(*series):
            import pandas as pd

            if len(series) == 1:
                return series[0].map(fn)
            return pd.Series([fn(*vals) for vals in zip(*series)])

        return _udf


class Predicate(Lambda):
    """(k, v) -> bool. Reference: eval.clj:240-243."""


class KeyValueMapper(Lambda):
    """(k, v) -> (k', v'). Reference: eval.clj:245-248."""


class ValueMapper(Lambda):
    """v -> v'. Reference: eval.clj:250-253."""


class ValueJoiner(Lambda):
    """(left_v, right_v) -> out. Reference: eval.clj:255-258."""


class ForeachAction(Lambda):
    """(k, v) -> side effect. Reference: eval.clj:260-263."""


class Initializer(Lambda):
    """() -> initial accumulator. Reference: eval.clj:265-268."""


class Aggregator(Lambda):
    """(k, v, acc) -> acc'. Reference: eval.clj:270-273."""


class Reducer(Lambda):
    """(acc, v) -> acc' (same type). Reference: eval.clj:280-283."""


class Merger(Lambda):
    """(key, agg1, agg2) -> merged (session windows). Reference: eval.clj:275-278."""


class Partitioner(Lambda):
    """(topic, k, v, n) -> partition. Reference: eval.clj:285-288."""


class ProcessorSupplier(Lambda):
    """Stateful per-key processor fn (key, batches, state) -> batches.
    Reference: eval.clj:310-323 (init hook + state store context)."""


class TransformerSupplier(Lambda):
    """1-in -> n-out stateful transform, same contract as
    ProcessorSupplier. Reference: eval.clj:325-338."""


class Serializer(Lambda):
    """value -> bytes. Reference: eval.clj:290-297."""


class Deserializer(Lambda):
    """bytes -> value. Reference: eval.clj:299-308."""


@dataclass
class Serde:
    """A serializer/deserializer pair or a named built-in serde.

    Reference: eval.clj:210-214 ([:serde '(String)] etc.) and
    eval.clj:303-308 (serde-from custom pairs). In Spark, a serde is a pair
    of Column transforms applied at the Kafka edge (binary <-> typed).
    """

    name: Optional[str] = None  # "string" | "long" | "integer" | "double" | "bytes" | "json" | "avro"
    serializer: Optional[Serializer] = None
    deserializer: Optional[Deserializer] = None
    schema: Optional[str] = None  # DDL schema for json/avro decode

    _DECODE = {
        "string": lambda c: c.cast("string"),
        "long": lambda c: c.cast("string").cast("long"),
        "integer": lambda c: c.cast("string").cast("int"),
        "double": lambda c: c.cast("string").cast("double"),
        "bytes": lambda c: c,
    }
    _ENCODE = {
        "string": lambda c: c.cast("string").cast("binary"),
        "long": lambda c: c.cast("string").cast("binary"),
        "integer": lambda c: c.cast("string").cast("binary"),
        "double": lambda c: c.cast("string").cast("binary"),
        "bytes": lambda c: c.cast("binary"),
    }

    def decode(self, col: Column) -> Column:
        """binary Kafka column -> typed Column."""
        if self.name == "json":
            if not self.schema:
                raise ArityError("json serde requires a DDL schema")
            return F.from_json(col.cast("string"), self.schema)
        if self.name == "avro":
            if not self.schema:
                raise ArityError("avro serde requires an Avro JSON schema")
            return self._avro()[0](col, self.schema)
        if self.name in self._DECODE:
            return self._DECODE[self.name](col)
        if self.deserializer is not None:
            if self.deserializer.is_sql():
                raise ArityError("custom deserializer must be a callable")
            return self.deserializer.fn(col)
        raise ArityError(f"unknown serde {self.name!r}")

    @staticmethod
    def _avro():
        """(from_avro, to_avro) — Spark ships the Python wrappers always,
        but the spark-avro JAR is an external module; a missing JAR
        surfaces as a JVM error naming the artifact to add. Probed at
        call time so environments without the JAR still use every other
        serde."""
        try:
            from pyspark.sql.avro.functions import from_avro, to_avro

            return from_avro, to_avro
        except Exception as e:  # pragma: no cover - import always works upstream
            raise ArityError(f"avro serde unavailable: {e}") from e

    def encode(self, col: Column) -> Column:
        """typed Column -> binary Kafka column."""
        if self.name == "json":
            return F.to_json(col).cast("binary")
        if self.name == "avro":
            # pass the declared schema to the WRITER too: inferred writer
            # schemas wrap nullable fields in [null, T] unions whose
            # union-index prefix byte the plain-typed reader schema would
            # then misparse
            to_avro = self._avro()[1]
            if self.schema:
                return to_avro(col, self.schema).cast("binary")
            return to_avro(col).cast("binary")
        if self.name in self._ENCODE:
            return self._ENCODE[self.name](col)
        if self.serializer is not None:
            if self.serializer.is_sql():
                raise ArityError("custom serializer must be a callable")
            return self.serializer.fn(col)
        raise ArityError(f"unknown serde {self.name!r}")


LAMBDA_CLASSES: dict[str, type] = {
    "predicate": Predicate,
    "key-value-mapper": KeyValueMapper,
    "value-mapper": ValueMapper,
    "value-joiner": ValueJoiner,
    "foreach-action": ForeachAction,
    "initializer": Initializer,
    "aggregator": Aggregator,
    "reducer": Reducer,
    "merger": Merger,
    "partitioner": Partitioner,
    "processor-supplier": ProcessorSupplier,
    "transformer-supplier": TransformerSupplier,
    "serializer": Serializer,
    "deserializer": Deserializer,
}
