"""The ksml-spark evaluator: queries are data.

Mirrors the reference's 3-way structural dispatch
(/root/reference/src/cddr/ksml/eval.clj:382-395):

* **self-evaluating** forms pass through unchanged (eval.clj:367-376):
  strings, numbers, DataFrames, Columns, Rel wrappers, dicts, callables...
* **lambda** forms ``["predicate", f]`` wrap the user function in a typed
  wrapper *without evaluating it* (eval.clj:386-389, table eval.clj:239-339).
* **application** forms ``["op", arg...]`` recursively evaluate their
  arguments, then apply the operator's expansion rule (eval.clj:390-393).
  Unknown keyword-headed forms throw (eval.clj:395).

Where the reference expands to quoted Clojure/Java-interop code and later
``eval``s it against a StreamsBuilder, we apply PySpark DataFrame builders
directly: **the IR is the Catalyst logical plan** (SURVEY.md §3).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Optional

from pyspark.sql import SparkSession

from .errors import ArityError, KsmlError, UnknownOperatorError
from .exprs import LAMBDA_CLASSES, Lambda

# operator registry: name -> fn(ctx, *evaled_args)
OPERATORS: dict[str, Callable] = {}

# signature cache for the arity check in keval (built lazily: decorators
# like functools.wraps can postdate defop registration)
_SIGNATURES: dict[str, Any] = {}

# ops whose rule EXECUTES user code or driver-side actions during
# expansion (batch foreach/peek run the callback eagerly; kmeans-centroids
# runs a driver-side Lloyd loop) — a ValueError escaping these is most
# likely the user's callback or their data, not a malformed form, so keval
# must NOT relabel it as a DSL ArityError named after the op
_NO_VALUEERROR_RETYPE: set[str] = set()


def defop(*names: str, retype_value_errors: bool = True):
    """Register an operator expansion rule (the Python analog of the syntax
    tables merged at /root/reference/src/cddr/ksml/eval.clj:230-237).

    ``retype_value_errors=False`` opts the rule out of keval's
    ValueError->ArityError curation — required for rules that execute user
    callbacks or driver-side actions eagerly."""

    def register(fn: Callable) -> Callable:
        for n in names:
            OPERATORS[n] = fn
            # a re-registration (plugin/test override) may change the
            # signature — drop the stale cache entry so keval's arity
            # check binds against the new rule
            _SIGNATURES.pop(n, None)
            if retype_value_errors:
                _NO_VALUEERROR_RETYPE.discard(n)
            else:
                _NO_VALUEERROR_RETYPE.add(n)
        return fn

    return register


@dataclass
class Ctx:
    """Evaluation context — the analog of the dynamic ``*builder*`` binding
    (/root/reference/src/cddr/ksml/eval.clj:42, core.clj:20-23).

    ``sources`` accumulates one entry per source op evaluated under this
    context (the analog of the Topology's source-node registry) — the
    basis of the DSL-level topology introspection (plans.topology)."""

    spark: SparkSession
    sources: list = None

    def __post_init__(self):
        if self.sources is None:
            self.sources = []


def _normalize_op(head: str) -> str:
    """':flat-map-values' / 'flat_map_values' -> 'flat-map-values'."""
    return head.lstrip(":").replace("_", "-").rstrip("!").lower()


def _is_form(x: Any) -> bool:
    return isinstance(x, (list, tuple)) and len(x) > 0 and isinstance(x[0], str)


def _lambda_form(x: Any) -> Optional[str]:
    if _is_form(x):
        op = _normalize_op(x[0])
        if op in LAMBDA_CLASSES:
            return op
    return None


def keval(form: Any, ctx: Ctx) -> Any:
    """Evaluate one ksml form. See module docstring for the dispatch."""
    # lambda forms: wrap the user fn without evaluating it (eval.clj:386-389)
    lam = _lambda_form(form)
    if lam is not None:
        cls = LAMBDA_CLASSES[lam]
        fn = form[1]
        kw = {}
        # optional trailing modifiers: "py" marks an opaque per-row fn,
        # a DDL type string sets its return type. e.g.
        # ["value-mapper", f, "py", "double"]
        rest = list(form[2:])
        if "py" in rest:
            kw["opaque"] = True
            rest.remove("py")
        if rest:
            kw["returns"] = rest[0]
        if isinstance(fn, Lambda):  # already wrapped
            return fn
        return cls(fn, **kw)

    # application forms (eval.clj:390-393)
    if _is_form(form):
        op = _normalize_op(form[0])
        rule = OPERATORS.get(op)
        if rule is None:
            if form[0].startswith(":"):
                raise UnknownOperatorError(form[0], form)
            # a plain list of strings (data, not an op application)
            return list(form)
        args = [keval(a, ctx) for a in form[1:]]
        # a pre-built Rel operand (from an earlier ksml() call) carries
        # its own source registry — merge it so topology introspection
        # survives ANY operator, not just source loads
        for a in args:
            for s in getattr(a, "topology_sources", []):
                if s not in ctx.sources:
                    ctx.sources.append(s)
        # arity check BEFORE the call: a form with too few / too many
        # operands is a DSL usage error and must surface as the curated
        # ArityError, not the rule function's raw TypeError
        sig = _SIGNATURES.get(op)
        if sig is None:
            import inspect

            sig = _SIGNATURES[op] = inspect.signature(rule)
        try:
            sig.bind(ctx, *args)
        except TypeError as e:
            raise ArityError(f"{op}: {e}") from None
        try:
            return rule(ctx, *args)
        except KsmlError:
            raise
        except ValueError as e:
            # a construction-time ValueError is an option-parsing
            # complaint ("invalid literal for int() ...") — surface it
            # curated and NAMED; ArityError is-a ValueError, so callers
            # catching the stdlib type see no difference.  Rules that
            # execute user code/actions eagerly are opted out: there the
            # ValueError belongs to the user's callback or data, and
            # renaming it after the op would misdirect debugging.
            if op in _NO_VALUEERROR_RETYPE:
                raise
            raise ArityError(f"{op}: {e}") from e

    if isinstance(form, (list, tuple)):
        return [keval(x, ctx) for x in form]

    # self-evaluating (eval.clj:367-376)
    return form


def vthread(first: Any, *forms) -> Any:
    """The ``v->`` pipeline combinator
    (/root/reference/src/cddr/ksml/core.clj:43-53): thread the previous
    expression in as each successive vector's FIRST argument.

    ``vthread(x, ["filter", p], ["count"])`` == ``["count", ["filter", x, p]]``
    """
    acc = first
    for f in forms:
        if not isinstance(f, (list, tuple)):
            raise ArityError(f"v-> steps must be vectors, got {type(f).__name__}")
        acc = [f[0], acc, *f[1:]]
    return acc


def ksml(form: Any, spark: Optional[SparkSession] = None) -> Any:
    """Public entry point (analog of ``ksml*``,
    /root/reference/src/cddr/ksml/core.clj:18-23): evaluate a ksml form into
    a Rel / DataFrame / value. Importing ``ksml_spark`` registers all
    operator tables."""
    from . import operators  # noqa: F401  (registers OPERATORS)

    if spark is None:
        spark = SparkSession.getActiveSession()
        if spark is None:
            raise ValueError("no active SparkSession; pass spark=...")
    ctx = Ctx(spark)
    out = keval(form, ctx)
    # attach the source registry to the result so plans.topology can
    # answer "which sources feed this query" without re-evaluating
    if hasattr(out, "__dict__") and ctx.sources:
        out.topology_sources = list(ctx.sources)
    return out


def pipe(first: Any, *forms, spark: Optional[SparkSession] = None) -> Any:
    """``ksml(vthread(...))`` — build the threaded form, then evaluate."""
    return ksml(vthread(first, *forms), spark=spark)
