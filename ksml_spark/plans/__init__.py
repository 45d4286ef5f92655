"""Plan inspection utilities.

The engine's IR *is* the Catalyst logical plan (SURVEY.md §3): there is no
separate plan layer to inspect. This package exposes the introspection
helpers used to audit physical plans for the 100 TB properties —
pushdown, pruning, broadcast joins, partial aggregation
(tests/test_plans.py asserts them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..model import Rel


def explain_str(df_or_rel, mode: str = "formatted") -> str:
    """The .explain() output as a string (PySpark only prints it)."""
    df: DataFrame = df_or_rel.df if isinstance(df_or_rel, Rel) else df_or_rel
    jmode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(jmode)


def scan_summary(df_or_rel) -> dict:
    """Pushdown/pruning audit: pushed filters and read schemas per scan."""
    import re

    p = explain_str(df_or_rel, "formatted")
    return {
        "pushed_filters": re.findall(r"PushedFilters: \[([^\]]*)\]", p),
        "read_schemas": re.findall(r"ReadSchema: (\S+)", p),
        "broadcast_joins": p.count("BroadcastHashJoin"),
        "exchanges": p.count("Exchange hashpartitioning"),
    }


def topology(rel) -> dict:
    """DSL-level topology introspection — reference parity with
    ``.sourceTopicPattern`` / Topology#describe (eval_test.clj:56-65):
    which sources feed this query, plus the physical scan audit.

    ``sources`` is the evaluation-time source registry ksml() attaches to
    its result (one entry per [:stream]/[:table]/[:global-table] source,
    including sources of pre-built Rel operands merged through joins);
    ``source_topic_pattern`` joins the Kafka topics/patterns, the analog
    of sourceTopicPattern; scan fields come from the Catalyst plan (the
    DSL has no separate topology object to describe — SURVEY.md §3)."""
    srcs = list(getattr(rel, "topology_sources", []))
    topics = sorted({t for s in srcs if s.get("type") == "kafka" for t in s.get("topics", [])})
    out = {
        "sources": srcs,
        "source_topic_pattern": "|".join(topics) if topics else None,
    }
    df = rel.df if isinstance(rel, Rel) else rel
    if not df.isStreaming:  # explain of streaming plans needs a query start
        out.update(scan_summary(df))
    return out


def _register_op() -> None:
    from ..eval import Ctx, defop

    @defop("topology")
    def op_topology(ctx: Ctx, rel, *rest) -> dict:
        """["topology", rel] — source registry + scan audit as a dict."""
        if not getattr(rel, "topology_sources", None) and ctx.sources:
            rel.topology_sources = list(ctx.sources)
        return topology(rel)


_register_op()
