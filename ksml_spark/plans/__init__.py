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
