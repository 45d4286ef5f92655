"""Source connectors: batch files (parquet/csv/json) resolve inline in
``operators.sources``; Kafka builders live in ``kafka``."""

from . import kafka  # noqa: F401
