"""apollo_spark — a PySpark-native analytics engine with the query semantics of
chainbound/apollo (schema-driven extract -> transform -> filter -> save over EVM
chain data), extended with the relational and LLM-data-pipeline operators a
100 TB training-data platform needs.

Architecture (see SURVEY.md §7):

    schema.hcl --parse--> QuerySpec --compile--> DataFrame pipeline --> sinks

Everything is declared through the DataFrame API so Catalyst handles predicate
pushdown, column pruning, join strategy, and AQE; Python UDFs appear only in
the ABI-decode path (Arrow-batched pandas UDFs).
"""

from apollo_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
