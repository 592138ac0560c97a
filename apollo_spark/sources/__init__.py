"""Data sources: landed-table catalog, EVM log/event source, method-call source.

The scale posture (SURVEY §2.1): chain data is *landed* into partitioned
parquet/Delta tables (logs, blocks, balances, token_metadata, method results)
by an ingest job; queries then run against the lake with full Catalyst
pushdown. Live-RPC fetch exists for the streaming/ingest path with an
injectable client so tests run offline (SURVEY §7 hard part #2).
"""

from apollo_spark.sources.tables import Catalog
from apollo_spark.sources.logs import decoded_event_source
from apollo_spark.sources.calls import method_call_source

__all__ = ["Catalog", "decoded_event_source", "method_call_source"]
