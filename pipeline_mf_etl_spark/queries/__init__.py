"""Query registry: every implemented operator from SURVEY.md §2 is exposed
as a named query (spark callable + DuckDB oracle SQL) so the driver's
correctness gate (and our own pytest parity harness) can exercise it."""

from pipeline_mf_etl_spark.queries.registry import QuerySpec, all_queries, query

__all__ = ["QuerySpec", "all_queries", "query"]
