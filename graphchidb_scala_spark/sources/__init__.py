"""Sources: parquet/CSV edge-list readers and the TPC-H-ish graph view."""

from graphchidb_scala_spark.sources.tpch import (
    GRAPH_SQL_CTES,
    ORDER_OFFSET,
    PART_OFFSET,
    SUPP_OFFSET,
    load_tables,
    tpch_graph,
)
from graphchidb_scala_spark.sources.edgelist import read_edge_list
from graphchidb_scala_spark.sources.bucketed import load_bucketed, save_bucketed
from graphchidb_scala_spark.sources.jsonl import read_documents_jsonl, write_documents_jsonl

__all__ = [
    "GRAPH_SQL_CTES",
    "ORDER_OFFSET",
    "PART_OFFSET",
    "SUPP_OFFSET",
    "load_tables",
    "tpch_graph",
    "read_edge_list",
    "save_bucketed",
    "load_bucketed",
    "read_documents_jsonl",
    "write_documents_jsonl",
]
