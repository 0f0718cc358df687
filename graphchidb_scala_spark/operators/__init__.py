"""Operators: frontier traversal, composite graph queries, Pregel compute, ALS."""

from graphchidb_scala_spark.operators.frontier import Frontier
from graphchidb_scala_spark.operators import graph_queries, pregel, skew

__all__ = ["Frontier", "graph_queries", "pregel", "skew"]
