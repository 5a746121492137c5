"""duckpgq_extension_spark — a PySpark-native property-graph analytics
engine with the query surface of cwida/duckpgq-extension (SQL/PGQ pattern
matching, path finding, graph algorithms) plus large-scale data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns).

Everything compiles to DataFrame plans executed by Catalyst/Tungsten;
iterative kernels (BFS, PageRank, WCC) are driver-orchestrated DataFrame
loops with lineage checkpointing — no RDDs, no JVM-side extensions.
"""

from .api import PGQSession
from .catalog import GraphCatalog, PropertyGraph, PropertyGraphTable
from .errors import (
    PGQBinderError,
    PGQConstraintError,
    PGQError,
    PGQNotImplementedError,
    PGQParseError,
)
from .operators.paths import clear_prep_cache
from .session import get_spark

__all__ = [
    "clear_prep_cache",
    "PGQSession",
    "GraphCatalog",
    "PropertyGraph",
    "PropertyGraphTable",
    "PGQError",
    "PGQParseError",
    "PGQBinderError",
    "PGQConstraintError",
    "PGQNotImplementedError",
    "get_spark",
]

__version__ = "0.1.0"
