"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference ``vgvoleg/ydb-vector-search-simple-api``
(vector top-k search over a 5-column store), extended with
large-scale LLM-data-pipeline operators (dedup, similarity join,
text analysis, multimodal plumbing).

Design: DataFrame-first. Every parity operator (SURVEY.md §2 O1-O18)
is expressed as a declarative Spark plan so Catalyst handles pushdown,
pruning and top-k physical strategy (``TakeOrderedAndProject``);
Python/pandas UDFs appear only where built-ins cannot express the
semantics (multimodal decode stubs, wire-codec bulk import).
"""

from .config import (
    ColumnMap,
    SearchConfig,
    STRATEGIES,
    sort_descending,
)
from .functions.distance import (
    cosine_similarity,
    cosine_distance,
    inner_product_similarity,
    euclidean_distance,
    manhattan_distance,
    score_expr,
    vector_lit,
)
from .functions.codec import vector_to_bytes, bytes_to_vector
from .operators.search import exact_search, knn_join, load_store
from .operators.index import IvfIndex, build_ivf_index, ivf_search

__all__ = [
    "ColumnMap",
    "SearchConfig",
    "STRATEGIES",
    "sort_descending",
    "cosine_similarity",
    "cosine_distance",
    "inner_product_similarity",
    "euclidean_distance",
    "manhattan_distance",
    "score_expr",
    "vector_lit",
    "vector_to_bytes",
    "bytes_to_vector",
    "exact_search",
    "knn_join",
    "load_store",
    "IvfIndex",
    "build_ivf_index",
    "ivf_search",
]
