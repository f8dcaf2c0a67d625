from maggma_spark.api.query_ops import (
    NumericQuery,
    PaginationQuery,
    QueryOperator,
    SortQuery,
    SparseFieldsQuery,
    StringQueryOperator,
    SubmissionQuery,
    execute_store_params,
    merge_queries,
)

__all__ = [
    "QueryOperator",
    "NumericQuery",
    "StringQueryOperator",
    "PaginationQuery",
    "SortQuery",
    "SparseFieldsQuery",
    "SubmissionQuery",
    "merge_queries",
    "execute_store_params",
]
