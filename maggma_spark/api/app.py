"""Optional FastAPI glue: a read-only resource per store.

Reference parity: ReadOnlyResource route generation (reference:src/
maggma/api/resource/read_resource.py:195-297) — each QueryOperator's
params become request query params; results serve from the cached
DataFrame with `Meta(total_doc=...)`.

fastapi is OPTIONAL (not installed in this environment): importing this
module without it raises ImportError with a clear message; everything
testable lives in query_ops (pure functions) and `serve_query` below
(framework-free request handling).
"""

from __future__ import annotations

from typing import Any

from maggma_spark.api.query_ops import (
    QueryOperator,
    execute_store_params,
    merge_queries,
)


def serve_query(store, operators: list[QueryOperator], request_params: dict,
                max_rows: int = 10_000) -> dict:
    """Framework-free request handler: merge operator fragments, run the
    DataFrame chain, return a JSON-shaped response dict. This is what a
    FastAPI route delegates to."""
    fragments = [op.query(**request_params) for op in operators]
    params = merge_queries(fragments)
    df, meta = execute_store_params(store, params, with_meta=True)
    for op in operators:  # post-hoc DataFrame transforms before serving
        df = op.post_process(df, params)
    limit = params.get("limit") or max_rows
    rows = [r.asDict(recursive=True) for r in df.limit(min(limit, max_rows)).collect()]
    return {"data": rows, "meta": meta}


def build_app(resources: dict[str, tuple[Any, list[QueryOperator]]]):
    """FastAPI application builder: {route_prefix: (store, operators)}."""
    try:
        from fastapi import FastAPI, Request
    except ImportError as exc:  # pragma: no cover
        raise ImportError(
            "fastapi is not installed; use serve_query() directly or add "
            "fastapi to the environment") from exc

    app = FastAPI(title="maggma_spark API")

    for prefix, (store, operators) in resources.items():
        def make_route(store=store, operators=operators):
            async def route(request: Request):
                params = dict(request.query_params)
                return serve_query(store, operators, params)

            return route

        app.get(f"/{prefix}/")(make_route())
    return app
