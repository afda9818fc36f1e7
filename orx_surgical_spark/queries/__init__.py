from orx_surgical_spark.queries.catalog import (  # noqa: F401
    REGISTRY,
    CatalogQuery,
    register,
)
