from orx_surgical_spark.sources.readers import (  # noqa: F401
    load_table,
    load_tables,
    read_csv,
    read_parquet,
    write_parquet,
)
