"""Custom Python Data Source (Spark 4 ``pyspark.sql.datasource`` API):
a partitioned, deterministic synthetic media-shard generator.

This is the ingest end of the multimodal tier
(:mod:`orx_surgical_spark.operators.multimodal`): where a production
pipeline reads media shards from an object store, tests and demos read
``format("orx_media")`` — same schema, same downstream plan. It also
demonstrates the engine's source-extensibility story: a new source is
a reader class, not a fork of the scan operator.

Scale shape: the generator declares one ``InputPartition`` per shard,
so Spark schedules shards across executors exactly like file splits;
each partition yields its rows lazily (no shard ever materializes on
the driver). Determinism comes from per-row md5 arithmetic — no RNG
state, so retries/speculative tasks produce identical rows (the same
property the hash-split encoder relies on).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SOURCE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("shard", IntegerType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)

_MEDIA_TYPES = ("image", "audio", "video")


class _Shard(InputPartition):
    def __init__(self, shard: int, rows_per_shard: int):
        self.shard = shard
        self.rows_per_shard = rows_per_shard


class _MediaReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_shards = int(options.get("shards", 4))
        self.rows_per_shard = int(options.get("rowspershard", 50))

    def partitions(self) -> list[InputPartition]:
        return [_Shard(i, self.rows_per_shard) for i in range(self.n_shards)]

    def read(self, partition: _Shard) -> Iterator[tuple]:
        base = partition.shard * partition.rows_per_shard
        for i in range(partition.rows_per_shard):
            media_id = base + i
            digest = hashlib.md5(f"media:{media_id}".encode()).digest()
            width = 16 + digest[0] % 16 * 8
            height = 16 + digest[1] % 16 * 8
            payload = (digest * ((width * height) // len(digest) + 1))[
                : width * height
            ]
            yield (
                media_id,
                partition.shard,
                _MEDIA_TYPES[media_id % 3],
                payload,
                width,
                height,
            )


class MediaDataSource(DataSource):
    """``spark.read.format("orx_media").option("shards", 8)`` — register
    with :func:`register_media_source` once per session."""

    @classmethod
    def name(cls) -> str:
        return "orx_media"

    def schema(self) -> StructType:
        return MEDIA_SOURCE_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return _MediaReader(self.options)


def register_media_source(spark) -> None:
    spark.dataSource.register(MediaDataSource)
