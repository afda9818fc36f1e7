"""Distributed evaluation functions: metrics (SURVEY §2-G) and the EDA
profile report (G11)."""

from orx_surgical_spark.functions import metrics, profile  # noqa: F401

__all__ = ["metrics", "profile"]
