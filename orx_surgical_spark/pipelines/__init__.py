"""End-to-end pipelines: the reference's entry points re-expressed as
lazy DataFrame plans (SURVEY §3)."""

from orx_surgical_spark.pipelines.cms import (
    arthritis_cohort,
    clean_crosswalk,
    get_aov,
    get_mhe,
    load_cms_tables,
    mhe_samples,
    occurrence_columns,
    remap_and_label,
)

__all__ = [
    "arthritis_cohort",
    "clean_crosswalk",
    "get_aov",
    "get_mhe",
    "load_cms_tables",
    "mhe_samples",
    "occurrence_columns",
    "remap_and_label",
]
