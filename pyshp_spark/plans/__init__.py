from pyshp_spark.plans.lineage import LineageCheckpoint, run_with_lineage  # noqa: F401
