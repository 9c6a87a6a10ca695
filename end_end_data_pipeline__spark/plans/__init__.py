from end_end_data_pipeline__spark.plans.catalog import QUERIES, Query, register  # noqa: F401
