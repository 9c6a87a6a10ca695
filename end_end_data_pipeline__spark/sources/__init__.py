from end_end_data_pipeline__spark.sources.lake import load_table, load_star  # noqa: F401
