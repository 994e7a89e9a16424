from sfs3_kinesis_spark.sources.batch import load_table, load_tables, register_views  # noqa: F401
