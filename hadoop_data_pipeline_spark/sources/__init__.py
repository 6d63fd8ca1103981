"""Sources: schema-first readers over the lake zones and the driver
test fixtures (SURVEY.md §2.1 S1-S7)."""

from hadoop_data_pipeline_spark.sources.readers import (  # noqa: F401
    load_table,
    load_tables,
    read_csv,
    read_parquet,
    TESTDATA_TABLES,
)
