"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference ``Qaizx/hadoop-data-pipeline`` system
(Finance-ITSC data lake: CSV/Excel ingestion -> medallion zones ->
DQ-gated ETL -> atomic partitioned writes -> versioned snapshots ->
SQL serving), re-expressed Spark-first for 100 TB scale.

Everything here builds on the public Apache Spark DataFrame / SQL /
Structured Streaming API — Catalyst plans, Tungsten execution, AQE.
Custom code is limited to what Spark does not provide out of the box:
atomic partition swap, snapshot versioning, the data-quality gate,
SQL-safety guards, and the large-scale training-data operators
(dedup / similarity / text analysis / multimodal plumbing).
"""

__version__ = "0.1.0"

from hadoop_data_pipeline_spark.atomic import (  # noqa: F401
    atomic_write_partition,
    compact_partition,
)
from hadoop_data_pipeline_spark.fs import FS  # noqa: F401
from hadoop_data_pipeline_spark.pipeline import IncrementalPipeline  # noqa: F401
from hadoop_data_pipeline_spark.quality import run_quality_checks  # noqa: F401
from hadoop_data_pipeline_spark.retry import with_retry  # noqa: F401
from hadoop_data_pipeline_spark.session import get_session  # noqa: F401
from hadoop_data_pipeline_spark.versioning import Versioner  # noqa: F401
