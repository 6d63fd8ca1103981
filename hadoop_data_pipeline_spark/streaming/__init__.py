"""Structured Streaming layer (SURVEY.md §2.10).

The reference has no true streaming — its "stream" is a 5-minute
Airflow cron re-running the batch job with ``.done``/``.failed``
marker files for exactly-once (``airflow/dags/hadoop_dag.py:117``,
``jobs/finance_itsc_pipeline.py:32-35``). This package is the
Spark-native upgrade path:

* ``file_pipeline`` — the same incremental CSV flow as
  ``pipeline.IncrementalPipeline`` but as a file-source stream with
  ``Trigger.AvailableNow`` and checkpointed offsets (markers ->
  checkpoint/commit log).
* ``windows`` — tumbling / sliding / session event-time windows with
  watermarks; the SAME functions run on batch DataFrames (oracle-
  checked in the catalog) and streaming DataFrames.
* ``stateful`` — custom per-key state via ``applyInPandasWithState``.
"""
