"""The dashboard's question pipeline and sidebar data, wired end to
end (reference ``dashboard/services/hive_gpt.py`` +
``components/chat.py:63-74`` + ``components/sidebar.py:8-65``).

One service object owns the flow the reference spreads over three
modules: question -> NL->SQL (guarded, with the execute-repair loop)
-> bounded result -> summary -> chart decision -> capped history
entry. The LLM stays an injected callable (``llm_ops.LLMClient``), the
SparkSession is the engine's, and every result is BOUNDED before it
leaves the JVM (`max_rows`) — a dashboard must never collect an
unbounded frame.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession

from hadoop_data_pipeline_spark import llm_ops, serving
from hadoop_data_pipeline_spark.app.charts import chart_spec
from hadoop_data_pipeline_spark.history import ChatHistory


@dataclass
class AskResult:
    """What one answered question carries to the renderer and into
    history (reference chat.py's ``result`` dict)."""

    question: str
    sql: str
    rows: list[dict]
    columns: list[str]
    summary: str
    chart_type: str
    chart: dict | None


class DashboardService:
    """Controller over the engine for a chat-with-your-data app.

    Parameters
    ----------
    spark: the engine session (tables must be registered in its
        catalog — the reference points PyHive at HiveServer2; here the
        serving tables are temp views or catalog tables).
    client: ``(system, user) -> str`` LLM callable.
    tables: catalog tables the NL->SQL prompt may use.
    history: capped JSON store (reference MAX_HISTORY=50).
    max_rows: hard cap on rows collected per answer.
    """

    def __init__(
        self,
        spark: SparkSession,
        client: llm_ops.LLMClient,
        tables: list[str],
        history: ChatHistory,
        max_rows: int = 500,
    ):
        self.spark = spark
        self.client = client
        self.tables = tables
        self.history = history
        self.max_rows = max_rows

    # -- chat flow (reference chat.py process_question) ---------------

    def ask(self, question: str, year_context: str = "") -> AskResult:
        """question -> guarded SQL -> bounded frame -> summary ->
        chart decision, persisted to capped history. Raises if the
        repair loop exhausts its attempts (the host renders the error
        bubble, reference chat.py:108-114)."""
        df, sql = llm_ops.answer_question(
            self.spark, self.client, question, self.tables, year_context
        )
        # Persist the bounded frame: summarize_result re-reads it
        # (limit(50)), and without the cache that is a SECOND full
        # execution of arbitrary question SQL whose LIMIT (no ORDER
        # BY) could return different rows than the table we render.
        bounded = df.limit(self.max_rows).persist()
        try:
            rows = [r.asDict(recursive=True) for r in bounded.collect()]
            columns = bounded.columns
            summary = llm_ops.summarize_result(
                self.client, question, bounded
            )
            chart_type = llm_ops.suggest_chart(
                self.client, question, bounded, len(rows)
            )
        finally:
            bounded.unpersist()
        spec = chart_spec(columns, chart_type, question)
        result = AskResult(
            question=question,
            sql=sql,
            rows=rows,
            columns=columns,
            summary=summary,
            chart_type=chart_type,
            chart=spec,
        )
        self.history.append(
            {
                "question": question,
                "sql": sql,
                "summary": summary,
                "chart_type": chart_type,
                "n_rows": len(rows),
            }
        )
        return result

    # -- sidebar data (reference sidebar.py cached loaders) -----------

    def available_years(self, long_table: str) -> list[int]:
        """Reference ``load_available_years`` — bounded collect of the
        distinct-years serving query."""
        df = serving.available_years(self.spark.table(long_table))
        return [r["year"] for r in df.collect()]

    def quick_stats(self, long_table: str, year: int) -> dict:
        """Reference ``load_quick_stats`` in ONE aggregate pass
        (serving.quick_stats) instead of two round-trips."""
        (row,) = serving.quick_stats(
            self.spark.table(long_table), year
        ).collect()
        return row.asDict()

    def negative_categories(self, long_table: str, year: int) -> list[dict]:
        """Reference ``load_negative_categories`` via the window form
        of latest-per-group (one shuffle, no self-join)."""
        df = serving.negative_latest_categories(
            self.spark.table(long_table), year
        )
        return [r.asDict() for r in df.collect()]
