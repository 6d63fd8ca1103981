"""Dashboard application shell (SURVEY.md §3.2, reference
``dashboard/``): the render-decision and wiring layer over the engine's
serving queries (`serving.py`), NL->SQL loop (`llm_ops.py` + `guards.py`)
and capped history (`history.py`).

Split the way the reference should have been: everything DECIDABLE
(auth check, chart choice, the ask pipeline, sidebar numbers) lives in
framework-free modules with tests; the Streamlit composition
(`streamlit_app.py`) is a thin declarative skin gated behind an
import-try, since the render host is interchangeable app chrome."""

from hadoop_data_pipeline_spark.app.auth import Authenticator
from hadoop_data_pipeline_spark.app.charts import chart_spec
from hadoop_data_pipeline_spark.app.service import AskResult, DashboardService

__all__ = ["Authenticator", "chart_spec", "DashboardService", "AskResult"]
