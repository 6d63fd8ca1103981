"""Dashboard shell: auth gate, chart decisions, and the full
question -> SQL -> frame -> summary -> chart -> history pipeline with
a stubbed LLM (reference ``dashboard/app.py`` / ``auth.py:41-48`` /
``components/chat.py:9-25,63-74`` / ``components/sidebar.py:8-65``)."""

from __future__ import annotations

import json

import pytest

from hadoop_data_pipeline_spark.app import (
    Authenticator,
    DashboardService,
    chart_spec,
)
from hadoop_data_pipeline_spark.app.auth import Session
from hadoop_data_pipeline_spark.history import ChatHistory


@pytest.fixture()
def finance_long(spark):
    df = spark.createDataFrame(
        [
            ("all-year-budget", "budget", 2024, "ops", 1000.0),
            ("2024-01", "spent", 2024, "ops", 300.0),
            ("2024-02", "spent", 2024, "ops", 400.0),
            ("2024-01", "remaining", 2024, "ops", 700.0),
            ("2024-02", "remaining", 2024, "ops", -50.0),
            ("all-year-budget", "budget", 2024, "cloud", 500.0),
            ("2024-01", "spent", 2024, "cloud", 100.0),
            ("2024-01", "remaining", 2024, "cloud", 400.0),
            ("all-year-budget", "budget", 2023, "ops", 800.0),
        ],
        "date string, details string, year int, category string, amount double",
    )
    df.createOrReplaceTempView("finance_long")
    return df


def test_auth_gate_and_logout():
    auth = Authenticator({"analyst": "s3cret"})
    session = Session()
    assert not auth.require_auth(session)
    assert not auth.login(session, "analyst", "wrong")
    assert not auth.login(session, "ghost", "s3cret")
    assert not session.authenticated
    assert auth.login(session, "analyst", "s3cret")
    assert auth.require_auth(session) and session.username == "analyst"
    session.messages.append({"role": "user", "content": "hi"})
    Authenticator.logout(session)
    assert not session.authenticated
    assert session.messages == [] and session.current_chat_id is None


def test_chart_spec_decisions():
    # the reference's render_chart decision table (chat.py:9-25)
    assert chart_spec(["only_one"], "bar", "t") is None
    assert chart_spec(["a", "b"], "none", "t") is None
    assert chart_spec(["a", "b"], "scatter", "t") is None
    spec = chart_spec(["month", "amount", "extra"], "line", "trend")
    assert spec == {
        "type": "line", "x": "month", "y": "amount", "title": "trend"
    }
    pie = chart_spec(["category", "amount"], "pie", "share")
    assert pie["x"] == "category" and pie["y"] == "amount"


def _stub_client(sql: str):
    """LLM stub: routes on the system prompt like the real client
    would on intent — SQL for NL->SQL, a word for chart, prose for
    summary."""

    def client(system: str, user: str) -> str:
        low = system.lower()
        if "chart type" in low:
            return "bar"
        if "summarize" in low:
            return f"stub summary over: {user.splitlines()[0][:60]}"
        return sql

    return client


def test_ask_pipeline_end_to_end(spark, finance_long, tmp_path):
    history = ChatHistory(str(tmp_path / "chat.json"), max_entries=3)
    sql = (
        "SELECT category, SUM(amount) AS total_spent FROM finance_long "
        "WHERE details = 'spent' AND year = 2024 "
        "GROUP BY category ORDER BY total_spent DESC"
    )
    svc = DashboardService(
        spark, _stub_client(sql), ["finance_long"], history
    )
    result = svc.ask("how much has each category spent in 2024?")

    assert result.sql == sql
    assert result.columns == ["category", "total_spent"]
    got = {r["category"]: r["total_spent"] for r in result.rows}
    assert got == {"ops": 700.0, "cloud": 100.0}
    assert result.chart_type == "bar"
    assert result.chart == {
        "type": "bar",
        "x": "category",
        "y": "total_spent",
        "title": "how much has each category spent in 2024?",
    }
    assert "stub summary" in result.summary

    # persisted to the capped history store with the render metadata
    entries = history.load()
    assert len(entries) == 1
    assert entries[0]["sql"] == sql and entries[0]["chart_type"] == "bar"
    assert entries[0]["n_rows"] == 2
    # the file is real JSON on disk (reference utils/history.py)
    assert json.loads((tmp_path / "chat.json").read_text())


def test_ask_repair_loop_fixes_bad_sql(spark, finance_long, tmp_path):
    """First SQL fails (bad column); the repair round-trip returns a
    corrected statement — llm_ops.answer_question's L3 loop driven
    through the service."""
    calls = {"n": 0}
    good = (
        "SELECT details, COUNT(*) AS n FROM finance_long GROUP BY details"
    )

    def client(system: str, user: str) -> str:
        low = system.lower()
        if "chart type" in low:
            return "none"
        if "summarize" in low:
            return "fixed"
        calls["n"] += 1
        if calls["n"] == 1:
            return "SELECT no_such_column FROM finance_long"
        assert "failed" in user.lower() or "error" in user.lower()
        return good

    svc = DashboardService(
        spark, client, ["finance_long"],
        ChatHistory(str(tmp_path / "c.json")),
    )
    result = svc.ask("count rows per detail type")
    assert result.sql.strip() == good
    assert result.chart is None  # 'none' renders no chart
    assert {r["details"] for r in result.rows} == {
        "budget", "spent", "remaining"
    }


def test_ask_bounds_collected_rows(spark, tmp_path):
    spark.range(0, 10_000).selectExpr(
        "id", "id % 7 AS grp"
    ).createOrReplaceTempView("wide_table")
    svc = DashboardService(
        spark,
        _stub_client("SELECT id, grp FROM wide_table"),
        ["wide_table"],
        ChatHistory(str(tmp_path / "c.json")),
        max_rows=25,
    )
    result = svc.ask("show everything")
    assert len(result.rows) == 25  # never an unbounded collect


def test_sidebar_data(spark, finance_long, tmp_path):
    svc = DashboardService(
        spark, _stub_client("SELECT 1"), ["finance_long"],
        ChatHistory(str(tmp_path / "c.json")),
    )
    assert svc.available_years("finance_long") == [2024, 2023]
    stats = svc.quick_stats("finance_long", 2024)
    assert stats["total_budget"] == 1500.0
    assert stats["total_spent"] == 800.0
    assert stats["remaining"] == 700.0
    assert stats["pct_used"] == pytest.approx(53.33)
    neg = svc.negative_categories("finance_long", 2024)
    assert neg == [{"category": "ops", "amount": -50.0}]


def test_streamlit_module_is_import_safe():
    # the skin imports without streamlit installed; only `main` needs it
    from hadoop_data_pipeline_spark.app import streamlit_app

    assert callable(streamlit_app.main)


def test_streamlit_demo_service_answers(spark, tmp_path, monkeypatch):
    # the canned demo wiring runs end-to-end on the engine session
    monkeypatch.setenv("HOME", str(tmp_path))
    from hadoop_data_pipeline_spark.app.streamlit_app import build_service

    svc = build_service()
    result = svc.ask("which event types are most common?")
    assert result.columns == ["event_type", "n_events"]
    assert len(result.rows) >= 1
    assert result.chart["type"] == "bar"
