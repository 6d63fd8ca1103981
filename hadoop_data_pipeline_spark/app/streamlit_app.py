"""Streamlit skin over the dashboard service (reference
``dashboard/app.py`` + ``components/chat.py:77-139`` +
``components/sidebar.py:68-177``).

Run with::

    streamlit run hadoop_data_pipeline_spark/app/streamlit_app.py

Everything decidable lives in `service.py` / `auth.py` / `charts.py`
(tested without a UI); this file is only the Streamlit composition —
session-state plumbing, widgets, and where each artifact renders. It
imports streamlit lazily so the engine package never requires it
(streamlit is not installed in the test container; the module is
import-safe and the ``main`` body is exercised only under a real
``streamlit run``).
"""

from __future__ import annotations

import os


def build_service():
    """Wire the engine pieces the way the reference's config.py does:
    session, demo long table, stub-able LLM client, capped history."""
    from hadoop_data_pipeline_spark.app.service import DashboardService
    from hadoop_data_pipeline_spark.history import ChatHistory
    from hadoop_data_pipeline_spark.session import get_session

    spark = get_session("dashboard")
    # Demo data: the events fixture reshaped as a serving table; a real
    # deployment points this at its curated serving views instead.
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    from hadoop_data_pipeline_spark.sources.readers import load_table

    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")

    def echo_client(system: str, user: str) -> str:
        """Placeholder LLM: answers every question with a canned SQL /
        summary — swap in a real client callable in production."""
        if "chart type" in system.lower():
            return "bar"
        if "summarize" in system.lower():
            return "See the table above."
        return (
            "SELECT event_type, COUNT(*) AS n_events "
            "FROM events GROUP BY event_type ORDER BY n_events DESC"
        )

    history = ChatHistory(os.path.expanduser("~/.spark_graft_chat.json"))
    return DashboardService(spark, echo_client, ["events"], history)


def main() -> None:  # pragma: no cover - requires `streamlit run`
    import pandas as pd
    import streamlit as st

    from hadoop_data_pipeline_spark.app.auth import Authenticator, Session
    from hadoop_data_pipeline_spark.app.charts import render_plotly

    st.set_page_config(page_title="Engine Dashboard", layout="wide")

    if "session" not in st.session_state:
        st.session_state.session = Session()
    session: Session = st.session_state.session

    # Fail CLOSED on missing credentials: a default admin/admin pair
    # would expose arbitrary-SQL execution behind a well-known login
    # the moment someone deploys without setting the env vars (the
    # reference ships .env.example defaults; we refuse instead).
    user = os.environ.get("DASH_USER")
    password_conf = os.environ.get("DASH_PASSWORD")
    if not user or not password_conf:
        st.error(
            "DASH_USER / DASH_PASSWORD are not configured; "
            "refusing to start with default credentials."
        )
        st.stop()
    auth = Authenticator({user: password_conf})

    if not auth.require_auth(session):
        st.title("Engine Dashboard")
        with st.form("login_form"):
            username = st.text_input("Username")
            password = st.text_input("Password", type="password")
            if st.form_submit_button("Log in"):
                if auth.login(session, username, password):
                    st.rerun()
                else:
                    st.error("Invalid credentials")
        st.stop()

    if "service" not in st.session_state:
        st.session_state.service = build_service()
    svc = st.session_state.service

    with st.sidebar:
        st.markdown(f"**{session.username}**")
        if st.button("Log out"):
            auth.logout(session)
            st.rerun()
        st.header("History")
        for item in reversed(svc.history.load()):
            st.caption(f"{item['question'][:40]} -> {item['chart_type']}")
        if st.button("Clear history"):
            svc.history.clear()
            st.rerun()

    st.title("Engine Dashboard")
    for msg in session.messages:
        with st.chat_message(msg["role"]):
            st.markdown(msg["content"])

    if question := st.chat_input("Ask about your data..."):
        session.messages.append({"role": "user", "content": question})
        with st.chat_message("user"):
            st.markdown(question)
        with st.chat_message("assistant"):
            try:
                result = svc.ask(question)
            except Exception as exc:  # noqa: BLE001 - error bubble
                st.error(f"Query failed: {exc}")
            else:
                with st.expander("SQL", expanded=False):
                    st.code(result.sql, language="sql")
                df = pd.DataFrame(result.rows, columns=result.columns)
                if len(df):
                    st.dataframe(df, use_container_width=True)
                    chart = render_plotly(df, result.chart)
                    if chart is not None:
                        st.plotly_chart(chart, use_container_width=True)
                st.markdown(f"**Summary:** {result.summary}")
                session.messages.append(
                    {"role": "assistant", "content": result.summary}
                )


if __name__ == "__main__":  # pragma: no cover
    main()
