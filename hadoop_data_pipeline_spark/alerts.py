"""Alerting (SURVEY.md §2.13 C4).

The reference sends SMTP mail with the DQ report on fatal failures
(``jobs/utils/alerts.py:11-40``). Here the transport is injectable: a
callable ``(subject, body, recipients) -> None``. ``smtp_transport``
builds the real SMTP sender (stdlib smtplib, lazily imported);
tests — and deployments that alert via anything else — pass their own
callable. The pipeline wires ``Alerter.send`` as its ``alert`` hook.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Sequence

Transport = Callable[[str, str, Sequence[str]], None]


def smtp_transport(
    host: str | None = None,
    port: int | None = None,
    sender: str | None = None,
    user: str | None = None,
    password: str | None = None,
    use_tls: bool = True,
) -> Transport:
    """Real SMTP transport; settings default to the reference's env
    variables (SMTP_HOST/SMTP_PORT/ALERT_FROM/SMTP_USER/SMTP_PASSWORD)."""
    host = host or os.getenv("SMTP_HOST", "localhost")
    port = port or int(os.getenv("SMTP_PORT", "587"))
    sender = sender or os.getenv("ALERT_FROM", "etl-alerts@localhost")
    user = user or os.getenv("SMTP_USER")
    password = password or os.getenv("SMTP_PASSWORD")

    def send(subject: str, body: str, recipients: Sequence[str]) -> None:
        import smtplib
        from email.mime.text import MIMEText

        msg = MIMEText(body, "plain", "utf-8")
        msg["Subject"] = subject
        msg["From"] = sender
        msg["To"] = ", ".join(recipients)
        with smtplib.SMTP(host, port) as smtp:
            if use_tls:
                smtp.starttls()
            if user and password:
                smtp.login(user, password)
            smtp.sendmail(sender, list(recipients), msg.as_string())

    return send


class Alerter:
    """DQ / pipeline alert fan-out over an injectable transport."""

    def __init__(
        self,
        recipients: Sequence[str],
        transport: Transport | None = None,
        subject_prefix: str = "[ETL]",
    ):
        self.recipients = list(recipients)
        self.transport = transport or smtp_transport()
        self.subject_prefix = subject_prefix

    def send(self, subject: str, body: str) -> None:
        self.transport(
            f"{self.subject_prefix} {subject}", body, self.recipients
        )

    def send_dq_report(self, filepath: str, report_text: str) -> None:
        """The reference's DQ-failure mail shape."""
        self.send(f"Data quality failed: {filepath}", report_text)
