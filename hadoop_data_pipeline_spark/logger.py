"""Structured logging (SURVEY.md §2.13 C5).

The reference uses loguru with a colored console sink, a rotating JSON
file (10 MB / 30 d) and a rotating error file (5 MB / 60 d)
(``jobs/logger.py:30-71``). Same shape on the stdlib: key=value
structured extras, JSON-line file sinks with size rotation — no extra
dependency.
"""

from __future__ import annotations

import json
import logging
import logging.handlers
import os
from typing import Any

_CONFIGURED: set[str] = set()


class JsonFormatter(logging.Formatter):
    def format(self, record: logging.LogRecord) -> str:
        out: dict[str, Any] = {
            "ts": self.formatTime(record, "%Y-%m-%dT%H:%M:%S%z"),
            "level": record.levelname,
            "logger": record.name,
            "message": record.getMessage(),
        }
        out.update(getattr(record, "extra_kv", {}))
        if record.exc_info:
            out["exception"] = self.formatException(record.exc_info)
        return json.dumps(out, ensure_ascii=False)


class KVAdapter(logging.LoggerAdapter):
    """``log.info("msg", year=2024, rows=n)`` -> structured extras."""

    def process(self, msg, kwargs):
        reserved = {"exc_info", "stack_info", "stacklevel"}
        kv = {k: v for k, v in kwargs.items() if k not in reserved}
        passthrough = {k: v for k, v in kwargs.items() if k in reserved}
        passthrough["extra"] = {"extra_kv": kv}
        if kv:
            msg = f"{msg} " + " ".join(f"{k}={v}" for k, v in kv.items())
        return msg, passthrough


def get_logger(
    name: str,
    log_dir: str | None = None,
    level: int = logging.INFO,
) -> KVAdapter:
    """Console + (optional) rotating JSON file + rotating error file,
    mirroring the reference's sink layout. ``log_dir`` defaults to
    ``$ETL_LOG_DIR`` (unset -> console only)."""
    logger = logging.getLogger(name)
    if name not in _CONFIGURED:
        logger.setLevel(level)
        console = logging.StreamHandler()
        console.setFormatter(
            logging.Formatter("%(asctime)s | %(levelname)-7s | %(name)s | %(message)s")
        )
        logger.addHandler(console)
        log_dir = log_dir or os.getenv("ETL_LOG_DIR")
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            main = logging.handlers.RotatingFileHandler(
                os.path.join(log_dir, "etl.jsonl"),
                maxBytes=10 * 1024 * 1024,
                backupCount=30,
            )
            main.setFormatter(JsonFormatter())
            logger.addHandler(main)
            err = logging.handlers.RotatingFileHandler(
                os.path.join(log_dir, "etl_errors.jsonl"),
                maxBytes=5 * 1024 * 1024,
                backupCount=60,
            )
            err.setLevel(logging.ERROR)
            err.setFormatter(JsonFormatter())
            logger.addHandler(err)
        _CONFIGURED.add(name)
    return KVAdapter(logger, {})
