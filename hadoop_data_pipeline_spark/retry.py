"""Generic retry with exponential backoff (SURVEY.md §2.13 C1).

Behavioral parity with the reference (``jobs/utils/retry.py:20-60``):
``max_retries`` attempts, waiting ``delay * 2**(attempt-1)`` seconds
between failures (5 -> 10 -> 20 s at the defaults), env-tunable via
``ETL_MAX_RETRIES`` / ``ETL_RETRY_DELAY``; the last exception is
re-raised after exhaustion. The sleep function is injectable so tests
assert the backoff schedule without waiting."""

from __future__ import annotations

import os
import time
from collections.abc import Callable
from typing import Any

DEFAULT_MAX_RETRIES = int(os.getenv("ETL_MAX_RETRIES", "3"))
DEFAULT_RETRY_DELAY = int(os.getenv("ETL_RETRY_DELAY", "5"))


def with_retry(
    fn: Callable[..., Any],
    *args: Any,
    label: str = "",
    max_retries: int | None = None,
    delay: int | None = None,
    sleep: Callable[[float], None] = time.sleep,
    on_retry: Callable[[int, Exception], None] | None = None,
    **kwargs: Any,
) -> Any:
    """Run ``fn(*args, **kwargs)``, retrying on any exception."""
    retries = DEFAULT_MAX_RETRIES if max_retries is None else max_retries
    base = DEFAULT_RETRY_DELAY if delay is None else delay
    last_error: Exception | None = None
    for attempt in range(1, retries + 1):
        try:
            return fn(*args, **kwargs)
        except Exception as e:  # noqa: BLE001 - generic by design
            last_error = e
            if attempt < retries:
                wait = base * (2 ** (attempt - 1))
                if on_retry is not None:
                    on_retry(attempt, e)
                sleep(wait)
    assert last_error is not None
    raise last_error
