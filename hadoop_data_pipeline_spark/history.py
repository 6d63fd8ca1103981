"""Chat-history store (SURVEY.md §2.2 K7).

The reference persists dashboard Q&A turns to a JSON file capped at
``MAX_HISTORY=50`` entries (``dashboard/utils/history.py:25-37``).
App-layer state, not engine state — kept for API parity."""

from __future__ import annotations

import json
import os
from typing import Any

MAX_HISTORY = 50


class ChatHistory:
    def __init__(self, path: str, max_entries: int = MAX_HISTORY):
        self.path = path
        self.max_entries = max_entries

    def load(self) -> list[dict[str, Any]]:
        if not os.path.exists(self.path):
            return []
        try:
            with open(self.path, encoding="utf-8") as f:
                data = json.load(f)
            return data if isinstance(data, list) else []
        except (ValueError, OSError):
            return []

    def append(self, entry: dict[str, Any]) -> list[dict[str, Any]]:
        """Append and keep only the newest ``max_entries``."""
        entries = self.load()
        entries.append(entry)
        entries = entries[-self.max_entries :]
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        with open(self.path, "w", encoding="utf-8") as f:
            json.dump(entries, f, ensure_ascii=False, indent=1)
        return entries

    def clear(self) -> None:
        if os.path.exists(self.path):
            os.remove(self.path)
