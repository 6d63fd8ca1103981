"""Excel workbook ingestion (SURVEY.md §2.1 S6/S7, §2.3 P13/P14).

The reference ingests Thai budget workbooks with merged cells and
4-row multi-level headers (``gpt_excel_fix_column.py:79-126``). This
module reproduces that normalization as PURE functions over a neutral
grid representation (list-of-lists + merged ranges), so the logic is
fully testable without Excel libraries; a thin openpyxl adapter
(gated behind an import-try — the codec is optional) produces the
grid from a real ``.xlsx``.

Ingestion is a driver-side pre-ETL step on small workbook files
(10^2-10^3 rows); the output DataFrame enters the distributed path
via ``spark.createDataFrame``. Nothing here ever runs per-row at
scale.
"""

from __future__ import annotations

import re
from collections.abc import Sequence
from typing import Any

Grid = list[list[Any]]
#: Merged range as 1-based inclusive (min_row, min_col, max_row, max_col).
MergedRange = tuple[int, int, int, int]

#: Thai budget-row type labels -> engine domain (reference
#: ``gpt_excel_fix_column.py:199-204``).
TYPE_MAP = {
    "ยอดงบประมาณ": "budget",
    "ยอดใช้ไป": "spent",
    "ยอดคงเหลือ": "remaining",
}

#: Thai month abbreviations in fiscal order Oct -> Sep (reference
#: ``gpt_excel_fix_column.py:190-196``; SURVEY.md §1.3). The fiscal
#: year YY (Buddhist, 2-digit) starts in October of Gregorian
#: (YY + 2500 - 543 - 1) and ends in September of the next year.
THAI_MONTHS_FISCAL = [
    ("ตค", 10), ("พย", 11), ("ธค", 12),
    ("มค", 1), ("กพ", 2), ("มีค", 3),
    ("เมย", 4), ("พค", 5), ("มิย", 6),
    ("กค", 7), ("สค", 8), ("กย", 9),
]
_THAI_MONTH_NO = dict(THAI_MONTHS_FISCAL)


def thai_month_to_iso(value: str) -> str | None:
    """``'มค67'`` -> ``'2024-01'``: Thai month abbreviation + 2-digit
    Buddhist fiscal year. Months Oct-Dec belong to the *previous*
    Gregorian year (Thai fiscal year runs Oct-Sep). Returns None when
    the value is not a Thai month key."""
    m = re.fullmatch(r"([ก-ฮี่ื]+)\s*(\d{2})", str(value).strip())
    if not m or m.group(1) not in _THAI_MONTH_NO:
        return None
    month = _THAI_MONTH_NO[m.group(1)]
    gregorian = int(m.group(2)) + 2500 - 543  # Buddhist -> Gregorian
    if month >= 10:
        gregorian -= 1
    return f"{gregorian:04d}-{month:02d}"


def fill_merged_cells(grid: Grid, merged: Sequence[MergedRange]) -> Grid:
    """Propagate each merged range's top-left value to every covered
    cell (reference ``gpt_excel_fix_column.py:83-99``)."""
    out = [list(row) for row in grid]
    for min_r, min_c, max_r, max_c in merged:
        top_left = grid[min_r - 1][min_c - 1]
        for r in range(min_r - 1, max_r):
            for c in range(min_c - 1, max_c):
                if r < len(out) and c < len(out[r]):
                    out[r][c] = top_left
    return out


def flatten_headers(header_rows: Grid) -> list[str]:
    """Combine N header rows into one name per column: non-empty parts
    joined with ``_`` (consecutive duplicates collapsed), empty columns
    named ``col_{idx}``, repeats uniquified with ``_N``."""
    n_cols = max((len(r) for r in header_rows), default=0)
    combined = []
    for c in range(n_cols):
        parts: list[str] = []
        for row in header_rows:
            if c < len(row) and row[c] is not None:
                val = str(row[c]).strip().replace("\n", " ")
                if val and val not in parts:
                    parts.append(val)
        combined.append("_".join(parts) if parts else f"col_{c}")
    seen: dict[str, int] = {}
    unique = []
    for h in combined:
        if h in seen:
            seen[h] += 1
            unique.append(f"{h}_{seen[h]}")
        else:
            seen[h] = 0
            unique.append(h)
    return unique


def forward_fill(values: Sequence[Any]) -> list[Any]:
    """P14: carry the last non-null value down (merged month cells)."""
    out, last = [], None
    for v in values:
        if v is not None:
            last = v
        out.append(last)
    return out


def normalize_workbook(
    grid: Grid,
    merged: Sequence[MergedRange] = (),
    header_rows: int = 4,
    rename_map: dict[str, str] | None = None,
    month_col: str = "month",
    type_col: str = "type",
    valid_types: Sequence[str] = ("budget", "spent", "remaining"),
):
    """Full reference normalization: merged-cell fill -> header flatten
    -> drop all-null / unnamed columns -> rename -> Thai month + type
    mapping -> type filter -> month forward-fill. Returns a pandas
    DataFrame ready for ``spark.createDataFrame``."""
    import pandas as pd

    filled = fill_merged_cells(grid, merged)
    headers = flatten_headers(filled[:header_rows])
    pdf = pd.DataFrame(filled[header_rows:], columns=headers)
    pdf = pdf.dropna(axis=1, how="all")
    pdf = pdf.loc[:, ~pdf.columns.str.startswith("col_")]
    if rename_map:
        pdf = pdf.rename(columns=rename_map)
    if month_col in pdf.columns:
        pdf[month_col] = pdf[month_col].map(
            lambda v: thai_month_to_iso(v) or v if v is not None else v
        )
    if type_col in pdf.columns:
        pdf[type_col] = pdf[type_col].map(TYPE_MAP).fillna(pdf[type_col])
        pdf = pdf[pdf[type_col].isin(list(valid_types))].copy()
    if month_col in pdf.columns:
        pdf[month_col] = forward_fill(list(pdf[month_col]))
    return pdf.reset_index(drop=True)


def export_csv(pdf, path: str) -> None:
    """K6: CSV export with a BOM so Thai text opens correctly in Excel
    (reference ``gpt_excel_fix_column.py:233`` uses utf-8-sig)."""
    pdf.to_csv(path, index=False, encoding="utf-8-sig")


def read_excel_grid(path: str, sheet_name: str) -> tuple[Grid, list[MergedRange]]:
    """openpyxl adapter -> (grid, merged ranges). Optional dependency."""
    try:
        from openpyxl import load_workbook
    except ImportError as e:  # pragma: no cover - env without openpyxl
        raise ImportError(
            "Excel ingestion needs openpyxl; install it or supply the "
            "grid to normalize_workbook directly"
        ) from e
    wb = load_workbook(path, data_only=True)
    ws = wb[sheet_name]
    grid = [[cell.value for cell in row] for row in ws.iter_rows()]
    merged = [
        (r.min_row, r.min_col, r.max_row, r.max_col)
        for r in ws.merged_cells.ranges
    ]
    return grid, merged
