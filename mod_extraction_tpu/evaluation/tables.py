"""Validation-table formatting matching the reference's archived outputs.

The reference's regression artifacts are Lightning's box-drawn validate
tables archived in `eval/*.txt` (SURVEY.md §4).  We reproduce the exact
format so our eval runs can be diffed against those files row-by-row.
"""

from __future__ import annotations

from typing import Dict


def format_validate_table(metrics: Dict[str, float]) -> str:
    """Render the Lightning-style validate-metric table."""
    col1, col2 = "Validate metric", "DataLoader 0"
    rows = sorted(metrics.items())
    w1 = max(len(col1), *(len(k) for k, _ in rows)) + 12
    w2 = max(len(col2), *(len(f"{v!r}") for _, v in rows)) + 12
    w1 = max(w1, 27)
    w2 = max(w2, 27)

    def center(s: str, w: int) -> str:
        return s.center(w)

    lines = [
        "┏" + "━" * w1 + "┳" + "━" * w2 + "┓",
        "┃" + center(col1, w1) + "┃" + center(col2, w2) + "┃",
        "┡" + "━" * w1 + "╇" + "━" * w2 + "┩",
    ]
    for k, v in rows:
        lines.append("│" + center(k, w1) + "│" + center(str(float(v)), w2) + "│")
    lines.append("└" + "─" * w1 + "┴" + "─" * w2 + "┘")
    return "\n".join(lines)


def format_eval_block(metrics: Dict[str, float], label: str) -> str:
    """Table + the `=== label ===` banner used in `eval/*.txt`."""
    sep = "=" * 65
    return f"{format_validate_table(metrics)}\n{sep}\n{label}\n{sep}\n"
