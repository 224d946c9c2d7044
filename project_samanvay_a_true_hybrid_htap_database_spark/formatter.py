"""Result formatting: ASCII tables, DML status lines, error lines.

Mirrors the reference's ResultFormatter (reference:
StorageEngine/SQLLayer/includes/result_formatter.hpp:46-237): SELECT results
render as a +---+ bordered table followed by ``N row(s) in set (X ms)``; DML
results render ``Query OK, N row(s) affected (X ms)``; errors render
``ERROR: <message>``. Cell stringification matches the reference's stringly
row model (result_formatter.hpp:87-141): None -> "NULL", booleans lowercase,
floats trimmed like C++ ``operator<<(double)`` (6 significant digits,
no trailing zeros).
"""

from __future__ import annotations

from typing import Any

from .engine import ResultSet


def format_cell(v: Any) -> str:
    """Stringify one cell the way the reference prints values."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        # C++ default ostream formatting: 6 significant digits, fixed or
        # scientific as needed, trailing zeros trimmed (formatDouble,
        # result_formatter.hpp:230-235).
        s = f"{v:.6g}"
        return s
    return str(v)


def format_table(headers: list[str], rows: list[tuple]) -> str:
    """Render a +---+---+ ASCII table (result_formatter.hpp:185-227)."""
    cells = [[format_cell(v) for v in row] for row in rows]
    widths = [len(h) for h in headers]
    for row in cells:
        for i, c in enumerate(row[: len(widths)]):
            widths[i] = max(widths[i], len(c))

    def sep() -> str:
        return "+" + "+".join("-" * (w + 2) for w in widths) + "+"

    def line(vals: list[str]) -> str:
        padded = []
        for i, w in enumerate(widths):
            cell = vals[i] if i < len(vals) else ""
            padded.append(" " + cell + " " * (w - len(cell)) + " ")
        return "|" + "|".join(padded) + "|"

    out = [sep(), line(headers), sep()]
    out.extend(line(row) for row in cells)
    out.append(sep())
    return "\n".join(out)


def format_result(result: ResultSet) -> str:
    """Full result rendering (result_formatter.hpp:50-83)."""
    if not result.ok:
        return f"ERROR: {result.error_message}"
    timing = (
        f" ({result.execution_time_ms:.2f} ms)"
        if result.execution_time_ms > 0
        else ""
    )
    if not result.headers:
        if result.message and not result.message.startswith("Query OK"):
            return result.message
        return f"Query OK, {result.rows_affected} row(s) affected{timing}"
    table = format_table(result.headers, result.rows)
    return f"{table}\n{len(result.rows)} row(s) in set{timing}"
