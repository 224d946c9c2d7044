"""Interactive SQL shell: multi-line statements ending with ';', meta commands.

Mirrors the reference REPL (reference: StorageEngine/SQLLayer/sql_shell.cpp:
30-152): a banner, a ``samanvay>`` prompt with ``       -> `` continuation,
statement accumulation until a trailing ';', and backslash meta commands
``\\q`` (quit), ``\\s`` (engine status), ``\\d <table>`` (describe),
``\\h``/``\\help`` (help). Results print through the K20 formatter.

``run_shell`` is I/O-injectable so tests can drive it with file objects;
``main()`` wires stdin/stdout and a local SparkSession.
"""

from __future__ import annotations

import sys
from typing import IO

from .engine import SamanvayEngine
from .formatter import format_result, format_table

_BANNER = """\
  Project Samanvay on Spark - HTAP SQL Shell
  Type SQL statements ending with ';'
  Special commands: \\q (quit), \\s (engine status), \\d <table> (describe),
                    \\history <table> (layout-commit history),
                    \\changes <table> <from> <to> (change data feed)
  SHOW TABLES;  to list all tables
"""

_HELP = """\
Commands:
  \\q          - quit
  \\s          - engine status
  \\d <table>  - describe table
  \\history <table> - layout-commit history (the txlog view)
  \\changes <table> <from> <to> - change data feed between two versions
  SELECT ... FROM t VERSION AS OF n;  - time travel (retained versions)
  SELECT ... FROM t CHANGES BETWEEN a AND b;  - change data feed
  SHOW TABLES; - list tables
  Any SQL statement ending with ';'
"""


def _print_status(engine: SamanvayEngine, out: IO[str]) -> None:
    st = engine.status()
    out.write(
        "Engine status (Spark {v}, seq {s})\n".format(
            v=st["engine"]["spark_version"], s=st["engine"]["currentSequence"]
        )
    )
    out.write(
        "Hot overlay: {n} entr{y} across {t} table(s)\n".format(
            n=st["memory"]["hotEntries"],
            y="y" if st["memory"]["hotEntries"] == 1 else "ies",
            t=st["memory"]["hotTables"],
        )
    )
    ops = st["operations"]
    out.write(
        "Ops: writes={w} reads={r} range_queries={q} flushes={f}\n".format(
            w=ops["total_writes"],
            r=ops["total_reads"],
            q=ops["total_range_queries"],
            f=ops["total_flushes"],
        )
    )
    if st["tables"]:
        headers = ["table", "pk", "columns", "hot", "tombstones", "base"]
        rows = [
            (
                t["table"],
                t["primaryKey"],
                t["columns"],
                t["hotEntries"],
                t["tombstones"],
                t["hasBase"],
            )
            for t in st["tables"]
        ]
        out.write(format_table(headers, rows) + "\n")


def _handle_meta(engine: SamanvayEngine, line: str, out: IO[str]) -> bool:
    """True if the line was a meta command (sql_shell.cpp:48-78)."""
    if line in ("\\q", "quit", "exit"):
        out.write("Bye!\n")
        raise SystemExit(0)
    if line == "\\s":
        _print_status(engine, out)
        return True
    if line.startswith("\\d "):
        result = engine.execute(f"DESCRIBE {line[3:].strip()}")
        out.write(format_result(result) + "\n")
        return True
    if line.startswith("\\history "):
        result = engine.execute(f"DESCRIBE HISTORY {line[9:].strip()}")
        out.write(format_result(result) + "\n")
        return True
    if line.startswith("\\changes "):
        parts = line[9:].split()
        if len(parts) != 3:
            out.write("usage: \\changes <table> <from> <to>\n")
            return True
        result = engine.execute(
            f"SELECT * FROM {parts[0]} CHANGES BETWEEN {parts[1]} "
            f"AND {parts[2]}"
        )
        out.write(format_result(result) + "\n")
        return True
    if line in ("\\h", "\\help"):
        out.write(_HELP)
        return True
    return False


def run_shell(
    engine: SamanvayEngine,
    stdin: IO[str],
    stdout: IO[str],
    interactive: bool = True,
) -> None:
    """REPL loop (sql_shell.cpp:96-152). Reads until EOF or \\q."""
    if interactive:
        stdout.write(_BANNER + "\n")
    buffer = ""
    while True:
        if interactive:
            stdout.write("samanvay> " if not buffer else "       -> ")
            stdout.flush()
        line = stdin.readline()
        if not line:  # EOF
            if interactive:
                stdout.write("\nBye!\n")
            return
        line = line.strip()
        if not line:
            continue
        # Meta commands apply regardless of a pending SQL buffer
        # (sql_shell.cpp:125-128 checks line[0] == '\\' before accumulating)
        if line.startswith("\\") or line in ("quit", "exit"):
            try:
                if _handle_meta(engine, line, stdout):
                    continue
            except SystemExit:
                return
            stdout.write(f"Unknown command: {line}\n")
            continue
        buffer = f"{buffer} {line}".strip() if buffer else line
        if buffer.endswith(";"):
            sql = buffer.rstrip(";").strip()
            buffer = ""
            if not sql:
                continue
            stdout.write(format_result(engine.execute(sql)) + "\n\n")
        # else: keep accumulating multi-line SQL


def main() -> None:
    from .session import get_spark

    engine = SamanvayEngine(get_spark(app_name="samanvay-shell"))
    run_shell(engine, sys.stdin, sys.stdout, interactive=True)


if __name__ == "__main__":
    main()
