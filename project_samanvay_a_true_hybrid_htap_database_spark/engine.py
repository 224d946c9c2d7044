"""SamanvayEngine: the SQL entry point with the reference's dispatch surface.

The reference routes every statement through ``QueryExecutor::dispatch``
(reference: StorageEngine/SQLLayer/query_executor.cpp:69-88) over a skiplist
memtable + LSM store. Here the same observable surface runs Spark-first:

- DDL registers a Spark ``StructType`` schema + PK metadata (mirrors
  schema_registry.hpp:40-91; names lowercased, PK = explicit constraint or
  first column, query_executor.cpp:328-345).
- DML lands in a driver-side *memtable* overlay — dict keyed by PK holding
  ``(seq, row, tombstone)`` — mirroring the skiplist's newest-seq-wins upsert
  (skiplist.hpp:170-187) and tombstone delete (memtable.hpp:343-362). A table
  may also carry a parquet-backed *base* DataFrame; reads merge the two with
  ``functions.htap.latest_version`` (broadcast anti-join — no shuffle of the
  base), which preserves read-your-writes (Unit_Test2.cpp:836-847).
- SELECT builds a DataFrame plan (filter/select/agg) so Catalyst does the
  pushdown the reference only pretends to (SURVEY.md §4); results come back
  sorted by string-encoded PK, matching the reference's std::map merge order
  (range_query_executor.hpp:100,140).
- ``flush()`` folds the memtable into the base (mirrors the freeze→flush
  path, memtable.hpp:140-236); ``compact()`` re-materializes the base keeping
  only live latest versions (mirrors k-way merge compaction,
  compaction.hpp:193-275).

Reference quirks (SURVEY.md §2.1 S9/S11/S12) are kept behind
``quirk_compat`` (default True): COUNT(col) == COUNT(*), AVG divides by the
all-row count, MIN/MAX on an empty selection return 0.
"""

from __future__ import annotations

import re
import time
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .functions.htap import latest_version

# ---------------------------------------------------------------------------
# Result model (reference: result_formatter.hpp:19-43 — every result carries
# headers/rows/rowsAffected/executionTimeMs/errorMessage)
# ---------------------------------------------------------------------------


@dataclass
class ResultSet:
    headers: list[str] = field(default_factory=list)
    rows: list[tuple] = field(default_factory=list)
    rows_affected: int = 0
    execution_time_ms: float = 0.0
    error_message: str | None = None
    message: str | None = None

    @property
    def ok(self) -> bool:
        return self.error_message is None


# DDL type mapping (reference: query_executor.cpp:790-810 — note DECIMAL
# degrades to DOUBLE and TIMESTAMP/BYTES are unreachable via CREATE TABLE).
_DDL_TYPES: dict[str, T.DataType] = {
    "INT": T.IntegerType(),
    "INTEGER": T.IntegerType(),
    "BIGINT": T.LongType(),
    "FLOAT": T.FloatType(),
    "DOUBLE": T.DoubleType(),
    "DECIMAL": T.DoubleType(),
    "CHAR": T.StringType(),
    "VARCHAR": T.StringType(),
    "TEXT": T.StringType(),
    "BOOLEAN": T.BooleanType(),
    "BOOL": T.BooleanType(),
}

_AGG_FNS = {"COUNT", "SUM", "AVG", "MIN", "MAX"}


@dataclass
class TableState:
    name: str
    schema: T.StructType
    pk: str
    not_null: set[str]
    base: DataFrame | None = None  # parquet-backed / flushed rows
    memtable: dict[Any, tuple[int, dict | None]] = field(default_factory=dict)
    # memtable maps pk -> (seq, row-dict or None for tombstone)
    base_rows: int | None = None  # cached count; None = not yet computed


class SqlError(Exception):
    pass


# ---------------------------------------------------------------------------
# Tokenizer + predicate parser for the reference grammar (the surface is tiny
# — 7 statement types, 6 comparison ops, AND/OR; query_executor.cpp:671-746)
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"\s*(?:(?P<str>'(?:[^']|'')*')|(?P<num>-?\d+(?:\.\d+)?)|"
    r"(?P<op><=|>=|!=|<>|=|<|>|\(|\)|,|;|\*)|(?P<word>[A-Za-z_][A-Za-z_0-9.]*))"
)


def _tokenize(sql: str) -> list[tuple[str, Any]]:
    tokens: list[tuple[str, Any]] = []
    pos = 0
    while pos < len(sql):
        m = _TOKEN_RE.match(sql, pos)
        if not m:
            if sql[pos:].strip() == "":
                break
            raise SqlError(f"Parse error near: {sql[pos:pos + 20]!r}")
        pos = m.end()
        if m.lastgroup == "str":
            tokens.append(("str", m.group("str")[1:-1].replace("''", "'")))
        elif m.lastgroup == "num":
            raw = m.group("num")
            tokens.append(("num", float(raw) if "." in raw else int(raw)))
        elif m.lastgroup == "op":
            op = m.group("op")
            tokens.append(("op", "!=" if op == "<>" else op))
        else:
            tokens.append(("word", m.group("word")))
    return tokens


class _Tokens:
    def __init__(self, tokens: list[tuple[str, Any]]):
        self.toks = tokens
        self.i = 0

    def peek(self) -> tuple[str, Any] | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> tuple[str, Any]:
        if self.i >= len(self.toks):
            raise SqlError("Unexpected end of statement")
        t = self.toks[self.i]
        self.i += 1
        return t

    def accept_word(self, *words: str) -> bool:
        t = self.peek()
        if t and t[0] == "word" and t[1].upper() in words:
            self.i += 1
            return True
        return False

    def expect_word(self, word: str) -> None:
        t = self.next()
        if t[0] != "word" or t[1].upper() != word:
            raise SqlError(f"Expected {word}, got {t[1]!r}")

    def expect_op(self, op: str) -> None:
        t = self.next()
        if t[0] != "op" or t[1] != op:
            raise SqlError(f"Expected {op!r}, got {t[1]!r}")

    def done(self) -> bool:
        t = self.peek()
        return t is None or (t[0] == "op" and t[1] == ";")


# Predicate AST: ("cmp", op, operand, operand) | ("and"/"or", left, right)
# operand: ("col", name) | ("lit", value)


def _parse_pred(ts: _Tokens):
    left = _parse_pred_term(ts)
    while ts.accept_word("OR"):
        right = _parse_pred_term(ts)
        left = ("or", left, right)
    return left


def _parse_pred_term(ts: _Tokens):
    left = _parse_pred_factor(ts)
    while ts.accept_word("AND"):
        right = _parse_pred_factor(ts)
        left = ("and", left, right)
    return left


def _parse_pred_factor(ts: _Tokens):
    t = ts.peek()
    if t and t[0] == "op" and t[1] == "(":
        ts.next()
        inner = _parse_pred(ts)
        ts.expect_op(")")
        return inner
    lhs = _parse_operand(ts)
    op_t = ts.next()
    if op_t[0] != "op" or op_t[1] not in {"=", "!=", "<", "<=", ">", ">="}:
        raise SqlError(f"Expected comparison operator, got {op_t[1]!r}")
    rhs = _parse_operand(ts)
    return ("cmp", op_t[1], lhs, rhs)


def _parse_operand(ts: _Tokens):
    t = ts.next()
    if t[0] == "str":
        return ("lit", t[1])
    if t[0] == "num":
        return ("lit", t[1])
    if t[0] == "word":
        if t[1].upper() == "NULL":
            return ("lit", None)
        if t[1].upper() in {"TRUE", "FALSE"}:
            return ("lit", t[1].upper() == "TRUE")
        return ("col", t[1].lower())
    raise SqlError(f"Bad operand {t[1]!r}")


def _pred_to_column(pred) -> F.Column:
    kind = pred[0]
    if kind == "and":
        return _pred_to_column(pred[1]) & _pred_to_column(pred[2])
    if kind == "or":
        return _pred_to_column(pred[1]) | _pred_to_column(pred[2])
    _, op, lhs, rhs = pred
    l = F.col(lhs[1]) if lhs[0] == "col" else F.lit(lhs[1])
    r = F.col(rhs[1]) if rhs[0] == "col" else F.lit(rhs[1])
    if op == "=":
        return l == r
    if op == "!=":
        return l != r
    if op == "<":
        return l < r
    if op == "<=":
        return l <= r
    if op == ">":
        return l > r
    return l >= r


def _pred_columns(pred) -> set[str]:
    kind = pred[0]
    if kind in ("and", "or"):
        return _pred_columns(pred[1]) | _pred_columns(pred[2])
    cols = set()
    for operand in (pred[2], pred[3]):
        if operand[0] == "col":
            cols.add(operand[1])
    return cols


def _point_lookup_pk(pred, pk: str):
    """Top-level `pk = literal` (either operand order) → the literal, else
    None (reference detection: query_executor.cpp:604-624)."""
    if pred[0] != "cmp" or pred[1] != "=":
        return None
    _, _, lhs, rhs = pred
    if lhs[0] == "col" and lhs[1] == pk and rhs[0] == "lit":
        return rhs[1]
    if rhs[0] == "col" and rhs[1] == pk and lhs[0] == "lit":
        return lhs[1]
    return None


# ---------------------------------------------------------------------------
# The engine
# ---------------------------------------------------------------------------


class SamanvayEngine:
    def __init__(self, spark: SparkSession, quirk_compat: bool = True):
        self.spark = spark
        self.quirk_compat = quirk_compat
        self.tables: dict[str, TableState] = {}
        self._seq = 0
        # Operation counters surfaced by status() (reference:
        # StorageEngineStats, api/json_helpers.hpp:72-104)
        self.stats: dict[str, int] = {
            "total_writes": 0,
            "total_reads": 0,
            "total_range_queries": 0,
            "total_flushes": 0,
        }

    # -- public API ---------------------------------------------------------

    def execute(self, sql: str) -> ResultSet:
        start = time.perf_counter()
        try:
            result = self._dispatch(sql)
        except SqlError as exc:
            result = ResultSet(error_message=str(exc))
        result.execution_time_ms = (time.perf_counter() - start) * 1000.0
        return result

    def register_base(self, name: str, df: DataFrame, pk: str) -> None:
        """Register a parquet-backed table as the analytic base (the LSM
        levels); subsequent DML overlays it through the memtable."""
        name = name.lower()
        self.tables[name] = TableState(
            name=name, schema=df.schema, pk=pk.lower(), not_null=set(), base=df
        )

    def table_df(self, name: str) -> DataFrame:
        """Current merged view of a table (base ∪ memtable overlay)."""
        state = self._state(name)
        return self._merged_df(state)

    def flush(self, name: str) -> int:
        """Fold the memtable into the base (reference freeze→flush,
        memtable.hpp:140-236). Returns flushed entry count."""
        state = self._state(name)
        n = len(state.memtable)
        if n:
            state.base = self._merged_df(state).localCheckpoint(eager=True)
            state.memtable.clear()
            state.base_rows = None  # invalidate cached EXPLAIN estimate
            self.stats["total_flushes"] += 1
        return n

    def status(self) -> dict:
        """Engine statistics in the reference's stats shape (reference:
        api/json_helpers.hpp:72-104 statsToJson; memtable/SSTable sections
        become the hot-overlay/parquet-base split)."""
        tables = []
        hot_total = 0
        for name in sorted(self.tables):
            state = self.tables[name]
            hot = len(state.memtable)
            tomb = sum(1 for _, row in state.memtable.values() if row is None)
            hot_total += hot
            tables.append(
                {
                    "table": name,
                    "primaryKey": state.pk,
                    "columns": len(state.schema.fields),
                    "hotEntries": hot,
                    "tombstones": tomb,
                    "hasBase": state.base is not None,
                }
            )
        return {
            "memory": {
                "hotTables": sum(1 for t in tables if t["hotEntries"]),
                "hotEntries": hot_total,
            },
            "tables": tables,
            "operations": dict(self.stats),
            "engine": {
                "spark_version": self.spark.version,
                "currentSequence": self._seq,
            },
        }

    def compact(self, name: str) -> None:
        """Re-materialize the base keeping live latest versions only
        (reference k-way merge + bottom-level tombstone GC)."""
        self.flush(name)

    # -- dispatch -----------------------------------------------------------

    @staticmethod
    def _first_statement(sql: str) -> str:
        """Multi-statement input executes statement 0 only (reference quirk:
        query_executor.cpp:29 — only `getStatement(0)` of the parsed batch is
        dispatched). Split on the first ';' outside a quoted string."""
        i = 0
        in_str = False
        while i < len(sql):
            c = sql[i]
            if in_str:
                if c == "'":
                    if i + 1 < len(sql) and sql[i + 1] == "'":  # '' escape
                        i += 1
                    else:
                        in_str = False
            elif c == "'":
                in_str = True
            elif c == ";":
                return sql[:i]
            i += 1
        return sql

    def _dispatch(self, sql: str) -> ResultSet:
        stripped = self._first_statement(sql.strip()).strip()
        if not stripped:
            raise SqlError("Empty statement")
        ts = _Tokens(_tokenize(stripped))
        head = ts.peek()
        if head is None or head[0] != "word":
            raise SqlError(f"Parse error near {stripped[:20]!r}")
        kw = head[1].upper()
        if kw in {"INSERT", "UPDATE"}:
            self.stats["total_writes"] += 1
        elif kw == "SELECT":
            self.stats["total_reads"] += 1
        if kw == "CREATE":
            return self._create_table(ts)
        if kw == "DROP":
            return self._drop_table(ts)
        if kw == "INSERT":
            return self._insert(ts)
        if kw == "SELECT":
            return self._select(ts)
        if kw == "UPDATE":
            return self._update(ts)
        if kw == "DELETE":
            return self._delete(ts)
        if kw == "SHOW":
            return self._show_tables(ts)
        if kw in {"DESCRIBE", "DESC"}:
            return self._describe(ts)
        if kw == "EXPLAIN":
            return self._explain(ts)
        raise SqlError(f"Unsupported statement: {kw}")

    # -- helpers ------------------------------------------------------------

    def _state(self, name: str) -> TableState:
        state = self.tables.get(name.lower())
        if state is None:
            raise SqlError(f"Table does not exist: {name.lower()}")
        return state

    def _next_seq(self) -> int:
        self._seq += 1
        return self._seq

    def _merged_df(self, state: TableState) -> DataFrame:
        cols = [f.name for f in state.schema.fields]
        base = state.base
        if base is None:
            base = self.spark.createDataFrame([], state.schema)
        if not state.memtable:
            return base
        live_rows = [
            tuple(row[c] for c in cols)
            for _, row in state.memtable.values()
            if row is not None
        ]
        tomb_keys = {pk for pk, (_, row) in state.memtable.items() if row is None}
        hot = self.spark.createDataFrame(live_rows, state.schema) if live_rows else None
        out = base
        if tomb_keys:
            out = out.filter(~F.col(state.pk).isin(list(tomb_keys)))
        if hot is not None:
            out = latest_version(out, hot, key=state.pk)
        return out

    def _coerce(self, state: TableState, col: str, value: Any) -> Any:
        """Validate + coerce a literal to the declared column type (the
        reference type-checks stringly values via stoll/stod/bool literals,
        row_codec.hpp:215-251)."""
        if value is None:
            if col in state.not_null or col == state.pk:
                raise SqlError(f"NULL not allowed for column: {col}")
            return None
        dtype = state.schema[col].dataType
        try:
            if isinstance(dtype, (T.IntegerType, T.LongType)):
                if isinstance(value, float) and not value.is_integer():
                    raise ValueError(value)
                return int(value)
            if isinstance(dtype, (T.DoubleType, T.FloatType)):
                return float(value)
            if isinstance(dtype, T.BooleanType):
                if isinstance(value, bool):
                    return value
                if isinstance(value, str) and value.lower() in {"true", "false"}:
                    return value.lower() == "true"
                if isinstance(value, int) and value in (0, 1):
                    return bool(value)
                raise ValueError(value)
            return str(value)
        except (TypeError, ValueError):
            raise SqlError(f"Type mismatch for column {col}: {value!r}") from None

    @staticmethod
    def _sort_key_str(v: Any) -> str:
        return "" if v is None else str(v)

    # -- DDL ----------------------------------------------------------------

    def _create_table(self, ts: _Tokens) -> ResultSet:
        ts.expect_word("CREATE")
        ts.expect_word("TABLE")
        name_t = ts.next()
        if name_t[0] != "word":
            raise SqlError("Expected table name")
        name = name_t[1].lower()
        if name in self.tables:
            raise SqlError(f"Table already exists: {name}")
        ts.expect_op("(")
        fields: list[T.StructField] = []
        not_null: set[str] = set()
        pk: str | None = None
        while True:
            col_t = ts.next()
            if col_t[0] != "word":
                raise SqlError("Expected column name")
            col = col_t[1].lower()
            type_t = ts.next()
            if type_t[0] != "word":
                raise SqlError("Expected column type")
            type_name = type_t[1].upper()
            # swallow VARCHAR(n)/CHAR(n)/DECIMAL(p,s) length args
            t = ts.peek()
            if t and t[0] == "op" and t[1] == "(":
                ts.next()
                while True:
                    inner = ts.next()
                    if inner[0] == "op" and inner[1] == ")":
                        break
            dtype = _DDL_TYPES.get(type_name)
            if dtype is None:
                raise SqlError(f"Unsupported type: {type_name}")
            nullable = True
            while True:
                if ts.accept_word("NOT"):
                    ts.expect_word("NULL")
                    nullable = False
                    not_null.add(col)
                elif ts.accept_word("PRIMARY"):
                    ts.expect_word("KEY")
                    pk = col
                    nullable = False
                    not_null.add(col)
                else:
                    break
            if any(f.name == col for f in fields):
                raise SqlError(f"Duplicate column: {col}")
            fields.append(T.StructField(col, dtype, nullable))
            sep = ts.next()
            if sep[0] == "op" and sep[1] == ")":
                break
            if not (sep[0] == "op" and sep[1] == ","):
                raise SqlError(f"Expected ',' or ')', got {sep[1]!r}")
        if not fields:
            raise SqlError("CREATE TABLE requires at least one column")
        # PK default: first NOT NULL column, else first column
        # (reference: query_executor.cpp:328-345)
        if pk is None:
            pk = next((f.name for f in fields if f.name in not_null), fields[0].name)
            not_null.add(pk)
        self.tables[name] = TableState(
            name=name, schema=T.StructType(fields), pk=pk, not_null=not_null
        )
        return ResultSet(message=f"Table created: {name}")

    def _drop_table(self, ts: _Tokens) -> ResultSet:
        ts.expect_word("DROP")
        ts.expect_word("TABLE")
        name_t = ts.next()
        name = str(name_t[1]).lower()
        self._state(name)  # raises if missing
        del self.tables[name]
        return ResultSet(message=f"Table dropped: {name}")

    # -- DML ----------------------------------------------------------------

    def _insert(self, ts: _Tokens) -> ResultSet:
        ts.expect_word("INSERT")
        ts.expect_word("INTO")
        name_t = ts.next()
        state = self._state(str(name_t[1]))
        all_cols = [f.name for f in state.schema.fields]
        cols = all_cols
        t = ts.peek()
        if t and t[0] == "op" and t[1] == "(":
            ts.next()
            cols = []
            while True:
                c = ts.next()
                if c[0] != "word":
                    raise SqlError("Expected column name")
                col = c[1].lower()
                if col not in all_cols:
                    raise SqlError(f"Unknown column: {col}")
                cols.append(col)
                sep = ts.next()
                if sep[0] == "op" and sep[1] == ")":
                    break
        ts.expect_word("VALUES")
        ts.expect_op("(")
        values = []
        while True:
            values.append(_parse_operand(ts)[1])
            sep = ts.next()
            if sep[0] == "op" and sep[1] == ")":
                break
            if not (sep[0] == "op" and sep[1] == ","):
                raise SqlError("Expected ',' or ')' in VALUES")
        # Single-row INSERT only, value count must match
        # (reference: query_executor.cpp:380,393)
        if not ts.done():
            raise SqlError("Only single-row INSERT ... VALUES is supported")
        if len(values) != len(cols):
            raise SqlError(
                f"Column count ({len(cols)}) does not match value count ({len(values)})"
            )
        row = {c: None for c in all_cols}
        for c, v in zip(cols, values):
            row[c] = self._coerce(state, c, v)
        for c in state.not_null:
            if row[c] is None:
                raise SqlError(f"NULL not allowed for column: {c}")
        pk_val = row[state.pk]
        if pk_val is None:
            raise SqlError("Primary key value required")
        # Blind put == upsert (reference: query_executor.cpp:418-421)
        state.memtable[pk_val] = (self._next_seq(), row)
        return ResultSet(rows_affected=1, message="Query OK, 1 row(s) affected")

    def _matching_rows(self, state: TableState, pred) -> list[dict]:
        """Materialize the rows a DML statement touches. Driver-side by
        design: the reference's UPDATE/DELETE are row-at-a-time
        read-modify-write over the matched set (query_executor.cpp:505-568),
        and the HTAP contract keeps mutations in the hot overlay — a dict of
        recent rows. For analytical-scale mutation (millions of matches),
        the right tool is a set-based rewrite of the BASE
        (df.withColumn(when(pred, ...)) / Delta MERGE), not this path."""
        cols = [f.name for f in state.schema.fields]
        df = self._merged_df(state)
        if pred is not None:
            for c in _pred_columns(pred):
                if c not in cols:
                    raise SqlError(f"Unknown column: {c}")
            df = df.filter(_pred_to_column(pred))
        return [row.asDict() for row in df.collect()]

    def _update(self, ts: _Tokens) -> ResultSet:
        ts.expect_word("UPDATE")
        name_t = ts.next()
        state = self._state(str(name_t[1]))
        cols = [f.name for f in state.schema.fields]
        ts.expect_word("SET")
        assignments: list[tuple[str, Any]] = []
        while True:
            c = ts.next()
            if c[0] != "word":
                raise SqlError("Expected column in SET")
            col = c[1].lower()
            if col not in cols:
                raise SqlError(f"Unknown column in SET: {col}")
            ts.expect_op("=")
            assignments.append((col, _parse_operand(ts)[1]))
            t = ts.peek()
            if t and t[0] == "op" and t[1] == ",":
                ts.next()
                continue
            break
        # WHERE is mandatory (reference: query_executor.cpp:510-511)
        if not ts.accept_word("WHERE"):
            raise SqlError("UPDATE requires a WHERE clause")
        pred = _parse_pred(ts)
        matches = self._matching_rows(state, pred)
        for row in matches:
            for col, v in assignments:
                row[col] = self._coerce(state, col, v)
            for c in state.not_null:
                if row[c] is None:
                    raise SqlError(f"NULL not allowed for column: {c}")
            state.memtable[row[state.pk]] = (self._next_seq(), row)
        n = len(matches)
        return ResultSet(rows_affected=n, message=f"Query OK, {n} row(s) affected")

    def _delete(self, ts: _Tokens) -> ResultSet:
        ts.expect_word("DELETE")
        ts.expect_word("FROM")
        name_t = ts.next()
        state = self._state(str(name_t[1]))
        # WHERE is mandatory (reference: query_executor.cpp:458-459)
        if not ts.accept_word("WHERE"):
            raise SqlError("DELETE requires a WHERE clause")
        pred = _parse_pred(ts)
        matches = self._matching_rows(state, pred)
        for row in matches:
            # Tombstone shadows older versions (memtable.hpp:343-362)
            state.memtable[row[state.pk]] = (self._next_seq(), None)
        n = len(matches)
        return ResultSet(rows_affected=n, message=f"Query OK, {n} row(s) affected")

    # -- SELECT -------------------------------------------------------------

    def _parse_select(self, ts: _Tokens):
        ts.expect_word("SELECT")
        items: list[tuple[str, str | None]] = []  # (kind, payload)
        while True:
            t = ts.next()
            if t[0] == "op" and t[1] == "*":
                items.append(("star", None))
            elif t[0] == "word" and t[1].upper() in _AGG_FNS:
                fn = t[1].upper()
                ts.expect_op("(")
                arg_t = ts.next()
                if arg_t[0] == "op" and arg_t[1] == "*":
                    arg = "*"
                elif arg_t[0] == "word":
                    arg = arg_t[1].lower()
                else:
                    raise SqlError(f"Bad aggregate argument {arg_t[1]!r}")
                ts.expect_op(")")
                items.append(("agg", f"{fn}({arg})"))
            elif t[0] == "word":
                items.append(("col", t[1].lower()))
            else:
                raise SqlError(f"Bad select item {t[1]!r}")
            nxt = ts.peek()
            if nxt and nxt[0] == "op" and nxt[1] == ",":
                ts.next()
                continue
            break
        ts.expect_word("FROM")
        name_t = ts.next()
        if name_t[0] != "word":
            raise SqlError("Expected table name")
        pred = None
        if ts.accept_word("WHERE"):
            pred = _parse_pred(ts)
        return items, str(name_t[1]).lower(), pred

    def _select(self, ts: _Tokens) -> ResultSet:
        items, table, pred = self._parse_select(ts)
        state = self._state(table)
        if pred is not None and _point_lookup_pk(pred, state.pk) is None:
            self.stats["total_range_queries"] += 1
        cols = [f.name for f in state.schema.fields]
        df = self._merged_df(state)
        if pred is not None:
            for c in _pred_columns(pred):
                if c not in cols:
                    raise SqlError(f"Unknown column: {c}")
            df = df.filter(_pred_to_column(pred))

        aggs = [payload for kind, payload in items if kind == "agg"]
        if aggs:
            return self._run_aggregates(state, df, aggs)

        proj: list[str] = []
        for kind, payload in items:
            if kind == "star":
                proj.extend(cols)
            else:
                if payload not in cols:
                    raise SqlError(f"Unknown column: {payload}")
                proj.append(payload)
        # Reference rows come back sorted by string-encoded key
        # (range_query_executor.hpp:100,140) — sort by pk-as-string.
        out = (
            df.orderBy(F.col(state.pk).cast("string"))
            .select(*proj)
            .collect()
        )
        return ResultSet(headers=proj, rows=[tuple(r) for r in out])

    def _run_aggregates(
        self, state: TableState, df: DataFrame, aggs: list[str]
    ) -> ResultSet:
        exprs = []
        for spec in aggs:
            fn, arg = spec.split("(", 1)
            arg = arg[:-1]
            if fn == "COUNT":
                # Quirk: COUNT(col) counts all post-WHERE rows, like COUNT(*)
                # (reference: query_executor.cpp:228)
                exprs.append(F.count(F.lit(1)).alias(spec))
            elif arg == "*":
                raise SqlError(f"{fn}(*) is not supported")
            elif arg not in [f.name for f in state.schema.fields]:
                raise SqlError(f"Unknown column: {arg}")
            elif fn == "SUM":
                exprs.append(F.sum(arg).alias(spec))
            elif fn == "AVG":
                if self.quirk_compat:
                    # Quirk: denominator counts all rows (query_executor.cpp:256-258)
                    exprs.append(
                        (F.sum(arg) / F.count(F.lit(1))).alias(spec)
                    )
                else:
                    exprs.append(F.avg(arg).alias(spec))
            elif fn == "MIN":
                exprs.append(F.min(arg).alias(spec))
            elif fn == "MAX":
                exprs.append(F.max(arg).alias(spec))
        row = df.agg(*exprs).collect()[0]
        values = []
        for spec, v in zip(aggs, row):
            if v is None and self.quirk_compat:
                # Quirk: MIN/MAX/SUM over empty selection → 0
                # (reference: query_executor.cpp:260-263)
                v = 0
            values.append(v)
        return ResultSet(headers=list(aggs), rows=[tuple(values)])

    # -- metadata -----------------------------------------------------------

    def _show_tables(self, ts: _Tokens) -> ResultSet:
        ts.expect_word("SHOW")
        ts.expect_word("TABLES")
        names = sorted(self.tables)
        return ResultSet(headers=["Tables"], rows=[(n,) for n in names])

    def _describe(self, ts: _Tokens) -> ResultSet:
        ts.next()  # DESCRIBE / DESC
        name_t = ts.next()
        state = self._state(str(name_t[1]))
        rows = []
        for f in state.schema.fields:
            rows.append(
                (
                    f.name,
                    f.dataType.simpleString(),
                    "NO" if f.name in state.not_null else "YES",
                    "PRI" if f.name == state.pk else "",
                )
            )
        return ResultSet(headers=["Column", "Type", "Nullable", "Key"], rows=rows)

    # -- EXPLAIN ------------------------------------------------------------

    def _explain(self, ts: _Tokens) -> ResultSet:
        ts.expect_word("EXPLAIN")
        t = ts.peek()
        if not (t and t[0] == "word" and t[1].upper() == "SELECT"):
            raise SqlError("EXPLAIN supports SELECT statements only")
        items, table, pred = self._parse_select(ts)
        state = self._state(table)
        cols = [f.name for f in state.schema.fields]

        aggs = [p for kind, p in items if kind == "agg"]
        point = pred is not None and _point_lookup_pk(pred, state.pk) is not None
        if aggs:
            qtype = "AGGREGATION"
        elif point:
            qtype = "POINT_LOOKUP"
        elif pred is not None:
            qtype = "RANGE_SCAN"
        else:
            qtype = "FULL_SCAN"

        # Cached per table state: EXPLAIN must stay metadata-cheap — a count
        # job per EXPLAIN would scan the base (reference estimates come from
        # level metadata, hybrid_query_router.hpp:159-218).
        if state.base is None:
            base_rows = 0
        elif state.base_rows is not None:
            base_rows = state.base_rows
        else:
            base_rows = state.base.count()
            state.base_rows = base_rows
        mem_rows = len(state.memtable)
        est = 1 if point else base_rows + mem_rows
        if pred is not None and not point:
            est = max(1, int(est * 0.33))

        proj = [p for kind, p in items if kind == "col"] or ["*"]
        # Plan text mirrors the reference renderer's sections
        # (hybrid_query_router.hpp:331-393), then appends Spark's plan.
        lines = [
            "=== Query Execution Plan ===",
            f"Query Type: {qtype}",
            f"Table: {state.name}",
            f"Estimated Rows: {est}",
            "Storage Paths:",
            f"  - Memtable Overlay ({mem_rows} hot entries)",
            f"  - Parquet Base ({base_rows} rows)",
            f"Filter: {'yes' if pred is not None else 'none'}",
            f"Projection: {', '.join(aggs) if aggs else ', '.join(proj)}",
        ]
        df = self._merged_df(state)
        if pred is not None:
            for c in _pred_columns(pred):
                if c not in cols:
                    raise SqlError(f"Unknown column: {c}")
            df = df.filter(_pred_to_column(pred))
        lines.append("--- Spark Physical Plan ---")
        lines.extend(
            df._jdf.queryExecution().simpleString().splitlines()  # noqa: SLF001
        )
        return ResultSet(headers=["plan"], rows=[(line,) for line in lines])
