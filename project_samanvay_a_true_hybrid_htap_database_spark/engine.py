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

Reference quirks (SURVEY.md §2.1 S8/S9/S11/S12) are kept behind
``quirk_compat`` (default True): COUNT(col) == COUNT(*), AVG divides by the
all-row count, MIN/MAX on an empty selection return 0, string-column
comparisons go numeric-if-both-parse, unhandled operators (LIKE / IS NULL /
IN / BETWEEN / NOT) evaluate TRUE, literal-on-left comparisons bind the
column as the left operand without flipping the operator, and col-vs-col /
lit-vs-lit comparisons match nothing (see ``_pred_to_column`` for the
query_executor.cpp line map).
"""

from __future__ import annotations

import json
import logging
import os
import re
import shutil
import threading
import time
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .txlog import TableTxLog

# Expected execution-layer failure families for execute()'s clean-error
# backstop: pyspark analysis / ANSI-cast errors and JVM-bridge faults.
# Anything outside these is logged with a traceback (advisor r7).
try:
    from py4j.protocol import Py4JError as _Py4JError
except ImportError:  # pragma: no cover - py4j ships with pyspark
    class _Py4JError(Exception):
        pass

try:
    from pyspark.errors import PySparkException as _PySparkException
except ImportError:  # pragma: no cover - present since pyspark 3.4
    from pyspark.sql.utils import CapturedException as _PySparkException

_EXECUTION_ERRORS = (_PySparkException, _Py4JError)


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
    base: DataFrame | None = None  # parquet-backed / compacted rows
    memtable: dict[Any, tuple[int, dict | None]] = field(default_factory=dict)
    # memtable maps pk -> (seq, row-dict or None for tombstone)
    # Flushed-but-uncompacted rows (the L0 layer): table columns plus a
    # __tomb marker, one row per pk (newest-wins applied at flush time).
    # Precedence on read: memtable > delta > base. Bounded by
    # DELTA_COMPACT_ROWS — crossing it turns the next flush into a
    # compaction (fold into base), so flush stays O(overlay + delta),
    # never O(base).
    delta: DataFrame | None = None
    delta_rows: int = 0
    delta_gen: int = 0  # live durable delta generation (0 = none)
    base_rows: int | None = None  # cached count; None = not yet computed
    base_io: tuple[int, int] | None = None  # cached (files, bytes) of the base
    gen: int = 0  # live durable base generation (0 = no flushed base)
    ext_path: str | None = None  # externally-registered base parquet path
    unrecovered: bool = False  # base was lost across restart; refuse to serve
    # bumped on every base replacement (compaction install, set-based DML,
    # streaming append); lets a lock-free flush detect a base that changed
    # under its feet and retry instead of clobbering newer data
    base_epoch: int = 0
    # bumped on every delta replacement (flush install, compaction clear) —
    # the same lost-update guard for the delta layer
    delta_epoch: int = 0
    # Driver-side mirror of the delta segment (VERDICT r6 #3): pk →
    # row-dict (None = tombstone), newest-wins already applied. Every
    # delta row ORIGINATED as a driver-side memtable entry, so keeping
    # the folded dict lets flush swap in a fresh snapshot with pure
    # Python + one Arrow LocalRelation — no anti-join job, no
    # localCheckpoint job, no per-query broadcast-build job (a
    # LocalTableScan broadcasts driver-side without launching tasks).
    # None = the live delta did not come from this path (streaming
    # append_batch / durable recovery); flush then rebuilds the mirror
    # with one bounded collect (delta ≤ DELTA_COMPACT_ROWS) or falls
    # back to the DataFrame-chain fold.
    delta_mirror: dict | None = field(default_factory=dict)
    # Per-epoch mirror change log: delta_epoch → (new_rows, replaced_rows)
    # for the flush that produced that epoch (row-dicts; None = tombstone).
    # Lets the read fast path advance a cached (pred, aggs) mirror-partial
    # from epoch e to e+1 by folding O(flush) rows instead of re-folding
    # the whole O(mirror) — the cost that grew linearly with accumulated
    # deltas under sustained ingest (VERDICT r7 #3). Pruned to the last
    # MIRROR_LOG_EPOCHS entries; a gap forces one full refold.
    mirror_log: dict[int, tuple[list, list]] = field(default_factory=dict)
    # Memtable op log: one (old_contrib, new_contrib) per mutation
    # (row-dict or None — tombstones and absences contribute nothing to a
    # fold). Lets the read fast path advance a cached memtable-partial by
    # folding only the ops since its last position instead of the whole
    # overlay per query. mem_log_base is the absolute index of mem_log[0];
    # a cached position below it (log reset/cap) forces one full refold.
    mem_log: list = field(default_factory=list)
    mem_log_base: int = 0
    # Prebuilt per-install delta sub-frames, so the read path reuses the
    # same DataFrame objects for a whole flush cycle instead of respending
    # py4j roundtrips on select/filter per query (the roundtrips, not the
    # JVM work, dominate read latency under a GIL-hungry ingest thread).
    delta_keys: DataFrame | None = None  # delta.select(pk)
    delta_live: DataFrame | None = None  # delta.filter(~__tomb).drop(__tomb)
    # Read fast path (VERDICT r6 #3): per-flush-cycle caches, all cleared
    # on any layer install. read_plans maps (kind, pred-repr, out-cols) →
    # the fully-built cold-layer DataFrame, so repeated analytical reads
    # under sustained ingest skip plan re-construction AND Catalyst
    # re-analysis of the LocalRelation-bearing merge tree (measured: a
    # fresh plan costs ~500 ms under ingest, a cached one ~70 ms).
    read_plans: dict = field(default_factory=dict)
    cold_cache: DataFrame | None = None  # _cold_df result for this cycle
    # (min, max) of base pk, computed once per base epoch — a memtable key
    # outside this range provably has no base row to shadow, which is what
    # lets the hot tail be folded driver-side without an exclusion join.
    base_pk_range: tuple | None = None
    # Shadowed-base-row fetch cache (r8): pk → base row-dict, or _ABSENT
    # for in-range keys with no base row. Serves UPDATE-heavy ingest on
    # the fast path: a hot key INSIDE the base pk range shadows a base row
    # the driver must subtract, and those rows are read straight from the
    # base parquet with pyarrow (the LSM read-the-SSTable path — no Spark
    # plan, no job). Keyed by base_epoch: the base is immutable within
    # one, so each key is fetched at most once per epoch.
    base_fetch: dict = field(default_factory=dict)
    base_fetch_epoch: int = -1
    base_files: list | None = None  # parquet files of base, per epoch
    base_files_epoch: int = -1
    # Distinct in-range hot keys in FIRST-SEEN order (per base epoch;
    # reset with base_fetch). Within a base epoch the shadow set only
    # grows — compaction / set-based DML bump base_epoch and reset — so a
    # cached shadow-partial advances by folding just the keys appended
    # since its position. shadow_seen is its membership set: base_fetch
    # CANNOT serve that role because point lookups warm it with keys
    # that are not hot (they shadow nothing).
    shadow_list: list = field(default_factory=list)
    shadow_seen: set = field(default_factory=set)


class SqlError(Exception):
    pass


# Sentinel for "in-range key with no base row" in the shadowed-base fetch
# cache (None is taken: it would be ambiguous with a NULL-ish row).
_ABSENT = object()


def _arrow_schema(schema: T.StructType):
    """Spark StructType → pyarrow schema for the engine's supported column
    types; None if any field falls outside them (callers then use the
    pandas object-column path)."""
    import pyarrow as pa

    mapping = {
        T.LongType: pa.int64(),
        T.IntegerType: pa.int32(),
        T.DoubleType: pa.float64(),
        T.FloatType: pa.float32(),
        T.BooleanType: pa.bool_(),
        T.StringType: pa.string(),
    }
    fields = []
    for f in schema.fields:
        if isinstance(f.dataType, T.TimestampType):
            fields.append((f.name, pa.timestamp("us", tz="UTC")))
            continue
        pa_type = mapping.get(type(f.dataType))
        if pa_type is None:
            return None
        fields.append((f.name, pa_type))
    return pa.schema(fields)


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
    if t and t[0] == "word" and t[1].upper() == "NOT":
        # hsql parses NOT into kOpNot, which evalWhere's default arm turns
        # into TRUE (query_executor.cpp:691-693). Consume the negated factor
        # so the surrounding AND/OR structure still parses.
        ts.next()
        _parse_pred_factor(ts)
        return ("unknown_op", "NOT")
    if t and t[0] == "op" and t[1] == "(":
        ts.next()
        inner = _parse_pred(ts)
        ts.expect_op(")")
        return inner
    lhs = _parse_operand(ts)
    t = ts.peek()
    if t and t[0] == "word":
        # Operators hsql parses but the reference executor never handles:
        # evalWhere's default arm evaluates them TRUE for every row
        # (query_executor.cpp:691-693). Parse the full form so AND/OR
        # structure survives, then defer TRUE-vs-error to quirk_compat.
        u = t[1].upper()
        if u == "LIKE":
            ts.next()
            _parse_operand(ts)
            return ("unknown_op", "LIKE")
        if u == "IS":
            ts.next()
            ts.accept_word("NOT")
            ts.expect_word("NULL")
            return ("unknown_op", "IS NULL")
        if u == "BETWEEN":
            ts.next()
            _parse_operand(ts)
            ts.expect_word("AND")
            _parse_operand(ts)
            return ("unknown_op", "BETWEEN")
        if u == "IN":
            ts.next()
            ts.expect_op("(")
            _parse_operand(ts)
            while True:
                nxt = ts.next()
                if nxt == ("op", ")"):
                    break
                if nxt != ("op", ","):
                    raise SqlError(f"Expected ',' or ')' in IN list, got {nxt[1]!r}")
                _parse_operand(ts)
            return ("unknown_op", "IN")
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


def _parse_value(ts: _Tokens) -> Any:
    """Operand in *value* position (INSERT VALUES / UPDATE SET): literals
    only. A bare identifier is a parse error, not a stringly value — the
    reference rejects unquoted words in value lists (query_executor.cpp:
    386-391 expects literal tokens)."""
    operand = _parse_operand(ts)
    if operand[0] != "lit":
        raise SqlError(f"Expected a literal value, got identifier {operand[1]!r}")
    return operand[1]


class _FastPathUnsupported(Exception):
    """Raised inside the driver-side read fast path when a case falls
    outside what it can evaluate exactly — callers fall back to the full
    Spark merge-on-read plan, which is always correct."""


_CMP_PY = {
    "=": lambda l, r: l == r,
    "!=": lambda l, r: l != r,
    "<": lambda l, r: l < r,
    "<=": lambda l, r: l <= r,
    ">": lambda l, r: l > r,
    ">=": lambda l, r: l >= r,
}


# Spark's string→double cast accepts signed decimals, scientific notation
# and the special literals (inf/infinity/nan, signed, any case) — but NOT
# Python's extras like underscore separators ('1_0'), which float() happily
# parses to 10.0. The fast path must match Spark row-for-row (review r7).
_FLOAT_RE = re.compile(r"[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?")
_FLOAT_SPECIAL = {"inf", "infinity", "nan"}
_INT_RE = re.compile(r"[+-]?\d+")


def _try_float(v) -> float | None:
    if isinstance(v, str):
        s = v.strip()
        if not (
            _FLOAT_RE.fullmatch(s)
            or s.lower().lstrip("+-") in _FLOAT_SPECIAL
        ):
            return None
        try:
            return float(s)
        except ValueError:
            return None
    try:
        return float(v)
    except (TypeError, ValueError):
        return None


def _apply_cmp(op: str, l: F.Column, r: F.Column) -> F.Column:
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
    if kind == "unknown_op":
        return set()
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
    """``data_dir`` turns on durability: schemas persist to a JSON sidecar
    (the ``schema_registry.hpp:248-344`` analog), every memtable put is
    journaled to a JSON-lines WAL (``wal.hpp:254-368``), and ``flush()``
    writes the base to an on-disk parquet directory. A new
    ``SamanvayEngine(spark, data_dir=...)`` recovers schemas, bases, and the
    unflushed overlay (WAL replay, ``memtable.hpp:481-526``) and serves the
    same rows. Without ``data_dir`` the engine is process-local (flush =
    localCheckpoint), matching rounds 1–2 behavior.

    A single reentrant lock guards all state-mutating/iterating entry points
    — the engine is served by ThreadingHTTPServer and the reference guards
    the shared engine with per-component mutexes.

    PROCESS-WIDE side effect (advisor r7): construction lowers CPython's
    thread switch interval to ``SPARK_GRAFT_GIL_SWITCH`` (default 0.5 ms,
    never raised above the current value) so concurrent analytical readers
    are not starved behind a pure-Python ingest loop — embedders that tune
    the interval themselves should set the env var (e.g. to ``1``) to make
    the engine's floor a no-op; ``close()`` restores the prior value."""

    def __init__(
        self,
        spark: SparkSession,
        quirk_compat: bool = True,
        data_dir: str | None = None,
        retention_versions: int = 0,
    ):
        self.spark = spark
        self.quirk_compat = quirk_compat
        # Time travel horizon (r14): how many layout versions BEHIND the
        # live one stay readable via `SELECT ... FROM t VERSION AS OF n` /
        # read_version(). 0 = vacuum-on-commit (the reference's behavior,
        # pinned by tests/test_durability.py): old generation dirs are
        # collected immediately and only the live version is readable.
        # Clamped to the txlog's manifest-pruning horizon (HISTORY_KEEP):
        # a larger value would silently shrink back to it once _prune
        # deletes the older manifests, so refuse loudly instead (r15,
        # ADVICE).
        requested = max(0, int(retention_versions))
        if requested > TableTxLog.HISTORY_KEEP:
            raise ValueError(
                f"retention_versions={requested} exceeds the transaction "
                f"log's manifest retention (HISTORY_KEEP="
                f"{TableTxLog.HISTORY_KEEP}); versions past it would be "
                f"vacuumed once their manifests are pruned. Raise "
                f"TableTxLog.HISTORY_KEEP or lower retention_versions."
            )
        self.retention_versions = requested
        # Mixed-workload GIL tuning: a driver-side ingest loop is
        # compute-bound pure Python, so at CPython's default 5 ms switch
        # interval EVERY py4j wake of a concurrent analytical reader can
        # wait up to 5 ms behind it — ~30-60 wakes per query ⇒ hundreds of
        # ms of pure scheduler queuing (measured: +347% mixed-read latency
        # at 5 ms vs +128% at 0.5 ms, same workload). 0.5 ms caps the
        # per-wake wait at negligible ingest-throughput cost. Only ever
        # lowered, never raised; env-overridable for embedders that tune
        # it themselves.
        import sys as _sys

        target = float(os.environ.get("SPARK_GRAFT_GIL_SWITCH", "0.0005"))
        self._prev_switch_interval: float | None = None
        if target < _sys.getswitchinterval():
            self._prev_switch_interval = _sys.getswitchinterval()
            _sys.setswitchinterval(target)
        self.autoflush_rows: int | None = self.AUTOFLUSH_ROWS
        # Escape hatch: False forces every read through the full Spark
        # merge-on-read plan (the fast path is differential-pinned to it,
        # tests/test_read_fastpath.py, so answers cannot change). Used by
        # the bench to measure the uncached scan cost — the honest
        # denominator for degradation ratios — and available to embedders
        # that want plan-only behavior.
        self.read_fastpath_enabled: bool = True
        self.tables: dict[str, TableState] = {}
        self._seq = 0
        self._lock = threading.RLock()
        # Auto-flush runs AFTER the tripping statement releases the engine
        # lock (execute() drains this queue), so the expensive overlay fold
        # never serializes concurrent readers behind it; the gate keeps one
        # flusher at a time without holding the engine lock.
        self._flush_queue: set[str] = set()
        self._flush_gate = threading.Lock()
        # per-thread marker: did THIS statement trip the auto-flush
        # threshold? Only then does execute() drain the queue — reads
        # never pay a pending fold inside their own latency.
        self._wrote = threading.local()
        self.data_dir = data_dir
        # Operation counters surfaced by status() (reference:
        # StorageEngineStats, api/json_helpers.hpp:72-104)
        self.stats: dict[str, int] = {
            "total_writes": 0,
            "total_reads": 0,
            "total_range_queries": 0,
            "total_flushes": 0,
            # r8 driver-side read-path observability: how many pk-equality
            # SELECTs the zero-job point path served, and how many pyarrow
            # base reads it (plus the shadowed-base fetch) performed —
            # lookups minus reads ≈ fetch-cache hit count.
            "point_lookups": 0,
            "base_point_reads": 0,
        }
        # Times the overlay Arrow fast path fell back to the verified slow
        # path (see _hot_df) — nonzero here means sustained-ingest reads
        # are quietly paying the ~1 s-per-query verification cost again.
        self.arrow_fallbacks = 0
        if data_dir is not None:
            os.makedirs(data_dir, exist_ok=True)
            self._recover()

    def close(self) -> None:
        """Release process-global side effects (currently: restore the
        CPython switch interval lowered by __init__). Safe to call twice;
        the engine remains usable for reads afterwards."""
        if self._prev_switch_interval is not None:
            import sys as _sys

            _sys.setswitchinterval(self._prev_switch_interval)
            self._prev_switch_interval = None

    # -- durability (schema sidecar + WAL + parquet base) --------------------

    @property
    def _schemas_path(self) -> str:
        return os.path.join(self.data_dir, "_schemas.json")

    @property
    def _wal_path(self) -> str:
        return os.path.join(self.data_dir, "wal.jsonl")

    def _table_data_path(self, name: str) -> str:
        return os.path.join(self.data_dir, f"table_{name}")

    def _gen_path(self, name: str, gen: int) -> str:
        """Versioned base directory. Each flush writes a FRESH generation
        (table_<name>/gen_<n>) and the atomic sidecar swap commits it — the
        Spark analog of the reference LSM writing new SSTables and swapping
        the manifest, never destroying the old level in place
        (sstable.hpp write-then-rename)."""
        return os.path.join(self._table_data_path(name), f"gen_{gen}")

    def _delta_path(self, name: str, gen: int) -> str:
        """Versioned delta segment directory (the L0 layer): each flush
        writes a FRESH delta_<n> committed by the sidecar swap, exactly
        like base generations."""
        return os.path.join(self._table_data_path(name), f"delta_{gen}")

    def _persist_schemas(self) -> None:
        """Atomic rewrite of the schema sidecar (reference persists the
        registry as a text sidecar on every DDL, schema_registry.hpp:248-344).
        The sidecar records the LIVE base generation per table — os.replace
        is the commit point, so a crash mid-flush leaves the previous
        generation live and intact."""
        if self.data_dir is None:
            return
        doc = {
            name: {
                "schema": state.schema.jsonValue(),
                "pk": state.pk,
                "not_null": sorted(state.not_null),
                "gen": state.gen,
                "delta_gen": state.delta_gen if state.delta is not None else 0,
                "delta_rows": state.delta_rows,
                "ext_path": state.ext_path,
                # external-no-path bases (e.g. streamed-in localCheckpoints)
                # cannot be re-read after restart; record the fact so
                # recovery refuses to serve silently-empty data.
                "ext_volatile": state.base is not None
                and state.gen == 0
                and state.ext_path is None,
            }
            for name, state in self.tables.items()
        }
        tmp = self._schemas_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(doc, fh)
        os.replace(tmp, self._schemas_path)

    def _wal_append(self, table: str, pk: Any, seq: int, row: dict | None) -> None:
        """Journal one memtable put (insert/update/tombstone). The reference
        WAL is a CRC-framed binary log (wal.hpp:120-180); JSON-lines gives the
        same replay contract for the driver-side overlay, whose size is bounded
        by the hot-row budget — the analytical base never flows through here."""
        if self.data_dir is None:
            return
        rec = {"t": table, "k": pk, "s": seq, "r": row}
        with open(self._wal_path, "a") as fh:
            # default=str covers temporal values; replay restores the typed
            # objects from the schema (_decode_wal_row)
            fh.write(json.dumps(rec, default=str) + "\n")

    def _rewrite_wal(self) -> None:
        """Rebuild the WAL from the live memtables (the reference truncates
        the WAL after a successful flush, memtable.hpp:226-236)."""
        if self.data_dir is None:
            return
        tmp = self._wal_path + ".tmp"
        with open(tmp, "w") as fh:
            for name, state in self.tables.items():
                for pk, (seq, row) in state.memtable.items():
                    fh.write(
                        json.dumps(
                            {"t": name, "k": pk, "s": seq, "r": row}, default=str
                        )
                        + "\n"
                    )
        os.replace(tmp, self._wal_path)

    def _recover(self) -> None:
        """Restart recovery: schema sidecar → parquet bases → WAL replay
        (reference boot order: registry load, SSTable manifest, WAL replay
        into a fresh memtable, memtable.hpp:481-526)."""
        if not os.path.exists(self._schemas_path):
            return
        with open(self._schemas_path) as fh:
            doc = json.load(fh)
        for name, meta in doc.items():
            schema = T.StructType.fromJson(meta["schema"])
            base = None
            gen = int(meta.get("gen", 0))
            delta_rows_meta = int(meta.get("delta_rows", 0))
            ext_path = meta.get("ext_path")
            unrecovered = False
            # Layout: prefer the per-table transaction log's newest
            # committed manifest over the sidecar pointers (txlog.py crash
            # matrix — the log commits BEFORE the sidecar swap, so in the
            # crash window between the two the log is the newer truth and
            # its referenced dirs are guaranteed fully written). Adopt it
            # only when every referenced dir actually exists; otherwise
            # the sidecar rules, exactly as before the log existed.
            tx = TableTxLog(self._table_data_path(name)).latest()
            if tx is not None:
                man = tx[1]
                tgen = int(man.get("base_gen") or 0)
                tdgen = int(man.get("delta_gen") or 0)
                if (tgen == 0 or os.path.isdir(self._gen_path(name, tgen))) and (
                    tdgen == 0 or os.path.isdir(self._delta_path(name, tdgen))
                ):
                    if tgen != gen or tdgen != int(meta.get("delta_gen", 0)):
                        delta_rows_meta = int(man.get("delta_rows") or 0)
                    gen = tgen
                    meta = dict(meta)
                    meta["delta_gen"] = tdgen
            if gen and os.path.isdir(self._gen_path(name, gen)):
                base = self.spark.read.parquet(self._gen_path(name, gen))
            elif meta.get("has_base") and os.path.isdir(self._table_data_path(name)):
                # legacy (pre-generation) sidecar: base lives directly in
                # table_<name>; adopt it as generation 1 on the next flush.
                base = self.spark.read.parquet(self._table_data_path(name))
            elif ext_path is not None:
                if os.path.isdir(ext_path) or os.path.isfile(ext_path):
                    base = self.spark.read.parquet(ext_path)
                else:
                    unrecovered = True  # registered path vanished
            elif meta.get("ext_volatile"):
                # base was registered from an in-memory DataFrame and never
                # flushed — it cannot be rebuilt. Serving just the overlay
                # would silently drop the registered rows, so poison the
                # table instead (ADVICE r3: engine.py register_base/recovery).
                unrecovered = True
            delta = None
            delta_gen = int(meta.get("delta_gen", 0))
            if delta_gen:
                if os.path.isdir(self._delta_path(name, delta_gen)):
                    delta = self.spark.read.parquet(
                        self._delta_path(name, delta_gen)
                    )
                else:
                    unrecovered = True  # committed delta segment vanished
            self.tables[name] = TableState(
                name=name,
                schema=schema,
                pk=meta["pk"],
                not_null=set(meta["not_null"]),
                base=base,
                gen=gen,
                delta=delta,
                delta_gen=delta_gen,
                delta_rows=delta_rows_meta if delta is not None else 0,
                # recovered delta did not come through the mirror path —
                # None makes the next flush rebuild it with one bounded
                # collect instead of silently dropping the recovered rows
                delta_mirror=None if delta is not None else {},
                ext_path=ext_path,
                unrecovered=unrecovered,
            )
        if os.path.exists(self._wal_path):
            with open(self._wal_path) as fh:
                for line in fh:
                    line = line.strip()
                    if not line:
                        continue
                    rec = json.loads(line)
                    state = self.tables.get(rec["t"])
                    if state is None:
                        continue  # table dropped after the WAL entry
                    row = self._decode_wal_row(state, rec["r"])
                    self._mem_put(state, rec["k"], rec["s"], row)
                    self._seq = max(self._seq, rec["s"])

    @staticmethod
    def _decode_wal_row(state: TableState, row: dict | None) -> dict | None:
        """Restore typed values JSON stringified on the way out (temporal
        columns — everything else round-trips natively)."""
        if row is None:
            return None
        import datetime as _dt

        for f in state.schema.fields:
            v = row.get(f.name)
            if not isinstance(v, str):
                continue
            if isinstance(f.dataType, (T.TimestampNTZType, T.TimestampType)):
                row[f.name] = _dt.datetime.fromisoformat(v)
            elif isinstance(f.dataType, T.DateType):
                row[f.name] = _dt.date.fromisoformat(v)
        return row

    # -- public API ---------------------------------------------------------

    def execute(self, sql: str) -> ResultSet:
        start = time.perf_counter()
        self._wrote.flag = False
        try:
            with self._lock:
                result = self._dispatch(sql)
            # A SELECT comes back as a deferred action (in-memory mode):
            # the plan was frozen under the lock — overlay rows copied
            # eagerly, base/delta immutable checkpoints — so the Spark job
            # itself runs HERE, unlocked. Under sustained ingest this
            # stops a 100 ms+ analytical collect from serializing against
            # every single-row INSERT (VERDICT r6 #3 measured the queue
            # as the largest slice of the 3× read degradation).
            if callable(result):
                result = result()
            # Auto-flush outside the statement lock: a tripping WRITE
            # statement pays the fold (bounding the overlay at the
            # threshold for a single writer) while concurrent statements
            # keep executing. Reads never drain — under sustained ingest
            # the flush queue is almost always non-empty, and an
            # analytical query that pops it pays a whole fold inside its
            # own latency (the bench measured exactly this).
            if getattr(self._wrote, "flag", False):
                self._drain_autoflushes()
        except SqlError as exc:
            result = ResultSet(error_message=str(exc))
        except _EXECUTION_ERRORS as exc:
            # The SQL surface contract: malformed input comes back as a
            # clean error_message, never an unhandled exception — the
            # REPL/REST layers (and the reference's error strings) depend
            # on it. Differential fuzz found the optimizer throwing
            # NumberFormatException for `bigint_col = 'a'` before the
            # try_cast fix; these are the EXPECTED execution-layer
            # families (pyspark analysis/ANSI-cast errors surface as
            # PySparkException; JVM faults as Py4JError).
            result = ResultSet(error_message=f"{type(exc).__name__}: {exc}")
        except Exception as exc:  # pragma: no cover - genuine engine defects
            # Anything else is NOT an expected SQL failure: keep the
            # clean-error surface contract, but log the full traceback so
            # internal regressions can't masquerade as ordinary SQL
            # errors (advisor r7).
            import traceback

            logging.getLogger(__name__).warning(
                "unexpected engine failure for %r:\n%s",
                sql,
                traceback.format_exc(),
            )
            result = ResultSet(error_message=f"{type(exc).__name__}: {exc}")
        result.execution_time_ms = (time.perf_counter() - start) * 1000.0
        return result

    def register_base(self, name: str, df: DataFrame, pk: str, path: str | None = None) -> None:
        """Register a parquet-backed table as the analytic base (the LSM
        levels); subsequent DML overlays it through the memtable.

        Pass ``path`` (the parquet location ``df`` was read from) to make
        the registration durable: the sidecar records it and restart
        recovery re-reads it. Without a path the base is volatile — after
        a restart the engine REFUSES to serve the table (instead of
        silently returning overlay-only rows) until it is re-registered
        or flushed (ADVICE r3)."""
        with self._lock:
            name = name.lower()
            self.tables[name] = TableState(
                name=name,
                schema=df.schema,
                pk=pk.lower(),
                not_null=set(),
                base=df,
                ext_path=path,
            )
            self._commit_layout(self.tables[name])
            self._persist_schemas()

    def append_batch(self, name: str, df: DataFrame, pk: str) -> None:
        """Locked append of a streaming micro-batch — the foreachBatch
        entry point (the stream's thread races the threaded REST server's
        SQL, so the read-modify-write holds the engine lock, ADVICE r3).

        The batch lands in the DELTA layer, not the base: batch rows are
        the NEWEST versions of their pks, and the read path ranks
        memtable > delta > base — appending to the base would leave any
        previously-flushed tombstone or stale delta version permanently
        shadowing the fresh rows (review r6). Folding into the delta keeps
        the LSM ingest shape (micro-batch → L0, O(batch + delta)), and in
        durable mode the batch lands in a committed delta_<n> parquet
        generation instead of a restart-volatile checkpoint."""
        with self._lock:
            state = self.tables.get(name.lower())
            if state is None:
                self.register_base(name, df, pk=pk)
                return
            batch = df.select(
                *[F.col(f.name) for f in state.schema.fields]
            ).withColumn("__tomb", F.lit(False))
            if state.delta is None:
                new_delta = batch
            else:
                new_delta = state.delta.join(
                    batch.select(state.pk), on=state.pk, how="left_anti"
                ).unionByName(batch)
            if self.data_dir is None:
                new_delta = new_delta.localCheckpoint(eager=True)
            self._install_delta(state, new_delta, None)
            self._commit_layout(state)
            self._persist_schemas()
            self._gc_generations(state)
            if state.delta_rows > self.DELTA_COMPACT_ROWS:
                self.compact(name)  # reentrant lock; rare O(base) fold

    def table_df(self, name: str) -> DataFrame:
        """Current merged view of a table (base ∪ memtable overlay)."""
        with self._lock:
            state = self._state(name)
            return self._merged_df(state)

    def flush(self, name: str) -> int:
        """Flush the memtable into the DELTA layer — O(overlay + delta),
        never O(base). This is the reference's memtable→L0 flush
        (memtable.hpp:140-236): the base is untouched; flushed rows live in
        a small per-table delta segment (table columns + __tomb) that reads
        overlay via one bounded anti-join. Only when the accumulated delta
        would cross DELTA_COMPACT_ROWS — or a durable engine must take
        ownership of a not-yet-generational base — does the flush escalate
        to a compaction (full fold, the reference's L0→deeper merge).
        Before this split, every flush folded the FULL base
        (localCheckpoint of 1M+ rows): the sustained-ingest bench measured
        analytical queries stalling behind those folds.

        Reader-friendly: in-memory mode holds the engine lock only to
        SNAPSHOT the overlay and to INSTALL the merged delta; the fold
        runs unlocked, with base/delta epoch guards aborting the install
        (and retrying) if a compaction or set-based DML replaced either
        layer mid-fold. Entries that gained a NEWER seq during the fold
        stay in the overlay and still win the merge.

        The non-compacting fold is SNAPSHOT-SWAP in the driver (VERDICT
        r6 #3): every delta row originated as a driver-side memtable
        entry, so the fold is a pure-Python dict merge over the delta
        MIRROR followed by one Arrow LocalRelation build — no anti-join
        job, no localCheckpoint job, no count job. Readers then union the
        swapped-in LocalRelation, whose broadcast builds driver-side
        without launching tasks. (The previous DataFrame-chain fold cost
        ~1 s of Spark jobs per 15k-row flush and a 1.3 s first-read cache
        fill — both measured against this path.)

        DURABLE mode keeps the fully locked fold: its delta/base are
        parquet generation directories that a concurrent install would
        garbage-collect mid-job — but the locked section is now O(overlay),
        so readers no longer queue behind a base rewrite. Returns the
        flushed count."""
        with self._maintenance_pool():
            return self._flush_impl(name)

    def _maintenance_pool(self):
        """Scheduler-pool scope for HTAP maintenance jobs (flush folds,
        compactions): under FAIR mode (session.py) these run in their own
        pool so concurrent analytical reads share task slots instead of
        queuing FIFO behind an O(base) fold for its full duration."""
        import contextlib

        sc = self.spark.sparkContext

        @contextlib.contextmanager
        def scope():
            prev = sc.getLocalProperty("spark.scheduler.pool")
            sc.setLocalProperty("spark.scheduler.pool", "samanvay_maintenance")
            try:
                yield
            finally:
                sc.setLocalProperty("spark.scheduler.pool", prev)

        return scope()

    def _flush_impl(self, name: str) -> int:
        if self.data_dir is not None:
            with self._lock:
                return self._flush_locked(name)
        for _ in range(3):
            with self._lock:
                state = self._state(name)
                n = len(state.memtable)
                if not n:
                    return 0
                snapshot = dict(state.memtable)
                b_epoch = state.base_epoch
                d_epoch = state.delta_epoch
                compacting = self._needs_compaction(state)
                # the compacting plan copies the overlay rows in eagerly,
                # so it is frozen at snapshot time
                plan = self._merged_df(state) if compacting else None
                mirror = state.delta_mirror
                delta_df = state.delta
            # Slow part — unlocked.
            if compacting:
                materialized = plan.localCheckpoint(eager=True)
            else:
                if mirror is None:
                    # delta came from streaming append / recovery: rebuild
                    # the mirror once (bounded by DELTA_COMPACT_ROWS)
                    mirror = self._mirror_from_delta(state, delta_df)
                log = (
                    [row for _seq, row in snapshot.values()],
                    [mirror[pk] for pk in snapshot if pk in mirror],
                )
                new_mirror = dict(mirror)
                for pk, (_seq, row) in snapshot.items():
                    new_mirror[pk] = row
                materialized = self._delta_df_from_mirror(state, new_mirror)
            with self._lock:
                if state.base_epoch != b_epoch or state.delta_epoch != d_epoch:
                    continue  # a layer was replaced under us: retry fresh
                if compacting:
                    self._install_base(state, materialized)
                    self._clear_delta(state)
                else:
                    self._install_delta(
                        state,
                        materialized,
                        len(new_mirror),
                        mirror=new_mirror,
                        log=log,
                    )
                self._drop_flushed(state, snapshot)
                self.stats["total_flushes"] += 1
            return n
        # Pathologically contended: fall back to the fully locked path.
        with self._lock:
            return self._flush_locked(name)

    def _flush_locked(self, name: str) -> int:
        """Flush under the engine lock (durable mode + contention
        fallback). The delta path writes the new segment straight from the
        plan — it reads the old delta dir plus in-memory rows, both stable
        under the lock."""
        state = self._state(name)
        n = len(state.memtable)
        if not n:
            return 0
        snapshot = dict(state.memtable)
        if self._needs_compaction(state):
            merged = self._merged_df(state).localCheckpoint(eager=True)
            self._install_base(state, merged)
            self._clear_delta(state)
        else:
            mirror = state.delta_mirror
            if mirror is None:
                mirror = self._mirror_from_delta(state, state.delta)
            log = (
                [row for _seq, row in snapshot.values()],
                [mirror[pk] for pk in snapshot if pk in mirror],
            )
            new_mirror = dict(mirror)
            for pk, (_seq, row) in snapshot.items():
                new_mirror[pk] = row
            # LocalRelation — already materialized driver-side, no
            # lineage to break; durable mode writes it to the delta
            # generation directory inside _install_delta
            df = self._delta_df_from_mirror(state, new_mirror)
            self._install_delta(
                state, df, len(new_mirror), mirror=new_mirror, log=log
            )
        self._drop_flushed(state, snapshot)
        self.stats["total_flushes"] += 1
        # Sidecar commit BEFORE WAL truncation: a crash between the two
        # must leave the row in at least one durable place. Replaying a
        # WAL entry that was already flushed is idempotent (newest-wins);
        # truncating the WAL before the new segment is committed loses
        # acknowledged writes (review r6).
        self._commit_layout(state)
        self._persist_schemas()
        self._rewrite_wal()
        self._gc_generations(state)
        return n

    def _needs_compaction(self, state: TableState) -> bool:
        if state.delta_rows + len(state.memtable) > self.DELTA_COMPACT_ROWS:
            return True
        # A durable engine's first flush over a base that is not yet a
        # generation directory (externally registered path or a volatile
        # in-memory DataFrame) folds fully: that is what converts the base
        # to durably-owned gen_1 (test_registered_base_flush_converts_*).
        return (
            self.data_dir is not None
            and state.base is not None
            and state.gen == 0
        )

    def _delta_df_from_mirror(self, state: TableState, mirror: dict) -> DataFrame:
        """Delta mirror (pk → row-dict | None-tombstone) → the delta
        segment DataFrame: table columns + __tomb marker, one row per pk.
        Tombstones become marker rows so they keep shadowing base rows
        after the memtable entry is dropped. Built as one Arrow
        LocalRelation — materialized driver-side, zero Spark jobs."""
        cols = [f.name for f in state.schema.fields]
        rows = []
        for pk, row in mirror.items():
            if row is None:
                rows.append(
                    tuple(pk if c == state.pk else None for c in cols) + (True,)
                )
            else:
                rows.append(tuple(row[c] for c in cols) + (False,))
        # fully nullable: tombstone rows carry NULL in (possibly NOT NULL)
        # non-pk columns; nullability here is segment layout, not the
        # table contract (validation happened at write time)
        schema = T.StructType(
            [T.StructField(f.name, f.dataType, True) for f in state.schema.fields]
            + [T.StructField("__tomb", T.BooleanType(), False)]
        )
        return self._hot_df(rows, cols + ["__tomb"], schema)

    def _mirror_from_delta(
        self, state: TableState, delta_df: DataFrame | None
    ) -> dict:
        """Rebuild the driver-side delta mirror from a delta segment that
        did not come through the mirror path (durable recovery, streaming
        append_batch). One collect, bounded by DELTA_COMPACT_ROWS."""
        if delta_df is None:
            return {}
        mirror: dict = {}
        for r in delta_df.collect():
            d = r.asDict()
            tomb = d.pop("__tomb")
            mirror[d[state.pk]] = None if tomb else d
        return mirror

    # Mirror-partial upgrade horizon: a fold cache entry older than this
    # many flush epochs takes one full refold instead of replaying logs.
    MIRROR_LOG_EPOCHS = 32

    def _install_delta(
        self,
        state: TableState,
        delta_df: DataFrame,
        rows: int | None,
        mirror: dict | None = None,
        log: tuple[list, list] | None = None,
    ) -> None:
        """Make ``delta_df`` the live delta segment. Durable mode writes a
        fresh delta_<n> directory committed by the sidecar swap (same
        write-then-commit discipline as _install_base); the old segment is
        GC'd only after the commit. ``mirror`` carries the driver-side
        fold the segment was built from (None when it came from a
        DataFrame chain — the next flush rebuilds it)."""
        if self.data_dir is not None:
            new_gen = state.delta_gen + 1
            path = self._delta_path(state.name, new_gen)
            delta_df.write.mode("overwrite").parquet(path)
            state.delta = self.spark.read.parquet(path)
            state.delta_gen = new_gen
            state.delta_rows = (
                state.delta.count() if rows is None else rows
            )
        else:
            state.delta = delta_df
            state.delta_rows = delta_df.count() if rows is None else rows
        state.delta_mirror = mirror
        state.delta_keys = state.delta.select(state.pk)
        state.delta_live = state.delta.filter(~F.col("__tomb")).drop("__tomb")
        # read_plans survives delta installs by design: fast-path plans
        # cover the BASE layer only, so a flush does not invalidate them
        state.cold_cache = None
        state.delta_epoch += 1
        if log is not None:
            state.mirror_log[state.delta_epoch] = log
            for e in [
                e
                for e in state.mirror_log
                if e <= state.delta_epoch - self.MIRROR_LOG_EPOCHS
            ]:
                del state.mirror_log[e]

    def _clear_delta(self, state: TableState) -> None:
        state.delta = None
        state.delta_rows = 0
        state.delta_mirror = {}
        state.delta_keys = None
        state.delta_live = None
        state.cold_cache = None
        state.delta_epoch += 1
        # post-compaction the mirror is empty: stale logs must not bridge
        # a cached partial across the reset
        state.mirror_log.clear()

    # Memtable op-log cap: past this, reset (cached partials refold once).
    MEM_LOG_CAP = 100_000

    @classmethod
    def _mem_put(cls, state: TableState, pk: Any, seq: int, row: dict | None) -> None:
        """The single memtable write point: applies the put AND appends the
        (pk, old_contrib, new_contrib) op so cached fold partials AND the
        hot-key/shadow sets can advance incrementally instead of
        re-scanning the whole overlay per read (the pk rides along
        because a tombstone op has both contribs None — r15, the
        mixed-load lock-hold fix)."""
        old = state.memtable.get(pk)
        state.memtable[pk] = (seq, row)
        state.mem_log.append((pk, old[1] if old is not None else None, row))
        if len(state.mem_log) > cls.MEM_LOG_CAP:
            state.mem_log_base += len(state.mem_log)
            state.mem_log.clear()

    @staticmethod
    def _mem_clear(state: TableState) -> None:
        """Clear the memtable and invalidate incremental fold positions."""
        state.mem_log_base += len(state.mem_log) + 1
        state.mem_log.clear()
        state.memtable.clear()

    @staticmethod
    def _drop_flushed(state: TableState, snapshot: dict) -> None:
        for pk, (seq, _row) in snapshot.items():
            cur = state.memtable.get(pk)
            if cur is not None and cur[0] == seq:
                del state.memtable[pk]
        # Invalidate incremental fold positions instead of logging one
        # subtraction op per flushed row: the post-flush overlay is tiny
        # (rows written during the unlocked fold), so a fresh refold is
        # cheaper than a snapshot-sized replay — and float SUM partials
        # never accumulate subtraction drift (advisor r7: repeated
        # add-then-subtract of doubles walks the low-order bits away from
        # what a fresh fold computes).
        state.mem_log_base += len(state.mem_log) + 1
        state.mem_log.clear()

    def _install_base(self, state: TableState, merged: DataFrame) -> None:
        """Make ``merged`` (already checkpointed) the table's base. Durable
        mode writes a FRESH generation directory and relies on the caller
        to commit it via the atomic sidecar swap in _persist_schemas and
        THEN garbage-collect older generations (_gc_generations) — in that
        order: a crash between install and sidecar commit must leave the
        OLD generation on disk (the sidecar still points at it), so GC
        before the commit would silently lose the whole base on recovery.
        Either way a crash leaves one generation fully intact, never a
        half-deleted base (the reference LSM writes new SSTables and swaps
        the manifest; ADVICE r3 flagged the old in-place overwrite as
        crash-unsafe)."""
        if self.data_dir is not None:
            new_gen = state.gen + 1
            path = self._gen_path(state.name, new_gen)
            # overwrite is safe here: gen_<n> is a fresh name; a leftover
            # from a crashed earlier attempt at this generation is garbage.
            merged.write.mode("overwrite").parquet(path)
            state.base = self.spark.read.parquet(path)
            state.gen = new_gen
            state.ext_path = None  # durably owned now
        else:
            state.base = merged
        state.base_epoch += 1
        state.base_rows = None  # invalidate cached EXPLAIN estimates
        state.base_io = None
        state.base_pk_range = None
        state.read_plans.clear()
        state.cold_cache = None

    def _commit_layout(self, state: TableState) -> None:
        """Append the table's current layout to its per-table transaction
        log (txlog.py — the table-format seam, VERDICT r12 #6). This is
        the LAYOUT commit point: it runs BEFORE _persist_schemas at every
        durable generation/delta swap, so a crash between the two leaves
        recovery a newer committed layout to prefer (the referenced dirs
        are always fully written before this call; the not-yet-truncated
        WAL replays idempotently on top). The sidecar swap remains the
        SCHEMA commit. No-op in in-memory mode."""
        if self.data_dir is None:
            return
        TableTxLog(self._table_data_path(state.name)).commit(
            {
                "base_gen": state.gen,
                "base_dir": f"gen_{state.gen}" if state.gen else None,
                "delta_gen": (
                    state.delta_gen if state.delta is not None else 0
                ),
                "delta_dir": (
                    f"delta_{state.delta_gen}"
                    if state.delta is not None and state.delta_gen
                    else None
                ),
                "delta_rows": state.delta_rows,
                "ext_path": state.ext_path,
            }
        )

    def table_history(self, name: str, n: int = 10) -> list[dict]:
        """Layout-commit history for a table (newest first) — the
        table-format DESCRIBE HISTORY shape, read from the per-table
        transaction log. Empty for in-memory engines."""
        if self.data_dir is None:
            return []
        with self._lock:
            state = self._state(name)
            return TableTxLog(self._table_data_path(state.name)).history(n)

    def read_version(self, name: str, version: int) -> DataFrame:
        """Time travel (r14): the table AS OF a committed layout version —
        the merged view (base generation + delta segment, newest-wins with
        tombstones applied) the txlog manifest for ``version`` describes.
        No overlay: memtable/WAL rows postdate every committed version.
        Readability is bounded by ``retention_versions`` (default 0 =
        vacuum-on-commit, the reference's behavior — only the live version
        is readable); a version whose dirs were collected raises with a
        pointer at the retention knob. Schema evolution is out of scope
        (the engine has no ALTER TABLE), so the current schema applies."""
        with self._lock:
            state = self._state(name)
            if self.data_dir is None:
                raise SqlError(
                    "VERSION AS OF requires a durable engine (data_dir)"
                )
            log = TableTxLog(self._table_data_path(state.name))
            try:
                man = log.read(int(version))
            except (OSError, json.JSONDecodeError):
                raise SqlError(
                    f"No committed version {version} for table {state.name}"
                    f" (log is at {log.latest_version()})"
                )
            return self._layout_df(state, man, int(version))

    def _layout_df(self, state: TableState, man: dict, version: int) -> DataFrame:
        def vacuumed(ref: str) -> SqlError:
            return SqlError(
                f"Version {version} of {state.name} is no longer readable: "
                f"{ref} was vacuumed. Construct the engine with "
                f"retention_versions >= the history depth you need."
            )

        base = None
        gen = int(man.get("base_gen") or 0)
        if gen:
            p = self._gen_path(state.name, gen)
            if not os.path.isdir(p):
                raise vacuumed(f"generation {gen}")
            base = self.spark.read.parquet(p)
        elif man.get("ext_path"):
            p = man["ext_path"]
            if not (os.path.isdir(p) or os.path.isfile(p)):
                raise vacuumed(f"external base {p}")
            base = self.spark.read.parquet(p)
        if base is None:
            base = self.spark.createDataFrame([], state.schema)
        dgen = int(man.get("delta_gen") or 0)
        if dgen:
            p = self._delta_path(state.name, dgen)
            if not os.path.isdir(p):
                raise vacuumed(f"delta segment {dgen}")
            delta = self.spark.read.parquet(p)
            base = base.join(
                F.broadcast(delta.select(state.pk)),
                on=state.pk,
                how="left_anti",
            ).unionByName(delta.filter(~F.col("__tomb")).drop("__tomb"))
        return base

    def read_changes(
        self, name: str, v_from: int, v_to: int
    ) -> DataFrame:
        """Change-data-feed over the txlog seam (r14): the row-level diff
        between two committed layout versions — the Delta CDF /
        `table_changes()` shape. Returns the table columns plus
        ``_change_type`` in {'insert', 'update_postimage', 'delete'};
        deletes carry the v_from row, inserts/updates the v_to row.
        Both endpoints must still be readable (``retention_versions``),
        so the feed's horizon is the time-travel horizon. Derived by
        keyed anti/equi joins between the two reconstructed layouts —
        at scale that is two broadcast-or-shuffle hash joins on the pk,
        never a full-table sort."""
        if int(v_to) <= int(v_from):
            raise SqlError(
                f"read_changes requires v_from < v_to (got {v_from}, {v_to})"
            )
        with self._lock:
            state = self._state(name)
        old = self.read_version(name, int(v_from))
        new = self.read_version(name, int(v_to))
        pk = state.pk
        cols = [f.name for f in state.schema.fields]
        inserts = new.join(
            old.select(pk), on=pk, how="left_anti"
        ).withColumn("_change_type", F.lit("insert"))
        deletes = old.join(
            new.select(pk), on=pk, how="left_anti"
        ).withColumn("_change_type", F.lit("delete"))
        non_pk = [c for c in cols if c != pk]
        both = new.alias("n").join(old.alias("o"), on=pk, how="inner")
        if non_pk:
            changed = both.filter(
                ~(
                    F.struct(*[F.col(f"n.{c}") for c in non_pk]).eqNullSafe(
                        F.struct(*[F.col(f"o.{c}") for c in non_pk])
                    )
                )
            )
        else:
            changed = both.filter(F.lit(False))  # pk-only table: no updates
        updates = changed.select(
            pk, *[F.col(f"n.{c}") for c in non_pk]
        ).withColumn("_change_type", F.lit("update_postimage"))
        return inserts.unionByName(updates).unionByName(deletes)

    def _history_result(self, name: str) -> ResultSet:
        """table_history rendered as a ResultSet — the `DESCRIBE HISTORY t`
        / shell `\\history t` view (r14)."""
        import datetime as _dt

        hist = self.table_history(name)
        rows = []
        for m in hist:
            ts = m.get("committed_at")
            when = (
                _dt.datetime.fromtimestamp(ts).strftime("%Y-%m-%d %H:%M:%S")
                if ts
                else ""
            )
            rows.append(
                (
                    m.get("v"),
                    when,
                    m.get("base_dir") or "",
                    m.get("delta_dir") or "",
                    m.get("delta_rows") or 0,
                    m.get("ext_path") or "",
                )
            )
        return ResultSet(
            headers=[
                "version",
                "committed_at",
                "base_dir",
                "delta_dir",
                "delta_rows",
                "ext_path",
            ],
            rows=rows,
        )

    def _gc_generations(self, state: TableState) -> None:
        """Drop generation dirs older than the live one (and any stale
        legacy part-files directly under table_<name>). Must run AFTER the
        sidecar commit (_persist_schemas): a crash between install and
        commit leaves the sidecar pointing at the OLD generation, which
        must therefore still exist. No-op in in-memory mode."""
        if self.data_dir is None:
            return
        tdir = self._table_data_path(state.name)
        if not os.path.isdir(tdir):
            return
        keep = {f"gen_{state.gen}"}
        if state.delta is not None:
            keep.add(f"delta_{state.delta_gen}")
        # defensive union with the transaction log's keep-set: never
        # collect a dir a RETAINED committed manifest still references
        # (retention_versions = 0 keeps vacuum-on-commit — only the live
        # manifest's dirs survive, the behavior test_durability pins;
        # > 0 keeps that many historical versions VERSION AS OF-readable)
        keep |= TableTxLog(tdir).retained_refs(self.retention_versions)
        for entry in os.listdir(tdir):
            full = os.path.join(tdir, entry)
            if entry in keep:
                continue
            if (
                entry.startswith("gen_") or entry.startswith("delta_")
            ) and os.path.isdir(full):
                shutil.rmtree(full, ignore_errors=True)
            elif os.path.isfile(full):
                os.unlink(full)  # legacy pre-generation base files

    def status(self) -> dict:
        """Engine statistics in the reference's stats shape (reference:
        api/json_helpers.hpp:72-104 statsToJson; memtable/SSTable sections
        become the hot-overlay/parquet-base split)."""
        with self._lock:
            return self._status_locked()

    def _status_locked(self) -> dict:
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
                    "deltaEntries": state.delta_rows,
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
        """Full fold: base ∪ delta ∪ overlay → fresh base generation,
        delta cleared, tombstones GC'd (reference k-way merge +
        bottom-level tombstone GC, compaction.hpp:193-551). flush() is the
        cheap O(overlay) L0 path; this is the deliberate O(base) one."""
        with self._maintenance_pool(), self._lock:
            state = self._state(name)
            had_overlay = bool(state.memtable)
            if not had_overlay and state.delta is None:
                return
            merged = self._merged_df(state).localCheckpoint(eager=True)
            self._install_base(state, merged)
            self._clear_delta(state)
            self._mem_clear(state)
            if had_overlay:
                self.stats["total_flushes"] += 1
            # sidecar commit before WAL truncation (see _flush_locked)
            self._commit_layout(state)
            self._persist_schemas()
            self._rewrite_wal()
            self._gc_generations(state)

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
        if state.unrecovered:
            raise SqlError(
                f"Table {state.name} cannot be served: its base was "
                "registered from an in-memory DataFrame (or a vanished "
                "path) and was not durably flushed before restart. "
                "Re-register the base or restore the path."
            )
        cols = [f.name for f in state.schema.fields]
        base = self._cold_df(state)
        if not state.memtable:
            return base
        live_rows = [
            tuple(row[c] for c in cols)
            for _, row in state.memtable.values()
            if row is not None
        ]
        hot = self._hot_df(live_rows, cols, state.schema) if live_rows else None
        # ONE exclusion join for the whole overlay: every memtable key —
        # live (replaces its cold version) or tombstone (deletes it) —
        # shadows cold rows the same way, so a single broadcast anti-join
        # on all keys replaces the old isin(tombs) filter + second
        # anti-join on live keys (two fewer plan layers per read; the
        # broadcast builds driver-side from a one-column LocalRelation).
        key_schema = T.StructType([state.schema[state.pk]])
        keys_df = self._hot_df(
            [(pk,) for pk in state.memtable], [state.pk], key_schema
        )
        out = base.join(F.broadcast(keys_df), on=state.pk, how="left_anti")
        if hot is not None:
            out = out.unionByName(hot.select(*base.columns))
        return out

    def _cold_df(self, state: TableState) -> DataFrame:
        """The cold layers (base ∪ delta) as one DataFrame, cached per
        flush cycle. The delta is an Arrow LocalRelation (built from the
        driver-side mirror at flush), so its anti-join broadcast builds
        driver-side without launching a Spark job — the delta is bounded
        by DELTA_COMPACT_ROWS, so the explicit broadcast is bounded by
        construction and the base is never shuffled."""
        if state.cold_cache is not None:
            return state.cold_cache
        state.cold_cache = self._build_cold_df(state)
        return state.cold_cache

    def _build_cold_df(self, state: TableState) -> DataFrame:
        base = state.base
        if base is None:
            base = self.spark.createDataFrame([], state.schema)
        if state.delta is not None:
            # L0 delta layer: flushed rows shadow same-pk base rows, delta
            # tombstones delete them. One anti-join on the pk, reusing the
            # sub-frames prebuilt at install (recovery-era deltas derive
            # them lazily here).
            keys = state.delta_keys
            live = state.delta_live
            if keys is None:
                keys = state.delta.select(state.pk)
                live = state.delta.filter(~F.col("__tomb")).drop("__tomb")
            base = base.join(
                F.broadcast(keys), on=state.pk, how="left_anti"
            ).unionByName(live)
        return base

    def _hot_df(self, live_rows: list, cols: list[str], schema) -> DataFrame:
        """Overlay rows → DataFrame, on the Arrow fast path. The default
        ``createDataFrame(list-of-tuples)`` verifies the schema row by row
        in Python and ships pickled rows through ``parallelize`` — ~1 s at
        the overlay's size ceiling, paid by EVERY query while the overlay
        is non-empty (the sustained-ingest bench measured 990% analytical
        degradation from exactly this). Routing through pandas hits the
        Arrow batch converter instead (one zero-copy batch to the JVM);
        rows were already type-coerced on write (`_coerce`), so the skipped
        verification pass adds nothing. Falls back to the verified slow
        path for anything Arrow can't convert — counted in
        ``arrow_fallbacks`` and warned once, so a systematic Arrow failure
        (which would invisibly reintroduce the ~990% degradation) is
        observable instead of silent (advisor r6)."""
        try:
            # Fastest path: hand Spark a pyarrow Table directly — no
            # pandas object-column intermediary, exact int64 with nulls
            # (lists of Python ints -> arrow int64 arrays), and ~25%
            # cheaper on both build and first scan (measured).
            import pyarrow as pa

            arrow_schema = _arrow_schema(schema)
            if arrow_schema is not None:
                tbl = pa.table(
                    {
                        c: [r[i] for r in live_rows]
                        for i, c in enumerate(cols)
                    },
                    schema=arrow_schema,
                )
                return self.spark.createDataFrame(tbl, schema=schema)
            import pandas as pd

            # dtype=object is load-bearing: letting pandas infer dtypes
            # upcasts an int64 column containing a NULL to float64, which
            # silently rounds BIGINTs >= 2^53. Object columns hand the
            # original Python ints to Arrow, which builds exact int64
            # arrays with nulls.
            pdf = pd.DataFrame(live_rows, columns=cols, dtype=object)
            return self.spark.createDataFrame(pdf, schema=schema)
        except Exception as exc:
            self.arrow_fallbacks += 1
            if self.arrow_fallbacks == 1:
                logging.getLogger(__name__).warning(
                    "overlay Arrow fast path failed (%s: %s); using the "
                    "row-verified slow path — sustained-ingest reads "
                    "degrade while this persists",
                    type(exc).__name__,
                    exc,
                )
            return self.spark.createDataFrame(live_rows, schema)

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
            # Temporal types reach the engine only via register_base'd
            # parquet tables (CREATE TABLE can't declare them, matching the
            # reference's unreachable TIMESTAMP row_codec type); accept ISO
            # strings so DML over such tables works.
            if isinstance(dtype, (T.TimestampNTZType, T.TimestampType)):
                import datetime as _dt

                if isinstance(value, _dt.datetime):
                    return value
                return _dt.datetime.fromisoformat(str(value))
            if isinstance(dtype, T.DateType):
                import datetime as _dt

                if isinstance(value, _dt.date):
                    return value
                return _dt.date.fromisoformat(str(value))
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
        self._persist_schemas()
        return ResultSet(message=f"Table created: {name}")

    def _drop_table(self, ts: _Tokens) -> ResultSet:
        ts.expect_word("DROP")
        ts.expect_word("TABLE")
        name_t = ts.next()
        name = str(name_t[1]).lower()
        self._state(name)  # raises if missing
        del self.tables[name]
        if self.data_dir is not None:
            # remove the on-disk base too — a stale table_<name> dir would
            # otherwise be adopted as the base of a later same-named table
            # on restart, resurrecting deleted rows (ADVICE r3).
            shutil.rmtree(self._table_data_path(name), ignore_errors=True)
        self._persist_schemas()
        self._rewrite_wal()  # drop journaled overlay rows for the dead table
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
            values.append(_parse_value(ts))
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
        seq = self._next_seq()
        self._mem_put(state, pk_val, seq, row)
        self._wal_append(state.name, pk_val, seq, row)
        self._maybe_autoflush(state)
        return ResultSet(rows_affected=1, message="Query OK, 1 row(s) affected")

    # DML mutations touching at most this many rows go through the hot
    # overlay (row-at-a-time, reference semantics); above it the base is
    # rewritten set-based so the matched set never lands on the driver.
    OVERLAY_BUDGET = 10_000

    # Auto-flush threshold: when a table's memtable reaches this many
    # entries the overlay folds into the base (the tripping statement pays
    # the fold after releasing the statement lock; readers never wait on
    # it) — the Spark analog of the reference freezing the memtable at
    # 64 MB and flushing in the background (memtable.hpp:140-161,
    # storage_engine.hpp:24). Without it
    # a sustained INSERT stream grows the driver-side dict and the
    # per-query createDataFrame overlay merge without bound. Rows, not
    # bytes: the overlay holds hot row dicts whose width is schema-bounded,
    # so a row cap bounds bytes within a constant factor. Set to None to
    # disable (tests that assert raw memtable contents do).
    AUTOFLUSH_ROWS: int | None = 100_000

    # Compaction trigger: when the accumulated delta (flushed-but-
    # uncompacted rows) would cross this, the next flush folds delta +
    # overlay into the base instead of growing the delta — the L0→base
    # merge of the reference LSM (compaction.hpp:416-551), kept infrequent
    # so the common flush stays O(overlay + delta), never O(base).
    DELTA_COMPACT_ROWS = 500_000

    def _maybe_autoflush(self, state: TableState) -> None:
        """Called inside the dispatch lock: only ENQUEUE — execute() drains
        the queue after releasing the lock, so the fold's heavy Spark job
        never runs while holding the reentrant statement lock (it would
        serialize every concurrent reader behind it)."""
        if self.autoflush_rows is not None and len(state.memtable) >= self.autoflush_rows:
            self._flush_queue.add(state.name)
            # only the statement that tripped the threshold drains it
            self._wrote.flag = True

    def _drain_autoflushes(self) -> None:
        """Run pending auto-flushes outside the statement lock. The gate
        admits one flusher at a time; the threshold is re-checked under it
        so racing statements that enqueued the same table don't thrash
        tiny residual flushes."""
        while True:
            with self._lock:
                name = self._flush_queue.pop() if self._flush_queue else None
            if name is None:
                return
            with self._flush_gate:
                with self._lock:
                    state = self.tables.get(name)
                    need = (
                        state is not None
                        and self.autoflush_rows is not None
                        and len(state.memtable) >= self.autoflush_rows
                    )
                if need:
                    try:
                        self.flush(name)
                    except SqlError:
                        pass  # table dropped between enqueue and flush

    def _pred_to_column(self, state: TableState, pred) -> F.Column:
        """Predicate AST → Spark Column. Under ``quirk_compat``, comparisons
        touching a string-typed column replicate the reference's
        numeric-else-string semantics (query_executor.cpp:716-744): ``stod``
        is tried on *both* operands — if both parse, compare numerically,
        else compare lexicographically. So a VARCHAR column holding numerics
        yields ``'10' > '9'`` (reference behavior), where a typed Spark
        string compare would say ``'10' < '9'``.

        Three further S8 residual quirks, all behind ``quirk_compat``:

        * Unknown operators (LIKE / IS NULL / IN / BETWEEN / NOT) evaluate
          TRUE for every row — evalWhere's default arm
          (query_executor.cpp:691-693). Off-quirk they raise, since the
          repo has no honest implementation of them.
        * Literal-on-left comparisons are NOT flipped: compareOp binds
          whichever side is the column ref as the LEFT operand and keeps
          the operator (query_executor.cpp:701-706), so ``5 < id`` means
          ``id < 5``. Off-quirk the standard reading applies.
        * Column-vs-column and literal-vs-literal comparisons are FALSE
          for every row: exprToString() returns nullopt for a column ref
          and row.find() misses for a literal, and compareOp bails false
          both ways (query_executor.cpp:703-711, 627-653). Off-quirk both
          compare standardly."""
        kind = pred[0]
        if kind == "and":
            return self._pred_to_column(state, pred[1]) & self._pred_to_column(
                state, pred[2]
            )
        if kind == "or":
            return self._pred_to_column(state, pred[1]) | self._pred_to_column(
                state, pred[2]
            )
        if kind == "unknown_op":
            if self.quirk_compat:
                return F.lit(True)
            raise SqlError(f"Unsupported operator: {pred[1]}")
        _, op, lhs, rhs = pred
        if self.quirk_compat:
            if lhs[0] == "lit" and rhs[0] == "col":
                lhs, rhs = rhs, lhs  # non-flip: column side becomes LHS, op kept
            elif lhs[0] == rhs[0]:
                return F.lit(False)  # col-vs-col / lit-vs-lit: reference says no row
        l = F.col(lhs[1]) if lhs[0] == "col" else F.lit(lhs[1])
        r = F.col(rhs[1]) if rhs[0] == "col" else F.lit(rhs[1])
        # Typed-column vs string-literal: under ANSI semantics Spark casts
        # the literal to the column type during CONSTANT FOLDING, so a
        # malformed literal ("id = 'a'") threw a raw NumberFormatException
        # out of the optimizer (found by the differential fuzz). try_cast
        # yields NULL instead → the comparison matches nothing, cleanly —
        # while numeric-looking literals ('42') still compare numerically.
        if lhs[0] == "col" and rhs[0] == "lit" and isinstance(rhs[1], str):
            dt = state.schema[lhs[1]].dataType
            if not isinstance(dt, T.StringType):
                r = r.try_cast(dt)
        elif rhs[0] == "col" and lhs[0] == "lit" and isinstance(lhs[1], str):
            dt = state.schema[rhs[1]].dataType
            if not isinstance(dt, T.StringType):
                l = l.try_cast(dt)
        # The mirror case (advisor r7): a STRING column against a
        # non-string literal. ANSI Spark would cast the whole column and
        # error on the first malformed value; try_cast the column instead —
        # unparseable rows become NULL and cleanly no-match, parseable ones
        # compare numerically. The fast path raises _FastPathUnsupported
        # for this shape in non-quirk mode, so this IS the one semantic.
        if not self.quirk_compat:  # quirk mode: the stringly branch below owns this shape
            if lhs[0] == "col" and rhs[0] == "lit" and rhs[1] is not None and not isinstance(rhs[1], str):
                if isinstance(state.schema[lhs[1]].dataType, T.StringType):
                    l = l.try_cast(
                        "boolean" if isinstance(rhs[1], bool) else "double"
                    )
            elif rhs[0] == "col" and lhs[0] == "lit" and lhs[1] is not None and not isinstance(lhs[1], str):
                if isinstance(state.schema[rhs[1]].dataType, T.StringType):
                    r = r.try_cast(
                        "boolean" if isinstance(lhs[1], bool) else "double"
                    )
        stringly = self.quirk_compat and any(
            o[0] == "col"
            and isinstance(state.schema[o[1]].dataType, T.StringType)
            for o in (lhs, rhs)
        )
        if stringly:
            # try_cast: non-numeric → NULL (ANSI-safe), matching the
            # reference's "stod succeeded on both?" probe
            ln, rn = l.try_cast("double"), r.try_cast("double")
            ls, rs = l.cast("string"), r.cast("string")
            return F.when(
                ln.isNotNull() & rn.isNotNull(), _apply_cmp(op, ln, rn)
            ).otherwise(_apply_cmp(op, ls, rs))
        return _apply_cmp(op, l, r)

    def _filtered_view(self, state: TableState, pred) -> DataFrame:
        cols = [f.name for f in state.schema.fields]
        df = self._merged_df(state)
        if pred is not None:
            for c in _pred_columns(pred):
                if c not in cols:
                    raise SqlError(f"Unknown column: {c}")
            df = df.filter(self._pred_to_column(state, pred))
        return df

    def _matching_rows(self, state: TableState, pred) -> list[dict] | None:
        """Matched rows if they fit the overlay budget, else None.

        The reference's UPDATE/DELETE are row-at-a-time read-modify-write
        over the matched set (query_executor.cpp:505-568) — fine for the hot
        overlay's contract (recent rows). ``limit(budget+1)`` caps what ever
        reaches the driver: if the limit comes back full, the statement is
        analytical-scale and the caller rewrites the base set-based instead
        (the ``withColumn(when(pred,...))`` / anti-join path a Delta MERGE
        would take), so a 50M-row UPDATE never collects 50M rows."""
        capped = self._filtered_view(state, pred).limit(self.OVERLAY_BUDGET + 1).collect()
        if len(capped) > self.OVERLAY_BUDGET:
            return None
        return [row.asDict() for row in capped]

    def _set_base(self, state: TableState, df: DataFrame) -> None:
        """Replace a table's base with ``df`` (memtable folded in by the
        caller): checkpoint to break lineage, persist when durable."""
        self._install_base(state, df.localCheckpoint(eager=True))
        self._clear_delta(state)  # df was built from the merged view
        self._mem_clear(state)
        # sidecar commit before WAL truncation (see _flush_locked)
        self._commit_layout(state)
        self._persist_schemas()
        self._rewrite_wal()
        self._gc_generations(state)

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
            if any(col == seen for seen, _ in assignments):
                raise SqlError(f"Duplicate column in SET: {col}")
            ts.expect_op("=")
            assignments.append((col, _parse_value(ts)))
            t = ts.peek()
            if t and t[0] == "op" and t[1] == ",":
                ts.next()
                continue
            break
        # WHERE is mandatory (reference: query_executor.cpp:510-511)
        if not ts.accept_word("WHERE"):
            raise SqlError("UPDATE requires a WHERE clause")
        pred = _parse_pred(ts)
        coerced = [(col, self._coerce(state, col, v)) for col, v in assignments]
        for col, v in coerced:
            if v is None and col in state.not_null:
                raise SqlError(f"NULL not allowed for column: {col}")

        pk_assigned = any(col == state.pk for col, _ in coerced)
        matches = self._matching_rows(state, pred)
        if matches is None and not pk_assigned:
            # Set-based rewrite: fold overlay + conditional assignment into a
            # new base; nothing but the count crosses the driver.
            view = self._filtered_view(state, None)
            cond = self._pred_to_column(state, pred)
            n = view.filter(cond).count()
            out = view
            for col, v in coerced:
                dtype = state.schema[col].dataType
                out = out.withColumn(
                    col, F.when(cond, F.lit(v).cast(dtype)).otherwise(F.col(col))
                )
            self._set_base(state, out)
            return ResultSet(rows_affected=n, message=f"Query OK, {n} row(s) affected")

        if matches is None:
            # PK reassignment stays row-at-a-time (each old key must be
            # tombstoned individually); cap it at the overlay budget.
            raise SqlError(
                f"UPDATE assigning the primary key matches more than "
                f"{self.OVERLAY_BUDGET} rows"
            )
        for row in matches:
            old_pk = row[state.pk]
            for col, v in coerced:
                row[col] = v
            for c in state.not_null:
                if row[c] is None:
                    raise SqlError(f"NULL not allowed for column: {c}")
            new_pk = row[state.pk]
            if new_pk != old_pk:
                # The reference writes the updated blob back under the
                # original storage key (query_executor.cpp:562), leaving a
                # stale key visible — a reference bug, not a semantic we
                # replicate: tombstone the old key so PK uniqueness holds.
                seq = self._next_seq()
                self._mem_put(state, old_pk, seq, None)
                self._wal_append(state.name, old_pk, seq, None)
            seq = self._next_seq()
            self._mem_put(state, new_pk, seq, row)
            self._wal_append(state.name, new_pk, seq, row)
        n = len(matches)
        self._maybe_autoflush(state)
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
        if matches is None:
            # Set-based rewrite: keep only non-matching rows (NULL predicate
            # means "not matched", hence the coalesce before negation).
            view = self._filtered_view(state, None)
            cond = F.coalesce(self._pred_to_column(state, pred), F.lit(False))
            n = view.filter(cond).count()
            self._set_base(state, view.filter(~cond))
            return ResultSet(rows_affected=n, message=f"Query OK, {n} row(s) affected")
        for row in matches:
            # Tombstone shadows older versions (memtable.hpp:343-362)
            seq = self._next_seq()
            self._mem_put(state, row[state.pk], seq, None)
            self._wal_append(state.name, row[state.pk], seq, None)
        n = len(matches)
        self._maybe_autoflush(state)
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
        # time travel (r14): FROM t VERSION AS OF <n> reads the layout a
        # committed txlog manifest describes — only whole keywords engage,
        # so a column/table named "version" elsewhere is unaffected.
        version = None
        if ts.accept_word("VERSION"):
            ts.expect_word("AS")
            ts.expect_word("OF")
            v_t = ts.next()
            if v_t is None or v_t[0] != "num":
                raise SqlError("VERSION AS OF requires an integer version")
            try:
                version = int(str(v_t[1]))
            except ValueError:
                raise SqlError("VERSION AS OF requires an integer version")
        # change data feed (r15): FROM t CHANGES BETWEEN a AND b serves the
        # row diff between two retained versions (read_changes) through
        # the same select machinery — table columns + _change_type.
        changes = None
        if ts.accept_word("CHANGES"):
            if version is not None:
                raise SqlError(
                    "VERSION AS OF and CHANGES BETWEEN are mutually exclusive"
                )
            ts.expect_word("BETWEEN")
            vals = []
            for _ in range(2):
                v_t = ts.next()
                if v_t is None or v_t[0] != "num":
                    raise SqlError(
                        "CHANGES BETWEEN requires integer versions"
                    )
                try:
                    vals.append(int(str(v_t[1])))
                except ValueError:
                    raise SqlError(
                        "CHANGES BETWEEN requires integer versions"
                    )
                if not vals[1:]:
                    ts.expect_word("AND")
            changes = (vals[0], vals[1])
        pred = None
        if ts.accept_word("WHERE"):
            pred = _parse_pred(ts)
        return items, str(name_t[1]).lower(), pred, version, changes

    def _select(self, ts: _Tokens) -> ResultSet:
        items, table, pred, version, changes = self._parse_select(ts)
        state = self._state(table)
        if version is not None:
            # Serve the historical layout through the SAME select/aggregate
            # machinery via a synthetic state (no overlay, no delta — the
            # committed manifest fully describes the layout; rows still in
            # the memtable/WAL postdate every committed version by
            # definition). gen=0 keeps the pyarrow point path off.
            state = TableState(
                name=state.name,
                schema=state.schema,
                pk=state.pk,
                not_null=set(state.not_null),
                base=self.read_version(table, version),
            )
        elif changes is not None:
            # CDF through the same machinery (r15): the diff keeps pk
            # uniqueness (a pk is exactly one of insert/update/delete
            # between two versions), so projection/predicates/sorting all
            # apply; the extra _change_type column rides in the synthetic
            # schema.
            cdf_schema = T.StructType(
                list(state.schema.fields)
                + [T.StructField("_change_type", T.StringType())]
            )
            state = TableState(
                name=state.name,
                schema=cdf_schema,
                pk=state.pk,
                not_null=set(state.not_null),
                base=self.read_changes(table, changes[0], changes[1]),
            )
        if pred is not None and _point_lookup_pk(pred, state.pk) is None:
            self.stats["total_range_queries"] += 1
        cols = [f.name for f in state.schema.fields]
        if pred is not None:
            for c in _pred_columns(pred):
                if c not in cols:
                    raise SqlError(f"Unknown column: {c}")

        aggs = [payload for kind, payload in items if kind == "agg"]
        if aggs:
            return self._run_aggregates(state, pred, aggs)

        proj: list[str] = []
        for kind, payload in items:
            if kind == "star":
                proj.extend(cols)
            else:
                if payload not in cols:
                    raise SqlError(f"Unknown column: {payload}")
                proj.append(payload)
        fast = self._fast_select_rows(state, pred, proj)
        if fast is not None:
            return fast
        df = self._filtered_view(state, pred)
        # Reference rows come back sorted by string-encoded key
        # (range_query_executor.hpp:100,140) — sort by pk-as-string.
        plan = df.orderBy(F.col(state.pk).cast("string")).select(*proj)

        def run() -> ResultSet:
            out = plan.collect()
            return ResultSet(headers=proj, rows=[tuple(r) for r in out])

        return self._defer(run)

    # -- driver-side read fast path (VERDICT r6 #3) --------------------------
    #
    # Under sustained ingest the expensive part of a read is not the JVM
    # job over the cold layers (~70 ms with a reused plan) but building a
    # FRESH plan per query — ANY fresh plan, even a tiny one, costs
    # ~400-500 ms of construction + Catalyst analysis + scheduling under a
    # GIL-hungry ingest thread (measured). The fast path therefore runs a
    # plan whose shape NEVER changes between compactions — the BASE layer
    # alone, cached per (pred, aggs) — and folds BOTH hot layers (delta
    # mirror ∪ memtable, all driver-resident by construction) in pure
    # Python. This is exact when every hot key provably has no base row to
    # shadow (outside the base pk min/max — true for append-mostly
    # ingest). Anything else raises _FastPathUnsupported and falls back to
    # the full Spark merge-on-read plan. The Python predicate evaluator
    # mirrors _pred_to_column including every quirk;
    # tests/test_read_fastpath.py pins the two paths to identical answers.

    @staticmethod
    def _parse_lit_like_cast(dtype, s: str):
        """Python twin of Spark's try_cast(string literal AS column type)
        for the types the engine's fast path supports: integral casts
        reject fractional strings exactly as Spark does, None means the
        cast yields NULL (comparison never matches). Unsupported target
        types (timestamp, boolean) bail to the full-plan path."""
        if isinstance(dtype, (T.LongType, T.IntegerType)):
            # digits-only like Spark's string→integral cast — int() alone
            # would also accept '1_0' (underscores), which Spark rejects
            return int(s) if _INT_RE.fullmatch(s.strip()) else None
        if isinstance(dtype, (T.DoubleType, T.FloatType)):
            return _try_float(s)
        raise _FastPathUnsupported(f"literal cast to {dtype} not mirrored")

    def _compile_pred(self, state: TableState, pred):
        """Predicate AST → a Python row matcher, mirroring _pred_to_column
        including every quirk. Compiled ONCE per query so the per-row cost
        over a large hot fold is a few closure calls, not tuple dispatch
        (the fold scans up to DELTA_COMPACT_ROWS mirror rows per read)."""
        kind = pred[0]
        if kind == "and":
            l = self._compile_pred(state, pred[1])
            r = self._compile_pred(state, pred[2])
            return lambda row: l(row) and r(row)
        if kind == "or":
            l = self._compile_pred(state, pred[1])
            r = self._compile_pred(state, pred[2])
            return lambda row: l(row) or r(row)
        if kind == "unknown_op":
            if self.quirk_compat:
                return lambda row: True
            raise SqlError(f"Unsupported operator: {pred[1]}")
        _, op, lhs, rhs = pred
        if self.quirk_compat:
            if lhs[0] == "lit" and rhs[0] == "col":
                lhs, rhs = rhs, lhs
            elif lhs[0] == rhs[0]:
                return lambda row: False
        stringly = self.quirk_compat and any(
            o[0] == "col"
            and isinstance(state.schema[o[1]].dataType, T.StringType)
            for o in (lhs, rhs)
        )
        cmp = _CMP_PY[op]
        lcol = lhs[1] if lhs[0] == "col" else None
        llit = lhs[1] if lhs[0] == "lit" else None
        rcol = rhs[1] if rhs[0] == "col" else None
        rlit = rhs[1] if rhs[0] == "lit" else None
        # String-typed column vs non-string literal (advisor r7): the Spark
        # path try_casts the COLUMN per row (numeric compare where
        # parseable, NULL no-match otherwise) — per-row parsing this fold
        # does not replicate, and a plain Python ==/!= would silently
        # no-match where < would TypeError. Fall back for ALL six ops so
        # hot and base rows evaluate under one semantic.
        if not self.quirk_compat:
            for c, lit in ((lcol, rlit), (rcol, llit)):
                if (
                    c is not None
                    and lit is not None
                    and not isinstance(lit, str)
                    and isinstance(state.schema[c].dataType, T.StringType)
                ):
                    raise _FastPathUnsupported(
                        "string column vs non-string literal"
                    )
        # mirror the Spark path's try_cast of a string literal against a
        # typed column: unparseable → NULL → never matches; parseable →
        # numeric compare. Types Python can't parse like Spark
        # (timestamp/bool) fall back to the full plan.
        if not stringly:
            if lcol is not None and isinstance(rlit, str):
                rlit = self._parse_lit_like_cast(
                    state.schema[lcol].dataType, rlit
                )
                if rlit is None:
                    return lambda row: False
            elif rcol is not None and isinstance(llit, str):
                llit = self._parse_lit_like_cast(
                    state.schema[rcol].dataType, llit
                )
                if llit is None:
                    return lambda row: False

        def match(row: dict) -> bool:
            lv = row.get(lcol) if lcol is not None else llit
            rv = row.get(rcol) if rcol is not None else rlit
            if lv is None or rv is None:
                return False  # SQL three-valued logic: NULL ≠ match
            if stringly:
                ln, rn = _try_float(lv), _try_float(rv)
                if ln is not None and rn is not None:
                    return bool(cmp(ln, rn))
                return bool(cmp(str(lv), str(rv)))
            try:
                return bool(cmp(lv, rv))
            except TypeError as exc:  # e.g. timestamp col vs string lit
                raise _FastPathUnsupported(str(exc)) from exc

        return match

    # Shadowed-base fetch bound: past this many in-range hot keys, the
    # pyarrow point-read stops being a point read — fall back to the plan.
    BASE_FETCH_CAP = 100_000

    def _in_range_hot_keys(self, state: TableState, mirror: dict) -> list:
        """Hot keys (memtable + delta mirror) inside the base pk
        [min, max] — each may shadow a base row the driver-side fold
        cannot see. APPEND-ONLY within a (base, delta) epoch pair, and
        advanced incrementally from the mem op log: the old per-read
        memtable rescan held the statement lock for O(overlay) Python
        per analytical query, which under mixed load queued every
        concurrent single-row INSERT behind it (the §7.4 write-
        degradation miss, VERDICT r14 #1). Now a read pays O(ops since
        the previous read); epoch bumps or an op-log reset trigger one
        full rebuild."""
        if state.base is None:
            return []
        lo, hi = self._base_pk_range(state)
        if lo is None:
            return []  # empty base: nothing to shadow
        try:
            cur_pos = state.mem_log_base + len(state.mem_log)
            cached = state.read_plans.get("__hot_inrange")
            if (
                cached is not None
                and cached[0] == state.base_epoch
                and cached[1] == state.delta_epoch
                and state.mem_log_base <= cached[2] <= cur_pos
            ):
                _be, _de, pos, keys, seen = cached
                for pk, _o, _n in state.mem_log[pos - state.mem_log_base :]:
                    if pk not in seen and lo <= pk <= hi:
                        seen.add(pk)
                        keys.append(pk)
            else:
                mkeys = [pk for pk in mirror if lo <= pk <= hi]
                seen = set(mkeys)
                keys = mkeys + [
                    pk
                    for pk in state.memtable
                    if pk not in seen and lo <= pk <= hi
                ]
                seen.update(keys)
            state.read_plans["__hot_inrange"] = (
                state.base_epoch, state.delta_epoch, cur_pos, keys, seen,
            )
            return keys
        except TypeError as exc:
            raise _FastPathUnsupported(str(exc)) from exc

    def _base_parquet_files(self, state: TableState) -> list:
        """Parquet files backing the base, cached per base epoch; empty
        means the base is not a file scan (in-memory localCheckpoint) and
        direct point reads are impossible."""
        if state.base_files_epoch != state.base_epoch:
            try:
                files = [
                    f.removeprefix("file:") for f in state.base.inputFiles()
                ]
            except Exception:  # non-file plans may not support inputFiles
                files = []
            state.base_files = [f for f in files if f.endswith(".parquet")]
            if len(state.base_files) != len(files):
                state.base_files = []  # mixed/non-parquet source: refuse
            state.base_files_epoch = state.base_epoch
        return state.base_files

    def _refresh_shadow_fetch(
        self,
        state: TableState,
        mirror: dict,
        keys: list | None = None,
        cols: set | None = None,
    ) -> None:
        """Bring the shadowed-base fetch cache and first-seen shadow_list
        up to date with the current hot key set. Cache misses are read
        straight from the base parquet with pyarrow — pk-stat row-group
        pruning, no Spark plan, no job. This is what keeps UPDATE-heavy
        ingest on the fast path: the previous behavior fell back to the
        full merge-on-read plan, whose ~400 ms/query cost was measured to
        be PLAN CONSTRUCTION (the memtable LocalRelation changes every
        insert, so nothing caches), not execution (a reused plan collects
        in ~25 ms). Raises _FastPathUnsupported when the base has no
        parquet files or the shadow set outgrows the cap."""
        if keys is None:
            keys = self._in_range_hot_keys(state, mirror)
        if state.base_fetch_epoch != state.base_epoch:
            state.base_fetch = {}
            state.shadow_list = []
            state.shadow_seen = set()
            state.base_fetch_epoch = state.base_epoch
        # Fast exit: the hot-key list is append-only within a (base,
        # delta) epoch pair, so an unchanged length under the same
        # column-want means nothing new to fetch — skip the O(keys)
        # membership rescans (they held the statement lock per read
        # under mixed load, r15).
        wkey = (
            "__fetch_upto",
            tuple(sorted(cols)) if cols is not None else None,
        )
        fetch_state = (state.base_epoch, state.delta_epoch, len(keys))
        if state.read_plans.get(wkey) == fetch_state:
            return
        cache = state.base_fetch
        # membership by shadow_seen, NOT by cache presence: a point lookup
        # may have fetched this key's base row while it was still cold —
        # it must still join the shadow set the moment it becomes hot
        new = [k for k in keys if k not in state.shadow_seen]
        # Column-pruned fetches: reads decode only pk + the columns this
        # query touches (decoding all columns of every matched row group
        # was most of the update-heavy read cost). A cached partial row
        # that lacks a now-needed column is refetched once with the wider
        # set and merged.
        want = set(cols) | {state.pk} if cols is not None else None
        if want is None:
            missing = [k for k in new if k not in cache]
        else:
            missing = [
                k
                for k in keys
                if k not in cache
                or (
                    cache[k] is not _ABSENT
                    and not want <= cache[k].keys()
                )
            ]
        if not new and not missing:
            state.read_plans[wkey] = fetch_state
            return
        if len(cache) + len(missing) > self.BASE_FETCH_CAP:
            raise _FastPathUnsupported("shadow set exceeds fetch cap")
        if missing:
            files = self._base_parquet_files(state)
            if not files:
                raise _FastPathUnsupported(
                    "base is not parquet-backed; cannot point-read"
                )
            try:
                import pyarrow.dataset as pads

                dset = pads.dataset(files, format="parquet")
                tbl = dset.to_table(
                    columns=sorted(want) if want is not None else None,
                    filter=pads.field(state.pk).isin(missing),
                )
            except Exception as exc:
                raise _FastPathUnsupported(
                    f"base point-read failed: {exc}"
                ) from exc
            self.stats["base_point_reads"] += 1
            for r in tbl.to_pylist():
                prev = cache.get(r[state.pk])
                if isinstance(prev, dict):
                    r = {**prev, **r}
                cache[r[state.pk]] = r
            for k in missing:
                cache.setdefault(k, _ABSENT)
        for k in new:
            state.shadow_list.append(k)
            state.shadow_seen.add(k)
        state.read_plans[wkey] = fetch_state

    def _base_shadow_parts(
        self, state: TableState, mirror: dict, pred, needs_key, needs, match
    ) -> dict:
        """Fold partials of the base rows shadowed by hot keys — the
        quantity the fast path subtracts from the cached base-only
        aggregate so UPDATE-heavy ingest stays exact without the full
        merge-on-read plan. Advanced incrementally: within a base epoch
        the shadow set only grows, so a cached (pred, aggs) partial folds
        just the first-seen keys appended since its position — O(new
        shadowed keys), not O(all updates so far). The final combine
        (cold − shadow + hot) is ONE fresh subtraction per read computed
        from deterministic partials, not an accumulating add/subtract
        cycle, so the float-drift concern behind _apply_part_delta's
        refusal does not apply here; the differential suite pins this
        path against the Spark plan."""
        pred_key = repr(pred)
        keys = self._in_range_hot_keys(state, mirror)
        if not keys:
            return self._fold_partials((), match, needs)
        # pyarrow-read values must compare/fold exactly like Spark Row
        # values: restrict to primitive types on every column the query
        # touches (timestamp/date/decimal round-tripping through Arrow is
        # not semantics-checked here — fall back for those).
        safe = (
            T.LongType, T.IntegerType, T.ShortType, T.ByteType,
            T.DoubleType, T.FloatType, T.StringType, T.BooleanType,
        )
        used = set(needs) | {state.pk}
        if pred is not None:
            used |= _pred_columns(pred)
        for c in used:
            if not isinstance(state.schema[c].dataType, safe):
                raise _FastPathUnsupported(
                    f"shadowed base rows with non-primitive column {c}"
                )
        self._refresh_shadow_fetch(state, mirror, keys, cols=used)
        slist = state.shadow_list
        ckey = ("bshadow", pred_key, needs_key, state.base_epoch)
        cached = state.read_plans.get(ckey)
        if cached is not None and cached[0] <= len(slist):
            pos, parts = cached
        else:
            pos, parts = 0, self._fold_partials((), match, needs)
        if pos < len(slist):
            cache = state.base_fetch
            add = self._fold_partials(
                (
                    cache[k]
                    for k in slist[pos:]
                    if cache[k] is not _ABSENT
                ),
                match,
                needs,
            )
            parts = self._merge_add_parts(parts, add)
        if len(state.read_plans) > 64:
            state.read_plans.clear()
        state.read_plans[ckey] = (len(slist), parts)
        return parts

    @staticmethod
    def _merge_add_parts(parts: dict, add: dict) -> dict:
        """parts + add over aggregate partials — addition only (the
        append-only shadow folds never subtract), so min/max extend
        safely."""
        merged = dict(parts)
        merged["n"] = parts["n"] + add["n"]
        for k, v in add.items():
            if k == "n":
                continue
            if k.startswith(("sum_", "cnt_")):
                merged[k] = parts[k] + v
            elif k.startswith("min_"):
                vals = [x for x in (parts[k], v) if x is not None]
                merged[k] = min(vals) if vals else None
            else:  # max_
                vals = [x for x in (parts[k], v) if x is not None]
                merged[k] = max(vals) if vals else None
        return merged

    def _mem_mirror_keys(self, state: TableState, mirror: dict) -> list:
        """Append-only list of memtable keys that also live in the delta
        mirror (their mirror rows are shadowed and must be subtracted
        from the cached mirror partials). Advanced from the mem op log —
        O(ops since the previous read), not O(overlay) (the per-read
        full-memtable scan was the other half of the §7.4 lock-hold,
        r15). Keys only ever enter within a (delta epoch, op-log)
        window; epoch bumps or a log reset rebuild once."""
        cur_pos = state.mem_log_base + len(state.mem_log)
        cached = state.read_plans.get("__mem_mirror_keys")
        if (
            cached is not None
            and cached[0] == state.delta_epoch
            and state.mem_log_base <= cached[1] <= cur_pos
        ):
            _de, pos, keys, seen = cached
            for pk, _o, _n in state.mem_log[pos - state.mem_log_base :]:
                if pk not in seen and pk in mirror:
                    seen.add(pk)
                    keys.append(pk)
        else:
            keys = [pk for pk in state.memtable if pk in mirror]
            seen = set(keys)
        state.read_plans["__mem_mirror_keys"] = (
            state.delta_epoch, cur_pos, keys, seen,
        )
        return keys

    def _base_pk_range(self, state: TableState):
        """(min, max) of the base pk, one Spark job per base epoch. (None,
        None) means an empty base (nothing can be shadowed)."""
        if state.base_pk_range is None:
            row = state.base.agg(
                F.min(state.pk).alias("lo"), F.max(state.pk).alias("hi")
            ).collect()[0]
            state.base_pk_range = (row["lo"], row["hi"])
        return state.base_pk_range

    def _parse_agg_specs(self, state: TableState, aggs: list[str]):
        """Validate the aggregate select list → [(spec, fn, arg)]."""
        cols = [f.name for f in state.schema.fields]
        parsed = []
        for spec in aggs:
            fn, arg = spec.split("(", 1)
            arg = arg[:-1]
            if fn == "COUNT":
                if not (self.quirk_compat or arg == "*") and arg not in cols:
                    raise SqlError(f"Unknown column: {arg}")
            elif arg == "*":
                raise SqlError(f"{fn}(*) is not supported")
            elif arg not in cols:
                raise SqlError(f"Unknown column: {arg}")
            parsed.append((spec, fn, arg))
        return parsed

    def _run_aggregates(
        self, state: TableState, pred, aggs: list[str]
    ) -> ResultSet:
        parsed = self._parse_agg_specs(state, aggs)
        try:
            return self._fast_aggregates(state, pred, parsed)
        except _FastPathUnsupported:
            pass
        df = self._filtered_view(state, pred)
        exprs = []
        for spec, fn, arg in parsed:
            if fn == "COUNT":
                if self.quirk_compat or arg == "*":
                    # Quirk: COUNT(col) counts all post-WHERE rows, like
                    # COUNT(*) (reference: query_executor.cpp:228)
                    exprs.append(F.count(F.lit(1)).alias(spec))
                else:
                    exprs.append(F.count(arg).alias(spec))
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
        plan = df.agg(*exprs)

        def run() -> ResultSet:
            row = plan.collect()[0]
            values = []
            for spec, v in zip(aggs, row):
                if v is None and self.quirk_compat:
                    # Quirk: MIN/MAX/SUM over empty selection → 0
                    # (reference: query_executor.cpp:260-263)
                    v = 0
                values.append(v)
            return ResultSet(headers=list(aggs), rows=[tuple(values)])

        return self._defer(run)

    @staticmethod
    def _fold_partials(rows, match, needs) -> dict:
        """Additive aggregate partials over an iterable of row dicts:
        row count (pred-matched), and per-arg partials — but ONLY the
        kinds some aggregate actually needs (``needs``: arg → subset of
        {"sum", "cnt", "min", "max"}). Folding blindly broke on
        non-numeric columns: COUNT(name) over a string column crashed on
        ``0 += 'alpha'`` (review r7). A type the needed fold still can't
        handle (SUM over strings) raises _FastPathUnsupported so the
        caller falls back."""
        out = {"n": 0}
        for a, kinds in needs.items():
            for k in kinds:
                out[f"{k}_{a}"] = 0 if k in ("sum", "cnt") else None
        try:
            for row in rows:
                if match is not None and not match(row):
                    continue
                out["n"] += 1
                for a, kinds in needs.items():
                    v = row.get(a)
                    if v is None:
                        continue
                    if "sum" in kinds:
                        out[f"sum_{a}"] += v
                    if "cnt" in kinds:
                        out[f"cnt_{a}"] += 1
                    if "min" in kinds and (
                        out[f"min_{a}"] is None or v < out[f"min_{a}"]
                    ):
                        out[f"min_{a}"] = v
                    if "max" in kinds and (
                        out[f"max_{a}"] is None or v > out[f"max_{a}"]
                    ):
                        out[f"max_{a}"] = v
        except TypeError as exc:  # e.g. SUM over a string column
            raise _FastPathUnsupported(str(exc)) from exc
        return out

    def _upgrade_mirror_parts(
        self, state: TableState, pred_key: str, needs_key, needs, match
    ) -> dict | None:
        """Advance a cached mirror-partial to the current delta epoch by
        replaying the per-flush mirror change logs — O(rows flushed since
        the cached epoch), not O(mirror). This is what keeps sustained-
        ingest read overhead flat as deltas accumulate (VERDICT r7 #3):
        the full refold grew linearly with the mirror and ran once per
        flush cycle. Returns None when no cached epoch is in the log
        horizon, a log entry is missing, or a MIN/MAX partial would need
        to *subtract* a replaced row (not invertible) — the caller then
        does one full refold, re-anchoring the cache."""
        cur = state.delta_epoch
        for back in range(1, self.MIRROR_LOG_EPOCHS):
            base = state.read_plans.get(("mfold", pred_key, needs_key, cur - back))
            if base is not None:
                break
        else:
            return None
        parts = dict(base)
        for e in range(cur - back + 1, cur + 1):
            log = state.mirror_log.get(e)
            if log is None:
                return None
            new_rows, replaced = log
            add = self._fold_partials(
                (r for r in new_rows if r is not None), match, needs
            )
            sub = self._fold_partials(
                (r for r in replaced if r is not None), match, needs
            )
            parts = self._apply_part_delta(parts, add, sub)
            if parts is None:
                return None
        return parts

    @staticmethod
    def _apply_part_delta(parts: dict, add: dict, sub: dict) -> dict | None:
        """parts + add − sub over aggregate partials. n/sum/cnt are
        additive groups; min/max can only be EXTENDED by `add` — if `sub`
        removed any pred-matching row while an extremum partial exists,
        that row may have been the extremum and the delta is not
        invertible: return None (caller refolds)."""
        has_minmax = any(k.startswith(("min_", "max_")) for k in parts)
        if sub["n"] and has_minmax:
            return None
        # Float subtraction is not exactly invertible (non-associativity
        # drift, advisor r7): refuse any non-zero float SUM subtraction —
        # the caller refolds from scratch, which is drift-free. Integer
        # sums subtract exactly and stay incremental.
        if sub["n"] and any(
            k.startswith("sum_") and isinstance(v, float) and v != 0.0
            for k, v in sub.items()
        ):
            return None
        out = dict(parts)
        out["n"] = parts["n"] + add["n"] - sub["n"]
        for k, v in add.items():
            if k == "n":
                continue
            if k.startswith(("sum_", "cnt_")):
                out[k] = parts[k] + v - sub[k]
            elif k.startswith("min_"):
                vals = [x for x in (parts[k], v) if x is not None]
                out[k] = min(vals) if vals else None
            else:  # max_
                vals = [x for x in (parts[k], v) if x is not None]
                out[k] = max(vals) if vals else None
        return out

    def _mem_parts(
        self, state: TableState, pred_key: str, needs_key, needs, match
    ) -> dict:
        """Memtable fold partials, advanced incrementally from the cached
        position via the op log — O(ops since last read of this (pred,
        aggs)), not O(overlay). Under sustained ingest the per-query
        overlay refold was the remaining linear cost after the mirror
        partials were cached (VERDICT r7 #3); with back-to-back reads this
        folds only the few hundred rows written between them."""
        fkey = ("memfold", pred_key, needs_key)
        cur_pos = state.mem_log_base + len(state.mem_log)
        cached = state.read_plans.get(fkey)
        parts = None
        if cached is not None and cached[0] >= state.mem_log_base:
            pos, base = cached
            ops = state.mem_log[pos - state.mem_log_base :]
            sub = self._fold_partials(
                (o for _pk, o, _n in ops if o is not None), match, needs
            )
            add = self._fold_partials(
                (n for _pk, _o, n in ops if n is not None), match, needs
            )
            parts = self._apply_part_delta(base, add, sub)
        if parts is None:
            parts = self._fold_partials(
                (r for _s, r in state.memtable.values() if r is not None),
                match,
                needs,
            )
        if len(state.read_plans) > 64:
            state.read_plans.clear()
        state.read_plans[fkey] = (cur_pos, parts)
        return parts

    def _fast_aggregates(self, state: TableState, pred, parsed) -> ResultSet:
        """Base-only cached-plan aggregates + driver-side fold of the hot
        layers (see the fast-path note above). The delta MIRROR's partials
        are cached per (pred, aggs, delta epoch) — the mirror is immutable
        within a flush cycle, and re-folding it per read grew to ~30 ms at
        a 60k-row delta (the dominant sustained-read cost once everything
        else was fixed). Per read, only the ≤AUTOFLUSH_ROWS memtable is
        folded, minus mirror rows the memtable shadows. Raises
        _FastPathUnsupported → fallback."""
        if not self.read_fastpath_enabled:
            raise _FastPathUnsupported("disabled via read_fastpath_enabled")
        fns = {fn for _spec, fn, _arg in parsed}
        # Per-arg partial KINDS actually required by the select list —
        # never more: a blanket sum over every referenced column crashed
        # COUNT(string_col) (TypeError in the fold) and quirk-legal
        # COUNT(nonexistent_col) (unresolved column in the plan), both
        # review-r7 findings.
        needs: dict[str, set] = {}
        for _spec, fn, arg in parsed:
            if arg == "*":
                continue
            kinds = needs.setdefault(arg, set())
            if fn in ("SUM", "AVG"):
                # cnt rides along with sum: the fold uses it to tell
                # "no non-null values anywhere" (SUM → NULL) from a sum
                # of zero
                kinds.update(("sum", "cnt"))
            if fn == "COUNT" and not self.quirk_compat:
                kinds.add("cnt")  # quirk COUNT uses the row count
            if fn == "MIN":
                kinds.add("min")
            if fn == "MAX":
                kinds.add("max")
        needs = {a: k for a, k in needs.items() if k}
        if state.unrecovered:
            raise SqlError(
                f"Table {state.name} cannot be served: its base was "
                "registered from an in-memory DataFrame (or a vanished "
                "path) and was not durably flushed before restart. "
                "Re-register the base or restore the path."
            )
        if state.delta is not None and state.delta_mirror is None:
            raise _FastPathUnsupported("delta mirror unavailable")
        mirror = state.delta_mirror or {}
        match = None if pred is None else self._compile_pred(state, pred)
        needs_key = tuple(sorted((a, tuple(sorted(k))) for a, k in needs.items()))
        # In-range hot keys shadow base rows the driver-side fold cannot
        # see; fetch those rows via pyarrow point-reads (cached per base
        # epoch) and subtract their partials from the cached base
        # aggregate — UPDATE-heavy ingest stays on the fast path.
        base_shadow_parts = self._base_shadow_parts(
            state, mirror, pred, needs_key, needs, match
        )
        if base_shadow_parts["n"] and fns & {"MIN", "MAX"}:
            # a shadowed base row may BE the min/max — not subtractable
            raise _FastPathUnsupported("min/max with shadowed base rows")
        # NO float-SUM guard here, unlike the mirror-shadow path below:
        # raising for float sums with shadowed BASE rows would push every
        # UPDATE-heavy read of a double column back to the full plan —
        # the exact workload the pyarrow shadow fetch exists to serve.
        # The float contract is relative, not bit-exact: subtracting the
        # fetched old values reorders a float sum, but so does the
        # fallback itself (Spark partial-agg order varies with
        # partitioning/AQE), so bit-exactness is not a property of EITHER
        # path. The differential suites compare float aggregates at
        # relative precision accordingly. The mirror-shadow guard below
        # stays: it fires only on re-updates within one flush cycle, so
        # being conservative there costs almost nothing.
        mkey = ("mfold", repr(pred), needs_key, state.delta_epoch)
        mirror_parts = state.read_plans.get(mkey)
        if mirror_parts is None:
            mirror_parts = self._upgrade_mirror_parts(
                state, repr(pred), needs_key, needs, match
            )
        if mirror_parts is None:
            mirror_parts = self._fold_partials(
                (r for r in mirror.values() if r is not None), match, needs
            )
        if len(state.read_plans) > 64:
            state.read_plans.clear()
        state.read_plans[mkey] = mirror_parts
        mem_parts = self._mem_parts(
            state, repr(pred), needs_key, needs, match
        )
        # mirror rows shadowed by a memtable key were counted in the cached
        # partials — subtract them (tombstoned-in-mirror entries are None
        # and were never counted). Incremental (r15): the shadowed-key
        # list is append-only within a delta epoch, so a cached (pred,
        # aggs) fold advances over just the newly shadowed keys instead
        # of rescanning the whole memtable under the statement lock.
        mmk = self._mem_mirror_keys(state, mirror)
        skey = ("mshadow", repr(pred), needs_key, state.delta_epoch)
        cached_sh = state.read_plans.get(skey)
        if cached_sh is not None and cached_sh[0] <= len(mmk):
            sh_pos, shadow_parts = cached_sh
        else:
            sh_pos, shadow_parts = 0, self._fold_partials((), match, needs)
        if sh_pos < len(mmk):
            add = self._fold_partials(
                (
                    mirror[pk]
                    for pk in mmk[sh_pos:]
                    if mirror[pk] is not None
                ),
                match,
                needs,
            )
            shadow_parts = self._merge_add_parts(shadow_parts, add)
        state.read_plans[skey] = (len(mmk), shadow_parts)
        if shadow_parts["n"] and fns & {"MIN", "MAX"}:
            # a shadowed mirror row may BE the min/max — not subtractable
            raise _FastPathUnsupported("min/max with shadowed mirror rows")
        if shadow_parts["n"] and any(
            k.startswith("sum_") and isinstance(v, float) and v != 0.0
            for k, v in shadow_parts.items()
        ):
            # float SUM/AVG with shadow subtraction: non-associativity
            # means the fast result could differ from the fallback plan in
            # low-order bits and vary across flush cycles (advisor r7) —
            # same spirit as the MIN/MAX guard
            raise _FastPathUnsupported("float sum with shadowed mirror rows")
        key = ("agg", repr(pred), needs_key)
        plan = state.read_plans.get(key)
        if plan is None:
            base = self._base_df(state)
            if pred is not None:
                base = base.filter(self._pred_to_column(state, pred))
            exprs = [F.count(F.lit(1)).alias("__n")]
            for arg, kinds in sorted(needs.items()):
                if "sum" in kinds:
                    exprs.append(F.sum(arg).alias(f"__sum_{arg}"))
                if "cnt" in kinds:
                    exprs.append(F.count(arg).alias(f"__cnt_{arg}"))
                if "min" in kinds:
                    exprs.append(F.min(arg).alias(f"__min_{arg}"))
                if "max" in kinds:
                    exprs.append(F.max(arg).alias(f"__max_{arg}"))
            plan = base.agg(*exprs)
            if len(state.read_plans) > 64:
                state.read_plans.clear()
            state.read_plans[key] = plan
        quirk = self.quirk_compat
        specs = list(parsed)
        # The cold aggregate VALUE is constant per base epoch (the base
        # layer is immutable between compactions) — collecting the cached
        # plan per read cost ~14 ms of pure Py4J/JVM roundtrip for a
        # number that cannot change. Cache the collected row; a
        # compaction or set-based DML bumps base_epoch (and clears
        # read_plans) so staleness is structural, not temporal.
        vkey = ("aggval", repr(pred), needs_key, state.base_epoch)
        cached_cold = state.read_plans.get(vkey)

        def run() -> ResultSet:
            cold_row = cached_cold
            if cold_row is None:
                cold_row = plan.collect()[0].asDict()
                if len(state.read_plans) > 64:
                    state.read_plans.clear()
                state.read_plans[vkey] = cold_row
            n = (
                cold_row["__n"]
                + mirror_parts["n"]
                + mem_parts["n"]
                - shadow_parts["n"]
                - base_shadow_parts["n"]
            )

            def nonnull_count(arg):
                return (
                    cold_row.get(f"__cnt_{arg}", 0)
                    + mirror_parts[f"cnt_{arg}"]
                    + mem_parts[f"cnt_{arg}"]
                    - shadow_parts[f"cnt_{arg}"]
                    - base_shadow_parts[f"cnt_{arg}"]
                )

            def fold(arg):
                # SUM over zero remaining non-null values is NULL — and
                # "remaining" must account for shadowed base rows (a base
                # whose matching rows are ALL shadowed by tombstones has
                # a non-null cold sum that fully cancels; the answer is
                # NULL, not 0.0). SUM/AVG always carry the cnt partial.
                if nonnull_count(arg) == 0:
                    return None
                csum = cold_row.get(f"__sum_{arg}")
                return (
                    (csum if csum is not None else 0)
                    + mirror_parts[f"sum_{arg}"]
                    + mem_parts[f"sum_{arg}"]
                    - shadow_parts[f"sum_{arg}"]
                    - base_shadow_parts[f"sum_{arg}"]
                )

            values = []
            for spec, fn, arg in specs:
                if fn == "COUNT":
                    v = n if (quirk or arg == "*") else nonnull_count(arg)
                elif fn == "SUM":
                    v = fold(arg)
                elif fn == "AVG":
                    if quirk:
                        s = fold(arg)
                        v = None if not n or s is None else s / n
                    else:
                        c = nonnull_count(arg)
                        s = fold(arg)
                        v = None if not c or s is None else s / c
                elif fn == "MIN":
                    # shadow_parts is empty in this branch (guard above)
                    cands = [
                        cold_row.get(f"__min_{arg}"),
                        mirror_parts[f"min_{arg}"],
                        mem_parts[f"min_{arg}"],
                    ]
                    cands = [v for v in cands if v is not None]
                    v = min(cands) if cands else None
                else:  # MAX
                    cands = [
                        cold_row.get(f"__max_{arg}"),
                        mirror_parts[f"max_{arg}"],
                        mem_parts[f"max_{arg}"],
                    ]
                    cands = [v for v in cands if v is not None]
                    v = max(cands) if cands else None
                if v is None and quirk:
                    # Quirk: MIN/MAX/SUM over empty selection → 0
                    v = 0
                values.append(v)
            return ResultSet(
                headers=[s for s, _f, _a in specs], rows=[tuple(values)]
            )

        return self._defer(run)

    def _fast_select_rows(self, state: TableState, pred, proj: list[str]):
        """Row-returning fast path: cached BASE-only plan + driver-side
        merge of both hot layers. Exact without the base pk-range proof —
        shadowed base rows are dropped AFTER collect by pk membership,
        which is a plain dict lookup. Returns None → caller uses the
        full-plan path."""
        if not self.read_fastpath_enabled:
            return None
        try:
            if state.unrecovered:
                return None  # let the fallback raise the canonical error
            if state.delta is not None and state.delta_mirror is None:
                return None
            mirror = state.delta_mirror or {}
            mem = state.memtable
            # pk-equality point lookup: served entirely driver-side —
            # memtable → delta mirror → ONE pyarrow point-read of the base
            # parquet (cached per base epoch). This is the reference's
            # get path (memtable → SSTable bloom+index probe,
            # storage_engine.hpp:384-425) done honestly: ~0.1-2 ms
            # instead of the ~15 ms cached-plan collect, the closest this
            # engine gets to the reference's in-process lookup.
            if pred is not None:
                res = self._point_lookup_rows(state, pred, proj)
                if res is not None:
                    return res
            if not mem and not mirror:
                return None  # base-only: nothing to merge driver-side
            pk = state.pk
            pk_type = state.schema[pk].dataType
            if not isinstance(
                pk_type, (T.LongType, T.IntegerType, T.StringType)
            ):
                return None  # pk-as-string sort must match Spark's cast
            match = None if pred is None else self._compile_pred(state, pred)
            hot_rows = [
                row
                for _seq, row in mem.values()
                if row is not None and (match is None or match(row))
            ] + [
                row
                for k, row in mirror.items()
                if k not in mem
                and row is not None
                and (match is None or match(row))
            ]
        except (_FastPathUnsupported, SqlError):
            return None
        key = ("rows", repr(pred), tuple(proj))
        plan = state.read_plans.get(key)
        if plan is None:
            base = self._base_df(state)
            if pred is not None:
                base = base.filter(self._pred_to_column(state, pred))
            sel = list(dict.fromkeys([pk] + proj))  # pk first, deduped
            plan = base.orderBy(F.col(pk).cast("string")).select(*sel)
            if len(state.read_plans) > 64:
                state.read_plans.clear()
            state.read_plans[key] = plan
        hot_keys = set(mem) | set(mirror)
        # Cold ROWS are constant per base epoch too; cache them when the
        # result is small (point-ish/range scans) so repeated reads under
        # ingest skip the collect roundtrip. Unbounded scans are not
        # cached — a full-table result pinned on the driver would be a
        # memory leak, not an optimization.
        rvkey = ("rowsval", repr(pred), tuple(proj), state.base_epoch)
        cached_cold_rows = state.read_plans.get(rvkey)

        def run() -> ResultSet:
            base_rows = cached_cold_rows
            if base_rows is None:
                base_rows = plan.collect()
                if len(base_rows) <= 10_000:
                    if len(state.read_plans) > 64:
                        state.read_plans.clear()
                    state.read_plans[rvkey] = base_rows
            cold_rows = [r for r in base_rows if r[0] not in hot_keys]
            merged = [tuple(r[c] for c in proj) for r in cold_rows] + [
                tuple(r[c] for c in proj) for r in hot_rows
            ]
            # proj may omit the pk — sort keys come from a parallel list
            pk_order = [str(r[0]) for r in cold_rows] + [
                str(r[pk]) for r in hot_rows
            ]
            merged = [
                row
                for _k, row in sorted(
                    zip(pk_order, merged), key=lambda t: t[0]
                )
            ]
            return ResultSet(headers=list(proj), rows=merged)

        return self._defer(run)

    def _point_lookup_rows(self, state: TableState, pred, proj: list[str]):
        """Driver-only point lookup (`pk = literal`, top-level): memtable →
        delta mirror → one pyarrow point-read of the base parquet through
        the per-epoch fetch cache. Returns a ResultSet, or None when this
        shape can't serve exactly (non-numeric pk — quirk string-pk
        equality can match MULTIPLE keys numerically, e.g. '5' vs '5.0';
        non-parquet base with no hot hit; non-primitive projected column;
        literal that can't be normalized). The found row is re-verified
        with the compiled matcher so every engine quirk still applies."""
        key = _point_lookup_pk(pred, state.pk)
        if key is None:
            return None
        pk_type = state.schema[state.pk].dataType
        if not isinstance(pk_type, (T.LongType, T.IntegerType)):
            return None
        safe = (
            T.LongType, T.IntegerType, T.ShortType, T.ByteType,
            T.DoubleType, T.FloatType, T.StringType, T.BooleanType,
        )
        for c in proj:
            if not isinstance(state.schema[c].dataType, safe):
                return None
        if isinstance(key, bool):
            return None
        if isinstance(key, str):
            key = self._parse_lit_like_cast(pk_type, key)
            if key is None:  # try_cast NULL → matches nothing
                self.stats["point_lookups"] += 1
                return ResultSet(headers=list(proj), rows=[])
        elif not isinstance(key, (int, float)):
            return None
        match = self._compile_pred(state, pred)
        row = _ABSENT
        hit = state.memtable.get(key)
        if hit is not None:
            row = hit[1]  # None = tombstone
        elif key in (state.delta_mirror or {}):
            row = state.delta_mirror[key]
        elif state.base is not None:
            lo, hi = self._base_pk_range(state)
            if lo is not None and lo <= key <= hi:
                if state.base_fetch_epoch != state.base_epoch:
                    state.base_fetch = {}
                    state.shadow_list = []
                    state.shadow_seen = set()
                    state.base_fetch_epoch = state.base_epoch
                cached = state.base_fetch.get(key, _ABSENT)
                want = set(proj) | {state.pk}
                stale = isinstance(cached, dict) and not want <= cached.keys()
                if key not in state.base_fetch or stale:
                    files = self._base_parquet_files(state)
                    if not files:
                        return None  # cold plan path handles it
                    if len(state.base_fetch) > self.BASE_FETCH_CAP:
                        return None
                    try:
                        import pyarrow.dataset as pads

                        tbl = pads.dataset(files, format="parquet").to_table(
                            columns=sorted(want),
                            filter=pads.field(state.pk) == key,
                        )
                    except Exception:
                        return None
                    self.stats["base_point_reads"] += 1
                    rows = tbl.to_pylist()
                    if rows:
                        cached = (
                            {**cached, **rows[0]}
                            if isinstance(cached, dict)
                            else rows[0]
                        )
                    else:
                        cached = _ABSENT
                    state.base_fetch[key] = cached
                    # NOT appended to shadow_list: this key is not hot —
                    # it shadows nothing; the fetch cache is just reused
                row = cached
            else:
                row = _ABSENT
        else:
            row = _ABSENT
        self.stats["point_lookups"] += 1
        if row is _ABSENT or row is None or not match(row):
            return ResultSet(headers=list(proj), rows=[])
        return ResultSet(
            headers=list(proj), rows=[tuple(row[c] for c in proj)]
        )

    def _base_df(self, state: TableState) -> DataFrame:
        """The base layer alone (empty frame if none) — the ONLY Spark-side
        input of the read fast path, stable between compactions."""
        if state.base is None:
            return self.spark.createDataFrame([], state.schema)
        return state.base

    def _defer(self, run):
        """Return a read action to execute() for unlocked execution — but
        only in in-memory mode, where the frozen plan references
        localCheckpoints no concurrent install can delete. In durable mode
        a racing flush commit may garbage-collect the parquet generation
        the plan reads mid-job, so reads stay under the statement lock."""
        return run if self.data_dir is None else run()

    # -- metadata -----------------------------------------------------------

    def _show_tables(self, ts: _Tokens) -> ResultSet:
        ts.expect_word("SHOW")
        ts.expect_word("TABLES")
        names = sorted(self.tables)
        return ResultSet(headers=["Tables"], rows=[(n,) for n in names])

    def _describe(self, ts: _Tokens) -> ResultSet:
        ts.next()  # DESCRIBE / DESC
        name_t = ts.next()
        # DESCRIBE HISTORY <t> — the table-format history view (r14; the
        # REST surface has carried it at /api/tables/<t>/history since
        # r13). Renders the txlog manifests through the formatter.
        if (
            name_t is not None
            and name_t[0] == "word"
            and str(name_t[1]).upper() == "HISTORY"
            and ts.peek() is not None  # bare `DESCRIBE history` stays a
        ):  # describe of a table named history
            return self._history_result(str(ts.next()[1]))
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
        items, table, pred, version, changes = self._parse_select(ts)
        if version is not None:
            raise SqlError("EXPLAIN of VERSION AS OF is not supported")
        if changes is not None:
            raise SqlError("EXPLAIN of CHANGES BETWEEN is not supported")
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
        # delta rows are flushed-but-uncompacted live versions — without
        # them a fully-flushed table would estimate 0 rows (review r6)
        est = 1 if point else base_rows + state.delta_rows + mem_rows
        if pred is not None and not point:
            est = max(1, int(est * 0.33))

        # Estimated I/O cost in parquet-file-read units — the analog of the
        # reference's SSTable-read cost line (hybrid_query_router.hpp:255,
        # 274-275,293-294: point lookup ~1 probe, scans read every level).
        # File list/sizes come from the file index (metadata-only, no scan),
        # cached like the row estimate.
        if state.base is None:
            n_files, n_bytes = 0, 0
        elif state.base_io is not None:
            n_files, n_bytes = state.base_io
        else:
            files = state.base.inputFiles()
            n_files = len(files)
            n_bytes = 0
            for f in files:
                if f.startswith("file:"):
                    p = f[len("file:"):]
                    while p.startswith("//"):
                        p = p[1:]
                    try:
                        n_bytes += os.path.getsize(p)
                    except OSError:
                        pass
            state.base_io = (n_files, n_bytes)
        io_files = min(1, n_files) if point else n_files
        io_cost = (
            f"{io_files} file probe(s)"
            if point
            else f"{n_files} file(s), {n_bytes} bytes"
        )

        proj = [p for kind, p in items if kind == "col"] or ["*"]
        # Plan text mirrors the reference renderer's sections
        # (hybrid_query_router.hpp:331-393), then appends Spark's plan.
        lines = [
            "=== Query Execution Plan ===",
            f"Query Type: {qtype}",
            f"Table: {state.name}",
            f"Estimated Rows: {est}",
            f"Estimated I/O Cost: {io_cost}",
            "Storage Paths:",
            f"  - Memtable Overlay ({mem_rows} hot entries)",
            f"  - Delta Segment ({state.delta_rows} flushed rows)",
            f"  - Parquet Base ({base_rows} rows)",
            f"Filter: {'yes' if pred is not None else 'none'}",
            f"Projection: {', '.join(aggs) if aggs else ', '.join(proj)}",
        ]
        df = self._filtered_view(state, pred)
        lines.append("--- Spark Physical Plan ---")
        lines.extend(
            df._jdf.queryExecution().simpleString().splitlines()  # noqa: SLF001
        )
        return ResultSet(headers=["plan"], rows=[(line,) for line in lines])
