"""The engine shell: per-credential sessions + query execution.

Reference shape (SURVEY §3.1): credentials select an isolated
catalog (main.py:140-173 — chdb Session per (user,password) hash);
``execute_query_with_session`` runs SQL and returns formatted bytes
(main.py:175-217). Here: ONE SparkSession, per-user Spark databases
(``u<hash>__<db>``) — namespace isolation without per-user JVM cost
(SURVEY §7 hard-parts note) — and the dialect front-end + format
serializers around ``spark.sql``.
"""

from __future__ import annotations

import concurrent.futures
import hashlib
import os
import struct as _struct
import threading
import time
from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from .dialect import translate
from .dialect.ddl import (
    AlterColumn,
    AttachDetach,
    AlterMutation,
    CreateDatabase,
    CreateTable,
    CreateView,
    DropObject,
    NoopDDL,
    OptimizeTable,
    RenameTables,
    TruncateTable,
    parse_ddl,
)
from .formats import QueryResult, serialize
from .functions.ch_hashes import register_all as _register_hashes
from .functions.codecs import register_all as _register_codecs
from .functions.misc_udfs import register_all as _register_misc
from .localdf import local_df
from .session import get_spark
from .sources.url import resolve_table_functions
from .system_tables import materialize as _materialize_system


# Per-query settings the engine actually acts on.  Anything else in a
# statement SETTINGS clause or the HTTP URL params is accepted (CH
# compatibility: clients send tuning knobs freely) but reported on the
# warning channel so the caller can tell it had no effect.  The
# HTTP-layer settings (query_id, enable_http_compression,
# send_progress_in_http_headers, http_headers_progress_interval_ms) are
# consumed by the server before the engine sees them.
ACTED_SETTINGS = frozenset({"default_format", "max_result_rows", "format_schema"})

# SQL-callable pipeline table functions (SURVEY §7 Phase G): name →
# usage string. Expanded by Engine._expand_pipeline_fns into operator
# DataFrames registered as per-statement temp views.
_PIPELINE_FNS = {
    "exactdedup": "exactDedup(table)",
    "minhashpairs": "minhashPairs(table[, min_jaccard])",
    "qualityscore": "qualityScore(table)",
    "langid": "langId(table)",
    "scrubdupspans": "scrubDupSpans(table[, n[, min_docs]])",
    "rewritescrub": "rewriteScrub(table[, n[, min_docs]])",
    "hllpresketch": "hllPresketch(table, 'group_col[,group_col]', 'value_col')",
    "hllrollup": "hllRollup(sketch_table, 'group_col[,group_col]' | '')",
    "histpresketch": "histPresketch(table, 'group_cols', 'value_col', lo, hi[, bins])",
    "histrollup": "histRollup(sketch_table, 'group_col[,group_col]' | '')",
    "cmspresketch": "cmsPresketch(table, 'group_cols', 'value_col'[, width[, depth]])",
    "cmsrollup": "cmsRollup(sketch_table, 'group_col[,group_col]' | '')",
    "hashedembedding": "hashedEmbedding(table[, dim])",
    "bm25": "bm25(table, 'query text'[, k])",
}
import re as _pipeline_re

_PIPELINE_FN_RE = _pipeline_re.compile(
    r"(?i)\b(" + "|".join(_PIPELINE_FNS) + r")\s*\("
)


class EngineError(Exception):
    """Query failure; message is the CH-style error text (the
    reference surfaces engine stderr as HTTP 400, main.py:823-847)."""

    def __init__(self, message: str, code: int = 62):
        super().__init__(f"Code: {code}. {message}")
        self.code = code


@dataclass
class DictionarySpec:
    """CREATE DICTIONARY registration: a keyed view over a source
    table.  dictGet* rewrites to a correlated scalar subquery over the
    source, which Catalyst turns into a (broadcastable) left join —
    exactly the dimension-lookup plan a dictionary is for."""

    name: str
    source: str  # table reference as written (db.table or table)
    key: str
    # attr name -> (CH type string, DEFAULT literal or None)
    attrs: dict = field(default_factory=dict)


@dataclass
class UserSession:
    user: str
    password: str
    current_db: str = "default"
    created_at: float = field(default_factory=time.time)
    # CH HTTP sessions: `session_id` scopes SET/USE state per client
    # session (same credential namespace/catalog); sessions with an
    # id expire `session_timeout` seconds after their last use
    session_id: str = ""
    last_used: float = field(default_factory=time.time)
    session_timeout: float = 3600.0
    # session-level SET k = v (CH sessions persist settings; we honor
    # default_format / max_result_rows, accept the rest silently)
    settings: dict = field(default_factory=dict)
    # CREATE DICTIONARY registry (name -> DictionarySpec)
    dictionaries: dict = field(default_factory=dict)
    # CREATE TEMPORARY TABLE names living in this session's hidden db
    temp_tables: set = field(default_factory=set)

    @property
    def ns(self) -> str:
        """Namespace prefix isolating this credential pair, same
        keying idea as the reference's path hash (main.py:146-149)."""
        h = hashlib.sha256(f"{self.user}:{self.password}".encode()).hexdigest()[:10]
        return f"u{h}"

    def spark_db(self, db: Optional[str] = None) -> str:
        return f"{self.ns}__{db or self.current_db}"

    @property
    def temp_db(self) -> str:
        """Hidden database for TEMPORARY tables: the `tmp` prefix
        keeps it outside the `u<hash>__` pattern every catalog listing
        filters on, so other sessions (and SHOW DATABASES) never see
        it."""
        sid = hashlib.sha256(self.session_id.encode()).hexdigest()[:8]
        return f"tmp{self.ns}_s{sid}"


def bind_query_params(sql: str, params: dict[str, str]) -> str:
    """Server-side binding of ``{name:Type}`` placeholders (the CH
    parameterized-query protocol: HTTP ``param_<name>=…`` URL params,
    native-protocol parameter entries).

    Token-aware: placeholders inside string literals are data, not
    parameters (CH parses placeholders as AST nodes).  Values bind as
    ``CAST('v' AS type)`` — never raw splicing, so a value can't
    inject SQL — with ``from_json`` for composite types."""
    from .dialect.tokenizer import tokenize
    from .dialect.types import ch_type_to_spark

    toks = tokenize(sql)
    out: list[str] = []
    i = 0
    while i < len(toks):
        t = toks[i]
        if t.kind == "op" and t.text == "{":
            # collect {name : type-tokens}
            j = i + 1
            inner: list = []
            while j < len(toks) and not (toks[j].kind == "op" and "}" in toks[j].text):
                inner.append(toks[j])
                j += 1
            name_toks = [x for x in inner if x.kind not in ("ws", "comment")]
            if (
                j < len(toks)
                and name_toks
                and name_toks[0].kind == "ident"
                and len(name_toks) >= 3
                and name_toks[1].text == ":"
            ):
                name = name_toks[0].text
                chtype = "".join(x.text for x in name_toks[2:]).strip()
                if name not in params:
                    raise EngineError(f"Substitution `{name}` is not set", 456)
                try:
                    s = ch_type_to_spark(chtype).simpleString()
                except ValueError as e:
                    raise EngineError(str(e), 456) from e
                val = params[name]
                esc = val.replace("\\", "\\\\").replace("'", "\\'")
                if s.startswith(("array", "map", "struct")):
                    out.append(f"from_json('{esc}', '{s}')")
                else:
                    out.append(f"CAST('{esc}' AS {s})")
                i = j + 1
                continue
        out.append(t.text)
        i += 1
    return "".join(out)


class Engine:
    """ClickHouse-dialect front door over Spark SQL."""

    def __init__(
        self,
        spark: Optional[SparkSession] = None,
        user_files_dir: Optional[str] = None,
        format_schema_dir: Optional[str] = None,
    ):
        self.spark = spark or get_spark("moospark-engine")
        # INTO OUTFILE confinement root (CH user_files_path analog);
        # unset → the feature is disabled (see _confine_outfile)
        self.user_files_dir = user_files_dir or os.environ.get(
            "MOOSPARK_USER_FILES_DIR"
        )
        # Schema-file formats (Protobuf): CH's format_schema_path model
        # — client-supplied format_schema names resolve inside this
        # directory only (realpath-confined in formats/protobuf.py);
        # unset → schema formats are disabled with a clear error
        self.format_schema_dir = format_schema_dir or os.environ.get(
            "MOOSPARK_FORMAT_SCHEMA_PATH"
        )
        # CH-style permissive INSERT coercion: string literals into
        # Date/DateTime/numeric columns must cast (ANSI store
        # assignment would reject `INSERT … VALUES (1, '2024-01-05')`).
        self.spark.conf.set("spark.sql.storeAssignmentPolicy", "LEGACY")
        # CH-permissive expressions (float x/0 → non-error); Spark 4
        # defaults ANSI on, which would throw instead
        self.spark.conf.set("spark.sql.ansi.enabled", "false")
        _register_hashes(self.spark)
        _register_codecs(self.spark)
        _register_misc(self.spark)
        self._sessions: dict[tuple[str, str], UserSession] = {}
        self._order_by_cache: dict[str, dict] = {}  # tbl -> moospark.* props
        # system.query_log backing store: per-credential-namespace ring
        # buffer (each user sees only their own history, like the
        # namespace isolation everywhere else)
        from collections import deque as _deque

        self._query_log: dict[str, object] = {}
        self._query_log_maxlen = 1000
        # per-Spark-db table-name sets for lock-free qualification of
        # unqualified refs on the read path; cleared on any DDL
        self._tables_cache: dict[str, set] = {}
        # analyzed-plan cache for repeated SELECT statements (a real
        # server feature: dashboards and benches re-issue identical
        # text; Spark analysis of a 100-column view costs ~0.1 s per
        # statement — measured 0.31s -> 0.05s per repeated ClickBench
        # aggregate at 10M rows). Invalidated wholesale on any
        # DDL/insert/mutation through this engine (the generation
        # counter) and skipped for non-deterministic queries. Bounded
        # LRU; holds plans only — no data is pinned. Known limit:
        # replacing a TEMP VIEW directly on the SparkSession (outside
        # the engine's DDL path) is invisible to the generation
        # counter; external writers must use a fresh Engine or its
        # DDL surface.
        from collections import OrderedDict as _OD

        self._plan_cache: "_OD[str, DataFrame]" = _OD()
        self._plan_cache_max = 128
        self._catalog_gen = 0
        self._dbs_ensured: set = set()
        # materialized-view registry: ns → {source_qual → [(storage_qual,
        # qualified select body)]}; lazily rebuilt from moospark.mv_*
        # TBLPROPERTIES so MVs survive engine restarts
        self._mv_registry: dict[str, dict[str, list[tuple[str, str]]]] = {}
        self._mv_scanned: set[str] = set()
        # One lock around catalog-mutating execution, mirroring the
        # reference's session_lock (main.py:34,162). Read-only
        # queries run concurrently; current-database switching is
        # done per-call with fully-qualified names instead of a
        # global USE where possible.
        self._lock = threading.RLock()
        self._opfn_counter = 0  # pipeline-table-function view names
        # Serializes the brief set-conf -> force-physical-plan ->
        # restore-conf windows of the static-planning fast path: two
        # concurrent readers could otherwise interleave so that one
        # reads the other's temporary adaptive=false as its "previous"
        # value and restores it permanently (observed as an
        # order-dependent test flake). Planning is ms-scale; query
        # EXECUTION happens outside the window and stays concurrent.
        self._conf_lock = threading.Lock()
        # Prepared-statement pipelining: after serving a plan-cache
        # hit, one background thread pre-plans the NEXT Dataset for
        # that statement so a repeated query pays ~0 planning latency
        # on arrival (measured ~40 ms/hit at 10M: ~11 ms QueryExecution
        # machinery + ~15-30 ms physical planning over a parquet scan).
        # The prebuilt Dataset has executed nothing — planning only —
        # so every shuffle still runs when it is collected; this is
        # statement preparation, not result caching. Slots die with
        # the cache entry (generation bump / eviction / view guard).
        self._prebuilt: dict[str, list] = {}
        self._prep_pool = concurrent.futures.ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="moospark-prep"
        )

    # ------------------------------------------------------------ sessions

    def get_session(
        self,
        user: str = "default",
        password: str = "",
        session_id: str = "",
        session_timeout: Optional[float] = None,
    ) -> UserSession:
        key = (user, password, session_id)
        now = time.time()
        with self._lock:
            # evict expired id-keyed sessions (CH session_timeout)
            for k in [
                k
                for k, s in self._sessions.items()
                if s.session_id and now - s.last_used > s.session_timeout
            ]:
                expired = self._sessions.pop(k)
                if expired.temp_tables:
                    try:
                        self.spark.sql(
                            f"DROP DATABASE IF EXISTS `{expired.temp_db}` CASCADE"
                        )
                    except Exception:
                        pass
            if key not in self._sessions:
                sess = UserSession(
                    user=user, password=password, session_id=session_id
                )
                self._sessions[key] = sess
                self._ensure_db(sess.spark_db("default"))
            sess = self._sessions[key]
            sess.last_used = now
            if session_timeout is not None:
                sess.session_timeout = session_timeout
            return sess

    def _confine_outfile(self, path: str) -> str:
        """Resolve an INTO OUTFILE path inside the engine's user-files
        directory (CH's user_files_path model). Unconfigured → the
        feature is disabled (CH code 344 SUPPORT_IS_DISABLED — real
        ClickHouse handles INTO OUTFILE client-side and never writes
        server-side). Relative paths resolve under the directory;
        absolute paths must realpath inside it (symlink-escape safe:
        the existing part of the path is fully resolved before the
        containment check; CH code 481 PATH_ACCESS_DENIED)."""
        import os as _os

        root = self.user_files_dir
        if not root:
            raise EngineError(
                "INTO OUTFILE is disabled on this server: no user-files "
                "directory is configured (set MOOSPARK_USER_FILES_DIR or "
                "pass user_files_dir=)", code=344,
            )
        root_real = _os.path.realpath(root)
        cand = path if _os.path.isabs(path) else _os.path.join(root_real, path)
        base = _os.path.basename(cand)
        if not base:
            raise EngineError(f"Invalid OUTFILE path '{path}'", code=481)
        parent_real = _os.path.realpath(_os.path.dirname(cand))
        target = _os.path.join(parent_real, base)
        try:
            inside = _os.path.commonpath([root_real, target]) == root_real
        except ValueError:  # different drives (win) — definitely outside
            inside = False
        if not inside:
            raise EngineError(
                f"Path '{path}' is outside the user-files directory",
                code=481,
            )
        return target

    def _log_query(
        self,
        user: str,
        password: str,
        query: str,
        elapsed: float,
        result_rows: int,
        qtype: str,
        exception: str,
    ) -> None:
        import datetime as _dt
        from collections import deque as _deque

        ns = self.get_session(user, password).ns
        with self._lock:
            buf = self._query_log.get(ns)
            if buf is None:
                buf = _deque(maxlen=self._query_log_maxlen)
                self._query_log[ns] = buf
            # CH log_queries_cut_to_length (default 100 KB): bulk
            # INSERT ... FORMAT payloads must not pin megabytes of
            # text per ring-buffer slot (ADVICE r4)
            buf.append(
                (
                    qtype,
                    _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None),
                    round(elapsed * 1000.0, 3),
                    query[:100_000],
                    result_rows,
                    user,
                    exception,
                )
            )

    def query_log_rows(self, ns: str) -> list:
        with self._lock:
            return list(self._query_log.get(ns, []))

    def has_session(
        self, user: str = "default", password: str = "", session_id: str = ""
    ) -> bool:
        """True if an unexpired session exists (CH ``session_check=1``)."""
        with self._lock:
            s = self._sessions.get((user, password, session_id))
        return s is not None and (
            not s.session_id or time.time() - s.last_used <= s.session_timeout
        )

    def _ensure_db(self, spark_db: str) -> None:
        if spark_db in self._dbs_ensured:
            return
        self.spark.sql(f"CREATE DATABASE IF NOT EXISTS `{spark_db}`")
        self._dbs_ensured.add(spark_db)

    # ------------------------------------------------------------ execute

    def execute(
        self,
        query: str,
        fmt: Optional[str] = None,
        user: str = "default",
        password: str = "",
        database: Optional[str] = None,
        params: Optional[dict] = None,
        session_id: str = "",
    ) -> bytes:
        """Run a (possibly multi-statement) CH-dialect query; returns
        the LAST statement's result serialized per the CH precedence
        FORMAT clause > caller ``fmt`` > session ``SET default_format``
        > TSV (reference semantics: USE prefixing + single result,
        main.py:859-860)."""
        return self.execute_with_format(
            query, fmt, user, password, database, params=params,
            session_id=session_id
        )[0]

    def execute_with_format(
        self,
        query: str,
        fmt: Optional[str] = None,
        user: str = "default",
        password: str = "",
        database: Optional[str] = None,
        extra_settings: Optional[dict] = None,
        params: Optional[dict] = None,
        session_id: str = "",
    ) -> tuple[bytes, str, dict]:
        """Like :meth:`execute`, also returning the format actually
        used (FORMAT clause / caller / session SET / TSV) so servers
        can emit the right Content-Type, plus a stats dict for the
        X-ClickHouse-Summary response header. ``extra_settings`` are
        query-level settings (CH URL params): above session SET,
        below an explicit statement SETTINGS clause."""
        t_start = time.time()
        try:
            df, out_fmt, settings, elapsed = self.execute_to_df(
                query, user, password, database, params=params, session_id=session_id
            )
        except EngineError as e:
            self._log_query(user, password, query, time.time() - t_start, 0,
                            "ExceptionWhileProcessing", str(e))
            raise
        eng_warnings = settings.pop("__engine_warnings__", [])
        outfile = settings.pop("__outfile__", None)
        outfile_mode = settings.pop("__outfile_mode__", "error")
        outfile_stdout = settings.pop("__outfile_stdout__", False)
        sess = self.get_session(user, password, session_id)
        merged = {**sess.settings, **(extra_settings or {}), **settings}
        use_fmt = out_fmt or fmt or merged.get("default_format") or "TSV"
        # Warning channel (reference main.py:863-868: a query can succeed
        # WITH non-fatal stderr text and still return 200).  Our analog:
        # per-query settings the engine accepted but does not act on are
        # reported as warnings in the stats dict; servers surface them
        # without failing the query.  Session-level SET values don't
        # re-warn on every subsequent statement.
        warnings = eng_warnings + [
            f"Setting '{k}' was accepted but is ignored by this engine"
            for k in {**(extra_settings or {}), **settings}
            if k not in ACTED_SETTINGS
        ]
        if df is None:
            stats0 = {"result_rows": 0, "elapsed_ns": int(elapsed * 1e9)}
            if warnings:
                stats0["warnings"] = warnings
            self._log_query(user, password, query, elapsed, 0, "QueryFinish", "")
            return b"", use_fmt, stats0
        res = QueryResult.from_dataframe(df, elapsed=elapsed)
        res.elapsed = elapsed
        res.totals = getattr(df, "_moospark_totals", None)
        max_rows = None
        if "max_result_rows" in merged:
            try:
                max_rows = int(merged["max_result_rows"])
            except ValueError:
                pass
        # res.rows is a lazy iterator (toLocalIterator) — count rows
        # as the serializer drains it, without materializing
        counted = {"n": 0}

        def _counting(it):
            for r in it:
                counted["n"] += 1
                yield r

        res.rows = _counting(res.rows)
        try:
            body = serialize(
                res, use_fmt, max_result_rows=max_rows,
                settings={**merged,
                          "__format_schema_path__": self.format_schema_dir},
            )
        except ValueError as e:
            if "unknown format" in str(e).lower():
                # CH code 73: UNKNOWN_FORMAT
                raise EngineError(f"Unknown format {use_fmt}", 73) from e
            # schema-file format misuse (missing/invalid format_schema,
            # path escape, unknown message): CH BAD_ARGUMENTS
            raise EngineError(str(e), 36) from e
        if outfile:
            # INTO OUTFILE: result bytes go to the file; the wire body
            # is empty unless AND STDOUT was given (CH semantics —
            # default mode ERRORS on an existing file). The path is
            # confined to the configured user-files directory — an
            # unconfined write would hand any HTTP client an
            # arbitrary-file-write primitive with server privileges
            # (ADVICE r4; real ClickHouse treats INTO OUTFILE as
            # client-side only and rejects it on the server).
            import os as _os

            target = self._confine_outfile(outfile)
            if outfile_mode == "error" and _os.path.exists(target):
                raise EngineError(
                    f"File '{outfile}' already exists "
                    "(use TRUNCATE or APPEND to overwrite)", code=76
                )
            with open(target, "ab" if outfile_mode == "append" else "wb") as f:
                f.write(body)
            if not outfile_stdout:
                body = b""
        stats = {
            "result_rows": counted["n"],
            "result_bytes": len(body),
            "elapsed_ns": int(elapsed * 1e9),
        }
        if warnings:
            stats["warnings"] = warnings
        self._log_query(
            user, password, query, elapsed, counted["n"], "QueryFinish", ""
        )
        return body, use_fmt, stats

    def execute_to_df(
        self,
        query: str,
        user: str = "default",
        password: str = "",
        database: Optional[str] = None,
        params: Optional[dict] = None,
        session_id: str = "",
    ) -> tuple[Optional[DataFrame], Optional[str], dict, float]:
        if params or "{" in query:
            # also runs with no bindings so an unbound {name:Type}
            # reports "Substitution not set" (CH code 456), not a
            # Spark parse error; queries without braces skip the pass
            query = bind_query_params(query, params or {})
        sess = self.get_session(user, password, session_id)
        if database:
            sess.current_db = database
        t0 = time.time()
        result_df: Optional[DataFrame] = None
        out_fmt: Optional[str] = None
        settings: dict = {}
        data_insert = _match_insert_data(query)
        if data_insert is not None:
            ref, col_list, fmt_name, payload, ins_settings = data_insert
            self._invalidate_plans()
            self._insert_formatted(
                sess, ref, col_list, fmt_name, payload, ins_settings
            )
            return None, None, {}, time.time() - t0
        try:
            stmts = translate(query)
        except Exception as e:  # tokenizer never raises today; belt+braces
            raise EngineError(f"Syntax error: {e}") from e
        if not stmts:
            return None, None, {}, 0.0
        for st in stmts:
            if st.kind == "use":
                sess.current_db = st.database or "default"
                self._ensure_db(sess.spark_db())
                result_df = None
            elif st.kind == "set":
                sess.settings.update(_parse_set(st.original))
                continue
            elif st.kind == "ddl":
                self._run_ddl(sess, st.original)
                result_df = None
            elif st.kind == "insert":
                self._run_insert(sess, st.spark_sql)
                result_df = None
            elif st.kind == "exists":
                result_df = self._run_exists(sess, st.spark_sql)
            elif st.kind == "check":
                result_df = self._run_check(sess, st.spark_sql)
            elif st.kind == "kill":
                # no async query registry: nothing to kill; CH shape
                result_df = self.spark.createDataFrame(
                    [],
                    "kill_status string, query_id string, user string, query string",
                )
            elif st.kind == "system":
                settings.setdefault("__engine_warnings__", []).append(
                    "SYSTEM statement accepted but is a no-op in this "
                    f"engine: {st.original.strip()}"
                )
                result_df = None
            else:
                out_fmt = st.format or out_fmt
                settings.update(st.settings)
                if st.outfile:
                    settings["__outfile__"] = st.outfile
                    settings["__outfile_mode__"] = st.outfile_mode
                    settings["__outfile_stdout__"] = st.outfile_and_stdout
                result_df = self._run_show(sess, st.spark_sql)
                if result_df is None:
                    result_df = self._run_select(sess, st.spark_sql)
                if st.explain_graph:
                    from .plans.inspect import plan_digraph

                    dot = plan_digraph(result_df)
                    result_df = local_df(
                        self.spark, [(dot,)], "explain string"
                    )
                if st.with_fill:
                    result_df = self._apply_with_fill(result_df, st.with_fill)
                if st.with_totals:
                    result_df = self._split_totals(result_df)
        return result_df, out_fmt, settings, time.time() - t0

    def _split_totals(self, df: DataFrame) -> DataFrame:
        """Separate the GROUPING SETS totals row (WITH TOTALS rewrite,
        dialect `_rewrite_with_totals`): detail rows keep the result
        schema; the gid!=0 row is attached as ``_moospark_totals``
        with NULL group keys replaced by CH default values."""
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        gid = "__ch_gid"
        detail = df.filter(F.col(gid) == 0).drop(gid)
        tot_rows = df.filter(F.col(gid) != 0).drop(gid).collect()
        totals = None
        if tot_rows:
            vals = []
            for fld, v in zip(detail.schema.fields, tot_rows[0]):
                if v is None:
                    if isinstance(fld.dataType, T.NumericType):
                        v = 0
                    elif isinstance(fld.dataType, T.StringType):
                        v = ""
                vals.append(v)
            totals = tuple(vals)
        detail._moospark_totals = totals  # noqa: SLF001 — carried to serializer
        return detail


    # ------------------------------------------------------------ statements

    def _in_user_db(self, sess: UserSession):
        self._ensure_db(sess.spark_db())
        self.spark.catalog.setCurrentDatabase(sess.spark_db())

    _CTX_END_KW = frozenset(
        "WHERE GROUP ORDER LIMIT ON USING SELECT HAVING UNION INTERSECT "
        "EXCEPT WINDOW LATERAL SETTINGS DISTRIBUTE CLUSTER SORT SET".split()
    )

    def _cte_names(self, toks, sig) -> set:
        """Names bound by ``<ident> AS (`` — CTEs (and WINDOW clause
        names, harmlessly). These must never be database-qualified."""
        names = set()
        for k in range(len(sig) - 2):
            t = toks[sig[k]]
            if (
                t.kind in ("ident", "bquote")
                and toks[sig[k + 1]].upper == "AS"
                and toks[sig[k + 2]].text == "("
            ):
                names.add(t.text.strip("`").lower())
        return names

    def _table_known(self, sess: UserSession, name: str) -> bool:
        """Is ``name`` a real table in the session's current database?
        Cached per Spark db; DDL clears the cache (single process, so
        no cross-process staleness)."""
        db = sess.spark_db()
        cache = self._tables_cache.get(db)
        if cache is None:
            try:
                cache = {
                    t.name.lower()
                    for t in self.spark.catalog.listTables(db)
                    if not t.isTemporary
                }
            except Exception:
                cache = set()
            self._tables_cache[db] = cache
        return name.lower() in cache

    def _is_temp_view(self, name: str) -> bool:
        """True only for session temp views (conformance tables etc.).
        ``getTable`` resolves temp views before the current database,
        so a concurrent thread's current-db switch can't alias another
        credential's table into a True here."""
        try:
            return bool(self.spark.catalog.getTable(name).isTemporary)
        except Exception:
            return False

    def _remap_databases(
        self, sess: UserSession, sql: str, created_views: Optional[list] = None
    ) -> str:
        """Fully qualify table refs into the per-user Spark database.

        ``db.table`` refs rewrite their db part; *unqualified* names in
        table position that exist in the session's current db gain an
        explicit db prefix, so the read path never needs
        ``setCurrentDatabase`` (shared-session state) and SELECTs run
        lock-free. CTE names, temp views, and table functions
        (``name(``) are left alone. ``FROM`` inside a function call
        (EXTRACT/substring/trim ... FROM x) does NOT open table
        context — subquery parens re-detect their own FROM.
        """
        from .dialect.tokenizer import tokenize

        toks = tokenize(sql)
        sig = [i for i, t in enumerate(toks) if t.kind not in ("ws", "comment")]
        cte = self._cte_names(toks, sig)
        out = [t.text for t in toks]
        paren: list = []  # "sub" (subquery) | "func" (call) | "plain"
        from_depths: set = set()  # paren depths with an active FROM list
        table_ctx = False
        k = 0
        while k < len(sig):
            i = sig[k]
            t = toks[i]
            kw = t.text.upper() if t.kind == "ident" else ""
            if t.text == "(":
                nxt = toks[sig[k + 1]].upper if k + 1 < len(sig) else ""
                prev = toks[sig[k - 1]] if k > 0 else None
                if nxt in ("SELECT", "WITH"):
                    paren.append("sub")
                elif prev is not None and prev.kind in ("ident", "bquote"):
                    paren.append("func")
                else:
                    paren.append("plain")
                table_ctx = False
                k += 1
                continue
            if t.text == ")":
                if paren:
                    paren.pop()
                from_depths = {d for d in from_depths if d <= len(paren)}
                k += 1
                continue
            if kw in ("FROM", "JOIN", "INTO", "TABLE") or (
                kw in ("DESCRIBE", "DESC") and k == 0
            ):
                if kw == "FROM" and paren and paren[-1] == "func":
                    k += 1
                    continue  # EXTRACT(unit FROM x) and friends
                table_ctx = True
                if kw == "FROM":
                    from_depths.add(len(paren))
                k += 1
                continue
            if kw in self._CTX_END_KW:
                table_ctx = False
                from_depths.discard(len(paren))
                k += 1
                continue
            if t.kind == "op" and t.text not in ("(", ")", ",", "."):
                # a table ref never follows an operator (`table = 'x'`
                # is a column named table, not table context)
                table_ctx = False
                k += 1
                continue
            if table_ctx and t.kind in ("ident", "bquote"):
                # pattern: name '.' name  → qualify db part
                if (
                    k + 2 < len(sig)
                    and toks[sig[k + 1]].text == "."
                    and toks[sig[k + 2]].kind in ("ident", "bquote")
                ):
                    db = t.text.strip("`")
                    if db == "system":
                        # synthesized introspection tables (SURVEY §1.1;
                        # Play UI queries system.settings, index.html:27)
                        tbl = toks[sig[k + 2]].text.strip("`")
                        view = _materialize_system(self.spark, sess.ns, tbl, sess, engine=self)
                        if view is not None:
                            if created_views is not None:
                                created_views.append(view)
                            out[i] = view
                            out[sig[k + 1]] = ""
                            out[sig[k + 2]] = ""
                            k += 3
                            table_ctx = False
                            continue
                    out[i] = f"`{sess.spark_db(db)}`"
                    k += 3
                elif k + 1 < len(sig) and toks[sig[k + 1]].text == "(":
                    k += 1  # table function (numbers(), file(), …)
                else:
                    name = t.text.strip("`")
                    # Qualify BOTH known tables and unknown names (an
                    # unknown name must error inside this session's
                    # namespace, not resolve against whatever current
                    # database another thread last set). Only CTEs and
                    # temp views stay unqualified.
                    if name in sess.temp_tables:
                        out[i] = f"`{sess.temp_db}`.`{name}`"
                    elif (
                        name.lower() not in cte
                        and not name.startswith("__moospark")
                        and (
                            self._table_known(sess, name)
                            or not self._is_temp_view(name)
                        )
                    ):
                        out[i] = f"`{sess.spark_db()}`.`{name}`"
                    k += 1
                table_ctx = False
                continue
            if t.text == "," and len(paren) in from_depths:
                table_ctx = True  # FROM a, b — comma join continues
            k += 1
        return "".join(out)

    def _prepare_sql(
        self, sess: UserSession, sql: str, created_views: Optional[list] = None
    ) -> str:
        if "__MOOSPARK_SESSION_USER__" in sql:
            # currentUser()/user() — the CH session identity, which is
            # the authenticated user, not the JVM OS user
            sql = sql.replace("__MOOSPARK_SESSION_USER__", sess.user.replace("'", "''"))
        low = sql.lower()
        if "url(" in low or "file(" in low:
            try:
                hint = self._insert_structure_hint(sess, sql)
                sql = resolve_table_functions(
                    self.spark, sql, default_schema=hint,
                    files_root=self.user_files_dir,
                )
            except EngineError:
                raise
            except Exception as e:
                raise EngineError(f"url()/file() source failed: {e}") from e
        if "merge(" in low.replace(" ", ""):
            sql = self._expand_merge(sess, sql)
        if _PIPELINE_FN_RE.search(sql):
            sql = self._expand_pipeline_fns(sess, sql, created_views)
        if sess.dictionaries and ("dictget" in low or "dicthas" in low):
            sql = self._expand_dict_functions(sess, sql)
        sql = self._remap_databases(sess, sql, created_views)
        if "final" in sql.lower():
            sql = self._expand_final(sql)
        return sql

    def _insert_structure_hint(self, sess: UserSession, sql: str) -> Optional[str]:
        """Spark DDL schema string for the target of ``INSERT INTO t
        [(cols)] SELECT … FROM url()/file()`` — CH types bare text
        sources from the insert target's schema (structure hint), so
        ``SELECT * FROM url('…hits_v1.tsv.xz','TSV')`` parses all 105
        columns with the table's names and types instead of yielding
        untyped ``_c0…`` strings (reference CI load, test.yml:50).
        Returns None when the statement is not such an INSERT or the
        target does not (yet) exist — plain SELECTs keep inference."""
        from .dialect.tokenizer import tokenize

        toks = [t for t in tokenize(sql) if t.kind not in ("ws", "comment")]
        if len(toks) < 4 or toks[0].text.upper() != "INSERT" or toks[1].text.upper() != "INTO":
            return None
        if toks[2].text.upper() in ("SELECT", "VALUES", "FUNCTION"):
            return None
        name = toks[2].text.strip("`")
        i = 3
        if i + 1 < len(toks) and toks[i].text == ".":
            qual = f"`{sess.spark_db(name)}`.`{toks[i + 1].text.strip('`')}`"
            i += 2
        else:
            qual = (
                f"`{sess.temp_db}`.`{name}`"
                if name in sess.temp_tables
                else f"`{sess.spark_db()}`.`{name}`"
            )
        col_list: list[str] = []
        if i < len(toks) and toks[i].text == "(":
            depth = 0
            while i < len(toks):
                if toks[i].text == "(":
                    depth += 1
                elif toks[i].text == ")":
                    depth -= 1
                    if depth == 0:
                        break
                elif depth == 1 and toks[i].kind in ("ident", "bquote"):
                    col_list.append(toks[i].text.strip("`"))
                i += 1
        try:
            schema = self.spark.table(qual).schema
        except Exception:
            return None
        fields = {f.name: f for f in schema.fields}
        picked = (
            [fields[c] for c in col_list if c in fields] if col_list else list(schema.fields)
        )
        if col_list and len(picked) != len(col_list):
            return None
        return ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in picked)

    def _expand_final(self, sql: str) -> str:
        """``FROM t FINAL`` after db-remapping: for a table whose
        declared engine is Replacing*, substitute the keep-latest
        dedup (row_number over the MergeTree ORDER BY key, latest =
        max of the ReplacingMergeTree(ver) column when declared, else
        an arbitrary survivor — matching CH, where pre-merge survivor
        choice without ``ver`` is unspecified). Non-Replacing tables
        (and views/temp tables with no properties) just drop FINAL,
        which is exact for them: there is no unmerged-parts state.

        Scale note: the dedup is one window over the table's own sort
        key — at cluster scale that is a single hash-partitioned
        shuffle on the primary key, the same cost ClickHouse pays for
        a FINAL read's merge pass."""
        from .dialect.tokenizer import tokenize

        toks = tokenize(sql)
        sig = [i for i, t in enumerate(toks) if t.kind not in ("ws", "comment")]
        # Clause-context scan: FINAL is a table modifier ONLY in
        # FROM/JOIN position. Keying off the previous token alone
        # mis-fired on the valid implicit column alias ``SELECT x
        # final FROM t`` (alias silently renamed + junk props lookups
        # — ADVICE r4). A linear pass suffices: FROM/JOIN open table
        # context; any select-list / condition / clause keyword
        # closes it (subquery SELECTs close it for their own list).
        _OPEN = {"FROM", "JOIN"}
        _CLOSE = {
            "SELECT", "WHERE", "PREWHERE", "GROUP", "HAVING", "ORDER",
            "LIMIT", "OFFSET", "SETTINGS", "UNION", "INTERSECT",
            "EXCEPT", "ON", "USING", "WINDOW", "QUALIFY",
        }
        in_from: list[bool] = []
        state = False
        for i in sig:
            tt = toks[i]
            if tt.kind == "ident":
                up = tt.text.upper()
                if up in _OPEN:
                    state = True
                elif up in _CLOSE:
                    state = False
            in_from.append(state)
        changed = False
        for si, i in enumerate(sig):
            t = toks[i]
            if t.kind != "ident" or t.text.upper() != "FINAL" or si == 0:
                continue
            if not in_from[si]:
                continue  # FINAL outside FROM/JOIN position: identifier
            prev = toks[sig[si - 1]]
            if prev.kind not in ("ident", "bquote"):
                continue
            if prev.kind == "ident" and prev.text.upper() in (
                "SELECT", "AS", "FROM", "JOIN", "WHERE", "AND", "OR", "ON",
                "BY", "HAVING", "WHEN", "THEN", "ELSE", "IN", "NOT", ",",
            ):
                continue  # FINAL here is an identifier, not the modifier
            # table ref: walk back over [AS alias] and `db`.`tbl`
            j = si - 1
            alias = None
            if (
                j >= 2
                and toks[sig[j - 1]].kind == "ident"
                and toks[sig[j - 1]].text.upper() == "AS"
            ):
                alias = toks[sig[j]].text.strip("`")
                j -= 2  # ref ends before AS
            ref_idx = [sig[j]]
            if (
                j >= 2
                and toks[sig[j - 1]].text == "."
                and toks[sig[j - 2]].kind in ("ident", "bquote")
            ):
                ref_idx = [sig[j - 2], sig[j - 1], sig[j]]
            ref_text = "".join(toks[k].text for k in ref_idx)
            bare = alias or toks[ref_idx[-1]].text.strip("`")
            props = self._table_moospark_props(ref_text)
            eng = props.get("engine", "")
            t.text = ""  # FINAL never reaches Spark
            changed = True
            spec = self._final_partition_order(props)
            if not eng.startswith("Replacing") or spec is None:
                continue
            keys, order = spec
            toks[ref_idx[0]].text = (
                f"(SELECT * EXCEPT (__ch_fin) FROM (SELECT *, row_number() "
                f"OVER (PARTITION BY {keys} ORDER BY {order}) AS __ch_fin "
                f"FROM {ref_text}) WHERE __ch_fin = 1) AS `{bare}`"
            )
            for k in ref_idx[1:]:
                toks[k].text = ""
            if alias is not None:  # blank the original AS alias tokens
                toks[sig[si - 2]].text = ""
                toks[sig[si - 1]].text = ""
        return "".join(t.text for t in toks) if changed else sql

    def _final_partition_order(self, props: dict) -> Optional[tuple[str, str]]:
        """(partition_keys_sql, order_sql) for the FINAL keep-latest
        window, from a table's moospark.* props. Sort keys split on
        TOP-LEVEL commas only — ``ORDER BY (id, toYYYYMM(d))`` must
        not shear the call in half (ADVICE r4) — and function-call
        keys translate like any CH expression. The version column is
        the FIRST engine argument: ReplacingMergeTree(ver, is_deleted)
        orders by ver alone."""
        keys_txt = (props.get("order_by") or "").strip()
        if not keys_txt:
            return None
        raw = keys_txt[1:-1] if keys_txt.startswith("(") and keys_txt.endswith(")") else keys_txt
        parts = [p.strip() for p in _split_top_level(raw) if p.strip()]
        if not parts:
            return None

        def key_sql(p: str) -> str:
            bare = p.strip("`")
            if _re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", bare):
                return f"`{bare}`"
            try:
                return self._translate_expr(p)
            except Exception:  # noqa: BLE001 — last resort: verbatim
                return p

        keys = ", ".join(key_sql(p) for p in parts)
        args_raw = (props.get("engine_args") or "").strip()
        ver = _split_top_level(args_raw)[0].strip() if args_raw else ""
        order = f"`{ver.strip('`')}` DESC" if ver else keys
        return keys, order

    def _expand_pipeline_fns(
        self, sess: UserSession, sql: str, created_views: Optional[list]
    ) -> str:
        """SQL-callable pipeline operators (SURVEY §7 Phase G: the
        extension library 'expressed as SQL-callable table
        functions'): ``exactDedup(t)``, ``minhashPairs(t[, min_j])``,
        ``qualityScore(t)``, ``langId(t)``, ``scrubDupSpans(t[, n[,
        min_docs]])``, ``bm25(t, 'query'[, k])`` in TABLE position
        only (the call must directly follow FROM or JOIN — an
        identifier merely sharing a function's name, e.g. a table
        named bm25 in ``INSERT INTO bm25 (cols)``, is left alone;
        nested fn-as-table-arg is handled inside the resolver)
        build the operator DataFrame over the session's table and
        substitute a temp view — so both wire protocols reach the
        dedup/retrieval/text library, not just the Python API. The
        view joins ``created_views`` and follows the url()/system
        lifecycle: analyzed eagerly, dropped post-analysis, never
        plan-cached (operator plans re-resolve per execution, so an
        INSERT between calls is seen).

        The source table must carry the operators' default columns
        (doc_id, text) — the resolution error names the table if not.
        """
        from .dialect.tokenizer import tokenize

        toks = tokenize(sql)
        out: list[str] = []
        i = 0
        changed = False
        prev_sig = None  # last significant token seen (lowercased)
        while i < len(toks):
            t = toks[i]
            if (
                t.kind == "ident"
                and t.text.lower() in _PIPELINE_FNS
                and prev_sig in ("from", "join")
            ):
                j = i + 1
                while j < len(toks) and toks[j].kind in ("ws", "comment"):
                    j += 1
                if j < len(toks) and toks[j].text == "(":
                    depth, k = 0, j
                    while k < len(toks):
                        if toks[k].text == "(":
                            depth += 1
                        elif toks[k].text == ")":
                            depth -= 1
                            if depth == 0:
                                break
                        k += 1
                    if k < len(toks):
                        view = self._pipeline_fn_view(
                            sess, t.text.lower(), toks[j + 1 : k],
                            created_views,
                        )
                        out.append(view)
                        i = k + 1
                        changed = True
                        continue
            out.append(t.text)
            if t.kind not in ("ws", "comment"):
                prev_sig = t.text.lower()
            i += 1
        return "".join(out) if changed else sql

    def _pipeline_fn_view(
        self, sess: UserSession, name: str, arg_toks,
        created_views: Optional[list] = None,
    ) -> str:
        # split on top-level commas
        args: list = []
        cur: list = []
        depth = 0
        for tk in arg_toks:
            if tk.text == "(":
                depth += 1
            elif tk.text == ")":
                depth -= 1
            if tk.kind == "op" and tk.text == "," and depth == 0:
                args.append(cur)
                cur = []
            else:
                cur.append(tk)
        if cur:
            args.append(cur)
        sig = _PIPELINE_FNS[name]
        if not args or not [t for t in args[0] if t.kind not in ("ws", "comment")]:
            raise EngineError(f"{name}: usage {sig}", 42)
        ref = "".join(
            t.text for t in args[0] if t.kind not in ("ws", "comment")
        )
        lits: list = []
        for a in args[1:]:
            vals = [t for t in a if t.kind not in ("ws", "comment")]
            # the dialect front-end suffixes numeric literals (0.4D,
            # 3L) before this expansion runs — fold the suffix back
            if (
                len(vals) == 2
                and vals[0].kind == "number"
                and vals[1].kind == "ident"
                and vals[1].text.upper() in ("D", "L")
            ):
                vals = vals[:1]
            if len(vals) != 1 or vals[0].kind not in ("string", "number"):
                raise EngineError(
                    f"{name}: literal arguments only — usage {sig}", 42
                )
            tk = vals[0]
            if tk.kind == "string":
                lits.append(tk.text[1:-1].replace("\\'", "'").replace("''", "'"))
            else:
                try:
                    lits.append(
                        float(tk.text)
                        if ("." in tk.text or "e" in tk.text.lower())
                        else int(tk.text)
                    )
                except ValueError as e:
                    raise EngineError(
                        f"{name}: bad numeric literal '{tk.text}' — "
                        f"usage {sig}",
                        42,
                    ) from e
        # nested composition: the table argument may itself be a
        # pipeline fn — bm25(exactDedup(t), 'q', 5) — resolved
        # depth-first into its own (per-statement, dropped-later) view
        head = [t for t in args[0] if t.kind not in ("ws", "comment")]
        if (
            len(head) >= 3
            and head[0].kind == "ident"
            and head[0].text.lower() in _PIPELINE_FNS
            and head[1].text == "("
            and head[-1].text == ")"
        ):
            inner = self._pipeline_fn_view(
                sess, head[0].text.lower(), head[2:-1], created_views
            )
            df = self.spark.table(inner)
        else:
            parts = [p.strip("`") for p in ref.split(".")]
            if len(parts) == 2:
                db, tname = parts
                qual = f"`{sess.spark_db(db)}`.`{tname}`"
            elif len(parts) == 1:
                tname = parts[0]
                # the session's CH TEMPORARY tables shadow catalog
                # names, exactly like _remap_databases; no bare
                # spark.table fallback — that would resolve against
                # the SHARED session's current database / temp views
                # (cross-credential leak)
                if tname in sess.temp_tables:
                    qual = f"`{sess.temp_db}`.`{tname}`"
                else:
                    qual = f"`{sess.spark_db(sess.current_db)}`.`{tname}`"
            else:
                raise EngineError(f"{name}: bad table reference '{ref}'", 60)
            try:
                df = self.spark.table(qual)
            except Exception as e:
                raise EngineError(
                    f"{name}: unknown table '{ref}': {e}", 60
                ) from e
        try:
            if name == "bm25":
                if not lits or not isinstance(lits[0], str):
                    raise EngineError(f"bm25: usage {sig}", 42)
                from .localdf import local_df
                from .operators.retrieval import bm25_topk

                q = local_df(
                    self.spark,
                    [(0, lits[0])],
                    "query_id long, qtext string",
                )
                res = bm25_topk(
                    df, q, k=int(lits[1]) if len(lits) > 1 else 10
                ).drop("query_id")
            elif name == "exactdedup":
                from .operators.dedup import exact_dedup

                res = exact_dedup(df)
            elif name == "minhashpairs":
                from .operators.dedup import minhash_lsh_pairs

                res = minhash_lsh_pairs(
                    df,
                    min_jaccard=float(lits[0]) if lits else 0.5,
                )
            elif name == "qualityscore":
                from .operators.text import quality_score

                res = quality_score(df)
            elif name == "langid":
                from .operators.text import lang_id

                res = lang_id(df)
            elif name == "scrubdupspans":
                from .operators.text import scrub_dup_spans

                res = scrub_dup_spans(
                    df,
                    n=int(lits[0]) if lits else 6,
                    min_docs=int(lits[1]) if len(lits) > 1 else 2,
                )
            elif name == "rewritescrub":
                # the rewritten CORPUS: original columns, text
                # replaced by the scrubbed version; only docs scrubbed
                # TO empty drop (untouched empties pass through) —
                # composes with every other fn: bm25(rewriteScrub(t))
                from .operators.text import rewrite_scrubbed

                res = rewrite_scrubbed(
                    df,
                    n=int(lits[0]) if lits else 6,
                    min_docs=int(lits[1]) if len(lits) > 1 else 2,
                )
            elif name == "hllpresketch":
                if len(lits) < 2 or not all(
                    isinstance(x, str) for x in lits[:2]
                ):
                    raise EngineError(f"hllpresketch: usage {sig}", 42)
                from .operators.sketches import hll_presketch

                groups = [c.strip() for c in lits[0].split(",") if c.strip()]
                res = hll_presketch(df, groups, lits[1])
            elif name == "histpresketch":
                if (
                    len(lits) < 4
                    or not all(isinstance(x, str) for x in lits[:2])
                    or not all(
                        isinstance(x, (int, float)) for x in lits[2:4]
                    )
                ):
                    raise EngineError(f"histpresketch: usage {sig}", 42)
                from .operators.sketches import hist_presketch

                groups = [c.strip() for c in lits[0].split(",") if c.strip()]
                res = hist_presketch(
                    df,
                    groups,
                    lits[1],
                    float(lits[2]),
                    float(lits[3]),
                    bins=int(lits[4]) if len(lits) > 4 else 64,
                )
            elif name == "histrollup" or name == "cmsrollup":
                if not lits or not isinstance(lits[0], str):
                    raise EngineError(f"{name}: usage {sig}", 42)
                from .operators.sketches import cms_rollup, hist_rollup

                groups = [c.strip() for c in lits[0].split(",") if c.strip()]
                res = (
                    hist_rollup(df, groups)
                    if name == "histrollup"
                    else cms_rollup(df, groups)
                )
            elif name == "hashedembedding":
                from .operators.embeddings import hashed_embedding

                res = hashed_embedding(
                    df, dim=int(lits[0]) if lits else 256
                )
            elif name == "cmspresketch":
                if len(lits) < 2 or not all(
                    isinstance(x, str) for x in lits[:2]
                ):
                    raise EngineError(f"cmspresketch: usage {sig}", 42)
                from .operators.sketches import cms_presketch

                groups = [c.strip() for c in lits[0].split(",") if c.strip()]
                res = cms_presketch(
                    df,
                    groups,
                    lits[1],
                    width=int(lits[2]) if len(lits) > 2 else 1024,
                    depth=int(lits[3]) if len(lits) > 3 else 4,
                )
            else:  # hllrollup
                if not lits or not isinstance(lits[0], str):
                    raise EngineError(f"hllrollup: usage {sig}", 42)
                from .operators.sketches import hll_rollup

                groups = [c.strip() for c in lits[0].split(",") if c.strip()]
                res = hll_rollup(df, groups)
        except EngineError:
            raise
        except Exception as e:
            raise EngineError(f"{name} over '{ref}' failed: {e}", 36) from e
        import uuid as _uuid

        with self._lock:
            self._opfn_counter += 1
            # counter keeps names debuggable; the uuid suffix makes them
            # unguessable so a concurrent session can't SELECT another
            # credential's in-flight result view by name in the window
            # between creation and the post-analysis drop
            view = (
                f"__moospark_opfn_{self._opfn_counter}_{_uuid.uuid4().hex}"
            )
        res.createOrReplaceTempView(view)
        if created_views is not None:
            created_views.append(view)
        return view

    def _expand_merge(self, sess: UserSession, sql: str) -> str:
        """CH ``merge('db', 'table_regex')`` / ``merge(db, 'regex')``
        table function → UNION ALL of the matching tables in that
        database (name-matched against the session's visible names)."""
        import re as _re2

        def repl(m: "_re2.Match[str]") -> str:
            db = m.group("db").strip().strip("'\"`") if m.group("db") else sess.current_db
            pat = m.group("pat")
            spark_db = sess.spark_db(db)
            try:
                names = [
                    t.name
                    for t in self.spark.catalog.listTables(spark_db)
                    if t.tableType != "TEMPORARY" and _re2.search(pat, t.name)
                ]
            except Exception:
                names = []
            if not names:
                raise EngineError(
                    f"merge('{db}', '{pat}') matched no tables", 60
                )
            union = " UNION ALL ".join(
                f"SELECT * FROM `{db}`.`{n}`" for n in sorted(names)
            )
            return f"({union})"

        return _re2.sub(
            r"(?is)\bmerge\s*\(\s*(?:(?P<db>[^,()]+)\s*,\s*)?'(?P<pat>[^']*)'\s*\)",
            repl,
            sql,
        )

    def _expand_schema_macros(self, sql: str) -> str:
        """CH select-list macros that need the source schema:
        ``SELECT * APPLY (fn) FROM rest`` applies *fn* to every source
        column; ``COLUMNS('re')`` expands to the columns matching the
        regex. Schema comes from an analysis-only LIMIT 0 plan of the
        remainder — no execution."""
        import re as _re2

        m = _re2.match(
            r"(?is)^\s*SELECT\s+\*\s+APPLY\s*\(\s*([A-Za-z_][A-Za-z0-9_]*)\s*\)\s+FROM\s+(.*)$",
            sql,
        )
        if m:
            fn, rest = m.group(1), m.group(2)
            cols = self.spark.sql(f"SELECT * FROM {rest} LIMIT 0").columns
            proj = ", ".join(
                f"{fn}(`{c}`) AS `{fn}({c})`" for c in cols
            )
            return f"SELECT {proj} FROM {rest}"
        m = _re2.match(
            r"(?is)^\s*SELECT\s+COLUMNS\s*\(\s*'([^']*)'\s*\)(.*?)\s+FROM\s+(.*)$",
            sql,
        )
        if m:
            pat, rest_sel, rest = m.group(1), m.group(2), m.group(3)
            cols = self.spark.sql(f"SELECT * FROM {rest} LIMIT 0").columns
            keep = [c for c in cols if _re2.search(pat, c)]
            if not keep:
                raise EngineError(f"COLUMNS('{pat}') matched no columns", 51)
            proj = ", ".join(f"`{c}`" for c in keep)
            return f"SELECT {proj}{rest_sel} FROM {rest}"
        return sql

    def _run_select(self, sess: UserSession, sql: str) -> DataFrame:
        # Lock-free: every table ref is fully qualified by
        # _remap_databases, so no shared-session current-database
        # switch is needed and concurrent reads don't serialize.
        self._ensure_db(sess.spark_db())
        created: list = []
        try:
            prepared = self._prepare_sql(sess, sql, created)
            if " apply " in prepared.lower() or "columns(" in prepared.lower().replace(" ", ""):
                prepared = self._expand_schema_macros(prepared)
            key = None
            if not created and self._plan_cacheable(prepared):
                key = f"{self._catalog_gen}\x00{prepared}"
                with self._lock:
                    hit = self._plan_cache.get(key)
                    if hit is not None:
                        self._plan_cache.move_to_end(key)
                if hit is not None and not self._temp_views_unchanged(hit[2]):
                    # a referenced TEMP VIEW was replaced directly on
                    # the SparkSession (outside engine DDL): drop the
                    # stale entry and re-plan
                    with self._lock:
                        self._plan_cache.pop(key, None)
                        self._prebuilt.pop(key, None)
                    hit = None
                if hit is not None:
                    # Two reuse tiers, both execution-honest:
                    #
                    # HOT (non-AQE plans whose executed plan holds no
                    # BroadcastExchange / Subquery / InMemoryTableScan):
                    # return the SAME Dataset, after unregistering its
                    # shuffles' map outputs with MapOutputTrackerMaster.
                    # Scan/result stages always re-run on re-collect
                    # (Spark caches no stage output outside shuffle
                    # files), and dropping the map-output registration
                    # forces the DAGScheduler to re-run every shuffle
                    # map stage too — the exact recompute path executor
                    # loss takes, so every byte is re-scanned, re-
                    # aggregated and re-shuffled on each run. What the
                    # hot tier skips is only driver-side plan
                    # bookkeeping (doExecute RDD wiring + codegen
                    # source generation, ~60 ms/query at 10M; cb15
                    # fresh 0.28s vs hot 0.22s with map stages
                    # verifiably re-running). Plans with broadcasts,
                    # subqueries, or cached relations stay out: those
                    # node types memoize their results inside the plan
                    # object, which WOULD be result reuse.
                    #
                    # WARM (everything else): rebuild a fresh Dataset
                    # from the cached optimized plan — new Exchange
                    # nodes whose shuffle dependencies have never run.
                    # Starting from optimizedPlan() (not analyzed())
                    # skips the optimizer fixpoint re-run (measured
                    # ~23 ms/query at 10M). Returning the cached
                    # DataFrame without the map-output reset would let
                    # Spark skip completed shuffle stages on re-collect
                    # — result caching in disguise, which would fake
                    # hot-run benchmarks and serve stale data.
                    #
                    # Staleness is covered by the same guards for both
                    # tiers: the cache key carries _catalog_gen
                    # (bumped on every DDL/INSERT) and TEMP VIEW
                    # semanticHash guards.
                    hit_df, mode, _guards, hot = hit
                    if mode != "plain" and hot.get("state") != "unsafe":
                        if hot.get("state") is None:
                            st, ids = self._hot_reuse_info(hit_df)
                            hot["state"], hot["ids"] = st, ids
                        if hot.get("state") == "safe":
                            self._reset_shuffle_outputs(hot["ids"])
                            return hit_df
                    pre = None
                    with self._lock:
                        lst = self._prebuilt.get(key)
                        if lst:
                            pre = lst.pop()
                    # pipeline the next run's planning regardless of
                    # whether this one was served from the slot
                    self._schedule_prebuild(key, hit_df, mode)
                    if pre is not None:
                        return pre
                    return self._rebuild_from_cache(hit_df, mode)
            df, mode = self._plan_select_with_mode(prepared)
            if key is not None:
                with self._lock:
                    self._plan_cache[key] = (
                        df, mode, self._temp_view_guards(df), {"state": None}
                    )
                    self._plan_cache.move_to_end(key)
                    while len(self._plan_cache) > self._plan_cache_max:
                        old_key, _ = self._plan_cache.popitem(last=False)
                        self._prebuilt.pop(old_key, None)
                self._schedule_prebuild(key, df, mode)
            return df
        except EngineError:
            raise
        except Exception as e:
            raise EngineError(_clean_spark_error(e), _ch_error_code(str(e))) from e
        finally:
            # spark.sql() analyzed the plan eagerly; the views are no
            # longer needed and must not linger (cross-credential
            # visibility + unbounded accumulation).
            for v in created:
                try:
                    self.spark.catalog.dropTempView(v)
                except Exception:
                    pass

    # Scans below this total size plan WITHOUT adaptive execution and
    # with a statically-sized shuffle width (one partition per ~16 MB).
    # AQE's per-stage materialize/re-optimize barrier is pure overhead
    # when the whole input fits in one or two partitions; the r4
    # interleaved min-of-3 A/B puts the crossover near this size:
    # 100k-row sample (6 MB): static 3.59s vs AQE 4.29s sweep total;
    # 10M rows (590 MB): static 13.3s vs AQE 12.8s.  Above the
    # threshold AQE keeps runtime coalescing + skew-join splitting —
    # the 100 TB story; any real table blows past this on its first
    # leaf.
    SMALL_SCAN_BYTES = int(os.environ.get("MOOSPARK_SMALL_SCAN_BYTES", str(64 << 20)))

    def _plan_select(self, prepared: str) -> DataFrame:
        """spark.sql + the small-scan fast path (static planning).

        The re-plan forces physical planning while AQE is off, so the
        returned DataFrame keeps its non-adaptive executedPlan after
        the conf flips back (QueryExecution memoizes it). A concurrent
        read landing inside the window would also plan statically —
        valid, just not adaptive — so no lock is taken on this path.
        """
        return self._plan_select_with_mode(prepared)[0]

    def _plan_select_with_mode(self, prepared: str) -> tuple[DataFrame, str]:
        """Build + fast-path a statement; returns (df, mode) where
        mode records the static-planning decision for the plan cache
        ("plain" | "static")."""
        if "(" in prepared and prepared.lstrip()[:12].upper().startswith(
            "SELECT COUNT"
        ):
            early = self._try_early_limit_count(prepared)
            if early is not None:
                return early, "static"
        df = self.spark.sql(prepared)
        up = prepared.upper()
        if "GROUP" in up:
            # Aggregate-shape rewrites (plans/agg_split.py; both are
            # conservative single-block shape matches that fall back
            # to the original plan on any analysis error):
            # 1. ON by default — drop GROUP BY keys that are
            #    deterministic expressions over the remaining simple
            #    keys (grouping by (k, f(k)) ≡ grouping by (k);
            #    narrower shuffle rows, fewer hashed exprs — cb35
            #    14.5 → 10.9 s at 100M, PROBE_AGGSPLIT_100M.json);
            # 2. OPT-IN (MOOSPARK_AGG_SPLIT=1) — split DISTINCT agg +
            #    string MIN/MAX into two joined passes. Measured and
            #    REJECTED as a default at 100M: cb22's filter passes
            #    ~1.3% of rows, so the single SortAggregate pipeline
            #    costs less than the second scan of the wide string
            #    columns (2.2 s single-pass vs 4.3 s split, same
            #    artifact). It pays only when the post-filter row
            #    count rivals the scan, so it stays available for
            #    high-selectivity workloads rather than default-on.
            df0 = df
            try:
                from .plans.agg_split import (
                    maybe_split_distinct_minmax,
                    reduce_group_keys,
                )

                work = prepared
                red = reduce_group_keys(work)
                if red is not None:
                    df, work = self.spark.sql(red), red
            except Exception:
                df, work = df0, prepared
            if "DISTINCT" in up and os.environ.get("MOOSPARK_AGG_SPLIT") == "1":
                # separate guard: a split failure must not roll back a
                # reduction that already analyzed
                try:
                    split = maybe_split_distinct_minmax(work, df.schema)
                    if split is not None:
                        df = self.spark.sql(split)
                except Exception:
                    pass
        try:
            if self.spark.conf.get("spark.sql.adaptive.enabled") != "true":
                return df, "plain"
            size = self._leaf_scan_bytes(df)
            if size is None or size > self.SMALL_SCAN_BYTES:
                if self._is_single_shuffle_agg(df):
                    # A single-Aggregate plan (grouped, global, or
                    # distinct-rewritten; no join/window) compiles to
                    # 1-3 chained exchanges keyed on grouping columns.
                    # AQE contributes only partition coalescing to such
                    # a plan — its skew handling is join-only — and
                    # that coalesce costs a materialize+re-plan barrier
                    # per exchange on every run.  Global aggs shuffle
                    # one partial row per map task (cb01 0.31->0.15s at
                    # 10M); grouped aggs shuffle the partial-agg rows
                    # (cb32 1.18->1.00s, cb35 0.82->0.70s); the
                    # COUNT(DISTINCT) family pays 2-3 barriers and wins
                    # the most (cb04 0.33->0.20s, cb22 1.36->0.40s,
                    # min-of-5 under ParallelGC — see
                    # _is_single_shuffle_agg).  Shuffle width stays at
                    # the session default, the same width AQE starts
                    # from.
                    with self._conf_lock:
                        prev = self.spark.conf.get("spark.sql.adaptive.enabled")
                        self.spark.conf.set("spark.sql.adaptive.enabled", "false")
                        try:
                            df._jdf.queryExecution().executedPlan()  # noqa: SLF001
                        finally:
                            self.spark.conf.set("spark.sql.adaptive.enabled", prev)
                    return df, "static"
                return df, "plain"
            # Static planning loses AQE's partition coalescing, so pick
            # the shuffle width AQE would have picked — one partition
            # per ~16 MB of input, capped at the session default.  The
            # r4 A/B on the 100k-row ClickBench sample: leaving width
            # at 32 made the static path a net LOSS (10.3s vs 6.7s
            # sweep); sizing it statically keeps both the no-barrier
            # win and the small-shuffle win.
            with self._conf_lock:
                prev_parts = self.spark.conf.get("spark.sql.shuffle.partitions")
                parts = max(1, min(int(prev_parts), (size >> 24) + 1))
                self.spark.conf.set("spark.sql.adaptive.enabled", "false")
                self.spark.conf.set("spark.sql.shuffle.partitions", str(parts))
                try:
                    # physical planning hasn't run yet (spark.sql is
                    # analysis-eager only); forcing it now, with AQE off,
                    # bakes the static plan into this QueryExecution
                    df._jdf.queryExecution().executedPlan()  # noqa: SLF001
                finally:
                    self.spark.conf.set("spark.sql.adaptive.enabled", "true")
                    self.spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
            return df, f"small:{parts}"
        except Exception:  # noqa: BLE001 — fast path must never break a query
            return df, "plain"

    # Probe sizes for the streaming-limit early exit, smallest first.
    # 64k rows is one or two parquet pages; 8M covers the 10M fixture
    # minus its tail, after which the full plan is cheaper anyway.
    _EARLY_LIMIT_PROBE_ROWS = (1 << 16, 1 << 20, 1 << 23)

    @staticmethod
    def _top_level_find(s: str, word: str) -> int:
        """Index of the first paren-depth-0, unquoted, word-bounded,
        case-insensitive occurrence of ``word`` in ``s``; -1 if none."""
        low = s.lower()
        w = word.lower()
        depth = 0
        i = 0
        n = len(s)
        while i < n:
            c = s[i]
            if c in ("'", '"', "`"):
                j = i + 1
                while j < n:
                    if s[j] == "\\" and c != "`":
                        j += 2
                        continue
                    if s[j] == c:
                        break
                    j += 1
                i = j + 1
                continue
            if c == "(":
                depth += 1
            elif c == ")":
                depth = max(0, depth - 1)
            elif depth == 0 and low.startswith(w, i):
                before_ok = i == 0 or not (low[i - 1].isalnum() or low[i - 1] == "_")
                e = i + len(w)
                after_ok = e >= n or not (low[e].isalnum() or low[e] == "_")
                if before_ok and after_ok:
                    return i
            i += 1
        return -1

    def _try_early_limit_count(self, prepared: str) -> Optional[DataFrame]:
        """Streaming-limit early exit for
        ``SELECT COUNT(*) FROM (SELECT … GROUP BY g LIMIT k) t``.

        The subquery's LIMIT carries no ORDER BY, so any k groups
        satisfy it, and the outer COUNT consumes only the row count:
        the query asks for ``least(k, |distinct g|)``. A streaming
        engine (ClickHouse, DuckDB) stops aggregating the moment k
        groups exist; Spark's hash aggregate has no early-out, so it
        builds every group before limiting (ClickBench Q17 pays a full
        two-column aggregation over the table to count 10 rows).

        Rewrite: verify at plan time that the first M source rows
        already contain >= k distinct key combinations, then serve a
        plan that aggregates only a LIMIT-M slice of the source.
        Soundness: groups over a row subset are a subset of groups over
        the table, so >= k groups in the slice implies both plans
        return exactly k; data is immutable within a catalog
        generation (the plan cache key carries ``_catalog_gen``), so
        the plan-time validation holds for every later execution. The
        served plan re-scans its M-row slice on each run — no result
        reuse. Shapes where the subquery's aggregate VALUES (not just
        its cardinality) are consumed — ORDER BY, HAVING, joins,
        set-ops, rollups — never match; on any doubt (alias-typed
        group keys, positional keys, analysis errors) the full plan is
        served instead.
        """
        import re as _re

        s = prepared.strip().rstrip(";").strip()
        m = _re.match(
            r"(?is)^SELECT\s+COUNT\(\s*(?:\*|1)\s*\)\s+AS\s+(`\w+`|\w+)\s+FROM\s*\(",
            s,
        )
        if m is None:
            return None
        alias = m.group(1)
        # balanced-paren extraction of the derived table
        start = m.end() - 1
        depth = 0
        end = -1
        i = start
        n = len(s)
        while i < n:
            c = s[i]
            if c in ("'", '"', "`"):
                j = i + 1
                while j < n:
                    if s[j] == "\\" and c != "`":
                        j += 2
                        continue
                    if s[j] == c:
                        break
                    j += 1
                i = j + 1
                continue
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    end = i
                    break
            i += 1
        if end < 0:
            return None
        inner = s[start + 1 : end].strip()
        tail = s[end + 1 :].strip()
        if tail and not _re.match(r"(?is)^(?:AS\s+)?(?:`\w+`|\w+)$", tail):
            return None
        if not _re.match(r"(?is)^SELECT\s", inner):
            return None
        gb = self._top_level_find(inner, "GROUP BY")
        frm = self._top_level_find(inner, "FROM")
        if gb < 0 or frm < 0 or frm > gb:
            return None
        for kw in (
            "ORDER BY", "HAVING", "UNION", "INTERSECT", "EXCEPT", "JOIN",
            "DISTINCT", "WINDOW", "QUALIFY", "ROLLUP", "CUBE",
            "GROUPING SETS", "WITH",
        ):
            if self._top_level_find(inner, kw) >= 0:
                return None
        src = inner[frm + 4 : gb].strip()
        rest = inner[gb + len("GROUP BY") :].strip()
        lm = _re.search(r"(?is)\bLIMIT\s+(\d+)\s*$", rest)
        if lm is None:
            return None
        k = int(lm.group(1))
        keys = rest[: lm.start()].strip()
        if not (0 < k <= 100_000) or not keys:
            return None
        if self._top_level_find(keys, "LIMIT") >= 0:
            return None
        # positional keys (GROUP BY 1) would turn into literals in the
        # probe text — bail
        from .dialect.translate import _split_top_level_commas

        if any(
            _re.fullmatch(r"\d+", p.strip())
            for p in _split_top_level_commas(keys)
        ):
            return None
        # single plain table ref (optionally WHERE-filtered): the probe
        # wraps it in SELECT * ... LIMIT M, which is only
        # unambiguous for one relation
        ws = self._top_level_find(src, "WHERE")
        table = (src[:ws] if ws >= 0 else src).strip()
        if not _re.fullmatch(r"(?:`[^`]+`|\w+)(?:\.(?:`[^`]+`|\w+))*", table):
            return None
        # Analyze the ORIGINAL query first: if the inner SELECT list has
        # an unresolved column or a bad call, the rewrite must not mask
        # the analysis error by serving a count built from keys only.
        try:
            self.spark.sql(s)
        except Exception:  # noqa: BLE001 — let the full path raise it
            return None
        prev_got = None
        for probe_rows in self._EARLY_LIMIT_PROBE_ROWS:
            sql = (
                f"SELECT COUNT(*) AS {alias} FROM ("
                f"SELECT {keys} FROM (SELECT * FROM {src} "
                f"LIMIT {probe_rows}) __cl_src "
                f"GROUP BY {keys} LIMIT {k}) __cl_grp"
            )
            try:
                df = self.spark.sql(sql)
                with self._conf_lock:
                    prev = self.spark.conf.get("spark.sql.adaptive.enabled")
                    prev_parts = self.spark.conf.get(
                        "spark.sql.shuffle.partitions"
                    )
                    self.spark.conf.set("spark.sql.adaptive.enabled", "false")
                    self.spark.conf.set("spark.sql.shuffle.partitions", "8")
                    try:
                        df._jdf.queryExecution().executedPlan()  # noqa: SLF001
                    finally:
                        self.spark.conf.set("spark.sql.adaptive.enabled", prev)
                        self.spark.conf.set(
                            "spark.sql.shuffle.partitions", prev_parts
                        )
                got = df.first()[0]
            except Exception:  # noqa: BLE001 — fall back to the full plan
                return None
            if got >= k:
                return df
            if (
                got * 4 < k
                and prev_got is not None
                and got < prev_got * 2
            ):
                # far below k AND the group count stopped growing
                # across a 16x larger probe: the table very likely has
                # < k groups in total — larger probes would only burn
                # plan-time aggregations. (Growth alone doesn't bail:
                # tables clustered by the group key legitimately show
                # few groups in a prefix but keep escalating.)
                return None
            prev_got = got
        return None

    def _temp_view_guards(self, df: DataFrame) -> dict:
        """semanticHash fingerprints of every TEMP VIEW the analyzed
        plan references — replacing a view directly on the
        SparkSession changes its stored plan's hash, which is the one
        catalog mutation the engine's DDL generation counter cannot
        see."""
        import re as _re

        guards: dict[str, int] = {}
        try:
            txt = str(df._jdf.queryExecution().analyzed())  # noqa: SLF001
            cat = self.spark._jsparkSession.sessionState().catalog()  # noqa: SLF001
            for name in set(_re.findall(r"View \(`([^`]+)`", txt)):
                opt = cat.getTempView(name)
                if opt.isDefined():
                    guards[name] = int(opt.get().semanticHash())
        except Exception:  # noqa: BLE001 — guard failure = no caching risk
            guards["__unguardable__"] = -1
        return guards

    def _temp_views_unchanged(self, guards: dict) -> bool:
        if "__unguardable__" in guards:
            return False
        if not guards:
            return True
        try:
            cat = self.spark._jsparkSession.sessionState().catalog()  # noqa: SLF001
            for name, h in guards.items():
                opt = cat.getTempView(name)
                if not opt.isDefined() or int(opt.get().semanticHash()) != h:
                    return False
            return True
        except Exception:  # noqa: BLE001
            return False

    _NONDETERMINISTIC_MARKERS = (
        "now(", "now64", "rand", "uuid", "current_timestamp",
        "current_date", "today(", "yesterday(", "generaterandom",
        "shuffle(", "unix_timestamp()",
    )

    def _plan_cacheable(self, prepared: str) -> bool:
        low = prepared.lower()
        return not any(m in low for m in self._NONDETERMINISTIC_MARKERS)

    @staticmethod
    def _is_single_shuffle_agg(df: DataFrame) -> bool:
        """True iff the analyzed plan is a single Aggregate (grouped
        or global) over a join-free, window-free subtree (wrapped in
        Project/Limit/Sort at most) with no DISTINCT aggregates.

        Such a plan compiles to scan -> partial agg -> exchange ->
        final agg (+ TakeOrderedAndProject for the ORDER BY ... LIMIT
        form), and AQE's only possible contribution is coalescing the
        exchanges — skew splitting applies to joins only.
        COUNT(DISTINCT) plans (one analyzed Aggregate whose expression
        carries the distinct flag; RewriteDistinctAggregates splits it
        at optimization) qualify too: they compile to 2-3 chained
        exchanges, and submitting them as ONE DAGScheduler job beats
        AQE's per-stage materialize barriers — 10M-row min-of-5 A/B
        under ParallelGC: cb04 0.33->0.20s, cb22 1.36->0.40s, cb09
        0.40->0.32s, worst case cb08 +0.02s. (Under the earlier G1
        profile the same family measured the other way; the barrier
        cost only dominates once GC pauses stop inflating every
        stage.)
        """
        try:
            node = df._jdf.queryExecution().analyzed()  # noqa: SLF001
            for _ in range(5):
                name = node.getClass().getSimpleName()
                # Filter here is a HAVING clause (post-aggregation);
                # WHERE filters sit below the Aggregate node.
                if name in ("Project", "GlobalLimit", "LocalLimit", "Sort", "Filter"):
                    node = node.children().head()
                else:
                    break
            if node.getClass().getSimpleName() != "Aggregate":
                return False
            sub = node.toString()
            return (
                sub.count("Aggregate") == 1
                and "Join" not in sub
                and "Window" not in sub
            )
        except Exception:  # noqa: BLE001
            return False

    @staticmethod
    def _leaf_scan_bytes(df: DataFrame) -> Optional[int]:
        """Sum of leaf-relation size estimates from the analyzed plan.

        Missing stats report Long.MaxValue (Spark's defaultSizeInBytes),
        which safely fails the small-scan test.
        """
        try:
            leaves = df._jdf.queryExecution().analyzed().collectLeaves()  # noqa: SLF001
            total = 0
            for i in range(leaves.length()):
                total += int(str(leaves.apply(i).stats().sizeInBytes()))
            return total
        except Exception:  # noqa: BLE001
            return None

    def _rebuild_from_cache(self, hit_df: DataFrame, mode: str) -> DataFrame:
        """Fresh Dataset from a cached statement's optimized plan,
        re-applying its static-planning decision. Execution state is
        untouched: the new QueryExecution's exchanges have never run."""
        jdf = self.spark._jvm.org.apache.spark.sql.classic.Dataset.ofRows(  # noqa: SLF001
            self.spark._jsparkSession,
            hit_df._jdf.queryExecution().optimizedPlan(),  # noqa: SLF001
        )
        df2 = DataFrame(jdf, hit_df.sparkSession)
        if mode != "plain":
            with self._conf_lock:
                prev = self.spark.conf.get("spark.sql.adaptive.enabled")
                prev_parts = self.spark.conf.get("spark.sql.shuffle.partitions")
                self.spark.conf.set("spark.sql.adaptive.enabled", "false")
                if mode.startswith("small:"):
                    self.spark.conf.set(
                        "spark.sql.shuffle.partitions", mode.split(":", 1)[1]
                    )
                try:
                    df2._jdf.queryExecution().executedPlan()  # noqa: SLF001
                finally:
                    self.spark.conf.set("spark.sql.adaptive.enabled", prev)
                    self.spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        return df2

    def _hot_reuse_info(self, hit_df: DataFrame):
        """Classify a cached, already-executed Dataset for the hot
        reuse tier; returns ("safe", [shuffleId, ...]) or
        ("unsafe", None).

        Safe = the executed plan contains no node type that memoizes
        results inside the plan object (BroadcastExchange caches its
        built relation, Subquery/ReusedSubquery cache their scalar
        result, InMemoryTableScan reads a cached RDD) — for such
        plans, re-collect recomputes every stage once the shuffle map
        outputs are unregistered. AQE plans never reach here (mode
        "plain" is excluded at the call site): their query stages hold
        materialized results the final plan would reuse."""
        try:
            plan = hit_df._jdf.queryExecution().executedPlan()  # noqa: SLF001
            txt = plan.toString()
            if ("BroadcastExchange" in txt or "ubquery" in txt
                    or "InMemoryTableScan" in txt
                    or "AdaptiveSparkPlan" in txt):
                return "unsafe", None
            ids: list[int] = []

            def walk(node):
                if "ShuffleExchange" in node.getClass().getSimpleName():
                    ids.append(int(node.shuffleDependency().shuffleId()))
                it = node.children().iterator()
                while it.hasNext():
                    walk(it.next())

            walk(plan)
            return "safe", ids
        except Exception:  # noqa: BLE001 — classification failure = warm tier
            return "unsafe", None

    def _reset_shuffle_outputs(self, shuffle_ids) -> None:
        """Drop the registered map outputs for the given shuffles so
        the next job re-runs their map stages (the executor-loss
        recompute path). This is what keeps hot Dataset reuse
        execution-honest."""
        tracker = self.spark.sparkContext._jsc.sc().env().mapOutputTracker()  # noqa: SLF001
        for sid in shuffle_ids or ():
            try:
                tracker.unregisterAllMapAndMergeOutput(int(sid))
            except Exception:  # noqa: BLE001
                # ShuffleStatusNotFound: the dependency was created but
                # the shuffle never ran (Dataset not yet collected) or
                # the ContextCleaner already dropped it — either way
                # there is no output to reset and the next run
                # executes from scratch.
                pass

    def _schedule_prebuild(self, key: str, hit_df: DataFrame, mode: str) -> None:
        """Queue a background pre-plan of the next Dataset for this
        cache entry (one slot per key). Failures are swallowed — the
        slot is an optimization; the inline path always works."""

        def work():
            try:
                with self._lock:
                    if key not in self._plan_cache or self._prebuilt.get(key):
                        return
                df = self._rebuild_from_cache(hit_df, mode)
                with self._lock:
                    if key in self._plan_cache:
                        slot = self._prebuilt.setdefault(key, [])
                        if len(slot) < 1:
                            slot.append(df)
            except Exception:  # noqa: BLE001 — prebuild must never break queries
                pass

        try:
            self._prep_pool.submit(work)
        except RuntimeError:
            pass  # pool shut down (interpreter exit)

    def _invalidate_plans(self) -> None:
        with self._lock:
            self._catalog_gen += 1
            self._plan_cache.clear()
            self._prebuilt.clear()

    def _run_insert(self, sess: UserSession, sql: str) -> None:
        self._invalidate_plans()
        created: list = []
        with self._lock:
            self._in_user_db(sess)
            try:
                prepared = self._prepare_sql(sess, sql, created)
                target = self._insert_target(sess, prepared)
                if target and self._mvs_for(sess, target):
                    self._insert_with_mvs(sess, prepared, target)
                elif not self._insert_sorted(sess, prepared):
                    self.spark.sql(prepared)
            except EngineError:
                raise
            except Exception as e:
                raise EngineError(_clean_spark_error(e), _ch_error_code(str(e))) from e
            finally:
                for v in created:
                    try:
                        self.spark.catalog.dropTempView(v)
                    except Exception:
                        pass

    def _insert_target(self, sess: UserSession, prepared: str) -> Optional[str]:
        """Fully-qualified target of an INSERT statement, or None."""
        from .dialect.tokenizer import tokenize

        toks = [t for t in tokenize(prepared) if t.kind not in ("ws", "comment")]
        if len(toks) < 3 or toks[0].text.upper() != "INSERT" or toks[1].text.upper() != "INTO":
            return None
        if toks[2].text.upper() in ("SELECT", "VALUES"):
            return None
        name = toks[2].text.strip("`")
        if len(toks) > 4 and toks[3].text == ".":
            return f"`{name}`.`{toks[4].text.strip('`')}`"
        return f"`{sess.spark_db()}`.`{name}`"

    def _insert_with_mvs(self, sess: UserSession, prepared: str, target_qual: str) -> None:
        """INSERT into a table with materialized views: evaluate the
        inserted block once (cached), append it to the target with the
        MergeTree sort, then fan it out through each MV's SELECT."""
        from pyspark.sql import functions as F

        from .dialect.tokenizer import tokenize

        toks = [t for t in tokenize(prepared) if t.kind not in ("ws", "comment")]
        col_list: list[str] = []
        body_at = None
        i = 2
        depth = 0
        while i < len(toks):
            up = toks[i].text.upper()
            if depth == 0 and up in ("SELECT", "VALUES", "WITH"):
                body_at = i
                break
            if toks[i].text == "(":
                depth += 1
            elif toks[i].text == ")":
                depth -= 1
            elif depth == 1 and toks[i].kind in ("ident", "bquote"):
                col_list.append(toks[i].text.strip("`"))
            i += 1
        if body_at is None:
            self.spark.sql(prepared)  # not a shape we can split; run as-is
            return
        delta = self.spark.sql(" ".join(t.text for t in toks[body_at:]))
        tgt = self.spark.table(target_qual)
        names = col_list or tgt.columns
        if len(delta.columns) != len(names):
            raise EngineError(
                f"INSERT column count mismatch: {len(delta.columns)} vs {len(names)}", 20
            )
        delta = delta.toDF(*names)
        cols = []
        for f in tgt.schema.fields:
            if f.name in names:
                cols.append(F.col(f"`{f.name}`").cast(f.dataType).alias(f.name))
            else:
                cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        delta = delta.select(*cols).cache()
        try:
            out = delta
            order_by = self._table_order_by(target_qual)
            if order_by:
                exprs = [
                    self._translate_expr(e.strip())
                    for e in _split_top_level(order_by.strip().strip("()"))
                ]
                out = out.sortWithinPartitions(*[F.expr(e) for e in exprs])
            out.write.insertInto(target_qual)
            self._propagate_mvs(sess, target_qual, delta)
        finally:
            delta.unpersist()

    def resolve_table(
        self,
        table_ref: str,
        user: str = "default",
        password: str = "",
        database: Optional[str] = None,
    ) -> str:
        """CH table reference (``tbl`` or ``db.tbl``, optionally
        back-quoted) → fully-qualified Spark table name inside the
        credential pair's namespace."""
        sess = self.get_session(user, password)
        if database:
            sess.current_db = database
        parts = [p.strip().strip("`") for p in table_ref.split(".")]
        if len(parts) == 2:
            return f"`{sess.spark_db(parts[0])}`.`{parts[1]}`"
        if parts[0] in sess.temp_tables:
            return f"`{sess.temp_db}`.`{parts[0]}`"
        return f"`{sess.spark_db()}`.`{parts[0]}`"

    def table_columns(
        self,
        table_ref: str,
        user: str = "default",
        password: str = "",
        database: Optional[str] = None,
    ) -> tuple[list[str], list[str]]:
        """Column names + CH type names of a session table (the
        native-INSERT sample block the server must send, §3.2)."""
        from .dialect.types import spark_type_to_ch

        tbl = self.resolve_table(table_ref, user, password, database)
        with self._lock:
            try:
                schema = self.spark.table(tbl).schema
            except Exception as e:
                raise EngineError(_clean_spark_error(e), _ch_error_code(str(e))) from e
        return (
            [f.name for f in schema.fields],
            [spark_type_to_ch(f.dataType, f.nullable) for f in schema.fields],
        )

    def insert_rows(
        self,
        table_ref: str,
        names: list[str],
        rows: list[tuple],
        user: str = "default",
        password: str = "",
        database: Optional[str] = None,
        ch_types: Optional[list[str]] = None,
    ) -> None:
        """Apply externally-supplied rows (native-protocol INSERT
        data blocks) to a session table. Unmentioned columns get
        NULL; values are cast to the declared column types (LEGACY
        store assignment, matching the SQL INSERT path). Honors the
        table's MergeTree ``ORDER BY`` sort-on-write. *ch_types*
        (the block's declared types) makes the source schema
        explicit so all-NULL columns don't break inference."""
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        from .dialect.types import ch_type_to_spark

        sess = self.get_session(user, password)
        tbl = self.resolve_table(table_ref, user, password, database)
        with self._lock:
            try:
                target = self.spark.table(tbl)
                tgt_fields = {f.name: f for f in target.schema.fields}
                unknown = [n for n in names if n not in tgt_fields]
                if unknown:
                    raise EngineError(f"Unknown column(s) {unknown} in {table_ref}", 47)
                if ch_types is not None:
                    src_schema = T.StructType(
                        [
                            T.StructField(n, ch_type_to_spark(t), True)
                            for n, t in zip(names, ch_types)
                        ]
                    )
                    src = local_df(self.spark, rows, src_schema)
                else:
                    src = self.spark.createDataFrame(rows, schema=names)
                out_cols = []
                for f in target.schema.fields:
                    if f.name in names:
                        out_cols.append(
                            F.col(f"`{f.name}`").cast(f.dataType).alias(f.name)
                        )
                    else:
                        out_cols.append(F.lit(None).cast(f.dataType).alias(f.name))
                df = src.select(*out_cols)
                order_by = self._table_order_by(tbl)
                out = df
                if order_by:
                    from .dialect.translate import translate_select

                    exprs = [
                        translate_select(f"SELECT {e.strip()}").spark_sql[len("SELECT "):]
                        for e in _split_top_level(order_by.strip().strip("()"))
                    ]
                    out = df.sortWithinPartitions(*[F.expr(e) for e in exprs])
                out.write.insertInto(tbl)
                self._propagate_mvs(sess, tbl, df)
            except EngineError:
                raise
            except Exception as e:
                raise EngineError(_clean_spark_error(e), _ch_error_code(str(e))) from e

    def _table_order_by(self, tbl: str) -> Optional[str]:
        """moospark.order_by property of ``tbl`` (cached), or None."""
        return self._table_moospark_props(tbl).get("order_by")

    def _table_moospark_props(self, tbl: str) -> dict:
        """The ``moospark.*`` TBLPROPERTIES of ``tbl`` (cached):
        order_by / engine / engine_args / partition_by."""
        if tbl not in self._order_by_cache:
            props: dict = {}
            try:
                for r in self.spark.sql(f"SHOW TBLPROPERTIES {tbl}").collect():
                    if r["key"].startswith("moospark."):
                        props[r["key"][len("moospark."):]] = r["value"]
            except Exception:
                props = {}
            self._order_by_cache[tbl] = props
        return self._order_by_cache[tbl]

    def _insert_sorted(self, sess: UserSession, sql: str) -> bool:
        """INSERT INTO a table declared with ``ORDER BY`` (MergeTree
        DDL, test.yml:49): sort rows within partitions on the declared
        keys before writing, so parquet row-group min/max stats give
        the same data-skipping a ClickHouse sparse primary index does
        (SURVEY §4.2). Per-partition sort — no global shuffle added.

        Returns True if handled; False → caller runs plain SQL."""
        from .dialect.tokenizer import tokenize

        toks = [t for t in tokenize(sql) if t.kind not in ("ws", "comment")]
        if len(toks) < 4 or toks[0].text.upper() != "INSERT" or toks[1].text.upper() != "INTO":
            return False
        # target: ident or `q`.`q` chain; find extent + SELECT start
        i = 2
        tbl_parts = []
        while i < len(toks) and (toks[i].kind in ("ident", "bquote") or toks[i].text == "."):
            if toks[i].text.upper() in ("SELECT", "VALUES", "FORMAT"):
                break
            tbl_parts.append(toks[i].text)
            i += 1
        if i >= len(toks) or toks[i].text.upper() != "SELECT":
            return False  # VALUES / column-list forms → plain path
        tbl = "".join(tbl_parts)
        order_by = self._table_order_by(tbl)
        if not order_by:
            return False
        select_sql = "".join(
            t.text + " " for t in toks[i:]
        )
        from pyspark.sql import functions as F

        tgt_cols = self.spark.table(tbl).columns
        df = self.spark.sql(select_sql)
        if len(df.columns) != len(tgt_cols):
            return False  # let Spark produce the proper error
        from .dialect.translate import translate_select

        exprs = [e.strip() for e in _split_top_level(order_by.strip().strip("()"))]
        # order keys may use CH spellings (intHash32 is a registered
        # UDF; toYYYYMM etc. go through the dialect rewrite)
        exprs = [
            translate_select(f"SELECT {e}").spark_sql[len("SELECT "):] for e in exprs
        ]
        df = df.toDF(*tgt_cols).sortWithinPartitions(*[F.expr(e) for e in exprs])
        df.write.insertInto(tbl)
        return True

    _DICT_CREATE_RE = None  # compiled lazily below

    def _create_dictionary(self, sess: UserSession, sql: str) -> None:
        """CREATE DICTIONARY name (attrs…) PRIMARY KEY k
        SOURCE(CLICKHOUSE(TABLE 't' [DB 'd'])) LAYOUT(…) LIFETIME(…).

        LAYOUT/LIFETIME are storage/refresh policy in CH — here the
        'layout' is whatever plan Catalyst picks for the lookup join
        (broadcast for any real dictionary) and freshness is the
        source table itself, so both parse and are ignored."""
        import re as _re

        m = _re.match(
            r"(?is)\s*CREATE\s+(?:OR\s+REPLACE\s+)?DICTIONARY\s+"
            r"(?:IF\s+NOT\s+EXISTS\s+)?(?P<name>[\w.`\"]+)\s*\((?P<attrs>.*?)\)\s*"
            r"PRIMARY\s+KEY\s+(?P<key>[\w`\", ]+?)\s+SOURCE\s*\(",
            sql,
        )
        if not m:
            raise EngineError("Cannot parse CREATE DICTIONARY statement", 62)
        name = m.group("name").strip("`\"")
        key = m.group("key").strip().strip("`\"")
        if "," in key:
            raise EngineError("composite dictionary keys are not supported", 48)
        tm = _re.search(r"(?i)TABLE\s+'(?P<t>[^']+)'", sql)
        dbm = _re.search(r"(?i)\bDB\s+'(?P<d>[^']+)'", sql)
        if not tm:
            raise EngineError("SOURCE(... TABLE '...') is required", 62)
        source = tm.group("t")
        if dbm:
            source = f"{dbm.group('d')}.{source}"
        attrs: dict = {}
        for a in _split_top_level(m.group("attrs")):
            parts = a.strip().split()
            if len(parts) < 2:
                continue
            aname = parts[0].strip("`\"")
            atype = parts[1]
            default = None
            low = [p.upper() for p in parts]
            if "DEFAULT" in low:
                default = " ".join(parts[low.index("DEFAULT") + 1 :])
                for stop in ("EXPRESSION", "HIERARCHICAL", "INJECTIVE"):
                    if stop in default.upper():
                        default = default[: default.upper().index(stop)].strip()
            attrs[aname] = (atype, default)
        ine = _re.search(r"(?i)IF\s+NOT\s+EXISTS", sql)
        if name in sess.dictionaries and ine:
            return
        sess.dictionaries[name] = DictionarySpec(
            name=name, source=source, key=key, attrs=attrs
        )

    def _attr_default(self, spec: DictionarySpec, attr: str) -> str:
        ch_type, default = spec.attrs.get(attr, ("String", None))
        if default is not None:
            return default
        from .dialect.types import ch_type_to_spark

        try:
            from pyspark.sql import types as _T

            dt = ch_type_to_spark(ch_type)
            if isinstance(dt, _T.StringType):
                return "''"
            if isinstance(dt, _T.DateType):
                return "DATE'1970-01-01'"
            if isinstance(dt, _T.TimestampType):
                return "TIMESTAMP'1970-01-01 00:00:00'"
            return f"CAST(0 AS {dt.simpleString()})"
        except Exception:  # noqa: BLE001
            return "NULL"

    def _expand_dict_functions(self, sess: UserSession, sql: str) -> str:
        """dictGet family → correlated scalar subquery over the source
        table (Catalyst: RewriteCorrelatedScalarSubquery → left join,
        broadcast for dictionary-sized sources)."""
        from .dialect.tokenizer import tokenize as _tok
        from .dialect.types import ch_type_to_spark

        toks = _tok(sql)
        out: list[str] = []
        i = 0
        n = len(toks)
        while i < n:
            t = toks[i]
            low = t.text.lower() if t.kind == "ident" else ""
            if low.startswith(("dictget", "dicthas")):
                # find "(" then split balanced args
                j = i + 1
                while j < n and toks[j].kind in ("ws", "comment"):
                    j += 1
                if j < n and toks[j].text == "(":
                    depth = 0
                    args: list[str] = []
                    cur: list[str] = []
                    k = j
                    while k < n:
                        tx = toks[k].text
                        if tx == "(":
                            depth += 1
                            if depth > 1:
                                cur.append(tx)
                        elif tx == ")":
                            depth -= 1
                            if depth == 0:
                                args.append("".join(cur).strip())
                                break
                            cur.append(tx)
                        elif tx == "," and depth == 1:
                            args.append("".join(cur).strip())
                            cur = []
                        else:
                            cur.append(tx)
                        k += 1
                    expanded = self._dict_call(sess, low, [a for a in args if a])
                    if expanded is not None:
                        out.append(expanded)
                        i = k + 1
                        continue
            out.append(t.text)
            i += 1
        return "".join(out)

    def _dict_call(self, sess: UserSession, fname: str, args: list):
        if not args:
            return None
        dname = args[0].strip().strip("'\"`")
        spec = sess.dictionaries.get(dname)
        if spec is None:
            # not a registered dictionary: leave the call untouched so
            # the normal unknown-function error names it
            return None
        src, key = spec.source, spec.key
        if fname == "dicthas" and len(args) == 2:
            return f"((SELECT count(*) FROM {src} WHERE {key} = ({args[1]})) > 0)"
        if len(args) < 3:
            return None
        attr = args[1].strip().strip("'\"")
        lookup = f"(SELECT max({attr}) FROM {src} WHERE {key} = ({args[2]}))"
        if fname == "dictgetornull":
            return lookup
        if fname == "dictgetordefault" and len(args) >= 4:
            return f"coalesce({lookup}, {args[3]})"
        # typed variants: dictGetString / dictGetUInt64 / … → cast
        cast_to = None
        if fname.startswith("dictget") and fname not in ("dictget",):
            ch_t = fname[len("dictget") :]
            if ch_t.endswith("ordefault"):
                ch_t = ch_t[: -len("ordefault")]
            try:
                from .dialect.types import ch_type_to_spark as _c2s

                cast_to = _c2s(ch_t).simpleString()
            except Exception:  # noqa: BLE001
                cast_to = None
        body = f"coalesce({lookup}, {self._attr_default(spec, attr)})"
        if fname.endswith("ordefault") and len(args) >= 4:
            body = f"coalesce({lookup}, {args[3]})"
        if cast_to:
            return f"CAST({body} AS {cast_to})"
        return body

    def _run_ddl(self, sess: UserSession, sql: str) -> None:
        self._order_by_cache.clear()  # DDL may change table properties
        self._tables_cache.clear()  # table set may change
        self._dbs_ensured.clear()  # DROP DATABASE invalidates
        self._invalidate_plans()
        up = sql.lstrip().upper()
        if up.startswith(("CREATE DICTIONARY", "CREATE OR REPLACE DICTIONARY")) or (
            up.startswith("CREATE") and " DICTIONARY " in up.split("(", 1)[0]
        ):
            self._create_dictionary(sess, sql)
            return
        if up.startswith("DROP DICTIONARY"):
            import re as _re

            dm = _re.match(
                r"(?is)\s*DROP\s+DICTIONARY\s+(?:IF\s+EXISTS\s+)?([\w.`\"]+)", sql
            )
            if dm:
                name = dm.group(1).strip("`\"")
                if name not in sess.dictionaries and "IF EXISTS" not in up:
                    raise EngineError(f"Dictionary {name} does not exist", 36)
                sess.dictionaries.pop(name, None)
            return
        parsed = parse_ddl(sql)
        with self._lock:
            if isinstance(parsed, CreateDatabase):
                self._ensure_db(sess.spark_db(parsed.database))
                return
            if isinstance(parsed, DropObject):
                ie = "IF EXISTS " if parsed.if_exists else ""
                if parsed.what == "DATABASE":
                    self.spark.sql(
                        f"DROP DATABASE {ie}`{sess.spark_db(parsed.name)}` CASCADE"
                    )
                elif parsed.database is None and parsed.name in sess.temp_tables:
                    self.spark.sql(
                        f"DROP TABLE {ie}`{sess.temp_db}`.`{parsed.name}`"
                    )
                    sess.temp_tables.discard(parsed.name)
                    return
                else:
                    db = sess.spark_db(parsed.database)
                    qual = f"`{db}`.`{parsed.name}`"
                    # CH accepts DROP TABLE and DROP VIEW interchangeably
                    # for views/MVs; Spark does not — try both shapes
                    try:
                        self.spark.sql(f"DROP {parsed.what} {ie}{qual}")
                    except Exception:
                        other = "VIEW" if parsed.what == "TABLE" else "TABLE"
                        self.spark.sql(f"DROP {other} {ie}{qual}")
                    self._mv_forget(sess.ns, qual)
                return
            if isinstance(parsed, CreateView):
                self._run_create_view(sess, parsed)
                return
            if isinstance(parsed, AttachDetach):
                # DETACH hides the table under a reserved name (data
                # kept); ATTACH restores it — the observable CH
                # contract for the metadata-level pair
                db = sess.spark_db(parsed.database)
                hidden = f"__detached__{parsed.name}"
                src, dst = (
                    (parsed.name, hidden)
                    if parsed.action == "detach"
                    else (hidden, parsed.name)
                )
                if parsed.if_exists and not self._table_exists(
                    sess, parsed.database, src
                ):
                    return
                try:
                    self.spark.sql(
                        f"ALTER TABLE `{db}`.`{src}` RENAME TO `{db}`.`{dst}`"
                    )
                except Exception as e:
                    raise EngineError(_clean_spark_error(e), 60) from e
                return
            if isinstance(parsed, NoopDDL):
                return  # accepted-and-ignored (indexes/TTL, see ddl.py)
            if isinstance(parsed, CreateTable):
                self._create_table(sess, parsed)
                return
            if isinstance(parsed, TruncateTable):
                tbl = f"`{sess.spark_db(parsed.database)}`.`{parsed.name}`"
                if parsed.if_exists and not self._table_exists(sess, parsed.database, parsed.name):
                    return
                self._sql_or_raise(f"TRUNCATE TABLE {tbl}")
                return
            if isinstance(parsed, RenameTables):
                for db_f, n_f, db_t, n_t in parsed.pairs:
                    src = f"`{sess.spark_db(db_f)}`.`{n_f}`"
                    dst = f"`{sess.spark_db(db_t)}`.`{n_t}`"
                    self._sql_or_raise(f"ALTER TABLE {src} RENAME TO {dst}")
                self._mv_registry.pop(sess.ns, None)
                self._mv_scanned.discard(sess.ns)
                return
            if isinstance(parsed, AlterMutation):
                self._run_mutation(sess, parsed)
                return
            if isinstance(parsed, AlterColumn):
                self._run_alter_column(sess, parsed)
                return
            if isinstance(parsed, OptimizeTable):
                self._run_optimize(sess, parsed)
                return
            # anything else (unrecognized ALTER forms, ...) → Spark SQL as-is
            self._in_user_db(sess)
            try:
                self.spark.sql(sql)
            except Exception as e:
                raise EngineError(_clean_spark_error(e), _ch_error_code(str(e))) from e

    def _create_table(self, sess: UserSession, ct: CreateTable) -> None:
        if ct.temporary:
            db = sess.temp_db
            sess.temp_tables.add(ct.table)
        else:
            db = sess.spark_db(ct.database)
        self._ensure_db(db)
        # CREATE OR REPLACE over an existing table swaps ATOMICALLY:
        # build the new table (including the CTAS payload, which may
        # legitimately read the OLD table) under a staging name, and
        # only after the write succeeds drop + rename. Dropping first
        # destroyed the old data on any select/write failure
        # (ADVICE r4 — CH's REPLACE preserves the table on failure).
        replace_target: Optional[str] = None
        create_name = ct.table
        if ct.or_replace and self.spark.catalog.tableExists(f"`{db}`.`{ct.table}`"):
            replace_target = f"`{db}`.`{ct.table}`"
            create_name = f"{ct.table}__moospark_replace"
            self.spark.sql(f"DROP TABLE IF EXISTS `{db}`.`{create_name}`")
        # CTAS: run the CH-dialect select first — without a declared
        # column list its schema IS the table schema
        src_df = None
        if ct.as_select:
            from .dialect.translate import translate_select

            # _run_select expects translated Spark SQL (the dispatch
            # path translates before it; CTAS text is still CH dialect)
            src_df = self._run_select(
                sess, translate_select(ct.as_select).spark_sql
            )
            if not ct.columns:
                from .dialect.ddl import ColumnDef
                from .dialect.types import spark_type_to_ch

                ct.columns = [
                    ColumnDef(
                        name=f.name,
                        ch_type=spark_type_to_ch(f.dataType, f.nullable),
                        spark_type=f.dataType,
                        nullable=f.nullable,
                    )
                    for f in src_df.schema.fields
                ]
        ine = "IF NOT EXISTS " if ct.if_not_exists else ""

        def colspec(c):
            # CH DEFAULT maps onto Spark's native column DEFAULT
            # (applies on every insert path, including the DEFAULT
            # keyword in VALUES); Spark requires a foldable expression
            # — the non-constant case falls back below.
            if c.default_kind == "DEFAULT" and c.default_expr:
                try:
                    return (
                        f"`{c.name}` {c.spark_type.simpleString()} "
                        f"DEFAULT {self._translate_expr(c.default_expr)}"
                    )
                except Exception:
                    pass
            return f"`{c.name}` {c.spark_type.simpleString()}"

        cols = ", ".join(colspec(c) for c in ct.columns)
        props = []
        if ct.engine:
            props.append(f"'moospark.engine' = '{ct.engine}'")
        if ct.engine_args:
            props.append(f"'moospark.engine_args' = '{_esc(ct.engine_args)}'")
        if ct.columns:
            # declared CH types (UUID/Enum/LowCardinality/...) survive
            # the Spark-schema round trip for SHOW CREATE TABLE
            import json as _json

            decl = _json.dumps([[c.name, c.ch_type] for c in ct.columns])
            props.append(f"'moospark.ch_types' = '{_esc(decl)}'")
        if any(c.default_kind for c in ct.columns):
            import json as _json

            dflts = _json.dumps(
                [
                    [c.name, c.default_kind, c.default_expr or ""]
                    for c in ct.columns
                    if c.default_kind
                ]
            )
            props.append(f"'moospark.col_defaults' = '{_esc(dflts)}'")
        if ct.order_by:
            props.append(f"'moospark.order_by' = '{_esc(ct.order_by)}'")
        if ct.partition_by:
            props.append(f"'moospark.partition_by' = '{_esc(ct.partition_by)}'")
        tbl = f"`{db}`.`{create_name}`"
        stmt = f"CREATE TABLE {ine}{tbl} ({cols}) USING PARQUET"
        if props:
            stmt += " TBLPROPERTIES (" + ", ".join(props) + ")"
        try:
            self.spark.sql(stmt)
        except Exception as e:
            if " DEFAULT " in cols:
                # non-foldable CH default (references other columns):
                # Spark rejects it — create without, keep the metadata
                plain = ", ".join(
                    f"`{c.name}` {c.spark_type.simpleString()}" for c in ct.columns
                )
                stmt2 = f"CREATE TABLE {ine}{tbl} ({plain}) USING PARQUET"
                if props:
                    stmt2 += " TBLPROPERTIES (" + ", ".join(props) + ")"
                try:
                    self.spark.sql(stmt2)
                except Exception as e2:
                    raise EngineError(
                        _clean_spark_error(e2), _ch_error_code(str(e2))
                    ) from e2
            else:
                raise EngineError(
                    _clean_spark_error(e), _ch_error_code(str(e))
                ) from e
        if src_df is not None:
            from pyspark.sql import functions as F

            # MergeTree sort-on-write analog for the CTAS payload
            # (tuple() = the explicit no-order spelling)
            writer = src_df
            ob = (ct.order_by or "").replace(" ", "")
            if ob and ob.lower() != "tuple()":
                try:
                    writer = writer.sortWithinPartitions(
                        F.expr(self._translate_expr(ct.order_by))
                    )
                except Exception:  # noqa: BLE001 — unsortable expr: keep data
                    pass
            try:
                writer.write.insertInto(tbl)
            except Exception as e:
                if replace_target is not None:
                    # failed REPLACE payload: discard staging, keep
                    # the original table untouched
                    try:
                        self.spark.sql(f"DROP TABLE IF EXISTS {tbl}")
                    except Exception:  # noqa: BLE001
                        pass
                raise EngineError(
                    _clean_spark_error(e), _ch_error_code(str(e))
                ) from e
        if replace_target is not None:
            # the swap: old table survives any failure above; a crash
            # between DROP and RENAME loses only atomicity of the
            # visible name, never the new payload
            self._sql_or_raise(f"DROP TABLE {replace_target}")
            self._sql_or_raise(f"ALTER TABLE {tbl} RENAME TO {replace_target}")


    # -------------------------------------------------- ORDER BY WITH FILL

    def _apply_with_fill(self, df: DataFrame, spec: dict):
        """CH ``ORDER BY col WITH FILL [FROM a] [TO b] [STEP s]``:
        materialize the missing axis values and left-join the result,
        defaulting non-fill columns the way CH does (0 / '' / NULL).
        The axis is generated with F.sequence (JVM-side, exploded) —
        one extra broadcast-sized side, no driver row loop. Supports
        numeric, date, and timestamp fill columns."""
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        col = spec["col"]
        if col not in df.columns:
            return df
        dt = df.schema[col].dataType
        bounds = df.agg(F.min(col).alias("lo"), F.max(col).alias("hi")).first()
        lo = spec["from"] if spec["from"] is not None else bounds["lo"]
        hi = spec["to"] if spec["to"] is not None else bounds["hi"]
        if lo is None or hi is None:  # empty input
            return df
        step_txt = spec["step"] or "1"
        if isinstance(dt, (T.DateType, T.TimestampType)):
            # CH STEP is seconds for DateTime, days for Date
            unit = "days" if isinstance(dt, T.DateType) else "seconds"
            step = F.expr(f"make_interval(0, 0, 0, {step_txt})") if unit == "days" else F.expr(
                f"make_interval(0, 0, 0, 0, 0, 0, {step_txt})"
            )
            lo_c = F.lit(lo).cast(dt) if not isinstance(lo, str) else F.lit(lo.strip("'")).cast(dt)
            hi_c = F.lit(hi).cast(dt) if not isinstance(hi, str) else F.lit(hi.strip("'")).cast(dt)
            axis = self.spark.range(1).select(
                F.explode(F.sequence(lo_c, hi_c, step)).alias(col)
            )
        else:
            lo_c = F.lit(lo).cast("double") if isinstance(lo, str) else F.lit(lo)
            hi_c = F.lit(hi).cast("double") if isinstance(hi, str) else F.lit(hi)
            axis = (
                self.spark.range(1)
                .select(
                    F.explode(
                        F.sequence(
                            lo_c.cast("long") if isinstance(dt, T.IntegralType) else lo_c,
                            hi_c.cast("long") if isinstance(dt, T.IntegralType) else hi_c,
                            F.expr(step_txt).cast(
                                "long" if isinstance(dt, T.IntegralType) else "double"
                            ),
                        )
                    ).alias(col)
                )
                .select(F.col(f"`{col}`").cast(dt).alias(col))
            )
        if spec["to"] is not None:
            # CH: TO is exclusive — trim the generated axis, keeping
            # any real data rows at/beyond it via the union below
            if isinstance(dt, (T.DateType, T.TimestampType)):
                axis = axis.filter(F.col(f"`{col}`") < hi_c)
            else:
                axis = axis.filter(F.col(f"`{col}`") < hi_c.cast(dt))
            axis = axis.unionByName(df.select(F.col(f"`{col}`"))).distinct()
        interp = dict(spec.get("interpolate") or [])
        df_in = df.withColumn("__ch_real", F.lit(1)) if interp else df
        filled = axis.join(df_in, on=col, how="left")
        if interp:
            # INTERPOLATE (c [AS expr]): filled rows derive c from the
            # previous row instead of defaulting. Group every filled
            # row with the real row preceding it (running count of
            # real markers), then value = expr applied `offset` times
            # to the real row's value (bare c = carry-forward). The
            # global window is fine here: WITH FILL shapes a final,
            # presentation-sized result set (CH applies it at the same
            # post-aggregation point), not a table-scale transform.
            from pyspark.sql import Window

            w_run = Window.orderBy(col).rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
            filled = filled.withColumn("__ch_grp", F.count("__ch_real").over(w_run))
            w_grp = Window.partitionBy("__ch_grp").orderBy(col)
            filled = filled.withColumn("__ch_off", F.row_number().over(w_grp) - 1)
            w_base = w_grp.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        cols = []
        for f in df.schema.fields:
            if f.name == col:
                cols.append(F.col(f"`{col}`"))
            elif f.name in interp:
                base = F.first(F.col(f"`{f.name}`"), ignorenulls=True).over(w_base)
                expr_txt = interp[f.name]
                dt_sql = f.dataType.simpleString()
                if expr_txt is None:
                    stepped = base
                else:
                    acc_expr = self._translate_expr(
                        self._substitute_ident(expr_txt, f.name, "__ch_acc__")
                    ).replace("__ch_acc__", "acc")
                    filled = filled.withColumn(f"__ch_base_{f.name}", base)
                    stepped = F.expr(
                        f"aggregate(sequence(1, __ch_off), "
                        f"CAST(`__ch_base_{f.name}` AS {dt_sql}), "
                        f"(acc, i) -> CAST({acc_expr} AS {dt_sql}))"
                    )
                    base = F.col(f"`__ch_base_{f.name}`")
                val = (
                    F.when(F.col("__ch_real").isNotNull(), F.col(f"`{f.name}`"))
                    .when(base.isNotNull(), stepped)
                    .otherwise(
                        F.lit(0).cast(f.dataType)
                        if isinstance(f.dataType, T.NumericType)
                        else (F.lit("") if isinstance(f.dataType, T.StringType) else F.lit(None))
                    )
                )
                cols.append(val.alias(f.name))
            elif isinstance(f.dataType, T.NumericType):
                cols.append(
                    F.coalesce(F.col(f"`{f.name}`"), F.lit(0).cast(f.dataType)).alias(f.name)
                )
            elif isinstance(f.dataType, T.StringType):
                cols.append(F.coalesce(F.col(f"`{f.name}`"), F.lit("")).alias(f.name))
            else:
                cols.append(F.col(f"`{f.name}`"))
        return filled.select(*cols).orderBy(col)

    @staticmethod
    def _substitute_ident(expr: str, name: str, repl: str) -> str:
        """Replace bare identifier ``name`` in a CH expression with
        ``repl``, skipping function-call names and quoted strings."""
        from .dialect.tokenizer import tokenize

        toks = [t for t in tokenize(expr)]
        sig = [i for i, t in enumerate(toks) if t.kind not in ("ws", "comment")]
        for si, i in enumerate(sig):
            t = toks[i]
            if t.kind not in ("ident", "bquote") or t.text.strip("`") != name:
                continue
            nxt = toks[sig[si + 1]].text if si + 1 < len(sig) else ""
            if nxt.startswith("("):
                continue  # function call, not a column ref
            t.text = repl
        return "".join(t.text for t in toks)

    # --------------------------------------------------- SHOW statements

    def _run_show(self, sess: UserSession, sql: str):
        """CH-shaped SHOW DATABASES / TABLES / CREATE TABLE. Returns
        None for other SHOW forms (Spark passthrough). Spark's own
        output would leak the internal ``u<hash>__`` namespaces and
        other credentials' databases (reference parity: each session
        sees only its own catalog, main.py:140-173)."""
        from pyspark.sql import functions as F

        from .dialect.tokenizer import tokenize
        from .system_tables import system_databases, system_tables

        toks = [t for t in tokenize(sql) if t.kind not in ("ws", "comment")]
        if not toks:
            return None
        head = toks[0].text.upper()
        if head in ("DESCRIBE", "DESC"):
            # CH DESCRIBE shape (7 columns, declared CH types) for the
            # plain `DESCRIBE [TABLE] ref` form; anything more complex
            # (subqueries) falls through to Spark's DESCRIBE.
            j = 1
            if len(toks) > 1 and toks[1].text.upper() == "TABLE":
                j = 2
            ref = "".join(t.text for t in toks[j:]).strip()
            if ref and all(
                t.kind in ("ident", "bquote") or t.text == "."
                for t in toks[j:]
            ):
                low = ref.replace("`", "").lower()
                if low.startswith("system."):
                    # virtual system.* tables aren't cataloged:
                    # materialize the provider snapshot and describe
                    # its schema (CH types via the same round trip)
                    view = _materialize_system(
                        self.spark, sess.ns, low.split(".", 1)[1],
                        sess, engine=self,
                    )
                    if view is None:
                        raise EngineError(
                            f"Table {ref} does not exist", 60
                        )
                    try:
                        from .dialect.types import spark_type_to_ch

                        schema = self.spark.table(view).schema
                        return local_df(
                            self.spark,
                            [
                                (f.name, spark_type_to_ch(f.dataType),
                                 "", "", "", "", "")
                                for f in schema.fields
                            ],
                            "name string, type string, default_type string, "
                            "default_expression string, comment string, "
                            "codec_expression string, ttl_expression string",
                        )
                    finally:
                        try:
                            self.spark.catalog.dropTempView(view)
                        except Exception:  # noqa: BLE001
                            pass
                names, ch_types = self.table_columns(
                    ref, sess.user, sess.password
                )
                # declared CH types win over the Spark-schema round
                # trip (same policy as SHOW CREATE TABLE)
                try:
                    import json as _json

                    tbl = self.resolve_table(ref, sess.user, sess.password)
                    decl_raw = self._table_moospark_props(tbl).get("ch_types")
                    if decl_raw:
                        decl = dict(_json.loads(decl_raw))
                        ch_types = [
                            decl.get(n, t) for n, t in zip(names, ch_types)
                        ]
                except Exception:
                    pass
                dflts = {}
                try:
                    import json as _json

                    raw = self._table_moospark_props(
                        self.resolve_table(ref, sess.user, sess.password)
                    ).get("col_defaults")
                    if raw:
                        dflts = {
                            n: (k, e) for n, k, e in _json.loads(raw)
                        }
                except Exception:
                    dflts = {}
                return local_df(
                    self.spark,
                    [
                        (
                            n,
                            t,
                            dflts.get(n, ("", ""))[0],
                            dflts.get(n, ("", ""))[1],
                            "",
                            "",
                            "",
                        )
                        for n, t in zip(names, ch_types)
                    ],
                    "name string, type string, default_type string, "
                    "default_expression string, comment string, "
                    "codec_expression string, ttl_expression string",
                )
            return None
        if head != "SHOW":
            return None
        second = toks[1].text.upper() if len(toks) > 1 else ""
        if second == "PROCESSLIST":
            # synchronous engine: no long-running query registry
            return self.spark.createDataFrame(
                [],
                "query_id string, user string, query string, elapsed double",
            )
        if second == "DATABASES":
            return system_databases(self.spark, sess.ns).orderBy("name")
        if second == "TABLES":
            db = sess.current_db
            if len(toks) > 3 and toks[2].text.upper() in ("FROM", "IN"):
                db = toks[3].text.strip("`")
            return (
                system_tables(self.spark, sess.ns)
                .filter(F.col("database") == db)
                .select("name")
                .orderBy("name")
            )
        if second == "CREATE" and len(toks) > 2 and toks[2].text.upper() == "TABLE":
            ref = "".join(t.text for t in toks[3:])
            return self._show_create(sess, ref)
        return None

    def _show_create(self, sess: UserSession, table_ref: str):
        """Reconstruct CH-style DDL from the schema + moospark.*
        properties (column `statement`, as ClickHouse returns it)."""
        names, ch_types = self.table_columns(table_ref, sess.user, sess.password)
        tbl = self.resolve_table(table_ref, sess.user, sess.password)
        props = {}
        try:
            for r in self.spark.sql(f"SHOW TBLPROPERTIES {tbl}").collect():
                props[r["key"]] = r["value"]
        except Exception:
            pass
        visible = table_ref.strip().strip("`")
        if props.get("moospark.ch_types"):
            import json as _json

            try:
                decl = dict(_json.loads(props["moospark.ch_types"]))
                # schema is source of truth for the column LIST (ALTERs
                # may have changed it); declared names win per column
                ch_types = [decl.get(n, t) for n, t in zip(names, ch_types)]
            except Exception:
                pass
        dflts = {}
        if props.get("moospark.col_defaults"):
            import json as _json

            try:
                dflts = {
                    n: (k, e)
                    for n, k, e in _json.loads(props["moospark.col_defaults"])
                }
            except Exception:
                dflts = {}

        def _colline(n, t):
            line = f"    `{n}` {t}"
            if n in dflts:
                k, e = dflts[n]
                line += f" {k} {e}" if e else f" {k}"
            return line

        cols = ",\n".join(_colline(n, t) for n, t in zip(names, ch_types))
        stmt = f"CREATE TABLE {visible}\n(\n{cols}\n)\nENGINE = " + props.get(
            "moospark.engine", "MergeTree"
        )
        if props.get("moospark.engine_args"):
            stmt += f"({props['moospark.engine_args']})"
        if props.get("moospark.partition_by"):
            stmt += f"\nPARTITION BY {props['moospark.partition_by']}"
        if props.get("moospark.order_by"):
            stmt += f"\nORDER BY {props['moospark.order_by']}"
        return self.spark.createDataFrame([(stmt,)], "statement string")

    # ------------------------------------------- inline-data INSERT (HTTP)

    def _insert_formatted(
        self,
        sess: UserSession,
        table_ref: str,
        col_list: list[str],
        fmt_name: str,
        payload: str,
        settings: Optional[dict] = None,
    ) -> None:
        """``INSERT INTO t [(cols)] FORMAT <X>`` with the data inline
        after the statement — the standard ClickHouse HTTP ingestion
        path (the reference hands the combined string to chDB,
        main.py:190; we parse the block and run a distributed write).
        Formats: TSV/TabSeparated(WithNames), CSV(WithNames),
        JSONEachRow, Values."""
        fmt = fmt_name.upper()
        if fmt == "VALUES":
            cols = f" ({', '.join(col_list)})" if col_list else ""
            self._run_insert(sess, f"INSERT INTO {table_ref}{cols} VALUES {payload}")
            return
        names = col_list or self.table_columns(table_ref, sess.user, sess.password)[0]
        rows: list[tuple]
        if fmt in ("TSV", "TABSEPARATED", "TSVRAW", "TABSEPARATEDRAW",
                   "TSVWITHNAMES", "TABSEPARATEDWITHNAMES"):
            lines = [ln for ln in payload.split("\n") if ln != ""]
            if fmt.endswith("WITHNAMES") and lines:
                names = lines[0].split("\t")
                lines = lines[1:]
            raw = "RAW" in fmt
            rows = [
                tuple(_tsv_field(v, raw) for v in ln.split("\t")) for ln in lines
            ]
        elif fmt in ("CSV", "CSVWITHNAMES"):
            import csv
            import io

            rdr = list(csv.reader(io.StringIO(payload)))
            rdr = [r for r in rdr if r]
            if fmt.endswith("WITHNAMES") and rdr:
                names = rdr[0]
                rdr = rdr[1:]
            rows = [tuple(None if v == "\\N" else v for v in r) for r in rdr]
        elif fmt in ("JSONEACHROW", "JSONLINES", "NDJSON"):
            import json as _json

            dicts = [
                _json.loads(ln) for ln in payload.split("\n") if ln.strip()
            ]
            names = [n for n in names if any(n in d for d in dicts)] or names
            rows = [tuple(d.get(n) for n in names) for d in dicts]
        elif fmt in ("JSONCOMPACTEACHROW", "JSONCOMPACTSTRINGSEACHROW"):
            import json as _json

            rows = [
                tuple(_json.loads(ln))
                for ln in payload.split("\n")
                if ln.strip()
            ]
        elif fmt == "JSONOBJECTEACHROW":
            import json as _json

            doc = _json.loads(payload)
            dicts = list(doc.values())
            names = [n for n in names if any(n in d for d in dicts)] or names
            rows = [tuple(d.get(n) for n in names) for d in dicts]
        elif fmt == "TSKV":
            rows = []
            for ln in payload.split("\n"):
                if not ln.strip():
                    continue
                kv = dict(
                    f.split("=", 1) for f in ln.split("\t") if "=" in f
                )
                rows.append(
                    tuple(
                        _tsv_field(kv[n], False) if n in kv else None
                        for n in names
                    )
                )
        elif fmt == "LINEASSTRING":
            # whole line → the single (String) column, no escaping
            rows = [(ln,) for ln in payload.split("\n") if ln != ""]
            names = names[:1]
        elif fmt == "AVRO":
            # binary payload: the HTTP layer decodes the request body
            # with surrogateescape, so encoding the same way recovers
            # the original bytes losslessly
            from .formats.avro import read_ocf

            raw = payload.encode("utf-8", "surrogateescape")
            avro_names, rows = read_ocf(raw)
            if avro_names and avro_names != ["value"]:
                names = [n for n in avro_names if n in names] or avro_names
        elif fmt in ("PROTOBUF", "PROTOBUFSINGLE", "PROTOBUFLIST"):
            from .formats.protobuf import decode_rows, resolve_schema

            fs = (settings or {}).get("format_schema")
            if not fs:
                raise EngineError(
                    "INSERT FORMAT Protobuf requires SETTINGS "
                    "format_schema='file.proto:Message'", 36
                )
            if not self.format_schema_dir:
                raise EngineError(
                    "format_schema_path is not configured on this server", 36
                )
            try:
                fields, _msg = resolve_schema(str(fs), self.format_schema_dir)
                raw = payload.encode("utf-8", "surrogateescape")
                mode = {"PROTOBUF": "delimited", "PROTOBUFSINGLE": "single",
                        "PROTOBUFLIST": "list"}[fmt]
                pb_names, rows = decode_rows(fields, raw, mode=mode)
            except (ValueError, IndexError, OSError) as e:
                raise EngineError(str(e), 36) from e
            # match protobuf fields to table columns case-insensitively
            lower_map = {n.lower(): n for n in names}
            keep = [i for i, p in enumerate(pb_names) if p.lower() in lower_map]
            if keep:
                names = [lower_map[pb_names[i].lower()] for i in keep]
                rows = [tuple(r[i] for i in keep) for r in rows]
            else:
                names = pb_names
        elif fmt == "CAPNPROTO":
            from .formats.capnp import decode_rows as _capnp_decode
            from .formats.capnp import resolve_schema as _capnp_resolve

            fs = (settings or {}).get("format_schema")
            if not fs:
                raise EngineError(
                    "INSERT FORMAT CapnProto requires SETTINGS "
                    "format_schema='file.capnp:Struct'", 36
                )
            if not self.format_schema_dir:
                raise EngineError(
                    "format_schema_path is not configured on this server", 36
                )
            try:
                fields, _msg = _capnp_resolve(str(fs), self.format_schema_dir)
                raw = payload.encode("utf-8", "surrogateescape")
                cp_names, rows = _capnp_decode(fields, raw)
            except (ValueError, IndexError, OSError, _struct.error) as e:
                raise EngineError(str(e), 36) from e
            lower_map = {n.lower(): n for n in names}
            keep = [i for i, p in enumerate(cp_names) if p.lower() in lower_map]
            if keep:
                names = [lower_map[cp_names[i].lower()] for i in keep]
                rows = [tuple(r[i] for i in keep) for r in rows]
            else:
                names = cp_names
        else:
            raise EngineError(f"Unsupported INSERT format: {fmt_name}", 73)
        if not rows:
            return
        # text formats arrive as strings; declare String sources and let
        # insert_rows cast to the column types (LEGACY store assignment);
        # JSONEachRow and Avro carry native typed values
        src_types = (
            ["Nullable(String)"] * len(names)
            if fmt not in ("JSONEACHROW", "AVRO", "PROTOBUF",
                           "PROTOBUFSINGLE", "PROTOBUFLIST", "CAPNPROTO")
            else None
        )
        self.insert_rows(
            table_ref, list(names), rows, sess.user, sess.password, ch_types=src_types
        )

    # ------------------------------------------------- mutations (CH ALTER)

    def _sql_or_raise(self, sql: str):
        try:
            return self.spark.sql(sql)
        except EngineError:
            raise
        except Exception as e:
            raise EngineError(_clean_spark_error(e), _ch_error_code(str(e))) from e

    def _table_exists(self, sess: UserSession, db: Optional[str], name: str) -> bool:
        return self.spark.catalog.tableExists(f"`{sess.spark_db(db)}`.`{name}`")

    def _run_exists(self, sess: UserSession, table_ref: str):
        """``EXISTS TABLE t`` → one row, `result` UInt8 (CH shape)."""
        from pyspark.sql import functions as F

        parts = [p.strip().strip("`") for p in table_ref.split(".") if p.strip()]
        db, name = (parts[0], parts[1]) if len(parts) == 2 else (None, parts[0])
        if db and db.lower() == "system":
            # virtual system.* tables exist if a provider serves them
            # (they are materialized per statement, never cataloged)
            from .system_tables import PROVIDERS

            v = 1 if name.lower() in PROVIDERS else 0
            return self.spark.range(1).select(
                F.lit(v).cast("smallint").alias("result")
            )
        with self._lock:
            v = 1 if self._table_exists(sess, db, name) else 0
        return self.spark.range(1).select(F.lit(v).cast("smallint").alias("result"))

    def _run_check(self, sess: UserSession, table_ref: str):
        """``CHECK TABLE t`` → one row, `result` UInt8. Parquet-backed
        tables have no CH part checksums; a successful schema
        resolution + zero-row read is the integrity statement this
        storage offers (missing table errors, as CH does)."""
        from pyspark.sql import functions as F

        tbl = self.resolve_table(table_ref, sess.user, sess.password)
        self._sql_or_raise(f"SELECT * FROM {tbl} LIMIT 0").collect()
        return self.spark.range(1).select(
            F.lit(1).cast("smallint").alias("result")
        )

    def _translate_expr(self, expr: str) -> str:
        """CH-dialect scalar expression → Spark SQL expression text."""
        from .dialect.translate import translate_select

        return translate_select(f"SELECT {expr}").spark_sql[len("SELECT "):]

    def _swap_rewrite(self, sess: UserSession, db: Optional[str], name: str, df) -> None:
        """Rewrite a table's contents atomically-ish via stage-and-swap
        (the Spark analog of a ClickHouse mutation's part rewrite:
        materialize the mutated data, then swap names). Preserves
        moospark.* TBLPROPERTIES and the MergeTree sort-on-write; at
        cluster scale this is one distributed write + two catalog ops,
        no driver-side data movement."""
        from pyspark.sql import functions as F

        spark_db = sess.spark_db(db)
        tbl = f"`{spark_db}`.`{name}`"
        stage = f"`{spark_db}`.`{name}__moospark_stage`"
        props = {}
        try:
            for r in self.spark.sql(f"SHOW TBLPROPERTIES {tbl}").collect():
                if r["key"].startswith("moospark."):
                    props[r["key"]] = r["value"]
        except Exception:
            pass
        order_by = props.get("moospark.order_by")
        if order_by:
            exprs = [
                self._translate_expr(e.strip())
                for e in _split_top_level(order_by.strip().strip("()"))
            ]
            df = df.sortWithinPartitions(*[F.expr(e) for e in exprs])
        self.spark.sql(f"DROP TABLE IF EXISTS {stage}")
        df.createOrReplaceTempView("__moospark_mutation_src")
        try:
            self._sql_or_raise(
                f"CREATE TABLE {stage} USING PARQUET AS "
                f"SELECT * FROM __moospark_mutation_src"
            )
            self._sql_or_raise(f"DROP TABLE {tbl}")
            self._sql_or_raise(f"ALTER TABLE {stage} RENAME TO {tbl}")
            if props:
                kv = ", ".join(f"'{k}' = '{_esc(v)}'" for k, v in props.items())
                self._sql_or_raise(f"ALTER TABLE {tbl} SET TBLPROPERTIES ({kv})")
        finally:
            self.spark.catalog.dropTempView("__moospark_mutation_src")
            self._order_by_cache.clear()

    def _run_mutation(self, sess: UserSession, m: AlterMutation) -> None:
        from pyspark.sql import functions as F

        tbl = f"`{sess.spark_db(m.database)}`.`{m.name}`"
        src = self._sql_or_raise(f"SELECT * FROM {tbl}")
        cond = F.expr(self._translate_expr(m.where)).cast("boolean")
        if m.action == "delete":
            # CH deletes rows where cond is TRUE; NULL-cond rows stay
            out = src.filter(~F.coalesce(cond, F.lit(False)))
        else:
            assigns = {c: self._translate_expr(e) for c, e in m.assignments}
            unknown = [c for c in assigns if c not in src.columns]
            if unknown:
                raise EngineError(f"Unknown column(s) {unknown} in UPDATE", 47)
            cols = []
            for f in src.schema.fields:
                if f.name in assigns:
                    cols.append(
                        F.when(F.coalesce(cond, F.lit(False)), F.expr(assigns[f.name]))
                        .otherwise(F.col(f"`{f.name}`"))
                        .cast(f.dataType)
                        .alias(f.name)
                    )
                else:
                    cols.append(F.col(f"`{f.name}`"))
            out = src.select(*cols)
        self._swap_rewrite(sess, m.database, m.name, out)

    def _run_alter_column(self, sess: UserSession, a: AlterColumn) -> None:
        from pyspark.sql import functions as F

        from .dialect.types import ch_type_to_spark

        tbl = f"`{sess.spark_db(a.database)}`.`{a.name}`"
        cols = self._sql_or_raise(f"SELECT * FROM {tbl} LIMIT 0").columns
        if a.action == "add":
            if a.column in cols:
                if a.if_clause:
                    return
                raise EngineError(f"Column {a.column} already exists", 44)
            dt = ch_type_to_spark(a.ch_type or "String")
            if a.default is None:
                # metadata-only ADD COLUMNS: existing rows read NULL
                self._sql_or_raise(
                    f"ALTER TABLE {tbl} ADD COLUMNS (`{a.column}` {dt.simpleString()})"
                )
                return
            # DEFAULT backfills existing rows (CH semantics) → rewrite
            src = self._sql_or_raise(f"SELECT * FROM {tbl}")
            out = src.withColumn(
                a.column, F.expr(self._translate_expr(a.default)).cast(dt)
            )
            self._swap_rewrite(sess, a.database, a.name, out)
            return
        if a.column not in cols:
            if a.if_clause:
                return
            raise EngineError(f"Unknown column {a.column}", 47)
        src = self._sql_or_raise(f"SELECT * FROM {tbl}")
        if a.action == "modify":
            # CH MODIFY COLUMN c NewType: cast in place via rewrite,
            # recording the new declared type for SHOW CREATE/DESCRIBE
            dt = ch_type_to_spark(a.ch_type or "String")
            out = src.withColumn(a.column, F.col(f"`{a.column}`").cast(dt))
            self._swap_rewrite(sess, a.database, a.name, out)
            self._update_declared_type(tbl, a.column, a.ch_type)
            return
        if a.action == "rename":
            out = src.withColumnRenamed(a.column, a.new_name)
            self._swap_rewrite(sess, a.database, a.name, out)
            self._update_declared_type(tbl, a.column, None, rename_to=a.new_name)
            return
        if a.action == "comment":
            cmt = (a.comment or "").replace("'", "\\'")
            self._sql_or_raise(
                f"ALTER TABLE {tbl} ALTER COLUMN `{a.column}` COMMENT '{cmt}'"
            )
            return
        if a.action == "clear":
            # CH CLEAR COLUMN resets every row to the type default
            dt = dict(zip(src.columns, [f.dataType for f in src.schema.fields]))[
                a.column
            ]
            tn = dt.simpleString()
            if tn in ("string",):
                dv = F.lit("")
            elif tn.startswith(("array", "map")):
                dv = F.expr(f"CAST(array() AS {tn})") if tn.startswith("array") else F.expr(f"CAST(map() AS {tn})")
            elif tn in ("date",):
                dv = F.lit("1970-01-01").cast("date")
            elif tn.startswith("timestamp"):
                dv = F.lit("1970-01-01 00:00:00").cast(tn)
            else:
                dv = F.lit(0).cast(tn)
            out = src.withColumn(a.column, dv)
            self._swap_rewrite(sess, a.database, a.name, out)
            return
        # drop: parquet v1 tables can't drop columns in place → rewrite
        self._swap_rewrite(sess, a.database, a.name, src.drop(a.column))

    def _update_declared_type(
        self, tbl: str, column: str, ch_type: Optional[str], rename_to: Optional[str] = None
    ) -> None:
        """Keep the moospark.ch_types declaration in sync with a
        MODIFY/RENAME COLUMN (SHOW CREATE / DESCRIBE read it)."""
        import json as _json

        props = self._table_moospark_props(tbl)
        decl_raw = props.get("ch_types")
        if not decl_raw:
            return
        try:
            decl = _json.loads(decl_raw)
        except Exception:
            return
        out = []
        for n, t in decl:
            if n == column:
                n = rename_to or n
                t = ch_type or t
            out.append([n, t])
        self._sql_or_raise(
            f"ALTER TABLE {tbl} SET TBLPROPERTIES ('moospark.ch_types' = "
            f"'{_esc(_json.dumps(out))}')"
        )
        self._order_by_cache.clear()

    def _run_optimize(self, sess: UserSession, o: OptimizeTable) -> None:
        """OPTIMIZE TABLE ≈ part merge: compact the table to fewer,
        larger, sorted files (row-group pruning stays effective).
        With FINAL on a Replacing* table, the merge also collapses
        key-duplicate rows to the latest version — the CH semantics
        of forcing the Replacing merge to completion."""
        tbl = f"`{sess.spark_db(o.database)}`.`{o.name}`"
        props = self._table_moospark_props(tbl)
        spec = (
            self._final_partition_order(props)
            if o.final and props.get("engine", "").startswith("Replacing")
            else None
        )
        if spec is not None:
            keys, order = spec
            src = self._sql_or_raise(
                f"SELECT * EXCEPT (__ch_fin) FROM (SELECT *, row_number() "
                f"OVER (PARTITION BY {keys} ORDER BY {order}) AS __ch_fin "
                f"FROM {tbl}) WHERE __ch_fin = 1"
            )
        else:
            src = self._sql_or_raise(f"SELECT * FROM {tbl}")
        n = max(1, self.spark.sparkContext.defaultParallelism // 4)
        self._swap_rewrite(sess, o.database, o.name, src.coalesce(n))

    # --------------------------------------------- views / materialized views

    def _qualify_first_from(self, sess: UserSession, body: str) -> tuple[str, Optional[str]]:
        """Fully qualify the first FROM-position table ref of an
        (already db-remapped) SELECT body with the session's current
        database. Returns (body, qualified_ref or None). The MV
        trigger substitutes this exact text with the insert delta."""
        from .dialect.tokenizer import tokenize

        toks = tokenize(body)
        sig = [i for i, t in enumerate(toks) if t.kind not in ("ws", "comment")]
        out = [t.text for t in toks]
        for k, i in enumerate(sig):
            t = toks[i]
            if t.kind == "ident" and t.text.upper() == "FROM" and k + 1 < len(sig):
                j = sig[k + 1]
                if toks[j].text == "(":
                    continue  # subquery — keep scanning for an inner FROM
                if toks[j].kind not in ("ident", "bquote"):
                    continue
                if (
                    k + 3 < len(sig)
                    and toks[sig[k + 2]].text == "."
                    and toks[sig[k + 3]].kind in ("ident", "bquote")
                ):
                    db = toks[j].text.strip("`")
                    nm = toks[sig[k + 3]].text.strip("`")
                    qual = f"`{db}`.`{nm}`"
                    out[j], out[sig[k + 2]], out[sig[k + 3]] = qual, "", ""
                else:
                    nm = toks[j].text.strip("`")
                    qual = f"`{sess.spark_db()}`.`{nm}`"
                    out[j] = qual
                return "".join(out), qual
        return body, None

    def _run_create_view(self, sess: UserSession, cv: CreateView) -> None:
        db = sess.spark_db(cv.database)
        self._ensure_db(db)
        self._in_user_db(sess)  # unqualified refs in the body bind here
        name = f"`{db}`.`{cv.name}`"
        body = self._prepare_sql(sess, self._translate_expr_body(cv.select_sql))
        if not cv.materialized:
            head = "CREATE OR REPLACE VIEW" if cv.or_replace else "CREATE VIEW"
            ine = "IF NOT EXISTS " if cv.if_not_exists else ""
            self._sql_or_raise(f"{head} {ine}{name} AS {body}")
            return
        # materialized view: storage table + insert trigger (CH
        # semantics: the SELECT transforms each inserted block into
        # the storage table; POPULATE backfills at creation)
        body, source = self._qualify_first_from(sess, body)
        if source is None:
            raise EngineError("MATERIALIZED VIEW requires a FROM table", 62)
        if cv.to_table:
            storage = f"`{sess.spark_db(cv.to_database)}`.`{cv.to_table}`"
            if not self.spark.catalog.tableExists(storage):
                raise EngineError(f"TO table {storage} does not exist", 60)
            # the MV name reads from the target (CH TO-form)
            self._sql_or_raise(f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM {storage}")
        else:
            storage = name
            if self.spark.catalog.tableExists(storage):
                if cv.if_not_exists:
                    return
                raise EngineError(f"Table {storage} already exists", 57)
            where = "" if cv.populate else " WHERE 1 = 0"
            self._sql_or_raise(
                f"CREATE TABLE {storage} USING PARQUET AS "
                f"SELECT * FROM ({body}) __mv_init{where}"
            )
        props = (
            f"'moospark.mv_source' = '{_esc(source)}', "
            f"'moospark.mv_select' = '{_esc(body)}'"
        )
        self._sql_or_raise(f"ALTER TABLE {storage} SET TBLPROPERTIES ({props})")
        self._mv_remember(sess.ns, source, storage, body)

    def _mv_remember(self, ns: str, source: str, storage: str, body: str) -> None:
        reg = self._mv_registry.setdefault(ns, {})
        lst = reg.setdefault(source, [])
        lst[:] = [(s, b) for s, b in lst if s != storage]
        lst.append((storage, body))

    def _mv_forget(self, ns: str, qual: str) -> None:
        reg = self._mv_registry.get(ns)
        if not reg:
            return
        for source in list(reg):
            reg[source] = [(s, b) for s, b in reg[source] if s != qual]
            if not reg[source] or source == qual:
                reg.pop(source, None)

    def _mvs_for(self, sess: UserSession, source_qual: str) -> list[tuple[str, str]]:
        ns = sess.ns
        if ns not in self._mv_scanned:
            self._mv_scanned.add(ns)
            reg = self._mv_registry.setdefault(ns, {})
            try:
                dbs = [
                    d.name
                    for d in self.spark.catalog.listDatabases()
                    if d.name.startswith(f"{ns}__")
                ]
                for d in dbs:
                    for t in self.spark.catalog.listTables(d):
                        if t.tableType not in ("MANAGED", "EXTERNAL"):
                            continue
                        qual = f"`{d}`.`{t.name}`"
                        props = {}
                        try:
                            for r in self.spark.sql(
                                f"SHOW TBLPROPERTIES {qual}"
                            ).collect():
                                props[r["key"]] = r["value"]
                        except Exception:
                            continue
                        src = props.get("moospark.mv_source")
                        sel = props.get("moospark.mv_select")
                        if src and sel:
                            self._mv_remember(ns, src, qual, sel)
            except Exception:
                pass
        return self._mv_registry.get(ns, {}).get(source_qual, [])

    def _propagate_mvs(
        self, sess: UserSession, target_qual: str, delta: DataFrame, _depth: int = 0
    ) -> None:
        """Apply each MV's SELECT to the just-inserted block and append
        to MV storage (the CH insert-trigger contract). The delta is a
        temp view, so propagation is fully distributed — the inserted
        block never lands on the driver. Cascades into MVs reading
        from MV storage (CH chains too), bounded at depth 10."""
        from pyspark.sql import functions as F

        if _depth >= 10:
            return
        mvs = self._mvs_for(sess, target_qual)
        if not mvs:
            return
        view = f"__moospark_mv_delta_{_depth}"
        delta.createOrReplaceTempView(view)
        try:
            for storage, body in mvs:
                out = self.spark.sql(body.replace(target_qual, view))
                tgt = self.spark.table(storage)
                cols = []
                for f in tgt.schema.fields:
                    if f.name in out.columns:
                        cols.append(F.col(f"`{f.name}`").cast(f.dataType).alias(f.name))
                    else:
                        cols.append(F.lit(None).cast(f.dataType).alias(f.name))
                aligned = out.select(*cols)
                writer = aligned
                order_by = self._table_order_by(storage)
                if order_by:
                    exprs = [
                        self._translate_expr(e.strip())
                        for e in _split_top_level(order_by.strip().strip("()"))
                    ]
                    writer = aligned.sortWithinPartitions(*[F.expr(e) for e in exprs])
                writer.write.insertInto(storage)
                self._propagate_mvs(sess, storage, aligned, _depth + 1)
        finally:
            self.spark.catalog.dropTempView(view)

    def _translate_expr_body(self, select_sql: str) -> str:
        """CH-dialect SELECT text → Spark SQL text (no statement split)."""
        from .dialect.translate import translate_select

        return translate_select(select_sql).spark_sql


def _parse_set(stmt: str) -> dict:
    """``SET k = v[, k2 = v2]`` → {k: v} (values unquoted)."""
    from .dialect.tokenizer import tokenize

    toks = [t for t in tokenize(stmt) if t.kind not in ("ws", "comment")]
    out: dict = {}
    i = 1  # skip SET
    while i + 2 < len(toks) + 1 and i + 2 <= len(toks):
        if i + 2 > len(toks) or toks[i + 1].text != "=":
            break
        key = toks[i].text.strip("`")
        val = toks[i + 2].text
        if len(val) >= 2 and val[0] in "'\"" and val[-1] == val[0]:
            val = val[1:-1]
        out[key] = val
        i += 3
        if i < len(toks) and toks[i].text == ",":
            i += 1
    return out


import re as _re

_INSERT_DATA_RE = _re.compile(
    # data block starts after a newline — except FORMAT Values, whose
    # rows may follow on the same line (clickhouse-client does this);
    # an optional SETTINGS clause (e.g. format_schema for Protobuf)
    # may sit between the column list and FORMAT, as in CH
    r"^\s*INSERT\s+INTO\s+(?P<ref>`[^`]+`(?:\s*\.\s*`[^`]+`)?|[\w.]+)\s*"
    r"(?:\((?P<cols>[^)]*)\)\s*)?"
    r"(?:SETTINGS\s+(?P<settings>[^\n]*?)\s+)?"
    r"FORMAT\s+(?P<fmt>\w+)[ \t]*\n(?P<data>.+)$",
    _re.IGNORECASE | _re.DOTALL,
)

_INSERT_VALUES_INLINE_RE = _re.compile(
    r"^\s*INSERT\s+INTO\s+(?P<ref>`[^`]+`(?:\s*\.\s*`[^`]+`)?|[\w.]+)\s*"
    r"(?:\((?P<cols>[^)]*)\)\s*)?FORMAT\s+Values[ \t]+(?P<data>\(.+)$",
    _re.IGNORECASE | _re.DOTALL,
)


def _match_insert_data(query: str):
    """Split ``INSERT INTO t [(cols)] FORMAT X\\n<data>`` into parts;
    None if the query isn't an inline-data insert (e.g. the data block
    is empty — then it's a plain statement)."""
    m = _INSERT_DATA_RE.match(query)
    fmt = m.group("fmt") if m else "Values"
    settings_txt = (m.group("settings") or "") if m else ""
    if not m:
        m = _INSERT_VALUES_INLINE_RE.match(query)
    if not m or not m.group("data").strip():
        return None
    cols = [
        c.strip().strip("`") for c in (m.group("cols") or "").split(",") if c.strip()
    ]
    settings = _parse_set(f"SET {settings_txt}") if settings_txt.strip() else {}
    return m.group("ref"), cols, fmt, m.group("data"), settings


def _tsv_field(v: str, raw: bool) -> Optional[str]:
    if v == "\\N" and not raw:
        return None
    if raw or "\\" not in v:
        return v
    return (
        v.replace("\\t", "\t")
        .replace("\\n", "\n")
        .replace("\\r", "\r")
        .replace("\\'", "'")
        .replace("\\\\", "\\")
    )


def _split_top_level(s: str) -> list[str]:
    """Split on commas not nested inside parentheses."""
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return [p for p in parts if p.strip()]


def _esc(s: str) -> str:
    return s.replace("'", "''")


# Spark error class → ClickHouse error code (public CH ErrorCodes.cpp
# numbering; the reference surfaces chDB's codes the same way via the
# stderr capture, main.py:823-847). Unmatched errors stay 62.
_CH_ERROR_CODES = (
    ("TABLE_OR_VIEW_NOT_FOUND", 60),      # UNKNOWN_TABLE
    ("TABLE_OR_VIEW_ALREADY_EXISTS", 57),  # TABLE_ALREADY_EXISTS
    ("SCHEMA_NOT_FOUND", 81),              # UNKNOWN_DATABASE
    ("SCHEMA_ALREADY_EXISTS", 82),         # DATABASE_ALREADY_EXISTS
    ("UNRESOLVED_COLUMN", 47),             # UNKNOWN_IDENTIFIER
    ("UNRESOLVED_ROUTINE", 46),            # UNKNOWN_FUNCTION
    ("PARSE_SYNTAX_ERROR", 62),            # SYNTAX_ERROR
    ("DIVIDE_BY_ZERO", 153),               # ILLEGAL_DIVISION
    ("CAST_INVALID_INPUT", 6),             # CANNOT_PARSE_TEXT
    ("NUMERIC_VALUE_OUT_OF_RANGE", 69),    # ARGUMENT_OUT_OF_BOUND
    ("WRONG_NUM_ARGS", 42),                # NUMBER_OF_ARGUMENTS_DOESNT_MATCH
    ("DATATYPE_MISMATCH", 43),             # ILLEGAL_TYPE_OF_ARGUMENT
    ("AMBIGUOUS_REFERENCE", 352),          # AMBIGUOUS_IDENTIFIER
)


def _ch_error_code(msg: str) -> int:
    for marker, code in _CH_ERROR_CODES:
        if marker in msg:
            return code
    return 62


def _clean_spark_error(e: Exception) -> str:
    msg = str(e)
    return msg.split("\nJVM stacktrace:")[0].strip()
