"""Full-registry sweep on ZERO-ROW tables: the 100 TB edge nobody tests.

At cluster scale, empty inputs are routine, not exceptional: a filter
that drains a partition, a date-bounded scan that matches nothing, a
tenant with no rows yet, a replay window past the high-water mark. An
operator that crashes on zero rows (``collect()[0]`` on an empty model
aggregate, an Arrow kernel assuming ≥1 batch, a ratio dividing by a
zero count) is a real defect class that the sf-scaled sweeps can never
reach because every sf dir has data.

This sweep materializes a schema-faithful zero-row copy of all ten
tables (schemas read from sf0.001 via pyarrow, no data dependency) and
runs EVERY registered query against it — and, where the query is
oracled, runs the DuckDB oracle on the same empty views and compares
with the suite's driver-faithful comparator. One line per problem:

    python scripts/empty_input_sweep.py                       # 0 rows
    SPARK_GRAFT_BOUNDARY_ROWS=1 python scripts/empty_input_sweep.py

`SPARK_GRAFT_BOUNDARY_ROWS=N` keeps the first N rows of each table
instead of zero — N=1 is the other classic boundary (single-row
windows, lag with no predecessor, stddev of one sample, percentile
interpolation with nothing to interpolate, LSH with one document).
`SPARK_GRAFT_BOUNDARY_CLONES=K` (with ROWS=1) repeats that first row
K times with UNIQUE primary keys (base + i — every other column
constant): the constant-content table. One hot join/group key
everywhere (maximum skew), every document an exact duplicate of every
other (LSH bands collapse into ONE bucket, driving the bucket-cap
fallback), rank/row_number ties on every ordering key. Keys must stay
unique because the table contract guarantees it — cloning keys
verbatim makes the oracles' per-key GROUP BYs collapse rows that
per-row kernels keep, a data artifact, not an engine divergence.
Both engines read the SAME files, so every remaining divergence is an
engine semantics difference, never a data artifact.

`SPARK_GRAFT_BOUNDARY_NULLS=1` runs at FULL sf0.001 but NULLs every
3rd row of the optional attribute columns (measure/JSON/label columns
— never keys, timestamps, or the document text the kernel contract
declares NOT NULL): the generator writes zero NULLs anywhere, so
without this mode every NULL path outside the contract audits is
oracle-unexercised. Classic divergence classes to expect: ORDER BY
with NULLs (Spark ASC defaults NULLS FIRST, DuckDB NULLS LAST),
`concat` (Spark propagates NULL, DuckDB treats it as ''), NaN-vs-NULL
coercions.

`SPARK_GRAFT_BOUNDARY_REVERSE=1` runs at FULL sf0.001 with every
table's physical row order REVERSED. Every query must be a
deterministic function of the row SET: any kernel or plan taking a
"first" row per group without a total order produces a different
answer on the reversed file than DuckDB does, surfacing hidden
arrival-order dependence — the nondeterminism that shows up at
cluster scale as flaky results across runs.

`SPARK_GRAFT_BOUNDARY_TEXT=1` runs at FULL sf0.001 but rewrites the
document text by position: every 4th doc becomes the EMPTY string,
the next a single non-ASCII char, the next whitespace-only — the
tokenizer/shingle/quality-ratio edges (zero-length division, zero
shingles, unicode length vs byte length) that generator prose can
never produce.

`SPARK_GRAFT_BOUNDARY_UNICODE=1` runs at FULL sf0.001 with adversarial
unicode woven into the document text (and a rotating subset of `lang`
values): NFC and NFD spellings of the same word on ADJACENT rows,
combining-mark stacks, astral-plane (surrogate-pair) emoji and CJK,
bidi controls and zero-width joiners. This is the cross-engine
collation/length/normalization trap the text-edges mode only grazed
with one BMP char: code-point vs byte vs UTF-16-unit lengths, regex
tokenization over non-Latin scripts, group-key equality of
canonically-equal-but-byte-different strings (both engines must treat
NFC ≠ NFD — byte semantics — for the hash gate to hold).

`SPARK_GRAFT_BOUNDARY_DUPES=1` runs at FULL sf0.001 with every 5th
events row APPENDED AGAIN VERBATIM (same event_id — an at-least-once
replay / CDC double-fire, the 100 TB ingestion norm). events is the
one table whose contract does not guarantee key uniqueness
(`tests/test_table_contracts.py`); dimension/document tables keep
their unique-key contracts and copy through untouched. Every query
must be a deterministic function of the (multi)set both engines read:
dedup operators must collapse the replays, count-based ones must count
them, and neither may crash on the tie.

`SPARK_GRAFT_BOUNDARY_WIDE=1` runs at FULL sf0.001 with adversarial
RECORD WIDTH — the ninth mode, the one axis the first eight
(cardinality, skew, nulls, text edges, order, unicode, dupes) never
stressed: every 25th document's text is replaced by deterministic
multi-hundred-KiB prose (widths cycle 1 MiB / 256 KiB / 64 KiB; a
distinct word stride per doc so the giants are NOT near-dups of each
other — the all-duplicate shape is the CLONES mode's job), `n_chars`
kept consistent, and every 100th events row carries a ~256 KiB JSON
``props`` payload. A single record much wider than the Arrow batch
target is what a 100 TB web corpus actually contains (concatenated
crawls, minified bundles, base64 blobs): per-batch kernels (shingling,
LM scoring, frame windows, codecs) must neither crash nor mis-batch
when one row dominates its batch, and byte-indexed windows (FRAME
slicing) must stay byte-true at widths far past their test prose.

Expected legitimate divergence classes (report-and-adjudicate, not
auto-fail): none known at time of writing — ungrouped aggregates
return one all-NULL/0 row in BOTH engines, grouped ones return zero
rows in both.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCHEMA_SF_DIR = os.environ.get("SPARK_GRAFT_SCHEMA_SF", "/root/testdata/sf0.001")
BOUNDARY_ROWS = int(os.environ.get("SPARK_GRAFT_BOUNDARY_ROWS", "0"))
BOUNDARY_CLONES = int(os.environ.get("SPARK_GRAFT_BOUNDARY_CLONES", "1"))
BOUNDARY_NULLS = os.environ.get("SPARK_GRAFT_BOUNDARY_NULLS", "") == "1"
BOUNDARY_TEXT = os.environ.get("SPARK_GRAFT_BOUNDARY_TEXT", "") == "1"
BOUNDARY_REVERSE = os.environ.get("SPARK_GRAFT_BOUNDARY_REVERSE", "") == "1"
BOUNDARY_UNICODE = os.environ.get("SPARK_GRAFT_BOUNDARY_UNICODE", "") == "1"
BOUNDARY_DUPES = os.environ.get("SPARK_GRAFT_BOUNDARY_DUPES", "") == "1"
BOUNDARY_WIDE = os.environ.get("SPARK_GRAFT_BOUNDARY_WIDE", "") == "1"

#: optional attribute columns NULLed (every 3rd row) under the nulls
#: boundary. Deliberately excluded: primary/foreign keys (contract),
#: timestamps (watermark/sentinel machinery defines ingest-time
#: validation as the NULL gate), documents.text and event_type (the
#: kernel / routing contracts declare them NOT NULL — the contract
#: audit operator is where those violations surface).
_NULLABLE = {
    "events": ["value", "props"],
    "documents": ["lang", "source"],
    "customer": ["c_acctbal"],
    "supplier": ["s_acctbal"],
    "lineitem": ["l_discount"],
    "embeddings": ["embedding"],
}

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


#: per-table primary-key column re-sequenced under cloning (base + i);
#: every other column repeats verbatim. lineitem's key is the
#: (l_orderkey, l_linenumber) pair — the line number takes the
#: sequence, the order FK stays the constant hot key.
_CLONE_KEYS = {
    "region": "r_regionkey",
    "nation": "n_nationkey",
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "lineitem": "l_linenumber",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}


def materialize_empty_tables(dest: str, rows: int = 0, clones: int = 1) -> None:
    """Write an N-row parquet per table with the exact sf schema
    (N=0: schema-only empty table; N>0: the first N rows, each
    repeated ``clones`` times with re-sequenced primary keys — the
    constant-content boundary)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    for t in TABLES:
        src = os.path.join(SCHEMA_SF_DIR, f"{t}.parquet")
        if rows > 0:
            table = pq.read_table(src).slice(0, rows)
            if clones > 1:
                # the key re-sequencing below rewrites EVERY row's key
                # (originals included) to base..base+N*K; only for N=1
                # does the first clone keep the original key that other
                # tables' FK columns still reference (round-13 advisor)
                if rows != 1:
                    raise ValueError(
                        "BOUNDARY_CLONES > 1 requires BOUNDARY_ROWS == 1: "
                        "re-sequencing would rewrite the original rows' "
                        "keys and break cross-table FK references"
                    )
                table = pa.concat_tables([table] * clones)
                key = _CLONE_KEYS[t]
                i = table.schema.get_field_index(key)
                base = table.column(key)[0].as_py()
                seq = pa.array(
                    range(base, base + len(table)), table.schema.field(key).type
                )
                table = table.set_column(i, table.schema.field(key), seq)
        else:
            table = pq.read_schema(src).empty_table()
        pq.write_table(table, os.path.join(dest, f"{t}.parquet"))


def materialize_nulled_tables(dest: str) -> None:
    """Full sf copy with every 3rd row of the optional attribute
    columns NULLed — deterministic, both engines read the result."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    for t in TABLES:
        table = pq.read_table(os.path.join(SCHEMA_SF_DIR, f"{t}.parquet"))
        keep = pa.array([i % 3 != 0 for i in range(len(table))])
        for col in _NULLABLE.get(t, []):
            i = table.schema.get_field_index(col)
            field = table.schema.field(col)
            nulled = pc.if_else(keep, table.column(col).combine_chunks(), None)
            table = table.set_column(i, pa.field(field.name, field.type), nulled)
        pq.write_table(table, os.path.join(dest, f"{t}.parquet"))


def materialize_text_edge_tables(dest: str) -> None:
    """Full sf copy with document text rewritten by position: empty
    string / single non-ASCII char / whitespace-only / unchanged, in
    rotation. Other tables copy through untouched."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    edges = ["", "é", "   "]  # empty, one 2-byte char, whitespace
    for t in TABLES:
        table = pq.read_table(os.path.join(SCHEMA_SF_DIR, f"{t}.parquet"))
        if t == "documents":
            i = table.schema.get_field_index("text")
            field = table.schema.field("text")
            vals = table.column("text").to_pylist()
            vals = [
                edges[r % 4] if r % 4 < 3 else v for r, v in enumerate(vals)
            ]
            table = table.set_column(i, field, pa.array(vals, field.type))
        pq.write_table(table, os.path.join(dest, f"{t}.parquet"))


#: adversarial unicode payloads, cycled by row position. Pairs of
#: canonically-equal-but-byte-different spellings sit on ADJACENT rows
#: (NFC then NFD) so group-key equality, dedup shingles, and length
#: functions all see the trap; the rest cover combining-mark stacks,
#: astral-plane (surrogate-pair) code points, CJK (no-whitespace
#: tokenization), and bidi/zero-width controls inside words.
_UNICODE_EDGES = [
    "café résumé naïve",            # NFC
    "café résumé naïve",        # NFD of the same
    "á̂̃̄ combining stack end",    # mark pile-up
    "\U0001f680 \U0001d54a\U0001d552\U0001d55b astral", # emoji + math bold
    "日本語の文書 cjk text",    # CJK, no spaces
    "zero​width‍joined⁠words",           # ZWSP/ZWJ/WJ
    "bidi ‮REVERSED‬ tail",                   # RTL override
]


def materialize_unicode_tables(dest: str) -> None:
    """Full sf copy with adversarial unicode woven into documents.text
    (every 3rd row gets an edge payload APPENDED to its prose, keeping
    real tokens present) and, on every 11th row, a zero-width-suffixed
    `lang` value (same visible text, different bytes — a group key that
    must NOT merge with its clean twin under byte semantics)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    for t in TABLES:
        table = pq.read_table(os.path.join(SCHEMA_SF_DIR, f"{t}.parquet"))
        if t == "documents":
            i = table.schema.get_field_index("text")
            field = table.schema.field("text")
            vals = table.column("text").to_pylist()
            vals = [
                (v or "") + " " + _UNICODE_EDGES[(r // 3) % len(_UNICODE_EDGES)]
                if r % 3 == 0
                else v
                for r, v in enumerate(vals)
            ]
            table = table.set_column(i, field, pa.array(vals, field.type))
            li = table.schema.get_field_index("lang")
            lf = table.schema.field("lang")
            langs = table.column("lang").to_pylist()
            langs = [
                (v + "\u200b") if (v is not None and r % 11 == 0) else v
                for r, v in enumerate(langs)
            ]
            table = table.set_column(li, lf, pa.array(langs, lf.type))
        pq.write_table(table, os.path.join(dest, f"{t}.parquet"))


def materialize_duped_tables(dest: str) -> None:
    """Full sf copy with every 5th events row appended AGAIN verbatim
    (same event_id): the at-least-once replay / CDC double-fire shape.
    All other tables keep their unique-key contracts and copy through
    untouched."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    for t in TABLES:
        table = pq.read_table(os.path.join(SCHEMA_SF_DIR, f"{t}.parquet"))
        if t == "events":
            replay = table.take(list(range(0, len(table), 5)))
            table = pa.concat_tables([table, replay])
        pq.write_table(table, os.path.join(dest, f"{t}.parquet"))


#: wide-record widths, cycled over the widened docs — one true 1 MiB
#: monster per three, so the sweep stresses the extreme without the
#: DuckDB oracle side (which re-tokenizes every widened doc in SQL)
#: turning a 5-minute sweep into an hour
_WIDE_WIDTHS = (1 << 20, 256 << 10, 64 << 10)
_WIDE_DOC_EVERY = 25
_WIDE_EVENT_EVERY = 100
_WIDE_PROPS_BYTES = 256 << 10


def _wide_text(pos: int, width: int) -> str:
    """Deterministic prose of ~``width`` bytes: an arithmetic word-index
    progression with a per-doc stride (9973 prime, stride coprime), so
    each giant has ~9973 distinct tokens and a bigram/shingle set
    DISJOINT-ish from every other giant — genuinely distinct wide
    records, not rotations of one cycle that MinHash would collapse."""
    stride = (pos % 9971) + 2  # 2..9972, always coprime with prime 9973
    words = []
    n = i = 0
    while n < width:
        w = f"w{(7 + i * stride) % 9973}"
        words.append(w)
        n += len(w) + 1
        i += 1
    return " ".join(words)


def materialize_wide_tables(dest: str) -> None:
    """Full sf copy with adversarial record width (see module doc):
    multi-hundred-KiB document texts (n_chars kept consistent) and
    ~256 KiB events.props JSON payloads."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    for t in TABLES:
        table = pq.read_table(os.path.join(SCHEMA_SF_DIR, f"{t}.parquet"))
        if t == "documents":
            ti = table.schema.get_field_index("text")
            tf = table.schema.field("text")
            vals = table.column("text").to_pylist()
            vals = [
                _wide_text(r, _WIDE_WIDTHS[(r // _WIDE_DOC_EVERY) % 3])
                if r % _WIDE_DOC_EVERY == 0
                else v
                for r, v in enumerate(vals)
            ]
            table = table.set_column(ti, tf, pa.array(vals, tf.type))
            ni = table.schema.get_field_index("n_chars")
            nf = table.schema.field("n_chars")
            table = table.set_column(
                ni, nf, pa.array([len(v) for v in vals], nf.type)
            )
        elif t == "events":
            pi = table.schema.get_field_index("props")
            pf = table.schema.field("props")
            pad = "x" * _WIDE_PROPS_BYTES
            vals = table.column("props").to_pylist()
            vals = [
                f'{{"pad":"{pad}","wide":{r}}}'
                if r % _WIDE_EVENT_EVERY == 0
                else v
                for r, v in enumerate(vals)
            ]
            table = table.set_column(pi, pf, pa.array(vals, pf.type))
        pq.write_table(table, os.path.join(dest, f"{t}.parquet"))


def materialize_reversed_tables(dest: str) -> None:
    """Full sf copy with the physical row order reversed — a query
    whose answer changes is arrival-order-dependent, i.e. broken."""
    import pyarrow.parquet as pq

    for t in TABLES:
        table = pq.read_table(os.path.join(SCHEMA_SF_DIR, f"{t}.parquet"))
        idx = list(range(len(table) - 1, -1, -1))
        pq.write_table(table.take(idx), os.path.join(dest, f"{t}.parquet"))


def main() -> int:
    import duckdb

    import __spark_entry__ as entry
    from bigdata_spark_realtime_spark.session import get_spark

    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"
        ),
    )
    from oracle_util import assert_matches_oracle

    empty_dir = tempfile.mkdtemp(prefix="bsr_empty_sf_")
    if BOUNDARY_WIDE:
        materialize_wide_tables(empty_dir)
    elif BOUNDARY_UNICODE:
        materialize_unicode_tables(empty_dir)
    elif BOUNDARY_DUPES:
        materialize_duped_tables(empty_dir)
    elif BOUNDARY_REVERSE:
        materialize_reversed_tables(empty_dir)
    elif BOUNDARY_TEXT:
        materialize_text_edge_tables(empty_dir)
    elif BOUNDARY_NULLS:
        materialize_nulled_tables(empty_dir)
    else:
        materialize_empty_tables(empty_dir, BOUNDARY_ROWS, BOUNDARY_CLONES)

    spark = get_spark(app_name="bsr-empty-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{empty_dir}/{t}.parquet')"
        )
    oracles = entry.oracle_sql()

    class _DF:  # minimal .toPandas() shim for the comparator
        def __init__(self, pdf):
            self._pdf = pdf

        def toPandas(self):
            return self._pdf

    problems = []
    t0 = time.time()
    names = entry.queries()
    for i, (name, fn) in enumerate(names.items(), 1):
        # progress to stderr, flushed per query: if the sweep dies hard
        # (the wide mode's first run was OOM-killed with no traceback),
        # the last line names the culprit instead of leaving a silent
        # exit for the harness to bisect.
        print(f"[sweep {i}/{len(names)}] {name}", file=sys.stderr, flush=True)
        try:
            got = fn(spark, empty_dir).toPandas()
        except Exception as ex:  # noqa: BLE001 — report and continue
            problems.append((name, f"SPARK-ERROR {type(ex).__name__}: {ex}"))
            continue
        if name not in oracles:
            continue
        try:
            assert_matches_oracle(_DF(got), con, oracles[name])
        except AssertionError as ex:
            problems.append((name, f"MISMATCH {ex}"))
        except Exception as ex:  # noqa: BLE001
            problems.append((name, f"ORACLE-ERROR {type(ex).__name__}: {ex}"))
    print(
        f"boundary swept {len(names)} queries "
        f"({len(oracles)} oracled) at "
        + ("FULL sf, wide records" if BOUNDARY_WIDE
           else "FULL sf, adversarial unicode" if BOUNDARY_UNICODE
           else "FULL sf, events replayed (dupe keys)" if BOUNDARY_DUPES
           else "FULL sf, row order reversed" if BOUNDARY_REVERSE
           else "FULL sf, text-edges" if BOUNDARY_TEXT
           else "FULL sf, nulls-injected" if BOUNDARY_NULLS
           else f"{BOUNDARY_ROWS} rows/table x{BOUNDARY_CLONES} clones")
        + f" in {time.time() - t0:.0f}s"
    )
    for name, why in problems:
        print(f"PROBLEM {name}: {why}")
    if not problems:
        print(
            "ALL CLEAN WITH WIDE RECORDS" if BOUNDARY_WIDE
            else "ALL CLEAN WITH ADVERSARIAL UNICODE" if BOUNDARY_UNICODE
            else "ALL CLEAN WITH DUPLICATED EVENT KEYS" if BOUNDARY_DUPES
            else "ALL CLEAN WITH ROW ORDER REVERSED" if BOUNDARY_REVERSE
            else "ALL CLEAN WITH TEXT EDGES" if BOUNDARY_TEXT
            else "ALL CLEAN WITH NULLS INJECTED" if BOUNDARY_NULLS
            else f"ALL CLEAN AT {BOUNDARY_ROWS} ROWS/TABLE x{BOUNDARY_CLONES} CLONES"
        )
    spark.stop()
    shutil.rmtree(empty_dir, ignore_errors=True)
    return 1 if problems else 0


if __name__ == "__main__":
    raise SystemExit(main())
