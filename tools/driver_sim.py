"""Local simulation of the driver's correctness gate.

Runs every ``queries()`` entry at sf0.01 in Spark and the matching
``oracle_sql()`` in DuckDB (tables pre-registered as views, as the
driver does), comparing row count, column names, and an
order-insensitive value hash with columns sorted by name.

Oracle results are fetched via ``.arrow()``, NOT ``fetchall()``
(VERDICT r7 item 2): the driver hashes Arrow-materialized values, so a
DuckDB HUGEINT (window ``SUM()`` over integers) surfaces as
``Decimal('3')`` where Spark emits bigint ``3`` — ``fetchall()``
silently coerces HUGEINT to Python int and hid exactly that class for
two rounds (the r6/r7 ``events_session_funnel`` red row). Any oracle
whose result schema contains a decimal column is additionally flagged
in the output (``oracle_decimal_cols``) — fix the SQL with
``CAST(... AS BIGINT)`` / ``... AS DOUBLE`` rather than widening the
Spark side.

Usage: python tools/driver_sim.py [--nulls-fuzz] [--docs-fuzz] [--emb-fuzz] [name ...]

``--nulls-fuzz`` (VERDICT r6 item 7) replays the same gate against a
NULL- and tie-injected variant of the events table: deterministic row
positions get NULL ``user_id``/``ts``/``event_id``/``value``/
``event_type``/``props``, and duplicated rows create same-millisecond
ties (with real and NULL tie-break ids). Any entry whose Spark plan
and DuckDB oracle disagree on NULL ordering (Spark: NULLS FIRST;
DuckDB: NULLS LAST), NULL group keys (Spark groupBy keeps them; JOIN
USING drops them), or tie resolution goes red HERE before the driver's
environment can find it.

``--docs-fuzz`` is the round-7 extension of the same discipline to the
documents table: NULL/empty/whitespace/unicode text, NULL lang/source,
and exact-duplicate rows (see ``make_docs_fuzz_dir``).  First catch:
``sample_mixture`` crashed sorting a NULL source key.

``--emb-fuzz`` is the round-8 extension to the embeddings table: NULL
embeddings, all-zero vectors, NULL labels, duplicate vectors (see
``make_emb_fuzz_dir``).  First catch: one zero-norm vector raised
ANSI DIVIDE_BY_ZERO through every cosine consumer, and NULL
embeddings crashed the numpy codebook/bucket paths.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("DRIVER_SIM_SF_DIR", "/root/testdata/sf0.01")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def make_nulls_fuzz_dir(src_dir: str, dest_dir: str) -> str:
    """Materialize a NULL/tie-injected twin of ``src_dir``: every table
    is symlinked except ``events``, which is rewritten with
    deterministic NULL injection and same-millisecond tie rows.
    Idempotent for a given (src, dest) pair."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(dest_dir, exist_ok=True)
    for t in TABLES:
        if t == "events":
            continue
        src = os.path.join(src_dir, f"{t}.parquet")
        dst = os.path.join(dest_dir, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(src, dst)

    tbl = pq.read_table(os.path.join(src_dir, "events.parquet"))
    cols = {name: tbl.column(name).to_pylist() for name in tbl.column_names}
    n = len(cols["event_id"])
    max_id = max(i for i in cols["event_id"] if i is not None)
    # deterministic NULL injection (coprime strides so combinations of
    # NULL columns also occur)
    for i in range(n):
        if i % 97 == 13:
            cols["user_id"][i] = None
        if i % 89 == 7:
            cols["ts"][i] = None
        if i % 83 == 11:
            cols["event_id"][i] = None
        if i % 101 == 29:
            cols["value"][i] = None
        if i % 103 == 31:
            cols["event_type"][i] = None
        if i % 107 == 37:
            cols["props"][i] = None
    # tie injection: duplicate rows keep (user_id, ts) and take either a
    # fresh id (real tie-break) or a NULL id (NULLS FIRST/LAST trap)
    next_id = max_id + 1
    appends: list[dict] = []
    for i in range(n):
        if i % 61 == 5:
            row = {k: cols[k][i] for k in cols}
            row["event_id"] = next_id
            next_id += 1
            appends.append(row)
        elif i % 149 == 19:
            row = {k: cols[k][i] for k in cols}
            row["event_id"] = None
            appends.append(row)
    for row in appends:
        for k in cols:
            cols[k].append(row[k])
    arrays = [
        pa.array(cols[f.name], type=f.type) for f in tbl.schema
    ]
    out = pa.Table.from_arrays(arrays, schema=tbl.schema)
    pq.write_table(out, os.path.join(dest_dir, "events.parquet"))
    return dest_dir


def make_docs_fuzz_dir(src_dir: str, dest_dir: str) -> str:
    """Materialize a degenerate-documents twin of ``src_dir``: every
    table is symlinked except ``documents``, which is rewritten with
    deterministic NULL / empty / whitespace / unicode / duplicate
    injection.  Any doc-derived oracle pair that disagrees on NULL
    text handling, empty-token splitting (``split`` keeps '' tokens in
    BOTH engines — an assumption worth pinning), multi-space runs,
    non-ASCII bytes in md5/xxhash inputs, or exact-dup multiplicity
    goes red HERE before the driver's data can find it."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(dest_dir, exist_ok=True)
    for t in TABLES:
        if t == "documents":
            continue
        src = os.path.join(src_dir, f"{t}.parquet")
        dst = os.path.join(dest_dir, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(src, dst)

    tbl = pq.read_table(os.path.join(src_dir, "documents.parquet"))
    cols = {name: tbl.column(name).to_pylist() for name in tbl.column_names}
    n = len(cols["doc_id"])
    max_id = max(i for i in cols["doc_id"] if i is not None)
    for i in range(n):
        if i % 41 == 3:
            cols["text"][i] = None
        elif i % 43 == 5:
            cols["text"][i] = ""
        elif i % 47 == 7:
            # double every space: '' tokens appear in the split
            cols["text"][i] = cols["text"][i].replace(" ", "  ")
        elif i % 53 == 11:
            cols["text"][i] = cols["text"][i] + " "
        elif i % 59 == 13:
            # non-ASCII bytes through md5/xxhash/token paths
            cols["text"][i] = "naïve Ωmega " + cols["text"][i] + " ωé"
        if i % 61 == 17:
            cols["lang"][i] = None
        if i % 67 == 19:
            cols["source"][i] = None
    # exact-duplicate injection: copies under fresh ids (multiplicity +
    # canonical-survivor traps for the dedup/datasheet family)
    next_id = max_id + 1
    appends: list[dict] = []
    for i in range(n):
        if i % 71 == 23:
            row = {k: cols[k][i] for k in cols}
            row["doc_id"] = next_id
            next_id += 1
            appends.append(row)
    # rounding-boundary plant (VERDICT r7 item 3): 1 stopword / 128
    # tokens → stop_ratio = 1/128 = 0.0078125, an EXACT half-way double
    # at 6 decimals. Spark round() (HALF_UP) says 0.007813, DuckDB
    # round() (banker's) says 0.007812 — any stop_ratio oracle pair
    # still using raw round() goes red HERE.
    boundary = {k: cols[k][0] for k in cols}
    boundary["doc_id"] = next_id
    next_id += 1
    boundary["text"] = "a " + " ".join(f"w{j}" for j in range(127))
    if "n_chars" in boundary:
        boundary["n_chars"] = len(boundary["text"])
    appends.append(boundary)
    for row in appends:
        for k in cols:
            cols[k].append(row[k])
    arrays = [pa.array(cols[f.name], type=f.type) for f in tbl.schema]
    out = pa.Table.from_arrays(arrays, schema=tbl.schema)
    pq.write_table(out, os.path.join(dest_dir, "documents.parquet"))
    return dest_dir


def make_emb_fuzz_dir(src_dir: str, dest_dir: str) -> str:
    """Materialize a degenerate-embeddings twin of ``src_dir``: every
    table is symlinked except ``embeddings``, which is rewritten with
    deterministic NULL embeddings, ALL-ZERO vectors (the div-by-zero
    cosine trap: Spark 0.0/0.0 = NaN — which sorts ABOVE every real
    similarity in a desc ranking — while DuckDB float division by zero
    yields NULL), NULL labels, and exact-duplicate vectors under fresh
    ids (cosine ties). Any embedding-derived oracle pair that disagrees
    on NaN-vs-NULL, NULL filtering, or tie ranking goes red HERE before
    the driver's data can find it."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(dest_dir, exist_ok=True)
    for t in TABLES:
        if t == "embeddings":
            continue
        src = os.path.join(src_dir, f"{t}.parquet")
        dst = os.path.join(dest_dir, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(src, dst)

    tbl = pq.read_table(os.path.join(src_dir, "embeddings.parquet"))
    cols = {name: tbl.column(name).to_pylist() for name in tbl.column_names}
    n = len(cols["vec_id"])
    max_id = max(i for i in cols["vec_id"] if i is not None)
    dim = next(len(e) for e in cols["embedding"] if e)
    for i in range(n):
        if i % 37 == 5:
            cols["embedding"][i] = None
        elif i % 41 == 7:
            cols["embedding"][i] = [0.0] * dim  # zero norm
        elif i % 59 == 17:
            cols["embedding"][i] = []  # present-but-empty list
        if i % 43 == 11:
            cols["label"][i] = None
    # Zero-norm the MIN-vec_id row too: it is kcenter_coreset's seed, so
    # this plant exercises the all-NULL-dmin degenerate path (ADVICE r8 —
    # the i%41 plants never landed on index 0, so the crash went unseen).
    seed_idx = min(
        (i for i in range(n) if cols["vec_id"][i] is not None),
        key=lambda i: cols["vec_id"][i],
    )
    cols["embedding"][seed_idx] = [0.0] * dim
    next_id = max_id + 1
    appends: list[dict] = []
    for i in range(n):
        if i % 53 == 13 and cols["embedding"][i] is not None:
            row = {k: cols[k][i] for k in cols}
            row["vec_id"] = next_id
            next_id += 1
            appends.append(row)
    for row in appends:
        for k in cols:
            cols[k].append(row[k])
    arrays = [pa.array(cols[f.name], type=f.type) for f in tbl.schema]
    out = pa.Table.from_arrays(arrays, schema=tbl.schema)
    pq.write_table(out, os.path.join(dest_dir, "embeddings.parquet"))
    return dest_dir


def value_hash(rows: list[tuple], cols: list[str]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted(
        json.dumps([repr(row[i]) for i in order]) for row in rows
    )
    return hashlib.sha256("\n".join(canon).encode()).hexdigest()[:16]


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    global SF_DIR
    argv = sys.argv[1:]
    if "--nulls-fuzz" in argv:
        argv.remove("--nulls-fuzz")
        import tempfile

        fuzz_dir = os.path.join(
            tempfile.gettempdir(),
            "nulls_fuzz_" + os.path.basename(SF_DIR.rstrip("/")),
        )
        SF_DIR = make_nulls_fuzz_dir(SF_DIR, fuzz_dir)
        print(f"nulls-fuzz: running against {SF_DIR}")
    if "--docs-fuzz" in argv:
        argv.remove("--docs-fuzz")
        import tempfile

        fuzz_dir = os.path.join(
            tempfile.gettempdir(),
            "docs_fuzz_" + os.path.basename(SF_DIR.rstrip("/")),
        )
        SF_DIR = make_docs_fuzz_dir(SF_DIR, fuzz_dir)
        print(f"docs-fuzz: running against {SF_DIR}")
    if "--emb-fuzz" in argv:
        argv.remove("--emb-fuzz")
        import tempfile

        fuzz_dir = os.path.join(
            tempfile.gettempdir(),
            "emb_fuzz_" + os.path.basename(SF_DIR.rstrip("/")),
        )
        SF_DIR = make_emb_fuzz_dir(SF_DIR, fuzz_dir)
        print(f"emb-fuzz: running against {SF_DIR}")

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    # Lint (VERDICT r9 item 4): no oracle may reach DuckDB with native
    # round() — it disagrees with the Spark-side stable_round FLOOR
    # idiom on half-way doubles (opposite directions for negatives).
    # registry._register rewrites round() at registration time, so a
    # hit here means the transformer was bypassed or regressed.
    import re as _re

    _raw_round = [
        n
        for n, s in oracles.items()
        if s and _re.search(r"(?<![A-Za-z0-9_])round\s*\(", s, _re.I)
    ]
    if _raw_round:
        print(
            "LINT FAIL: native round() in oracle SQL (use stable_round"
            " on the Spark side; registration floor-izes the oracle): "
            + ", ".join(sorted(_raw_round))
        )
        return 1

    only = set(argv)
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        rec: dict = {}
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            rec["spark_rows"] = len(srows)
        except Exception as e:
            rec["error"] = f"spark: {type(e).__name__}: {e}"
            results[name] = rec
            print(f"FAIL {name}: {rec['error'][:300]}")
            continue
        if name not in oracles:
            rec["check"] = "rows_only"
            results[name] = rec
            print(f"ok   {name}: rows-only, {len(srows)} rows")
            continue
        try:
            # Arrow fetch — the driver's representation. HUGEINT/DECIMAL
            # oracle columns materialize as decimal.Decimal here (they
            # would hash-diverge on the driver) instead of being coerced
            # to int by fetchall().
            atbl = con.sql(oracles[name]).arrow()
            ocols = atbl.column_names
            orows = [tuple(d.values()) for d in atbl.to_pylist()]
            import pyarrow as _pa

            dec_cols = [
                f.name for f in atbl.schema if _pa.types.is_decimal(f.type)
            ]
        except Exception as e:
            rec["error"] = f"duckdb: {type(e).__name__}: {e}"
            results[name] = rec
            print(f"FAIL {name}: {rec['error'][:300]}")
            continue
        rec["oracle_rows"] = len(orows)
        rec["rows_match"] = len(srows) == len(orows)
        rec["schema_match"] = sorted(scols) == sorted(ocols)
        if dec_cols:
            rec["oracle_decimal_cols"] = dec_cols
            print(
                f"WARN {name}: oracle emits decimal column(s) {dec_cols} "
                "— CAST them (driver hashes Arrow Decimal vs Spark int)"
            )
        sh = value_hash(srows, scols)
        oh = value_hash(orows, ocols)
        rec["hash_match"] = sh == oh
        results[name] = rec
        status = "ok  " if all(
            rec.get(k) for k in ("rows_match", "schema_match", "hash_match")
        ) else "FAIL"
        print(
            f"{status} {name}: rows {len(srows)}/{len(orows)} "
            f"schema={rec['schema_match']} hash={rec['hash_match']}"
        )
        if status == "FAIL" and rec["rows_match"] and not rec["hash_match"]:
            # show a sample diff to debug
            order_s = sorted(range(len(scols)), key=lambda i: scols[i])
            order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
            ss = sorted(json.dumps([repr(r[i]) for i in order_s]) for r in srows)
            oo = sorted(json.dumps([repr(r[i]) for i in order_o]) for r in orows)
            for a, b in zip(ss, oo):
                if a != b:
                    print(f"   spark : {a[:200]}\n   oracle: {b[:200]}")
                    break

    n_ok = sum(
        1
        for r in results.values()
        if r.get("check") == "rows_only"
        or all(r.get(k) for k in ("rows_match", "schema_match", "hash_match"))
    )
    print(f"\n{n_ok}/{len(results)} green")
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    raise SystemExit(main())
