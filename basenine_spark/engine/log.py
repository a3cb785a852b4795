"""Durable append-only document log over partitioned Parquet.

Spark-first re-expression of the reference's storage layer
(``/root/reference/server/lib/storages/native.go``):

=============================  =======================================
reference                       here
=============================  =======================================
length-prefixed log writer      Parquet append (``native.go:313-333``)
``data_%09d.db`` partitions     ``part=N`` directory partitions
  (``native.go:951-964``)         (rotated by byte size)
offsets/partitionRefs index     Parquet file/row-group min-max stats
  (``native.go:66-81``)           on the ``seq`` column (free pruning)
gob core dump + restore         the log IS the state: ``seq`` max and
  (``native.go:155-258``)        partition sizes recovered by scanning
                                 footers at boot
2-partition retention           keep newest partitions whose total
  (``native.go:1049-1108``)      size ≤ limit/2 (``native.go:1207``),
                                 delete older; truncatedTimestamp =
                                 max event-time of dropped + 1
                                 (``native.go:986-1044``)
=============================  =======================================

Scale notes (100 TB): the ingest batch is filtered/redacted in an
Arrow-batched ``mapInPandas`` (embarrassingly parallel); contiguous id
assignment uses ``zipWithIndex`` (one count job, no shuffle, no driver
loop); queries read Parquet with ``seq`` range predicates that prune at
file level. The driver holds only counters, never records.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Iterator, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

LOG_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType(), False),
        T.StructField("id", T.StringType(), False),
        T.StructField("value", T.StringType(), False),
        T.StructField("doc_ts", T.LongType(), True),
        T.StructField("part", T.LongType(), False),
    ]
)


class DocumentLog:
    """One append-only JSON-document log rooted at ``path``."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self._count = 0  # next seq == number of records ever written
        self._removed = 0  # records dropped by retention (id space is NOT reused)
        self._part = 0  # current write partition
        self._part_ts: dict[int, int] = {}  # partition → max doc_ts
        self.truncated_timestamp = 0
        self.retention_bytes = 0
        if os.path.isdir(path) and self._has_data():
            self._restore()

    # -- persistence / restore (S8) ------------------------------------

    def _has_data(self) -> bool:
        for root, _dirs, files in os.walk(self.path):
            if any(f.endswith(".parquet") for f in files):
                return True
        return False

    def _restore(self) -> None:
        """Restart survival (``native.go:155-258``): all state is derived
        from parquet FOOTER metadata only — max seq, row counts and max
        event-times come from row-group statistics, so boot cost is
        O(files), never a corpus scan (at 100 TB a restart must not read
        the data).  Falls back to a columnar Spark scan only if some
        footer lacks statistics."""
        try:
            stats = self._footer_stats()
        except Exception:
            stats = None
        if stats is None:  # stats-less writer produced this log
            df = self.scan()
            agg = df.groupBy("part").agg(
                F.max("seq").alias("max_seq"),
                F.max("doc_ts").alias("max_ts"),
                F.count(F.lit(1)).alias("n"),
            ).collect()
            stats = {
                r["part"]: (r["max_seq"], r["max_ts"], r["n"]) for r in agg
            }
        if not stats:
            return
        self._count = max(s[0] for s in stats.values()) + 1
        self._part = max(stats)
        self._part_ts = {
            p: s[1] for p, s in stats.items() if s[1] is not None
        }
        live = sum(s[2] for s in stats.values())
        self._removed = self._count - live  # retention-dropped before restart

    def _footer_stats(self) -> Optional[dict]:
        """{part: (max_seq, max_doc_ts, rows)} from parquet footers, or
        None when any column chunk lacks min/max statistics."""
        import glob

        import pyarrow.parquet as pq

        out: dict[int, list] = {}
        for part in self._live_parts():
            agg = [None, None, 0]
            for fp in glob.glob(
                os.path.join(self.path, f"part={part}", "*.parquet")
            ):
                md = pq.ParquetFile(fp).metadata
                # key by full path: a shredded doc field named "seq"
                # would otherwise shadow the top-level column
                idx = {
                    md.schema.column(i).path: i
                    for i in range(md.num_columns)
                }
                for rg in range(md.num_row_groups):
                    row_group = md.row_group(rg)
                    agg[2] += row_group.num_rows
                    seq_st = row_group.column(idx["seq"]).statistics
                    if seq_st is None or not seq_st.has_min_max:
                        return None
                    agg[0] = (
                        seq_st.max
                        if agg[0] is None
                        else max(agg[0], seq_st.max)
                    )
                    ts_st = row_group.column(idx["doc_ts"]).statistics
                    if ts_st is not None and ts_st.has_min_max and ts_st.max is not None:
                        agg[1] = (
                            ts_st.max
                            if agg[1] is None
                            else max(agg[1], ts_st.max)
                        )
            if agg[0] is not None:
                out[part] = agg
        return {p: tuple(v) for p, v in out.items()}

    # -- append (S1/S2/S3/S4) ------------------------------------------

    def append(
        self,
        lines: list[str],
        insertion_filter_text: str = "",
        shred_schema: Optional[T.StructType] = None,
    ) -> list[str]:
        """Ingest of one wire batch: validate → insertion filter
        (+redact) → contiguous id assignment → Parquet append.

        A wire batch is DRIVER-RESIDENT by construction (the server
        holds what it read off the socket), and validation already
        parses every line on the driver — so batches up to
        ``BN_DRIVER_STAMP_MAX`` lines (default 65536) are filtered and
        stamped in that same driver pass and written with ONE Spark job
        (optimization guide §1.2/§4: the per-record work is microseconds
        of json round-trip; the old 3-job pickled-RDD pipeline was pure
        scheduling overhead at wire batch sizes). Larger batches keep
        the distributed path: per-record work in executors, the driver
        advancing only the sequence counter (``native.go:302``).
        Invalid JSON anywhere in the batch fails the whole batch before
        any id is assigned (all-or-none; a bad line must not orphan ids
        — see ADVICE r1). Both paths produce byte-identical rows: same
        json round-trip normalization, same id injection, same doc_ts
        extraction."""
        if not lines:
            return []
        max_driver = int(os.environ.get("BN_DRIVER_STAMP_MAX", "65536"))
        if len(lines) <= max_driver:
            return self._append_driver(
                lines, insertion_filter_text, shred_schema
            )
        for line in lines:  # cheap driver-side validation, all-or-none
            json.loads(line)

        sc = self.spark.sparkContext
        n_slices = min(len(lines), sc.defaultParallelism)
        rdd = sc.parallelize(lines, n_slices)

        if insertion_filter_text:
            flt_text = insertion_filter_text

            def apply_filter(part: Iterator[str]) -> Iterator[str]:
                from ..bfl import parse as _parse
                from ..bfl.pyeval import eval_query as _eval

                parsed = _parse(flt_text)
                for line in part:
                    truth, doc = _eval(parsed, line)
                    if truth:
                        yield doc

            rdd = rdd.mapPartitions(apply_filter)

        base = self._count
        rdd = rdd.cache()  # zipWithIndex triggers a count job; reuse it
        written = rdd.count()
        with_idx = rdd.zipWithIndex()  # contiguous, order-stable, no shuffle

        def stamp(pairs: Iterator[tuple]) -> Iterator[tuple]:
            import json as _json

            for doc, idx in pairs:
                seq = base + idx
                obj = _json.loads(doc)
                rid = "%024d" % seq
                obj["id"] = rid
                ts = obj.get("timestamp")
                doc_ts = int(ts) if isinstance(ts, (int, float)) and not isinstance(ts, bool) else None
                yield (
                    seq,
                    rid,
                    _json.dumps(obj, separators=(",", ":")),
                    doc_ts,
                )

        part = self._part
        rows = with_idx.mapPartitions(stamp).map(lambda r: r + (part,))
        df = self.spark.createDataFrame(rows, LOG_SCHEMA)
        if shred_schema is not None and shred_schema.fields:
            # Shredded storage: parse ONCE at ingest into a typed struct
            # column, so queries read real parquet columns (row-group
            # pruning + nested predicate pushdown) instead of running
            # from_json over the corpus.  The raw ``value`` stays the
            # record of truth for the exact row backend.
            df = df.withColumn(
                "doc", F.from_json(F.col("value"), shred_schema)
            )
        if written:
            df.write.mode("append").partitionBy("part").parquet(self.path)
        rdd.unpersist()

        ids = ["%024d" % (base + i) for i in range(written)]
        self._count = base + written
        if written and self.retention_bytes > 0:
            # event-time bookkeeping is only needed for truncatedTimestamp
            self._refresh_part_ts(part)
        self._maybe_rotate()
        return ids

    def _append_driver(
        self,
        lines: list[str],
        insertion_filter_text: str = "",
        shred_schema: Optional[T.StructType] = None,
    ) -> list[str]:
        """Driver-pass stamp + one-job write for wire-sized batches.

        Semantics identical to the distributed path: ``json.loads`` of
        every line first (all-or-none ValueError before any id), the
        same BFL ``eval_query`` per line for the insertion filter
        (+redact), the same loads → inject ``id`` → compact-dumps
        normalization of the stored ``value``, the same ``timestamp``
        → ``doc_ts`` extraction. The batch lands as ONE parquet file
        (vs one per task slice) — fewer files per micro-batch is the
        guide-§6 layout the ``compact()`` maintenance op otherwise has
        to repair."""
        objs = [json.loads(line) for line in lines]  # all-or-none
        if insertion_filter_text:
            from ..bfl import parse as _parse
            from ..bfl.pyeval import eval_query as _eval

            parsed = _parse(insertion_filter_text)
            survivors = []
            for line in lines:
                truth, doc = _eval(parsed, line)
                if truth:
                    survivors.append(json.loads(doc))
            objs = survivors

        base = self._count
        written = len(objs)
        seqs: list[int] = []
        rids: list[str] = []
        values: list[str] = []
        doc_tss: list[Optional[int]] = []
        for i, obj in enumerate(objs):
            seq = base + i
            rid = "%024d" % seq
            obj["id"] = rid
            ts = obj.get("timestamp")
            doc_tss.append(
                int(ts)
                if isinstance(ts, (int, float)) and not isinstance(ts, bool)
                else None
            )
            seqs.append(seq)
            rids.append(rid)
            values.append(json.dumps(obj, separators=(",", ":")))

        if written:
            import pyarrow as pa

            part = self._part
            tbl = pa.table(
                {
                    "seq": pa.array(seqs, pa.int64()),
                    "id": pa.array(rids, pa.string()),
                    "value": pa.array(values, pa.string()),
                    "doc_ts": pa.array(doc_tss, pa.int64()),
                    "part": pa.array([part] * written, pa.int64()),
                }
            )
            out = self.spark.createDataFrame(tbl).coalesce(1)
            if shred_schema is not None and shred_schema.fields:
                out = out.withColumn(
                    "doc", F.from_json(F.col("value"), shred_schema)
                )
            out.write.mode("append").partitionBy("part").parquet(self.path)

        ids = ["%024d" % (base + i) for i in range(written)]
        self._count = base + written
        if written and self.retention_bytes > 0:
            self._refresh_part_ts(self._part)
        self._maybe_rotate()
        return ids

    def append_df(
        self,
        df,
        insertion_filter_text: str = "",
        shred_schema: Optional[T.StructType] = None,
        prevalidated: bool = False,
    ) -> int:
        """Bulk distributed ingest: ``df`` holds ONE string column of
        JSON lines — the backfill shape, where the corpus is already
        in cluster storage and must never materialize on the driver
        (:meth:`append` is the wire-protocol shape: the server holds
        the batch it just read off the socket).

        Same validate → insertion filter (+redact) → contiguous-id →
        Parquet-append pipeline as :meth:`append`, with the driver
        touching only the sequence counter: validation is an
        executor-side parse inside the count job (all-or-none — a
        malformed line fails the job before any id is assigned or row
        written), ids follow the DataFrame's partition order
        (``zipWithIndex`` — order-stable, no shuffle), and only the
        COUNT returns (a 100-TB backfill has no use for a driver-side
        id list; the ids are ``base..base+written-1`` by contract).

        ``prevalidated=True`` means the caller already validated every
        line JVM-side AND applied any insertion filter as a Column
        predicate (the pure-filter fast path in
        ``BasenineDB._bulk_filter_column``) — the per-line Python
        validation parse is skipped; only the id-stamping stage runs
        in Python.

        Dataflow (optimization guide §4: Arrow batches, never pickled
        rows): the lines DataFrame gains its physical partition id as
        a column, the validation/filter stage is an Arrow
        ``mapInPandas`` pass, one tiny JVM aggregation turns
        per-partition survivor counts into contiguous id offsets, and
        a second Arrow pass stamps ``(seq, id, value, doc_ts)`` and
        feeds the parquet append directly — two jobs total, no
        ``df.rdd`` pickling anywhere. Ids still follow the
        DataFrame's partition order (offsets are the prefix sums the
        old ``zipWithIndex`` computed)."""
        col0 = df.columns[0]
        work = df.select(F.col(col0).alias("value")).withColumn(
            "_pid", F.spark_partition_id()
        )

        if insertion_filter_text:
            flt_text = insertion_filter_text

            def apply_filter(batches):
                import pandas as pd

                from ..bfl import parse as _parse
                from ..bfl.pyeval import eval_query as _eval

                parsed = _parse(flt_text)
                for b in batches:
                    vals: list[str] = []
                    pids: list[int] = []
                    for line, pid in zip(b["value"], b["_pid"]):
                        # eval parses every line — malformed JSON
                        # raises here, in the count job, failing the
                        # batch before any id exists or file lands
                        truth, doc = _eval(parsed, line)
                        if truth:
                            vals.append(doc)
                            pids.append(pid)
                    yield pd.DataFrame({"value": vals, "_pid": pids})

            work = work.mapInPandas(apply_filter, "value string, _pid int")
        elif not prevalidated:

            def validate(batches):
                import json as _json

                for b in batches:
                    for line in b["value"]:
                        _json.loads(line)  # all-or-none, executor-side
                    yield b

            work = work.mapInPandas(validate, "value string, _pid int")

        base = self._count
        # MEMORY_AND_DISK, not MEMORY_ONLY: a backfill batch larger
        # than cluster memory must SPILL between the count/validation
        # job and the stamp+write job — an evicted MEMORY_ONLY
        # partition would silently recompute from the source (correct
        # but a second full read of a huge input)
        from pyspark import StorageLevel

        work = work.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            counts = {
                int(r["_pid"]): int(r["n"])
                for r in work.groupBy("_pid")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
            offsets: dict[int, int] = {}
            acc = base
            for p in sorted(counts):
                offsets[p] = acc
                acc += counts[p]
            written = acc - base

            if written:
                bc = self.spark.sparkContext.broadcast(offsets)
                part = self._part
                # file sizing (guide §6): the cached batch keeps its
                # full shuffle-partition fan-out (AQE does not coalesce
                # cached plans), which would leave one tiny parquet
                # file per partition and tax every later scan of the
                # log — pack ⌈written/target⌉ write tasks. Coalesce
                # BEFORE the Python stage: the Arrow conversion pays a
                # fixed cost per PARENT partition when many cached
                # blocks drain through one task's runner (measured
                # ~170 ms each), while a pre-coalesced stage streams
                # once. Coalesce concatenates parent partitions in
                # index order, so ids still follow the input order —
                # and the stamp guards that assumption loudly.
                n_files = max(
                    1,
                    -(-written // int(
                        os.environ.get("BN_INGEST_ROWS_PER_FILE", "32768")
                    )),
                )

                def stamp(batches):
                    import json as _json

                    import pandas as pd

                    cur_pid = None
                    seq = 0
                    seen: set[int] = set()
                    for b in batches:
                        if len(b) == 0:
                            continue
                        out_seq: list[int] = []
                        out_id: list[str] = []
                        out_val: list[str] = []
                        out_ts: list[Optional[int]] = []
                        for line, pid in zip(b["value"], b["_pid"]):
                            pid = int(pid)
                            if pid != cur_pid:
                                if pid in seen:
                                    raise RuntimeError(
                                        "coalesced stamp saw partition "
                                        f"{pid} twice — parent order "
                                        "not contiguous; id assignment "
                                        "would be wrong"
                                    )
                                seen.add(pid)
                                cur_pid = pid
                                seq = bc.value[pid]
                            obj = _json.loads(line)
                            rid = "%024d" % seq
                            obj["id"] = rid
                            ts = obj.get("timestamp")
                            out_ts.append(
                                int(ts)
                                if isinstance(ts, (int, float))
                                and not isinstance(ts, bool)
                                else None
                            )
                            out_seq.append(seq)
                            out_id.append(rid)
                            out_val.append(
                                _json.dumps(obj, separators=(",", ":"))
                            )
                            seq += 1
                        yield pd.DataFrame(
                            {
                                "seq": out_seq,
                                "id": out_id,
                                "value": out_val,
                                "doc_ts": out_ts,
                            }
                        )

                out = work.coalesce(n_files).mapInPandas(
                    stamp, "seq long, id string, value string, doc_ts long"
                ).withColumn("part", F.lit(part).cast("long"))
                if shred_schema is not None and shred_schema.fields:
                    out = out.withColumn(
                        "doc", F.from_json(F.col("value"), shred_schema)
                    )
                out.write.mode("append").partitionBy("part").parquet(
                    self.path
                )
        finally:
            work.unpersist()

        self._count = base + written
        if written and self.retention_bytes > 0:
            self._refresh_part_ts(part)
        self._maybe_rotate()
        return written

    def _refresh_part_ts(self, part: int) -> None:
        try:
            footer = (self._footer_stats() or {}).get(part)
        except Exception:
            footer = None
        if footer is not None:  # O(files), no job
            if footer[1] is not None:
                self._part_ts[part] = footer[1]
            return
        pdir = os.path.join(self.path, f"part={part}")
        df = self.spark.read.schema(
            T.StructType([f for f in LOG_SCHEMA.fields if f.name != "part"])
        ).parquet(pdir)
        row = df.agg(F.max("doc_ts").alias("t")).collect()[0]
        if row["t"] is not None:
            self._part_ts[part] = row["t"]

    # -- retention (S6/S7/M7) ------------------------------------------

    def set_retention_bytes(self, n: int) -> None:
        """/limit (M7): effective bound is n/2, matching the reference's
        two-half-partition scheme (``native.go:1207-1211``)."""
        self.retention_bytes = n
        self._maybe_rotate()

    def _part_size(self, part: int) -> int:
        pdir = os.path.join(self.path, f"part={part}")
        total = 0
        for root, _dirs, files in os.walk(pdir):
            total += sum(
                os.path.getsize(os.path.join(root, f))
                for f in files
                if f.endswith(".parquet")
            )
        return total

    def _live_parts(self) -> list[int]:
        if not os.path.isdir(self.path):
            return []
        return sorted(
            int(d.split("=", 1)[1])
            for d in os.listdir(self.path)
            if d.startswith("part=")
        )

    def _maybe_rotate(self) -> None:
        """Partition rotation + bounded retention (``native.go:1049-1108``):
        when the write partition exceeds limit/2, start a new one; keep at
        most two live partitions, deleting the oldest and recording
        ``truncatedTimestamp`` = max event-time of dropped data + 1
        (``native.go:986-1044``)."""
        if self.retention_bytes <= 0:
            return
        half = self.retention_bytes // 2
        if self._part_size(self._part) > half:
            self._part += 1
        parts = self._live_parts()
        while len(parts) > 2:  # ≤2 live partitions (native.go:1088-1105)
            oldest = parts[0]
            try:
                footer = (self._footer_stats() or {}).get(oldest)
            except Exception:
                footer = None
            if footer is not None:  # O(files): footer metadata only
                n, t = footer[2], footer[1]
            else:
                dropped = self.spark.read.schema(
                    T.StructType(
                        [f for f in LOG_SCHEMA.fields if f.name != "part"]
                    )
                ).parquet(os.path.join(self.path, f"part={oldest}"))
                row = dropped.agg(
                    F.count(F.lit(1)).alias("n"), F.max("doc_ts").alias("t")
                ).collect()[0]
                n, t = row["n"], row["t"]
            self._removed += n
            ts = t if t is not None else self._part_ts.get(oldest)
            if ts is not None:
                self.truncated_timestamp = int(ts) + 1
            shutil.rmtree(os.path.join(self.path, f"part={oldest}"))
            self._part_ts.pop(oldest, None)
            parts = self._live_parts()

    # -- read (S5) ------------------------------------------------------

    def scan(self) -> DataFrame:
        """The log as a DataFrame — Parquet scan with ``seq`` min/max
        pruning for id-range predicates."""
        return self.spark.read.schema(LOG_SCHEMA).parquet(self.path)

    # -- counters / ops -------------------------------------------------

    @property
    def total_written(self) -> int:
        """O(1) running total (the reference's ``numberOfWritten`` /
        ``total`` counters, ``native.go:397-401``) — never a table scan."""
        return self._count

    @property
    def live_count(self) -> int:
        return self._count - self._removed

    @property
    def last_id(self) -> str:
        return "%024d" % max(self._count - 1, 0)

    def compact(self, target_bytes: int = 128 * 1024 * 1024) -> int:
        """Rewrite each live partition into ~``target_bytes`` files.

        Micro-batch ingest (the tail/source path commits one file set
        per trigger) accumulates small parquet files; at scale that
        degrades every scan (footer-per-file overhead, tiny row
        groups).  Compaction is a maintenance operation the reference
        never needs (one growing log file per partition,
        ``native.go:951-964``) but a parquet log does.  Per partition:
        read → coalesce to ⌈size/target⌉ files → write to a temp dir →
        atomic directory swap.  All columns (including the shredded
        ``doc`` struct) pass through with the file's own schema; seq
        ordering, footer statistics and counters are unaffected.
        Returns the number of partitions rewritten."""
        import math

        rewritten = 0
        for part in self._live_parts():
            pdir = os.path.join(self.path, f"part={part}")
            n_files = sum(
                1 for f in os.listdir(pdir) if f.endswith(".parquet")
            )
            size = self._part_size(part)
            want = max(1, math.ceil(size / target_bytes))
            if n_files <= want:
                continue
            tmp = f"{pdir}.compact.tmp"
            old = f"{pdir}.compact.old"
            if os.path.isdir(tmp):
                shutil.rmtree(tmp)
            (
                self.spark.read.parquet(pdir)
                .coalesce(want)
                .write.mode("overwrite")
                .parquet(tmp)
            )
            os.rename(pdir, old)
            os.rename(tmp, pdir)
            shutil.rmtree(old)
            rewritten += 1
        return rewritten

    def flush(self) -> None:
        """Drop all records (``native.go:888-904``); id counter restarts
        like the reference (offsets reset)."""
        if os.path.isdir(self.path):
            shutil.rmtree(self.path)
        self._count = 0
        self._removed = 0
        self._part = 0
        self._part_ts = {}
        self.truncated_timestamp = 0
