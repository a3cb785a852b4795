"""Measure applyInPandasWithState vs transformWithStateInPandas on the
identical gap-sessionization fold over the sf0.1 events corpus, same
source shape as sessions_replay (parquet-file stream, one data batch)."""
import os, shutil, sys, tempfile, time, uuid
repo = sys.argv[1]
sys.path.insert(0, repo)
os.environ.setdefault("PYTHONPATH", repo)
import pandas as pd
from pyspark.sql import SparkSession, functions as F, types as T

spark = (
    SparkSession.builder.master("local[32]")
    .appName("ab-tws")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.driver.memory", "8g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
def _warm(batches):
    import numpy, pandas  # noqa
    yield from batches
spark.range(10_000).repartition(32).mapInPandas(_warm, "id long").write.format("noop").mode("overwrite").save()

sf = "/root/testdata/sf0.1"
from basenine_spark.sources.tables import load_table

GAP_MS = 30 * 60_000
IDLE_MS = 86_400 * 1000

ev = (
    load_table(spark, sf, "events")
    .filter(F.col("event_id").isNotNull() & F.col("ts_ms").isNotNull() & F.col("user_id").isNotNull())
    .select("user_id", "ts_ms")
    .orderBy("ts_ms", "user_id")
)
src_dir = tempfile.mkdtemp(prefix="tws_src_")
ev.coalesce(4).write.mode("overwrite").parquet(src_dir)
n_users = ev.select("user_id").distinct().count()
n_rows = ev.count()
print(f"rows={n_rows} users={n_users}", flush=True)

SESSION_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("session_start_ms", T.LongType()),
    T.StructField("session_end_ms", T.LongType()),
    T.StructField("n_events", T.LongType()),
])
STATE_SCHEMA = T.StructType([
    T.StructField("start_ms", T.LongType()),
    T.StructField("last_ms", T.LongType()),
    T.StructField("n", T.LongType()),
])

from basenine_spark.streaming.sessions import _session_fn
from basenine_spark.streaming.replay import _drain_stateful

def run_apws(tag):
    qname = f"apws_{uuid.uuid4().hex[:8]}"
    ck = tempfile.mkdtemp(prefix="tws_ck_")
    stream = spark.readStream.schema("user_id long, ts_ms long").parquet(src_dir)
    out = stream.groupBy("user_id").applyInPandasWithState(
        _session_fn(GAP_MS, IDLE_MS), SESSION_SCHEMA, STATE_SCHEMA, "append",
        __import__("pyspark.sql.streaming.state", fromlist=["GroupStateTimeout"]).GroupStateTimeout.ProcessingTimeTimeout,
    )
    t0 = time.perf_counter()
    sq = out.writeStream.format("memory").queryName(qname).outputMode("append").option("checkpointLocation", ck).start()
    try:
        _drain_stateful(sq, expected_rows=n_rows)
    finally:
        sq.stop()
    dt = time.perf_counter() - t0
    rows = spark.sql(f"SELECT * FROM {qname}").collect()
    shutil.rmtree(ck, ignore_errors=True)
    print(f"{tag} apws: {dt:.3f} closed={len(rows)}", flush=True)
    return sorted((r[0], r[1], r[2], r[3]) for r in rows)

def run_tws(tag):
    try:
        from pyspark.sql.streaming.stateful_processor import StatefulProcessor, StatefulProcessorHandle
    except Exception as e:
        print("tws unavailable:", e, flush=True)
        return None

    gap_ms, idle_ms = GAP_MS, IDLE_MS

    class SessionProc(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle):
            self.state = handle.getValueState("sess", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            closed = []
            ts = sorted(int(t) for pdf in rows for t in pdf["ts_ms"].tolist() if t is not None)
            if ts:
                if self.state.exists():
                    start, last, n = self.state.get()
                else:
                    start, last, n = ts[0], ts[0], 0
                    ts = ts[1:]
                    n = 1
                for t in ts:
                    if t - last > gap_ms:
                        closed.append((key[0], start, last, n))
                        start, n = t, 0
                    last = t
                    n += 1
                self.state.update((start, last, n))
            if closed:
                yield pd.DataFrame(closed, columns=["user_id", "session_start_ms", "session_end_ms", "n_events"])

        def close(self):
            pass

    qname = f"tws_{uuid.uuid4().hex[:8]}"
    ck = tempfile.mkdtemp(prefix="tws_ck_")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    stream = spark.readStream.schema("user_id long, ts_ms long").parquet(src_dir)
    out = stream.groupBy("user_id").transformWithStateInPandas(
        SessionProc(), outputStructType=SESSION_SCHEMA, outputMode="append", timeMode="none",
    )
    t0 = time.perf_counter()
    sq = out.writeStream.format("memory").queryName(qname).outputMode("append").option("checkpointLocation", ck).start()
    try:
        _drain_stateful(sq, expected_rows=n_rows)
    finally:
        sq.stop()
    dt = time.perf_counter() - t0
    rows = spark.sql(f"SELECT * FROM {qname}").collect()
    shutil.rmtree(ck, ignore_errors=True)
    spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    print(f"{tag} tws: {dt:.3f} closed={len(rows)}", flush=True)
    return sorted((r[0], r[1], r[2], r[3]) for r in rows)

a1 = run_apws("r0")
t1 = run_tws("r0")
a2 = run_apws("r1")
t2 = run_tws("r1")
if t1 is not None:
    print("outputs equal:", a1 == t1 == (t2 or t1), flush=True)
shutil.rmtree(src_dir, ignore_errors=True)
