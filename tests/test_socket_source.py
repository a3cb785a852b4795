"""INSERT-over-TCP custom streaming source (S1): lines sent over a real
socket arrive as records with contiguous injected ids."""

import json
import socket
import time


def test_socket_insert_source(spark, tmp_path):
    from basenine_spark.sources.socket_insert import BasenineSocketDataSource

    spark.dataSource.register(BasenineSocketDataSource)

    # port 0 → OS-assigned; but the reader lives inside Spark, so bind a
    # fixed ephemeral-range port here instead
    srv_probe = socket.socket()
    srv_probe.bind(("127.0.0.1", 0))
    port = srv_probe.getsockname()[1]
    srv_probe.close()

    df = (
        spark.readStream.format("basenine_socket")
        .option("host", "127.0.0.1")
        .option("port", port)
        .load()
    )
    sq = (
        df.writeStream.format("memory")
        .queryName("sock_rows")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        # let the reader bind, then INSERT like the reference client
        deadline = time.time() + 20
        conn = None
        while time.time() < deadline:
            try:
                conn = socket.create_connection(("127.0.0.1", port), timeout=1)
                break
            except OSError:
                time.sleep(0.2)
        assert conn is not None, "source never bound its port"
        with conn:
            for i in range(10):
                conn.sendall(
                    (json.dumps({"n": i, "kind": "a" if i % 2 else "b"}) + "\n").encode()
                )
            conn.sendall(b"this is not json\n")  # rejected, consumes no id
            for i in range(10, 15):
                conn.sendall((json.dumps({"n": i}) + "\n").encode())

        deadline = time.time() + 40
        rows = []
        while time.time() < deadline:
            rows = spark.sql("SELECT * FROM sock_rows ORDER BY seq").collect()
            if len(rows) >= 15:
                break
            time.sleep(0.3)
        assert len(rows) == 15
        assert [r["seq"] for r in rows] == list(range(15))
        assert [r["id"] for r in rows] == ["%024d" % i for i in range(15)]
        docs = [json.loads(r["value"]) for r in rows]
        assert [d["n"] for d in docs] == list(range(15))
        assert docs[0]["id"] == "%024d" % 0  # id injected into the doc
    finally:
        sq.stop()
