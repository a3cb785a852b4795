"""Custom Structured Streaming source: INSERT-over-TCP (S1).

The reference's INSERT mode is a long-lived TCP connection where every
line is one JSON document (``/root/reference/server/server.go:163-164``,
``server/lib/storages/native.go:266-334``). This module re-expresses it
as a **Spark 4 Python streaming data source**: a
``SimpleDataSourceStreamReader`` accepts connections on the driver,
buffers incoming lines, and serves them to micro-batches with the same
id semantics as the reference — a contiguous monotone sequence stamped
into each document as a 24-digit string (``native.go:302-311``).

Usage::

    spark.dataSource.register(BasenineSocketDataSource)
    df = (spark.readStream.format("basenine_socket")
          .option("host", "127.0.0.1").option("port", 9099).load())
    # df: seq long, id string, value string  — pipe through the BFL
    # filter / DocumentLog append in foreachBatch

Semantics & scale notes:

* The listener lives on the driver (``SimpleDataSourceStreamReader``
  reads driver-side) — matching the reference's single accept loop; the
  heavy per-record work (filter/redact/parse) happens in the
  *downstream* distributed plan, not here.
* Offsets are record sequence numbers; records between the last
  committed offset and the newest read are kept in a replay buffer so
  Spark can re-read an uncommitted range after a failure
  (``readBetweenOffsets``). ``commit()`` trims the buffer.
* Durability beyond the uncommitted window comes from appending to the
  :class:`~basenine_spark.engine.log.DocumentLog` in the sink, which is
  the reference's persistence model (write first, then serve).
"""

from __future__ import annotations

import json
import socket
import threading
from collections import deque
from typing import Iterator, Tuple

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader


class _LineCollector:
    """Driver-side TCP listener: accepts any number of INSERT
    connections, splits lines, validates JSON, queues documents."""

    def __init__(self, host: str, port: int):
        self.buf: deque[str] = deque()
        self.lock = threading.Lock()
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.sock.bind((host, port))
        self.sock.listen(8)
        self.port = self.sock.getsockname()[1]
        self._closed = False
        threading.Thread(target=self._accept_loop, daemon=True).start()

    def _accept_loop(self) -> None:
        while not self._closed:
            try:
                conn, _ = self.sock.accept()
            except OSError:
                return
            threading.Thread(
                target=self._read_conn, args=(conn,), daemon=True
            ).start()

    def _read_conn(self, conn: socket.socket) -> None:
        with conn, conn.makefile("r", encoding="utf-8", errors="replace") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                try:
                    json.loads(line)  # reject non-JSON (server_test.go:30)
                except ValueError:
                    continue
                with self.lock:
                    self.buf.append(line)

    def drain(self) -> list:
        with self.lock:
            out = list(self.buf)
            self.buf.clear()
        return out

    def close(self) -> None:
        self._closed = True
        try:
            self.sock.close()
        except OSError:
            pass


# Spark may instantiate the data source (and thus the reader) more than
# once per query — the listener must be a process-wide singleton per
# endpoint or the second bind fails.
_COLLECTORS: dict[tuple, _LineCollector] = {}
_COLLECTORS_LOCK = threading.Lock()


def _collector_for(host: str, port: int) -> _LineCollector:
    with _COLLECTORS_LOCK:
        c = _COLLECTORS.get((host, port))
        if c is None or c._closed:
            c = _LineCollector(host, port)
            _COLLECTORS[(host, port)] = c
        return c


class BasenineSocketStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        self._host = options.get("host", "127.0.0.1")
        self._port = int(options.get("port", 0))
        self._collector: _LineCollector | None = None
        # replay buffer: seq → stamped tuple, trimmed on commit
        self.replay: dict[int, Tuple] = {}

    @property
    def collector(self) -> _LineCollector:
        # LAZY bind: Spark instantiates the reader in more than one
        # Python process (planner + stream runner); only the runner —
        # the one that actually calls read() — may own the socket.
        if self._collector is None:
            self._collector = _collector_for(self._host, self._port)
        return self._collector

    def initialOffset(self) -> dict:
        return {"seq": 0}

    def _stamp(self, seq: int, line: str) -> Tuple:
        obj = json.loads(line)
        rid = "%024d" % seq
        obj["id"] = rid  # id injected into the doc (native.go:302-311)
        return (seq, rid, json.dumps(obj, separators=(",", ":")))

    def read(self, start: dict) -> Tuple[Iterator[Tuple], dict]:
        base = start["seq"]
        lines = self.collector.drain()
        rows = [self._stamp(base + i, line) for i, line in enumerate(lines)]
        for row in rows:
            self.replay[row[0]] = row
        return iter(rows), {"seq": base + len(rows)}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[Tuple]:
        return iter(
            self.replay[s] for s in range(start["seq"], end["seq"]) if s in self.replay
        )

    def commit(self, end: dict) -> None:
        for s in [s for s in self.replay if s < end["seq"]]:
            del self.replay[s]


class BasenineSocketDataSource(DataSource):
    """``format("basenine_socket")`` — the INSERT-mode TCP source."""

    @classmethod
    def name(cls) -> str:
        return "basenine_socket"

    def schema(self) -> str:
        return "seq long, id string, value string"

    def simpleStreamReader(self, schema) -> BasenineSocketStreamReader:
        return BasenineSocketStreamReader(self.options)
