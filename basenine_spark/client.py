"""Python client for the basenine wire protocol.

API parity with the reference Go client
(``/root/reference/client/go/client.go:62-453``): connect, insert
mode, query (streaming generator instead of Go channels), single,
fetch, validate, macro, insertion filter, limit, flush, reset.  Works
against :class:`basenine_spark.server.BasenineServer` or a reference
server — the dialect is identical.
"""

from __future__ import annotations

import json
import socket
from dataclasses import dataclass
from typing import Iterator, Optional

from .server import (
    CLOSE_CONNECTION,
    CMD_FETCH,
    CMD_FLUSH,
    CMD_INSERT,
    CMD_INSERTION_FILTER,
    CMD_LIMIT,
    CMD_MACRO,
    CMD_METADATA,
    CMD_QUERY,
    CMD_RESET,
    CMD_SINGLE,
    CMD_VALIDATE,
    _LineReader,
    _TIMEOUT,
)


def _escape_line_feed(query: str) -> str:
    """``escapeLineFeed`` (client.go): queries are one wire line."""
    return query.replace("\n", "\\n")


@dataclass
class WireFrame:
    """One line off the wire: either a record or a metadata frame."""

    record: Optional[str] = None
    metadata: Optional[dict] = None
    closed: bool = False


class BasenineClient:
    """One TCP connection (Go client ``Connection``, client.go:52-94)."""

    def __init__(self, host: str, port: int, timeout: float = 30.0):
        self.sock = socket.create_connection((host, port), timeout=timeout)
        self.reader = _LineReader(self.sock)
        self.timeout = timeout

    def close(self) -> None:
        try:
            self.sock.close()
        except OSError:
            pass

    def __enter__(self) -> "BasenineClient":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    # -- wire primitives ----------------------------------------------

    def send_text(self, text: str) -> None:
        self.sock.sendall((text + "\n").encode())

    def _read_line(self, timeout: Optional[float] = None) -> Optional[str]:
        line = self.reader.readline(
            timeout=self.timeout if timeout is None else timeout
        )
        if line is _TIMEOUT:
            raise TimeoutError("no line within timeout")
        return line

    def _frames(self, timeout: Optional[float] = None) -> Iterator[WireFrame]:
        while True:
            line = self._read_line(timeout)
            if line is None:
                return
            if line == CLOSE_CONNECTION:
                yield WireFrame(closed=True)
                return
            if line.startswith(CMD_METADATA + " "):
                yield WireFrame(
                    metadata=json.loads(line[len(CMD_METADATA) + 1 :])
                )
            else:
                yield WireFrame(record=line)

    # -- modes (one connection each, like the Go package functions) ----

    def insert(self, docs: list[str]) -> None:
        """INSERT mode: switch the connection then stream documents."""
        self.send_text(CMD_INSERT)
        for doc in docs:
            self.send_text(doc)

    def query(
        self, left_off: str, query: str
    ) -> Iterator[WireFrame]:
        """QUERY mode: unbounded stream of record/metadata frames.
        The caller decides when to stop consuming (close())."""
        self.send_text(CMD_QUERY)
        self.send_text(left_off)
        self.send_text(_escape_line_feed(query))
        return self._frames()


def single(host: str, port: int, record_id: int, query: str = "") -> str:
    with BasenineClient(host, port) as c:
        c.send_text(CMD_SINGLE)
        c.send_text(str(record_id))
        c.send_text(_escape_line_feed(query))
        line = c._read_line()
        if line is None:
            raise ConnectionError("server closed without a record")
        return line


def fetch(
    host: str,
    port: int,
    left_off: str,
    direction: int,
    query: str,
    limit: int,
    timeout: float = 30.0,
) -> tuple[list[str], Optional[dict], Optional[dict]]:
    """Returns (records, first_meta, last_meta) — client.go:164-246."""
    records: list[str] = []
    first_meta: Optional[dict] = None
    last_meta: Optional[dict] = None
    with BasenineClient(host, port, timeout=timeout) as c:
        c.send_text(CMD_FETCH)
        c.send_text(left_off)
        c.send_text(str(direction))
        c.send_text(_escape_line_feed(query))
        c.send_text(str(limit))
        for frame in c._frames():
            if frame.closed:
                break
            if frame.metadata is not None:
                if first_meta is None:
                    first_meta = frame.metadata
                last_meta = frame.metadata
            elif frame.record is not None:
                records.append(frame.record)
    return records, first_meta, last_meta


def validate(host: str, port: int, query: str) -> Optional[str]:
    """None when the query is valid, else the server's error text
    (client.go:249-285 returns err on non-OK)."""
    with BasenineClient(host, port) as c:
        c.send_text(CMD_VALIDATE)
        c.send_text(_escape_line_feed(query))
        line = c._read_line()
    return None if line == "OK" else line


def macro(host: str, port: int, name: str, expanded: str) -> Optional[str]:
    with BasenineClient(host, port) as c:
        c.send_text(CMD_MACRO)
        c.send_text(f"{name}~{expanded}")
        line = c._read_line()
    return None if line == "OK" else line


def insertion_filter(host: str, port: int, query: str) -> Optional[str]:
    with BasenineClient(host, port) as c:
        c.send_text(CMD_INSERTION_FILTER)
        c.send_text(_escape_line_feed(query))
        line = c._read_line()
    return None if line == "OK" else line


def limit(host: str, port: int, n: int) -> Optional[str]:
    with BasenineClient(host, port) as c:
        c.send_text(CMD_LIMIT)
        c.send_text(str(n))
        line = c._read_line()
    return None if line == "OK" else line


def flush(host: str, port: int) -> Optional[str]:
    with BasenineClient(host, port) as c:
        c.send_text(CMD_FLUSH)
        line = c._read_line()
    return None if line == "OK" else line


def reset(host: str, port: int) -> Optional[str]:
    with BasenineClient(host, port) as c:
        c.send_text(CMD_RESET)
        line = c._read_line()
    return None if line == "OK" else line
