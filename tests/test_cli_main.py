"""``python -m basenine_spark`` daemon surface: the reference server
binary's flags (server/server.go:33-39) — version, storage validation,
boot, serve over a real socket, graceful SIGTERM."""

import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_version_flag_prints_and_exits_zero():
    out = subprocess.run(
        [sys.executable, "-m", "basenine_spark", "-version"],
        cwd=REPO, capture_output=True, text=True, timeout=60,
    )
    assert out.returncode == 0
    from basenine_spark import __version__
    assert out.stdout.strip() == __version__


def test_unknown_storage_driver_rejected():
    out = subprocess.run(
        [sys.executable, "-m", "basenine_spark", "-storage", "exotic"],
        cwd=REPO, capture_output=True, text=True, timeout=60,
    )
    assert out.returncode == 2
    assert "Unknown storage driver" in out.stderr


def test_boot_serve_sigterm(tmp_path):
    """End-to-end: boot persistent on an ephemeral port, insert + query
    over the real wire protocol, SIGTERM for a clean exit."""
    proc = subprocess.Popen(
        [
            sys.executable, "-m", "basenine_spark",
            "-addr", "127.0.0.1", "-port", "0", "-persistent",
            "-storage-args", str(tmp_path / "store.db"),
            "-master", "local[2]",
        ],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        text=True,
    )
    try:
        line = ""
        deadline = time.time() + 120
        while time.time() < deadline:
            line = proc.stdout.readline()
            if "listening on" in line:
                break
        assert "listening on" in line, line
        port = int(line.split(" listening on ")[1].split()[0].rsplit(":", 1)[1])

        from basenine_spark.client import BasenineClient
        from basenine_spark import client as bn

        with BasenineClient("127.0.0.1", port) as c:
            c.insert(['{"kind": "a", "n": 1}', '{"kind": "b", "n": 2}'])
        deadline = time.time() + 60
        records = []
        while time.time() < deadline:
            records, _, _ = bn.fetch(
                "127.0.0.1", port, "latest", -1, 'kind == "a"', 10
            )
            if records:
                break
            time.sleep(0.5)
        assert len(records) == 1
        proc.send_signal(signal.SIGTERM)
        assert proc.wait(timeout=60) == 0
    finally:
        if proc.poll() is None:
            proc.kill()
