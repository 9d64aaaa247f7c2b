"""Host I/O + CPU calibration probe (r13).

Round 13 found bench totals moving 10-25% between sessions with ZERO
code change (write-heavy stages 2-4x), traced to host-level I/O drift:
an isolated A/B of the layout pipelines at two adjacent commits read
identical walls while both sat ~2x above the numbers the same code had
recorded hours earlier. This probe measures the host primitives the
bench leans on — sequential write throughput, small-file fsync latency
(the parquet commit path), file create/rename cost (the committer
path), and a CPU hash loop — so a bench number can be read against the
host state that produced it. Run it next to any bench you intend to
compare across sessions and record both in PERF.md.

Usage: python tools/host_probe.py [workdir]
Prints one JSON line; ~15 s. No Spark, no testdata dependency.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import sys
import tempfile
import time


def seq_write_mb_s(d: str, mb: int = 256) -> float:
    p = os.path.join(d, "seq.bin")
    buf = os.urandom(1 << 20)
    t0 = time.time()
    with open(p, "wb") as f:
        for _ in range(mb):
            f.write(buf)
        f.flush()
        os.fsync(f.fileno())
    dt = time.time() - t0
    os.unlink(p)
    return mb / dt


def fsync_ms(d: str, n: int = 100) -> float:
    t0 = time.time()
    for i in range(n):
        p = os.path.join(d, f"fs_{i}")
        with open(p, "wb") as f:
            f.write(b"x" * 1024)
            f.flush()
            os.fsync(f.fileno())
        os.unlink(p)
    return (time.time() - t0) * 1000 / n


def create_rename_ms(d: str, n: int = 500) -> float:
    """The FileOutputCommitter primitive: create a file, rename it."""
    t0 = time.time()
    for i in range(n):
        a = os.path.join(d, f"t_{i}")
        b = os.path.join(d, f"r_{i}")
        with open(a, "wb") as f:
            f.write(b"x" * 4096)
        os.rename(a, b)
        os.unlink(b)
    return (time.time() - t0) * 1000 / n


def cpu_hash_mb_s(mb: int = 512) -> float:
    buf = b"\xab" * (1 << 20)
    t0 = time.time()
    h = hashlib.sha256()
    for _ in range(mb):
        h.update(buf)
    return mb / (time.time() - t0)


def main() -> None:
    d = tempfile.mkdtemp(
        prefix="host_probe_", dir=sys.argv[1] if len(sys.argv) > 1 else None
    )
    try:
        out = {
            "seq_write_mb_s": round(seq_write_mb_s(d), 1),
            "fsync_ms": round(fsync_ms(d), 2),
            "create_rename_ms": round(create_rename_ms(d), 3),
            "cpu_sha256_mb_s": round(cpu_hash_mb_s(), 1),
            "workdir": d,
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
