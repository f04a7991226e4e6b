"""A/B the stage-2 batched drain against SQLite page-cache size.

The 10M-library rehearsal's stage-2 drain rate DECLINED 36k -> 6k rows/s
over the run (artifacts/library_10m_rehearsal_r04.log): the files/phash
UNIQUE-index B-trees receive keys in random order, and once they outgrow
SQLite's default ~2 MiB page cache every insert becomes a random
read-modify-write page miss. This driver measures the drain rate curve at
a given HVD_SQLITE_CACHE_MB so the fix (DedupeDB.init_connection pragmas)
is a recorded number, not a guess.

Usage: python artifacts/drain_pragma_ab.py [n_rows] [cache_mb]
  cache_mb 2 reproduces the old default-cache behavior.

Reference anchor: the reference's stage 2 shares the same schema and
insert order (/root/reference/src/hydrusvideodeduplicator/dedup.py:253-294)
and sets no pragmas either.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 3_000_000
CACHE_MB = sys.argv[2] if len(sys.argv) > 2 else "256"
FRAMES = 8
BATCH = 50_000
WINDOW = 250_000


def main():
    os.environ["HVD_SQLITE_CACHE_MB"] = CACHE_MB
    import hydrus_video_deduplicator_tpu.db.DedupeDB as DedupeDB

    workdir = tempfile.mkdtemp(prefix="drain_ab_")
    DedupeDB.set_db_dir(workdir)
    DedupeDB.create_db()
    db = DedupeDB.DedupeDb(DedupeDB.get_db_dir(), DedupeDB.get_db_name())
    db.init_connection()
    print(f"cache_mb={CACHE_MB} n_rows={N_ROWS} db={workdir}", flush=True)

    rng = np.random.default_rng(7)
    t0 = time.time()
    for i0 in range(0, N_ROWS, 100_000):
        b = min(100_000, N_ROWS - i0)
        raw = rng.integers(0, 256, (b, FRAMES * 32), dtype=np.uint8)
        rows = [
            (f"{i0 + k:016x}" + "00" * 24, raw[k].tobytes()) for k in range(b)
        ]
        db.conn.executemany(
            "INSERT OR REPLACE INTO phashed_file_queue (file_hash, phash) VALUES (?, ?)",
            rows,
        )
    db.commit()
    print(f"queue filled in {time.time() - t0:.1f}s", flush=True)

    done = 0
    t_start = time.time()
    t_win = t_start
    win_done = 0
    while True:
        n = db.drain_phashed_queue_batch(BATCH)
        if n == 0:
            break
        db.commit()
        done += n
        win_done += n
        if win_done >= WINDOW:
            now = time.time()
            print(
                f"  {done:>9d} rows: window {win_done / (now - t_win):7.0f} rows/s,"
                f" cumulative {done / (now - t_start):7.0f} rows/s",
                flush=True,
            )
            t_win = now
            win_done = 0
    total = time.time() - t_start
    print(
        f"RESULT cache_mb={CACHE_MB}: {done} rows drained in {total:.1f}s"
        f" ({done / total:.0f} rows/s)",
        flush=True,
    )
    db.close()
    import shutil

    shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
