"""Persisted chunk-plan + status store (checkpoint/resume semantics).

The reference persists the chunk plan and per-chunk status in MySQL
meta tables (wait_sync_meta / full_sync_meta / data_compare_meta —
/root/reference/database/meta/meta.go:100-117) and resumes by re-running
only FAILED/WAITING chunks, refusing to resume when the persisted chunk
count no longer matches the plan
(/root/reference/module/migrate/sql/oracle/o2m/full.go:287-331).

Plans are tiny (n_chunks rows/table) and driver-owned, so the store is
a JSON file per task — the *data* path stays fully distributed.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass

WAITING, RUNNING, SUCCESS, FAILED = "WAITING", "RUNNING", "SUCCESS", "FAILED"


@dataclass
class ChunkState:
    table: str
    chunk_id: int
    lower: int
    upper: int
    predicate: str
    status: str = WAITING
    error: str = ""


class StateStore:
    def __init__(self, workdir: str, task: str):
        os.makedirs(workdir, exist_ok=True)
        self.path = os.path.join(workdir, f"{task}_sync_meta.json")
        self.error_log_path = os.path.join(workdir, f"{task}_error_log.jsonl")
        self._chunks: dict[tuple[str, int], ChunkState] = {}
        if os.path.exists(self.path):
            with open(self.path) as f:
                for row in json.load(f):
                    cs = ChunkState(**row)
                    self._chunks[(cs.table, cs.chunk_id)] = cs

    def init_table(self, table: str, chunks: list) -> list[ChunkState]:
        """Register a chunk plan; on resume, verify plan identity.

        Mirrors full.go:315-331 — resume only when the persisted plan is
        identical: same chunk count AND same per-chunk (lower, upper,
        predicate). A re-plan with equal count but shifted boundaries
        (source data changed between runs) discards the stale state
        instead of silently resuming it.
        """
        existing = sorted(
            (c for (t, _), c in self._chunks.items() if t == table),
            key=lambda c: c.chunk_id,
        )
        planned = sorted(chunks, key=lambda c: c.chunk_id)
        if (
            existing
            and len(existing) == len(planned)
            and all(
                e.chunk_id == p.chunk_id
                and e.lower == p.lower
                and e.upper == p.upper
                and e.predicate == p.predicate
                for e, p in zip(existing, planned)
            )
        ):
            return existing
        for t, cid in list(self._chunks):
            if t == table:
                del self._chunks[(t, cid)]
        out = []
        for ch in chunks:
            cs = ChunkState(table, ch.chunk_id, ch.lower, ch.upper, ch.predicate)
            self._chunks[(table, ch.chunk_id)] = cs
            out.append(cs)
        self._flush()
        return out

    def pending(self, table: str) -> list[ChunkState]:
        return sorted(
            (c for (t, _), c in self._chunks.items() if t == table and c.status != SUCCESS),
            key=lambda c: c.chunk_id,
        )

    def mark(self, table: str, chunk_id: int, status: str, error: str = "") -> None:
        cs = self._chunks[(table, chunk_id)]
        cs.status, cs.error = status, error
        self._flush()
        if status == FAILED:
            self._append_error(cs, error)

    def _append_error(self, cs: ChunkState, error: str) -> None:
        """error_log_detail analogue: every failure OCCURRENCE is kept
        (the chunk row only holds the latest), so post-mortems can see
        flapping chunks and whether a retry hit the same error
        (/root/reference/database/meta/meta.go:100-117 — the reference
        persists chunk_error_detail + error_log_detail as separate,
        append-only meta tables)."""
        import time

        entry = {
            "table": cs.table,
            "chunk_id": cs.chunk_id,
            "predicate": cs.predicate,
            "error": error,
            "ts": time.time(),
            "attempt": sum(
                1
                for e in self.error_log(cs.table)
                if e["chunk_id"] == cs.chunk_id
            )
            + 1,
        }
        with open(self.error_log_path, "a") as f:
            f.write(json.dumps(entry) + "\n")

    def error_log(self, table: str | None = None) -> list[dict]:
        """All failure occurrences (optionally for one table), oldest
        first — the queryable error-table surface."""
        if not os.path.exists(self.error_log_path):
            return []
        with open(self.error_log_path) as f:
            rows = [json.loads(line) for line in f if line.strip()]
        return [r for r in rows if table is None or r["table"] == table]

    def failed(self, table: str | None = None) -> list[ChunkState]:
        """Chunks currently in FAILED state — the retry-only-failed
        work list (narrower than pending(), which also includes
        never-run WAITING chunks)."""
        return sorted(
            (
                c
                for (t, _), c in self._chunks.items()
                if c.status == FAILED and (table is None or t == table)
            ),
            key=lambda c: (c.table, c.chunk_id),
        )

    def summary(self) -> dict[str, dict[str, int]]:
        """A10 — per-table success/failed rollup (full.go:548-619)."""
        out: dict[str, dict[str, int]] = {}
        for (t, _), c in self._chunks.items():
            out.setdefault(t, {}).setdefault(c.status, 0)
            out[t][c.status] += 1
        return out

    def _flush(self) -> None:
        with open(self.path, "w") as f:
            json.dump([asdict(c) for c in self._chunks.values()], f, indent=1)


class IncrSyncMeta:
    """Per-table incremental-apply SCN checkpoint TABLE — the
    incr_sync_meta twin of the reference's queryable meta store
    (/root/reference/database/meta/sync_meta_incr.go keeps one
    (schema, table, global_scn) row per synced table and advances it
    with an UPDATE after each successful apply round).

    Same durability discipline as StateStore (atomic tmp+rename swap)
    plus an fcntl write lock around the read-modify-write, so the
    max-wins merge stays correct even if a second writer ever appears
    (two concurrent streaming queries pointed at one workdir). Reads
    are always fresh from disk — the store is the source of truth, not
    a cached dict.

    Failure rows are append-only in a sibling error log (the
    error_log_detail stance): a failed transaction is PERSISTED, never
    silently dropped, and the caller advances each table's SCN only to
    its contiguous-success watermark so the failed txn replays."""

    def __init__(self, workdir: str, task: str):
        os.makedirs(workdir, exist_ok=True)
        self.path = os.path.join(workdir, f"{task}_incr_sync_meta.json")
        self.error_log_path = os.path.join(workdir, f"{task}_apply_error_log.jsonl")
        self._lock_path = self.path + ".lock"

    def _locked(self):
        import fcntl
        from contextlib import contextmanager

        @contextmanager
        def hold():
            with open(self._lock_path, "a") as lk:
                fcntl.flock(lk, fcntl.LOCK_EX)
                try:
                    yield
                finally:
                    fcntl.flock(lk, fcntl.LOCK_UN)

        return hold()

    def highs(self) -> dict[str, int]:
        """Fresh per-table SCN high-waters ({table: high_scn})."""
        if not os.path.exists(self.path):
            return {}
        with open(self.path) as fh:
            return {k: int(v) for k, v in json.load(fh).items()}

    def high(self, table: str) -> int:
        return self.highs().get(table, -1)

    def merge(self, highs: dict[str, int]) -> dict[str, int]:
        """Max-wins merge under the write lock: re-read inside the
        lock, take per-table max, atomic-swap. A replayed batch (or a
        concurrent writer's interleaved merge) can never regress a
        table's SCN. Returns the merged state."""
        with self._locked():
            cur = self.highs()
            for t, s in highs.items():
                cur[t] = max(int(s), cur.get(t, -1))
            tmp = self.path + ".tmp"
            with open(tmp, "w") as fh:
                json.dump(cur, fh)
            os.rename(tmp, self.path)
            return cur

    def record_errors(self, rows: list[dict]) -> None:
        """Append failed/quarantined apply-status rows (error_log_detail
        semantics — every occurrence kept, append-only)."""
        if not rows:
            return
        import time

        ts = time.time()
        with self._locked(), open(self.error_log_path, "a") as fh:
            for r in rows:
                fh.write(json.dumps({**r, "ts": ts}) + "\n")

    def errors(self, table: str | None = None) -> list[dict]:
        if not os.path.exists(self.error_log_path):
            return []
        with open(self.error_log_path) as fh:
            rows = [json.loads(line) for line in fh if line.strip()]
        return [r for r in rows if table is None or r.get("table_name") == table]

    def as_df(self, spark):
        """The checkpoint as a queryable relation (table_name,
        high_scn) — the SELECT surface the reference gets for free
        from its MySQL meta schema."""
        return spark.createDataFrame(
            sorted(self.highs().items()), "table_name string, high_scn long"
        )

    def errors_df(self, spark):
        """The append-only apply error log as a relation."""
        rows = [
            (
                r.get("table_name", ""),
                r.get("xid", ""),
                int(r.get("commit_scn", -1)),
                r.get("status", ""),
                r.get("error", ""),
                float(r.get("ts", 0.0)),
            )
            for r in self.errors()
        ]
        return spark.createDataFrame(
            rows,
            "table_name string, xid string, commit_scn long, "
            "status string, error string, ts double",
        )
