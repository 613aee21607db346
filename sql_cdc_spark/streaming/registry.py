"""Multi-consumer offset registry — the ChangeTrackingSyncState table of
the reference (sqls/setup-invoice-db.sql:121-126; read/create
invoice-api/server.js:100-119; advance :231-249; reset :424-451).

Each named consumer owns a composite cursor ``(last_sync_version,
last_processed_id)`` plus a last-sync timestamp. State is one tiny record
per consumer — control-plane metadata, not data-plane — so it lives in a
JSON file per consumer written atomically (temp + rename). On a real
cluster this would be a Delta table updated via MERGE in foreachBatch, or
simply the streaming checkpoint; the registry exists for API parity
(named consumers, auto-create, reset) and for the batch pull loop.
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from dataclasses import dataclass


@dataclass
class SyncState:
    sync_name: str
    last_sync_version: int = 0
    last_processed_id: int = 0
    last_sync_time: float = 0.0


class SyncStateRegistry:
    """Named-consumer cursor store with auto-create-at-zero semantics."""

    def __init__(self, state_dir: str):
        self.state_dir = state_dir
        os.makedirs(state_dir, exist_ok=True)

    def _path(self, name: str) -> str:
        safe = "".join(c if c.isalnum() or c in "-_" else "_" for c in name)
        return os.path.join(self.state_dir, f"{safe}.json")

    def read(self, name: str) -> SyncState:
        """Read a consumer's cursor; auto-create at (0, 0) on first use
        (invoice-api/server.js:108-125)."""
        path = self._path(name)
        if not os.path.exists(path):
            state = SyncState(sync_name=name)
            self._write(state)
            return state
        with open(path) as f:
            d = json.load(f)
        return SyncState(
            sync_name=name,
            last_sync_version=d["last_sync_version"],
            last_processed_id=d["last_processed_id"],
            last_sync_time=d.get("last_sync_time", 0.0),
        )

    def advance(self, name: str, version: int, last_id: int) -> SyncState:
        """Advance the cursor — call ONLY after the sink succeeded
        (invoice-api/server.js:231 'if successCount > 0'). Monotonicity is
        enforced: a rewind here would re-deliver acknowledged documents."""
        cur = self.read(name)
        if (version, last_id) < (cur.last_sync_version, cur.last_processed_id):
            raise ValueError(
                f"cursor rewind for {name}: ({version},{last_id}) < "
                f"({cur.last_sync_version},{cur.last_processed_id}); use reset()"
            )
        state = SyncState(name, version, last_id, time.time())
        self._write(state)
        return state

    def reset(self, name: str) -> SyncState:
        """Rewind a consumer to version 0 (invoice-api/server.js:424-451)."""
        state = SyncState(name, 0, 0, time.time())
        self._write(state)
        return state

    def list_consumers(self) -> list[SyncState]:
        out = []
        for fn in sorted(os.listdir(self.state_dir)):
            if fn.endswith(".json"):
                with open(os.path.join(self.state_dir, fn)) as f:
                    d = json.load(f)
                out.append(
                    SyncState(
                        d.get("sync_name", fn[:-5]),
                        d["last_sync_version"],
                        d["last_processed_id"],
                        d.get("last_sync_time", 0.0),
                    )
                )
        return out

    def _write(self, state: SyncState) -> None:
        path = self._path(state.sync_name)
        fd, tmp = tempfile.mkstemp(dir=self.state_dir, suffix=".tmp")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(
                    {
                        "sync_name": state.sync_name,
                        "last_sync_version": state.last_sync_version,
                        "last_processed_id": state.last_processed_id,
                        "last_sync_time": state.last_sync_time,
                    },
                    f,
                )
            os.replace(tmp, path)  # atomic on POSIX
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
