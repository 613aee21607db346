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


class JdbcSyncStateRegistry:
    """Database-backed cursor registry — the literal reference shape: the
    reference keeps consumer cursors in a ChangeTrackingSyncState TABLE
    (sqls/setup-invoice-db.sql:121-126) and reads/advances them over its
    pooled connection. Same four-method interface as the file registry
    (read / advance / reset / list_consumers), so pull_batch, drain,
    poll_loop and consumer_lag take either interchangeably.

    Control-plane I/O: one-row reads and upserts through the JVM's
    java.sql over py4j — never a Spark job (a cursor update is not a
    distributed computation). PreparedStatements throughout, so consumer
    names are data, not SQL. Tested live against the embedded Derby that
    Spark ships (tests/test_sources.py / test_streaming.py); other JDBC
    backends work through the same four methods — table existence is
    probed with a portable SELECT (not a dialect-specific CREATE-failure
    SQLState), and credentialed servers pass user/password explicitly.

    Concurrency contract mirrors the file registry: one writer per
    consumer name (the reference's consumers are single-owner too);
    advance() re-reads inside the same connection and enforces the
    monotone-cursor rule."""

    _DDL = (
        "CREATE TABLE sync_state ("
        "sync_name VARCHAR(128) PRIMARY KEY, "
        "last_sync_version BIGINT, "
        "last_processed_id BIGINT, "
        "last_sync_time DOUBLE)"
    )

    def __init__(
        self,
        spark,
        url: str,
        driver: str,
        user: str | None = None,
        password: str | None = None,
    ):
        self._jvm = spark._jvm
        self.url = url
        self.driver = driver
        self._user = user
        self._password = password
        self._jvm.java.lang.Class.forName(driver)
        conn = self._connect()
        try:
            if not self._table_exists(conn):
                st = conn.createStatement()
                try:
                    st.executeUpdate(self._DDL)
                except Exception:  # noqa: BLE001 — create race: another
                    # process won between the probe and the CREATE; accept
                    # iff the table is now there, else it was a real error
                    if not self._table_exists(conn):
                        raise
                finally:
                    st.close()
        finally:
            conn.close()

    def _table_exists(self, conn) -> bool:
        """Portable existence probe: a zero-row SELECT succeeds on every
        dialect iff the table exists (no SQLState sniffing — Derby says
        X0Y32, Postgres 42P07, MySQL 1050...)."""
        st = conn.createStatement()
        try:
            st.executeQuery("SELECT sync_name FROM sync_state WHERE 1 = 0")
            return True
        except Exception:  # noqa: BLE001
            return False
        finally:
            st.close()

    def _connect(self):
        dm = self._jvm.java.sql.DriverManager
        if self._user is not None:
            return dm.getConnection(self.url, self._user, self._password or "")
        return dm.getConnection(self.url)

    def _select(self, conn, name: str):
        ps = conn.prepareStatement(
            "SELECT last_sync_version, last_processed_id, last_sync_time "
            "FROM sync_state WHERE sync_name = ?"
        )
        try:
            ps.setString(1, name)
            rs = ps.executeQuery()
            if rs.next():
                return SyncState(
                    name, int(rs.getLong(1)), int(rs.getLong(2)),
                    float(rs.getDouble(3)),
                )
            return None
        finally:
            ps.close()

    def _try_update(self, conn, state: SyncState) -> bool:
        up = conn.prepareStatement(
            "UPDATE sync_state SET last_sync_version = ?, "
            "last_processed_id = ?, last_sync_time = ? WHERE sync_name = ?"
        )
        try:
            up.setLong(1, state.last_sync_version)
            up.setLong(2, state.last_processed_id)
            up.setDouble(3, state.last_sync_time)
            up.setString(4, state.sync_name)
            return up.executeUpdate() > 0
        finally:
            up.close()

    def _upsert(self, conn, state: SyncState) -> None:
        """UPDATE, INSERT if absent, and on a duplicate-key loss retry
        the UPDATE once — the standard portable upsert fallback loop.
        advance() is single-writer by contract, but first-use
        auto-create (read() on a consumer no process has seen) is a
        legitimate multi-process entry point: two processes can race the
        INSERT, and the loser's duplicate-key failure just means the row
        now exists — so it must UPDATE, not propagate (ADVICE r4)."""
        if self._try_update(conn, state):
            return
        ins = conn.prepareStatement(
            "INSERT INTO sync_state VALUES (?, ?, ?, ?)"
        )
        try:
            ins.setString(1, state.sync_name)
            ins.setLong(2, state.last_sync_version)
            ins.setLong(3, state.last_processed_id)
            ins.setDouble(4, state.last_sync_time)
            ins.executeUpdate()
        except Exception:  # noqa: BLE001 — duplicate-key race: another
            # process inserted between our UPDATE and INSERT; the retry
            # UPDATE must now hit the row, else it was a real error
            if not self._try_update(conn, state):
                raise
        finally:
            ins.close()

    def read(self, name: str) -> SyncState:
        """Read a consumer's cursor; auto-create at (0, 0) on first use —
        the reference's SELECT-then-INSERT (invoice-api/server.js:108-125)."""
        conn = self._connect()
        try:
            found = self._select(conn, name)
            if found is not None:
                return found
            state = SyncState(sync_name=name)
            self._upsert(conn, state)
            return state
        finally:
            conn.close()

    def advance(self, name: str, version: int, last_id: int) -> SyncState:
        """Advance the cursor, monotone-guarded like the file registry."""
        conn = self._connect()
        try:
            cur = self._select(conn, name) or SyncState(sync_name=name)
            if (version, last_id) < (cur.last_sync_version, cur.last_processed_id):
                raise ValueError(
                    f"cursor rewind for {name}: ({version},{last_id}) < "
                    f"({cur.last_sync_version},{cur.last_processed_id}); "
                    "use reset()"
                )
            state = SyncState(name, version, last_id, time.time())
            self._upsert(conn, state)
            return state
        finally:
            conn.close()

    def reset(self, name: str) -> SyncState:
        conn = self._connect()
        try:
            state = SyncState(name, 0, 0, time.time())
            self._upsert(conn, state)
            return state
        finally:
            conn.close()

    def list_consumers(self) -> list[SyncState]:
        conn = self._connect()
        try:
            st = conn.createStatement()
            try:
                rs = st.executeQuery(
                    "SELECT sync_name, last_sync_version, last_processed_id, "
                    "last_sync_time FROM sync_state ORDER BY sync_name"
                )
                out = []
                while rs.next():
                    out.append(
                        SyncState(
                            rs.getString(1), int(rs.getLong(2)),
                            int(rs.getLong(3)), float(rs.getDouble(4)),
                        )
                    )
                return out
            finally:
                st.close()
        finally:
            conn.close()
