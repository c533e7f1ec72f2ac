"""IcebergStore — the Iceberg-backed twin of ``SnapshotStore``.

The north rule stores crawl state in Iceberg ("checkpoints frontier state
and Bloom shards to Iceberg snapshots", BASELINE.json:6). The sandbox has
no ``iceberg-spark-runtime`` jar offline (SURVEY.md §7 step 3 sanctions the
manifest-pinned-parquet fallback the engine ships with), so this class is
the swap-in: the SAME public surface as ``SnapshotStore`` — the engine
takes either via its ``store`` parameter — implemented on Iceberg
primitives:

  * ``stage_append`` / ``stage_overwrite`` → ``df.writeTo(tbl).append()`` /
    ``createOrReplace()``; each write's resulting **snapshot id** is
    recorded in the staged set.
  * ``commit(epoch)`` → ONE atomic append to the ``__epochs`` bookkeeping
    table of rows ``(epoch, table, snapshot_id, meta)``. That single append
    is the commit point: per-table snapshots written by a crashed epoch
    exist but are unreachable (no ``__epochs`` row pins them) — the same
    invisibility guarantee the manifest rename gives the parquet fallback.
  * ``load``/``preview`` → ``VERSION AS OF`` the pinned snapshot id
    (Iceberg time travel); ``last_epoch`` → max committed epoch row.

Cluster deployment: pass a SparkSession configured with e.g. ::

    .config("spark.sql.catalog.local", "org.apache.iceberg.spark.SparkCatalog")
    .config("spark.sql.catalog.local.type", "hadoop")
    .config("spark.sql.catalog.local.warehouse", "<warehouse dir>")
    .config("spark.jars.packages",
            "org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver>")

``IcebergStore.is_available(spark)`` reports whether the catalog is live;
tests exercise the contract when it is and skip (recording why) when not.
"""

from __future__ import annotations

import json
import threading

from pyspark.sql import DataFrame, SparkSession


class IcebergStore:
    """Same contract as ``SnapshotStore`` (see that class's docstring for
    the semantics the engine relies on): thread-safe staging, strictly
    ordered atomic epoch commits, snapshot-pinned reads, exact resume."""

    def __init__(self, spark: SparkSession, catalog: str = "local",
                 namespace: str = "mono"):
        self.spark = spark
        self.ns = f"{catalog}.{namespace}"
        self._staged: dict[str, dict] = {}  # table -> {"mode", "snapshots"}
        self._lock = threading.Lock()
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {self.ns}")
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {self.ns}.__epochs "
            "(epoch INT, tbl STRING, snapshot_id BIGINT, mode STRING, "
            "meta STRING) USING iceberg"
        )

    # -- availability ----------------------------------------------------------
    @staticmethod
    def is_available(spark: SparkSession, catalog: str = "local") -> bool:
        """True iff an Iceberg catalog named ``catalog`` is configured AND
        the runtime classes resolve (jar on the classpath)."""
        try:
            impl = spark.conf.get(f"spark.sql.catalog.{catalog}")
        except Exception:
            return False
        if not impl:
            return False
        try:
            spark.sql(f"SHOW NAMESPACES IN {catalog}").collect()
            return True
        except Exception:
            return False

    # -- internals -------------------------------------------------------------
    def _tbl(self, table: str) -> str:
        return f"{self.ns}.{table}"

    def _last_snapshot_id(self, table: str) -> int:
        """The table's CURRENT snapshot — read from the main branch ref, not
        by sorting the snapshots view: snapshot ids are random longs and
        ``committed_at`` has millisecond granularity, so two quick writes in
        the same millisecond would make an ORDER BY pick nondeterministically.
        The ``refs`` metadata table's ``main`` row is the authoritative
        current pointer."""
        row = self.spark.sql(
            f"SELECT snapshot_id FROM {self._tbl(table)}.refs "
            "WHERE name = 'main' AND type = 'BRANCH'"
        ).collect()
        if row:
            return int(row[0]["snapshot_id"])
        # branch ref missing (shouldn't happen after a write) — fall back to
        # the snapshots view, newest committed_at then highest sequence
        row = self.spark.sql(
            f"SELECT snapshot_id FROM {self._tbl(table)}.snapshots "
            "ORDER BY committed_at DESC, snapshot_id DESC LIMIT 1"
        ).collect()
        return int(row[0]["snapshot_id"])

    def _record(self, table: str, mode: str) -> None:
        snap = self._last_snapshot_id(table)
        with self._lock:
            if mode == "overwrite":
                self._staged[table] = {"mode": mode, "snapshots": [snap]}
            else:
                st = self._staged.setdefault(
                    table, {"mode": "append", "snapshots": []}
                )
                st["snapshots"].append(snap)

    def _committed(self) -> dict[int, dict[str, int]]:
        """epoch -> {table: pinned snapshot_id} from the __epochs table."""
        out: dict[int, dict[str, int]] = {}
        for r in self.spark.table(f"{self.ns}.__epochs").collect():
            out.setdefault(int(r["epoch"]), {})[r["tbl"]] = int(r["snapshot_id"])
        return out

    # -- staged writes (same signatures as SnapshotStore) ----------------------
    # On real Iceberg, SnapshotStore's payload-codec policy (uncompressed
    # parquet for binary-payload tables — see sources/store.py:_writer) maps
    # to the table property `write.parquet.compression-codec=uncompressed`,
    # set once at CREATE TABLE for fetched/bloom tables.
    def stage_append(self, table: str, df: DataFrame, epoch: int) -> None:
        # existence is checked explicitly (not try-append-except-create):
        # a genuine append failure on an existing table — schema drift, FS
        # error — must propagate as itself, not resurface as a confusing
        # "table already exists" from the create() fallback.
        tbl = self._tbl(table)
        if self.spark.catalog.tableExists(tbl):
            df.writeTo(tbl).append()
        else:
            df.writeTo(tbl).create()
        self._record(table, "append")

    def stage_overwrite(self, table: str, df: DataFrame, epoch: int) -> None:
        df.writeTo(self._tbl(table)).createOrReplace()
        self._record(table, "overwrite")

    def stage_append_local(self, table: str, rows: list[dict], schema, epoch: int) -> None:
        import pyarrow as pa

        pdf = pa.Table.from_pylist(rows, schema=schema).to_pandas()
        self.stage_append(table, self.spark.createDataFrame(pdf), epoch)

    def commit(self, epoch: int, meta: dict | None = None) -> None:
        """The atomic commit point: one append of this epoch's pin rows.

        Tables untouched this epoch inherit the previous epoch's pins, so
        every committed epoch row-set is a complete snapshot tuple.

        Idempotent per epoch: committing the same epoch again (e.g.
        ``reenqueue`` pins epoch N+1, then the resumed run's first flush
        commits N+1 too — SnapshotStore's manifest rename REPLACES, so the
        Iceberg twin must replace as well) first deletes that epoch's
        existing pin rows. The delete and the append are two snapshots, not
        one transaction — a kill in the gap leaves the epoch absent, so
        resume falls back to the previous complete epoch: the same
        invisibility guarantee, never a mixed row-set."""
        with self._lock:
            prev = self.last_epoch()
            if prev is not None and prev >= epoch:
                # re-commit of an existing epoch: replace its pin rows
                self.spark.sql(
                    f"DELETE FROM {self.ns}.__epochs WHERE epoch = {int(epoch)}"
                )
                prev = self.last_epoch()
            pins: dict[str, tuple[int, str]] = {}
            if prev is not None:
                for t, s in self._committed()[prev].items():
                    pins[t] = (s, "carry")
            for t, st in self._staged.items():
                pins[t] = (st["snapshots"][-1], st["mode"])
            rows = [
                (epoch, t, s, mode, json.dumps(meta or {}))
                for t, (s, mode) in sorted(pins.items())
            ]
            self.spark.createDataFrame(
                rows, "epoch int, tbl string, snapshot_id bigint, mode string, meta string"
            ).writeTo(f"{self.ns}.__epochs").append()
            self._staged = {}

    def abort(self) -> None:
        # staged snapshots stay in table history but are never pinned;
        # Iceberg's expire_snapshots maintenance reclaims them
        with self._lock:
            self._staged = {}

    # -- reads -----------------------------------------------------------------
    def last_epoch(self) -> int | None:
        rows = self.spark.sql(
            f"SELECT MAX(epoch) AS e FROM {self.ns}.__epochs"
        ).collect()
        return None if not rows or rows[0]["e"] is None else int(rows[0]["e"])

    def _read_pinned(self, table: str, snapshot_id: int) -> DataFrame:
        return self.spark.read.option("snapshot-id", snapshot_id).table(
            self._tbl(table)
        )

    def preview(self, spark: SparkSession, table: str) -> DataFrame | None:
        with self._lock:
            st = self._staged.get(table)
            if st is not None:
                return self._read_pinned(table, st["snapshots"][-1])
            last = self.last_epoch()
            if last is None:
                return None
            snap = self._committed().get(last, {}).get(table)
        return None if snap is None else self._read_pinned(table, snap)

    def load(self, spark: SparkSession, table: str, epoch: int | None = None) -> DataFrame | None:
        ep = self.last_epoch() if epoch is None else epoch
        if ep is None:
            return None
        snap = self._committed().get(ep, {}).get(table)
        return None if snap is None else self._read_pinned(table, snap)

    def meta(self, epoch: int | None = None) -> dict | None:
        ep = self.last_epoch() if epoch is None else epoch
        if ep is None:
            return None
        # ORDER BY tbl: deterministic row choice. All of an epoch's rows
        # carry the same meta json (commit() writes them together and is
        # idempotent per epoch), but a bare LIMIT 1 would still be an
        # unordered pick — make the contract visible in the query.
        row = self.spark.sql(
            f"SELECT meta FROM {self.ns}.__epochs WHERE epoch = {int(ep)} "
            "ORDER BY tbl LIMIT 1"
        ).collect()
        return json.loads(row[0]["meta"]) if row else None
