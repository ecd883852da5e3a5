"""Snapshot store: per-stage table commits + manifest for resume.

Models Iceberg's snapshot semantics on top of plain parquet so the
pipeline runs in this jar-less sandbox unchanged: each stage writes its
output table to ``<root>/<stage>/<snapshot_id>/`` and then atomically
records {stage → snapshot_id, row_count} in ``manifest.json``. A re-run
finds the committed snapshot and reads it instead of recomputing — the
"resume from the last committed snapshot" contract (north rule). On a
real deployment ``format="iceberg"`` + a catalog name makes each commit
an Iceberg snapshot and the manifest collapses into Iceberg's own
metadata; nothing downstream changes.

The write is made atomic the same way Iceberg's metadata swap is: data
lands under a snapshot directory first, the manifest pointer flips last
(os.replace on a temp file).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


class SnapshotStore:
    def __init__(self, root: str, fmt: str = "parquet"):
        self.root = root
        self.fmt = fmt
        os.makedirs(root, exist_ok=True)
        self.manifest_path = os.path.join(root, "manifest.json")

    # -- manifest ----------------------------------------------------------
    def _read_manifest(self) -> dict:
        if not os.path.exists(self.manifest_path):
            return {"stages": {}}
        with open(self.manifest_path) as f:
            return json.load(f)

    def _write_manifest(self, manifest: dict) -> None:
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=2, sort_keys=True)
        os.replace(tmp, self.manifest_path)  # atomic pointer flip

    def committed(self, stage: str) -> dict | None:
        return self._read_manifest()["stages"].get(stage)

    def invalidate(self, stage: str) -> None:
        m = self._read_manifest()
        m["stages"].pop(stage, None)
        self._write_manifest(m)

    # -- table IO ----------------------------------------------------------
    def path(self, stage: str, snapshot_id: str) -> str:
        return os.path.join(self.root, stage, snapshot_id)

    def commit(
        self,
        stage: str,
        df: DataFrame,
        partition_by: list[str] | None = None,
        bucket_by: tuple[int, str] | None = None,
    ) -> dict:
        """Write df as the new snapshot of <stage> and commit it.

        ``bucket_by=(n, col)`` emulates Iceberg's ``bucket(n, col)``
        partition transform (G5: hash-partition nodes/edges on canonical
        entity id) via an explicit pmod(hash) partition column — keeps
        co-located joins co-located on re-read.
        """
        from pyspark.sql import functions as F

        snapshot_id = uuid.uuid4().hex[:12]
        out = self.path(stage, snapshot_id)
        writer_df = df
        if bucket_by is not None:
            n, col = bucket_by
            writer_df = df.withColumn("bucket", F.pmod(F.xxhash64(col), F.lit(n)))
            partition_by = (partition_by or []) + ["bucket"]
        w = writer_df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.format(self.fmt).save(out)

        n_rows = df.sparkSession.read.format(self.fmt).load(out).count()
        m = self._read_manifest()
        entry = {
            "snapshot_id": snapshot_id,
            "path": out,
            "rows": n_rows,
        }
        m["stages"][stage] = entry
        # Iceberg-style snapshot log: every commit is retained (data dirs
        # are uuid-addressed and never overwritten), so any older
        # snapshot stays readable and the pointer can roll back to it.
        m.setdefault("history", {}).setdefault(stage, []).append(dict(entry))
        self._write_manifest(m)
        return entry

    def history(self, stage: str) -> list[dict]:
        """All committed snapshots of <stage>, oldest first."""
        return self._read_manifest().get("history", {}).get(stage, [])

    def rollback(self, stage: str, snapshot_id: str) -> dict:
        """Flip the stage pointer to an earlier snapshot (the Iceberg
        rollback semantic): subsequent loads/resumes read that snapshot.
        The newer snapshot's data stays on disk and in the history."""
        m = self._read_manifest()
        for entry in m.get("history", {}).get(stage, []):
            if entry["snapshot_id"] == snapshot_id:
                m["stages"][stage] = dict(entry)
                self._write_manifest(m)
                return dict(entry)
        raise KeyError(f"no snapshot {snapshot_id!r} for stage {stage!r}")

    def load(
        self,
        spark: SparkSession,
        stage: str,
        snapshot_id: str | None = None,
    ) -> DataFrame | None:
        """Read the current snapshot of <stage>, or time-travel to a
        specific ``snapshot_id`` from the history."""
        if snapshot_id is not None:
            info = next(
                (
                    e
                    for e in self.history(stage)
                    if e["snapshot_id"] == snapshot_id
                ),
                None,
            )
        else:
            info = self.committed(stage)
        if info is None:
            return None
        return spark.read.format(self.fmt).load(info["path"]).drop("bucket")
