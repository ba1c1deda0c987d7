"""Stage checkpoints with per-partition lineage + metrics, resumable.

BASELINE north_rule: "every stage checkpoints ... with per-partition
lineage and row/byte metrics so the pipeline is resumable mid-run."

Production target is Iceberg (`CREATE TABLE ... USING iceberg`,
``MERGE INTO`` for idempotency — SURVEY §2.1 S7/S11); the Iceberg runtime
jar is not available in this sandbox, so the same contract is implemented
on parquet directories plus an atomic JSON manifest:

- a stage directory ``<base>/<name>/data/*.parquet`` holds the rows;
- ``<base>/<name>/manifest.json`` is written LAST (tmp + rename) and is
  the commit marker — a stage without a readable manifest is incomplete
  and recomputed on resume;
- the manifest records schema, total rows, per-partition row counts,
  per-file byte sizes, parent stage names (lineage), and engine version.

Idempotent writes (the reference's ``ON CONFLICT DO NOTHING``,
/root/reference/database/db.py:65-70) are ``merge_append``: new rows are
anti-joined against existing keys before appending — re-running an ingest
of the same data is a no-op, verified by tests/test_ingest.py.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CheckpointManager:
    def __init__(self, spark: SparkSession, base_dir: str, run_id: str | None = None):
        self.spark = spark
        self.base = base_dir
        self.run_id = run_id or uuid.uuid4().hex[:12]
        os.makedirs(base_dir, exist_ok=True)

    # ------------------------------------------------------------ paths
    def _dir(self, name: str) -> str:
        return os.path.join(self.base, name)

    def _manifest_path(self, name: str) -> str:
        return os.path.join(self._dir(name), "manifest.json")

    def is_complete(self, name: str) -> bool:
        try:
            with open(self._manifest_path(name)) as f:
                return json.load(f).get("status") == "committed"
        except (OSError, json.JSONDecodeError):
            return False

    def manifest(self, name: str) -> dict:
        with open(self._manifest_path(name)) as f:
            return json.load(f)

    def _table_name(self, name: str) -> str:
        # readable prefix + collision-proof digest: sanitizing alone maps
        # distinct stage names ('a-b' vs 'a_b') to one identifier, and a
        # catalog hit on the WRONG stage would silently serve its rows
        import hashlib

        safe = "".join(c if c.isalnum() else "_" for c in name)[:32]
        digest = hashlib.md5(f"{self.base}\x00{name}".encode()).hexdigest()[:10]
        return f"ckpt_{safe}_{digest}"

    def read(self, name: str) -> DataFrame:
        """Read a committed stage. Bucketed stages come back THROUGH the
        catalog so the bucket spec survives into join planning — on a
        fresh session (resume) the table is re-registered over the
        existing files from the manifest's recorded spec, so the
        Exchange-free co-located join works across restarts, not just in
        the writing session."""
        data_dir = os.path.join(self._dir(name), "data")
        m = self.manifest(name) if self.is_complete(name) else {}
        spec = m.get("cluster_by")
        if not spec:
            return self.spark.read.parquet(data_dir)
        tbl = self._table_name(name)
        if not self.spark.catalog.tableExists(tbl):
            from pyspark.sql import types as T

            schema = T.StructType.fromJson(m["schema"])
            cols = ", ".join(
                f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields
            )
            self.spark.sql(
                f"CREATE TABLE {tbl} ({cols}) USING parquet "
                f"CLUSTERED BY (`{spec['col']}`) SORTED BY (`{spec['col']}`) "
                f"INTO {spec['buckets']} BUCKETS LOCATION '{data_dir}'"
            )
        return self.spark.table(tbl)

    # ------------------------------------------------------------ write
    def _collect_metrics(self, data_dir: str, df: DataFrame) -> dict:
        per_partition = [
            {"partition": int(r["_pid"]), "rows": int(r["rows"])}
            for r in df.groupBy(F.spark_partition_id().alias("_pid"))
            .agg(F.count(F.lit(1)).alias("rows"))
            .collect()
        ]
        files = []
        for root, _, names in os.walk(data_dir):
            for n in names:
                if n.endswith(".parquet"):
                    p = os.path.join(root, n)
                    files.append({"file": os.path.relpath(p, data_dir), "bytes": os.path.getsize(p)})
        return {
            "rows": sum(p["rows"] for p in per_partition),
            "partitions": sorted(per_partition, key=lambda p: p["partition"]),
            "files": sorted(files, key=lambda f: f["file"]),
            "bytes": sum(f["bytes"] for f in files),
        }

    def _commit(self, name: str, payload: dict) -> None:
        tmp = self._manifest_path(name) + f".tmp.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(payload, f, indent=2, sort_keys=True)
        os.replace(tmp, self._manifest_path(name))

    def _parent_fingerprint(self, parents: list[str] | None) -> dict:
        """Lineage fingerprint: parent row counts. A stage is stale (and
        recomputed on resume) if any parent grew since it committed —
        keeps incremental appends flowing downstream. Row count is a
        faithful version for merge_append stages (append-only, keyed);
        a no-op resume re-commits manifests without changing rows, which
        must NOT invalidate children."""
        fp = {}
        for p in parents or []:
            if self.is_complete(p):
                fp[p] = {"rows": self.manifest(p).get("rows")}
        return fp

    def write_stage(
        self,
        df: DataFrame,
        name: str,
        parents: list[str] | None = None,
        mode: str = "overwrite",
        cluster_by: tuple[str, int] | None = None,
    ) -> DataFrame:
        """Materialize a stage and commit its manifest; returns the
        re-read DataFrame (downstream stages read the checkpoint, so a
        resumed run is plan-identical to a fresh one).

        ``cluster_by=(col, n_buckets)``: land the stage bucketed+sorted
        by ``col`` (Iceberg's ``CLUSTERED BY`` on the parquet substitute)
        — the default layout for cell-keyed fact tables, so downstream
        cell-equi-joins between co-bucketed stages carry NO Exchange
        (tests/test_bucketed_join.py shape as the checkpoint default,
        VERDICT r4 #8). The spec is recorded in the manifest and
        re-registered on resume."""
        data_dir = os.path.join(self._dir(name), "data")
        if cluster_by is not None:
            col, n_buckets = cluster_by
            tbl = self._table_name(name)
            self.spark.sql(f"DROP TABLE IF EXISTS {tbl}")
            (
                df.write.mode(mode)
                .bucketBy(n_buckets, col)
                .sortBy(col)
                .option("path", data_dir)
                .saveAsTable(tbl)
            )
            out = self.spark.table(tbl)
        else:
            df.write.mode(mode).parquet(data_dir)
            out = self.spark.read.parquet(data_dir)
        metrics = self._collect_metrics(data_dir, out)
        self._commit(
            name,
            {
                "status": "committed",
                "stage": name,
                "run_id": self.run_id,
                "parents": parents or [],
                "parent_fingerprint": self._parent_fingerprint(parents),
                "schema": out.schema.jsonValue(),
                "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                **(
                    {"cluster_by": {"col": cluster_by[0], "buckets": cluster_by[1]}}
                    if cluster_by
                    else {}
                ),
                **metrics,
            },
        )
        return out

    def stage(
        self,
        name: str,
        build,
        parents: list[str] | None = None,
        cluster_by: tuple[str, int] | None = None,
    ) -> DataFrame:
        """Resume-aware stage: reuse the checkpoint if committed AND its
        parents are unchanged, else compute ``build()`` and commit."""
        if self.is_complete(name):
            m = self.manifest(name)
            if m.get("parent_fingerprint", {}) == self._parent_fingerprint(parents):
                return self.read(name)
        return self.write_stage(build(), name, parents=parents, cluster_by=cluster_by)

    def merge_upsert(
        self, df: DataFrame, name: str, key: str, parents: list[str] | None = None
    ) -> DataFrame:
        """Full Iceberg ``MERGE INTO`` semantics on the parquet
        substitute: WHEN MATCHED THEN UPDATE (incoming row wins), WHEN
        NOT MATCHED THEN INSERT. Crash safety (round-5 review): the
        manifest is demoted to ``status: swapping`` BEFORE the directory
        renames — a kill anywhere inside the swap leaves the stage
        not-complete, so a resumed ``stage()`` rebuilds instead of
        reading a dangling path, and the final manifest (written last)
        re-commits. A ``cluster_by`` layout recorded by a prior
        ``write_stage`` is preserved: the merged rows are re-written
        bucketed under the same spec and the catalog table re-registered
        (dropped first, never left stale over re-laid-out files).
        Contrast ``merge_append`` (ON CONFLICT DO NOTHING): there
        matched rows keep the EXISTING values."""
        import shutil

        incoming = df.dropDuplicates([key])
        data_dir = os.path.join(self._dir(name), "data")
        prev = self.manifest(name) if self.is_complete(name) else {}
        spec = prev.get("cluster_by")
        cluster_by = (spec["col"], spec["buckets"]) if spec else None
        if prev:
            kept = self.read(name).join(
                incoming.select(key), on=key, how="left_anti"
            )
            staging = data_dir + f".staging.{uuid.uuid4().hex[:8]}"
            kept.unionByName(incoming).write.mode("overwrite").parquet(staging)
            # demote the commit marker FIRST: from here until the final
            # _commit the stage is officially incomplete
            self._commit(name, {**prev, "status": "swapping"})
            self.spark.sql(f"DROP TABLE IF EXISTS {self._table_name(name)}")
            old = data_dir + f".old.{uuid.uuid4().hex[:8]}"
            os.rename(data_dir, old)
            if cluster_by:
                merged = self.spark.read.parquet(staging)
                col, n_buckets = cluster_by
                (
                    merged.write.mode("overwrite")
                    .bucketBy(n_buckets, col)
                    .sortBy(col)
                    .option("path", data_dir)
                    .saveAsTable(self._table_name(name))
                )
                shutil.rmtree(staging, ignore_errors=True)
            else:
                os.rename(staging, data_dir)
            shutil.rmtree(old, ignore_errors=True)
        else:
            incoming.write.mode("overwrite").parquet(data_dir)
        out = self.spark.read.parquet(data_dir)
        metrics = self._collect_metrics(data_dir, out)
        self._commit(
            name,
            {
                "status": "committed",
                "stage": name,
                "run_id": self.run_id,
                "parents": sorted(set((parents or []) + prev.get("parents", []))),
                "schema": out.schema.jsonValue(),
                "key": key,
                "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                **({"cluster_by": spec} if spec else {}),
                **metrics,
            },
        )
        # re-read through the manifest so a preserved bucket spec comes
        # back catalog-routed (bucketing survives into join planning)
        return self.read(name)

    def merge_append(self, df: DataFrame, name: str, key: str, parents: list[str] | None = None) -> DataFrame:
        """Idempotent keyed append (ON CONFLICT DO NOTHING / Iceberg
        MERGE WHEN NOT MATCHED THEN INSERT). Duplicate keys *within* the
        incoming batch are also collapsed (source dedup, SURVEY S4)."""
        incoming = df.dropDuplicates([key])
        data_dir = os.path.join(self._dir(name), "data")
        if self.is_complete(name):
            existing_keys = self.read(name).select(key)
            fresh = incoming.join(existing_keys, on=key, how="left_anti")
            fresh.write.mode("append").parquet(data_dir)
        else:
            incoming.write.mode("overwrite").parquet(data_dir)
        out = self.spark.read.parquet(data_dir)
        metrics = self._collect_metrics(data_dir, out)
        prev_parents = self.manifest(name).get("parents", []) if self.is_complete(name) else []
        self._commit(
            name,
            {
                "status": "committed",
                "stage": name,
                "run_id": self.run_id,
                "parents": sorted(set((parents or []) + prev_parents)),
                "schema": out.schema.jsonValue(),
                "key": key,
                "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                **metrics,
            },
        )
        return out
