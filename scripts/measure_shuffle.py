#!/usr/bin/env python
"""Measure shuffle bytes of a fresh index build (VERDICT r02 #6).

Runs build_index at $SPARK_GRAFT_SF_DIR with the Spark event log
enabled, then parses the log for per-stage shuffle write/read bytes and
prints one JSON line.  Usage:

    SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=8 python scripts/measure_shuffle.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    ev_dir = tempfile.mkdtemp(prefix="mdq_evlog_")
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "12g")

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.appName("mdq-shuffle-measure")
             .master(f"local[{cpus}]")
             .config("spark.sql.shuffle.partitions", str(cpus))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                     "16384")
             .config("spark.sql.parquet.compression.codec", "zstd")
             .config("spark.io.compression.codec",
                     os.environ.get("MDQ_IO_CODEC", "zstd"))
             .config("spark.eventLog.enabled", "true")
             .config("spark.eventLog.dir", ev_dir)
             .config("spark.eventLog.compress", "false")
             .config("spark.eventLog.rolling.enabled", "false")
             .config("spark.driver.memory",
                     os.environ["SPARK_GRAFT_DRIVER_MEM"])
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    from mdq_spark.session import ensure_worker_imports
    ensure_worker_imports(spark)
    from mdq_spark.ingest import docs_from_documents_table
    from mdq_spark.build import build_index

    idx = os.path.join(REPO, "_idx_cache",
                       f"shufmeasure_{os.path.basename(sf_dir)}")
    if os.path.exists(idx):
        shutil.rmtree(idx)
    docs = docs_from_documents_table(spark, sf_dir)
    t0 = time.time()
    manifest = build_index(spark, docs, idx)
    wall = time.time() - t0
    spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty()
    spark.stop()

    # parse the event log: per-stage shuffle write bytes + records
    stages = {}
    logs = []
    for root, _dirs, files in os.walk(ev_dir):
        logs += [os.path.join(root, f) for f in files
                 if "appstatus" not in f and not f.startswith(".")]
    for fn in logs:
        with open(fn, errors="ignore") as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if ev.get("Event") != "SparkListenerTaskEnd":
                    continue
                tm = ev.get("Task Metrics") or {}
                sw = tm.get("Shuffle Write Metrics") or {}
                sid = ev.get("Stage ID")
                st = stages.setdefault(sid, {"write_bytes": 0,
                                             "write_records": 0})
                st["write_bytes"] += sw.get("Shuffle Bytes Written", 0)
                st["write_records"] += sw.get("Shuffle Records Written", 0)
    shutil.rmtree(ev_dir, ignore_errors=True)
    top = sorted(stages.items(), key=lambda kv: -kv[1]["write_bytes"])[:6]
    out = {
        "sf": os.path.basename(sf_dir.rstrip("/")),
        "cpus": cpus,
        "build_wall_sec": round(wall, 2),
        "total_shuffle_write_mb": round(
            sum(s["write_bytes"] for s in stages.values()) / 1e6, 2),
        "total_shuffle_records": sum(
            s["write_records"] for s in stages.values()),
        "top_stages": [
            {"stage": sid, "mb": round(s["write_bytes"] / 1e6, 2),
             "records": s["write_records"]} for sid, s in top],
        "stage_secs": {s["stage"]: round(s["sec"], 2)
                       for s in manifest.get("stages", [])},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
