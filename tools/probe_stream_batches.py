"""Measure micro-batch counts and per-batch duration breakdown for the
streaming band (VERDICT r11 item 6: state-store spin-up x partitions x
batches dominates the availableNow drains — how many batches does each
drain actually run, and where does the time go?).

Patches streams.drain to capture query.recentProgress before the
memory sink is dropped, then runs each named op once (cold) and once
warm, printing per-batch numInputRows + durationMs.

Usage: python tools/probe_stream_batches.py [op ...]  (default: the
stateful band)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    names = sys.argv[1:] or [
        "stream_dedup",
        "stream_session",
        "stream_stream_join",
        "stream_ewma",
        "stream_stateful",
        "stream_sliding",
        "stream_ingest_files",
    ]
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from shared_solar_data_warehouse_spark.registry import REGISTRY, load_all_ops
    from shared_solar_data_warehouse_spark.session import get_session
    from shared_solar_data_warehouse_spark.streaming import streams

    load_all_ops()
    spark = get_session("sswh-stream-probe")

    captured: list = []
    real_start = None

    # Wrap StreamingQuery.start capture via drain's writeStream: easiest
    # is to monkey-patch streams.drain with a recording twin.
    orig_drain = streams.drain

    def recording_drain(spark, sdf, mode="append"):
        name = f"sswh_mem_probe_{next(streams._COUNTER)}"
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        try:
            query = (
                sdf.writeStream.format("memory")
                .queryName(name)
                .outputMode(mode)
                .trigger(availableNow=True)
                .start()
            )
            query.awaitTermination()
            captured.append(query.recentProgress)
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
        return spark.table(name)

    streams.drain = recording_drain
    try:
        for op_name in names:
            if op_name not in REGISTRY:
                print(f"{op_name}: NOT REGISTERED")
                continue
            builder = REGISTRY[op_name].builder
            for label in ("cold", "warm"):
                captured.clear()
                t0 = time.time()
                df = builder(spark, sf)
                n = len(df.toPandas())
                wall = time.time() - t0
                batch_summary = []
                for prog_list in captured:
                    for p in prog_list:
                        d = p if isinstance(p, dict) else json.loads(p.json)
                        batch_summary.append(
                            {
                                "batchId": d.get("batchId"),
                                "rows": d.get("numInputRows"),
                                "durMs": d.get("durationMs"),
                                "stateRows": [
                                    so.get("numRowsTotal")
                                    for so in d.get("stateOperators") or []
                                ],
                            }
                        )
                print(f"{op_name} [{label}] wall={wall:.3f}s rows={n}")
                for b in batch_summary:
                    print(f"    {json.dumps(b)}")
    finally:
        streams.drain = orig_drain
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
