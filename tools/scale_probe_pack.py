"""Scaling probe for the sharded sequence-packing window (perf tooling).

Question (VERDICT r03 item 1): does re-sharding the running-sum window
from `lang` to `(lang, md5-shard)` actually bound per-task work, and
does the op scale linearly in data? The probe builds 1×/4×/16× copies
of the sf0.1 documents table (disjoint doc_id ranges, same language
mix) and runs `pack_by_token_budget` at each scale, reporting wall
time, the MAX rows any single window partition holds (the serialization
metric the re-shard exists to bound), and that max's share of the
total — with shards, the dominant language's share per task stays
~1/(n_shards) of that language instead of 100% of it.

Run: python tools/scale_probe_pack.py   (writes one JSON line)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from rippledb_spark.operators.packing import hash_shard, pack_by_token_budget
from rippledb_spark.session import get_spark

SHARDS = 8


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="scale_probe_pack")
    base = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(
            "doc_id", "lang", F.size(F.split("text", " ")).cast("bigint").alias("n_tok")
        )
    )
    base.count()  # warm

    out = {}
    for mult in (1, 4, 16):
        df = base
        if mult > 1:
            copies = [
                base.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
                for i in range(mult)
            ]
            df = copies[0]
            for c in copies[1:]:
                df = df.unionByName(c)
        df = df.localCheckpoint(eager=True)  # isolate packing cost from the union

        t0 = time.perf_counter()
        packed = pack_by_token_budget(
            df, "n_tok", "doc_id", ["lang"], budget=256, n_shards=SHARDS
        )
        packed.write.format("noop").mode("overwrite").save()
        wall = round(time.perf_counter() - t0, 3)

        # rows per window partition — the quantity one task must sort+scan
        part_rows = (
            df.withColumn("shard", hash_shard(F.col("doc_id"), SHARDS))
            .groupBy("lang", "shard")
            .agg(F.count(F.lit(1)).alias("rows"))
        )
        stats = part_rows.agg(
            F.max("rows").alias("max_rows"), F.sum("rows").alias("total")
        ).first()
        # same input packed WITHOUT shards: the max partition is the
        # whole dominant language
        unsharded_max = (
            df.groupBy("lang").agg(F.count(F.lit(1)).alias("rows"))
            .agg(F.max("rows")).first()[0]
        )
        out[f"{mult}x"] = {
            "rows": stats["total"],
            "wall_s": wall,
            "max_window_rows_sharded": stats["max_rows"],
            "max_window_rows_unsharded": unsharded_max,
            "serial_fraction_sharded": round(stats["max_rows"] / stats["total"], 4),
            "serial_fraction_unsharded": round(unsharded_max / stats["total"], 4),
        }
        print(f"# {mult}x: {out[f'{mult}x']}", file=sys.stderr)

    print(json.dumps({"pack_scale_probe": out, "n_shards": SHARDS, "sf_dir": sf_dir}))
    spark.stop()


if __name__ == "__main__":
    main()
