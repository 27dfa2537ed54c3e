"""Scale probe: the streaming crawl sink's media dedup screen (r14).

Asserts its own invariants at two corpus sizes:

1. MERGE IDEMPOTENCE / SPLIT INVARIANCE: the (uri, kind) hash snapshot
   built from two half-batches through the sink's struct-max merge rule
   equals the one-shot batch hash table row for row — the property that
   makes the per-batch snapshot replay-safe.
2. GLOBAL-DERIVATION NECESSITY: drops derived from the FULL merged
   snapshot equal the batch twin, while drops derived per half-batch
   and unioned MISS the cross-batch duplicates (counted — the receipt
   for why the sink re-derives from the full snapshot every batch).
3. LINEAR HASH STATE: the hash snapshot is exactly one row per
   (uri, kind) at both scales — per-item state, never pairs.

Run: python tools/scale_probe_mediadedup.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402

from rippledb_spark.operators import audiohash as AH  # noqa: E402
from rippledb_spark.operators import imagehash as IH  # noqa: E402
from rippledb_spark.operators.imagehash import (  # noqa: E402
    near_dup_drops_by_kind,
)
from rippledb_spark.session import get_spark  # noqa: E402
from rippledb_spark.tables import load  # noqa: E402


def _hashes(sample):
    """The sink's hash stage over synthesized media (the batch form the
    certified query uses): mixed-format images + WAVs, kind-tagged."""
    img = IH.ahash_images(
        IH.synthesize_mixed_format_images(sample, "doc_id")
    ).withColumn("kind", F.lit("image"))
    aud = AH.audio_fingerprints(
        AH.synthesize_group_wavs(sample, "doc_id")
    ).withColumn("kind", F.lit("audio"))
    # fixed column order: the probe compares frames with positional
    # exceptAll, so every producer must agree
    return img.unionByName(aud).select(
        "media_id", "kind", "hash_hi", "hash_lo"
    )


def _merge(a, b):
    """The sink's snapshot ∪ batch struct-max merge."""
    return (
        a.unionByName(b)
        .groupBy("media_id", "kind")
        .agg(F.max(F.struct("hash_hi", "hash_lo")).alias("__h"))
        .select(
            "media_id",
            "kind",
            F.col("__h.hash_hi").alias("hash_hi"),
            F.col("__h.hash_lo").alias("hash_lo"),
        )
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="scale_probe_mediadedup")
    d = load(spark, sf_dir, "documents")
    for frac, label in ((0.5, "small"), (1.0, "full")):
        ids = d.select("doc_id").orderBy("doc_id")
        n = ids.count()
        take = int(n * frac)
        sample = ids.limit(take).localCheckpoint(eager=True)
        batch = _hashes(sample).localCheckpoint(eager=True)

        # 3. linear state: one row per (uri, kind)
        n_rows = batch.count()
        n_keys = batch.select("media_id", "kind").distinct().count()
        assert n_rows == n_keys, (n_rows, n_keys)
        assert n_rows <= 2 * take, (n_rows, take)

        # 1. split invariance: odd/even half-batches merged == one shot
        odd = _hashes(
            sample.where(F.col("doc_id") % 2 == 1).localCheckpoint(eager=True)
        )
        even = _hashes(
            sample.where(F.col("doc_id") % 2 == 0).localCheckpoint(eager=True)
        )
        merged = _merge(odd, even).localCheckpoint(eager=True)
        sym = merged.exceptAll(batch).count() + batch.exceptAll(merged).count()
        assert sym == 0, f"merge drift: {sym} rows differ"

        # 2. global derivation vs per-batch derivation
        full_drops = near_dup_drops_by_kind(
            merged, kinds=("image", "audio")
        ).localCheckpoint(eager=True)
        want_drops = near_dup_drops_by_kind(batch, kinds=("image", "audio"))
        sym2 = (
            full_drops.exceptAll(want_drops).count()
            + want_drops.exceptAll(full_drops).count()
        )
        assert sym2 == 0, f"full-snapshot drops != batch twin: {sym2}"
        per_batch = (
            near_dup_drops_by_kind(odd, kinds=("image", "audio"))
            .unionByName(near_dup_drops_by_kind(even, kinds=("image", "audio")))
            .distinct()
        )
        missed = full_drops.exceptAll(per_batch).count()
        # the planted corpus has cross-parity duplicates by construction,
        # so a naive per-batch derivation must miss some
        assert missed > 0, "probe corpus has no cross-batch duplicates"
        print(
            f"[{label}] items={take} hash_rows={n_rows} "
            f"drops={full_drops.count()} per_batch_missed={missed} "
            "merge==batch drops==twin OK"
        )
    print("scale_probe_mediadedup: all invariants hold")


if __name__ == "__main__":
    main()
