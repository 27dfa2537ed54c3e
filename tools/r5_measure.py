"""Round-5 scratch probe: measure approximation quality of the six
rows-only queries at a given sf so the self-verifying bounds are set from
data, not hope. Usage: python tools/r5_measure.py [sf_dir]"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from rippledb_spark.operators import dedup as DD
from rippledb_spark.operators import similarity as SIM
from rippledb_spark.session import get_spark
from rippledb_spark.tables import load


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(cores=8)
    d = load(spark, sf_dir, "documents")
    e = load(spark, sf_dir, "embeddings")

    # --- 1. minhash LSH recall vs exact ngram jaccard (threshold 0.1)
    exact = DD.ngram_jaccard_pairs(d, "text", "doc_id", 3, 0.1).select("id_a", "id_b")
    exact.cache()
    n_exact = exact.count()
    for bands in (8, 16):
        lsh = DD.minhash_lsh_pairs(
            d, "text", "doc_id", num_hashes=32, bands=bands, jaccard_threshold=0.1
        ).select("id_a", "id_b")
        lsh.cache()
        n_lsh = lsh.count()
        n_common = lsh.join(exact, ["id_a", "id_b"], "inner").count()
        n_extra = n_lsh - n_common
        print(
            f"minhash bands={bands}: exact={n_exact} lsh={n_lsh} common={n_common} "
            f"extra={n_extra} recall={n_common / max(n_exact, 1):.4f}"
        )
        lsh.unpersist()

    # jaccard distribution of exact pairs
    jd = DD.ngram_jaccard_pairs(d, "text", "doc_id", 3, 0.1)
    print("jaccard deciles:", jd.selectExpr(
        "percentile(jaccard, array(0.1,0.25,0.5,0.75,0.9,1.0)) as q").collect())

    # recall restricted to high-jaccard pairs
    hi = DD.ngram_jaccard_pairs(d, "text", "doc_id", 3, 0.5).select("id_a", "id_b")
    n_hi = hi.count()
    for bands in (8, 16):
        lsh = DD.minhash_lsh_pairs(
            d, "text", "doc_id", num_hashes=32, bands=bands, jaccard_threshold=0.1
        ).select("id_a", "id_b")
        n_hi_common = lsh.join(hi, ["id_a", "id_b"], "inner").count()
        print(f"minhash bands={bands} high(j>=0.5): exact={n_hi} found={n_hi_common}")

    # --- 2. simhash: blocked vs brute-force hamming, and coverage of hi pairs
    sigs = d.select(
        F.col("doc_id").alias("__id"),
        DD.simhash64(F.split(F.col("text"), " ")).alias("__sim"),
    ).cache()
    blocked = DD.simhash_pairs_from_sigs(sigs, max_hamming=12, block_bits=8, rotations=4)
    a = sigs.toDF("id_a", "sim_a")
    b = sigs.toDF("id_b", "sim_b")
    brute = (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= 12)
    )
    blocked.cache(); brute.cache()
    n_blocked, n_brute = blocked.count(), brute.count()
    n_bcommon = blocked.select("id_a", "id_b").join(
        brute.select("id_a", "id_b"), ["id_a", "id_b"]).count()
    print(f"simhash: blocked={n_blocked} brute={n_brute} common={n_bcommon} "
          f"recall={n_bcommon / max(n_brute, 1):.4f}")
    # coverage of high-jaccard exact pairs by simhash(blocked)
    n_hi_sim = blocked.select("id_a", "id_b").join(hi, ["id_a", "id_b"]).count()
    n_hi_brute = brute.select("id_a", "id_b").join(hi, ["id_a", "id_b"]).count()
    print(f"simhash coverage of j>=0.5 pairs: blocked={n_hi_sim}/{n_hi} brute={n_hi_brute}/{n_hi}")

    # --- 3. knn LSH recall@10 + top1
    qv = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    bf = SIM.brute_force_topk(e, qv, k=10)
    bf_rows = [(r.vec_id, r.cos_sim) for r in bf.collect()]
    lshk = SIM.lsh_topk(e, qv, k=10, n_planes=8, dim=64)
    lsh_rows = [(r.vec_id, r.cos_sim) for r in lshk.collect()]
    bf_ids = {r[0] for r in bf_rows}
    lsh_ids = {r[0] for r in lsh_rows}
    print(f"knn_lsh: recall@10={len(bf_ids & lsh_ids)}/10 top1_bf={bf_rows[0]} top1_lsh={lsh_rows[0]}")
    # bucket size
    planes = SIM.random_hyperplanes(64, 8, 7)
    from rippledb_spark.functions import vector as V
    eb = e.select(V.as_double_array("embedding").alias("__e")).withColumn(
        "__bucket", SIM.lsh_bucket(F.col("__e"), planes))
    qb = qv.select(V.as_double_array("q").alias("__q")).withColumn(
        "__bucket", SIM.lsh_bucket(F.col("__q"), planes)).collect()[0]["__bucket"]
    n_total = e.count()
    n_bucket = eb.filter(F.col("__bucket") == qb).count()
    print(f"knn_lsh: bucket size={n_bucket}/{n_total}")

    # --- 4. knn IVF recall@10 + top1 (run twice to smell nondeterminism)
    for trial in range(2):
        ivf = SIM.ivf_topk(e, qv, k=10, n_clusters=8, n_probe=2)
        ivf_rows = [(r.vec_id, r.cos_sim) for r in ivf.collect()]
        ivf_ids = {r[0] for r in ivf_rows}
        print(f"knn_ivf trial{trial}: recall@10={len(bf_ids & ivf_ids)}/10 top1={ivf_rows[0]}")

    # --- 5. approx_count_distinct error per brand
    p = load(spark, sf_dir, "part")
    err = (
        p.groupBy("p_brand")
        .agg(
            F.approx_count_distinct("p_type", 0.02).alias("at"),
            F.countDistinct("p_type").alias("et"),
            F.approx_count_distinct("p_partkey", 0.02).alias("ap"),
            F.countDistinct("p_partkey").alias("ep"),
        )
        .selectExpr(
            "max(abs(at - et) / et) as max_rel_types",
            "max(abs(ap - ep) / ep) as max_rel_parts",
        )
        .collect()[0]
    )
    print(f"approx_distinct: max_rel_types={err['max_rel_types']:.4f} "
          f"max_rel_parts={err['max_rel_parts']:.4f}")

    # --- 6. approx_percentile vs exact rank window
    ev = load(spark, sf_dir, "events")
    pr = (
        ev.groupBy("event_type")
        .agg(
            F.percentile_approx("value", [0.5, 0.9, 0.99], 10000).alias("ap"),
            F.expr(
                "percentile(value, array(0.49, 0.5, 0.51, 0.89, 0.9, 0.91, 0.985, 0.99, 0.995))"
            ).alias("ex"),
        )
        .collect()
    )
    for r in pr:
        ap, ex = r["ap"], r["ex"]
        ok = (
            ex[0] <= ap[0] <= ex[2]
            and ex[3] <= ap[1] <= ex[5]
            and ex[6] <= ap[2] <= ex[8]
        )
        print(f"approx_pctl {r['event_type']}: ap={['%.3f' % x for x in ap]} "
              f"exact(p50,p90,p99)={['%.3f' % ex[i] for i in (1, 4, 7)]} in_window={ok}")

    spark.stop()


if __name__ == "__main__":
    main()
