"""Profile minhash/jaccard sub-steps at a given SF (default sf0.1)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from demo_apache_flink_streaming_mode_spark.operators import dedup
from demo_apache_flink_streaming_mode_spark.plans import queries_llm as Q
from demo_apache_flink_streaming_mode_spark.session import get_spark
from demo_apache_flink_streaming_mode_spark.sources.batch import load_table

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
spark = get_spark("profile")
spark.range(1_000_000).selectExpr("sum(id)").collect()


def t(label, df):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    print(f"{label:35s} {time.perf_counter() - t0:7.2f}s", flush=True)


docs = load_table(spark, sf_dir, "documents")
t("docs scan", docs)
sigs = dedup.minhash_signature(docs, shingle_n=Q.SHINGLE_N, num_hashes=Q.NUM_HASHES)
t("minhash_signature", sigs)
cands = dedup.lsh_candidate_pairs(sigs, bands=Q.BANDS, rows_per_band=Q.ROWS_PER_BAND)
t("lsh_candidate_pairs", cands)
t("ngram_jaccard (full)", Q.dedup_ngram_jaccard(spark, sf_dir))
