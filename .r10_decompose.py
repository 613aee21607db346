"""Round-10 decomposition harness (guide §1): where do the two recall
evals and the winnow/dsir/fuzzy targets spend their time at sf0.1?
Times each stage with the noop sink in a single session, prints one
line per stage with a probe. Run ONLY in a quiet window, never
concurrently with another Spark session."""
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
SF = "/root/testdata/sf0.1"

from bench import _cpu_probe_ms  # noqa: E402
from sql_cdc_spark.session import get_spark  # noqa: E402

spark = get_spark("decompose", extra_conf={"spark.ui.showConsoleProgress": "false"})
from pyspark.sql import functions as F  # noqa: E402

from sql_cdc_spark import tables  # noqa: E402
from sql_cdc_spark.functions import dedup as DD  # noqa: E402


def t(label, df, action="noop"):
    spark.sparkContext.setJobDescription(label)
    t0 = time.perf_counter()
    if action == "noop":
        df.write.format("noop").mode("overwrite").save()
        n = ""
    else:
        n = df.count()
    dt = time.perf_counter() - t0
    print(f"{dt:8.3f}s  {label} {n}", flush=True)
    spark.sparkContext.setJobDescription(None)
    return dt


spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
print("probe:", _cpu_probe_ms(), flush=True)

# ---- dd_lsh_recall_eval internals ------------------------------------
from sql_cdc_spark.queries.dedup_q import (  # noqa: E402
    JACCARD_THRESHOLD,
    LSH_MAX_BUCKET,
    _shingle_base,
)

shingled, sigs = _shingle_base(spark, SF)
t("warm: sigs materialize (shingle_base build)", sigs)
t("recall: exact jaccard truth (warm base)", DD.jaccard_pairs(shingled, threshold=JACCARD_THRESHOLD))
t("recall: lsh cands (warm base)", DD.lsh_candidate_pairs(sigs.drop("n_sh"), max_bucket_size=LSH_MAX_BUCKET))
import __spark_entry__ as entry  # noqa: E402

qs = entry.queries()
t("dd_lsh_recall_eval full (warm)", qs["dd_lsh_recall_eval"](spark, SF))
t("dd_jaccard_pairs full (warm)", qs["dd_jaccard_pairs"](spark, SF))

# blocking-pair volume vs postings volume (in-row sizes candidate)
hashed = shingled.select("doc_id", "sh64")
a = hashed.select(F.col("doc_id").alias("id_a"), "sh64")
b = hashed.select(F.col("doc_id").alias("id_b"), "sh64")
inter = (
    a.join(b.hint("shuffle_hash"), ["sh64"])
    .filter(F.col("id_a") < F.col("id_b"))
    .groupBy("id_a", "id_b")
    .agg(F.count(F.lit(1)).alias("n_inter"))
)
print("postings rows:", hashed.count(), flush=True)
print("blocking pair groups:", inter.count(), flush=True)

# ---- sim_ann_recall_eval internals -----------------------------------
from sql_cdc_spark.functions import similarity as SIM  # noqa: E402
from sql_cdc_spark.queries.similarity_q import (  # noqa: E402
    ANN_EVAL_PROBES,
    DIM,
    LSH_BITS,
    TOP_K,
)

emb = tables.load(spark, SF, "embeddings")
print("emb rows:", emb.count(), flush=True)
vb = emb.select(
    "vec_id", "embedding",
    SIM.lsh_bucket(F.col("embedding"), n_bits=LSH_BITS, dim=DIM).alias("bucket"),
)
exact_side = None
for p in range(ANN_EVAL_PROBES):
    q = emb.filter(F.col("vec_id") == p).select("embedding")
    ex = SIM.topk_cosine(emb.filter(F.col("vec_id") != p), q, k=TOP_K).select(
        F.lit(p).cast("long").alias("probe_id"), "vec_id"
    )
    exact_side = ex if exact_side is None else exact_side.unionByName(ex)
t("ann_recall: exact side only (6 heap scans)", exact_side)
ann_side = None
for p in range(ANN_EVAL_PROBES):
    pb = vb.filter(F.col("vec_id") == p).select(
        F.col("bucket").alias("pbucket"), F.col("embedding").alias("pe")
    )
    cand = vb.join(F.broadcast(pb), F.col("bucket") == F.col("pbucket")).filter(
        F.col("vec_id") != p
    )
    ann = (
        cand.select(
            "vec_id",
            SIM.cosine(
                SIM.as_double_array(F.col("embedding")),
                SIM.as_double_array(F.col("pe")),
            ).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
        .limit(TOP_K)
        .select(F.lit(p).cast("long").alias("probe_id"), "vec_id")
    )
    ann_side = ann if ann_side is None else ann_side.unionByName(ann)
t("ann_recall: ann side only (6 bucket branches)", ann_side)
t("sim_ann_recall_eval full", qs["sim_ann_recall_eval"](spark, SF))

# ---- winnow / dsir / fuzzy current costs ------------------------------
for name in (
    "txt_winnow_fingerprints",
    "txt_winnow_pairs",
    "crp_dsir_select",
    "crp_fuzzy_contamination",
    "dd_source_overlap",
):
    t(f"{name} (1st)", qs[name](spark, SF))
    t(f"{name} (2nd)", qs[name](spark, SF))

print("probe:", _cpu_probe_ms(), flush=True)
spark.stop()
