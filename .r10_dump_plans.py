"""Dump explain('formatted') for the round-10 target queries at sf0.01
on the production session config — run once from the r9 worktree
(before) and once from the final tree (after):

    PYTHONPATH=<tree> python .r10_dump_plans.py <tree> <outdir> <suffix>
"""
import os
import sys

tree, outdir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
sys.path.insert(0, tree)
os.makedirs(outdir, exist_ok=True)

QUERIES = [
    "dd_jaccard_pairs",
    "dd_lsh_recall_eval",
    "sim_ann_recall_eval",
    "crp_fuzzy_contamination",
    "dd_source_overlap",
    "txt_winnow_fingerprints",
    "txt_winnow_pairs",
    "crp_dsir_select",
]

from sql_cdc_spark.session import get_spark  # noqa: E402

spark = get_spark("plan-dump")
import __spark_entry__ as entry  # noqa: E402

qs = entry.queries()
for name in QUERIES:
    spark.catalog.clearCache()
    try:
        from sql_cdc_spark.queries import _cache
        app = spark.sparkContext.applicationId
        for k in [k for k in _cache._FRAMES if k[0] == app]:
            _cache._FRAMES.pop(k).unpersist()
    except Exception:
        pass
    df = qs[name](spark, "/root/testdata/sf0.01")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
        f.write(plan)
    print(name, "->", f"{name}_{suffix}.txt")
spark.stop()
