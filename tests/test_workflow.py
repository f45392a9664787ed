"""Workflow API: config-dict surface mirroring the reference's
BlockingBasedWorkFlow; best_der() must produce exactly the same
clusters as the hand-built der_dedup_pipeline."""

from pyjedai_spark.pipeline import der_dedup_pipeline
from pyjedai_spark.synth import webtext_df
from pyjedai_spark.workflow import BlockingBasedWorkFlow, ProgressiveWorkFlow


def test_best_der_workflow_matches_pipeline(spark):
    docs, gt = webtext_df(spark, n_docs=250, seed=13)
    wf = BlockingBasedWorkFlow.best_der()
    a = {(r["eid"], r["cluster_id"])
         for r in wf.run(docs, id_col="eid", gt=gt).collect()}
    b = {(r["eid"], r["cluster_id"])
         for r in der_dedup_pipeline(docs, id_col="eid").collect()}
    assert a == b
    # per-stage metrics recorded for every configured step
    stages = [s["stage"] for s in wf.steps]
    assert stages == ["standard_blocking", "block_purging", "block_filtering",
                      "CNP", "entity_matching", "connected_components"]
    assert all("recall" in s for s in wf.steps)


def test_best_ccer_workflow_runs(spark):
    docs, _ = webtext_df(spark, n_docs=120, seed=17)
    wf = BlockingBasedWorkFlow.best_ccer()
    out = wf.run(docs, id_col="eid")
    # UMC returns matched pairs
    assert {"id1", "id2", "weight"} <= set(out.columns)


def test_progressive_workflow_budget(spark):
    docs, _ = webtext_df(spark, n_docs=150, seed=19)
    pw = ProgressiveWorkFlow(budget=50, method="TOP", scheme="CBS")
    out = pw.run(docs, id_col="eid")
    assert out.count() == 50
    ranks = [r["emit_rank"] for r in out.collect()]
    assert sorted(ranks) == list(range(1, 51))
