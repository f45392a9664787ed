"""Resume-from-checkpoint with per-partition lineage (north rule)."""

import json
import os

from pyjedai_spark.checkpoint import CheckpointManager
from pyjedai_spark.pipeline import minhash_dedup_pipeline
from pyjedai_spark.synth import webtext_df


def test_pipeline_resumes_from_checkpoint(spark, tmp_path):
    docs, _ = webtext_df(spark, n_docs=120, seed=9)
    root = str(tmp_path / "ckpt")
    ck = CheckpointManager(root)
    out1 = minhash_dedup_pipeline(docs, id_col="eid", ckpt=ck,
                                  fingerprint="fp1").collect()
    metas = [f for f in os.listdir(root) if f.endswith("._lineage.json")]
    assert {"lsh_candidates._lineage.json", "verify._lineage.json",
            "clustering._lineage.json"} <= set(metas)
    meta = json.load(open(os.path.join(root, "clustering._lineage.json")))
    assert meta["rows"] == len(out1)
    assert meta["partitions"] and all("content_sig" in p for p in meta["partitions"])

    # resume: stages must be served from the checkpoint, not recomputed —
    # poison the build fn via a docs DataFrame that would change results
    docs2, _ = webtext_df(spark, n_docs=10, seed=1)
    ck2 = CheckpointManager(root)
    out2 = minhash_dedup_pipeline(docs2, id_col="eid", ckpt=ck2,
                                  fingerprint="fp1").collect()
    assert sorted(map(tuple, out2)) == sorted(map(tuple, out1)), \
        "resume did not reuse checkpointed stages"

    # changed input fingerprint -> stages recomputed
    out3 = minhash_dedup_pipeline(docs2, id_col="eid",
                                  ckpt=CheckpointManager(root),
                                  fingerprint="fp2").collect()
    assert len(out3) == 10


def _iceberg_available(spark):
    """Probe the actual write path: the default session catalog accepts
    CREATE NAMESPACE without any Iceberg runtime, so only a real
    ``using("iceberg")`` writeTo proves the jar + catalog are there."""
    try:
        spark.sql("CREATE NAMESPACE IF NOT EXISTS ckpt_probe_ns")
        spark.range(1).writeTo("ckpt_probe_ns.probe").using("iceberg") \
            .createOrReplace()
        return True
    except Exception:
        return False


def test_checkpoint_format_pluggable(spark, tmp_path):
    """The writer/reader pair is selected in one place: the parquet and
    iceberg formats run the SAME resume contract. Iceberg leg skips
    when no catalog/runtime jar is configured (this sandbox)."""
    import pytest

    docs, _ = webtext_df(spark, n_docs=60, seed=4)
    del pytest  # parquet leg always runs; iceberg leg self-skips below
    legs = [("parquet", str(tmp_path / "pq"), None)]
    if _iceberg_available(spark):
        legs.append(("iceberg", "ckpt_probe_ns.run1", str(tmp_path / "meta")))
    for fmt, root, meta_dir in legs:
        ck = CheckpointManager(root, fmt=fmt, meta_dir=meta_dir)
        out1 = minhash_dedup_pipeline(docs, id_col="eid", ckpt=ck,
                                      fingerprint="f1").collect()
        # resume with poisoned input: checkpoint must win
        docs2, _ = webtext_df(spark, n_docs=5, seed=2)
        out2 = minhash_dedup_pipeline(
            docs2, id_col="eid",
            ckpt=CheckpointManager(root, fmt=fmt, meta_dir=meta_dir),
            fingerprint="f1").collect()
        assert sorted(map(tuple, out2)) == sorted(map(tuple, out1)), fmt
        meta = json.load(open(os.path.join(
            meta_dir or root, "clustering._lineage.json")))
        assert meta["format"] == fmt


def test_checkpoint_iceberg_requires_meta_dir():
    import pytest

    with pytest.raises(ValueError, match="meta_dir"):
        CheckpointManager("cat.db.run", fmt="iceberg")
    with pytest.raises(ValueError, match="unknown checkpoint format"):
        CheckpointManager("/x", fmt="delta")
