"""End-to-end golden test for the composed LLM data-curation pipeline
(pipelines/curation.py): exact stage counts on the deterministic sf0.001
fixture, full-resume on re-run, and consistency between the written
parquet and the reported metrics."""

import pyarrow.parquet as pq

from gtfs_conflation_pipeline_ray.pipelines.curation import run_curation

SF = "/root/testdata/sf0.001"

# Golden stage counts on sf0.001 (deterministic: quality screen + langid
# keep 456 of 500 docs, exact+near dedup removes 21, packing the 435
# survivors at seq_len=128 yields 630 (doc x sequence) overlap rows).
GOLD = {"filtered_rows": 456, "deduped_rows": 435, "sequence_rows": 630}


def test_curation_pipeline_golden_and_resume(ray_session, tmp_path):
    out = str(tmp_path / "curated")
    m1 = run_curation(SF, out)
    for k, v in GOLD.items():
        assert m1[k] == v, (k, m1[k])
    assert m1["filter_parts_skipped"] == 0
    assert not m1["dedup_skipped"] and not m1["pack_skipped"]

    # written outputs agree with the reported counts (partition dirs
    # sit next to the checkpoint manifest, so glob the parquet files)
    import glob

    def read_stage(stage):
        files = sorted(glob.glob(f"{out}/{stage}/part-*/*.parquet"))
        return pq.ParquetDataset(files).read()

    assert len(read_stage("filtered")) == GOLD["filtered_rows"]
    ded = read_stage("deduped")
    assert len(ded) == GOLD["deduped_rows"]
    assert len(set(ded["doc_id"].to_pylist())) == GOLD["deduped_rows"]
    assert len(read_stage("sequences")) == GOLD["sequence_rows"]

    # a second run resumes every stage from the checkpoints
    m2 = run_curation(SF, out)
    assert m2["filter_parts_skipped"] == 4
    assert m2["dedup_skipped"] and m2["pack_skipped"]
    for k, v in GOLD.items():
        assert m2[k] == v
