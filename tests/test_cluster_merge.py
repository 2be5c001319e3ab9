"""Range-clustered compaction (maintenance.cluster_merge_segments):
value-disjoint output segments whose manifest zone maps prune
range/equality queries — the one-dimensional ZORDER analog."""

import json

import pytest

from toshokan_spark.catalog import FsCatalog
from toshokan_spark.config import FieldConfig, IndexConfig
from toshokan_spark.indexer import index_batch
from toshokan_spark.maintenance import (
    MergeError,
    cluster_merge_segments,
    create_index,
)
from toshokan_spark.plans.ast import parse_query
from toshokan_spark.search import _pruned_segments, search


def _cfg(tmp_path) -> IndexConfig:
    return IndexConfig(
        name="clustered",
        path=str(tmp_path / "data"),
        fields=[
            FieldConfig(name="doc_id", type="number", number_type="u64"),
            FieldConfig(name="v", type="number", number_type="i64"),
            FieldConfig(name="tag", type="text", tokenizer="raw"),
        ],
    )


def _write(tmp_path, name, rows):
    p = tmp_path / name
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    return str(p)


@pytest.fixture()
def clustered(spark, tmp_path):
    cat = FsCatalog(str(tmp_path / "cat"))
    config = _cfg(tmp_path)
    create_index(cat, config)
    # two ingestion-ordered segments, each spanning the FULL value
    # range (the layout zone maps cannot prune)
    rows_a = [{"doc_id": i, "v": (i * 37) % 100, "tag": "a"}
              for i in range(0, 100, 2)]
    rows_b = [{"doc_id": i, "v": (i * 37) % 100, "tag": "b"}
              for i in range(1, 100, 2)]
    index_batch(spark, cat, "clustered", _write(tmp_path, "a.jsonl", rows_a))
    index_batch(spark, cat, "clustered", _write(tmp_path, "b.jsonl", rows_b))
    return cat, config


def test_cluster_merge_prunes_ranges_and_keeps_rows(spark, clustered):
    cat, config = clustered
    _ver, before, _d = cat.snapshot("clustered")
    assert len(before) == 2
    # pre-cluster: a narrow range query prunes NOTHING (each segment
    # spans the whole v range)
    node = parse_query("v:[0 TO 20}")
    _lo, _hi, surv = _pruned_segments(config, before, node)
    assert len(surv) == 2

    entries = cluster_merge_segments(
        spark, cat, "clustered", "v", n_clusters=4
    )
    assert len(entries) == 4
    _ver, after, _d = cat.snapshot("clustered")
    assert {s.id for s in after} == {e.id for e in entries}
    # zone maps are value-disjoint and ordered
    spans = sorted(
        (e.field_stats["v"][0], e.field_stats["v"][1]) for e in entries
    )
    for (l1, h1), (l2, h2) in zip(spans, spans[1:]):
        assert h1 < l2 or (h1 < l2 + 1), (spans,)
        assert h1 <= l2
    # post-cluster: the same range query survives in ONE segment
    _lo, _hi, surv = _pruned_segments(config, after, node)
    assert len(surv) == 1
    # every row is still there, exactly once
    got = sorted(
        json.loads(line)["doc_id"]
        for line in search(spark, cat, "clustered", "*", limit=None)
    )
    assert got == list(range(100))
    # and row counts sum to the corpus
    assert sum(e.num_rows for e in entries) == 100


def test_cluster_merge_materializes_deletes_and_clears(spark, clustered):
    cat, _config = clustered
    cat.add_delete("clustered", "tag:b")
    entries = cluster_merge_segments(
        spark, cat, "clustered", "v", n_clusters=2
    )
    assert sum(e.num_rows for e in entries) == 50
    _ver, _segs, dels = cat.snapshot("clustered")
    assert dels == []  # covered every segment -> tombstone cleared
    got = [json.loads(line)
           for line in search(spark, cat, "clustered", "*", limit=None)]
    assert len(got) == 50 and all(d["tag"] == "a" for d in got)


def test_cluster_merge_rejects_bad_args(spark, clustered):
    cat, _config = clustered
    with pytest.raises(MergeError):
        cluster_merge_segments(spark, cat, "clustered", "v", n_clusters=1)
    with pytest.raises(MergeError):
        cluster_merge_segments(spark, cat, "clustered", "nope")
