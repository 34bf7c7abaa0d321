"""IVF ANN: assignment determinism, probe pruning, recall sanity."""

import pyspark.sql.functions as F
import pytest

from sqlite_vector_spark.operators.ann import ivf_assign, ivf_search, probe_clusters
from sqlite_vector_spark.operators.search import full_scan


@pytest.fixture(scope="module")
def setup(spark, emb):
    cent = [list(r.embedding) for r in emb.where("vec_id < 8").orderBy("vec_id").collect()]
    assigned = ivf_assign(emb, "embedding", cent, id_col="vec_id")
    return cent, assigned


def test_centroid_rows_assign_to_themselves(setup):
    cent, assigned = setup
    own = {r.id: r.cluster for r in assigned.where("id < 8").collect()}
    assert own == {i: i for i in range(8)}


def test_all_rows_assigned_in_range(setup, emb):
    cent, assigned = setup
    assert assigned.count() == emb.count()
    mx = assigned.agg(F.max("cluster").alias("m"), F.min("cluster").alias("n")).collect()[0]
    assert 0 <= mx.n and mx.m <= 7


def test_probe_clusters_orders_by_distance(setup):
    cent, _ = setup
    probes = probe_clusters(cent[3], cent, 2)
    assert probes[0] == 3  # its own centroid is nearest


def test_ivf_search_subset_of_probed_clusters(setup):
    cent, assigned = setup
    q = [0.1] * 64
    res = ivf_search(assigned, q, cent, 10, nprobe=2)
    probed = set(probe_clusters(q, cent, 2))
    clusters = {
        r.cluster
        for r in assigned.join(res.select("id"), "id").select("cluster").collect()
    }
    assert clusters <= probed


def test_ivf_recall_improves_with_nprobe(setup, emb):
    cent, assigned = setup
    q = [0.1] * 64
    exact = [r.id for r in full_scan(emb, "embedding", q, 10, "L2", id_col="vec_id").collect()]
    r_all = {r.id for r in ivf_search(assigned, q, cent, 10, nprobe=8).collect()}
    assert set(exact) == r_all  # probing everything == exact


def test_ivf_partitioned_store_prunes_partitions(setup, spark, tmp_path):
    """The 100 TB contract: assignment written partitionBy('cluster')
    makes the probe filter a planning-time PartitionFilter — unprobed
    clusters' files are never opened."""
    cent, assigned = setup
    dest = str(tmp_path / "ivf_store")
    assigned.write.partitionBy("cluster").parquet(dest)
    stored = spark.read.parquet(dest)
    pruned = stored.where(F.col("cluster").isin([0, 3]))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cluster" in plan.split("PartitionFilters", 1)[1][:120]
    # and the scan actually restricts to the two directories
    assert {r.cluster for r in pruned.select("cluster").distinct().collect()} == {0, 3}
