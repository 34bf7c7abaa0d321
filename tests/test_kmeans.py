"""Lloyd's k-means (DataFrame-native) for IVF centroid training."""

import pyspark.sql.functions as F
import pytest

from sqlite_vector_spark.operators.ann import ivf_assign, ivf_search, kmeans_fit


def _blobs(spark):
    """Three well-separated 2-d blobs, 30 points each."""
    rows = []
    rid = 0
    for cx, cy in ((0.0, 0.0), (10.0, 10.0), (-10.0, 10.0)):
        for i in range(30):
            rows.append((rid, [cx + (i % 5) * 0.1, cy + (i // 5) * 0.1]))
            rid += 1
    return spark.createDataFrame(rows, "id long, v array<float>")


def test_kmeans_recovers_blobs(spark):
    df = _blobs(spark)
    cents = kmeans_fit(df, "v", 3, dim=2, iters=6)
    assert len(cents) == 3
    # each blob center ~ (cx+0.2, cy+0.25); every centroid lands near one
    targets = [(0.2, 0.25), (10.2, 10.25), (-9.8, 10.25)]
    for cx, cy in targets:
        assert any(abs(c[0] - cx) < 0.5 and abs(c[1] - cy) < 0.5 for c in cents), (cents, (cx, cy))


def test_kmeans_assignment_partitions_blobs(spark):
    df = _blobs(spark)
    cents = kmeans_fit(df, "v", 3, dim=2, iters=6)
    assigned = ivf_assign(df, "v", cents, id_col="id")
    sizes = {r.cluster: r.n for r in assigned.groupBy("cluster").agg(F.count("*").alias("n")).collect()}
    assert sorted(sizes.values()) == [30, 30, 30]


def test_ivf_search_on_kmeans_centroids(spark):
    df = _blobs(spark)
    cents = kmeans_fit(df, "v", 3, dim=2, iters=6)
    assigned = ivf_assign(df, "v", cents, id_col="id")
    # query near blob 2's corner: nprobe=1 must already find true top-3
    out = ivf_search(assigned, [10.0, 10.0], cents, 3, nprobe=1)
    got = [r.id for r in out.collect()]
    exact = (
        df.select("id", F.sqrt(
            (F.element_at("v", 1) - 10.0) ** 2 + (F.element_at("v", 2) - 10.0) ** 2
        ).alias("d")).orderBy("d", "id").limit(3).collect()
    )
    assert got == [r.id for r in exact]


def test_kmeans_dim_robust(spark):
    """VERDICT r2 #5: the posexplode + groupBy(cluster, pos) shape must
    handle real embedding widths — dim 256 here — where a groupBy with
    256 aggregate columns would blow up plan size. Two separated blobs
    in 256-d recovered in a few seconds."""
    import time

    rows = []
    for b, off in ((0, 0.0), (1, 50.0)):
        for i in range(40):
            rows.append((b * 40 + i, [off + ((i + j) % 7) * 0.01 for j in range(256)]))
    df = spark.createDataFrame(rows, "id long, v array<float>")
    t0 = time.time()
    cents = kmeans_fit(df, "v", 2, dim=256, iters=3)
    assert time.time() - t0 < 60
    assert len(cents) == 2 and all(len(c) == 256 for c in cents)
    # one centroid near 0, the other near 50 in every dimension
    mids = sorted(sum(c) / len(c) for c in cents)
    assert abs(mids[0] - 0.03) < 1.0 and abs(mids[1] - 50.03) < 1.0


def test_empty_cluster_keeps_centroid(spark):
    # 2 points, 3 centroids -> at least one cluster empty every iter
    df = spark.createDataFrame([(0, [0.0, 0.0]), (1, [1.0, 1.0])], "id long, v array<float>")
    cents = kmeans_fit(df, "v", 2, dim=2, iters=3)
    assert len(cents) == 2 and all(len(c) == 2 for c in cents)


def _skewed(spark):
    """Skewed manifold: a dense 400-point blob at the origin plus three
    50-point satellites far away — with ids ordered so the first C rows
    all sit inside the dense blob (data sorted by source, the realistic
    bad case for first-C seeding)."""
    import numpy as np

    rng = np.random.default_rng(7)
    rows = []
    rid = 0
    for _ in range(400):
        rows.append((rid, [float(x) for x in rng.normal(0.0, 0.5, 8)]))
        rid += 1
    for center in ([50.0] * 8, [-50.0] * 8, [50.0] * 4 + [-50.0] * 4):
        for _ in range(50):
            rows.append((rid, [float(c + x) for c, x in zip(center, rng.normal(0.0, 0.5, 8))]))
            rid += 1
    return spark.createDataFrame(rows, "id long, v array<double>")


def _sse(df, cents):
    import numpy as np

    mat = np.asarray([r.v for r in df.orderBy("id").collect()], dtype=np.float64)
    cm = np.asarray(cents, dtype=np.float64)
    d2 = ((mat[:, None, :] - cm[None, :, :]) ** 2).sum(axis=2)
    return float(d2.min(axis=1).sum())


@pytest.mark.slow
def test_kmeanspp_beats_first_seed_on_skew(spark):
    """VERDICT r5 #1: first-C seeding puts all seeds in the dense blob
    (satellites merge into one far cluster); k-means++ D² seeding
    spreads them and must cut quantization error by well over 2x."""
    df = _skewed(spark)
    first = kmeans_fit(df, "v", 4, dim=8, iters=5)
    pp = kmeans_fit(df, "v", 4, dim=8, iters=5, init="kmeans++", seed=1)
    assert _sse(df, pp) < 0.5 * _sse(df, first), (_sse(df, pp), _sse(df, first))
    # every true center recovered by a ++ centroid
    for target in ([0.0] * 8, [50.0] * 8, [-50.0] * 8, [50.0] * 4 + [-50.0] * 4):
        assert any(
            max(abs(ci - ti) for ci, ti in zip(c, target)) < 2.0 for c in pp
        ), (pp, target)


def test_kmeanspp_deterministic_and_validated(spark):
    import pytest

    from sqlite_vector_spark.operators.ann import kmeanspp_seeds

    df = _skewed(spark)
    a = kmeans_fit(df, "v", 4, dim=8, iters=2, init="kmeans++", seed=42)
    b = kmeans_fit(df, "v", 4, dim=8, iters=2, init="kmeans++", seed=42)
    assert a == b
    with pytest.raises(ValueError, match="sample"):
        kmeanspp_seeds([[0.0, 0.0]], c=3)
    with pytest.raises(ValueError, match="init"):
        kmeans_fit(df, "v", 2, dim=8, iters=1, init="bogus")


def test_kmeanspp_duplicate_points_fill_uniformly(spark):
    """All-duplicate residuals (every remaining point equals a chosen
    center) must fall back to uniform fill, not crash on p=0/0."""
    from sqlite_vector_spark.operators.ann import kmeanspp_seeds

    seeds = kmeanspp_seeds([[1.0, 1.0]] * 5, c=3, seed=0)
    assert len(seeds) == 3 and all(s == [1.0, 1.0] for s in seeds)
