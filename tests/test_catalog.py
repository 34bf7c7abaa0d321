"""vector_init / catalog semantics (sqlite-vector.c:2491-2543) +
option-string parsing (878-992)."""

import pytest

from sqlite_vector_spark.catalog import VectorCatalog
from sqlite_vector_spark.types import Metric, QType, VectorType, parse_memory, parse_options


def test_option_parsing_full():
    o = parse_options("type=FLOAT32,dimension=64,normalized=true,max_memory=2MB,distance=cosine,qtype=U8BIT")
    assert o.type is VectorType.F32
    assert o.dimension == 64
    assert o.normalized is True
    assert o.max_memory == 2 * 1024 * 1024
    assert o.distance is Metric.COSINE
    assert o.qtype is QType.U8


def test_option_aliases():
    assert parse_options("distance=euclidean").distance is Metric.L2
    assert parse_options("distance=manhattan").distance is Metric.L1
    assert parse_options("distance=inner").distance is Metric.DOT


def test_memory_units():
    # sqlite-vector.c:916-933
    assert parse_memory("512") == 512
    assert parse_memory("2KB") == 2048
    assert parse_memory("1.5MB") == int(1.5 * 1024 * 1024)
    assert parse_memory("1GB") == 1024**3


def test_bad_option_key_raises():
    with pytest.raises(ValueError):
        parse_options("bogus=1")


def test_init_validates_column(spark, emb, tmp_path):
    cat = VectorCatalog(str(tmp_path))
    with pytest.raises(ValueError, match="not found"):
        cat.vector_init(emb, "embeddings", "nope")
    with pytest.raises(ValueError, match="ARRAY of numeric"):
        cat.vector_init(emb, "embeddings", "vec_id")
    ctx = cat.vector_init(emb, "embeddings", "embedding", "dimension=64,distance=L2")
    assert ctx.dimension == 64


def test_conflicting_reinit_rejected(spark, emb, tmp_path):
    # sqlite-vector.c:2521-2536
    cat = VectorCatalog(str(tmp_path))
    cat.vector_init(emb, "embeddings", "embedding", "dimension=64")
    with pytest.raises(ValueError, match="conflicting"):
        cat.vector_init(emb, "embeddings", "embedding", "dimension=32")


def test_quant_params_persist_across_instances(spark, emb, tmp_path):
    # sqlite_serialize/unserialize (sqlite-vector.c:419-491)
    cat = VectorCatalog(str(tmp_path))
    cat.vector_init(emb, "embeddings", "embedding", "dimension=64")
    cat.set_quant_params("embeddings", "embedding", qtype="S8BIT", scale=2.5, offset=0.0, path="/x")
    cat2 = VectorCatalog(str(tmp_path))
    ctx = cat2.vector_init(emb, "embeddings", "embedding", "dimension=64")
    assert (ctx.resolved_qtype, ctx.qscale, ctx.qoffset, ctx.quantized_path) == ("S8BIT", 2.5, 0.0, "/x")


def test_version_and_backend():
    from sqlite_vector_spark import vector_backend, vector_version

    assert vector_version()
    assert vector_backend() in ("auto", "codegen", "arrow-numpy")


def test_reference_registered_surface_resolves():
    """Every function sqlite3_vector_init registers (reference
    sqlite-vector.c:2574-2634) has a counterpart importable from the
    package root (vector_init lives on VectorCatalog)."""
    import sqlite_vector_spark as sv

    for name in (
        "vector_version",
        "vector_backend",
        "vector_quantize",
        "vector_quantize_memory",
        "vector_quantize_preload",
        "vector_quantize_cleanup",
        "vector_as_f32",
        "vector_as_f16",
        "vector_as_bf16",
        "vector_as_i8",
        "vector_as_u8",
        "vector_full_scan",
        "vector_quantize_scan",
        "vector_full_scan_stream",
        "vector_quantize_scan_stream",
    ):
        assert callable(getattr(sv, name)), name
    assert callable(sv.VectorCatalog.vector_init)


def test_router_index_selection(spark, emb, tmp_path):
    """knn() routes to the quantized replica when registered, the base
    scan otherwise / when forced; the replica route reads the shadow
    parquet, not the base table."""
    import pytest as _pytest

    from sqlite_vector_spark.catalog import VectorCatalog
    from sqlite_vector_spark.operators.quantize import vector_quantize
    from sqlite_vector_spark.router import knn

    cat = VectorCatalog(str(tmp_path / "cat"))
    emb.createOrReplaceTempView("emb_router_t")
    cat.vector_init(emb, "emb_router_t", "embedding", "type=FLOAT32,dimension=64,distance=L2")

    with _pytest.raises(ValueError, match="no quantized replica"):
        knn(spark, cat, "emb_router_t", "embedding", [0.1] * 64, 5, prefer="quantized")
    # no replica yet -> auto falls back to exact
    exact = knn(spark, cat, "emb_router_t", "embedding", [0.1] * 64, 5, id_col="vec_id")
    assert exact.count() == 5

    shadow = str(tmp_path / "shadow")
    vector_quantize(emb, "embedding", shadow, id_col="vec_id", catalog=cat, table="emb_router_t")
    routed = knn(spark, cat, "emb_router_t", "embedding", [0.1] * 64, 5)
    assert any("shadow" in f for f in routed.inputFiles())  # replica scan
    assert routed.count() == 5
    forced = knn(spark, cat, "emb_router_t", "embedding", [0.1] * 64, 5, prefer="exact", id_col="vec_id")
    assert not any("shadow" in f for f in forced.inputFiles())
    # same neighbor set on this corpus (quantized-domain distances)
    assert {r.id for r in routed.collect()} == {r.id for r in forced.collect()}


def test_router_ivf_tier(spark, emb, tmp_path):
    """The IVF store is OPT-IN (prefer='ivf'): auto must keep routing
    to a full-coverage path (quantized replica here) because the probe
    limit silently drops recall. When asked for, the IVF scan is
    partition-pruned to the probed clusters with true-domain
    distances."""
    import pytest as _pytest

    from sqlite_vector_spark.catalog import VectorCatalog
    from sqlite_vector_spark.operators.ann import ivf_store, probe_clusters
    from sqlite_vector_spark.operators.quantize import vector_quantize
    from sqlite_vector_spark.router import knn

    cat = VectorCatalog(str(tmp_path / "cat"))
    emb.createOrReplaceTempView("emb_ivf_router_t")
    cat.vector_init(emb, "emb_ivf_router_t", "embedding", "type=FLOAT32,dimension=64,distance=L2")
    with _pytest.raises(ValueError, match="no IVF store"):
        knn(spark, cat, "emb_ivf_router_t", "embedding", [0.1] * 64, 5, prefer="ivf")

    # quantized replica AND ivf store both registered -> auto still
    # routes to the full-coverage replica; IVF only on explicit ask
    shadow = str(tmp_path / "shadow")
    vector_quantize(emb, "embedding", shadow, id_col="vec_id", catalog=cat, table="emb_ivf_router_t")
    cent = [list(r.embedding) for r in emb.orderBy("vec_id").limit(8).collect()]
    dest = str(tmp_path / "ivf")
    ivf_store(emb, "embedding", cent, dest, id_col="vec_id")
    cat.set_ivf_index("emb_ivf_router_t", "embedding", path=dest, centroids=cent)

    auto = knn(spark, cat, "emb_ivf_router_t", "embedding", [0.1] * 64, 5)
    assert any("shadow" in f for f in auto.inputFiles())  # full-coverage replica, not IVF
    routed = knn(spark, cat, "emb_ivf_router_t", "embedding", [0.1] * 64, 5, prefer="ivf")
    plan = routed._jdf.queryExecution().executedPlan().toString()
    # probe IN filter lands in PartitionFilters = planning-time pruning
    # (actual file-skipping is pinned in test_ann's pruning proof);
    # inputFiles() lists pre-pruning so it only proves the source
    assert "PartitionFilters: [" in plan and "cluster" in plan
    assert any("/ivf" in f for f in routed.inputFiles())
    assert routed.count() == 5
    # routed rows really come from the probed clusters only
    probes = set(probe_clusters([0.1] * 64, cent, 2))
    stored = spark.read.parquet(dest)
    probe_ids = {r.id for r in stored.where(stored.cluster.isin([int(c) for c in probes])).collect()}
    assert {r.id for r in routed.collect()} <= probe_ids
    # catalog round-trip: a fresh catalog over the same root reloads the index
    cat2 = VectorCatalog(str(tmp_path / "cat"))
    ctx2 = cat2.vector_init(emb, "emb_ivf_router_t", "embedding", "type=FLOAT32,dimension=64,distance=L2")
    assert ctx2.ivf_path == dest and len(ctx2.ivf_centroids) == 8


def test_router_pq_tiers(spark, emb, tmp_path):
    """PQ tiers are OPT-IN like IVF: prefer='pq' reads the code table
    with ADC distances; prefer='ivf_pq' probe-prunes the IVF-PQ store
    (residual-aware via the catalog flag); auto never routes to
    either. Catalog round-trips the codebooks as metadata."""
    import pytest as _pytest

    from sqlite_vector_spark.catalog import VectorCatalog
    from sqlite_vector_spark.operators.pq import (
        ivf_pq_store,
        pq_codebooks_first,
        pq_encode,
        pq_scan,
    )
    from sqlite_vector_spark.router import knn

    cat = VectorCatalog(str(tmp_path / "cat"))
    emb.createOrReplaceTempView("emb_pq_router_t")
    cat.vector_init(emb, "emb_pq_router_t", "embedding", "type=FLOAT32,dimension=64,distance=L2")
    with _pytest.raises(ValueError, match="no PQ code table"):
        knn(spark, cat, "emb_pq_router_t", "embedding", [0.1] * 64, 5, prefer="pq")
    with _pytest.raises(ValueError, match="no IVF-PQ store"):
        knn(spark, cat, "emb_pq_router_t", "embedding", [0.1] * 64, 5, prefer="ivf_pq")

    books = pq_codebooks_first(emb, "embedding", 4, 8, 64, id_col="vec_id")
    codes_dir = str(tmp_path / "pq_codes")
    pq_encode(emb, "embedding", books, id_col="vec_id").write.parquet(codes_dir)
    cat.set_pq_index("emb_pq_router_t", "embedding", path=codes_dir, codebooks=books)

    routed = knn(spark, cat, "emb_pq_router_t", "embedding", [0.1] * 64, 5, prefer="pq")
    direct = pq_scan(spark.read.parquet(codes_dir), [0.1] * 64, books, 5, "L2")
    assert [(r.id, r.distance) for r in routed.collect()] == [
        (r.id, r.distance) for r in direct.collect()
    ]

    # ivf_pq over the cluster-partitioned store, catalog-registered
    cent = [list(r.embedding) for r in emb.orderBy("vec_id").limit(8).collect()]
    ipq_dir = str(tmp_path / "ivfpq")
    ivf_pq_store(emb, "embedding", cent, books, ipq_dir, id_col="vec_id")
    cat.set_pq_index("emb_pq_router_t", "embedding", path=ipq_dir, codebooks=books)
    cat.set_ivf_index("emb_pq_router_t", "embedding", path=ipq_dir, centroids=cent)
    routed2 = knn(spark, cat, "emb_pq_router_t", "embedding", [0.1] * 64, 5, prefer="ivf_pq")
    plan = routed2._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "cluster" in plan
    assert routed2.count() == 5

    # catalog persistence round-trip: a fresh catalog instance reloads
    # codebooks + residual flag from JSON
    cat2 = VectorCatalog(str(tmp_path / "cat"))
    cat2.vector_init(emb, "emb_pq_router_t", "embedding", "type=FLOAT32,dimension=64,distance=L2")
    ctx = cat2.get("emb_pq_router_t", "embedding")
    assert ctx.pq_codebooks == [[[float(x) for x in e] for e in cb] for cb in books]
    assert ctx.pq_residual is False


def test_router_bq_tier(spark, emb, tmp_path):
    """The 1-bit tier is OPT-IN (prefer='bq'): error without a
    registered code table; with one, the Hamming prefilter + exact
    rerank returns true distances, and a corpus-wide prefilter equals
    the exact scan exactly. The table + thresholds persist through a
    catalog reload."""
    import pytest as _pytest

    from sqlite_vector_spark.catalog import VectorCatalog
    from sqlite_vector_spark.operators.bq import bq_encode
    from sqlite_vector_spark.operators.search import full_scan
    from sqlite_vector_spark.router import knn

    cat = VectorCatalog(str(tmp_path / "cat"))
    emb.createOrReplaceTempView("emb_bq_router_t")
    cat.vector_init(emb, "emb_bq_router_t", "embedding", "type=FLOAT32,dimension=64,distance=L2")
    with _pytest.raises(ValueError, match="no BQ code table"):
        knn(spark, cat, "emb_bq_router_t", "embedding", [0.1] * 64, 5, prefer="bq")

    dest = str(tmp_path / "bqcodes")
    bq_encode(emb, "embedding", 64, id_col="vec_id").write.parquet(dest)
    cat.set_bq_index("emb_bq_router_t", "embedding", path=dest)

    q = [0.1] * 64
    exact = [(r.id, r.distance) for r in full_scan(emb, "embedding", q, 5, "L2", id_col="vec_id").collect()]
    # prefilter >= corpus -> the rerank sees every row: equals exact
    wide = [
        (r.id, r.distance)
        for r in knn(
            spark, cat, "emb_bq_router_t", "embedding", q, 5,
            prefer="bq", prefilter=10_000, id_col="vec_id",
        ).collect()
    ]
    assert wide == exact
    # default prefilter (10k) returns k true-distance rows ascending
    routed = knn(spark, cat, "emb_bq_router_t", "embedding", q, 5, prefer="bq", id_col="vec_id").collect()
    assert len(routed) == 5
    assert [r.distance for r in routed] == sorted(r.distance for r in routed)

    # persistence: a fresh catalog instance reloads the bq metadata
    cat2 = VectorCatalog(str(tmp_path / "cat"))
    cat2.vector_init(emb, "emb_bq_router_t", "embedding", "type=FLOAT32,dimension=64,distance=L2")
    assert cat2.get("emb_bq_router_t", "embedding").bq_path == dest


def test_make_session_returns_tuned_active_session(spark):
    """make_session must reuse/return a live session with the tuned
    confs applied (getOrCreate reuses the test session; the builder
    confs only bind on creation, so assert the knobs it always sets)."""
    from sqlite_vector_spark import make_session

    s = make_session()
    assert s.conf.get("spark.sql.session.timeZone") == "UTC" or s is spark
    assert int(s.conf.get("spark.sql.shuffle.partitions")) >= 8
    assert s.range(3).count() == 3


@pytest.mark.slow
def test_router_opq_rotation_applied(spark, emb, tmp_path):
    """When the catalog holds an OPQ rotation, prefer='pq' must
    rotate the query with the exact driver fold and scan the rotated
    code table — equal to calling opq_scan directly; without the
    rotation set, the same store would score garbage."""
    from sqlite_vector_spark.catalog import VectorCatalog
    from sqlite_vector_spark.operators.pq import (
        opq_encode,
        opq_scan,
        pq_codebooks_first,
        random_rotation,
    )
    from sqlite_vector_spark.operators.pq import _rotate_py, opq_rotate
    from sqlite_vector_spark.router import knn

    R = random_rotation(64, seed=9)
    rotated = opq_rotate(emb, "embedding", R, id_col="vec_id")
    book_rows = rotated.where(rotated.id < 8).orderBy("id").collect()
    books = [[list(r.vec[s * 16 : (s + 1) * 16]) for r in book_rows] for s in range(4)]
    codes_dir = str(tmp_path / "opq_codes")
    opq_encode(emb, "embedding", R, books, id_col="vec_id").write.parquet(codes_dir)

    cat = VectorCatalog(str(tmp_path / "cat_opq"))
    emb.createOrReplaceTempView("emb_opq_router_t")
    cat.vector_init(emb, "emb_opq_router_t", "embedding", "type=FLOAT32,dimension=64,distance=L2")
    cat.set_pq_index("emb_opq_router_t", "embedding", path=codes_dir, codebooks=books, rotation=R)

    q = [0.1 * ((j % 5) - 2) for j in range(64)]
    routed = knn(spark, cat, "emb_opq_router_t", "embedding", q, 5, prefer="pq")
    direct = opq_scan(spark.read.parquet(codes_dir), q, R, books, 5, "L2")
    assert [(r.id, r.distance) for r in routed.collect()] == [
        (r.id, r.distance) for r in direct.collect()
    ]
    # the rotation survives a catalog reload and still routes
    cat2 = VectorCatalog(str(tmp_path / "cat_opq"))
    cat2.vector_init(emb, "emb_opq_router_t", "embedding", "type=FLOAT32,dimension=64,distance=L2")
    routed2 = knn(spark, cat2, "emb_opq_router_t", "embedding", q, 5, prefer="pq")
    assert [(r.id, r.distance) for r in routed2.collect()] == [
        (r.id, r.distance) for r in direct.collect()
    ]


def test_router_mih_tier(spark, emb, tmp_path):
    """The persisted-MIH tier is OPT-IN (prefer='mih'): error without
    a registered band store; with one, the pruned-probe Hamming
    prefilter + exact rerank returns true distances. Candidates are
    band collisions only, so a wide prefilter equals the BQ tier at
    the same width restricted to collision candidates; the query's
    own row always survives (its bands collide with themselves). The
    path + band_bits persist through a catalog reload."""
    import pyspark.sql.functions as F
    import pytest as _pytest

    from sqlite_vector_spark.catalog import VectorCatalog
    from sqlite_vector_spark.operators.bq import bq_band_store, bq_encode
    from sqlite_vector_spark.router import knn

    cat = VectorCatalog(str(tmp_path / "cat"))
    emb.createOrReplaceTempView("emb_mih_router_t")
    cat.vector_init(emb, "emb_mih_router_t", "embedding", "type=FLOAT32,dimension=64,distance=L2")
    with _pytest.raises(ValueError, match="no MIH band store"):
        knn(spark, cat, "emb_mih_router_t", "embedding", [0.1] * 64, 5, prefer="mih")

    dest = str(tmp_path / "mih_bands")
    codes = bq_encode(emb, "embedding", 64, id_col="vec_id")
    bq_band_store(codes, 64, dest, band_bits=8)
    cat.set_mih_index("emb_mih_router_t", "embedding", path=dest, band_bits=8)

    qrow = emb.where(F.col("vec_id") == 11).collect()[0]
    q = [float(x) for x in qrow.embedding]
    got = knn(
        spark, cat, "emb_mih_router_t", "embedding", q, 5,
        prefer="mih", prefilter=200, id_col="vec_id",
    ).collect()
    assert len(got) == 5
    assert got[0].id == 11 and got[0].distance == 0.0  # own row: Hamming 0, L2 0
    ds = [r.distance for r in got]
    assert ds == sorted(ds)

    # reload: a fresh catalog on the same root restores the tier
    cat2 = VectorCatalog(str(tmp_path / "cat"))
    ctx = cat2.vector_init(emb, "emb_mih_router_t", "embedding", "type=FLOAT32,dimension=64,distance=L2")
    assert ctx.mih_path == dest and ctx.mih_band_bits == 8
    again = knn(
        spark, cat2, "emb_mih_router_t", "embedding", q, 5,
        prefer="mih", prefilter=200, id_col="vec_id",
    ).collect()
    assert [(r.id, r.distance) for r in again] == [(r.id, r.distance) for r in got]


def test_router_normalized_cosine_uses_dot_kernel(spark, emb, tmp_path):
    """A column registered ``normalized=1`` answers cosine through the
    single-dot-fold plan (VERDICT r8 #7): same neighbor ids and order
    as the cosine kernel on unit-norm rows, distances equal to within
    float roundoff (mathematical identity, not bitwise — cosine
    divides by computed norms ~ 1.0), and the routed plan carries
    strictly fewer aggregate folds than the cosine plan. Without the
    flag the same query routes to the plain cosine kernel."""
    import pyspark.sql.functions as F

    from sqlite_vector_spark.catalog import VectorCatalog
    from sqlite_vector_spark.operators.search import full_scan
    from sqlite_vector_spark.router import knn

    # unit-normalize the fixture rows, materialized to parquet so the
    # plan comparison below sees only the SCAN-stage folds
    norm = F.sqrt(F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x.cast("double") * x.cast("double")))
    emb.where(F.col("embedding").isNotNull()).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double") / norm).alias("embedding")
    ).write.parquet(str(tmp_path / "unit"))
    unit = spark.read.parquet(str(tmp_path / "unit"))
    unit.createOrReplaceTempView("emb_unit_t")

    cat = VectorCatalog(str(tmp_path / "cat_norm"))
    cat.vector_init(unit, "emb_unit_t", "embedding", "type=FLOAT32,dimension=64,distance=cosine,normalized=1")
    q = [float(v) for v in range(1, 65)]

    # pin codegen so both plans are HOF folds (the fold-count
    # assertion below is about the codegen backend; under Arrow both
    # kernels hide inside a pandas UDF)
    from sqlite_vector_spark.version import set_backend, vector_backend

    prev = vector_backend()
    set_backend("codegen")
    try:
        routed = knn(spark, cat, "emb_unit_t", "embedding", q, 10, prefer="exact", id_col="vec_id")
        want = full_scan(unit, "embedding", q, 10, "COSINE", id_col="vec_id")
        got_rows, want_rows = routed.collect(), want.collect()
        assert [r.id for r in got_rows] == [r.id for r in want_rows]
        for g, wnt in zip(got_rows, want_rows):
            assert abs(g.distance - wnt.distance) < 1e-9

        # plan improvement: fewer folds than the cosine kernel (the
        # executedPlan string elides long projections, so count in
        # the analyzed plan, which prints expressions in full)
        routed_plan = routed._jdf.queryExecution().analyzed().toString()
        cosine_plan = want._jdf.queryExecution().analyzed().toString()
        assert routed_plan.count("aggregate(") < cosine_plan.count("aggregate(")

        # without the flag, the same registration routes the cosine kernel
        cat2 = VectorCatalog(str(tmp_path / "cat_nonorm"))
        cat2.vector_init(unit, "emb_unit_t", "embedding", "type=FLOAT32,dimension=64,distance=cosine")
        plain = knn(spark, cat2, "emb_unit_t", "embedding", q, 10, prefer="exact", id_col="vec_id")
        assert [(r.id, r.distance) for r in plain.collect()] == [
            (r.id, r.distance) for r in want_rows
        ]
    finally:
        set_backend(prev)


def test_router_filtered_search(spark, emb, tmp_path):
    """Attribute-filtered search (r9): where= filters the exact scan
    with scan-level pushdown; the quantized tier answers predicates
    over include_cols by filtering the REPLICA scan (PushedFilters on
    the shadow parquet); a predicate the replica cannot answer raises
    (no silent domain switch), and probe-limited tiers reject where=."""
    import pyspark.sql.functions as F
    import pytest as _pytest

    from sqlite_vector_spark.catalog import VectorCatalog
    from sqlite_vector_spark.operators.quantize import vector_quantize
    from sqlite_vector_spark.operators.search import full_scan
    from sqlite_vector_spark.router import knn

    src = str(tmp_path / "base")
    emb.withColumn("label", (F.col("vec_id") % 4).cast("int")).write.parquet(src)
    base = spark.read.parquet(src)
    base.createOrReplaceTempView("emb_filter_t")
    q = [0.25 * ((i % 5) - 2) for i in range(64)]

    cat = VectorCatalog(str(tmp_path / "cat"))
    cat.vector_init(base, "emb_filter_t", "embedding", "type=FLOAT32,dimension=64,distance=L2")

    exact = knn(spark, cat, "emb_filter_t", "embedding", q, 10,
                prefer="exact", id_col="vec_id", where="label = 1")
    want = full_scan(base.where("label = 1"), "embedding", q, 10, "L2", id_col="vec_id")
    assert [(r.id, r.distance) for r in exact.collect()] == [
        (r.id, r.distance) for r in want.collect()
    ]
    assert all(r.id % 4 == 1 for r in exact.collect())
    plan = exact._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "label" in plan  # predicate reaches the scan

    # replica WITHOUT include_cols: filtered quantized route must raise
    vector_quantize(base, "embedding", str(tmp_path / "shadow0"), id_col="vec_id",
                    catalog=cat, table="emb_filter_t")
    with _pytest.raises(ValueError, match="include_cols"):
        knn(spark, cat, "emb_filter_t", "embedding", q, 10,
            prefer="quantized", id_col="vec_id", where="label = 1")

    # rebuild WITH include_cols: replica answers the predicate itself
    vector_quantize(base, "embedding", str(tmp_path / "shadow1"), id_col="vec_id",
                    catalog=cat, table="emb_filter_t", include_cols=["label"])
    ctx = cat.get("emb_filter_t", "embedding")
    assert ctx.quantized_include_cols == ["label"]
    filt = knn(spark, cat, "emb_filter_t", "embedding", q, 10,
               id_col="vec_id", where="label = 1")  # auto -> quantized
    rows = filt.collect()
    assert len(rows) == 10 and all(r.id % 4 == 1 for r in rows)
    qplan = filt._jdf.queryExecution().executedPlan().toString()
    assert "shadow1" in " ".join(filt.inputFiles())  # really the replica
    assert "PushedFilters" in qplan and "label" in qplan
    # unfiltered ranks restricted to label=1 == filtered ranks
    # (same code domain, the filter only narrows the candidate set)
    allq = knn(spark, cat, "emb_filter_t", "embedding", q, 200, id_col="vec_id")
    expect = [r.id for r in allq.collect() if r.id % 4 == 1][:10]
    assert [r.id for r in rows] == expect

    # include_cols survives a catalog reload
    cat2 = VectorCatalog(str(tmp_path / "cat"))
    ctx2 = cat2.vector_init(base, "emb_filter_t", "embedding", "type=FLOAT32,dimension=64,distance=L2")
    assert ctx2.quantized_include_cols == ["label"]

    # probe-limited tiers reject where=
    with _pytest.raises(ValueError, match="full-coverage tiers"):
        knn(spark, cat, "emb_filter_t", "embedding", q, 10,
            prefer="bq", id_col="vec_id", where="label = 1")


def test_normalized_cosine_reaches_sql_route(spark, emb, tmp_path):
    """The canonical SQL spelling inherits the normalized-flag plan:
    'cosine' text over a normalized=1 registration routes through the
    single-dot-fold scan (fold count pinned vs the unregistered
    route), same ids out."""
    import pyspark.sql.functions as F

    from sqlite_vector_spark.catalog import VectorCatalog
    from sqlite_vector_spark.sql import route_sql
    from sqlite_vector_spark.version import set_backend, vector_backend

    norm = F.sqrt(F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x.cast("double") * x.cast("double")))
    emb.where(F.col("embedding").isNotNull()).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double") / norm).alias("embedding")
    ).write.parquet(str(tmp_path / "unit"))
    unit = spark.read.parquet(str(tmp_path / "unit"))
    unit.createOrReplaceTempView("emb_unit_sql_t")

    cat = VectorCatalog(str(tmp_path / "cat"))
    cat.vector_init(unit, "emb_unit_sql_t", "embedding", "type=FLOAT32,dimension=64,distance=cosine,normalized=1")
    q = ", ".join(repr(float(v)) for v in range(1, 65))
    sql = (
        f"SELECT vec_id AS id, vector_distance(embedding, array({q}), 'cosine') AS distance "
        "FROM emb_unit_sql_t ORDER BY distance ASC LIMIT 8"
    )
    prev = vector_backend()
    set_backend("codegen")
    try:
        routed = route_sql(spark, cat, sql)
        assert routed._sv_route.tier == "routed"
        plan = routed._jdf.queryExecution().analyzed().toString()
        assert plan.count("aggregate(") == 1  # single dot fold
        cat2 = VectorCatalog(str(tmp_path / "cat2"))
        cat2.vector_init(unit, "emb_unit_sql_t", "embedding", "type=FLOAT32,dimension=64,distance=cosine")
        plain = route_sql(spark, cat2, sql)
        assert plain._jdf.queryExecution().analyzed().toString().count("aggregate(") > 1
        assert [r.id for r in routed.collect()] == [r.id for r in plain.collect()]
    finally:
        set_backend(prev)


@pytest.mark.slow
def test_router_mih_projected_tier(spark, emb, tmp_path):
    """A band store built from bq_project_encode codes lives in the
    p-bit PROJECTED layout — registering it via set_mih_index(planes=)
    makes the router encode queries with the SAME planes (ADVICE r8:
    without the marker it probed threshold sign bits over
    ctx.dimension and got silently wrong/empty collisions). The own
    row still always survives (identical projected code), and the
    planes persist through a catalog reload."""
    import pyspark.sql.functions as F

    from sqlite_vector_spark.catalog import VectorCatalog
    from sqlite_vector_spark.operators.bq import bq_band_store, bq_project_encode, bq_random_planes
    from sqlite_vector_spark.router import knn

    planes = bq_random_planes(64, 32, seed=7)
    cat = VectorCatalog(str(tmp_path / "cat_proj"))
    emb.createOrReplaceTempView("emb_mihp_router_t")
    cat.vector_init(emb, "emb_mihp_router_t", "embedding", "type=FLOAT32,dimension=64,distance=L2")
    dest = str(tmp_path / "mih_proj_bands")
    codes = bq_project_encode(emb, "embedding", planes, id_col="vec_id", backend="codegen")
    bq_band_store(codes, 32, dest, band_bits=8)
    cat.set_mih_index("emb_mihp_router_t", "embedding", path=dest, band_bits=8, planes=planes)

    qrow = emb.where(F.col("vec_id") == 17).collect()[0]
    q = [float(x) for x in qrow.embedding]
    got = knn(
        spark, cat, "emb_mihp_router_t", "embedding", q, 5,
        prefer="mih", prefilter=200, id_col="vec_id",
    ).collect()
    assert len(got) >= 1
    assert got[0].id == 17 and got[0].distance == 0.0
    ds = [r.distance for r in got]
    assert ds == sorted(ds)

    # reload restores the projection marker and the same route
    cat2 = VectorCatalog(str(tmp_path / "cat_proj"))
    ctx = cat2.vector_init(emb, "emb_mihp_router_t", "embedding", "type=FLOAT32,dimension=64,distance=L2")
    assert ctx.mih_planes is not None and len(ctx.mih_planes) == 32
    again = knn(
        spark, cat2, "emb_mihp_router_t", "embedding", q, 5,
        prefer="mih", prefilter=200, id_col="vec_id",
    ).collect()
    assert [(r.id, r.distance) for r in again] == [(r.id, r.distance) for r in got]
