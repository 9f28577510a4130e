"""Scale-lever tests: bucketed joins drop the shuffle, salted joins
stay correct, corrupt files are isolated per-read."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from gis_etl_spark.io import read_table
from gis_etl_spark.ops.scale import (
    read_parquet_resilient,
    salted_join,
    write_bucketed,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    """Both sides bucketed by the join key → the join plan contains NO
    Exchange: this is what makes recurring 100 TB joins affordable."""
    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS bucketdb LOCATION '{tmp_path}/wh'"
    )
    try:
        orders = read_table(spark, sf_dir, "orders")
        li = read_table(spark, sf_dir, "lineitem")
        write_bucketed(
            orders, "bucketdb.orders_b", ["o_orderkey"], 8,
            sort_cols=["o_orderkey"],
        )
        write_bucketed(
            li, "bucketdb.lineitem_b", ["l_orderkey"], 8,
            sort_cols=["l_orderkey"],
        )
        ob = spark.table("bucketdb.orders_b")
        lb = spark.table("bucketdb.lineitem_b")
        # force the non-broadcast path: at real scale neither side of a
        # fact⋈fact join broadcasts — that's exactly when bucketing pays
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = ob.join(lb, ob.o_orderkey == lb.l_orderkey).groupBy(
                "o_orderpriority"
            ).agg(F.count("*").alias("cnt"))
            plan = _plan(joined)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        assert "SortMergeJoin" in plan
        # exactly ONE shuffle: the final group-by. The join reads
        # co-located buckets — no hashpartitioning exchange on the keys.
        assert plan.count("Exchange hashpartitioning") == 1, plan[:3000]
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        # correctness unchanged vs unbucketed
        want = {
            (r.o_orderpriority, r.cnt)
            for r in orders.join(li, orders.o_orderkey == li.l_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("cnt"))
            .collect()
        }
        got = {(r.o_orderpriority, r.cnt) for r in joined.collect()}
        assert got == want
    finally:
        spark.sql("DROP DATABASE IF EXISTS bucketdb CASCADE")


def test_salted_join_matches_plain_join(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    supp = read_table(spark, sf_dir, "supplier")
    plain = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("l_quantity"), 2).alias("qty"))
    )
    # salted path: key column names must match for the helper
    salted = (
        salted_join(
            li.withColumnRenamed("l_suppkey", "s_suppkey"), supp, "s_suppkey"
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("l_quantity"), 2).alias("qty"))
    )
    want = {(r.s_name, r.cnt, r.qty) for r in plain.collect()}
    got = {(r.s_name, r.cnt, r.qty) for r in salted.collect()}
    assert got == want


def test_resilient_read_skips_corrupt_file(spark, sf_dir, tmp_path):
    out = str(tmp_path / "data")
    src = read_table(spark, sf_dir, "region")
    src.write.parquet(out)
    n = src.count()
    # plant a corrupt parquet file among the healthy ones
    with open(os.path.join(out, "part-junk.parquet"), "wb") as fh:
        fh.write(b"not a parquet file at all" * 10)
    # strict read fails...
    with pytest.raises(Exception, match="[Pp]arquet|footer|magic"):
        spark.read.parquet(out).count()
    # ...resilient read isolates the poison file (east_asia.py:85-91)
    assert read_parquet_resilient(spark, out).count() == n


def test_clustered_layout_enables_row_group_skipping(spark, tmp_path):
    """The payoff of Hilbert clustering + small row groups: a narrow
    hkey-range predicate must (a) push into the parquet scan and
    (b) be skippable for the vast majority of row groups by their
    min/max stats — the mechanism that turns a 100 TB scan into a
    locality query."""
    import glob as _glob

    import pyarrow.parquet as _pq

    from pyspark.sql import functions as F

    from gis_etl_spark.fixtures import ensure_buildings
    from gis_etl_spark.pipelines import buildings as B

    bpath, _ = ensure_buildings(20_000)
    src = spark.read.parquet(bpath).filter(F.col("geom").isNotNull())
    out = str(tmp_path / "clustered")
    B.merge_compact(src, out, max_records_per_file=2_000)

    spans = []
    for f in _glob.glob(out + "/part-*.parquet"):
        md = _pq.ParquetFile(f).metadata
        sch = {md.schema.column(i).name: i for i in range(md.num_columns)}
        ci = sch["hkey"]
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(ci).statistics
            spans.append((st.min, st.max))
    assert len(spans) >= 8, "need several row groups for the claim"
    lo = min(s for s, _ in spans)
    hi = max(e for _, e in spans)
    qlo = lo + (hi - lo) * 45 // 100
    qhi = lo + (hi - lo) * 50 // 100
    skippable = sum(1 for s, e in spans if e < qlo or s > qhi)
    assert skippable / len(spans) > 0.8, (
        f"only {skippable}/{len(spans)} row groups skippable — "
        "clustering regressed"
    )

    scan = spark.read.parquet(out).filter(
        F.col("hkey").between(qlo, qhi)
    )
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters:" in plan and "hkey" in plan.split(
        "PushedFilters:"
    )[1][:200], "hkey range predicate not pushed to the scan"
    # and the filter agrees with a full-scan count
    full = spark.read.parquet(out)
    assert scan.count() == full.filter(
        F.col("hkey").between(qlo, qhi)
    ).count()


def test_copurchase_hub_cap_enforced(spark, sf_dir):
    """The co-purchase hub cap is ENFORCED in-plan, not just
    documented: a synthetic hub customer above the cap contributes
    zero pairs, customers at/below the cap are untouched, and on the
    TPC-H fixture (max degree far below COPURCHASE_HUB_CAP) the capped
    query equals the uncapped projection."""
    import pandas as pd
    from pyspark.sql import functions as F

    from gis_etl_spark.ops.relational import (
        COPURCHASE_HUB_CAP,
        COPURCHASE_MIN_SHARED,
        _copurchase_edges,
        copurchase_pairs_capped,
        supplier_copurchase_pairs,
    )

    # synthetic: customers 1..5 each buy suppliers {10, 11} (degree 2);
    # hub customer 99 buys suppliers 10..19 (degree 10).
    rows = [(c, s) for c in range(1, 6) for s in (10, 11)]
    rows += [(99, s) for s in range(10, 20)]
    edges = spark.createDataFrame(
        pd.DataFrame(rows, columns=["c", "s"])
    )
    edges = edges.join(
        edges.groupBy("c").agg(F.count("*").alias("k")), "c"
    )

    capped = {
        (r.sa, r.sb, r.n_shared)
        for r in copurchase_pairs_capped(edges, cap=5, min_shared=2)
        .collect()
    }
    # hub 99 dropped: only the (10, 11) pair from the 5 small customers
    assert capped == {(10, 11, 5)}

    uncapped = {
        (r.sa, r.sb, r.n_shared)
        for r in copurchase_pairs_capped(edges, cap=10**9, min_shared=1)
        .collect()
    }
    # with the hub admitted it adds 1 to (10,11) and C(10,2)=45 pairs
    # total (44 hub-only ones at n_shared=1)
    assert (10, 11, 6) in uncapped and len(uncapped) == 45

    # TPC-H shape: the production cap never fires, result identical to
    # the uncapped projection (the cap is a guard, not a semantics change)
    prod = supplier_copurchase_pairs(spark, sf_dir)
    tpch_edges = _copurchase_edges(spark, sf_dir)
    assert tpch_edges.agg(F.max("k")).first()[0] <= COPURCHASE_HUB_CAP
    unc = copurchase_pairs_capped(
        tpch_edges, 10**9, COPURCHASE_MIN_SHARED
    )
    assert prod.exceptAll(unc).isEmpty() and unc.exceptAll(prod).isEmpty()


def test_copurchase_list_expansion_equals_self_join(spark):
    """The r18 collect_list + explode×explode pair expansion is
    row-for-row the former self-join rendition — pinned on a synthetic
    frame that includes DUPLICATE (c, s) edges, where the cross-product
    multiplicities (k·k per duplicated pair) are exactly what a
    self-join produces and a set-based rewrite would get wrong."""
    import pandas as pd
    from pyspark.sql import functions as F

    from gis_etl_spark.ops.relational import copurchase_pairs_capped

    rows = [(c, s) for c in range(1, 6) for s in (10, 11, 12)]
    rows += [(99, s) for s in range(10, 20)]
    rows += [(3, 10), (3, 10), (4, 12)]  # duplicate edges
    edges = spark.createDataFrame(pd.DataFrame(rows, columns=["c", "s"]))
    edges = edges.join(
        edges.groupBy("c").agg(F.count("*").alias("k")), "c"
    )

    def self_join_reference(edges, cap, min_shared):
        kept = edges.filter(F.col("k") <= F.lit(cap))
        a = kept.select("c", F.col("s").alias("sa"))
        b = kept.select("c", F.col("s").alias("sb"))
        return (
            a.join(b, "c")
            .filter(F.col("sa") < F.col("sb"))
            .groupBy("sa", "sb")
            .agg(F.count("*").alias("n_shared"))
            .filter(F.col("n_shared") >= min_shared)
        )

    for cap, min_shared in ((5, 1), (10**9, 1), (5, 2)):
        got = {
            (r.sa, r.sb, r.n_shared)
            for r in copurchase_pairs_capped(edges, cap, min_shared)
            .collect()
        }
        want = {
            (r.sa, r.sb, r.n_shared)
            for r in self_join_reference(edges, cap, min_shared).collect()
        }
        assert got == want, f"cap={cap} min_shared={min_shared}"


# --- split-block Bloom semi-join -------------------------------------------


def _bloom_frames(spark):
    fact = spark.range(0, 20_000).withColumn(
        "k", (F.col("id") * 7919) % 10_000
    )
    dim = spark.range(0, 700).select((F.col("id") * 13).alias("dk"))
    return fact, dim


def test_bloom_semi_join_matches_plain_semi(spark):
    """The Bloom prune + exact verify must be bit-identical to a plain
    left_semi — no false negatives (Bloom law), no surviving false
    positives (the verify pass)."""
    from gis_etl_spark.ops.scale import bloom_semi_join

    fact, dim = _bloom_frames(spark)
    got = (
        bloom_semi_join(fact, dim, "k", "dk")
        .groupBy("k").count().orderBy("k").collect()
    )
    want = (
        fact.join(
            dim.select(F.col("dk").alias("k")).distinct(), "k", "left_semi"
        )
        .groupBy("k").count().orderBy("k").collect()
    )
    assert got == want and len(got) > 0


def test_bloom_semi_join_empty_and_disjoint(spark):
    from gis_etl_spark.ops.scale import bloom_semi_join

    fact, _ = _bloom_frames(spark)
    disjoint = spark.range(0, 500).select(
        (F.col("id") + 10_000_000).alias("dk")
    )
    assert bloom_semi_join(fact, disjoint, "k", "dk").count() == 0
    empty = disjoint.filter(F.lit(False))
    assert bloom_semi_join(fact, empty, "k", "dk").count() == 0


def test_bloom_build_is_bounded_and_prunes(spark):
    """The filter relation never exceeds n_words rows (broadcastable by
    construction), and at a deliberately tight sizing the map-side probe
    still prunes ≥ 95% of a disjoint fact side — the property that makes
    the 100 TB verify shuffle cheap."""
    from gis_etl_spark.ops.scale import _bloom_parts, bloom_build

    fact, _ = _bloom_frames(spark)
    disjoint = spark.range(0, 3000).select(
        (F.col("id") + 10_000_000).alias("dk")
    )
    n_words = 512  # ~5.9 keys per 64-bit block: adversarially dense
    blocks = bloom_build(disjoint, "dk", n_words)
    assert blocks.count() <= n_words
    probe = _bloom_parts(fact, "k").withColumn(
        "_bword",
        F.pmod(F.xxhash64(F.col("k"), F.lit(0xB10C)), F.lit(n_words)),
    )
    candidates = (
        probe.join(F.broadcast(blocks), "_bword", "inner")
        .filter(
            F.col("_bloom").bitwiseAND(F.col("_bmask")) == F.col("_bmask")
        )
        .count()
    )
    assert candidates < 0.05 * 20_000, candidates


def test_bloom_semi_join_plan_is_hash_joins_only(spark):
    """Both phases must plan as hash joins (broadcast probe + semi
    verify): no BroadcastNestedLoopJoin, no CartesianProduct, no Python
    stage anywhere."""
    from gis_etl_spark.ops.scale import bloom_semi_join

    fact, dim = _bloom_frames(spark)
    plan = _plan(bloom_semi_join(fact, dim, "k", "dk"))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan


def test_heavy_hitters_exact_under_forced_eviction(spark):
    """heavy_hitters must equal the exact GROUP BY ... HAVING answer
    even when k is tiny enough that every partition's Misra-Gries
    summary contracts many times — the sketch proposes, the verify
    pass decides. Zipf-ish skew + uniform noise across 8 partitions."""
    import math

    from gis_etl_spark.ops.scale import heavy_hitters

    rows = []
    # heavy keys: h0 x 3000, h1 x 1500, h2 x 800, h3 x 400
    for i, n in enumerate((3000, 1500, 800, 400)):
        rows += [(f"h{i}",)] * n
    # 6000 distinct noise keys, once each
    rows += [(f"noise{j}",) for j in range(6000)]
    df = spark.createDataFrame(rows, "key string").repartition(8)

    frac = 0.02  # threshold ceil(0.02 * 11700) = 234
    got = heavy_hitters(df, "key", frac, k=64).collect()
    total = df.count()
    thr = int(math.ceil(frac * total))
    exact = (
        df.groupBy("key").agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= thr)
        .orderBy(F.desc("cnt"), F.asc("key"))
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in exact]
    assert len(got) >= 3  # the skew actually produced heavy hitters


def test_heavy_hitters_empty_and_validation(spark):
    from gis_etl_spark.ops.scale import heavy_hitters

    empty = spark.createDataFrame([], "key string")
    assert heavy_hitters(empty, "key", 0.01).count() == 0
    with pytest.raises(ValueError):
        heavy_hitters(empty, "key", 0.0)


def test_ivfpq_stored_codes_probe_no_shuffle(spark, sf_dir):
    """Receipt for the persisted-ANN-index claim (VERDICT r12 item 3):
    the stored codes table is bucketed by list_id, so when the query
    side outgrows broadcast the probe degrades to a bucketed
    sort-merge join with NO exchange on the corpus-sized side — the
    serving pattern never reshuffles the encoded corpus at any size.
    Also pins that similarity_ivfpq_serve actually reads the stored
    bucketed table (bucketed scan in the executed plan)."""
    from gis_etl_spark.ops.similarity import (
        IVFPQ_INDEX_BUCKETS,
        build_ivfpq_index,
        similarity_ivfpq_serve,
    )

    names = build_ivfpq_index(spark, sf_dir)
    codes = spark.table(names["codes"])

    # the serve plan scans the bucketed store (SelectedBucketsCount
    # appears only on bucket-pruned/bucketed file scans)
    serve_plan = _plan(similarity_ivfpq_serve(spark, sf_dir))
    assert "Bucketed: true" in serve_plan or names["codes"] in serve_plan, (
        serve_plan[:1200]
    )

    probe_t = "t_ivfpq_probe_r13"
    spark.sql(f"DROP TABLE IF EXISTS {probe_t}")
    try:
        # a fat per-(query, probed-list) frame standing in for a query
        # batch too large to broadcast
        (
            codes.select("list_id").distinct()
            .withColumn("query_id", F.lit(0))
            .write.bucketBy(IVFPQ_INDEX_BUCKETS, "list_id")
            .sortBy("list_id")
            .saveAsTable(probe_t)
        )
        saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            probe = spark.table(probe_t).join(codes, "list_id")
            plan = _plan(probe)
            assert "SortMergeJoin" in plan, plan[:800]
            assert "Exchange hashpartitioning" not in plan, plan[:800]
            assert probe.count() > 0
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {probe_t}")


def test_ivfpq_serve_fallback_matches_rerank(spark, sf_dir, monkeypatch):
    """similarity_ivfpq_serve's documented degradation: when the
    catalog is UNWRITABLE (an AnalysisException — the error type a
    read-only warehouse actually raises), it falls back to the in-plan
    chain, the output is identical, and the fallback is RECORDED in
    SERVE_PATH_USED (VERDICT r13 item 4: the silent-fallback artifact)."""
    from pyspark.errors import AnalysisException

    from gis_etl_spark.ops import similarity as SIM

    def boom(*a, **k):
        raise AnalysisException("read-only warehouse")

    monkeypatch.setattr(SIM, "build_ivfpq_index", boom)
    out = SIM.similarity_ivfpq_serve(spark, sf_dir).collect()
    assert SIM.SERVE_PATH_USED == "fallback"
    exp = SIM.similarity_ivfpq_rerank(spark, sf_dir).collect()
    assert out == exp


def test_ivfpq_serve_poisoned_build_raises(spark, sf_dir, monkeypatch):
    """A GENUINE index-build bug must FAIL serve, not silently fall
    back to the in-plan chain (VERDICT r13 item 4): a poisoned
    _coarse_codebook — the training step, not a catalog error —
    propagates out of similarity_ivfpq_serve. Guards the r13 blanket
    `except Exception` from regressing back."""
    import pytest

    from gis_etl_spark.ops import similarity as SIM

    def poisoned(*a, **k):
        raise RuntimeError("poisoned codebook")

    # fresh table names so the build really runs training (and the
    # failed attempt can't touch the session-shared stored index)
    monkeypatch.setattr(
        SIM,
        "ivfpq_index_tables",
        lambda _sd: {
            "coarse": "t_poison_coarse",
            "codebooks": "t_poison_codebooks",
            "codes": "t_poison_codes",
        },
    )
    monkeypatch.setattr(SIM, "_coarse_codebook", poisoned)
    with pytest.raises(RuntimeError, match="poisoned"):
        SIM.similarity_ivfpq_serve(spark, sf_dir)
    assert SIM.SERVE_PATH_USED != "fallback"


def test_ivfpq_index_append_no_retrain(spark, sf_dir):
    """Refresh-story receipt: an increment encodes against the FROZEN
    stored quantizers and appends into the bucketed codes table —
    duplicates of existing vectors get byte-identical codes, the table
    keeps its bucket spec, and the appended rows are probe-visible.
    Restores the original table afterwards (other tests share it)."""
    from gis_etl_spark.ops.similarity import (
        append_to_ivfpq_index,
        build_ivfpq_index,
        similarity_ivfpq_serve,
    )
    from gis_etl_spark.ops.similarity import _emb

    names = build_ivfpq_index(spark, sf_dir)
    codes_t = names["codes"]
    before = spark.table(codes_t).count()
    base = similarity_ivfpq_serve(spark, sf_dir).collect()

    OFF = 10_000_000
    emb = _emb(spark, sf_dir)
    new_emb = emb.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + OFF).alias("vec_id"), "v"
    )
    try:
        append_to_ivfpq_index(spark, sf_dir, new_emb)
        after = spark.table(codes_t)
        assert after.count() == before + 5 * 8  # PQ_M rows per vector
        # frozen-quantizer determinism: clone codes == original codes
        orig = {
            (r["vec_id"], r["m"]): (r["list_id"], r["code"])
            for r in after.filter(F.col("vec_id") < 5).collect()
        }
        clone = {
            (r["vec_id"] - OFF, r["m"]): (r["list_id"], r["code"])
            for r in after.filter(F.col("vec_id") >= OFF).collect()
        }
        assert clone == orig
        # bucket spec survives the append
        ddl = spark.sql(f"DESCRIBE EXTENDED {codes_t}").collect()
        txt = "\n".join(f"{r.col_name} {r.data_type}" for r in ddl)
        assert "Num Buckets 8" in txt, txt
        # appended rows are probe-visible at the ADC stage (the full
        # serve output can't carry them: the exact rerank joins raw
        # vectors, and clones only exist in the codes table): each
        # clone in a probed list must surface with units EQUAL to its
        # original — same codes, same distance table, same sum
        from gis_etl_spark.ops.similarity import (
            _ivfpq_probe_adc,
            _load_ivfpq_index,
        )

        cents, cbs = _load_ivfpq_index(spark, names)
        approx = _ivfpq_probe_adc(spark, emb, after, cents, cbs)
        clone_units = {
            (r["query_id"], r["vec_id"] - OFF): r["units"]
            for r in approx.filter(F.col("vec_id") >= OFF).collect()
        }
        assert clone_units, "no appended candidate reached the probe"
        orig_units = {
            (r["query_id"], r["vec_id"]): r["units"]
            for r in approx.filter(F.col("vec_id") < 5).collect()
        }
        for k, u in clone_units.items():
            if k in orig_units:
                assert orig_units[k] == u, (k, u, orig_units[k])
            else:
                # the one legitimate absence: the original is the
                # query itself (vec_id != query_id filter) — its clone
                # has a different id and stays, proving visibility
                assert k[0] == k[1], (k, sorted(orig_units))
    finally:
        # parquet tables don't support DELETE: rebuild instead
        from gis_etl_spark.ops import similarity as SIM

        for t in names.values():
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        SIM.build_ivfpq_index(spark, sf_dir)
        restored = similarity_ivfpq_serve(spark, sf_dir).collect()
        assert restored == base


def test_incremental_snapshot_bucketed_probe_no_shuffle(spark, tmp_path):
    """Receipt for the SCALE.md §r12 snapshot-layout claim: when the
    crawl increment outgrows broadcast, the incremental-dedup band
    probe degrades to a BUCKETED sort-merge join with ZERO exchanges —
    both the stored snapshot band table and the increment's band table
    are bucketed on the join key, so neither side shuffles at any
    corpus size. Writes the two band tables with bucketBy, disables
    broadcast, and asserts the probe plan is SortMergeJoin with no
    Exchange hashpartitioning."""
    from pyspark.sql import functions as F

    from gis_etl_spark.fixtures import ensure_documents_aug
    from gis_etl_spark.ops.dedup import (
        INC_MOD,
        INC_NEW_REM,
        _band_keys,
        minhash_signature_arrow,
    )

    docs = spark.read.parquet(ensure_documents_aug())
    is_new = F.col("doc_id") % INC_MOD == INC_NEW_REM
    bands = _band_keys(minhash_signature_arrow(docs))
    snap_t = "t_snap_bands_r12"
    new_t = "t_new_bands_r12"
    for t in (snap_t, new_t):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    try:
        (
            bands.filter(~is_new)
            .write.bucketBy(8, "band_idx", "band_key")
            .saveAsTable(snap_t)
        )
        (
            bands.filter(is_new)
            .write.bucketBy(8, "band_idx", "band_key")
            .saveAsTable(new_t)
        )
        saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            probe = spark.table(new_t).join(
                spark.table(snap_t).withColumnRenamed("doc_id", "snap_id"),
                ["band_idx", "band_key"],
            )
            plan = probe._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan, plan[:800]
            assert "Exchange hashpartitioning" not in plan, plan[:800]
            assert probe.count() > 0
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    finally:
        for t in (snap_t, new_t):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bm25_index_append_frozen_stats(spark, sf_dir):
    """Text refresh-story receipt (the ANN append contract applied to
    postings): an increment encodes map-only against the FROZEN stored
    stats and appends into the token-bucketed postings table with the
    delta sentinel rank. Receipts: (a) a delta doc that duplicates an
    existing doc gets per-token scores byte-identical to the original
    postings (frozen stats ⇒ frozen scores); (b) delta rows are
    immediately candidate-visible at serve — the duplicated top-1 doc
    appears in results under its new id; (c) the main index rows are
    untouched. Restores the tables afterwards (other tests share
    them)."""
    from gis_etl_spark.io import read_table
    from gis_etl_spark.ops.text import (
        BM25_DELTA_CRK,
        append_to_bm25_index,
        bm25_topk_stored,
        build_bm25_index,
    )

    names = build_bm25_index(spark, sf_dir)
    posts_t = names["postings"]
    base_rows = spark.table(posts_t).count()
    base_serve = bm25_topk_stored(spark, sf_dir).collect()
    assert base_serve
    # duplicate each query's top-1 doc under a new id
    top_ids = sorted({r["doc_id"] for r in base_serve if r["rank"] == 1})
    OFF = 7_000_000
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    delta = docs.filter(F.col("doc_id").isin(top_ids)).select(
        (F.col("doc_id") + OFF).alias("doc_id"), "text"
    )
    try:
        append_to_bm25_index(spark, sf_dir, delta)
        after = spark.table(posts_t)
        # (c) main rows untouched, delta rows flagged
        assert after.filter(F.col("crk") != BM25_DELTA_CRK).count() == (
            base_rows
        )
        n_delta = after.filter(F.col("crk") == BM25_DELTA_CRK).count()
        assert n_delta > 0
        # (a) frozen stats ⇒ clone scores == original scores per token
        orig = {
            (r["token"], r["doc_id"]): r["sc"]
            for r in after.filter(F.col("doc_id").isin(top_ids)).collect()
        }
        for r in after.filter(F.col("crk") == BM25_DELTA_CRK).collect():
            assert r["sc"] == orig[(r["token"], r["doc_id"] - OFF)]
        # (b) the duplicated top-1 docs serve under their new ids
        served = bm25_topk_stored(spark, sf_dir).collect()
        got_ids = {r["doc_id"] for r in served}
        assert {i + OFF for i in top_ids} <= got_ids
        # per query, the clone ties its original and loses only the
        # doc_id tiebreak: original rank 1, clone rank 2
        by_q = {}
        for r in served:
            by_q.setdefault(r["query_id"], []).append(r)
        for q, rs in by_q.items():
            rs.sort(key=lambda r: r["rank"])
            o = rs[0]
            assert rs[1]["doc_id"] == o["doc_id"] + OFF
            assert rs[1]["score_units"] == o["score_units"]
    finally:
        for t in names.values():
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        build_bm25_index(spark, sf_dir)


def test_bm25_compact_preserves_serve_and_clears_delta(spark, sf_dir):
    """Minor compaction is a no-op to the reader: append a delta (the
    duplicated top-1 docs, as in the append receipt), serve, compact,
    serve again — the two results must be row-identical (scores are
    frozen either way; the θ>UB bound is exact in both layouts) while
    the sentinel rows vanish and the compacted clones hold real
    champion ranks. Untouched tokens' rows pass through byte-identical.
    Restores the tables afterwards."""
    from gis_etl_spark.io import read_table
    from gis_etl_spark.ops.text import (
        BM25_DELTA_CRK,
        append_to_bm25_index,
        bm25_topk_stored,
        build_bm25_index,
        compact_bm25_index,
    )

    names = build_bm25_index(spark, sf_dir)
    posts_t = names["postings"]
    base_serve = bm25_topk_stored(spark, sf_dir).collect()
    top_ids = sorted({r["doc_id"] for r in base_serve if r["rank"] == 1})
    OFF = 7_000_000
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    delta = docs.filter(F.col("doc_id").isin(top_ids)).select(
        (F.col("doc_id") + OFF).alias("doc_id"), "text"
    )
    try:
        append_to_bm25_index(spark, sf_dir, delta)
        before = [
            tuple(r) for r in bm25_topk_stored(spark, sf_dir).collect()
        ]
        # untouched-token passthrough baseline
        touched_toks = {
            r["token"]
            for r in spark.table(posts_t)
            .filter(F.col("crk") == BM25_DELTA_CRK)
            .select("token")
            .distinct()
            .collect()
        }
        untouched_before = {
            (r["token"], r["doc_id"]): (r["tf"], r["sc"], r["crk"])
            for r in spark.table(posts_t)
            .filter(~F.col("token").isin(*touched_toks))
            .collect()
        }

        compact_bm25_index(spark, sf_dir)

        after = [
            tuple(r) for r in bm25_topk_stored(spark, sf_dir).collect()
        ]
        assert before == after and before
        posts = spark.table(posts_t)
        assert posts.filter(F.col("crk") == BM25_DELTA_CRK).count() == 0
        # clones now hold real champion ranks in their token lists
        clone_crk = [
            r["crk"]
            for r in posts.filter(
                F.col("doc_id").isin([i + OFF for i in top_ids])
            ).collect()
        ]
        assert clone_crk and all(c < BM25_DELTA_CRK for c in clone_crk)
        untouched_after = {
            (r["token"], r["doc_id"]): (r["tf"], r["sc"], r["crk"])
            for r in posts.filter(
                ~F.col("token").isin(*touched_toks)
            ).collect()
        }
        assert untouched_after == untouched_before
    finally:
        for t in names.values():
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        build_bm25_index(spark, sf_dir)


def test_bm25_compact_without_delta_is_noop(spark, sf_dir):
    """compact-bm25-index on a clean index (no delta rows) must be a
    safe no-op: the rename-swap still executes, but every posting
    passes through byte-identical and serving is unchanged — the CLI
    can run on any schedule without preconditions."""
    from gis_etl_spark.ops.text import (
        bm25_topk_stored,
        build_bm25_index,
        compact_bm25_index,
    )

    names = build_bm25_index(spark, sf_dir)
    before_posts = {
        (r["token"], r["doc_id"]): (r["tf"], r["sc"], r["crk"])
        for r in spark.table(names["postings"]).collect()
    }
    before_serve = [
        tuple(r) for r in bm25_topk_stored(spark, sf_dir).collect()
    ]
    compact_bm25_index(spark, sf_dir)
    after_posts = {
        (r["token"], r["doc_id"]): (r["tf"], r["sc"], r["crk"])
        for r in spark.table(names["postings"]).collect()
    }
    after_serve = [
        tuple(r) for r in bm25_topk_stored(spark, sf_dir).collect()
    ]
    assert after_posts == before_posts and before_posts
    assert after_serve == before_serve and before_serve


def test_bm25_append_rejects_existing_doc_ids(spark, sf_dir):
    """ADVICE r15 (medium): append_to_bm25_index must refuse an
    increment whose doc_ids already have postings — delta rows for an
    existing doc would silently double-count its score at serve (the
    merge_apply silent-duplicate class). The guard is enforced, not a
    docstring: re-ingesting an existing id raises, and the postings
    table is left untouched."""
    import pytest as _pytest

    from gis_etl_spark.io import read_table
    from gis_etl_spark.ops.text import (
        append_to_bm25_index,
        build_bm25_index,
    )

    names = build_bm25_index(spark, sf_dir)
    base_rows = spark.table(names["postings"]).count()
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    existing = docs.limit(3)  # same ids, already indexed
    with _pytest.raises(ValueError, match="already have postings"):
        append_to_bm25_index(spark, sf_dir, existing)
    assert spark.table(names["postings"]).count() == base_rows


def test_dedup_snapshot_append_extends_history(spark, sf_dir):
    """The stored-snapshot maintenance rung: artifacts appended for an
    ingested batch make the NEXT batch's probe see it — a doc
    duplicated across two batches is detected purely through the rows
    the first batch appended (history itself never recomputed).
    Restores the shared tables afterwards (the stored-probe contract
    query reads them)."""
    from gis_etl_spark.io import read_table
    from gis_etl_spark.ops.dedup import (
        append_to_dedup_snapshot,
        build_dedup_snapshot,
        dedup_snapshot_tables,
    )

    names = build_dedup_snapshot(spark, sf_dir)
    base_counts = {
        role: spark.table(t).count() for role, t in names.items()
    }
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    batch_a = docs.limit(3).select(
        (F.col("doc_id") + 8_000_000).alias("doc_id"), "text", "source"
    )
    batch_b = batch_a.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text", "source"
    )
    try:
        fp_t = spark.table(names["fingerprints"])
        probe_b = fp_t.join(
            batch_b.select(
                F.col("doc_id").alias("new_id"), F.md5("text").alias("fph")
            ),
            "fph",
        )
        assert probe_b.count() == 0  # B's only dups live in A, unseen

        append_to_dedup_snapshot(spark, sf_dir, batch_a)
        for role, t in names.items():
            if role == "members":
                # component labels grow only when the batch carries
                # intra-batch near-dup pairs; this 3-doc batch doesn't
                assert spark.table(t).count() >= base_counts[role]
            else:
                assert spark.table(t).count() > base_counts[role]

        hits = {
            (r["new_id"], r["doc_id"])
            for r in spark.table(names["fingerprints"])
            .join(
                batch_b.select(
                    F.col("doc_id").alias("new_id"),
                    F.md5("text").alias("fph"),
                ),
                "fph",
            )
            .collect()
        }
        want = {
            (r["doc_id"] + 1_000_000, r["doc_id"])
            for r in batch_a.collect()
        }
        assert hits == want and hits
    finally:
        for t in names.values():
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        build_dedup_snapshot(spark, sf_dir)


def test_dedup_snapshot_append_rejects_existing_doc_ids(spark, sf_dir):
    """r16 review: the snapshot append rung enforces NEW doc_ids —
    a re-appended batch would duplicate shingle rows and corrupt the
    stored Jaccard verify (intersection doubles, sizes don't)."""
    import pytest as _pytest

    from gis_etl_spark.io import read_table
    from gis_etl_spark.ops.dedup import (
        INC_MOD,
        INC_NEW_REM,
        append_to_dedup_snapshot,
        build_dedup_snapshot,
    )

    names = build_dedup_snapshot(spark, sf_dir)
    base = {r: spark.table(t).count() for r, t in names.items()}
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    # ids already on the snapshot side of the fixture split
    existing = docs.filter(
        F.col("doc_id") % INC_MOD != INC_NEW_REM
    ).limit(3)
    with _pytest.raises(ValueError, match="already have snapshot"):
        append_to_dedup_snapshot(spark, sf_dir, existing)
    for r, t in names.items():
        assert spark.table(t).count() == base[r]
