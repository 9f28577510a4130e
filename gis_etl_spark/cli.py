"""Command-line surface — UX parity with the reference's Typer CLI
(east_asia.py:286-419: `main`, `ewkb-stats`, `merge-pqs`).

    python -m gis_etl_spark.cli convert    --input DIR --output DIR
    python -m gis_etl_spark.cli ewkb-stats --input DIR --output DIR
    python -m gis_etl_spark.cli merge-pqs  --input DIR --output DIR
                                           [--max-rows N] [--files N]
    python -m gis_etl_spark.cli heatmap    --input DIR --output DIR
                                           [--res N] [--geojson]
    python -m gis_etl_spark.cli tiles      --input DIR --output DIR
                                           [--zoom N]
    python -m gis_etl_spark.cli dedup-spans --input DIR --output DIR

Inputs: a directory of .shp files (read via the engine's shapefile
source) or of parquet with a WKB geometry column (auto-discovered).
Where the reference loops per file with a process pool, every command
here is one distributed Spark job; restartability comes from
idempotent output checks rather than per-file skip files.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _load_input(spark: SparkSession, path: str) -> DataFrame:
    """Directory of shapefiles → shapefile source; otherwise parquet
    with an auto-discovered WKB geometry column (renamed to `geom`)."""
    from gis_etl_spark.geom.functions import find_geometry_column
    from gis_etl_spark.sources.shapefile import read_shapefile

    if glob.glob(os.path.join(path, "**", "*.shp"), recursive=True) or glob.glob(
        os.path.join(path, "*.shp")
    ):
        df = read_shapefile(spark, path)
        return df.withColumn("epsg", F.lit(None).cast("long"))
    df = spark.read.parquet(path)
    geom_col = find_geometry_column(df)
    if geom_col is None:
        raise SystemExit(
            f"error: no binary WKB geometry column found in {path}"
        )
    if geom_col != "geom":
        df = df.withColumnRenamed(geom_col, "geom")
    if "source" not in df.columns:
        df = df.withColumn("source", F.input_file_name())
    if "epsg" not in df.columns:
        df = df.withColumn("epsg", F.lit(None).cast("long"))
    return df


def cmd_convert(spark: SparkSession, args) -> None:
    """`main` rendition: clean → reproject → flip → Hilbert-clustered
    write (east_asia.py:286-314)."""
    from gis_etl_spark.pipelines.buildings import (
        convert,
        crs_quarantine,
        merge_compact,
    )

    raw = _load_input(spark, args.input)
    df = convert(raw)
    merge_compact(df, args.output, max_records_per_file=args.max_rows)
    # audit pass over (source, epsg) only — column-pruned scan
    for r in crs_quarantine(raw).collect():
        print(
            f"convert: QUARANTINED {r.n_rows} rows from {r.source}: {r.reason}"
        )
    print(f"convert: wrote {args.output}")


def cmd_ewkb_stats(spark: SparkSession, args) -> None:
    """`ewkb-stats` rendition: shape-type census → NDJSON
    (east_asia.py:358-372)."""
    from gis_etl_spark.io import write_ndjson
    from gis_etl_spark.pipelines.buildings import shape_type_census

    census = shape_type_census(_load_input(spark, args.input))
    write_ndjson(census, args.output)
    print(f"ewkb-stats: wrote {args.output}")


def cmd_merge_pqs(spark: SparkSession, args) -> None:
    """`merge-pqs` rendition: provenance-keeping compaction into
    size-balanced Hilbert-clustered files (east_asia.py:376-419)."""
    from gis_etl_spark.pipelines.buildings import merge_compact

    df = _load_input(spark, args.input).filter(F.col("geom").isNotNull())
    merge_compact(
        df,
        args.output,
        max_records_per_file=args.max_rows,
        num_files=args.files,
    )
    print(f"merge-pqs: wrote {args.output}")


def cmd_heatmap(spark: SparkSession, args) -> None:
    """Heatmap pipeline (East-Asia-Building-Footprints.md:243-273):
    parquet cell counts, or GeoJSON features with --geojson."""
    from gis_etl_spark.pipelines.buildings import (
        convert,
        heatmap,
        heatmap_geojson,
    )

    df = convert(_load_input(spark, args.input))
    if args.geojson:
        out = heatmap_geojson(df, res=args.res)
        out.select("geojson").write.mode("overwrite").text(args.output)
    else:
        heatmap(df, res=args.res).write.mode("overwrite").parquet(args.output)
    print(f"heatmap: wrote {args.output}")


def cmd_tiles(spark: SparkSession, args) -> None:
    """Slippy-tile census: per z/x/y (+ quadkey) feature counts —
    the web-map export companion to `heatmap`."""
    from gis_etl_spark.layout.sfc import tile_quadkey, tile_xy
    from gis_etl_spark.pipelines.buildings import convert, with_centroid

    df = with_centroid(convert(_load_input(spark, args.input)))
    cy = F.col("centroid").getField("y")
    cx = F.col("centroid").getField("x")
    tx, ty = tile_xy(cy, cx, args.zoom)
    (
        df.filter((F.abs(cy) <= 85.0) & (F.abs(cx) <= 180.0))
        .select(tx.alias("x"), ty.alias("y"))
        .withColumn(
            "quadkey", tile_quadkey(F.col("x"), F.col("y"), args.zoom)
        )
        .groupBy("x", "y", "quadkey")
        .count()
        .write.mode("overwrite")
        .parquet(args.output)
    )
    print(f"tiles: wrote {args.output} (z={args.zoom})")


def cmd_dedup_spans(spark: SparkSession, args) -> None:
    """Span-level exact dedup over a text corpus (doc_id/text parquet):
    writes (doc_id, n_spans, n_kept, text_dedup)."""
    import gis_etl_spark.ops.dedup as D

    D.dedup_spans(spark, args.input).write.mode("overwrite").parquet(
        args.output
    )
    print(f"dedup-spans: wrote {args.output}")


def cmd_semdedup(spark: SparkSession, args) -> None:
    """SemDeDup over an embedding corpus (vec_id/embedding parquet):
    writes (vec_id, list_id, dropped)."""
    import gis_etl_spark.ops.similarity as S

    S.semdedup(spark, args.input).write.mode("overwrite").parquet(
        args.output
    )
    print(f"semdedup: wrote {args.output}")


def cmd_cdc_compact(spark: SparkSession, args) -> None:
    """Compact an order changelog (orders.parquet) to latest state per
    customer key."""
    import gis_etl_spark.ops.cdc as C

    C.cdc_latest_state(spark, args.input).write.mode("overwrite").parquet(
        args.output
    )
    print(f"cdc-compact: wrote {args.output}")


def cmd_pagerank(spark: SparkSession, args) -> None:
    """Exact-int64 PageRank over the customer-supplier trade graph
    (orders.parquet + lineitem.parquet)."""
    import gis_etl_spark.ops.graph as G

    G.pagerank_trade(spark, args.input).write.mode("overwrite").parquet(
        args.output
    )
    print(f"pagerank: wrote {args.output}")


def cmd_incremental_dedup(spark: SparkSession, args) -> None:
    """Bipartite incremental dedup: the new-crawl increment
    (doc_id % 4 == 3 over the input corpus) probed against the
    snapshot remainder; writes (new_id, snap_id, kind, jaccard)."""
    import gis_etl_spark.ops.dedup as D

    D.incremental_dedup_pairs(
        spark, args.input, docs_path=_docs_path(args.input)
    ).write.mode("overwrite").parquet(args.output)
    print(f"incremental-dedup: wrote {args.output}")


def cmd_hard_negatives(spark: SparkSession, args) -> None:
    """Contrastive hard-negative mining over an embedding corpus
    (vec_id/embedding parquet): writes (query_id, neighbor_id, rank,
    sim)."""
    import gis_etl_spark.ops.similarity as S

    S.similarity_hard_negatives(spark, args.input).write.mode(
        "overwrite"
    ).parquet(args.output)
    print(f"hard-negatives: wrote {args.output}")


def _docs_path(input_dir: str) -> str:
    """Resolve --input to the document corpus parquet: a directory
    holding documents.parquet, or a parquet path/dataset itself."""
    cand = os.path.join(input_dir, "documents.parquet")
    return cand if os.path.exists(cand) else input_dir


def cmd_canonical_dedup(spark: SparkSession, args) -> None:
    """Canonical-keeper dedup over the --input corpus (ADVICE r13: the
    input is honored, not the fixture): near-dup clusters, keep the
    highest-quality member per cluster. Default writes the policy
    table (doc_id, component, quality_score, keeper_id, is_kept);
    --write-survivors writes the KEEPER-ONLY CORPUS instead (the
    artifact a dedup run exists to produce) and prints the per-source
    before/after rollup."""
    import gis_etl_spark.ops.dedup as D

    dp = _docs_path(args.input)
    if args.write_survivors:
        D.apply_keepers_corpus(spark, args.input, docs_path=dp).write.mode(
            "overwrite"
        ).parquet(args.output)
        for r in D.dedup_apply_keepers(
            spark, args.input, docs_path=dp
        ).collect():
            print(
                f"canonical-dedup: {r.source} docs {r.n_docs_before}"
                f" -> {r.n_docs_after}"
                f" tokens {r.n_tokens_before} -> {r.n_tokens_after}"
            )
        print(f"canonical-dedup: wrote survivor corpus {args.output}")
        return
    D.dedup_canonical_keepers(spark, args.input, docs_path=dp).write.mode(
        "overwrite"
    ).parquet(args.output)
    print(f"canonical-dedup: wrote {args.output}")


def cmd_ann_drift(spark: SparkSession, args) -> None:
    """Chart the ANN rebuild-trigger stat for an embedding corpus
    (embeddings.parquet under --input): per coarse list, training-
    corpus quantization error vs the +0.5/dim drift canary against
    the frozen codebook. Writes the per-list table and prints the
    fired lists (drift_x1000 > 1000)."""
    from gis_etl_spark.ops.similarity import ann_drift_stat

    df = ann_drift_stat(spark, args.input)
    df.write.mode("overwrite").parquet(args.output)
    for r in df.collect():
        if r.drift_x1000 is not None and r.drift_x1000 > 1000:
            print(
                f"ann-drift: list {r.list_id} FIRED drift_x1000="
                f"{r.drift_x1000} (n_inc={r.n_inc})"
            )
    print(f"ann-drift: wrote {args.output}")


def cmd_merge_apply(spark: SparkSession, args) -> None:
    """Apply a changelog batch (parquet with an `op` column: I/U/D,
    U and I carrying the full new payload) to a base snapshot on
    --key, writing the merged table — the generic MERGE INTO rung
    behind cdc_merge_apply's contract fixture."""
    from gis_etl_spark.ops.cdc import merge_apply

    base = spark.read.parquet(args.input)
    changes = spark.read.parquet(args.changes)
    merge_apply(base, changes, args.key).write.mode("overwrite").parquet(
        args.output
    )
    n_i = changes.filter(F.col("op") == "I").count()
    n_u = changes.filter(F.col("op") == "U").count()
    n_d = changes.filter(F.col("op") == "D").count()
    print(
        f"merge-apply: applied {n_i} inserts, {n_u} updates, "
        f"{n_d} deletes on key {args.key}; wrote {args.output}"
    )


def cmd_build_corpus(spark: SparkSession, args) -> None:
    """Run the FULL curation funnel over the --input corpus and write
    the training set it selects (keeper-only → quality → PII-clean →
    Hamilton-quota draw), printing the per-source per-stage funnel
    card — the one-command corpus build the policy operators exist
    for."""
    from gis_etl_spark.ops.corpus import (
        build_training_corpus,
        corpus_build_funnel,
        materialize_curation_flags,
    )

    dp = _docs_path(args.input)
    ft = None
    if getattr(args, "flags_table", False):
        ft = materialize_curation_flags(spark, args.input, docs_path=dp)
        print(f"build-corpus: materialized flags table {ft}")
    build_training_corpus(
        spark, args.input, docs_path=dp, flags_table=ft
    ).write.mode("overwrite").parquet(args.output)
    for r in corpus_build_funnel(
        spark, args.input, docs_path=dp, flags_table=ft
    ).collect():
        print(
            f"build-corpus: stage {r.stage_id} {r.stage:13s}"
            f" {r.source:12s} docs {r.n_docs:6d} tokens {r.n_tokens}"
        )
    print(f"build-corpus: wrote training corpus {args.output}")


def cmd_build_dedup_snapshot(spark: SparkSession, args) -> None:
    """Persist the dedup snapshot artifacts for the --input corpus
    (content fingerprints, MinHash band keys, distinct shingles,
    shingle-set sizes — each bucketed on its probe key): the stored
    history every later increment probes instead of re-deriving.
    With --increment, append that batch's artifacts instead (the
    maintenance rung)."""
    from gis_etl_spark.ops.dedup import (
        append_to_dedup_snapshot,
        build_dedup_snapshot,
    )

    dp = _docs_path(args.input)
    if args.increment:
        inc = spark.read.parquet(args.increment)
        names = append_to_dedup_snapshot(
            spark, args.input, inc, docs_path=dp, scope="full"
        )
        print(
            f"build-dedup-snapshot: appended {inc.count()} docs' "
            "artifacts"
        )
    else:
        names = build_dedup_snapshot(
            spark, args.input, docs_path=dp, scope="full"
        )
    for role, t in names.items():
        print(f"build-dedup-snapshot: {role} -> {t}")


def cmd_append_flags(spark: SparkSession, args) -> None:
    """Append an increment's stage flags to the materialized flags
    table — the nightly rung of build-corpus --flags-table: the
    increment is probed against FROZEN history (snapshot fingerprint +
    band probes, intra-increment keeper pass); history's pair graph is
    never re-derived. build-corpus then reads base + increment through
    the same flags table."""
    from gis_etl_spark.ops.corpus import append_curation_flags

    dp = _docs_path(args.input)
    inc = spark.read.parquet(args.increment)
    name = append_curation_flags(spark, args.input, inc, docs_path=dp)
    print(f"append-flags: appended {inc.count()} doc flags to {name}")


def cmd_compact_flags(spark: SparkSession, args) -> None:
    """Minor-compact the materialized flags table: appends accumulate
    one parquet file batch per increment; compaction rewrites the
    table byte-identically into a handful of files (the BM25
    compaction pattern — tmp write + rename swap, serve provably
    unchanged)."""
    from gis_etl_spark.ops.corpus import compact_curation_flags

    dp = _docs_path(args.input)
    name = compact_curation_flags(spark, args.input, docs_path=dp)
    print(f"compact-flags: compacted {name}")


def cmd_ingest_increment(spark: SparkSession, args) -> None:
    """The nightly two-step in its ONLY safe order (probe-then-extend):
    1) append the increment's stage flags against FROZEN history,
    2) extend the stored dedup snapshot with the batch so TOMORROW's
    increment dedups against it. Collapsing the steps into one verb
    removes the mis-ordering that would make every batch doc its own
    stored duplicate (the flags path also guards loudly)."""
    from gis_etl_spark.ops.corpus import append_curation_flags
    from gis_etl_spark.ops.dedup import append_to_dedup_snapshot

    dp = _docs_path(args.input)
    inc = spark.read.parquet(args.increment)
    name = append_curation_flags(spark, args.input, inc, docs_path=dp)
    names = append_to_dedup_snapshot(
        spark, args.input, inc, docs_path=dp, scope="full"
    )
    print(
        f"ingest-increment: appended {inc.count()} doc flags to {name};"
        f" snapshot extended ({names['fingerprints']})"
    )


def cmd_rederive_flags(spark: SparkSession, args) -> None:
    """The monitor→remediation loop as one verb: census the increment
    against the stored snapshot (risky / bridging / chained channels),
    and if any fires, patch the materialized flags table with the
    targeted component re-derive — exact flags restored without a full
    rebuild. Requires append-flags (or ingest-increment) to have run
    for the batch first (append-then-patch; guarded loudly)."""
    from gis_etl_spark.ops.corpus import (
        _risk_pairs_for,
        apply_rederive_to_flags,
        increment_risk_census,
    )
    from gis_etl_spark.ops.dedup import (
        MINHASH_JACCARD_T,
        _exact_jaccard,
        build_dedup_snapshot,
        minhash_candidates,
    )

    dp = _docs_path(args.input)
    inc = spark.read.parquet(args.increment)
    # census AND patch consume the same probe frames — materialize
    # once (the cross-operator localCheckpoint discipline)
    names = build_dedup_snapshot(spark, args.input, dp, "full")
    # This verb runs AFTER ingest-increment extended the snapshot with
    # the batch (append-then-patch), so the probe would see the
    # batch's OWN stored artifacts: exact self-matches are filtered by
    # new_id != snap_id, but an intra-batch near-dup would match its
    # batchmate's stored copy — inflating n_dup_pairs and spuriously
    # firing the chained channel every night such a batch arrives
    # (ADVICE r17). Exclude the batch's ids from the snap side; the
    # intra channel already covers batch-internal linkage.
    batch_snap_ids = inc.select(F.col("doc_id").alias("snap_id"))
    per_pair = (
        _risk_pairs_for(spark, names, inc)
        .join(F.broadcast(batch_snap_ids), "snap_id", "left_anti")
        .localCheckpoint()
    )
    intra = (
        _exact_jaccard(
            inc.select("doc_id", "text"),
            minhash_candidates(inc.select("doc_id", "text")),
        )
        .filter(F.col("jaccard") >= MINHASH_JACCARD_T)
        .select("doc_a", "doc_b")
        .localCheckpoint()
    )
    row = increment_risk_census(
        spark, args.input, inc, docs_path=dp,
        shared_pairs=per_pair, shared_intra=intra,
    ).collect()[0]
    print(
        "rederive-flags: census dup_pairs={} risky_pairs={} "
        "risky_docs={} bridging_docs={} chained_docs={}".format(
            row["n_dup_pairs"], row["n_risky_pairs"],
            row["n_risky_docs"], row["n_bridging_docs"],
            row["n_chained_docs"],
        )
    )
    fired = (
        row["n_risky_docs"] + row["n_bridging_docs"] + row["n_chained_docs"]
    ) > 0
    if not fired:
        print("rederive-flags: approximation exact; nothing to patch")
        return
    name, n = apply_rederive_to_flags(
        spark, args.input, inc, docs_path=dp,
        shared_pairs=per_pair, shared_intra=intra,
    )
    print(f"rederive-flags: patched {n} rows in {name}")


def cmd_build_bm25_index(spark: SparkSession, args) -> None:
    """Build + persist the impact-ordered BM25 serving index for a
    documents corpus (documents.parquet in the input dir): scored
    postings with champion ranks (token-bucketed), per-term stats, and
    corpus scalars as catalog tables. Prints the table names;
    rerunning is a no-op while the corpus fingerprint is unchanged."""
    from gis_etl_spark.ops.text import build_bm25_index

    names = build_bm25_index(spark, args.input)
    for role, table in names.items():
        print(f"build-bm25-index: {role} -> {table}")


def cmd_append_bm25_index(spark: SparkSession, args) -> None:
    """Append an increment's postings to the stored BM25 index under
    the frozen stats (delta rows carry the sentinel rank and are
    force-included as candidates at serve) — the cheap rung between
    build and compact/rebuild. Builds the index from --input on the
    first-ever invocation (idempotent; the CLI catalog is durable
    across processes, so later invocations append to the SAME index —
    receipt: test_cli_appends_survive_across_invocations). Rejects
    doc_ids already indexed."""
    from gis_etl_spark.ops.text import (
        BM25_DELTA_CRK,
        append_to_bm25_index,
        build_bm25_index,
    )

    names = build_bm25_index(spark, args.input)
    inc = spark.read.parquet(args.increment).select("doc_id", "text")
    append_to_bm25_index(spark, args.input, inc)
    n_delta = (
        spark.table(names["postings"])
        .filter(F.col("crk") == BM25_DELTA_CRK)
        .count()
    )
    print(
        f"append-bm25-index: appended {inc.count()} docs; "
        f"{n_delta} delta postings pending compaction in "
        f"{names['postings']}"
    )


def cmd_compact_bm25_index(spark: SparkSession, args) -> None:
    """Fold appended delta postings into the main champion structure
    (frozen stats untouched; serving output provably unchanged) — the
    minor-compaction rung between appends and a full rebuild."""
    from gis_etl_spark.ops.text import (
        BM25_DELTA_CRK,
        bm25_index_tables,
        compact_bm25_index,
    )

    names = bm25_index_tables(args.input)
    if not spark.catalog.tableExists(names["postings"]):
        raise SystemExit(
            f"error: no BM25 index for {args.input} "
            f"(table {names['postings']} not found) — "
            "run build-bm25-index first"
        )
    n_delta = (
        spark.table(names["postings"])
        .filter(F.col("crk") == BM25_DELTA_CRK)
        .count()
    )
    compact_bm25_index(spark, args.input)
    print(
        f"compact-bm25-index: folded {n_delta} delta postings into "
        f"{names['postings']}"
    )


def cmd_build_ann_index(spark: SparkSession, args) -> None:
    """Train + persist the IVFPQ serving index for an embedding corpus
    (embeddings.parquet in the input dir): coarse centroids, residual
    codebooks, and the list_id-bucketed coded corpus as catalog
    tables. Prints the table names; rerunning is a no-op while the
    corpus fingerprint is unchanged."""
    import gis_etl_spark.ops.similarity as S

    names = S.build_ivfpq_index(spark, args.input)
    for role, table in names.items():
        print(f"build-ann-index: {role} -> {table}")


def main(argv: list[str] | None = None) -> None:
    parser = argparse.ArgumentParser(
        prog="gis_etl_spark",
        description="PySpark-native GIS ETL (reference-parity CLI)",
    )
    sub = parser.add_subparsers(dest="cmd", required=True)

    def common(p):
        p.add_argument("--input", required=True)
        p.add_argument("--output", required=True)
        p.add_argument("--master", default=None)

    p = sub.add_parser("convert", help="clean+reproject+flip+clustered write")
    common(p)
    p.add_argument("--max-rows", type=int, default=10_000_000)

    p = sub.add_parser("ewkb-stats", help="shape-type census to NDJSON")
    common(p)

    p = sub.add_parser("merge-pqs", help="compact into clustered files")
    common(p)
    p.add_argument("--max-rows", type=int, default=10_000_000)
    p.add_argument("--files", type=int, default=None)

    p = sub.add_parser("heatmap", help="grid-cell density heatmap")
    common(p)
    p.add_argument("--res", type=int, default=7)
    p.add_argument("--geojson", action="store_true")

    p = sub.add_parser("tiles", help="slippy-tile (z/x/y + quadkey) census")
    common(p)
    p.add_argument("--zoom", type=int, default=10)

    p = sub.add_parser(
        "dedup-spans", help="span-level exact dedup (input dir holds documents.parquet)"
    )
    common(p)

    p = sub.add_parser(
        "semdedup", help="semantic dedup (input dir holds embeddings.parquet)"
    )
    common(p)

    p = sub.add_parser(
        "cdc-compact", help="changelog -> latest state (orders.parquet)"
    )
    common(p)

    p = sub.add_parser(
        "pagerank", help="trade-graph PageRank (orders+lineitem parquet)"
    )
    common(p)

    p = sub.add_parser(
        "incremental-dedup",
        help="new-crawl vs snapshot dedup pairs (documents.parquet)",
    )
    common(p)

    p = sub.add_parser(
        "hard-negatives",
        help="contrastive hard negatives (embeddings.parquet)",
    )
    common(p)

    p = sub.add_parser(
        "canonical-dedup",
        help="keep highest-quality doc per near-dup cluster "
        "(documents.parquet under --input, or --input itself)",
    )
    common(p)
    p.add_argument(
        "--write-survivors",
        action="store_true",
        help="write the keeper-only corpus (instead of the policy "
        "table) and print the per-source before/after rollup",
    )

    p = sub.add_parser(
        "build-ann-index",
        help="persist the IVFPQ serving index (embeddings.parquet)",
    )
    p.add_argument("--input", required=True)
    p.add_argument("--master", default=None)

    p = sub.add_parser(
        "build-bm25-index",
        help="persist the impact-ordered BM25 serving index "
        "(documents.parquet): scored postings + champion ranks",
    )
    p.add_argument("--input", required=True)
    p.add_argument("--master", default=None)

    p = sub.add_parser(
        "append-bm25-index",
        help="append an increment's postings under the frozen stats "
        "(delta sentinel rank; rejects already-indexed doc_ids)",
    )
    p.add_argument("--input", required=True)
    p.add_argument("--increment", required=True)
    p.add_argument("--master", default=None)

    p = sub.add_parser(
        "compact-bm25-index",
        help="fold appended delta postings into the champion "
        "structure (minor compaction; serving output unchanged)",
    )
    p.add_argument("--input", required=True)
    p.add_argument("--master", default=None)

    p = sub.add_parser(
        "build-corpus",
        help="run the full curation funnel and write the training "
        "corpus it selects (prints the per-stage funnel card)",
    )
    common(p)
    p.add_argument(
        "--flags-table",
        action="store_true",
        help="materialize the per-doc stage-flags table once and make "
        "the funnel card, the draw, and the corpus writer read it — "
        "one corpus scan total (the nightly-build posture)",
    )

    p = sub.add_parser(
        "build-dedup-snapshot",
        help="persist (or, with --increment, append to) the stored "
        "dedup snapshot artifacts incremental probes read",
    )
    p.add_argument("--input", required=True)
    p.add_argument("--increment", default=None)
    p.add_argument("--master", default=None)

    p = sub.add_parser(
        "append-flags",
        help="append an increment's stage flags to the materialized "
        "flags table (frozen-history probes, no history re-derive)",
    )
    p.add_argument("--input", required=True)
    p.add_argument("--increment", required=True)
    p.add_argument("--master", default=None)

    p = sub.add_parser(
        "compact-flags",
        help="rewrite the materialized flags table byte-identically "
        "into a handful of files (minor compaction after appends)",
    )
    p.add_argument("--input", required=True)
    p.add_argument("--master", default=None)

    p = sub.add_parser(
        "ingest-increment",
        help="append-flags then extend the dedup snapshot, in the "
        "only safe order (probe-then-extend), as one verb",
    )
    p.add_argument("--input", required=True)
    p.add_argument("--increment", required=True)
    p.add_argument("--master", default=None)

    p = sub.add_parser(
        "rederive-flags",
        help="monitor census for an ingested increment; if the "
        "approximation broke (risky/bridging/chained), patch the "
        "flags table via the targeted component re-derive",
    )
    p.add_argument("--input", required=True)
    p.add_argument("--increment", required=True)
    p.add_argument("--master", default=None)

    p = sub.add_parser(
        "ann-drift",
        help="per-list quantization-error drift vs the frozen "
        "codebook (the rebuild-trigger chart)",
    )
    common(p)

    p = sub.add_parser(
        "merge-apply",
        help="MERGE a changelog batch (op column: I/U/D) into a base "
        "snapshot on --key",
    )
    common(p)
    p.add_argument("--changes", required=True)
    p.add_argument("--key", required=True)

    # every subcommand accepts --warehouse: an explicit directory the
    # durable catalog (Derby metastore + spark-warehouse) lives under,
    # so artifact durability is keyed to the corpus/warehouse choice
    # rather than the shell's cwd (ADVICE r16 — a cwd-keyed catalog
    # silently rebuilds base-only artifacts when invoked elsewhere).
    # Single-writer: Derby locks the directory; run one invocation at
    # a time per warehouse.
    for sp in sub.choices.values():
        sp.add_argument(
            "--warehouse",
            default=None,
            help="directory holding the durable catalog (metastore_db "
            "+ spark-warehouse); defaults to the current working "
            "directory. One CLI invocation at a time per warehouse "
            "(embedded Derby is single-writer).",
        )

    args = parser.parse_args(argv)

    from gis_etl_spark.session import get_spark

    # durable catalog: CLI invocations are separate processes, and the
    # append rungs must SEE the tables a previous invocation wrote —
    # the in-memory catalog would silently rebuild-and-wipe them
    spark = get_spark(
        f"gis-etl-{args.cmd}",
        master=args.master,
        durable_catalog=True,
        warehouse_dir=args.warehouse,
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        {
            "convert": cmd_convert,
            "ewkb-stats": cmd_ewkb_stats,
            "merge-pqs": cmd_merge_pqs,
            "heatmap": cmd_heatmap,
            "tiles": cmd_tiles,
            "dedup-spans": cmd_dedup_spans,
            "semdedup": cmd_semdedup,
            "cdc-compact": cmd_cdc_compact,
            "pagerank": cmd_pagerank,
            "incremental-dedup": cmd_incremental_dedup,
            "hard-negatives": cmd_hard_negatives,
            "canonical-dedup": cmd_canonical_dedup,
            "build-ann-index": cmd_build_ann_index,
            "build-bm25-index": cmd_build_bm25_index,
            "append-bm25-index": cmd_append_bm25_index,
            "compact-bm25-index": cmd_compact_bm25_index,
            "build-corpus": cmd_build_corpus,
            "build-dedup-snapshot": cmd_build_dedup_snapshot,
            "append-flags": cmd_append_flags,
            "compact-flags": cmd_compact_flags,
            "ingest-increment": cmd_ingest_increment,
            "rederive-flags": cmd_rederive_flags,
            "ann-drift": cmd_ann_drift,
            "merge-apply": cmd_merge_apply,
        }[args.cmd](spark, args)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
