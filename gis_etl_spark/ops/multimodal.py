"""Multimodal-column operators [north-star]: treat image/audio/video as
opaque BinaryType payloads with typed metadata, exactly the WKB-column
pattern the geometry subsystem uses (SURVEY.md §2.11).

Real pixel/sample decoding needs libs this container doesn't ship
(PIL/av); per the brief those steps are STUBBED behind import-tries,
while the Spark-side plumbing — schema, Arrow batching, mapInPandas
iteration, partitioned fan-out — is real and tested:

- decode_meta      — byte-level header parse (mapInPandas), verified
                     against the fixture's stored metadata columns by
                     the DuckDB oracle;
- extract_features — deterministic featurizer: payload → 16-dim
                     embedding (hash-seeded), i.e. the exact batch
                     shape of a CLIP-style encoder with a fake kernel;
- sample_frames    — native explode(sequence) fan-out of video frames
                     (1 row per sampled frame), no Python;
- decode_image     — the honest stub: raises NotImplementedError
                     unless PIL is importable.

Scale notes: payloads dominate bytes — every metadata-only query must
prune the payload column (Parquet columnar layout gives this for free;
decode_meta selects only what it parses). Feature extraction is the
one Arrow-heavy pass; maxRecordsPerBatch bounds executor memory.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
)

from gis_etl_spark.fixtures import MEDIA_MAGIC, ensure_media

FEATURE_DIM = 16

META_SCHEMA = (
    "media_id long, kind string, dec_width int, dec_height int, "
    "dec_channels int, dec_n_frames int, dec_n_bytes int, valid boolean"
)


def _media(spark: SparkSession) -> DataFrame:
    return spark.read.parquet(ensure_media())


def _parse_header(buf: bytes | None) -> tuple[int, int, int, int, bool]:
    """NULL, truncated, or wrong-magic payloads → valid=False row, never
    an exception: a 100 TB corpus always contains garbage rows."""
    if buf is None or buf[:4] != MEDIA_MAGIC or len(buf) < 13:
        return 0, 0, 0, 0, False
    w, h, ch, nf = struct.unpack_from("<HHBI", buf, 4)
    return w, h, ch, nf, True


def decode_meta(df: DataFrame) -> DataFrame:
    """Byte-level metadata decode over Arrow batches (mapInPandas) —
    the plumbing a real image decoder plugs into. Selects only the
    columns it needs so Parquet prunes the rest."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [
                _parse_header(None if b is None else bytes(b))
                for b in pdf["payload"]
            ]
            arr = pd.DataFrame(
                parsed,
                columns=[
                    "dec_width", "dec_height", "dec_channels",
                    "dec_n_frames", "valid",
                ],
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "kind": pdf["kind"].to_numpy(),
                    "dec_width": arr["dec_width"],
                    "dec_height": arr["dec_height"],
                    "dec_channels": arr["dec_channels"],
                    "dec_n_frames": arr["dec_n_frames"],
                    "dec_n_bytes": [
                        0 if b is None else len(bytes(b))
                        for b in pdf["payload"]
                    ],
                    "valid": arr["valid"],
                }
            )

    return df.select("media_id", "kind", "payload").mapInPandas(
        run, schema=META_SCHEMA
    )


@F.pandas_udf(ArrayType(FloatType()))
def extract_features(payload: pd.Series) -> pd.Series:
    """Deterministic fake featurizer: sha256(payload) seeds a 16-dim
    unit vector — the batch shape of a real encoder; swap the kernel
    for PIL/torch when available."""

    def feat(b):
        if b is None:
            return None
        seed = int.from_bytes(hashlib.sha256(bytes(b)).digest()[:8], "little")
        rng = np.random.default_rng(seed)
        v = rng.standard_normal(FEATURE_DIM)
        return (v / np.linalg.norm(v)).astype(np.float32).tolist()

    return payload.map(feat)


def decode_image(payload_bytes: bytes):
    """Real pixel decode — stubbed (no imaging libs in this
    environment, SURVEY.md §2.11)."""
    try:
        from PIL import Image  # noqa: PLC0415
        import io  # noqa: PLC0415

        return Image.open(io.BytesIO(payload_bytes))
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError(
            "pixel decoding requires PIL; this environment ships none — "
            "metadata/feature paths are fully functional without it"
        ) from exc


def sample_frames(df: DataFrame, every: int = 30) -> DataFrame:
    """Video frame sampling as a native fan-out: one row per sampled
    frame index — explode(sequence(0, n_frames-1, every)), no Python."""
    return (
        df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0), F.col("n_frames") - 1, F.lit(every)
                )
            ).alias("frame_idx"),
        )
    )


# --- contract queries -------------------------------------------------------

def multimodal_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decoded metadata per kind, verified by the oracle against the
    fixture's stored columns — proves the byte-level decode."""
    dec = decode_meta(_media(spark))
    return (
        dec.filter(F.col("valid"))
        .groupBy("kind")
        .agg(
            F.count("*").alias("n"),
            F.sum("dec_width").cast("bigint").alias("sum_width"),
            F.sum("dec_height").cast("bigint").alias("sum_height"),
            F.sum("dec_n_frames").cast("bigint").alias("sum_frames"),
            F.sum("dec_n_bytes").cast("bigint").alias("sum_bytes"),
        )
        .orderBy("kind")
    )


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled video frames — countable by the oracle from n_frames."""
    return (
        sample_frames(_media(spark), every=30)
        .groupBy("media_id")
        .agg(F.count("*").alias("n_sampled"))
        .orderBy("media_id")
    )


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction pass: per-kind mean feature norm (≈1.0) and
    count — rows-only (hash-seeded kernel is not SQL-expressible)."""
    feats = _media(spark).select(
        "media_id", "kind", extract_features(F.col("payload")).alias("f")
    )
    norm = F.sqrt(
        F.aggregate(
            F.transform("f", lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return (
        feats.select("kind", norm.alias("nrm"))
        .groupBy("kind")
        .agg(F.count("*").alias("n"), F.round(F.avg("nrm"), 3).alias("avg_norm"))
        .orderBy("kind")
    )


def oracle_sqls() -> dict[str, str]:
    path = ensure_media()
    m = f"read_parquet('{path}')"
    return {
        "multimodal_decode_meta": f"""
            SELECT kind, count(*) AS n,
                   sum(width)::BIGINT AS sum_width,
                   sum(height)::BIGINT AS sum_height,
                   sum(n_frames)::BIGINT AS sum_frames,
                   sum(n_bytes)::BIGINT AS sum_bytes
            FROM {m} GROUP BY kind ORDER BY kind
        """,
        "multimodal_frame_sample": f"""
            SELECT media_id, ((n_frames - 1) // 30 + 1)::BIGINT AS n_sampled
            FROM {m} WHERE kind = 'video' ORDER BY media_id
        """,
    }
