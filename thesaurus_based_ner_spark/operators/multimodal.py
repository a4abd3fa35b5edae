"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schema, partition sizing, Arrow batch shape, UDF
signatures) is real and tested; the actual codec work is STUBBED because
image/audio libraries are not in this container — each decoder raises
NotImplementedError unless `fake=True`, which substitutes a deterministic
fake decoder so the distributed plumbing can be exercised end-to-end.

Pattern: mapInPandas with an iterator so per-executor init (codec setup,
model load) happens once per task, not per batch — the same pattern the
reference needs for spaCy models (SURVEY.md §2.11 U3/U4).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, mime string, meta string"
)

FEATURE_SCHEMA = (
    "media_id bigint, kind string, n_bytes bigint, sha256 string, "
    "width int, height int, n_frames int, feature array<float>"
)


def _fake_decode(payload: bytes) -> tuple[int, int, int, list[float]]:
    """Deterministic stand-in for a real decoder: derives a stable
    pseudo-geometry + 8-dim feature from the payload bytes. sha256-based
    so an ANSI-SQL oracle can mirror it bit-exactly (multimodal_features
    in plans/queries_ext.py)."""
    h = hashlib.sha256(payload).digest()
    width = 16 + h[0] % 64
    height = 16 + h[1] % 64
    n_frames = 1 + h[2] % 8
    feat = [round(b / 255.0, 6) for b in h[3:11]]
    return width, height, n_frames, feat


def decode_and_featurize(
    media: DataFrame, fake: bool = False, batch_hint: int = 1024
) -> DataFrame:
    """binary payload → geometry + feature vector, Arrow-batched.

    Real deployment plugs a codec into `decode`; the Spark plan (scan →
    mapInPandas → downstream joins) is identical either way. Partition
    sizing note: binary payloads dominate row size — set
    spark.sql.files.maxPartitionBytes so a partition's payloads fit
    executor memory; the iterator form never holds more than one Arrow
    batch.
    """

    def run(batches):
        import pandas as pd

        decode = _fake_decode
        if not fake:
            def decode(payload):  # pragma: no cover - stub
                raise NotImplementedError(
                    "media codecs not available in this environment; "
                    "pass fake=True for the deterministic test decoder"
                )
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                raw = bytes(payload)
                w, h, nf, feat = decode(raw)
                rows.append(
                    (
                        int(mid),
                        kind,
                        len(raw),
                        hashlib.sha256(raw).hexdigest(),
                        w,
                        h,
                        nf,
                        feat,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "kind",
                    "n_bytes",
                    "sha256",
                    "width",
                    "height",
                    "n_frames",
                    "feature",
                ],
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def synth_media(spark, n_rows: int = 64) -> DataFrame:
    """Deterministic fake media table for plumbing tests."""
    rows = []
    for i in range(n_rows):
        payload = hashlib.md5(f"media:{i}".encode()).digest() * (1 + i % 5)
        kind = ["image", "audio", "video"][i % 3]
        rows.append((i, kind, payload, f"application/x-fake-{kind}", "{}"))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def resize_plan(
    features: DataFrame, target_w: int, target_h: int
) -> DataFrame:
    """Aspect-preserving resize GEOMETRY (new_w, new_h ≤ targets).

    Pure integer arithmetic, entirely JVM-side: the resize *plan* (what
    every downstream stage needs for batching/layout decisions) never
    requires touching pixels. The pixel kernel itself is codec work —
    stubbed in this container like decode (see module docstring); a real
    deployment maps the planned geometry over mapInPandas with the codec.
    Integer `div` keeps the math bit-identical across engines for the
    SQL oracle.
    """
    land = F.col("width") * target_h >= F.col("height") * target_w
    new_w = F.when(land, F.lit(target_w)).otherwise(
        F.expr(f"(width * {target_h}) div height")
    )
    new_h = F.when(land, F.expr(f"(height * {target_w}) div width")).otherwise(
        F.lit(target_h)
    )
    return features.withColumn("new_w", new_w.cast("int")).withColumn(
        "new_h", new_h.cast("int")
    )


def sample_frames(features: DataFrame, n_samples: int) -> DataFrame:
    """Evenly-spaced deterministic frame indices for video rows.

    frame_idx = (i * n_frames) div n_samples for i in 0..n_samples-1,
    deduplicated (short videos yield fewer distinct frames). A broadcast
    cross join with a tiny index range + integer div — no Python, no HOF
    lambdas, engine-portable. Frame EXTRACTION at those indices is codec
    work (stubbed); this operator is the planning/fan-out stage every
    video pipeline needs before the decode kernel.
    """
    spark = features.sparkSession
    idx = spark.range(n_samples).withColumnRenamed("id", "__i")
    return (
        features.filter(F.col("kind") == "video")
        .crossJoin(F.broadcast(idx))
        .withColumn(
            "frame_idx",
            F.expr(f"(__i * n_frames) div {n_samples}").cast("int"),
        )
        .drop("__i")
        .dropDuplicates(["media_id", "frame_idx"])
    )
