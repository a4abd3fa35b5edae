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
