"""WARC source connector via the Spark 4 Python DataSource API.

Common Crawl ships web pages as WARC (ISO 28500) files: a sequence of
records, each a header block (CRLF-terminated lines, blank-line
terminated) followed by a Content-Length-sized payload. This connector
reads `response` records into the north-star input shape
(url, warc_ts, html) — text extraction stays a downstream stage
(plans/pipeline.extract_stage) so the scan does no per-row Python beyond
the record parse itself.

Scale shape: one InputPartition per WARC file (Common Crawl publishes
~1 GB segment files — a file is the natural split; records are
length-delimited so mid-file splits would need an index). The reader
streams records sequentially per file and never holds more than one
payload in memory. Register once per session:

    spark.dataSource.register(WarcDataSource)
    spark.read.format("warc").load("/path/to/*.warc")  # or dir

Reference parity: the reference ingests pre-extracted text from SQLite
(/root/reference/src/kb_loader/raw_corpus.py); WARC ingestion is the
Spark-native extension the 10^12-page crawl actually arrives as.
"""

from __future__ import annotations

import glob
import os
from datetime import datetime, timezone

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    BinaryType,
    StructField,
    StructType,
    StringType,
    TimestampType,
)

WARC_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
    ]
)


_CHUNK = 1 << 20  # 1 MiB read granularity


def parse_warc_stream(f):
    """Yield (url, warc_ts, payload) response records from a binary file
    object, incrementally — memory held is one record's payload plus one
    read chunk, never the whole file (Common Crawl segments are ~1 GB).

    Tolerant sequential parse: header blocks terminated by CRLFCRLF,
    payload sized by Content-Length, non-response records skipped.
    Malformed or truncated trailing bytes end the scan rather than
    raising — a truncated crawl file yields its complete prefix.
    """
    buf = b""
    while True:
        while b"\r\n\r\n" not in buf:
            chunk = f.read(_CHUNK)
            if not chunk:
                return
            buf += chunk
        head, buf = buf.split(b"\r\n\r\n", 1)
        lines = head.decode("utf-8", "replace").split("\r\n")
        if not lines or not lines[0].startswith("WARC/"):
            return
        fields = {}
        for line in lines[1:]:
            if ":" in line:
                k, v = line.split(":", 1)
                fields[k.strip().lower()] = v.strip()
        try:
            length = int(fields.get("content-length", ""))
        except ValueError:
            return
        while len(buf) < length:
            chunk = f.read(max(_CHUNK, length - len(buf)))
            if not chunk:
                return  # truncated mid-payload: drop the record
            buf += chunk
        body, buf = buf[:length], buf[length:]
        # consume inter-record CRLF separators (may straddle reads)
        while True:
            if buf[:2] == b"\r\n":
                buf = buf[2:]
            elif len(buf) < 2:
                chunk = f.read(_CHUNK)
                if not chunk:
                    break
                buf += chunk
            else:
                break
        if fields.get("warc-type") == "response":
            ts = None
            raw_ts = fields.get("warc-date", "")
            try:
                ts = datetime.strptime(raw_ts, "%Y-%m-%dT%H:%M:%SZ").replace(
                    tzinfo=timezone.utc
                )
            except ValueError:
                pass
            uri = fields.get("warc-target-uri")
            # WARC 1.0 legacy form wraps the URI in angle brackets
            if uri and uri.startswith("<") and uri.endswith(">"):
                uri = uri[1:-1]
            yield uri, ts, body


def parse_warc_records(data: bytes):
    """Buffer-compat wrapper over parse_warc_stream."""
    import io

    yield from parse_warc_stream(io.BytesIO(data))


class _WarcPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class _WarcReader(DataSourceReader):
    def __init__(self, options):
        self.load_path = options.get("path")
        if not self.load_path:
            raise ValueError("warc source requires a path")

    def partitions(self):
        p = self.load_path
        if os.path.isdir(p):
            # Common Crawl publishes *.warc.gz (and .warc.wet.gz); bare
            # *.warc appears in local dumps. Match both — and fail loudly
            # on an empty match rather than returning a silently empty df.
            files = sorted(
                set(glob.glob(os.path.join(p, "*.warc")))
                | set(glob.glob(os.path.join(p, "*.warc.gz")))
                | set(glob.glob(os.path.join(p, "*.warc.*.gz")))
            )
            if not files:
                raise FileNotFoundError(
                    f"warc source: no *.warc or *.warc.gz files under {p}"
                )
        else:
            files = sorted(glob.glob(p)) or [p]
        return [_WarcPartition(f) for f in files]

    def read(self, partition):
        import gzip

        opener = gzip.open if partition.path.endswith(".gz") else open
        with opener(partition.path, "rb") as f:
            yield from parse_warc_stream(f)


class WarcDataSource(DataSource):
    """`spark.read.format("warc").load(path)` → (url, warc_ts, html)."""

    @classmethod
    def name(cls):
        return "warc"

    def schema(self):
        return WARC_SCHEMA

    def reader(self, schema):
        return _WarcReader(self.options)


def write_warc(path: str, pages: list[tuple[str, str, bytes]]) -> None:
    """Serialize (url, iso_ts, html) pages as a spec-shaped WARC file —
    the deterministic fixture generator for tests (no crawl data in the
    sandbox)."""
    with open(path, "wb") as f:
        for url, iso_ts, html in pages:
            head = (
                "WARC/1.0\r\n"
                "WARC-Type: response\r\n"
                f"WARC-Target-URI: {url}\r\n"
                f"WARC-Date: {iso_ts}\r\n"
                f"Content-Length: {len(html)}\r\n"
                "\r\n"
            ).encode()
            f.write(head + html + b"\r\n\r\n")


def warc_webtext(spark, path: str, default_lang: str = "en"):
    """WARC scan adapted to the pipeline's webtext shape. text is null
    (extraction is the pipeline's own first stage); lang is stamped with
    default_lang so the sentence stage's lang filter passes the corpus
    through — in production, chain operators/textstats.lang_id after
    extraction and re-stamp instead of trusting a constant."""
    from pyspark.sql import functions as F

    spark.dataSource.register(WarcDataSource)
    raw = spark.read.format("warc").load(path)
    return raw.select(
        "url",
        "warc_ts",
        "html",
        F.lit(None).cast("string").alias("text"),
        F.lit(default_lang).alias("lang"),
    )
