"""WARC connector: Python DataSource registration, per-file partitions,
record parse fidelity, and pipeline-compatible schema."""

from thesaurus_based_ner_spark.sources.warc import (
    WarcDataSource,
    parse_warc_records,
    write_warc,
)

PAGES = [
    ("http://a.example/x", "2024-01-02T03:04:05Z", b"<html><p>alpha beta</p></html>"),
    ("http://b.example/y", "2024-02-03T04:05:06Z", b"<html><p>gamma</p></html>"),
]


def test_parse_warc_records_roundtrip(tmp_path):
    p = str(tmp_path / "a.warc")
    write_warc(p, PAGES)
    recs = list(parse_warc_records(open(p, "rb").read()))
    assert [(u, h) for u, _, h in recs] == [(u, h) for u, _, h in PAGES]
    assert recs[0][1].year == 2024 and recs[0][1].month == 1


def test_parse_truncated_file_yields_prefix(tmp_path):
    p = str(tmp_path / "t.warc")
    write_warc(p, PAGES)
    data = open(p, "rb").read()
    recs = list(parse_warc_records(data[: len(data) - 20]))
    assert len(recs) == 1  # second record truncated -> complete prefix only


def test_warc_datasource_reads_files_as_partitions(spark, tmp_path):
    write_warc(str(tmp_path / "a.warc"), PAGES[:1])
    write_warc(str(tmp_path / "b.warc"), PAGES[1:])
    spark.dataSource.register(WarcDataSource)
    df = spark.read.format("warc").load(str(tmp_path))
    assert df.columns == ["url", "warc_ts", "html"]
    rows = sorted(df.collect(), key=lambda r: r.url)
    assert [r.url for r in rows] == [u for u, _, _ in PAGES]
    assert bytes(rows[0].html) == PAGES[0][2]
    # one partition per file
    assert df.rdd.getNumPartitions() == 2


def test_warc_webtext_feeds_extract_stage(spark, tmp_path):
    from thesaurus_based_ner_spark.plans.pipeline import extract_stage
    from thesaurus_based_ner_spark.sources.warc import warc_webtext

    write_warc(str(tmp_path / "a.warc"), PAGES)
    wt = warc_webtext(spark, str(tmp_path))
    out = extract_stage(wt)
    rows = {r.url: r.text for r in out.select("url", "text").collect()}
    assert "alpha beta" in rows["http://a.example/x"]
