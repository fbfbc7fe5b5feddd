"""File-source tests: CSV, JSON-lines, raw text corpus ingest, and
ETL sink formats."""

from __future__ import annotations

import pytest


class TestFileSources:
    def test_csv_roundtrip_with_schema(self, spark, tmp_path):
        from etl_generator_demo_spark.sources.files import read_csv

        p = str(tmp_path / "c")
        spark.createDataFrame(
            [(1, "a", 1.5), (2, "b,with,commas", 2.5)], "k long, s string, v double"
        ).write.option("header", "true").csv(p)
        got = read_csv(spark, p, schema="k long, s string, v double")
        rows = {r["k"]: (r["s"], r["v"]) for r in got.collect()}
        assert rows == {1: ("a", 1.5), 2: ("b,with,commas", 2.5)}
        assert dict(got.dtypes) == {"k": "bigint", "s": "string", "v": "double"}

    def test_csv_permissive_keeps_malformed(self, spark, tmp_path):
        from etl_generator_demo_spark.sources.files import read_csv

        f = tmp_path / "m" ; f.mkdir()
        (f / "x.csv").write_text("k,v\n1,2\nbad_row_no_comma\n3,4\n")
        got = read_csv(spark, str(f), schema="k long, v long").collect()
        assert len(got) == 3  # malformed row survives as nulls, job survives

    def test_jsonl(self, spark, tmp_path):
        from etl_generator_demo_spark.sources.files import read_jsonl

        f = tmp_path / "j" ; f.mkdir()
        (f / "a.jsonl").write_text('{"k": 1, "s": "x"}\n{"k": 2, "s": "y"}\n')
        got = {r["k"]: r["s"] for r in read_jsonl(spark, str(f), "k long, s string").collect()}
        assert got == {1: "x", 2: "y"}

    def test_text_corpus_hash_ids_stable_and_dedupable(self, spark, tmp_path):
        from etl_generator_demo_spark.sources.files import read_text_corpus

        f = tmp_path / "t" ; f.mkdir()
        (f / "a.txt").write_text("alpha beta\ngamma delta\nalpha beta\n")
        hashed = read_text_corpus(spark, str(f), id_from="hash").collect()
        assert len(hashed) == 3
        by_text = {}
        for r in hashed:
            by_text.setdefault(r["text"], set()).add(r["doc_id"])
        assert len(by_text["alpha beta"]) == 1  # duplicate text = same id
        assert all(r["source"] == "a.txt" for r in hashed)

        lined = read_text_corpus(spark, str(f), id_from="line").collect()
        assert len({r["doc_id"] for r in lined}) == 3  # unique even for dups


class TestETLSinkFormats:
    @pytest.fixture()
    def executor(self, spark, catalog, tmp_path):
        from etl_generator_demo_spark.etl import ETLPipelineExecutor

        return ETLPipelineExecutor(spark, catalog, str(tmp_path))

    @pytest.mark.parametrize("fmt", ["csv", "json", "parquet", "orc"])
    def test_sink_format_roundtrip(self, executor, spark, fmt):
        spec = {
            "extract": {"sql": "SELECT r_regionkey, r_name FROM region"},
            "transform": {"steps": []},
            "load": {"target_table": f"region_{fmt}", "write_mode": "overwrite", "format": fmt},
        }
        res = executor.run(spec)
        assert res.rows_written == 5
        assert spark.table(f"region_{fmt}").count() == 5

    def test_unknown_format_rejected(self, executor):
        from etl_generator_demo_spark.etl import ETLSpecError

        spec = {
            "extract": {"sql": "SELECT 1 AS x"},
            "load": {"target_table": "bad_fmt", "format": "xml"},
        }
        with pytest.raises(ETLSpecError, match="format"):
            executor.run(spec)
