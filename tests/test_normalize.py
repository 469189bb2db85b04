"""Unicode normalization stage (functions/normalize.py): value parity
with DuckDB's nfc_normalize (the oracle engine), agreement with an
independent unicodedata model for the non-NFC forms, the
normalize->strip->collapse ordering contract, NULL passthrough, and
the plan promise that form=None keeps the stage Python-free.
"""

from __future__ import annotations

import unicodedata

import duckdb
import pytest

import pyspark.sql.functions as F

from txtlogparser_spark.functions.normalize import (
    CONTROL_CLASS,
    is_ascii,
    normalize_text,
)

# decomposed e+acute, composed é, Hangul jamo, NBSP, BEL control,
# ligature fi (NFKC-only), combining-mark pileup, pure ASCII, empty
FIXTURE = [
    (0, "café society"),
    (1, "café society"),
    (2, "각 hangul syllable"),
    (3, "non breaking space"),
    (4, "bellanddel"),
    (5, "the ﬁle ligature"),
    (6, "á̂̃ marks"),
    (7, "plain ascii stays"),
    (8, ""),
    (9, None),
]
SCHEMA = "doc_id long, text string"


def _py_model(text, form, strip=True, collapse=False):
    import re

    if text is None:
        return None
    out = unicodedata.normalize(form, text) if form else text
    if strip:
        out = re.sub("[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", "", out)
    if collapse:
        out = re.sub(r"\s+", " ", out).strip()
    return out


class TestValues:
    @pytest.mark.parametrize("form", ["NFC", "NFD", "NFKC", "NFKD"])
    def test_matches_unicodedata(self, spark, form):
        df = spark.createDataFrame(FIXTURE, SCHEMA)
        got = {
            r["doc_id"]: r["norm"]
            for r in normalize_text(
                df, out_col="norm", form=form
            ).collect()
        }
        for d, t in FIXTURE:
            assert got[d] == _py_model(t, form), (form, d)

    def test_nfc_composes_and_nfkc_folds(self, spark):
        df = spark.createDataFrame(FIXTURE, SCHEMA)
        nfc = {
            r["doc_id"]: r["norm"]
            for r in normalize_text(df, out_col="norm", form="NFC").collect()
        }
        # decomposed and composed café agree byte-for-byte after NFC
        assert nfc[0] == nfc[1] == "café society"
        # jamo sequence composes to one syllable
        assert nfc[2].startswith("각")
        # NFC does NOT touch the ligature; NFKC folds it
        assert "ﬁ" in nfc[5]
        nfkc = {
            r["doc_id"]: r["norm"]
            for r in normalize_text(df, out_col="norm", form="NFKC").collect()
        }
        assert nfkc[5] == "the file ligature"
        assert nfkc[3] == "non breaking space"

    def test_ordering_and_collapse(self, spark):
        # NFKC mints a space from NBSP; collapse must see it
        df = spark.createDataFrame([(0, "a   bc")], SCHEMA)
        r = normalize_text(
            df, form="NFKC", collapse_whitespace=True
        ).collect()[0]
        assert r["text"] == "a bc"

    def test_null_and_inplace(self, spark):
        df = spark.createDataFrame(FIXTURE, SCHEMA)
        out = normalize_text(df, form="NFC")  # in place
        assert out.columns == ["doc_id", "text"]
        vals = {r["doc_id"]: r["text"] for r in out.collect()}
        assert vals[9] is None and vals[8] == ""

    def test_bad_form_rejected(self, spark):
        df = spark.createDataFrame(FIXTURE, SCHEMA)
        with pytest.raises(ValueError, match="form must be one of"):
            normalize_text(df, form="NFX")

    def test_is_ascii(self, spark):
        df = spark.createDataFrame(FIXTURE, SCHEMA)
        got = {
            r["doc_id"]: r["a"]
            for r in df.select("doc_id", is_ascii(F.col("text")).alias("a")).collect()
        }
        assert got[7] is True and got[4] is True
        assert got[1] is False and got[3] is False
        assert got[9] is None


class TestDuckDBParity:
    def test_nfc_strip_parity(self, spark):
        """The oracle-engine replay: NFC via nfc_normalize, control
        strip via regexp_replace(..., 'g') — byte-identical output and
        md5 digests on every fixture row."""
        df = spark.createDataFrame([r for r in FIXTURE if r[1] is not None], SCHEMA)
        got = sorted(
            (r["doc_id"], r["norm"], r["h"])
            for r in normalize_text(df, out_col="norm", form="NFC")
            .select("doc_id", "norm", F.md5("norm").alias("h"))
            .collect()
        )
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE t(doc_id BIGINT, text VARCHAR)"
        )
        con.executemany(
            "INSERT INTO t VALUES (?, ?)",
            [r for r in FIXTURE if r[1] is not None],
        )
        want = sorted(
            con.execute(
                f"""
                SELECT doc_id,
                  regexp_replace(nfc_normalize(text), '{CONTROL_CLASS}', '', 'g') AS norm,
                  md5(regexp_replace(nfc_normalize(text), '{CONTROL_CLASS}', '', 'g')) AS h
                FROM t
                """
            ).fetchall()
        )
        assert got == [tuple(w) for w in want]


class TestStreaming:
    def test_stream_matches_batch(self, spark, tmp_path):
        """Stateless stage -> must run unchanged as a Structured
        Streaming transform (incremental crawl-shard ingest); Arrow
        UDF stages are streaming-safe. availableNow parity."""
        d = str(tmp_path / "docs")
        spark.createDataFrame(FIXTURE * 20, SCHEMA).coalesce(2).write.parquet(d)

        def stage(df):
            return normalize_text(
                df, out_col="norm", form="NFKC", collapse_whitespace=True
            )

        batch = sorted(
            map(tuple, stage(spark.read.parquet(d)).collect()),
            key=repr,
        )
        stream = spark.readStream.schema(SCHEMA).parquet(d)
        q = (
            stage(stream)
            .writeStream.format("memory")
            .queryName("norm_stream")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = sorted(
            map(tuple, spark.sql("select * from norm_stream").collect()),
            key=repr,
        )
        assert got == batch and len(got) == len(FIXTURE) * 20


class TestPlan:
    def test_form_none_is_python_free(self, spark):
        df = spark.createDataFrame(FIXTURE, SCHEMA)
        plan = (
            normalize_text(df, form=None, collapse_whitespace=True)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Python" not in plan and "Exchange" not in plan

    def test_nfc_is_one_arrow_stage(self, spark):
        df = spark.createDataFrame(FIXTURE, SCHEMA)
        plan = (
            normalize_text(df, form="NFC")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("ArrowEvalPython") == 1 and "Exchange" not in plan
