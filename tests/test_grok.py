"""Grok front-end (functions/grok.py): compile checks, Spark
extraction, and DuckDB regexp parity (the pattern library is
RE2-compatible by construction, so the same compiled regex runs in
both engines)."""

import duckdb
import pytest

from txtlogparser_spark.functions.grok import (
    GrokError,
    grok_compile,
    grok_extract,
    grok_match,
)

ACCESS = "%{IPV4:client} - %{USERNAME:user} \\[%{DATA:ts}\\] \"%{HTTPMETHOD:method} %{URIPATH:path}\" %{INT:status:int} %{INT:size:long}"

LINES = [
    (1, '10.0.0.1 - alice [2026-08-18T06:00:01Z] "GET /api/v1/items" 200 512'),
    (2, '192.168.7.13 - bob-2 [2026-08-18T06:00:02Z] "POST /submit" 201 1024'),
    (3, "malformed line with no access fields"),
    (4, '8.8.8.8 - carol [ts] "DELETE /x" 404 0'),
]


class TestGrokCompile:
    def test_fields_and_groups_in_order(self):
        g = grok_compile(ACCESS)
        assert [f for f, _ in g.fields] == [
            "client", "user", "ts", "method", "path", "status", "size",
        ]
        assert [c for _, c in g.fields] == [
            None, None, None, None, None, "int", "bigint",
        ]
        import re

        m = re.search(g.regex, LINES[0][1])
        assert m and m.group(1) == "10.0.0.1" and m.group(6) == "200"

    def test_recursive_definitions_expand(self):
        # NUMBER -> BASE10NUM, IP -> IPV4
        g = grok_compile("%{NUMBER:v:double} %{IP:addr}")
        import re

        m = re.search(g.regex, "-3.25 1.2.3.4")
        assert m.group(1) == "-3.25" and m.group(2) == "1.2.3.4"

    def test_unknown_pattern_raises(self):
        with pytest.raises(GrokError, match="unknown"):
            grok_compile("%{NOPE:x}")

    def test_cycle_raises(self):
        with pytest.raises(GrokError, match="recursive"):
            grok_compile("%{A:x}", extra_patterns={"A": "%{B}", "B": "%{A}"})

    def test_capturing_group_in_definition_rejected(self):
        with pytest.raises(GrokError, match="capturing"):
            grok_compile("%{BAD:x}", extra_patterns={"BAD": "(a|b)"})
        # non-capturing and escaped parens are fine
        grok_compile("%{OK:x}", extra_patterns={"OK": r"(?:a|b)\("})

    def test_field_binding_inside_definition_rejected(self):
        with pytest.raises(GrokError, match="may not bind"):
            grok_compile(
                "%{OUTER:x}", extra_patterns={"OUTER": "%{INT:inner}"}
            )

    def test_duplicate_fields_rejected(self):
        with pytest.raises(GrokError, match="duplicate"):
            grok_compile("%{INT:a} %{INT:a}")

    def test_capturing_group_in_literal_text_rejected(self):
        # '(a|b)' in the literal part would shift every field's group
        with pytest.raises(GrokError, match="capturing group in pattern literal"):
            grok_compile("(a|b)%{INT:n}")
        grok_compile("(?:a|b)%{INT:n}")  # non-capturing fine

    def test_named_groups_are_capturing(self):
        # (?P<x>...) and (?<x>...) capture despite the '(?' spelling
        with pytest.raises(GrokError, match="capturing"):
            grok_compile("%{H:f}", extra_patterns={"H": r"(?P<h>x|y)z"})
        with pytest.raises(GrokError, match="capturing"):
            grok_compile("%{H:f}", extra_patterns={"H": r"(?<h>x|y)z"})
        # lookbehinds do NOT capture and stay allowed
        grok_compile("%{H:f}", extra_patterns={"H": r"(?<=a)b(?<!c)"})

    def test_malformed_token_rejected_not_silently_literal(self):
        with pytest.raises(GrokError, match="malformed"):
            grok_compile("%{INT:x:str} done")  # bad type suffix
        with pytest.raises(GrokError, match="malformed"):
            grok_compile("%{int:x}")  # lowercase name never parses
        # ... and inside definition bodies too
        with pytest.raises(GrokError, match="malformed.*definition"):
            grok_compile("%{H:f}", extra_patterns={"H": "%{int:x}y"})

    def test_hostname_is_linear_on_long_unmatched_tokens(self):
        """The old ((label)?\\.?)+ spelling was catastrophic in Java's
        backtracker; a long alnum run with a failing suffix must
        return (not hang) quickly."""
        import re as _re
        import time

        g = grok_compile("%{HOSTNAME:h}:%{POSINT:port}")
        line = "x" * 300 + " no port here"
        t0 = time.perf_counter()
        assert _re.search(g.regex, line) is None
        assert time.perf_counter() - t0 < 1.0


class TestGrokExtract:
    def _df(self, spark):
        return spark.createDataFrame(LINES, "id long, line string")

    def test_extracts_typed_fields(self, spark):
        out = grok_extract(self._df(spark), ACCESS).orderBy("id").collect()
        assert out[0]["client"] == "10.0.0.1"
        assert out[0]["method"] == "GET"
        assert out[0]["status"] == 200 and isinstance(out[0]["status"], int)
        assert out[1]["size"] == 1024
        assert dict(out[0].asDict())["path"] == "/api/v1/items"
        # unmatched line -> NULL fields, row kept
        assert out[2]["client"] is None and out[2]["status"] is None

    def test_schema_types(self, spark):
        out = grok_extract(self._df(spark), ACCESS)
        t = dict((f.name, f.dataType.simpleString()) for f in out.schema.fields)
        assert t["status"] == "int" and t["size"] == "bigint"
        assert t["client"] == "string"

    def test_drop_unmatched(self, spark):
        out = grok_extract(self._df(spark), ACCESS, keep_unmatched=False)
        assert {r["id"] for r in out.collect()} == {1, 2, 4}

    def test_grok_match_column(self, spark):
        df = self._df(spark).withColumn("ok", grok_match(ACCESS))
        got = {r["id"]: r["ok"] for r in df.collect()}
        assert got == {1: True, 2: True, 3: False, 4: True}

    def test_duckdb_parity(self, spark):
        """The same compiled regex extracts identical fields in DuckDB
        (RE2) — the oracle surface for grok-parsed pipelines."""
        g = grok_compile(ACCESS)
        srows = {
            r["id"]: (r["client"], r["user"], r["method"], r["status"], r["size"])
            for r in grok_extract(self._df(spark), ACCESS).collect()
        }
        con = duckdb.connect()
        con.execute("CREATE TABLE lines (id BIGINT, line VARCHAR)")
        con.executemany("INSERT INTO lines VALUES (?, ?)", LINES)
        drows = {}
        for rid, client, user, method, status, size in con.execute(
            f"""
            SELECT id,
              CASE WHEN regexp_matches(line, ?) THEN regexp_extract(line, ?, 1) END,
              CASE WHEN regexp_matches(line, ?) THEN regexp_extract(line, ?, 2) END,
              CASE WHEN regexp_matches(line, ?) THEN regexp_extract(line, ?, 4) END,
              CASE WHEN regexp_matches(line, ?) THEN CAST(regexp_extract(line, ?, 6) AS INT) END,
              CASE WHEN regexp_matches(line, ?) THEN CAST(regexp_extract(line, ?, 7) AS BIGINT) END
            FROM lines
            """,
            [g.regex] * 10,
        ).fetchall():
            drows[rid] = (client, user, method, status, size)
        assert srows == drows

    def test_field_column_collision_raises(self, spark):
        df = self._df(spark)
        with pytest.raises(GrokError, match="collide"):
            grok_extract(df, "%{WORD:line} %{INT:n}")  # 'line' is the source col
        with pytest.raises(GrokError, match="collide"):
            grok_extract(df, "%{INT:id}")  # existing column

    def test_sentinel_delimiter_row_falls_back_correctly(self, spark):
        """A line containing the internal join delimiter must extract
        via the per-field fallback with identical values."""
        from txtlogparser_spark.functions.grok import _DELIM

        rows = [
            (1, f"10.0.0.1 - alice 200 junk{_DELIM}tail"),
            (2, "10.0.0.2 - bob 404"),
        ]
        df = spark.createDataFrame(rows, "id long, line string")
        out = {
            r["id"]: (r["client"], r["st"])
            for r in grok_extract(
                df, "%{IPV4:client} - %{USERNAME:u} %{INT:st:int}"
            ).select("id", "client", "st").collect()
        }
        assert out == {1: ("10.0.0.1", 200), 2: ("10.0.0.2", 404)}

    def test_multiline_and_null_lines(self, spark):
        rows = [(1, "prefix\n10.9.9.9 - x 200\nsuffix"), (2, None)]
        df = spark.createDataFrame(rows, "id long, line string")
        out = {
            r["id"]: (r["client"], r["st"])
            for r in grok_extract(
                df, "%{IPV4:client} - %{USERNAME:u} %{INT:st:int}"
            ).select("id", "client", "st").collect()
        }
        assert out == {1: ("10.9.9.9", 200), 2: (None, None)}

    def test_more_than_nine_fields_group_refs(self, spark):
        """$10+ replacement refs must parse as multi-digit groups."""
        pat = " ".join(f"%{{INT:f{i}:int}}" for i in range(12))
        df = spark.createDataFrame(
            [(1, " ".join(str(i * 11) for i in range(12)))],
            "id long, line string",
        )
        r = grok_extract(df, pat).collect()[0]
        assert [r[f"f{i}"] for i in range(12)] == [i * 11 for i in range(12)]

    def test_streaming_grok(self, spark, tmp_path):
        """grok_extract is a stateless map stage, so it must compose
        with Structured Streaming unchanged (readStream -> extract ->
        memory sink) and match the batch result."""
        import json

        src = tmp_path / "in"
        src.mkdir()
        (src / "a.json").write_text(
            "\n".join(json.dumps({"id": i, "line": l}) for i, l in LINES)
        )
        sdf = (
            spark.readStream.schema("id long, line string")
            .json(str(src))
        )
        out = grok_extract(sdf, ACCESS, keep_unmatched=False)
        q = (
            out.select("id", "client", "status")
            .writeStream.format("memory")
            .queryName("grok_stream")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        got = {
            r["id"]: (r["client"], r["status"])
            for r in spark.sql("SELECT * FROM grok_stream").collect()
        }
        batch = {
            r["id"]: (r["client"], r["status"])
            for r in grok_extract(
                spark.createDataFrame(LINES, "id long, line string"),
                ACCESS,
                keep_unmatched=False,
            ).collect()
        }
        assert got == batch and set(got) == {1, 2, 4}

    def test_timestamp_and_loglevel_patterns(self, spark):
        df = spark.createDataFrame(
            [
                (1, "2026-08-18T06:00:01.250Z WARN disk low"),
                (2, "2026-08-18 06:00:02 ERROR boom"),
            ],
            "id long, line string",
        )
        out = grok_extract(
            df, "%{TIMESTAMP_ISO8601:ts} %{LOGLEVEL:level} %{GREEDYDATA:msg}"
        ).collect()
        got = {r["id"]: (r["ts"], r["level"], r["msg"]) for r in out}
        assert got == {
            1: ("2026-08-18T06:00:01.250Z", "WARN", "disk low"),
            2: ("2026-08-18 06:00:02", "ERROR", "boom"),
        }
