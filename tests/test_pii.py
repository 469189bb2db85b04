"""redact_pii (functions/pii.py): Dolma-style email/IP/phone scrub —
semantics pinned, DuckDB parity (RE2-safe patterns; DuckDB needs the
'g' flag to match Spark's global regexp_replace)."""

import duckdb
import pytest

from txtlogparser_spark.functions.pii import PII_PATTERNS, redact_pii

DOCS = [
    (1, "contact alice.smith+spam@example.co.uk or call (555) 123-4567"),
    (2, "server 192.168.1.254 replied; backup at 10.0.0.7"),
    (3, "intl +44 7911 123456 and local 555-0173 x nothing"),
    (4, "clean text with number 12345678 and date 2026-08-18"),
    (5, "two mails: a@b.io c@d.org; ip 8.8.8.8"),
    (6, ""),
    (7, None),  # NULL text: zero counts + '' output, row kept
]


class TestRedactPii:
    def _run(self, spark):
        df = spark.createDataFrame(DOCS, "doc_id long, text string")
        out = redact_pii(df)
        return {
            r["doc_id"]: (
                r["n_email"], r["n_ip"], r["n_phone"], r["clean_text"]
            )
            for r in out.collect()
        }

    def test_semantics_pinned(self, spark):
        got = self._run(spark)
        assert got[1] == (
            1, 0, 1,
            "contact |||EMAIL||| or call |||PHONE|||",
        )
        assert got[2] == (
            0, 2, 0,
            "server |||IP||| replied; backup at |||IP|||",
        )
        assert got[3][0] == 0 and got[3][1] == 0 and got[3][2] == 2
        # plain numbers and ISO dates must NOT be redacted
        assert got[4] == (0, 0, 0, DOCS[3][1])
        # an IP is counted once as IP, never again as phone
        assert got[5] == (2, 1, 0, "two mails: |||EMAIL||| |||EMAIL|||; ip |||IP|||")
        assert got[6] == (0, 0, 0, "")
        # NULL text counts as '' (the paragraph_dedup convention) —
        # a downstream where(n_email = 0) keeps the doc
        assert got[7] == (0, 0, 0, "")

    def test_duckdb_parity(self, spark):
        got = self._run(spark)
        pats = dict(PII_PATTERNS)
        con = duckdb.connect()
        con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO d VALUES (?, ?)", DOCS)
        rows = con.execute(
            """
            WITH s0 AS (SELECT doc_id, COALESCE(text, '') AS t FROM d),
            s1 AS (SELECT doc_id,
                     len(regexp_extract_all(t, ?)) AS n_email,
                     regexp_replace(t, ?, '|||EMAIL|||', 'g') AS t
                   FROM s0),
            s2 AS (SELECT doc_id, n_email,
                     len(regexp_extract_all(t, ?)) AS n_ip,
                     regexp_replace(t, ?, '|||IP|||', 'g') AS t
                   FROM s1),
            s3 AS (SELECT doc_id, n_email, n_ip,
                     len(regexp_extract_all(t, ?)) AS n_phone,
                     regexp_replace(t, ?, '|||PHONE|||', 'g') AS t
                   FROM s2)
            SELECT doc_id, n_email, n_ip, n_phone, t FROM s3
            """,
            [pats["EMAIL"]] * 2 + [pats["IP"]] * 2 + [pats["PHONE"]] * 2,
        ).fetchall()
        want = {r[0]: (int(r[1]), int(r[2]), int(r[3]), r[4]) for r in rows}
        assert got == want

    def test_kinds_subset_and_validation(self, spark):
        df = spark.createDataFrame(DOCS, "doc_id long, text string")
        out = redact_pii(df, kinds=("EMAIL",))
        cols = out.columns
        assert "n_email" in cols and "n_ip" not in cols
        r = {x["doc_id"]: x["clean_text"] for x in out.collect()}
        assert "|||EMAIL|||" in r[1] and "(555) 123-4567" in r[1]
        with pytest.raises(ValueError, match="unknown PII kinds"):
            redact_pii(df, kinds=("EMAIL", "SSN"))

    def test_custom_token_and_no_counts(self, spark):
        df = spark.createDataFrame(DOCS, "doc_id long, text string")
        out = redact_pii(
            df, kinds=("IP",), token_format="<{kind}>", with_counts=False
        )
        assert [c for c in out.columns if c.startswith("n_")] == []
        r = {x["doc_id"]: x["clean_text"] for x in out.collect()}
        assert r[2] == "server <IP> replied; backup at <IP>"

    def test_token_with_replacement_metachars(self, spark):
        """'$' and '\\' in token_format must come out literal — Java's
        replacement string treats them as group refs/escapes."""
        df = spark.createDataFrame(DOCS, "doc_id long, text string")
        out = redact_pii(
            df, kinds=("IP",), token_format="$1\\{kind}$", with_counts=False
        )
        r = {x["doc_id"]: x["clean_text"] for x in out.collect()}
        assert r[2] == "server $1\\IP$ replied; backup at $1\\IP$"
