"""URL/domain operators (functions/url.py): parsing, eTLD+1
heuristic, blocklist filtering, per-domain stats.

Pinned here: (1) parse semantics incl. userinfo/port stripping, junk
URLs, and case folding, (2) the registered-domain heuristic on plain
TLDs, two-level suffixes, deep subdomains and bare hosts, (3)
domain_filter's drop/keep contract with a broadcast-only plan, (4)
bit-exact DuckDB replay of parse + domain extraction, (5)
domain_stats aggregation.
"""

import duckdb
import pyspark.sql.functions as F

from txtlogparser_spark.functions.url import (
    domain_filter,
    domain_stats,
    registered_domain,
    url_parts,
)

URLS = [
    (0, "https://www.example.com/a/b?q=1#f"),
    (1, "http://blog.sample.co.uk/post"),
    (2, "https://user:pw@deep.news.example.com:8443/x"),
    (3, "ftp://files.data.org"),
    (4, "https://EXAMPLE.com/UPPER"),
    (5, "not a url at all"),
    (6, "https://localhost/dev"),
    (7, "https://a.b.c.d.sample.co.uk:80/deep?x=2"),
]


def _parsed(spark):
    df = spark.createDataFrame(URLS, "doc_id long, url string")
    p = url_parts(F.col("url"))
    return {
        r["doc_id"]: (r["scheme"], r["host"], r["path"], r["dom"])
        for r in df.select(
            "doc_id",
            p["scheme"].alias("scheme"),
            p["host"].alias("host"),
            p["path"].alias("path"),
            registered_domain(p["host"]).alias("dom"),
        ).collect()
    }


class TestParse:
    def test_parts_and_domains(self, spark):
        got = _parsed(spark)
        assert got[0] == ("https", "www.example.com", "/a/b", "example.com")
        assert got[1] == ("http", "blog.sample.co.uk", "/post", "sample.co.uk")
        assert got[2] == ("https", "deep.news.example.com", "/x", "example.com")
        assert got[3] == ("ftp", "files.data.org", "", "data.org")
        assert got[4] == ("https", "example.com", "/UPPER", "example.com")
        assert got[5] == ("", "", "", "")  # junk falls out as empties
        assert got[6] == ("https", "localhost", "/dev", "localhost")
        assert got[7][3] == "sample.co.uk"


class TestFilter:
    def test_drop_and_keep(self, spark):
        df = spark.createDataFrame(URLS, "doc_id long, url string")
        bl = spark.createDataFrame([("example.com",)], "domain string")
        dropped = sorted(r["doc_id"] for r in domain_filter(df, bl).collect())
        kept = sorted(
            r["doc_id"] for r in domain_filter(df, bl, keep=True).collect()
        )
        assert kept == [0, 2, 4]
        assert dropped == [1, 3, 5, 6, 7]

    def test_broadcast_plan(self, spark):
        df = spark.createDataFrame(URLS, "doc_id long, url string")
        bl = spark.createDataFrame([("example.com",)], "domain string")
        plan = (
            domain_filter(df, bl)._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan
        assert "Exchange hashpartitioning" not in plan


class TestStats:
    def test_domain_stats(self, spark):
        df = spark.createDataFrame(URLS, "doc_id long, url string")
        got = {
            r["domain"]: (r["n_docs"], r["n_hosts"], r["sum_ids"])
            for r in domain_stats(df).collect()
        }
        assert got["example.com"] == (3, 3, 6)  # docs 0, 2, 4
        assert got["sample.co.uk"] == (2, 2, 8)  # docs 1, 7


class TestDuckDBParity:
    SQL = """
        WITH p AS (
          SELECT doc_id,
            regexp_extract(url, '^([a-z][a-z0-9+.-]*)://', 1) AS scheme,
            lower(
              string_split(
                string_split(
                  regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/?#]*)', 1),
                  '@')[-1],
                ':')[1]
            ) AS host,
            regexp_extract(url, '^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)', 1)
              AS path
          FROM urls
        ),
        d AS (
          SELECT doc_id, scheme, host, path,
            string_split(host, '.') AS ls
          FROM p
        )
        SELECT doc_id, scheme, host, path,
          CASE
            WHEN len(ls) <= 2 THEN host
            WHEN (ls[-2] || '.' || ls[-1]) IN
              ('co.uk','ac.uk','gov.uk','org.uk','co.jp','ne.jp','or.jp',
               'com.au','net.au','org.au','com.br','com.cn','com.mx',
               'co.in','co.kr','co.za')
              THEN ls[-3] || '.' || ls[-2] || '.' || ls[-1]
            ELSE ls[-2] || '.' || ls[-1]
          END AS dom
        FROM d ORDER BY doc_id
    """

    def test_replay(self, spark):
        got = _parsed(spark)
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE urls AS SELECT * FROM (VALUES "
            + ",".join("(%d, '%s')" % (d, u) for d, u in URLS)
            + ") t(doc_id, url)"
        )
        oracle = {
            r[0]: tuple(r[1:]) for r in con.execute(self.SQL).fetchall()
        }
        assert got == oracle
