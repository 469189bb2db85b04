"""bpe_train / bpe_segment (operators/bpe.py) vs a pure-Python
reference implementation of classic word-frequency BPE (Sennrich et
al. 2016). Determinism claims: integer pair counts, (count DESC, pair
ASC) tie-break, left-to-right merge application — the Spark merge list
must equal the reference model's exactly, at any partitioning."""

import pytest

from txtlogparser_spark.operators.bpe import (
    EOW,
    bpe_segment,
    bpe_train,
    word_freq_table,
)

CORPUS = [
    (1, "low low low lower lower"),
    (2, "newest newest newest widest"),
    (3, "low newest the the the the"),
]


def _py_word_freq(docs):
    freq = {}
    for _, text in docs:
        for w in text.lower().split():
            if w:
                freq[w] = freq.get(w, 0) + 1
    return freq


def _py_apply(syms, left, right):
    out = []
    for x in syms:
        if out and out[-1] == left and x == right:
            out[-1] = left + right
        else:
            out.append(x)
    return out


def _py_bpe(docs, n_merges, min_pair_count=2):
    freq = _py_word_freq(docs)
    words = {w: (list(w) + [EOW], n) for w, n in freq.items()}
    merges = []
    for rank in range(n_merges):
        pairs = {}
        for syms, n in words.values():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        (left, right), c = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if c < min_pair_count:
            break
        merges.append((rank, left, right, c))
        words = {
            w: (_py_apply(syms, left, right), n)
            for w, (syms, n) in words.items()
        }
    return merges


class TestBpeTrain:
    def _df(self, spark, docs=CORPUS):
        return spark.createDataFrame(docs, "doc_id long, text string")

    def test_word_freq_table(self, spark):
        got = {
            r["word"]: r["n"]
            for r in word_freq_table(self._df(spark)).collect()
        }
        assert got == _py_word_freq(CORPUS)

    def test_merges_match_python_model(self, spark):
        got = bpe_train(self._df(spark), 12)
        want = _py_bpe(CORPUS, 12)
        assert got == want
        # the corpus genuinely yields learnable merges
        assert len(got) >= 8
        # ranks are sequential and counts non-increasing never guaranteed
        # (BPE counts can rise after merges) — but ranks must be 0..k-1
        assert [m[0] for m in got] == list(range(len(got)))

    def test_partition_invariance(self, spark):
        df = self._df(spark)
        a = bpe_train(df.repartition(1), 6)
        b = bpe_train(df.repartition(5, "doc_id"), 6)
        assert a == b

    def test_early_stop_on_min_pair_count(self, spark):
        # tiny corpus: once every remaining pair is a singleton, stop
        df = self._df(spark, [(1, "ab ab cd")])
        merges = bpe_train(df, 50, min_pair_count=2)
        want = _py_bpe([(1, "ab ab cd")], 50, min_pair_count=2)
        assert merges == want
        assert len(merges) < 50

    def test_validation(self, spark):
        with pytest.raises(ValueError):
            bpe_train(self._df(spark), -1)

    def test_segment_replays_merges(self, spark):
        df = self._df(spark)
        merges = bpe_train(df, 10)
        seg = {
            r["doc_id"]: r["bpe_tokens"]
            for r in bpe_segment(df, merges).collect()
        }
        # python replay: per word, chars+EOW then merges in rank order
        freq_words = {}
        for doc_id, text in CORPUS:
            toks = []
            for w in text.lower().split():
                syms = list(w) + [EOW]
                for _, left, right, _c in merges:
                    syms = _py_apply(syms, left, right)
                toks.extend(syms)
            freq_words[doc_id] = toks
        assert seg == freq_words
        # every EOW-terminated piece boundary survives: token stream of
        # doc 1 must reconstruct its words
        joined = "".join(seg[1]).replace(EOW, " ").strip()
        assert joined == "low low low lower lower"

    def test_segment_pandas_parity(self, spark):
        """The Arrow-vectorized rank-priority segmenter must produce
        exactly the Catalyst fold chain's output (rank-priority ==
        rank-order replay: a merge can only create pairs of HIGHER
        rank, so priority order never reorders applications)."""
        from txtlogparser_spark.operators.bpe import bpe_segment_pandas

        df = self._df(spark)
        merges = bpe_train(df, 10)
        a = {
            r["doc_id"]: r["bpe_tokens"]
            for r in bpe_segment(df, merges).collect()
        }
        b = {
            r["doc_id"]: r["bpe_tokens"]
            for r in bpe_segment_pandas(df, merges).collect()
        }
        assert a == b

    def test_segment_pandas_parity_null_and_unicode_ws(self, spark):
        """The two segmenters must also agree on NULL text (both NULL)
        and non-ASCII whitespace (Java \\s is ASCII-only, so NBSP does
        NOT split — Python str.split() would)."""
        from txtlogparser_spark.operators.bpe import bpe_segment_pandas

        train = self._df(spark)
        merges = bpe_train(train, 6)
        docs = [(1, None), (2, "low\u00a0low"), (3, "low low")]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        a = {
            r["doc_id"]: r["bpe_tokens"]
            for r in bpe_segment(df, merges).collect()
        }
        b = {
            r["doc_id"]: r["bpe_tokens"]
            for r in bpe_segment_pandas(df, merges).collect()
        }
        assert a == b
        assert a[1] is None
        # NBSP glues the words into ONE token stream unit
        assert a[2] != a[3]

    def test_learned_units_are_sensible(self, spark):
        """'low' repeated 4x and 'newest' 4x: BPE must learn 'low</w>'
        and 'est</w>' units within 12 merges."""
        merges = bpe_train(self._df(spark), 12)
        formed = {left + right for _, left, right, _c in merges}
        assert "low" + EOW in formed or "low" in formed
        assert any(u.endswith("est" + EOW) or u == "est" for u in formed)


class TestSegmentReplaceReplay:
    """The driver oracle for bpe_segment replays the Catalyst merge fold
    in DuckDB as chained non-overlapping string replaces over
    per-symbol-delimited strings (chr(1)||sym||chr(2) — every symbol
    carries its own boundaries, so a replacement can never share a
    delimiter with the next match). This pins the equivalence on the
    adversarial shapes: run merges (a,a over 'aaaa'), chained merges
    ((aa,a) after (a,a)), merges whose right side is EOW, and symbols
    formed by earlier merges."""

    MERGES = [
        (0, "e", "r", 0), (1, "e", "</w>", 0), (2, "n", "</w>", 0),
        (3, "er", "</w>", 0), (4, "o", "w", 0), (5, "ow", "</w>", 0),
        (6, "o", "r", 0), (7, "s", "t", 0),
        (8, "a", "a", 0), (9, "aa", "a", 0),
    ]
    DOCS = [
        (1, "power steer row order fast"),
        (2, "aaaa aaa aa a"),          # run-merge: fold pairs L->R
        (3, "eee ee e"),               # (e,r)/(e,EOW) interplay
        (4, "stow stower"),            # chained: s+t, o+w, ow+EOW
        (5, "x"),                      # no merge applies
        (6, "row row row owow"),       # repeated words + embedded 'ow'
    ]

    def test_fold_equals_duckdb_replace_replay(self, spark):
        import duckdb

        df = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        got = {
            r["doc_id"]: r["bpe_tokens"]
            for r in bpe_segment(df, self.MERGES).collect()
        }
        expr = "s"
        for _, l, r, _c in self.MERGES:
            le, re_ = l.replace("'", "''"), r.replace("'", "''")
            expr = (
                f"replace({expr}, "
                f"chr(1) || '{le}' || chr(2) || chr(1) || '{re_}' || chr(2), "
                f"chr(1) || '{le}{re_}' || chr(2))"
            )
        con = duckdb.connect()
        con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?, ?)", self.DOCS)
        rows = con.execute(rf"""
            WITH w AS (
              SELECT doc_id, i AS wi, ws[i] AS wd
              FROM (SELECT doc_id,
                           list_filter(regexp_split_to_array(lower(text), '\s+'),
                                       x -> x != '') AS ws
                    FROM documents),
                   unnest(range(1, len(ws) + 1)) AS t(i)
            ),
            sym0 AS (
              SELECT doc_id, wi,
                array_to_string(list_transform(range(1, length(wd) + 1),
                                               i -> chr(1) || wd[i] || chr(2)), '')
                  || chr(1) || '</w>' || chr(2) AS s
              FROM w
            ),
            m AS (SELECT doc_id, wi, {expr} AS s FROM sym0),
            tok AS (
              SELECT doc_id, wi,
                string_split(substr(s, 2, length(s) - 2), chr(2) || chr(1)) AS toks
              FROM m
            )
            SELECT doc_id, flatten(list(toks ORDER BY wi)) AS all_toks
            FROM tok GROUP BY doc_id ORDER BY doc_id
        """).fetchall()
        want = {r[0]: list(r[1]) for r in rows}
        assert got == want
