"""End-to-end composition of the round-4 curation operators — the
chain a real training-data pipeline runs, verified against ONE
independent pure-Python replay of the whole thing:

  raw docs -> redact_pii -> paragraph_dedup -> bigram-LM ppl filter
           -> bpe_train on survivors -> bpe_segment -> token counts

plus the log side: raw lines -> grok_extract -> typed filter ->
aggregate. Each stage is individually oracled in its own suite; this
test pins that the CONTRACTS compose (column names, NULL conventions,
determinism) without glue code.
"""

import math

import pyspark.sql.functions as F

from txtlogparser_spark.functions.grok import grok_extract
from txtlogparser_spark.functions.pii import redact_pii
from txtlogparser_spark.operators.bpe import EOW, bpe_segment, bpe_train
from txtlogparser_spark.operators.dedup import paragraph_dedup
from txtlogparser_spark.operators.lm import bigram_lm_train, lm_score

BOILER = "SUBSCRIBE NOW for updates"
DOCS = [
    (1, f"the cat sat on the mat\n\n{BOILER}\n\nemail me at a@b.io"),
    (2, f"{BOILER}\n\nthe dog sat on the rug"),
    (3, "the cat and the dog sat quietly"),
    (4, "zz qq xx vv kk jj ww yy"),  # out-of-domain junk -> high ppl
    (5, f"{BOILER}"),                 # pure boilerplate -> hollow
]
REF = [
    (101, "the cat sat on the mat"),
    (102, "the dog sat on the rug"),
    (103, "a cat and a dog sat"),
]


def _py_chain(docs, ref, ppl_max):
    import re

    # 1. pii
    email = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
    docs = [(d, email.sub("|||EMAIL|||", t)) for d, t in docs]
    # 2. paragraph dedup (first occurrence by (doc, pos))
    seen = {}
    for d, t in sorted(docs):
        for pos, p in enumerate(t.split("\n\n")):
            seen.setdefault(p, (d, pos))
    cleaned = {}
    for d, t in docs:
        kept = [
            p for pos, p in enumerate(t.split("\n\n")) if seen[p] == (d, pos)
        ]
        cleaned[d] = "\n\n".join(kept)
    # 3. LM ppl filter (add-1 bigram, BOS, lowercase)
    big, ctx, vocab = {}, {}, set()
    for _, t in ref:
        ws = t.lower().split()
        for i, w in enumerate(ws):
            prev = "<s>" if i == 0 else ws[i - 1]
            big[(prev, w)] = big.get((prev, w), 0) + 1
            ctx[prev] = ctx.get(prev, 0) + 1
            vocab.add(w)
    V = len(vocab) + 1
    survivors = {}
    for d, t in cleaned.items():
        ws = [w for w in t.lower().split() if w]
        if not ws:
            continue
        lps = [
            math.log2(
                (big.get(("<s>" if i == 0 else ws[i - 1], w), 0) + 1)
                / (ctx.get("<s>" if i == 0 else ws[i - 1], 0) + V)
            )
            for i, w in enumerate(ws)
        ]
        ppl = round(2.0 ** -round(sum(lps) / len(lps), 6), 6)
        if ppl <= ppl_max:
            survivors[d] = t
    return survivors


class TestCurationChain:
    def test_corpus_chain_composes(self, spark):
        docs = spark.createDataFrame(DOCS, "doc_id long, text string")
        ref = spark.createDataFrame(REF, "doc_id long, text string")

        # 1. scrub PII (emails become sentinels, counted)
        scrubbed = redact_pii(docs, kinds=("EMAIL",))
        assert {
            r["doc_id"]: r["n_email"] for r in scrubbed.collect()
        } == {1: 1, 2: 0, 3: 0, 4: 0, 5: 0}

        # 2. drop duplicated boilerplate paragraphs corpus-wide
        deduped = paragraph_dedup(
            scrubbed.select("doc_id", F.col("clean_text").alias("text")),
            keep_empty_docs=False,
        )

        # 3. perplexity-gate against a reference LM
        big, ctx, V = bigram_lm_train(ref)
        scored = lm_score(
            deduped.select("doc_id", F.col("clean_text").alias("text")),
            big, ctx, V,
        )
        # measured on this fixture: in-domain ppl <= 7.6, junk 10.3 —
        # 9.0 splits with margin on both sides (deterministic)
        PPL_MAX = 9.0
        kept_ids = {
            r["doc_id"] for r in scored.where(F.col("ppl") <= PPL_MAX).collect()
        }
        survivors = deduped.where(F.col("doc_id").isin(list(kept_ids)))

        # the Python replay of stages 1-3 agrees exactly
        want = _py_chain(DOCS, REF, PPL_MAX)
        got = {
            r["doc_id"]: r["clean_text"] for r in survivors.collect()
        }
        assert got == want
        # junk doc 4 gated out by ppl; boilerplate doc 5 emptied by dedup
        assert 4 not in got and 5 not in got and 1 in got

        # 4. learn a tokenizer on survivors and segment them
        surv_txt = survivors.select(
            "doc_id", F.col("clean_text").alias("text")
        )
        merges = bpe_train(surv_txt, 8)
        assert len(merges) >= 4
        seg = bpe_segment(surv_txt, merges)
        toks = {r["doc_id"]: r["bpe_tokens"] for r in seg.collect()}
        assert set(toks) == set(want)
        for d, t in want.items():
            # token stream reconstructs the cleaned text modulo EOW
            flat = "".join(toks[d]).replace(EOW, " ").strip()
            assert flat == " ".join(t.lower().split())
        big.unpersist()

    def test_log_chain_composes(self, spark):
        lines = [
            (1, '10.0.0.1 - alice "GET /a" 200'),
            (2, '10.0.0.2 - bob "POST /b" 500'),
            (3, "junk"),
            (4, '10.0.0.3 - carol "GET /a" 200'),
        ]
        df = spark.createDataFrame(lines, "id long, line string")
        out = grok_extract(
            df,
            '%{IPV4:client} - %{USERNAME:user} "%{WORD:method} %{URIPATH:path}" %{INT:status:int}',
            keep_unmatched=False,
        )
        agg = {
            (r["path"], r["status"]): r["n"]
            for r in out.groupBy("path", "status")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert agg == {("/a", 200): 2, ("/b", 500): 1}


SHARED = "the quick brown fox jumps over the lazy dog"  # 9-word run
SEL_DOCS = [
    (1, "web", f"{SHARED} and many other useful words follow here"),
    (2, "web", f"intro words then {SHARED} tail content of the page"),
    (3, "web", "totally unique web content about the weather and the sea today"),
    (4, "code", "def main of the and that code have with words return value"),
    (5, "code", "1 2 3 4 5 6 7 8 9 10"),  # numeric soup: fails gopher
    (6, "code", f"other code {SHARED} more code of the and that here"),
]


def _py_selection_chain(rows, k, total_budget, tau, min_words):
    """Independent replay of gopher gate -> substring strip ->
    temperature-weighted token-budget mix."""
    import hashlib
    from collections import Counter

    stop = {"the", "be", "to", "of", "and", "that", "have", "with"}

    def gopher_ok(t):
        ws = t.split()  # whitespace split (fixture has no leading ws)
        if not (min_words <= len(ws) <= 100_000):
            return False
        mean = sum(len(w) for w in ws) / len(ws)
        if not (3 <= mean <= 10):
            return False
        alpha = sum(1 for w in ws if any(c.isalpha() for c in w)) / len(ws)
        if alpha < 0.8:
            return False
        hits = len({w.lower() for w in ws} & stop)
        return hits >= 2

    gated = [(d, s, t) for d, s, t in rows if gopher_ok(t)]

    occ = []
    for d, _, t in gated:
        w = t.split(" ")
        for pos in range(len(w) - k + 1):
            occ.append((" ".join(w[pos : pos + k]), d, pos))
    counts = Counter(g for g, _, _ in occ)
    keeper = {}
    for g, d, p in sorted(occ, key=lambda x: (x[1], x[2])):
        keeper.setdefault(g, (d, p))
    marks = {}
    for g, d, p in occ:
        if counts[g] > 1 and keeper[g] != (d, p):
            marks.setdefault(d, []).append(p)
    cleaned = []
    for d, s, t in gated:
        w = t.split(" ")
        covered = set()
        for p in marks.get(d, []):
            covered.update(range(p, p + k))
        kept = [x for i, x in enumerate(w) if i not in covered]
        cleaned.append((d, s, " ".join(kept), len(kept)))

    totals = {}
    for _, s, _, n in cleaned:
        totals[s] = totals.get(s, 0) + n
    weights = {s: c ** tau for s, c in totals.items() if c > 0}
    z = sum(weights.values())
    budgets = {
        s: min(totals[s], int(total_budget * w / z))
        for s, w in weights.items()
    }
    sel = {}
    for s in budgets:
        cum = 0
        group = [(d, g, n) for d, gs, g, n in cleaned if gs == s]
        order = sorted(
            group,
            key=lambda x: (
                "0" + hashlib.md5(f"mix:{x[0]}".encode()).hexdigest()[:8],
                x[0],
            ),
        )
        for d, g, n in order:
            if cum < budgets[s]:
                sel[d] = g
                cum += n
    return sel


class TestSelectionChain:
    def test_gate_strip_mix_composes(self, spark):
        """gopher_flags gate -> strip_duplicated_spans -> n_tok ->
        temperature_budgets -> token_budget_mix, against ONE Python
        replay of the whole selection chain."""
        from txtlogparser_spark.functions.text import gopher_flags
        from txtlogparser_spark.operators.dedup import strip_duplicated_spans
        from txtlogparser_spark.operators.sampling import (
            temperature_budgets,
            token_budget_mix,
        )

        K, BUDGET, TAU, MIN_WORDS = 4, 30, 0.7, 8
        docs = spark.createDataFrame(
            SEL_DOCS, "doc_id long, source string, text string"
        )
        # 1. quality gate (min_words lowered for the small fixture;
        #    bullet/ellipsis/symbol rules still active at defaults)
        gated = docs.where(
            gopher_flags("text", min_words=MIN_WORDS)["gopher_pass"]
        )
        assert {r["doc_id"] for r in gated.collect()} == {1, 2, 3, 4, 6}

        # 2. corpus-wide substring dedup over the gated corpus
        stripped = strip_duplicated_spans(
            gated.select("doc_id", "text"), k=K
        ).join(docs.select("doc_id", "source"), "doc_id")
        # first occurrence of the shared run survives in doc 1 only
        by_id = {r["doc_id"]: r for r in stripped.collect()}
        assert by_id[1]["n_words_removed"] == 0
        assert by_id[2]["n_words_removed"] > 0
        assert by_id[6]["n_words_removed"] > 0

        # 3. temperature-weighted token-budget mix over clean tokens
        corpus = stripped.select(
            "doc_id",
            "source",
            F.col("clean_text").alias("text"),
            (F.size(F.split("clean_text", " "))
             - (F.col("clean_text") == "").cast("int")).alias("n_tok"),
        )
        totals = {
            r["source"]: int(r["tot"])
            for r in corpus.groupBy("source")
            .agg(F.sum("n_tok").alias("tot"))
            .collect()
        }
        budgets = temperature_budgets(totals, BUDGET, tau=TAU)
        picked = token_budget_mix(corpus, budgets, salt="mix")
        got = {r["doc_id"]: r["text"] for r in picked.collect()}

        want = _py_selection_chain(SEL_DOCS, K, BUDGET, TAU, MIN_WORDS)
        assert got == want
        assert 5 not in got  # gated before dedup ever saw it
