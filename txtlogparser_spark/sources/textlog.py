"""Raw-log ingestion: arbitrary text log files → the tokenized-sequences
table the engine consumes (doc_id, tokens:array<int32>, n_tok, source).

The reference reads log files line-by-line with a load-time scrub
(OutputData.cpp:67-96: drop trailing newline, strip one trailing '\\r',
interior '\\r' → ' '); the engine's canonical input is the pre-tokenized
sequence table (BASELINE.json input_hint). This module closes the gap —
the text→tokens half of the S1 source — so arbitrary logs can enter the
pipeline, with a lossless tokens→text→tokens round trip when the
vocabulary covers the corpus (pinned by tests/test_textlog_ingest.py).

Scale shapes (everything JVM-side; no Python in the hot path):

- scrub: two regexp_replace calls, codegen.
- line numbering: per-file partitioned window ordered by the split's
  byte offset (_metadata.file_block_start) then
  monotonically_increasing_id() — ids are monotone within a split and
  splits sort by true offset, so file order is reproduced without a
  global window and without assuming anything about partition-index
  assignment.
- tokenize, small vocab (≤ `MAP_LITERAL_MAX` entries): a literal
  map<string,int> lookup inside transform() — whole-stage codegen, zero
  shuffle, zero UDF.
- tokenize, large vocab: posexplode → broadcast-join the vocab dim →
  re-assemble with array_sort over (pos, id) structs. Shuffles only
  (doc_id, pos, id) triples; the vocab dim is broadcast.
- vocab build: distinct words of the corpus → dense sorted ids WITHOUT
  any driver collect or single-partition window: with_global_index
  partitioned by the word's first character (a prefix of the sort key,
  so per-partition rank + broadcast offsets reproduce the global sorted
  rank). Vocab cardinality can be millions; persist the dim once for
  repeated ingestion.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession, Window

UNK_ID = -1  # detokenizers map any out-of-range id to "<unk>"

MAP_LITERAL_MAX = 10_000


def scrub_expr(col: Column) -> Column:
    """Load-time line scrub (OutputData.cpp:78-90): strip ONE trailing
    '\\r' (the trailing '\\n' is already consumed by the line reader),
    then replace interior '\\r' with ' '. Matches oracle.matcher.scrub_line
    after its newline strip.

    \\z, not $: Java's '$' also matches BEFORE a final line terminator,
    so '\\r$' on a line ending in two CRs strips both ('ab\\r\\r' ->
    'ab'), while the reference strips exactly one and spaces the rest
    ('ab '). \\z anchors to the true end of input only."""
    return F.regexp_replace(F.regexp_replace(col, "\r\\z", ""), "\r", " ")


def read_log_lines(
    spark: SparkSession, path: str, *, source: Optional[str] = None
) -> DataFrame:
    """spark.read.text → (source, line_no, text): scrubbed lines with
    0-based per-file line numbers. `source` overrides the per-file name
    (basename without extension) when ingesting a single logical source."""
    # lineSep pinned to '\n': Hadoop's default reader also splits on bare
    # '\r', but the reference reads '\n'-delimited lines and scrubs
    # interior '\r' (OutputData.cpp:78-90) — which only exists if the
    # reader leaves it in the line
    # Line order within a multi-split file: _mid (monotonically
    # increasing id) is monotone WITHIN a split, and splits are ordered
    # by their actual byte offset via the hidden _metadata column's
    # file_block_start — not by partition index, which Spark assigns in
    # size-descending packing order and only incidentally preserves
    # offset order (round-2 ADVICE: don't rely on that).
    raw = spark.read.option("lineSep", "\n").text(path).select(
        F.col("value").alias("_raw"),
        F.col("_metadata.file_path").alias("_file"),
        F.col("_metadata.file_block_start").alias("_blk"),
        F.monotonically_increasing_id().alias("_mid"),
    )
    if source is not None:
        src = F.lit(source)
        # a multi-file glob under ONE logical source must number lines
        # GLOBALLY (ordered by path, then byte offset): the per-file
        # window below would emit line_no 0..N per file and every
        # (source, line_no)-keyed stage / minted doc_id downstream would
        # silently collide. Same decomposition as the pipeline's global
        # order: per-file parallel windows + broadcast offsets.
        from txtlogparser_spark.operators.windowing import with_global_index

        return (
            with_global_index(raw, "_file", ["_blk", "_mid"], out="line_no")
            .withColumn("source", src)
            .select(
                "source", "line_no", scrub_expr(F.col("_raw")).alias("text")
            )
        )
    else:
        # default naming strips the extension for readability — but two
        # files sharing a stem (app.log + app.err) would then collide
        # into ONE source while line_no stays per-file, and every
        # (source, line_no) keyed stage downstream (tokenize_via_join,
        # doc_id minting) would silently interleave their lines. The
        # input file listing is driver-side metadata (no job): ONLY the
        # colliding stems fall back to the full basename — a global flip
        # would rename every unrelated source (and its downstream
        # doc_id / (source, line_no) keys) corpus-wide the moment one
        # colliding pair appears anywhere in the input.
        files = sorted(raw.inputFiles())
        base_of = lambda p: p.rstrip("/").rsplit("/", 1)[-1]  # noqa: E731
        stem_of = lambda b: b.rsplit(".", 1)[0] if "." in b else b  # noqa: E731
        base_count: dict = {}
        for p in files:
            b = base_of(p)
            base_count[b] = base_count.get(b, 0) + 1
        # basenames colliding ACROSS directories (dir1/app.log +
        # dir2/app.log): even the full-basename fallback collides, and a
        # set-based listing used to hide it entirely — both files became
        # one source with per-file line_no, minting duplicate doc_ids.
        # Those fall back to the full path (scheme stripped, '/'→'_'),
        # unique by construction.
        base_colliding = sorted(b for b, n in base_count.items() if n > 1)
        stem_count: dict = {}
        for b in base_count:
            stem_count[stem_of(b)] = stem_count.get(stem_of(b), 0) + 1
        colliding = sorted(s for s, n in stem_count.items() if n > 1)
        base_expr = F.element_at(F.split(F.col("_file"), "/"), -1)
        stem_expr = F.regexp_replace(base_expr, r"\.[^.]*$", "")
        path_expr = F.regexp_replace(
            F.regexp_replace(F.col("_file"), r"^[a-zA-Z][a-zA-Z0-9+.-]*:/*", ""),
            "/",
            "_",
        )
        src = stem_expr
        if colliding:
            src = F.when(stem_expr.isin(colliding), base_expr).otherwise(src)
        if base_colliding:
            src = F.when(base_expr.isin(base_colliding), path_expr).otherwise(src)
    w = Window.partitionBy("_file").orderBy("_blk", "_mid")
    return (
        raw.withColumn("source", src)
        # long for schema parity with the explicit-source global path
        .withColumn("line_no", (F.row_number().over(w) - 1).cast("long"))
        .select("source", "line_no", scrub_expr(F.col("_raw")).alias("text"))
    )


def build_vocab_df(lines: DataFrame, text_col: str = "text") -> DataFrame:
    """Distributed vocabulary dim (word, id): distinct space-separated
    words of the corpus with dense 0-based ids in sorted (binary UTF-8)
    order — the id assignment DuckDB's `row_number() OVER (ORDER BY w)`
    reproduces exactly.

    Scale shape (the round-2 fix for the driver-collect bottleneck):
    nothing ever reaches the driver. The distinct-word aggregate is a
    map-side-combined shuffle on `word`; ids come from
    operators.windowing.with_global_index partitioned by the word's first
    character — (first_char, word) ordering equals global word order
    because the partition key is a prefix of the sort key — so there is
    no single-partition window even over a multi-million-word open
    vocabulary. Persist the result once per corpus and reuse
    (`df.write.parquet(...)`); tokenize_via_join broadcasts it."""
    from txtlogparser_spark.operators.windowing import with_global_index

    words = (
        lines.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .distinct()
        .withColumn("_pc", F.substring("word", 1, 1))
    )
    return (
        with_global_index(words, "_pc", ["word"], out="id")
        .select("word", F.col("id").cast("int").alias("id"))
    )


def build_vocab(lines: DataFrame, text_col: str = "text") -> List[str]:
    """Vocabulary as a Python list (index == id) for the literal-map
    tokenizer and detokenizer closures. This COLLECTS the vocab dim to
    the driver — the small-vocab fast path only (bounded corpora /
    fixtures); the scale path is build_vocab_df + tokenize_via_join,
    which never collects."""
    rows = build_vocab_df(lines, text_col).orderBy("id").collect()
    return [r["word"] for r in rows]


def tokenize_expr(vocab: Sequence[str], text_col: str = "text") -> Column:
    """Catalyst-only tokenizer for small vocabularies: literal
    map<word,id> lookup per word; OOV → UNK_ID. Empty text → empty array
    (mirrors detokenize([]) == '')."""
    if len(vocab) > MAP_LITERAL_MAX:
        raise ValueError(
            f"vocab of {len(vocab)} words exceeds the literal-map bound "
            f"({MAP_LITERAL_MAX}); use tokenize_via_join"
        )
    pairs: List[Column] = []
    for i, w in enumerate(vocab):
        pairs += [F.lit(w), F.lit(i)]
    vmap = F.create_map(*pairs)
    words = F.split(F.col(text_col), " ")
    toks = F.transform(
        words, lambda w: F.coalesce(F.element_at(vmap, w), F.lit(UNK_ID))
    )
    return F.when(F.length(text_col) == 0, F.array().cast("array<int>")).otherwise(
        toks
    ).cast("array<int>")


def tokenize_via_join(
    lines: DataFrame,
    vocab_df: DataFrame,
    *,
    key_cols: Sequence[str] = ("source", "line_no"),
    text_col: str = "text",
) -> DataFrame:
    """Large-vocab tokenizer: posexplode words → broadcast-join the vocab
    dim (word, id) → reassemble token arrays ordered by word position.
    Shuffles (key, pos, id) only; OOV words map to UNK_ID via left join."""
    keys = list(key_cols)
    words = lines.select(
        *keys,
        F.posexplode(
            F.when(
                F.length(text_col) == 0, F.array().cast("array<string>")
            ).otherwise(F.split(F.col(text_col), " "))
        ).alias("pos", "w"),
    )
    # no forced broadcast: under the auto-broadcast threshold Catalyst
    # broadcasts the dim anyway; over it (open multi-million-word
    # vocabularies — the very case this path exists for) forcing it
    # would re-create the driver-memory blowup build_vocab_df avoids,
    # so the planner is left free to pick a shuffle hash join
    mapped = words.join(vocab_df, words.w == vocab_df.word, "left")
    assembled = (
        mapped.groupBy(*keys)
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("pos"),
                            F.coalesce(F.col("id"), F.lit(UNK_ID)).alias("id"),
                        )
                    )
                ),
                lambda s: s["id"],
            )
            .cast("array<int>")
            .alias("tokens")
        )
    )
    # empty-text lines produced no exploded rows; restore them with []
    return (
        lines.select(*keys)
        .join(assembled, keys, "left")
        .withColumn(
            "tokens",
            F.coalesce(F.col("tokens"), F.array().cast("array<int>")),
        )
    )


def vocab_dim(spark: SparkSession, vocab: Sequence[str]) -> DataFrame:
    return spark.createDataFrame(
        [(w, i) for i, w in enumerate(vocab)], "word string, id int"
    )


def ingest_log(
    spark: SparkSession,
    path: str,
    vocab: Optional[Sequence[str]] = None,
    *,
    source: Optional[str] = None,
) -> "tuple[DataFrame, DataFrame]":
    """End-to-end S1 text half: log file(s) → sequences table
    (doc_id, tokens, n_tok, source) matching the canonical input shape
    (FIXTURES.md: doc_id = '{source}-{line_no:08d}').

    DEFAULT (vocab=None) is the scale path: the vocabulary is built as a
    distributed dim (build_vocab_df — no driver collect) and tokenization
    is the broadcast-join tokenizer, so an open vocabulary of millions of
    words neither OOMs the driver nor explodes the plan with a literal
    map. Passing an explicit small `vocab` list selects the literal-map
    fast path (zero shuffle, whole-stage codegen).

    Returns (sequences, vocab_df) where vocab_df is the (word, id) dim —
    persist it to reuse across ingestion runs; collect it (bounded) to
    feed detokenizer closures at fixture scale."""
    lines = read_log_lines(spark, path, source=source)
    if vocab is not None:
        if len(vocab) > MAP_LITERAL_MAX:
            raise ValueError(
                f"explicit vocab of {len(vocab)} words exceeds the literal-"
                f"map bound ({MAP_LITERAL_MAX}); pass vocab=None to use the "
                "distributed join tokenizer"
            )
        vdf = vocab_dim(spark, vocab)
        toks = lines.withColumn("tokens", tokenize_expr(vocab))
    else:
        vdf = build_vocab_df(lines)
        toks = tokenize_via_join(lines, vdf)
    seqs = toks.select(
        F.format_string("%s-%08d", "source", "line_no").alias("doc_id"),
        "tokens",
        F.size("tokens").cast("int").alias("n_tok"),
        "source",
    )
    return seqs, vdf
