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
- line numbering: per-file partitioned window over
  monotonically_increasing_id() — ids increase within a partition and
  partition ids follow file-split order, so ordering by id within a file
  reproduces file order without a global window.
- tokenize, small vocab (≤ `MAP_LITERAL_MAX` entries): a literal
  map<string,int> lookup inside transform() — whole-stage codegen, zero
  shuffle, zero UDF.
- tokenize, large vocab: posexplode → broadcast-join the vocab dim →
  re-assemble with array_sort over (pos, id) structs. Shuffles only
  (doc_id, pos, id) triples; the vocab dim is broadcast.
- vocab build: distinct words of the corpus, ranked by the same
  broadcast-prefix pattern as source ranks? No — vocab cardinality can be
  millions, so ids come from a (sorted) window over the DISTINCT-word
  aggregate: acceptable because it is a one-time build over the dim, not
  the fact table; for repeated ingestion persist the vocab table.
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
    after its newline strip."""
    return F.regexp_replace(F.regexp_replace(col, "\r$", ""), "\r", " ")


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
    raw = spark.read.option("lineSep", "\n").text(path).select(
        F.col("value").alias("_raw"),
        F.input_file_name().alias("_file"),
        F.monotonically_increasing_id().alias("_mid"),
    )
    src = (
        F.lit(source)
        if source is not None
        else F.regexp_replace(
            F.element_at(F.split(F.col("_file"), "/"), -1), r"\.[^.]*$", ""
        )
    )
    w = Window.partitionBy("_file").orderBy("_mid")
    return (
        raw.withColumn("source", src)
        .withColumn("line_no", F.row_number().over(w) - 1)
        .select("source", "line_no", scrub_expr(F.col("_raw")).alias("text"))
    )


def build_vocab(lines: DataFrame, text_col: str = "text") -> List[str]:
    """Deterministic vocabulary: sorted distinct space-separated words of
    the corpus (including '' when runs of spaces/empty lines occur, so
    tokenization is lossless). Returns a Python list — the vocab is a
    plan-build-time artifact like the reference's filter workspace; at
    scale, persist it once and reuse (`spark.createDataFrame` it back)."""
    rows = (
        lines.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .distinct()
        .orderBy("w")
        .collect()
    )
    return [r["w"] for r in rows]


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
    mapped = words.join(F.broadcast(vocab_df), words.w == vocab_df.word, "left")
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
) -> "tuple[DataFrame, List[str]]":
    """End-to-end S1 text half: log file(s) → sequences table
    (doc_id, tokens, n_tok, source) matching the canonical input shape
    (FIXTURES.md: doc_id = '{source}-{line_no:08d}'). With vocab=None the
    vocabulary is built from the corpus (lossless round trip). Returns
    (sequences, vocab)."""
    lines = read_log_lines(spark, path, source=source)
    if vocab is None:
        vocab = build_vocab(lines)
    if len(vocab) <= MAP_LITERAL_MAX:
        toks = lines.withColumn("tokens", tokenize_expr(vocab))
    else:
        toks = tokenize_via_join(lines, vocab_dim(spark, vocab)).join(
            lines, ["source", "line_no"]
        )
    seqs = toks.select(
        F.format_string("%s-%08d", "source", "line_no").alias("doc_id"),
        "tokens",
        F.size("tokens").cast("int").alias("n_tok"),
        "source",
    )
    return seqs, list(vocab)
