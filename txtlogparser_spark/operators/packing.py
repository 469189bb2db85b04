"""Sequence packing for LLM pretraining pipelines.

Tokenized documents must be packed into fixed-capacity training
sequences. Two standard disciplines, both deterministic in (part_col,
key) order:

1. `chunk_pack` — concat-then-chunk (GPT-style): the token stream of
   each source is conceptually concatenated in key order and cut every
   `capacity` tokens; documents may straddle a cut. Output: each doc's
   first/last chunk id, offset inside its first chunk, and chunk span.
   Pure Catalyst.

   Scale shape: the naive form is a running sum over
   Window.partitionBy(source).orderBy(key) — correct, but a hot source
   serializes onto ONE task (the same hazard the display path hit in
   round 1). So the cumsum is TWO-LEVEL, same trick as
   operators/windowing.py::with_global_index: key-range buckets
   (floor(key / bucket_width)) keep ordering within a source, the
   window runs per (source, bucket), and per-bucket totals (a tiny
   aggregate: one row per bucket) are cumsummed and broadcast back as
   offsets. No Exchange SinglePartition, no single hot task — a 10^12
   row source splits across buckets while producing the exact global
   per-source cumsum.

2. `window_slices` — per-document sliding-window chunking (the
   HF-tokenizer `return_overflowing_tokens` recipe): every document
   longer than `max_len` splits into windows starting every `stride`
   tokens (stride < max_len ⇒ overlapping context, the standard way
   long documents keep cross-boundary context for LM training). No
   cross-document state at all, so this is a map-only projection + one
   generator (posexplode) — zero shuffle at any scale, unlike
   chunk_pack's stream cumsum; use it when documents must not be
   concatenated (instruction data, contamination-sensitive evals).

3. `greedy_pack` — next-fit bin packing (no doc splitting): walk docs
   in key order, append to the current bin while it fits, else open a
   new bin. The bin boundary depends on every previous row (a running
   sum with data-dependent reset), which no closed-form window
   expresses — this is the documented applyInPandas case (custom
   sequential-stateful op, Arrow-batched per group; the per-group walk
   is a numpy loop over ints, not per-row Python in the dataframe).
   Parallelism is per source; inherently so, because the semantics
   chain every row in a source. For hot single sources prefer
   chunk_pack, or pre-split the source with a deterministic key-range
   shard column and pack per shard.

Reference parity: no packing concept in TxtLogParser; training-pipeline
extension (SURVEY.md sect.2 "beyond-reference" ops).
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def chunk_pack(
    df: DataFrame,
    key: str = "doc_id",
    len_col: str = "n_tok",
    part_col: str = "source",
    capacity: int = 2048,
    bucket_width: int = 1 << 20,
) -> DataFrame:
    """Concat-then-chunk packing manifest. For each doc:
      tok_start      — its first token's offset in the source's stream
      first_chunk    — chunk id containing tok_start
      last_chunk     — chunk id containing its final token
      chunk_offset   — offset of tok_start inside first_chunk
      n_chunks       — chunks spanned (>=1; 0-length docs pin to 1)

    Two-level cumsum: per-(source, key-range-bucket) window + broadcast
    per-bucket base offsets. Exact same result as the single hot window,
    without the hot task.

    (part_col, key) must be unique: the running sums use explicit ROWS
    frames (Spark's default RANGE frame would give tied keys a
    peer-inclusive sum — overlapping tok_start — diverging from the
    oracle's ROWS UNBOUNDED PRECEDING), but with duplicate keys the
    within-tie order is still engine-arbitrary, so the manifest is only
    well-defined on unique keys.
    """
    b = F.floor(F.col(key) / F.lit(bucket_width)).alias("_pb")
    rows = df.select(part_col, key, F.col(len_col).cast("long").alias("_len"), b)

    w_in = (
        Window.partitionBy(part_col, "_pb")
        .orderBy(key)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = rows.withColumn("_local_end", F.sum("_len").over(w_in))

    # One row per (source, bucket): tiny relative to the data (width
    # 2^20 keys/bucket) — the offsets cumsum windows over THIS dim, and
    # the dim broadcasts back.
    totals = rows.groupBy(part_col, "_pb").agg(F.sum("_len").alias("_tot"))
    w_off = (
        Window.partitionBy(part_col)
        .orderBy("_pb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offs = totals.withColumn(
        "_base", F.sum("_tot").over(w_off) - F.col("_tot")
    ).select(part_col, "_pb", "_base")

    cap = F.lit(int(capacity))
    packed = (
        local.join(F.broadcast(offs), [part_col, "_pb"])
        .withColumn("_end", F.col("_base") + F.col("_local_end"))
        .withColumn("tok_start", F.col("_end") - F.col("_len"))
        .withColumn("first_chunk", F.floor(F.col("tok_start") / cap))
        .withColumn(
            "last_chunk",
            F.when(
                F.col("_len") > 0, F.floor((F.col("_end") - 1) / cap)
            ).otherwise(F.floor(F.col("tok_start") / cap)),
        )
        .withColumn("chunk_offset", F.col("tok_start") % cap)
        .withColumn(
            "n_chunks", (F.col("last_chunk") - F.col("first_chunk") + 1)
        )
    )
    return packed.select(
        part_col, key, F.col("_len").alias(len_col),
        "tok_start", "first_chunk", "last_chunk", "chunk_offset", "n_chunks",
    )


def assemble_chunks(
    df: DataFrame,
    key: str = "doc_id",
    tokens_col: str = "tokens",
    part_col: str = "source",
    capacity: int = 2048,
    bucket_width: int = 1 << 20,
) -> DataFrame:
    """Materialize the packed training sequences: for each (source,
    chunk) emit the actual token array, assembled from every doc slice
    that lands in that chunk (concat-then-chunk discipline; docs may
    straddle chunk cuts).

    Scale shape: the manifest (chunk_pack) assigns each doc its chunk
    SPAN; a doc then explodes into one row PER SPANNED CHUNK (almost
    always 1-2 — never per token), carrying only the slice of its token
    array that falls inside that chunk. The shuffle is a groupBy on
    (source, chunk_id) whose payload is exactly one chunk's tokens —
    `capacity` per group by construction, so no skew and no hot key.
    The final per-chunk ordering uses the slice's stream offset;
    sort_array on (offset, slice) structs keeps it deterministic
    without a window. Per-token shuffles never happen; Python never
    runs."""
    lens = df.select(
        part_col, key, F.size(F.col(tokens_col)).alias("_n_tok")
    )
    manifest = chunk_pack(
        lens, key=key, len_col="_n_tok", part_col=part_col,
        capacity=int(capacity), bucket_width=bucket_width,
    )
    cap = F.lit(int(capacity))
    # zero-length docs are position markers in the manifest but carry no
    # tokens; excluding them here prevents a boundary-pinned empty doc
    # (tok_start == a chunk cut at stream end) from emitting a phantom
    # empty chunk and inflating n_pieces
    manifest = manifest.where(F.col("_n_tok") > 0)
    spans = manifest.join(
        df.select(part_col, key, tokens_col), [part_col, key]
    ).select(
        part_col,
        key,
        "tok_start",
        F.col(tokens_col).alias("_toks"),
        F.explode(F.sequence("first_chunk", "last_chunk")).alias("chunk_id"),
    )
    # Slice of this doc's tokens that falls inside chunk_id:
    # chunk covers [chunk_id*cap, (chunk_id+1)*cap); doc covers
    # [tok_start, tok_start + n). element_at/slice are 1-based.
    lo = F.greatest(F.col("chunk_id") * cap, F.col("tok_start"))
    start_in_doc = (lo - F.col("tok_start") + 1).cast("int")
    take = F.least(
        (F.col("chunk_id") + 1) * cap - lo,
        F.size("_toks") - (lo - F.col("tok_start")),
    ).cast("int")
    sliced = spans.select(
        part_col,
        "chunk_id",
        F.struct(
            lo.alias("off"), F.slice("_toks", start_in_doc, take).alias("part")
        ).alias("_piece"),
    )
    return (
        sliced.groupBy(part_col, "chunk_id")
        .agg(F.sort_array(F.collect_list("_piece")).alias("_pieces"))
        .select(
            part_col,
            "chunk_id",
            F.flatten(F.transform("_pieces", lambda p: p["part"])).alias(
                tokens_col
            ),
            F.size(F.col("_pieces")).alias("n_pieces"),
        )
        .withColumn("n_tok", F.size(F.col(tokens_col)))
    )


def window_slices(
    df: DataFrame,
    key: str = "doc_id",
    tokens_col: str = "tokens",
    max_len: int = 512,
    stride: int | None = None,
    min_len: int = 1,
) -> DataFrame:
    """Per-document sliding-window chunking: one output row per window,
    columns (key, n_tok, n_windows, win_id, win_start, win_len,
    win_tokens).

    Window i starts at i*stride (0-based token offsets) and carries up
    to max_len tokens; a doc with n <= max_len yields exactly one
    window (the doc itself). stride defaults to max_len (disjoint
    windows); stride < max_len overlaps consecutive windows by
    max_len - stride tokens. Tail windows shorter than `min_len` are
    dropped (a doc with 0 tokens yields 0 windows at the default).

    Count formula (n > max_len): n_windows = ceil((n - max_len) /
    stride) + 1 — the last window starts at the smallest multiple of
    stride covering the tail. All integer arithmetic; the int/int
    division truncates on positive values, so the ceil spelling
    (a + stride - 1) / stride is exact and replays bit-identically in
    DuckDB.

    Scale shape: map-only — a projection computing the per-doc window
    array plus ONE posexplode generator; no window function, no join,
    no shuffle. Output volume ≈ total_tokens/stride rows; at 100 TB
    this runs as a pure scan→write with whatever partitioning the
    input already has."""
    if stride is None:
        stride = max_len
    if stride < 1 or max_len < 1:
        raise ValueError("max_len and stride must be >= 1")
    toks = F.col(tokens_col)
    n = F.size(toks)
    n_win = (
        F.when(n <= F.lit(max_len), F.lit(1))
        .otherwise(
            ((n - F.lit(max_len) + F.lit(stride - 1)) / F.lit(stride)).cast(
                "long"
            )
            + F.lit(1)
        )
        .cast("long")
    )
    wins = F.transform(
        F.sequence(F.lit(0), n_win.cast("int") - F.lit(1)),
        lambda i: F.slice(toks, i * F.lit(stride) + F.lit(1), F.lit(max_len)),
    )
    out = df.select(
        F.col(key),
        n.cast("long").alias("n_tok"),
        n_win.alias("n_windows"),
        F.posexplode(wins).alias("win_id", "win_tokens"),
    ).select(
        key,
        "n_tok",
        "n_windows",
        F.col("win_id").cast("long").alias("win_id"),
        (F.col("win_id") * F.lit(stride)).cast("long").alias("win_start"),
        F.size("win_tokens").cast("long").alias("win_len"),
        "win_tokens",
    )
    return out.where(F.col("win_len") >= F.lit(min_len))


def split_on_token(
    df: DataFrame,
    sep: int,
    key: str = "doc_id",
    tokens_col: str = "tokens",
    keep_sep: bool = False,
    drop_empty: bool = True,
) -> DataFrame:
    """Split token arrays on a separator id — the INVERSE of packing
    (unpack EOS-concatenated training sequences back into documents, or
    split docs into EOS-delimited records). One output row per segment:
    (key, n_tok, n_segments, seg_id, seg_start, seg_len, seg_tokens).

    Segments are the maximal runs between separator occurrences.
    `drop_empty` (default) drops zero-content segments (consecutive /
    leading / trailing separators — empty docs in a packed stream);
    seg_id renumbers 0..n_segments-1 over the KEPT segments and
    n_segments counts them, so both are consistent post-filter.
    `keep_sep` re-attaches the terminating separator to each segment
    that has one (the GPT-style "doc ends with EOS" layout); an
    unterminated final segment is returned as-is. seg_start is the
    0-based offset of the segment's first content token in the input
    array; seg_len counts the emitted tokens (content + optional sep).
    A NULL tokens array yields 0 rows (posexplode generator semantics,
    same contract as window_slices). A doc with no separators yields
    exactly one segment: itself.

    Scale shape: map-only — separator positions, segment boundaries and
    the empty-filter are all computed per-row with higher-order
    functions, then ONE posexplode. No window function, no join, no
    shuffle at any scale; output volume = input token volume."""
    toks = F.col(tokens_col)
    n = F.size(toks)
    # 1-based separator positions; boundaries per the classic split:
    # starts = [1] ++ (sp+1), content-exclusive ends = sp ++ [n+1]
    sp = F.filter(
        F.transform(
            toks, lambda t, i: F.when(t == F.lit(sep), i + 1).otherwise(-1)
        ),
        lambda p: p > 0,
    )
    starts = F.concat(F.array(F.lit(1)), F.transform(sp, lambda p: p + 1))
    ends = F.concat(sp, F.array(n + 1))
    segs = F.zip_with(
        starts,
        ends,
        lambda s, e: F.struct(s.alias("s"), (e - s).alias("clen")),
    )
    if drop_empty:
        segs = F.filter(segs, lambda x: x["clen"] > 0)
    exploded = df.select(
        F.col(key),
        n.cast("long").alias("n_tok"),
        toks.alias("_toks"),
        F.size(segs).cast("long").alias("n_segments"),
        F.posexplode(segs).alias("seg_id", "_seg"),
    )
    s_col = F.col("_seg.s")
    clen = F.col("_seg.clen")
    # terminated by a separator <=> content end is not the array end
    seg_len = (
        clen + ((s_col + clen) <= F.col("n_tok")).cast("int")
        if keep_sep
        else clen
    )
    return exploded.select(
        key,
        "n_tok",
        "n_segments",
        F.col("seg_id").cast("long").alias("seg_id"),
        (s_col - 1).cast("long").alias("seg_start"),
        seg_len.cast("long").alias("seg_len"),
        F.slice(F.col("_toks"), s_col, seg_len).alias("seg_tokens"),
    )


def greedy_pack(
    df: DataFrame,
    key: str = "doc_id",
    len_col: str = "n_tok",
    part_col: str = "source",
    capacity: int = 2048,
) -> DataFrame:
    """Next-fit packing manifest: (part_col, key, n_tok, bin_id,
    pos_in_bin, bin_fill_after). Docs longer than capacity get a bin of
    their own (never split, never dropped). Deterministic in key order.

    (part_col, key) must be unique — like chunk_pack, tied keys would
    get an engine-arbitrary relative order inside the stable mergesort,
    making bin assignment ill-defined.
    """
    cap = int(capacity)
    part_type = df.schema[part_col].dataType.simpleString()
    out_schema = (
        f"{part_col} {part_type}, {key} long, {len_col} long, "
        "bin_id long, pos_in_bin long, bin_fill_after long"
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(key, kind="mergesort").reset_index(drop=True)
        lens = pdf[len_col].to_numpy()
        n = len(lens)
        bins = [0] * n
        poss = [0] * n
        fills = [0] * n
        cur_bin, cur_pos, cur_fill = 0, 0, 0
        for i in range(n):
            ln = int(lens[i])
            if cur_fill > 0 and cur_fill + ln > cap:
                cur_bin += 1
                cur_pos = 0
                cur_fill = 0
            bins[i] = cur_bin
            poss[i] = cur_pos
            cur_fill += ln
            fills[i] = cur_fill
            cur_pos += 1
        return pd.DataFrame(
            {
                part_col: pdf[part_col],
                key: pdf[key].astype("int64"),
                len_col: pdf[len_col].astype("int64"),
                "bin_id": bins,
                "pos_in_bin": poss,
                "bin_fill_after": fills,
            }
        )

    rows = df.select(
        part_col,
        F.col(key).cast("long").alias(key),
        F.col(len_col).cast("long").alias(len_col),
    )
    return rows.groupBy(part_col).applyInPandas(pack, out_schema)


def shard_plan(
    df: DataFrame,
    n_shards: int,
    key: str = "doc_id",
    len_col: str = "n_tok",
    seed: str = "shard-v1",
    bucket_hex: int = 2,
    out: str = "shard",
) -> DataFrame:
    """Token-balanced output sharding — the writer-side step after
    shuffle/pack: assign every doc to one of `n_shards` shards so the
    per-shard token totals are near-equal (each within max(len) of the
    ideal total/n_shards) and each shard is a CONTIGUOUS slice of the
    deterministic hash order (so a reader consuming shards in id order
    replays the same stream, and a shard maps 1:1 to an output file via
    df.repartition(n_shards, out)/partitionBy).

        shard(doc) = (tok_before(doc) * n_shards) DIV total_tokens

    with tok_before = tokens of all docs strictly before it in the
    order (md5(seed ':' key), key). Integer arithmetic end-to-end, so
    the plan replays bit-exactly in DuckDB. (long math: tok_before *
    n_shards stays < 2^63 up to ~1e14 tokens x 1e4 shards.)

    Scale shape — the same two hazards as chunk_pack/epoch_shuffle,
    avoided the same way:
      * the global cumsum decomposes over hash-prefix buckets (the
        first `bucket_hex` hex chars of the hash are a PREFIX of the
        sort key): per-bucket parallel ROWS-frame windows + a
        16^bucket_hex-row totals dim whose prefix offsets come from a
        broadcast strictly-smaller self-join (ordered_partition_dim's
        trick) — no Exchange SinglePartition on the fact table;
      * total_tokens rides in via a broadcast 1-row aggregate of that
        tiny dim (the benign scalar-agg class), not a driver collect.

    md5 buckets are uniform by construction, so hot sources cannot
    serialize a task; raise bucket_hex at larger scales. Output: the
    input columns + `tok_before` + `out`.
    """
    n = int(n_shards)
    if n < 1:
        raise ValueError(f"n_shards must be >= 1, got {n}")
    sk = F.md5(F.concat(F.lit(seed + ":"), F.col(key).cast("string")))
    keyed = df.withColumn("_sk", sk).withColumn(
        "_bkt", F.substring("_sk", 1, int(bucket_hex))
    ).withColumn("_len", F.col(len_col).cast("long"))

    w_in = (
        Window.partitionBy("_bkt")
        .orderBy("_sk", key)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = keyed.withColumn("_local_end", F.sum("_len").over(w_in))

    dim = keyed.groupBy("_bkt").agg(F.sum("_len").alias("_tot"))
    a, b = dim.alias("_sa"), dim.alias("_sb")
    offs = (
        a.join(F.broadcast(b), F.col("_sb._bkt") < F.col("_sa._bkt"), "left")
        .groupBy(F.col("_sa._bkt").alias("_bkt"), F.col("_sa._tot").alias("_tot"))
        .agg(F.coalesce(F.sum("_sb._tot"), F.lit(0)).cast("long").alias("_base"))
        .select("_bkt", "_base")
    )
    total = dim.agg(F.sum("_tot").cast("long").alias("_total"))

    assigned = (
        local.join(F.broadcast(offs), "_bkt")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "tok_before", F.col("_base") + F.col("_local_end") - F.col("_len")
        )
        .withColumn(
            out,
            F.when(
                F.col("_total") > 0,
                F.expr(f"(tok_before * {n}) DIV _total"),
            )
            .otherwise(F.lit(0))
            .cast("int"),
        )
    )
    return assigned.drop("_sk", "_bkt", "_len", "_local_end", "_base", "_total")
