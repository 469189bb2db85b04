"""Streaming/batch parity for the corpus-curation stages.

The map-only curation signals (language ID, quality, repetition,
deterministic hash sampling) are stateless Catalyst expressions, so the
same pipeline must run unchanged as a Structured Streaming job over a
document stream — the incremental-ingest path of a training-data
pipeline (new crawl shards arrive, get scored/filtered on arrival).
This pins that: an availableNow file stream through the curation select
produces exactly the batch result."""

import pyspark.sql.functions as F
import pytest


def _curate(df):
    from txtlogparser_spark.functions.text import (
        duplicate_word_fraction,
        langid_heuristic,
        quality_score,
        top_bigram_fraction,
    )
    from txtlogparser_spark.operators.sampling import hash_bucket_hex, rate_threshold_hex

    return df.select(
        "doc_id",
        "source",
        langid_heuristic().alias("pred_lang"),
        quality_score().alias("quality"),
        duplicate_word_fraction().alias("dup_word_frac"),
        top_bigram_fraction().alias("top_bigram_frac"),
    ).where(
        (F.col("pred_lang") != "und")
        & (hash_bucket_hex(F.col("doc_id"), "mix-v1") < F.lit(rate_threshold_hex(0.5)))
    )


@pytest.fixture(scope="module")
def doc_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("curation_docs"))
    rows = [
        (
            i,
            " ".join(
                ["the quick fox", "el perro come", "le chat dort", "word " * 3][i % 4]
                .split()
            )
            + f" tail{i} " + " ".join(f"w{j}" for j in range(i % 7)),
            f"src{i % 3}",
        )
        for i in range(400)
    ]
    spark.createDataFrame(rows, "doc_id long, text string, source string").coalesce(
        2
    ).write.mode("overwrite").parquet(d)
    return d


def test_stream_curation_matches_batch(spark, doc_dir, tmp_path):
    batch = sorted(map(tuple, _curate(spark.read.parquet(doc_dir)).collect()))
    assert batch, "curation must keep some rows for the parity to mean anything"
    n_all = spark.read.parquet(doc_dir).count()
    assert len(batch) < n_all, "curation must also drop rows"

    schema = spark.read.parquet(doc_dir).schema
    stream = spark.readStream.schema(schema).parquet(doc_dir)
    q = (
        _curate(stream)
        .writeStream.format("memory")
        .queryName("curated_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.sql("select * from curated_stream").collect()))
    assert got == batch


def test_stream_dedup_first_seen_across_batches(spark, tmp_path):
    """Cross-batch state: a digest seen in run 1 must NOT re-emit when
    more files arrive and the query resumes from its checkpoint; fresh
    digests still pass; digest set == batch dedup's."""
    from txtlogparser_spark.streaming.stateful import dedup_stream

    src_dir = str(tmp_path / "docs_in")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    import os

    os.makedirs(src_dir)
    schema = "doc_id long, text string"

    def run_once():
        q = (
            dedup_stream(spark.readStream.schema(schema).parquet(src_dir))
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {
            r["digest"]: r["keeper_doc_id"]
            for r in spark.read.parquet(sink).collect()
        }

    b1 = spark.createDataFrame(
        [(0, "alpha beta"), (1, "gamma delta"), (2, "alpha beta")],
        schema,
    )
    b1.coalesce(1).write.mode("append").parquet(src_dir)
    got1 = run_once()
    assert len(got1) == 2  # alpha-beta emitted once, keeper = min(0, 2)
    assert set(got1.values()) == {0, 1}

    # new files: one repeat digest (must stay silent), one new; the
    # resumed query recovers seen-digest state from the checkpoint
    b2 = spark.createDataFrame(
        [(3, "alpha beta"), (4, "epsilon zeta")], schema
    )
    b2.coalesce(1).write.mode("append").parquet(src_dir)
    got2 = run_once()
    assert len(got2) == 3
    new_emits = {d: k for d, k in got2.items() if d not in got1}
    assert set(new_emits.values()) == {4}  # only the fresh digest emitted

    # digest SET parity with the batch operator over the full input
    full = spark.read.parquet(src_dir)
    batch_digests = {
        r["d"] for r in full.select(F.md5("text").alias("d")).distinct().collect()
    }
    assert set(got2) == batch_digests


def test_stream_cms_matches_batch(spark, tmp_path):
    """The count-min sketch is ONE streaming-native aggregate: running
    cms_build over a file stream in complete mode yields cell-for-cell
    the batch sketch — the continuously-maintained corpus statistic."""
    from txtlogparser_spark.operators.sketches import cms_build

    src = str(tmp_path / "words_in")
    rows = [(w,) for w in ["a"] * 30 + ["b"] * 10 + [f"r{i}" for i in range(25)]]
    spark.createDataFrame(rows, ["item"]).coalesce(2).write.parquet(src)

    batch = sorted(
        map(tuple, cms_build(spark.read.parquet(src), depth=3, width=32).collect())
    )
    stream = spark.readStream.schema("item string").parquet(src)
    q = (
        cms_build(stream, depth=3, width=32)
        .writeStream.format("memory")
        .queryName("cms_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.sql("select * from cms_stream").collect()))
    assert got == batch


def test_stream_dedup_within_watermark_builtin(spark, tmp_path):
    """Complement to dedup_stream: when duplicates only arrive within a
    bounded event-time horizon (retries, at-least-once upstream), the
    BUILT-IN dropDuplicatesWithinWatermark is the zero-Python shape -
    state evicts as the watermark passes, so it stays bounded without a
    TTL policy. Pin its behavior on one in-horizon duplicate pair."""
    import datetime as dt

    src = str(tmp_path / "ev_in")
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (0, base, "alpha"),
        (0, base + dt.timedelta(minutes=1), "alpha"),  # dup within horizon
        (1, base + dt.timedelta(minutes=2), "beta"),
    ]
    spark.createDataFrame(
        rows, "doc_id long, ts timestamp, text string"
    ).coalesce(1).write.parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, ts timestamp, text string")
        .parquet(src)
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["doc_id"])
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("dd_wm")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select doc_id, text from dd_wm").collect()
    assert sorted((r["doc_id"], r["text"]) for r in got) == [(0, "alpha"), (1, "beta")]


def test_stream_bloom_probe_matches_batch(spark, doc_dir, tmp_path):
    """Stream-static shape of the Bloom membership gate: the filter is a
    STATIC table (built from the curated corpus, refreshed per snapshot)
    and arriving documents stream through bloom_probe's k broadcast
    joins unchanged — stateless per row, so availableNow over the same
    files must equal the batch probe exactly (false positives included:
    the filter is deterministic)."""
    from txtlogparser_spark.operators.sketches import bloom_build, bloom_probe

    docs = spark.read.parquet(doc_dir)
    members = docs.filter("doc_id % 2 = 0").select(F.md5(F.col("text")).alias("dg"))
    fpath = str(tmp_path / "filt")
    bloom_build(members, "dg", m_bits=4096, k=4).write.parquet(fpath)
    filt = spark.read.parquet(fpath)

    def probe(df):
        return bloom_probe(
            df.withColumn("dg", F.md5("text")), "dg", filt, m_bits=4096, k=4
        ).select("doc_id", "maybe_member")

    batch = sorted(map(tuple, probe(docs).collect()))
    assert any(m for _, m in batch) and not all(m for _, m in batch)

    stream = spark.readStream.schema(docs.schema).parquet(doc_dir)
    q = (
        probe(stream)
        .writeStream.format("memory")
        .queryName("bloom_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        map(tuple, spark.sql("select * from bloom_stream").collect())
    )
    assert got == batch


def test_stream_hll_matches_batch(spark, doc_dir):
    """Streaming distinct-count sketching: hll_build is one groupBy-max,
    which Structured Streaming runs natively in complete/update mode —
    the per-micro-batch register table converges to the batch sketch
    because max() is order- and batching-insensitive (the sketch
    property that makes HLL mergeable is exactly what makes it
    streamable). availableNow over the same files must equal the batch
    registers bit-exactly."""
    from txtlogparser_spark.operators.sketches import hll_build

    docs = spark.read.parquet(doc_dir)
    words = docs.select(F.explode(F.split("text", " ")).alias("item"))
    batch = sorted(map(tuple, hll_build(words, "item").collect()))

    stream_words = (
        spark.readStream.schema(docs.schema)
        .parquet(doc_dir)
        .select(F.explode(F.split("text", " ")).alias("item"))
    )
    q = (
        hll_build(stream_words, "item")
        .writeStream.format("memory")
        .queryName("hll_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        map(tuple, spark.sql("select bucket, rho from hll_stream").collect())
    )
    assert got == batch


def test_stream_c4_matches_batch(spark, tmp_path):
    """C4 line cleaning is a stateless Catalyst select, so it runs
    unchanged as the arrival-time scrub of a document stream —
    availableNow over the same files must equal the batch stats row
    for row (cleaned text included)."""
    from txtlogparser_spark.operators.c4 import c4_line_stats

    good = "the quick brown fox jumps over the dog."
    rows = [
        (i, "\n".join([good] * (2 + i % 4) + (["enable javascript now."] if i % 3 == 0 else [])))
        for i in range(40)
    ]
    src = str(tmp_path / "pages_in")
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(2).write.parquet(src)

    batch = sorted(map(tuple, c4_line_stats(spark.read.parquet(src)).collect()))
    assert any(r[4] for r in batch) and not all(r[4] for r in batch)

    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = (
        c4_line_stats(stream)
        .writeStream.format("memory")
        .queryName("c4_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.sql("select * from c4_stream").collect()))
    assert got == batch


def test_stream_window_slices_matches_batch(spark, tmp_path):
    """window_slices is a stateless projection + generator, so the same
    call must run unchanged over a token-sequence stream (the arriving-
    shard path: new pre-tokenized shards get context-chunked on
    arrival) and emit exactly the batch windows."""
    from txtlogparser_spark.operators.packing import window_slices

    d = str(tmp_path / "tok_docs")
    rows = [(i, list(range(i % 37))) for i in range(300)]
    spark.createDataFrame(rows, "doc_id long, tokens array<int>").coalesce(
        2
    ).write.mode("overwrite").parquet(d)

    def slices(df):
        return window_slices(df, max_len=8, stride=6).select(
            "doc_id",
            "n_windows",
            "win_id",
            "win_start",
            "win_len",
            F.md5(F.concat_ws(",", F.col("win_tokens").cast("array<string>")))
            .alias("win_md5"),
        )

    batch = sorted(map(tuple, slices(spark.read.parquet(d)).collect()))
    assert batch

    schema = spark.read.parquet(d).schema
    q = (
        slices(spark.readStream.schema(schema).parquet(d))
        .writeStream.format("memory")
        .queryName("win_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.sql("select * from win_stream").collect()))
    assert got == batch


def test_stream_split_on_token_matches_batch(spark, tmp_path):
    """split_on_token is a stateless projection + generator, so the
    same call must run unchanged over a token-sequence stream (the
    arriving-shard path: packed shards get unpacked on arrival) and
    emit exactly the batch segments."""
    from txtlogparser_spark.operators.packing import split_on_token

    d = str(tmp_path / "packed_docs")
    SEP = 7
    rows = [
        (i, [(j * i + j) % 11 for j in range(i % 41)]) for i in range(300)
    ]
    spark.createDataFrame(rows, "doc_id long, tokens array<int>").coalesce(
        2
    ).write.mode("overwrite").parquet(d)

    def segs(df):
        return split_on_token(df, sep=SEP, keep_sep=True).select(
            "doc_id",
            "n_segments",
            "seg_id",
            "seg_start",
            "seg_len",
            F.md5(F.concat_ws(",", F.col("seg_tokens").cast("array<string>")))
            .alias("seg_md5"),
        )

    batch = sorted(map(tuple, segs(spark.read.parquet(d)).collect()))
    assert batch

    schema = spark.read.parquet(d).schema
    q = (
        segs(spark.readStream.schema(schema).parquet(d))
        .writeStream.format("memory")
        .queryName("split_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.sql("select * from split_stream").collect()))
    assert got == batch


def test_stream_token_entropy_matches_batch(spark, tmp_path):
    """token_entropy is a map-only fold, so the same column expression
    must run unchanged over a token-sequence stream and emit exactly
    the batch entropies."""
    from txtlogparser_spark.operators.token_stats import token_entropy

    d = str(tmp_path / "ent_docs")
    rows = [(i, [(j * 7 + i) % 13 for j in range(i % 29)]) for i in range(300)]
    spark.createDataFrame(rows, "doc_id long, tokens array<int>").coalesce(
        2
    ).write.mode("overwrite").parquet(d)

    def ent(df):
        return df.select("doc_id", token_entropy().alias("h"))

    batch = sorted(map(tuple, ent(spark.read.parquet(d)).collect()))
    assert batch

    schema = spark.read.parquet(d).schema
    q = (
        ent(spark.readStream.schema(schema).parquet(d))
        .writeStream.format("memory")
        .queryName("ent_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.sql("select * from ent_stream").collect()))
    assert got == batch


def test_stream_dsir_scoring_matches_batch(spark, tmp_path):
    """DSIR's trained-model scoring (weight_fp_column over the literal
    fixed-point ratio array) is a pure map column: the realistic
    incremental shape — the model trains once on a batch snapshot, the
    SAME expression scores every arriving micro-batch — must emit
    exactly the batch weights."""
    from txtlogparser_spark.operators.dsir import (
        bucket_counts,
        logratio_fp,
        weight_fp_column,
    )

    d = str(tmp_path / "dsir_docs")
    words = ["spark", "join", "merge", "table", "scan", "the", "quick"]
    rows = [
        (i, " ".join(words[(i + j) % len(words)] for j in range(3 + i % 5)))
        for i in range(200)
    ]
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        2
    ).write.mode("overwrite").parquet(d)

    raw = spark.read.parquet(d)
    target = raw.where("doc_id % 3 = 0")
    B = 16
    tc = {r["bucket"]: int(r["n"]) for r in
          bucket_counts(target, n_buckets=B).collect()}
    rc = {r["bucket"]: int(r["n"]) for r in
          bucket_counts(raw, n_buckets=B).collect()}
    qr = logratio_fp(tc, rc, B)

    def score(df):
        import pyspark.sql.functions as F

        return df.select(
            "doc_id", weight_fp_column(qr).alias("weight_fp")
        )

    batch = sorted(map(tuple, score(raw).collect()))
    assert batch and any(w != 0 for _i, w in batch)

    schema = raw.schema
    q = (
        score(spark.readStream.schema(schema).parquet(d))
        .writeStream.format("memory")
        .queryName("dsir_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        map(tuple, spark.sql("select * from dsir_stream").collect())
    )
    assert got == batch


def test_stream_contamination_gate_matches_batch_flags(spark, tmp_path):
    """The arriving-shard decontamination gate (array_intersect against
    the collected eval gram list) is a pure map column: it must equal
    contamination_flags' join-based n_hit_shingles on a batch corpus
    AND emit the identical counts over a stream of the same docs."""
    import pyspark.sql.functions as F

    from txtlogparser_spark.operators.decontaminate import (
        contamination_flags,
        contamination_gate_column,
        eval_ngram_set,
    )

    d = str(tmp_path / "gate_docs")
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    rows = [
        (i, " ".join(words[(i + j) % len(words)] for j in range(4 + i % 4)))
        for i in range(120)
    ]
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        2
    ).write.mode("overwrite").parquet(d)
    corpus = spark.read.parquet(d)
    train = corpus.where("doc_id % 5 != 0")
    ev = corpus.where("doc_id % 5 = 0")
    grams = [r["shingle"] for r in eval_ngram_set(ev, n=3).collect()]

    flags = {
        r["doc_id"]: r["n_hit_shingles"]
        for r in contamination_flags(train, ev, n=3).collect()
    }

    def gate(df):
        return df.select(
            "doc_id", contamination_gate_column(grams, n=3).alias("n_hits")
        )

    batch = {r["doc_id"]: r["n_hits"] for r in gate(train).collect()}
    assert batch == flags and any(v > 0 for v in batch.values())

    q = (
        gate(spark.readStream.schema(corpus.schema).parquet(d))
        .writeStream.format("memory")
        .queryName("gate_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: r["n_hits"]
        for r in spark.sql(
            "select * from gate_stream where doc_id % 5 != 0"
        ).collect()
    }
    assert got == batch


def test_stream_lsh_probe_matches_batch(spark, tmp_path):
    """Incremental fuzzy dedup at arrival time: the corpus LSH index
    (band_table output) is a STATIC snapshot artifact, and each arriving
    micro-batch of a document stream is signed and probed against it via
    foreachBatch (probe_lsh_index aggregates per-doc minhashes, so it
    cannot run inside an append-mode streaming plan directly — but each
    new doc's probe depends only on its own text plus the static index,
    so per-micro-batch probing unions to exactly the batch probe).

    Pins: streaming union over maxFilesPerTrigger=1 micro-batches ==
    one-shot batch probe_lsh_index over the full shard, candidates
    present for the planted near-dups and absent for fresh docs."""
    from txtlogparser_spark.operators.dedup import (
        band_table,
        minhash_signatures,
        probe_lsh_index,
        shingle_table,
    )

    words = [f"tok{i}" for i in range(40)]
    base_rows = [
        (f"base{i:03d}", " ".join(words[(i * 7 + j) % len(words)] for j in range(12)))
        for i in range(60)
    ]
    base = spark.createDataFrame(base_rows, "doc_id string, text string")
    idx_path = str(tmp_path / "lsh_index")
    band_table(minhash_signatures(shingle_table(base))).write.parquet(idx_path)
    index = spark.read.parquet(idx_path)

    # arriving shard: evens are near-dups of base docs (one word changed
    # at the tail -> most shingles shared), odds are fresh text
    shard_rows = []
    for i in range(30):
        if i % 2 == 0:
            t = base_rows[i][1].rsplit(" ", 1)[0] + " changed"
        else:
            t = " ".join(f"fresh{i}_{j}" for j in range(12))
        shard_rows.append((f"new{i:03d}", t))
    shard_dir = str(tmp_path / "shard")
    spark.createDataFrame(shard_rows, "doc_id string, text string").repartition(
        4
    ).write.parquet(shard_dir)
    shard = spark.read.parquet(shard_dir)

    batch = sorted(map(tuple, probe_lsh_index(index, shard).collect()))
    hit_new = {a for a, _ in batch}
    assert any(a.startswith("new0") for a in hit_new)
    assert all(int(a[3:]) % 2 == 0 for a in hit_new), (
        "fresh-text docs must not hit the index"
    )

    out_dir = str(tmp_path / "probe_out")

    def probe_batch(df, _bid):
        probe_lsh_index(index, df).write.mode("append").parquet(out_dir)

    q = (
        spark.readStream.schema(shard.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(shard_dir)
        .writeStream.foreachBatch(probe_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(map(tuple, spark.read.parquet(out_dir).collect()))
    assert got == batch
