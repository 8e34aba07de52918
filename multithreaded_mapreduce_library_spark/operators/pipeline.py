"""Training-data pipeline operators over ``documents`` — dataset split,
stratified sampling, sequence packing, and train/test contamination
(SURVEY.md §2.3 extension surface; no reference citations — the reference
has no dataset-management machinery at all, its closest notion is the
hash partitioner mapreduce.c:234-241, which is exactly the primitive these
operators build splits/samples from).

All four are built on the cross-engine md5 hash family (functions.h31) so
assignment decisions are bit-identical in Spark and the DuckDB oracle —
the same property a production pipeline needs for *reproducible* splits:
membership must be a pure function of the row, not of partitioning,
sampling order, or cluster size.

Scale notes (100 TB story):
- dataset_split / sample_stratified: pure narrow projections + one tiny
  agg exchange — no join, no wide shuffle; the hash IS the split, so the
  same row lands in the same split on any cluster.
- sequence_packing: ONE shuffle total — the window exchange on the
  stratum key doubles as the (stratum, bin) agg's distribution; bins are
  a prefix-sum over token counts, so packing is deterministic given the
  (lang, doc_id) order — no driver-side loop.
- contamination_check: inverted-index join on the shingle hash, with the
  candidate side pre-shrunk to the test split (a few % of rows) and hot
  shingles dropped by the df-cutoff (dedup.SHINGLE_DF_CUTOFF) — per-key
  join fanout is hard-capped at df², never n².
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from multithreaded_mapreduce_library_spark.functions import duck_h31, duck_tokens, h31, tokens
from multithreaded_mapreduce_library_spark.operators.dedup import (
    _DUCK_SHINGLES,
    _band_sig,
    _duck_minhash_cols,
    _shingles_df,
    N_BANDS,
    SHINGLE_DF_CUTOFF,
)
from multithreaded_mapreduce_library_spark.registry import register
from multithreaded_mapreduce_library_spark.sources import load_table

# Split fractions: hash-bucket thresholds out of 100. contamination_check
# derives its test split from VAL_CUT (bucket >= VAL_CUT), so "test" means
# the SAME documents in dataset_split and in the contamination scan.
TRAIN_CUT = 80
VAL_CUT = 90
SAMPLE_PER_MILLE = 100  # stratified sample keeps hash-bucket < 100 of 1000
PACK_CAPACITY = 2048  # tokens per packed sequence bin


def _split_bucket(col):
    """Stable per-doc hash bucket in [0, 100) — the split assignment key."""
    return F.pmod(h31(F.col(col).cast("string")), F.lit(100))


def _duck_split_bucket(col: str) -> str:
    return f"({duck_h31(f'CAST({col} AS VARCHAR)')} % 100)"


@register(
    "dataset_split",
    oracle=f"""
SELECT CASE WHEN {_duck_split_bucket('doc_id')} < {TRAIN_CUT} THEN 'train'
            WHEN {_duck_split_bucket('doc_id')} < {VAL_CUT} THEN 'val'
            ELSE 'test' END AS split,
       lang,
       count(*) AS n_docs,
       CAST(sum(len({duck_tokens('text')})) AS BIGINT) AS n_tokens
FROM documents
GROUP BY 1, 2
""",
    tags=("pipeline", "split", "llm-pipeline"),
    doc=(
        "Deterministic train/val/test split by content-stable hash bucket "
        f"({TRAIN_CUT}/{VAL_CUT - TRAIN_CUT}/{100 - VAL_CUT}): membership is a pure "
        "function of doc_id, so the split is reproducible across runs, "
        "clusters, and engines (the oracle computes the identical md5 "
        "bucket). One narrow projection + one small agg exchange on "
        "(split, lang) — rows are never shuffled, only per-group counters."
    ),
)
def dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    bucket = _split_bucket("doc_id")
    split = (
        F.when(bucket < TRAIN_CUT, "train")
        .when(bucket < VAL_CUT, "val")
        .otherwise("test")
    )
    return (
        d.select(split.alias("split"), "lang", F.size(tokens("text")).alias("n_tok"))
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
        )
    )


@register(
    "sample_stratified",
    oracle=f"""
SELECT doc_id, lang, n_chars
FROM documents
WHERE ({duck_h31('CAST(doc_id AS VARCHAR)')} % 1000) < {SAMPLE_PER_MILLE}
""",
    tags=("pipeline", "sampling", "llm-pipeline"),
    doc=(
        f"Deterministic {SAMPLE_PER_MILLE / 10:.0f}% sample by hash bucket: "
        "the per-row keep decision is engine- and partitioning-independent "
        "(contrast df.sample(), whose output depends on partition layout "
        "and seed plumbing). Within every stratum the hash is uniform, so "
        "each lang is sampled at the same rate without a per-stratum pass. "
        "Pure narrow filter — zero shuffles; at 100 TB the predicate rides "
        "the scan."
    ),
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    keep = F.pmod(h31(F.col("doc_id").cast("string")), F.lit(1000)) < SAMPLE_PER_MILLE
    return d.filter(keep).select("doc_id", "lang", "n_chars")


@register(
    "sequence_packing",
    oracle=f"""
WITH t AS (
  SELECT doc_id, lang, len({duck_tokens('text')}) AS n_tok FROM documents
),
c AS (
  SELECT doc_id, lang, n_tok,
         COALESCE(sum(n_tok) OVER (
           PARTITION BY lang ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tok_before
  FROM t
)
SELECT lang, CAST(floor(tok_before / {PACK_CAPACITY}) AS BIGINT) AS bin,
       count(*) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS total_tokens
FROM c
GROUP BY 1, 2
""",
    tags=("pipeline", "packing", "window", "llm-pipeline"),
    doc=(
        f"Sequence packing: assign docs to fixed-capacity context bins "
        f"({PACK_CAPACITY} tokens) per language via an exclusive running "
        "token count — chunked next-fit packing as a prefix sum, fully "
        "declarative (no driver loop, no stateful UDF). Deterministic "
        "given the (lang, doc_id) order. Shuffles: ONE exchange total — "
        "the window's lang partitioning also satisfies the (lang, bin) "
        "agg's distribution (bin is derived inside a lang partition), "
        "asserted in tests/test_plans.py. 100 TB note: the window "
        "partition key is the stratum; for skewed strata switch the order "
        "column to (hash-salt, doc_id) to split the prefix-sum chain."
    ),
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", "lang", F.size(tokens("text")).alias("n_tok"))
    w = (
        W.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    c = t.withColumn("tok_before", F.coalesce(F.sum("n_tok").over(w), F.lit(0)))
    return (
        c.select(
            "lang",
            F.floor(F.col("tok_before") / PACK_CAPACITY).alias("bin"),
            "n_tok",
        )
        .groupBy("lang", "bin")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tok").cast("long").alias("total_tokens"))
    )


@register(
    "contamination_check",
    oracle=f"""
WITH {_DUCK_SHINGLES},
hsb AS (
  SELECT doc_id, h FROM hs
  WHERE h IN (
    SELECT h FROM hs GROUP BY h HAVING count(*) <= {SHINGLE_DF_CUTOFF}
  )
),
labeled AS (
  SELECT doc_id, h,
         ({_duck_split_bucket('doc_id')} >= {VAL_CUT}) AS is_test,
         ({_duck_split_bucket('doc_id')} < {TRAIN_CUT}) AS is_train
  FROM hsb
)
SELECT t.doc_id AS test_doc_id,
       count(DISTINCT tr.doc_id) AS n_contaminating_docs,
       count(*) AS n_shared_shingles
FROM labeled t JOIN labeled tr ON t.h = tr.h AND tr.is_train
WHERE t.is_test
GROUP BY t.doc_id
""",
    tags=("pipeline", "contamination", "join", "llm-pipeline"),
    doc=(
        "Train/test contamination: for every test-split document (the "
        "same bucket >= VAL_CUT split dataset_split calls 'test'), count "
        "train-split documents (bucket < TRAIN_CUT — validation docs are "
        "neither side) sharing at least one 3-word shingle, via an "
        "inverted-index self-join on the shingle hash restricted to the "
        f"df-bounded vocabulary (shingles in ≤ {SHINGLE_DF_CUTOFF} docs) "
        "— a shingle shared by half the corpus is boilerplate, not "
        "contamination evidence, and would make per-key join fanout "
        "quadratic at 100 TB. n_shared_shingles counts (test doc, train "
        "doc, shingle) co-occurrences — a test doc sharing 2 shingles "
        "with each of 3 train docs scores 6, not 2. Shuffles: one "
        "two-phase df agg on h (map-side partials, no hot-key straggler) "
        "+ a semi join sharing that key with the contamination "
        "equi-join, one agg on test_doc_id."
    ),
)
def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    hs = _shingles_df(spark, sf_dir, distinct=True).select("doc_id", "h")
    # Two-phase df cutoff (not a count-over-window): map-side partial
    # counts shrink a hot shingle hash to one row per input partition
    # before the exchange, so no single task buffers all O(df) rows of a
    # boilerplate shingle; the semi join shares the h key with the df agg
    # and the contamination equi-join below, so AQE aligns the exchanges.
    rare = (
        hs.groupBy("h")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= SHINGLE_DF_CUTOFF)
        .select("h")
    )
    bounded = hs.join(rare, "h", "left_semi").select("doc_id", "h")
    sh = bounded.select(
        "doc_id",
        "h",
        (_split_bucket("doc_id") >= VAL_CUT).alias("is_test"),
        (_split_bucket("doc_id") < TRAIN_CUT).alias("is_train"),
    )
    test = sh.filter(F.col("is_test")).select(
        F.col("doc_id").alias("test_doc_id"), "h"
    )
    train = sh.filter(F.col("is_train")).select(
        F.col("doc_id").alias("train_doc_id"), "h"
    )
    return (
        test.join(train, "h")
        .groupBy("test_doc_id")
        .agg(
            F.countDistinct("train_doc_id").alias("n_contaminating_docs"),
            F.count("*").alias("n_shared_shingles"),
        )
    )


@register(
    "split_contamination_gate",
    oracle=f"""
WITH {_DUCK_SHINGLES},
hsb AS (
  SELECT doc_id, h FROM hs
  WHERE h IN (
    SELECT h FROM hs GROUP BY h HAVING count(*) <= {SHINGLE_DF_CUTOFF}
  )
),
contaminated AS (
  SELECT DISTINCT t.doc_id
  FROM hsb t JOIN hsb tr ON t.h = tr.h
  WHERE {_duck_split_bucket('t.doc_id')} >= {VAL_CUT}
    AND {_duck_split_bucket('tr.doc_id')} < {TRAIN_CUT}
),
test AS (
  SELECT doc_id, lang, len({duck_tokens('text')}) AS n_tok
  FROM documents WHERE {_duck_split_bucket('doc_id')} >= {VAL_CUT}
)
SELECT lang,
       count(*) AS n_test_docs,
       CAST(sum(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_contaminated_docs,
       CAST(sum(CASE WHEN c.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clean_docs,
       CAST(sum(CASE WHEN c.doc_id IS NULL THEN n_tok ELSE 0 END) AS BIGINT)
         AS clean_tokens
FROM test LEFT JOIN contaminated c ON test.doc_id = c.doc_id
GROUP BY lang
""",
    tags=("pipeline", "contamination", "split", "gate", "llm-pipeline"),
    doc=(
        "The eval-release gate that composes dataset_split with "
        "contamination_check: per language, how much of the TEST split "
        "(the same bucket >= VAL_CUT membership dataset_split assigns) "
        "survives decontamination — test docs sharing any df-bounded "
        "3-word shingle with a TRAIN doc are flagged, and the report "
        "carries per-lang test-doc counts, contaminated/clean splits, "
        "and the clean-token budget left for evaluation. This is the "
        "number a 100 TB pretraining pipeline actually gates a release "
        "on: 'after decontamination, is there enough held-out eval data "
        "per language?'. Shuffle story: the shingle df-cutoff agg and "
        "both membership semi-joins all key on the shingle hash h (one "
        "partitioning reused, exactly as contamination_check), the "
        "flagged-id set reduces to DISTINCT doc ids before touching the "
        "test frame, and the final flag join keys on doc_id with the "
        "tiny id side broadcast by AQE; docs' text never shuffles — "
        "token counts reduce at the scan."
    ),
)
def split_contamination_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    hs = _shingles_df(spark, sf_dir, distinct=True).select("doc_id", "h")
    rare = (
        hs.groupBy("h")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= SHINGLE_DF_CUTOFF)
        .select("h")
    )
    bounded = hs.join(rare, "h", "left_semi")
    test_sh = bounded.filter(_split_bucket("doc_id") >= VAL_CUT)
    train_sh = bounded.filter(_split_bucket("doc_id") < TRAIN_CUT).select("h")
    contaminated = (
        test_sh.join(train_sh, "h", "left_semi").select("doc_id").distinct()
    )
    d = load_table(spark, sf_dir, "documents")
    test = d.filter(_split_bucket("doc_id") >= VAL_CUT).select(
        "doc_id", "lang", F.size(tokens("text")).alias("n_tok")
    )
    flagged = test.join(
        contaminated.withColumn("bad", F.lit(1)), "doc_id", "left"
    )
    clean = F.col("bad").isNull()
    return flagged.groupBy("lang").agg(
        F.count("*").alias("n_test_docs"),
        F.sum(F.when(~clean, 1).otherwise(0)).cast("long").alias("n_contaminated_docs"),
        F.sum(F.when(clean, 1).otherwise(0)).cast("long").alias("n_clean_docs"),
        F.sum(F.when(clean, F.col("n_tok")).otherwise(0)).cast("long").alias("clean_tokens"),
    )


# Curation gates (C4/Gopher-style cheap filters; exact-int ratio math).
CURATE_MIN_TOKENS = 15
CURATE_MAX_TOKENS = 100_000
CURATE_MIN_TTR = 0.2  # type-token ratio floor (repetition filter)
CURATE_LANGS = ("en", "fr", "de", "es", "zh")


@register(
    "corpus_curation",
    oracle=f"""
WITH RECURSIVE {_DUCK_SHINGLES.strip().lstrip()},
mh AS (SELECT doc_id, {_duck_minhash_cols()} FROM hs GROUP BY doc_id),
bands AS ({" UNION ALL ".join(
    f"SELECT doc_id, {b} AS band, {_band_sig('', b)} AS sig FROM mh"
    for b in range(N_BANDS)
)}),
prs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM prs
  UNION ALL SELECT doc_b, doc_a FROM prs
),
mem AS (SELECT DISTINCT src AS doc_id FROM edges),
reach(doc_id, lbl) AS (
  SELECT doc_id, doc_id FROM mem
  UNION
  SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.doc_id
),
drops AS (
  SELECT doc_id FROM (SELECT doc_id, min(lbl) AS cluster_id FROM reach GROUP BY doc_id)
  WHERE doc_id <> cluster_id
),
scored AS (
  SELECT doc_id, lang, {duck_tokens('text')} AS toks FROM documents
)
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(len(toks)) AS BIGINT) AS n_tokens,
       min(s.doc_id) AS min_doc_id
FROM scored s
LEFT JOIN drops k ON s.doc_id = k.doc_id
WHERE k.doc_id IS NULL
  AND lang IN {CURATE_LANGS!r}
  AND len(toks) BETWEEN {CURATE_MIN_TOKENS} AND {CURATE_MAX_TOKENS}
  AND len(list_distinct(toks)) / len(toks) >= {CURATE_MIN_TTR}
GROUP BY lang
""",
    tags=("pipeline", "curation", "dedup", "quality", "llm-pipeline"),
    doc=(
        "The capstone curation pass — what the whole extension surface "
        "composes into: keep documents that (1) survive near-dup dedup "
        "(MinHash-LSH components, losers dropped), (2) pass the cheap "
        "quality gates (token-count band, type-token-ratio repetition "
        "floor — exact-int ratios, engines agree bit-for-bit), and "
        "(3) are in an allowed language; report the surviving corpus per "
        "language (docs, tokens). Shuffle story: quality+language gates "
        "ride the scan (narrow); the drop list broadcasts into the "
        "anti-join; one final (lang) agg exchange of counters. At 100 TB "
        "the only heavy machinery is the LSH pipeline it shares with "
        "dedup_minhash — the curation pass itself adds zero wide "
        "shuffles."
    ),
)
def corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from multithreaded_mapreduce_library_spark.operators.dedup import _cluster_labels

    drops = (
        _cluster_labels(spark, sf_dir)
        .filter(F.col("doc_id") != F.col("lbl"))
        .select("doc_id")
    )
    d = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    n = F.size("toks")
    kept = (
        d.select("doc_id", "lang", toks.alias("toks"))
        .filter(F.col("lang").isin(*CURATE_LANGS))
        .filter((n >= CURATE_MIN_TOKENS) & (n <= CURATE_MAX_TOKENS))
        .filter(F.size(F.array_distinct("toks")) / n >= CURATE_MIN_TTR)
        .join(F.broadcast(drops), "doc_id", "left_anti")
    )
    return kept.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size("toks")).cast("long").alias("n_tokens"),
        F.min("doc_id").alias("min_doc_id"),
    )


# PII redaction patterns — deliberately simple char-class forms that parse
# identically under Java regex (Spark) and RE2 (DuckDB); no lookaround, no
# shorthand classes with engine-specific Unicode semantics.
EMAIL_RE = "[a-z0-9]+@[a-z0-9]+\\.[a-z]+"
PHONE_RE = "\\+1-555-[0-9]{4}"


@register(
    "pii_redact",
    oracle=f"""
WITH aug AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 2 = 0
                 THEN ' contact user' || doc_id || '@example.com now'
                 ELSE '' END
         || CASE WHEN doc_id % 3 = 0
                 THEN ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                 ELSE '' END AS aug_text
  FROM documents
),
red AS (
  SELECT doc_id,
         len(regexp_extract_all(aug_text, '{EMAIL_RE}')) AS n_emails,
         len(regexp_extract_all(aug_text, '{PHONE_RE}')) AS n_phones,
         regexp_replace(
           regexp_replace(aug_text, '{EMAIL_RE}', '<EMAIL>', 'g'),
           '{PHONE_RE}', '<PHONE>', 'g') AS clean
  FROM aug
)
SELECT doc_id,
       CAST(n_emails AS BIGINT) AS n_emails,
       CAST(n_phones AS BIGINT) AS n_phones,
       length(clean) AS clean_len,
       md5(clean) AS clean_md5
FROM red
""",
    tags=("pipeline", "pii", "redaction", "llm-pipeline"),
    doc=(
        "PII redaction pass: inject synthetic, doc_id-deterministic PII "
        "(an email on even doc_ids, a phone number on doc_ids % 3 = 0 — "
        "the fixture corpus contains none), then count and redact it with "
        "engine-portable regexes; clean_md5 pins the ENTIRE redacted text "
        "byte-for-byte against the oracle, so a partial or over-eager "
        "redaction is a hash mismatch, not a silent pass. Shuffle story: "
        "ZERO exchanges — redaction is a narrow per-row projection that "
        "rides the scan, the shape you want when scrubbing 100 TB "
        "(plan-asserted in tests/test_plans.py)."
    ),
)
def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    email = F.when(
        F.col("doc_id") % 2 == 0,
        F.concat(
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com now"),
        ),
    ).otherwise("")
    phone = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(
            F.lit(" call +1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ),
    ).otherwise("")
    aug = F.concat(F.col("text"), email, phone)
    clean = F.regexp_replace(
        F.regexp_replace(aug, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    return load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.regexp_count(aug, F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(aug, F.lit(PHONE_RE)).cast("long").alias("n_phones"),
        F.length(clean).alias("clean_len"),
        F.md5(clean).alias("clean_md5"),
    )


# --- Z-order layout clustering --------------------------------------------

# Bits interleaved per dimension. 21 bits covers keys to ~2M (l_partkey
# reaches 200k at TPC-H sf1 and ~2M at sf10); keys above 2^21 would have
# their high bits silently truncated and collapse distant keys into one
# z-bucket, so the width must grow with the keyspace (2 x 21 = 42 bits,
# comfortably inside BIGINT).
_Z_BITS = 21


def _z_spark(a: str, b: str) -> str:
    """Morton/Z-order interleave of two non-negative ints, ``a`` on odd
    bit positions, ``b`` on even — pure BIGINT bit ops, identical on any
    engine."""
    terms = []
    for i in range(_Z_BITS):
        terms.append(
            f"shiftleft(CAST(shiftright({a}, {i}) & 1 AS BIGINT), {2 * i + 1})"
        )
        terms.append(
            f"shiftleft(CAST(shiftright({b}, {i}) & 1 AS BIGINT), {2 * i})"
        )
    return "(" + " + ".join(terms) + ")"


def _z_duck(a: str, b: str) -> str:
    terms = []
    for i in range(_Z_BITS):
        terms.append(f"(CAST((({a} >> {i}) & 1) AS BIGINT) << {2 * i + 1})")
        terms.append(f"(CAST((({b} >> {i}) & 1) AS BIGINT) << {2 * i})")
    return "(" + " + ".join(terms) + ")"


N_Z_BUCKETS = 64


@register(
    "layout_zorder",
    oracle=f"""
WITH z AS (
  SELECT {_z_duck('l_partkey', 'l_suppkey')} AS zkey, l_partkey, l_suppkey
  FROM lineitem
),
s AS (SELECT (max(zkey) // {N_Z_BUCKETS}) + 1 AS stride FROM z)
SELECT zkey // stride AS bucket,
       CAST(count(*) AS BIGINT) AS n_rows,
       min(l_partkey) AS p_min, max(l_partkey) AS p_max,
       min(l_suppkey) AS s_min, max(l_suppkey) AS s_max
FROM z CROSS JOIN s
GROUP BY 1
""",
    tags=("layout", "zorder", "pruning", "llm-pipeline"),
    doc=(
        "Z-order (Morton) layout clustering — the data-layout operator "
        "behind multi-dimensional partition pruning at 100 TB (Delta/"
        "Iceberg OPTIMIZE ZORDER BY): interleave the bits of two "
        "filter columns into one BIGINT z-key (pure integer ops, engine-"
        "exact), split the z-range into contiguous buckets via an "
        "adaptive integer stride (one 1-row max aggregate broadcast "
        "back — the documented tiny-stats crossJoin), and emit per-"
        "bucket min/max envelopes of BOTH dimensions. Because the "
        "z-curve keeps nearby (partkey, suppkey) pairs in nearby key "
        "ranges, each bucket's envelope is a small rectangle — exactly "
        "the file-level min/max statistics a scan would prune against "
        "after `repartitionByRange(zkey)` + sortWithinPartitions at "
        "write time (the summary here IS that pruning-power evidence, "
        "pinned by a locality test). Shuffle story: the z-key is a "
        "narrow projection riding the scan; ONE partial-aggregated "
        "exchange on the bucket id; the at-scale layout write is "
        "range-repartitioning on the same key — no skew (the stride "
        "splits the realized key range evenly)."
    ),
)
def layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    z = load_table(spark, sf_dir, "lineitem").select(
        F.expr(_z_spark("l_partkey", "l_suppkey")).alias("zkey"),
        "l_partkey",
        "l_suppkey",
    )
    stride = z.agg(
        ((F.max("zkey") / F.lit(N_Z_BUCKETS)).cast("long") + 1).alias("stride")
    )
    return (
        z.crossJoin(F.broadcast(stride))
        .groupBy(F.expr("zkey div stride").alias("bucket"))
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.min("l_partkey").alias("p_min"),
            F.max("l_partkey").alias("p_max"),
            F.min("l_suppkey").alias("s_min"),
            F.max("l_suppkey").alias("s_max"),
        )
    )


# ---------------------------------------------------------------------------
# weighted (probability-proportional-to-size) sampling
# ---------------------------------------------------------------------------

W_CAP = 400  # chars at which inclusion probability saturates at 1.0


@register(
    "sample_weighted",
    oracle=f"""
SELECT doc_id, lang, n_chars,
       CAST({W_CAP} AS DOUBLE) / least(n_chars, {W_CAP}) AS ht_weight
FROM documents
WHERE ({duck_h31('CAST(doc_id AS VARCHAR)')} % 1000) * {W_CAP}
      < least(n_chars, {W_CAP}) * 1000
""",
    tags=("pipeline", "sampling", "weighted", "llm-pipeline"),
    doc=(
        "Deterministic probability-proportional-to-size sample: each doc "
        f"is kept with probability min(n_chars/{W_CAP}, 1) — the "
        "mixture-building primitive that up-weights long documents "
        "without a per-stratum pass. The keep decision is a pure integer "
        "comparison on the cross-engine md5 bucket (no float thresholds, "
        "no RNG state), so membership is identical on any cluster, any "
        "partitioning, and in the DuckDB oracle. ht_weight is the "
        "Horvitz-Thompson inverse inclusion probability (a single IEEE "
        "division — correctly rounded, hence bit-identical across "
        "engines) for unbiased downstream estimates. Pure narrow filter "
        "+ projection — zero shuffles; at 100 TB the predicate rides the "
        "scan."
    ),
)
def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    pr = F.least(F.col("n_chars"), F.lit(W_CAP))
    bucket = F.pmod(h31(F.col("doc_id").cast("string")), F.lit(1000))
    return d.filter(bucket * W_CAP < pr * 1000).select(
        "doc_id",
        "lang",
        "n_chars",
        (F.lit(float(W_CAP)) / pr).alias("ht_weight"),
    )


# ---------------------------------------------------------------------------
# mixture balancing (downsample every group to the smallest group's rate)
# ---------------------------------------------------------------------------

MIX_BUCKETS = 1_000_000  # hash-bucket resolution for per-group keep rates


@register(
    "mixture_sample",
    oracle=f"""
WITH c AS (SELECT lang, count(*) AS n_before FROM documents GROUP BY lang),
m AS (SELECT min(n_before) AS m FROM c),
kept AS (
  SELECT d.lang
  FROM documents d JOIN c USING (lang)
  WHERE ({duck_h31('CAST(d.doc_id AS VARCHAR)')} % {MIX_BUCKETS}) * c.n_before
        < (SELECT m FROM m) * {MIX_BUCKETS}
)
SELECT c.lang, c.n_before, CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept
FROM c LEFT JOIN (SELECT lang, count(*) AS n_kept FROM kept GROUP BY lang) k
USING (lang)
""",
    tags=("pipeline", "sampling", "mixture", "llm-pipeline"),
    doc=(
        "Data-mixture balancing: every language group is downsampled to "
        "the SMALLEST group's size (keep probability m/n_g), the uniform-"
        "mixture primitive for multilingual training sets. The per-doc "
        "keep decision is a pure integer comparison — hash bucket * "
        "group count < min count * resolution — so membership is "
        "engine-, partitioning- and cluster-independent, and within "
        "each group the hash is uniform, so realized rates concentrate "
        "at m/n_g without any per-group second pass over the data. "
        "Shuffle story: one tiny per-group count agg (|langs| rows, "
        "broadcast back with the 1-row min), then the keep filter rides "
        "the scan; the only other exchange carries per-group counters."
    ),
)
def mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    c = d.groupBy("lang").agg(F.count("*").alias("n_before"))
    m = c.agg(F.min("n_before").alias("m"))
    bucket = F.pmod(h31(F.col("doc_id").cast("string")), F.lit(MIX_BUCKETS))
    kept = (
        d.join(F.broadcast(c), "lang")
        .crossJoin(F.broadcast(m))
        .filter(bucket * F.col("n_before") < F.col("m") * MIX_BUCKETS)
        .groupBy("lang")
        .agg(F.count("*").alias("n_kept"))
    )
    return c.join(F.broadcast(kept), "lang", "left").select(
        "lang",
        "n_before",
        F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
    )


# ---------------------------------------------------------------------------
# exact AUC (Mann-Whitney with average ranks)
# ---------------------------------------------------------------------------

@register(
    "eval_auc",
    oracle="""
WITH x AS (
  SELECT source, n_chars, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
  FROM documents
), r AS (
  SELECT source, pos,
         2 * rank() OVER (PARTITION BY source ORDER BY n_chars)
           + count(*) OVER (PARTITION BY source, n_chars) - 1 AS avg2
  FROM x
)
SELECT source,
       CAST(sum(pos) AS BIGINT) AS n_pos,
       CAST(count(*) - sum(pos) AS BIGINT) AS n_neg,
       CAST(sum(CASE WHEN pos = 1 THEN avg2 ELSE 0 END)
              - sum(pos) * (sum(pos) + 1) AS BIGINT)
         / CAST(2 * sum(pos) * (count(*) - sum(pos)) AS BIGINT) AS auc
FROM r GROUP BY source
HAVING sum(pos) > 0 AND count(*) - sum(pos) > 0
""",
    tags=("pipeline", "evaluation", "auc", "llm-pipeline"),
    doc=(
        "EXACT ROC-AUC per source (does document length separate English "
        "from non-English docs?) via the Mann-Whitney rank-sum identity "
        "with midrank tie handling — the evaluation primitive for any "
        "scored classifier over a big corpus, computed without "
        "thresholds or sampling. Exactness: average ranks are carried "
        "DOUBLED (2r + k - 1, pure integers — a tie group's midrank is "
        "a half-integer), summed as BIGINT (order-independent), and the "
        "AUC is a single integer-ratio division — bit-identical across "
        "engines, no float rank accumulation. Shuffle story: ONE window "
        "exchange on source (both window passes share it), then the "
        "rank sums partial-aggregate on the same key. Degenerate "
        "single-class groups are excluded (AUC undefined)."
    ),
)
def eval_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    x = d.select(
        "source",
        "n_chars",
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
    )
    wr = W.partitionBy("source").orderBy("n_chars")
    wt = W.partitionBy("source", "n_chars")
    r = x.select(
        "source",
        "pos",
        (2 * F.rank().over(wr) + F.count("*").over(wt) - 1).alias("avg2"),
    )
    agg = r.groupBy("source").agg(
        F.sum("pos").cast("long").alias("n_pos"),
        (F.count("*") - F.sum("pos")).cast("long").alias("n_neg"),
        F.sum(F.when(F.col("pos") == 1, F.col("avg2")).otherwise(0))
        .cast("long")
        .alias("r2sum"),
    )
    return (
        agg.filter((F.col("n_pos") > 0) & (F.col("n_neg") > 0))
        .select(
            "source",
            "n_pos",
            "n_neg",
            (
                (F.col("r2sum") - F.col("n_pos") * (F.col("n_pos") + 1))
                / (2 * F.col("n_pos") * F.col("n_neg"))
            ).alias("auc"),
        )
    )


# --- hybrid retrieval: BM25 + embedding-cosine RRF fusion -------------------

HYBRID_N = 50  # shortlist depth per leg
RRF_K = 60  # standard reciprocal-rank-fusion constant
HYBRID_QUERY_VEC = 0  # the query document: its embedding is the semantic query
HYBRID_TOP = 20


def _hybrid_ctes() -> str:
    """The BM25-leg + cosine-leg + RRF-fusion CTE chain, shared VERBATIM
    by hybrid_retrieval's oracle and mmr_rerank's (the candidate set the
    reranker diversifies is the fused shortlist, by construction)."""
    from multithreaded_mapreduce_library_spark.operators.similarity import (
        _duck_cosine,
    )
    from multithreaded_mapreduce_library_spark.operators.text import BM25_CORE_CTES

    return f"""{BM25_CORE_CTES},
lex AS (
  SELECT doc_id, row_number() OVER (ORDER BY sum_fx DESC, doc_id) AS r_lex
  FROM (SELECT doc_id, sum_fx FROM scored WHERE sum_fx > 0
        ORDER BY sum_fx DESC, doc_id LIMIT {HYBRID_N})
),
q AS (SELECT embedding AS v FROM embeddings WHERE vec_id = {HYBRID_QUERY_VEC}),
cos AS (
  SELECT e.vec_id AS doc_id, {_duck_cosine('e.embedding', 'q.v')} AS c
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> {HYBRID_QUERY_VEC}
),
sem AS (
  SELECT doc_id, row_number() OVER (ORDER BY c DESC, doc_id) AS r_sem
  FROM (SELECT doc_id, c FROM cos ORDER BY c DESC, doc_id LIMIT {HYBRID_N})
),
fused AS (
  SELECT coalesce(lex.doc_id, sem.doc_id) AS doc_id,
         (coalesce(1.0 / ({RRF_K} + r_lex), 0.0)
          + coalesce(1.0 / ({RRF_K} + r_sem), 0.0)) AS rrf,
         r_lex, r_sem
  FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
)"""


def _hybrid_oracle() -> str:
    return f"""
WITH {_hybrid_ctes()}
SELECT doc_id, rrf,
       CAST(coalesce(r_lex, -1) AS BIGINT) AS lex_rank,
       CAST(coalesce(r_sem, -1) AS BIGINT) AS sem_rank
FROM fused
ORDER BY rrf DESC, doc_id
LIMIT {HYBRID_TOP}
"""


@register(
    "hybrid_retrieval",
    oracle=_hybrid_oracle(),
    tags=("retrieval", "bm25", "similarity", "rrf", "llm-pipeline"),
    doc=(
        "Hybrid retrieval with reciprocal-rank fusion — the production "
        "RAG retrieval pattern (lexical BM25 leg + semantic embedding "
        f"leg, fused by 1/({RRF_K}+rank) contributions): the BM25 scored "
        "frame (shared verbatim with bm25_search — code AND oracle CTEs) "
        f"yields the top-{HYBRID_N} lexical shortlist; exact cosine to "
        f"the query document's embedding (vec_id {HYBRID_QUERY_VEC}, the "
        "shared sequential fold — bit-identical across engines) yields "
        f"the top-{HYBRID_N} semantic shortlist; each leg is ranked "
        "inside its shortlist, full-outer-joined on doc_id, and the top-"
        f"{HYBRID_TOP} by fused score (unique-doc_id tiebreak) emitted "
        "with both leg ranks (-1 = absent from that leg). Exactness: "
        "ranks are integers, each RRF term is one IEEE divide on integer "
        "inputs and the fusion is ONE two-term add in a fixed order — no "
        "accumulation hazard. Shuffle story: the lexical leg is "
        "bm25_scored's single exchange + a distributed TakeOrdered; the "
        "semantic leg broadcasts the 1-row query vector (never shuffles "
        "the corpus) + TakeOrdered; the rank windows and the fusion join "
        f"run on two {HYBRID_N}-row shortlists — metadata-scale. At 100 "
        "TB the semantic shortlist comes from the IVF/PQ index family "
        "instead of the exact scan (same fused shape); the legs stay "
        "independent scans fused only at shortlist size."
    ),
)
def hybrid_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from multithreaded_mapreduce_library_spark.operators.similarity import (
        _SPARK_COSINE,
        _SPARK_NORM,
        _dvec,
        _load_embeddings,
    )
    from multithreaded_mapreduce_library_spark.operators.text import bm25_scored

    lex_short = (
        bm25_scored(spark, sf_dir)
        .filter(F.col("sum_fx") > 0)
        .orderBy(F.col("sum_fx").desc(), "doc_id")
        .limit(HYBRID_N)
    )
    w_lex = W.orderBy(F.col("sum_fx").desc(), "doc_id")
    lex = lex_short.select(
        "doc_id", F.row_number().over(w_lex).alias("r_lex")
    )

    e = _load_embeddings(spark, sf_dir).select(
        "vec_id", _dvec("embedding").alias("v")
    ).withColumn("norm", F.expr(_SPARK_NORM))
    q = e.filter(F.col("vec_id") == HYBRID_QUERY_VEC).select(
        F.col("v").alias("va"), F.col("norm").alias("norm_a")
    )
    cos = (
        e.filter(F.col("vec_id") != HYBRID_QUERY_VEC)
        .select(F.col("vec_id").alias("doc_id"), F.col("v").alias("vb"),
                F.col("norm").alias("norm_b"))
        .crossJoin(F.broadcast(q))
        .select("doc_id", F.expr(_SPARK_COSINE).alias("c"))
    )
    sem_short = cos.orderBy(F.col("c").desc(), "doc_id").limit(HYBRID_N)
    w_sem = W.orderBy(F.col("c").desc(), "doc_id")
    sem = sem_short.select(
        "doc_id", F.row_number().over(w_sem).alias("r_sem")
    )

    fused = lex.alias("l").join(
        sem.alias("s"), F.col("l.doc_id") == F.col("s.doc_id"), "full_outer"
    )
    rrf = F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("r_lex")), F.lit(0.0)) + (
        F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("r_sem")), F.lit(0.0))
    )
    return (
        fused.select(
            F.coalesce(F.col("l.doc_id"), F.col("s.doc_id")).alias("doc_id"),
            rrf.alias("rrf"),
            F.coalesce(F.col("r_lex"), F.lit(-1)).cast("long").alias("lex_rank"),
            F.coalesce(F.col("r_sem"), F.lit(-1)).cast("long").alias("sem_rank"),
        )
        .orderBy(F.col("rrf").desc(), "doc_id")
        .limit(HYBRID_TOP)
    )


# --- MMR diversity rerank over the hybrid shortlist -------------------------

MMR_K = 10  # reranked depth
MMR_LAMBDA = 0.5  # relevance-vs-diversity weight (0.5 => exact halving, no rounding)


def _mmr_oracle() -> str:
    from multithreaded_mapreduce_library_spark.operators.similarity import (
        _duck_cosine,
    )

    return f"""
WITH RECURSIVE {_hybrid_ctes()},
top AS (
  SELECT doc_id, rrf FROM fused ORDER BY rrf DESC, doc_id LIMIT {HYBRID_TOP}
),
pc AS (
  SELECT a.doc_id AS da, b.doc_id AS db,
         {_duck_cosine('ea.embedding', 'eb.embedding')} AS c
  FROM top a JOIN top b ON a.doc_id <> b.doc_id
  JOIN embeddings ea ON ea.vec_id = a.doc_id
  JOIN embeddings eb ON eb.vec_id = b.doc_id
),
mmr(step, sel) AS (
  SELECT 1, [(SELECT doc_id FROM top ORDER BY rrf DESC, doc_id LIMIT 1)]
  UNION ALL
  SELECT step + 1, list_append(sel, (
      SELECT doc_id FROM top
      WHERE NOT list_contains(mmr.sel, doc_id)
      ORDER BY {MMR_LAMBDA} * rrf - {1.0 - MMR_LAMBDA} * coalesce((
          SELECT max(c) FROM pc
          WHERE pc.da = top.doc_id AND list_contains(mmr.sel, pc.db)
        ), 0.0) DESC, doc_id
      LIMIT 1))
  FROM mmr
  WHERE step < {MMR_K}
    AND EXISTS (SELECT 1 FROM top WHERE NOT list_contains(mmr.sel, doc_id))
),
ranked AS (
  SELECT unnest(sel) AS doc_id,
         unnest(generate_series(1, len(sel))) AS mmr_rank
  FROM mmr WHERE step = (SELECT max(step) FROM mmr)
)
SELECT ranked.doc_id, CAST(mmr_rank AS BIGINT) AS mmr_rank, top.rrf
FROM ranked JOIN top ON ranked.doc_id = top.doc_id
"""


@register(
    "mmr_rerank",
    oracle=_mmr_oracle(),
    tags=("retrieval", "mmr", "rerank", "llm-pipeline"),
    doc=(
        "Maximal-marginal-relevance diversity rerank of the hybrid "
        f"shortlist — the rerank stage after hybrid_retrieval in a RAG "
        f"stack: greedily select {MMR_K} of the top-{HYBRID_TOP} fused "
        f"candidates, each step maximizing lambda*rrf - (1-lambda)*"
        "max_cosine_to_already_selected (lambda=0.5 — an exact power-of-"
        "two scaling, so the score arithmetic is two exact halvings and "
        "one subtract on bit-identical inputs; ties break on doc_id). "
        "The oracle runs the IDENTICAL greedy as a DuckDB recursive CTE "
        "carrying the selected list; candidate rrf comes from the CTE "
        "chain shared verbatim with hybrid_retrieval, and candidate-pair "
        "cosines use the shared sequential fold — so the driver's hash "
        "equality proves the whole greedy trajectory, not just the final "
        "set. Shuffle story: the legs and fusion as hybrid_retrieval; "
        f"pair scoring is a shortlist-local broadcast join (<= "
        f"{HYBRID_TOP}x{HYBRID_TOP} rows); the greedy itself runs driver-"
        f"side over the collected K={HYBRID_TOP} shortlist (a constant-"
        "size planner-scale fetch, like production rerankers — data "
        "volume never reaches this step; the corpus-scale work all "
        "happened in the legs)."
    ),
)
def mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from multithreaded_mapreduce_library_spark.operators.similarity import (
        _SPARK_COSINE,
        _SPARK_NORM,
        _dvec,
        _load_embeddings,
    )

    top = hybrid_retrieval(spark, sf_dir).select("doc_id", "rrf")
    e = _load_embeddings(spark, sf_dir).select(
        "vec_id", _dvec("embedding").alias("v")
    ).withColumn("norm", F.expr(_SPARK_NORM))
    cand_vecs = e.join(
        F.broadcast(top.select(F.col("doc_id").alias("vec_id"))), "vec_id"
    )
    a = cand_vecs.select(
        F.col("vec_id").alias("da"), F.col("v").alias("va"), F.col("norm").alias("norm_a")
    )
    b = cand_vecs.select(
        F.col("vec_id").alias("db"), F.col("v").alias("vb"), F.col("norm").alias("norm_b")
    )
    pairs = (
        F.broadcast(a)
        .join(b, F.col("da") != F.col("db"))
        .select("da", "db", F.expr(_SPARK_COSINE).alias("c"))
    )
    # constant-size planner-scale fetches: K rows + K*(K-1) pair scores
    rel = {r["doc_id"]: r["rrf"] for r in top.collect()}
    sim: dict[tuple[int, int], float] = {
        (r["da"], r["db"]): r["c"] for r in pairs.collect()
    }
    # greedy MMR — the bit-identical Python twin of the recursive CTE:
    # Python floats are IEEE doubles, the inputs (rrf, cosine) are the
    # engines' own outputs, and every score op (two exact halvings, one
    # subtract, max over doubles) matches the SQL expression order.
    schema = "doc_id long, mmr_rank long, rrf double"
    if not rel:
        # empty shortlist (no fused candidates at all): the oracle's
        # anchor SELECT yields NULL -> the recursive CTE produces no
        # usable rank rows and the final join returns empty; match it
        # before min() over an empty dict could raise
        return spark.createDataFrame([], schema)
    first = min(rel, key=lambda d: (-rel[d], d))
    sel = [first]

    def mmr_score(d: int) -> float:
        # pair cosines exist only where BOTH docs are embedded (the
        # fixture's lexical leg can surface docs without embeddings):
        # with no measurable redundancy the penalty term is exactly 0.0
        # — the same coalesce the recursive-CTE oracle applies
        vals = [sim[(d, s)] for s in sel if (d, s) in sim]
        ms = max(vals) if vals else 0.0
        return MMR_LAMBDA * rel[d] - (1.0 - MMR_LAMBDA) * ms

    while len(sel) < MMR_K:
        remaining = [d for d in rel if d not in sel]
        if not remaining:
            # shortlist smaller than MMR_K (tiny corpus): stop with what
            # exists — the oracle's recursive CTE terminates identically
            # via its EXISTS guard + max(step) final selection
            break
        best = min(remaining, key=lambda d: (-mmr_score(d), d))
        sel.append(best)
    rows = [(d, i + 1, rel[d]) for i, d in enumerate(sel)]
    return spark.createDataFrame(rows, schema)
