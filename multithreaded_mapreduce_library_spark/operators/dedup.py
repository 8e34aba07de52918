"""Deduplication operators over ``documents`` — exact, MinHash+LSH,
SimHash, and n-gram Jaccard (SURVEY.md §2.3 extension operators; the
reference's only dedup-adjacent machinery is the per-partition unique-key
directory, mapreduce.c:123-132).

Cross-engine exactness trick: every hash in these operators derives from
the shared md5-based 60-bit integer (functions module), with all modular
arithmetic below 2^62, so the Spark builder and the *generated* DuckDB
oracle compute identical integers — MinHash minima, SimHash bits and band
keys match bit-for-bit. The Spark side stays entirely in JVM built-ins
(no Python UDFs) so whole-stage codegen applies.

Scale notes (100 TB story):
- exact dedup: hash-groupBy — one shuffle on the content hash.
- MinHash LSH: shingle explode → per-doc signature (one shuffle) → band
  explode → band-bucket self-join (shuffle on band key). Candidate pairs
  only — never the O(n²) cross join.
- SimHash: banded the same way (4×12-bit bands over 48-bit signatures ⇒
  guaranteed recall for Hamming ≤ 3 — pigeonhole: ≤3 flips leave ≥1 band
  untouched).
- n-gram Jaccard: candidate pairs via the inverted shingle index join;
  demoted to rare-shingle pairs at scale (a stop-shingle cutoff caps the
  per-shingle fanout, like a df-cutoff in an inverted index).
"""

from __future__ import annotations

from functools import reduce as _reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from multithreaded_mapreduce_library_spark.functions import (
    MOD_P,
    duck_md5_long60,
    duck_tokens,
    h31,
    md5_long60,
    tokens,
)
from multithreaded_mapreduce_library_spark.registry import register
from multithreaded_mapreduce_library_spark.sources import load_table, rebalance_scan

# MinHash family: h_i(x) = (a_i * h31(x) + b_i) mod P. Coefficients are
# small (< 2^17) so a_i * h31 < 2^48 — overflow-free in both engines.
MINHASH_PARAMS: tuple[tuple[int, int], ...] = (
    (5167, 12553), (7589, 28411), (9173, 44017), (11261, 59671),
    (13217, 75223), (15391, 90847), (17489, 106451), (19577, 122069),
    (21611, 137687), (23687, 153313), (25747, 168899), (27791, 184511),
    (29873, 200129), (31957, 215741), (34019, 231359), (36097, 246967),
)
N_HASHES = len(MINHASH_PARAMS)
N_BANDS = 4
ROWS_PER_BAND = N_HASHES // N_BANDS

# 48-bit signatures: highest-discrimination width whose per-bit weight
# (1 << 47) still sums safely in a signed 64-bit BIGINT in both engines.
# Hamming ≤ 3 with 4 bands of 12 bits guarantees recall (3 flipped bits
# can corrupt at most 3 bands — at least one band survives intact).
SIMHASH_BITS = 48
SIMHASH_BANDS = 4
SIMHASH_BAND_BITS = SIMHASH_BITS // SIMHASH_BANDS
SIMHASH_MAX_HAMMING = 3

JACCARD_THRESHOLD = 0.08

# Stop-shingle demotion: a shingle appearing in more than DF_CUTOFF docs
# generates O(df²) candidate pairs in any inverted-index self-join — with
# Zipf-distributed shingle frequency one hot trigram ("in the the", boiler-
# plate headers) makes the join quadratic at 100 TB. Dropping shingles with
# df > K bounds per-key fanout at K² while near-dup pairs keep matching on
# their rare shingles (the discriminative evidence). K=20 prunes the top of
# the measured sf0.1 distribution (max df 25) so the cutoff path is
# exercised at bench scale, not just declared.
SHINGLE_DF_CUTOFF = 20


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

@register(
    "dedup_exact",
    oracle="""
SELECT md5(text) AS content_hash,
       min(doc_id) AS keeper_id,
       count(*) AS copies
FROM documents
GROUP BY 1
""",
    tags=("dedup", "llm-pipeline"),
    doc=(
        "Exact dedup by content hash: one shuffle on md5(text), keep the "
        "lowest doc_id per group. At 100 TB the hash (not the text) is the "
        "shuffle key, so shuffle volume is O(rows), not O(bytes)."
    ),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5(F.col("text").cast("binary")).alias("content_hash"))
        .agg(F.min("doc_id").alias("keeper_id"), F.count("*").alias("copies"))
    )


# ---------------------------------------------------------------------------
# shared shingle machinery
# ---------------------------------------------------------------------------

def _shingles_df(spark: SparkSession, sf_dir: str, distinct: bool = True) -> DataFrame:
    """3-word shingles per doc with their h31 hash (JVM-only).

    ``distinct=False`` skips the per-doc dedup shuffle — correct whenever
    the consumer is duplicate-insensitive (MinHash minima are).

    The scan is rebalanced first: tokenize + shingle explode + md5 per
    shingle is the CPU-heavy part of the whole LSH pipeline, and a
    single-row-group source would otherwise run it in one task."""
    d = rebalance_scan(load_table(spark, sf_dir, "documents"), spark)
    toks = d.select("doc_id", tokens("text").alias("toks"))
    shingles = toks.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("toks") >= 3,
                F.transform(
                    F.sequence(F.lit(1), F.size("toks") - 2),
                    lambda i: F.array_join(F.slice("toks", i, 3), " "),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("shingle"),
    )
    if distinct:
        shingles = shingles.distinct()
    return shingles.withColumn("h", h31(F.col("shingle")))


_DUCK_SHINGLES = f"""
toks AS (SELECT doc_id, {duck_tokens('text')} AS toks FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(generate_series(1, greatest(len(toks) - 2, 0)),
                               i -> array_to_string(toks[i:i+2], ' '))) AS shingle
  FROM toks
),
hs AS (SELECT doc_id, (('0x' || substr(md5(shingle), 1, 15))::BIGINT % {MOD_P}) AS h FROM sh)
"""


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _minhash_agg_cols() -> list[Column]:
    return [
        F.min(F.pmod(F.col("h") * a + b, F.lit(MOD_P))).alias(f"mh{i}")
        for i, (a, b) in enumerate(MINHASH_PARAMS)
    ]


def _duck_minhash_cols() -> str:
    return ",\n         ".join(
        f"min((h * {a} + {b}) % {MOD_P}) AS mh{i}"
        for i, (a, b) in enumerate(MINHASH_PARAMS)
    )


def _band_sig(prefix: str, band: int) -> str:
    cols = ", ".join(f"{prefix}mh{band * ROWS_PER_BAND + j}" for j in range(ROWS_PER_BAND))
    return f"concat_ws('-', {cols})"


_MINHASH_ORACLE = f"""
WITH {_DUCK_SHINGLES},
mh AS (SELECT doc_id, {_duck_minhash_cols()} FROM hs GROUP BY doc_id),
bands AS (
  {" UNION ALL ".join(
      f"SELECT doc_id, {b} AS band, {_band_sig('', b)} AS sig FROM mh"
      for b in range(N_BANDS)
  )}
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
)
SELECT p.doc_a, p.doc_b,
       round(({" + ".join(f"(x.mh{i} = y.mh{i})::INT" for i in range(N_HASHES))}) / {N_HASHES}.0, 6) AS est_jaccard
FROM pairs p
JOIN mh x ON x.doc_id = p.doc_a
JOIN mh y ON y.doc_id = p.doc_b
"""


@register(
    "dedup_minhash",
    oracle=_MINHASH_ORACLE,
    tags=("dedup", "minhash", "lsh", "llm-pipeline"),
    doc=(
        f"MinHash ({N_HASHES} hashes) + LSH banding ({N_BANDS}×{ROWS_PER_BAND}): "
        "near-dup candidate pairs with estimated Jaccard. Shuffles: shingles→"
        "signature agg, band self-join. Never materializes the n² pair space."
    ),
)
def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Explode + partial-min groupBy is deliberately kept over the tempting
    # "narrow" alternative (hash array + 16× array_min(transform(hs,...))):
    # CollapseProject inlines the hs subtree into every minimum and
    # higher-order functions get no codegen subexpression elimination, so
    # the per-shingle md5 runs 16× (measured 1.83s vs 1.04s at sf0.1).
    # With explode, md5 runs once per shingle and the map-side partial min
    # IS the per-doc fold; the exchange carries 16 longs per doc.
    hs = _shingles_df(spark, sf_dir, distinct=False)
    mh = hs.groupBy("doc_id").agg(*_minhash_agg_cols())

    # Carry the full signature through the band join (one array column) so
    # the Jaccard estimate is computed in-place — avoids two extra
    # signature-lookup joins (= two shuffles) after candidate generation.
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws(
                "-", *[F.col(f"mh{b * ROWS_PER_BAND + j}") for j in range(ROWS_PER_BAND)]
            ).alias("sig"),
        )
        for b in range(N_BANDS)
    ]
    sig_arr = F.array(*[F.col(f"mh{i}") for i in range(N_HASHES)])
    bands = mh.select(
        "doc_id", sig_arr.alias("sig_arr"), F.explode(F.array(*band_structs)).alias("bs")
    ).select(
        "doc_id", "sig_arr", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig")
    )

    left = bands.alias("a")
    right = bands.alias("b")
    est = F.expr(
        "aggregate(zip_with(a.sig_arr, b.sig_arr, (x, y) -> IF(x = y, 1, 0)),"
        f" 0, (acc, x) -> acc + x) / CAST({N_HASHES} AS DOUBLE)"
    )
    return (
        left.join(
            right,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(est, 6).alias("est_jaccard"),
        )
        .distinct()
    )


# ---------------------------------------------------------------------------
# SimHash (banded)
# ---------------------------------------------------------------------------

def _duck_simhash_bit_sums() -> str:
    return ",\n         ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s{b}"
        for b in range(SIMHASH_BITS)
    )


_SIMHASH_ORACLE = f"""
WITH toks AS (SELECT doc_id, unnest({duck_tokens('text')}) AS tok FROM documents),
th AS (SELECT doc_id, (('0x' || substr(md5(tok), 1, 15))::BIGINT % {MOD_P}) AS h FROM toks),
bits AS (SELECT doc_id, {_duck_simhash_bit_sums()} FROM th GROUP BY doc_id),
sims AS (
  SELECT doc_id,
         ({" + ".join(f"(CASE WHEN s{b} >= 0 THEN {1 << b}::BIGINT ELSE 0 END)" for b in range(SIMHASH_BITS))}) AS simhash
  FROM bits
),
bands AS (
  {" UNION ALL ".join(
      f"SELECT doc_id, simhash, {j} AS band, (simhash >> {j * SIMHASH_BAND_BITS}) & {(1 << SIMHASH_BAND_BITS) - 1} AS bval FROM sims"
      for j in range(SIMHASH_BANDS)
  )}
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM bands a JOIN bands b ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_MAX_HAMMING}
"""


@register(
    "dedup_simhash",
    oracle=_SIMHASH_ORACLE,
    tags=("dedup", "simhash", "lsh", "llm-pipeline"),
    doc=(
        f"{SIMHASH_BITS}-bit SimHash over token hashes (tf-weighted ±1 votes "
        f"per bit), candidate pairs via {SIMHASH_BANDS}-band LSH, kept when "
        f"Hamming distance ≤ {SIMHASH_MAX_HAMMING}. Entirely JVM-side bit "
        "arithmetic — no UDFs. r22 (guide §2.3, narrower aggregation "
        "state): the per-bit ±1 vote s_b = 2*cnt_b - n needs only cnt_b "
        "(count of tokens with bit b set) and the token count n, so TWO "
        "32-bit counters ride in each 64-bit sum — 24 packed aggregates "
        "+ count(*) instead of 48 CASE sums, halving the agg buffer and "
        "the partial-agg bytes per doc crossing the exchange. "
        "No-overflow PROOF (unlike the r21-rejected 10/20-bit packing): "
        "a Spark string column holds < 2^31 bytes and tokens are "
        "non-empty and delimiter-separated, so n <= 2^30 per doc; the "
        "low field accumulates at most n < 2^32 (never carries into the "
        "high field) and the packed sum stays below n*(2^32+1) < 2^63 "
        "(never overflows the long). Bit b is set iff 2*cnt_b >= n "
        "(⟺ s_b >= 0); the oracle keeps the literal ±1 form, so the "
        "hash differential proves the rewrite exact."
    ),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Rebalanced scan: the per-token md5 is the CPU hot path (measured
    # r22 at sf0.1: explode+md5 ≈ 0.6s of the 1.66s total; the bit-sum
    # aggregates add ~0.1s, the doc-scale band join + distinct the rest)
    # — don't let a one-row-group source serialize it.
    d = rebalance_scan(load_table(spark, sf_dir, "documents"), spark)
    th = d.select("doc_id", F.explode(tokens("text")).alias("tok")).withColumn(
        "h", h31(F.col("tok"))
    )
    half = SIMHASH_BITS // 2
    pair_sums = [
        F.sum(
            F.expr(f"((h >> {b}) & 1) + (((h >> {b + half}) & 1) * 4294967296)")
        ).alias(f"p{b}")
        for b in range(half)
    ]
    bits = th.groupBy("doc_id").agg(*pair_sums, F.count("*").alias("n"))
    sim_terms = [
        F.when(
            F.expr(f"2 * (p{b} & 4294967295)") >= F.col("n"),
            F.lit(1 << b).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        for b in range(half)
    ] + [
        F.when(
            F.expr(f"2 * (p{b} >> 32)") >= F.col("n"),
            F.lit(1 << (b + half)).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        for b in range(half)
    ]
    sims = bits.select(
        "doc_id", _reduce(lambda p, q: p + q, sim_terms).alias("simhash")
    )

    band_structs = [
        F.struct(
            F.lit(j).alias("band"),
            F.expr(
                f"(simhash >> {j * SIMHASH_BAND_BITS}) & {(1 << SIMHASH_BAND_BITS) - 1}"
            ).alias("bval"),
        )
        for j in range(SIMHASH_BANDS)
    ]
    bands = sims.select(
        "doc_id", "simhash", F.explode(F.array(*band_structs)).alias("bs")
    ).select("doc_id", "simhash", F.col("bs.band").alias("band"), F.col("bs.bval").alias("bval"))

    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bval") == F.col("b.bval"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.expr("a.simhash ^ b.simhash")).alias("hamming"),
        )
        .filter(F.col("hamming") <= SIMHASH_MAX_HAMMING)
        .distinct()
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard
# ---------------------------------------------------------------------------

def _bounded_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shingle) rows with hot shingles removed, via a two-phase
    df aggregation: groupBy(shingle).count() runs a map-side partial
    count first, so a boilerplate shingle appearing in 10^9 docs reaches
    the exchange as one row per input partition — unlike a window count
    partitioned by shingle, which would buffer all O(df) rows of the hot
    key in a single task *before* the (df <= K) filter could drop them.
    The surviving rare-shingle set comes back via a left-semi join on
    shingle — the same key as the df agg and the downstream pair
    self-join, so AQE aligns the exchanges, and a residual hot key in the
    semi join is covered by AQE skew handling."""
    sh = _shingles_df(spark, sf_dir).select("doc_id", "shingle")
    rare = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= SHINGLE_DF_CUTOFF)
        .select("shingle")
    )
    return sh.join(rare, "shingle", "left_semi").select("doc_id", "shingle")


_JACCARD_ORACLE = f"""
WITH {_DUCK_SHINGLES},
shb AS (
  SELECT doc_id, shingle FROM sh
  WHERE shingle IN (
    SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= {SHINGLE_DF_CUTOFF}
  )
),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM shb a JOIN shb b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
sizes AS (SELECT doc_id, count(*) AS n FROM shb GROUP BY doc_id)
SELECT doc_a, doc_b,
       round(n_common / (x.n + y.n - n_common), 8) AS jaccard
FROM common
JOIN sizes x ON x.doc_id = doc_a
JOIN sizes y ON y.doc_id = doc_b
WHERE n_common / (x.n + y.n - n_common) >= {JACCARD_THRESHOLD}
"""


@register(
    "dedup_ngram_jaccard",
    oracle=_JACCARD_ORACLE,
    tags=("dedup", "jaccard", "llm-pipeline"),
    doc=(
        "n-gram (3-shingle) Jaccard over candidate pairs from the "
        "inverted shingle index, restricted to the df-bounded vocabulary "
        f"(shingles in ≤ {SHINGLE_DF_CUTOFF} docs): pairs must share a "
        "rare shingle, so per-key join fanout is capped at df² and the n² "
        "pair space is never built even under Zipf-hot shingles. Both "
        "n_common and the per-doc sizes use the bounded vocabulary, so "
        "the reported value is exact Jaccard over non-stop shingles. "
        "Shuffles: one two-phase df agg on shingle (map-side partials, "
        "so hot keys never pile into one task) + semi join sharing that "
        "key, one pair agg, two size joins on doc keys. "
        "MinHash is the recall path at 100 TB; this is the "
        "exact-verification stage."
    ),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _bounded_shingles(spark, sf_dir)
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    x = sizes.alias("x")
    y = sizes.alias("y")
    jac = F.col("n_common") / (F.col("x.n") + F.col("y.n") - F.col("n_common"))
    return (
        common.join(x, F.col("x.doc_id") == F.col("doc_a"))
        .join(y, F.col("y.doc_id") == F.col("doc_b"))
        .filter(jac >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round(jac, 8).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# fuzzy (edit-distance) dedup with blocking
# ---------------------------------------------------------------------------

FUZZY_MAX_DIST = 1
# block on everything but the last 2 chars: candidate pairs stay block-local
FUZZY_BLOCK_LEN_OFF = 2


@register(
    "dedup_fuzzy_names",
    oracle=f"""
WITH b AS (
  SELECT c_custkey, c_name,
         substr(c_name, 1, length(c_name) - {FUZZY_BLOCK_LEN_OFF}) AS blk
  FROM customer
)
SELECT x.blk AS blk, count(*) AS n_fuzzy_pairs,
       min(x.c_custkey) AS example_a, min(y.c_custkey) AS example_b
FROM b x JOIN b y ON x.blk = y.blk AND x.c_custkey < y.c_custkey
WHERE levenshtein(x.c_name, y.c_name) <= {FUZZY_MAX_DIST}
GROUP BY x.blk
""",
    tags=("dedup", "fuzzy", "levenshtein", "llm-pipeline"),
    doc=(
        "Fuzzy dedup by edit distance with prefix blocking: candidate "
        "pairs share a name-prefix block (bounded block size ⇒ bounded "
        f"pair fanout), kept when levenshtein ≤ {FUZZY_MAX_DIST}. Classic "
        "record-linkage blocking — the n² pair space never materializes; "
        "the block key is the shuffle key at scale. r21 (guide §1.2 "
        "step 2, per-task work): block-mates share their ENTIRE prefix "
        "by the join key (equal blk strings force equal name lengths "
        "and an identical first len-2 chars), and edit distance is "
        "invariant under stripping a common prefix, so the per-pair "
        f"levenshtein runs on just the {FUZZY_BLOCK_LEN_OFF}-char "
        "suffixes — an O(len²) DP becomes O(4) per pair (measured at "
        "sf0.1: 5.4s → 1.0s warm; the oracle keeps the full-name "
        "levenshtein, so the differential proves the rewrite exact)."
    ),
)
def dedup_fuzzy_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    # suffix = the last FUZZY_BLOCK_LEN_OFF chars (whole name when
    # shorter): greatest(.., 1) keeps the 1-based start position legal
    # for len-0/len-1 names, where blk is "" and the suffix IS the name.
    suffix = (
        f"substr(c_name, greatest(length(c_name) - {FUZZY_BLOCK_LEN_OFF} + 1, 1),"
        f" {FUZZY_BLOCK_LEN_OFF})"
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.expr(suffix).alias("sfx"),
        F.expr(
            f"substr(c_name, 1, length(c_name) - {FUZZY_BLOCK_LEN_OFF})"
        ).alias("blk"),
    )
    x = c.select(
        F.col("c_custkey").alias("ka"), F.col("sfx").alias("sa"), F.col("blk").alias("ba")
    )
    y = c.select(
        F.col("c_custkey").alias("kb"), F.col("sfx").alias("sb"), F.col("blk").alias("bb")
    )
    return (
        x.join(y, (F.col("ba") == F.col("bb")) & (F.col("ka") < F.col("kb")))
        .filter(F.levenshtein(F.col("sa"), F.col("sb")) <= FUZZY_MAX_DIST)
        .groupBy(F.col("ba").alias("blk"))
        .agg(
            F.count("*").alias("n_fuzzy_pairs"),
            F.min("ka").alias("example_a"),
            F.min("kb").alias("example_b"),
        )
    )


# ---------------------------------------------------------------------------
# dedup clustering: connected components over candidate pairs
# ---------------------------------------------------------------------------

_COMPONENTS_ORACLE = f"""
WITH RECURSIVE {_DUCK_SHINGLES.strip().lstrip()},
mh AS (SELECT doc_id, {_duck_minhash_cols()} FROM hs GROUP BY doc_id),
bands AS (
  {" UNION ALL ".join(
      f"SELECT doc_id, {b} AS band, {_band_sig('', b)} AS sig FROM mh"
      for b in range(N_BANDS)
  )}
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL SELECT doc_b, doc_a FROM pairs
),
members AS (SELECT DISTINCT src AS doc_id FROM edges),
reach(doc_id, lbl) AS (
  SELECT doc_id, doc_id FROM members
  UNION
  SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.doc_id
)
SELECT cluster_id, count(*) AS cluster_size,
       min(doc_id) AS min_doc, max(doc_id) AS max_doc
FROM (SELECT doc_id, min(lbl) AS cluster_id FROM reach GROUP BY doc_id)
GROUP BY cluster_id
"""


def _large_star(edges: DataFrame) -> DataFrame:
    """Large-star contraction round (Kiveris et al., 'Connected Components
    in MapReduce and Beyond'): every node u connects its *larger* neighbors
    to m = min(N(u) ∪ {u}). Input/output: canonical undirected edges
    (hi, lo) with hi > lo. One groupBy exchange + one co-keyed join."""
    sym = edges.select(F.col("hi").alias("src"), F.col("lo").alias("dst")).unionAll(
        edges.select(F.col("lo").alias("src"), F.col("hi").alias("dst"))
    )
    mins = (
        sym.groupBy("src")
        .agg(F.min("dst").alias("mn"))
        .select("src", F.least("mn", "src").alias("m"))
    )
    return (
        sym.filter(F.col("dst") > F.col("src"))
        .join(mins, "src")
        .select(F.col("dst").alias("hi"), F.col("m").alias("lo"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Small-star contraction round: every node (as the larger endpoint)
    rewires itself and its smaller neighbors to the minimum of the
    neighborhood. Input/output canonical (hi, lo), hi > lo."""
    mins = edges.groupBy("hi").agg(F.min("lo").alias("m"))
    rewired = (
        edges.join(mins, "hi")
        .filter(F.col("lo") != F.col("m"))
        .select(F.col("lo").alias("hi"), F.col("m").alias("lo"))
    )
    centers = mins.select(F.col("hi"), F.col("m").alias("lo"))
    return rewired.unionAll(centers).distinct()


@register(
    "dedup_clusters",
    oracle=_COMPONENTS_ORACLE,
    tags=("dedup", "iterative", "graph", "llm-pipeline"),
    doc=(
        "Duplicate clusters = connected components over the MinHash "
        "candidate-pair graph via alternating large-star/small-star "
        "contraction (Kiveris et al.), which converges in O(log^2 n) "
        "rounds regardless of component *diameter* — a duplicate chain of "
        "length 10^6 still finishes in ~20 rounds, where one-hop label "
        "propagation would need 10^6. Each round is two groupBy exchanges "
        "+ two co-keyed joins; the per-round convergence probe is a "
        "count+checksum aggregate (the only driver-side values). "
        "Non-convergence within the round cap RAISES rather than "
        "returning silently-wrong labels. On a real cluster the same loop "
        "runs unchanged (or swap in GraphFrames connectedComponents). "
        "Oracle: recursive-CTE transitive closure over the identical "
        "pair set."
    ),
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _cluster_labels(spark, sf_dir)
        .groupBy(F.col("lbl").alias("cluster_id"))
        .agg(
            F.count("*").alias("cluster_size"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


def _cluster_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lbl) for every doc in a near-dup component, lbl = the
    component's minimum doc_id — the shared core of dedup_clusters and
    dedup_keep_list.

    localCheckpoint (not persist) on every iterative frontier: persist
    caches *data* but keeps the logical plan, so each round's plan embeds
    the whole upstream LSH expression tree again — Catalyst
    canonicalization then grows exponentially and OOMs the driver after
    a handful of rounds. Checkpointing truncates lineage, keeping every
    round's plan O(1). Same requirement on a real cluster (use
    `checkpoint()` + an HDFS dir there for executor-loss tolerance).
    """
    pairs = dedup_minhash(spark, sf_dir).select("doc_a", "doc_b")
    # doc_a < doc_b by construction of the pair join → already canonical.
    edges = pairs.select(
        F.col("doc_b").alias("hi"), F.col("doc_a").alias("lo")
    ).distinct().localCheckpoint()
    members = edges.select(F.col("hi").alias("doc_id")).unionAll(
        edges.select(F.col("lo").alias("doc_id"))
    ).distinct()

    def probe(e: DataFrame) -> tuple[int, int]:
        # (count, order-independent checksum) — equal probes ⇒ equal edge
        # sets with 2^-64 collision odds (star states are canonical, so
        # fixpoint detection by set equality is sound). bit_xor, not sum:
        # summing full-range xxhash64 values overflows long under ANSI,
        # and XOR is exact on a distinct edge set.
        row = e.agg(
            F.count("*").alias("n"),
            F.coalesce(F.expr("bit_xor(xxhash64(hi, lo))"), F.lit(0)).alias("cs"),
        ).collect()[0]
        return row["n"], row["cs"]

    MAX_ROUNDS = 32  # »> log^2 of any plausible component count
    prev = probe(edges)
    for _ in range(MAX_ROUNDS):
        edges = _small_star(_large_star(edges)).localCheckpoint()
        cur = probe(edges)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"dedup_clusters: star contraction did not converge in "
            f"{MAX_ROUNDS} rounds — refusing to emit possibly-wrong labels"
        )

    # Fixpoint state is a star forest: every non-root member appears as hi
    # exactly once, pointing at its component minimum.
    root_of = edges.groupBy(F.col("hi").alias("doc_id")).agg(F.min("lo").alias("root"))
    return members.join(root_of, "doc_id", "left").select(
        "doc_id", F.coalesce("root", "doc_id").alias("lbl")
    )


_KEEP_LIST_ORACLE = f"""
WITH RECURSIVE {_DUCK_SHINGLES.strip().lstrip()},
mh AS (SELECT doc_id, {_duck_minhash_cols()} FROM hs GROUP BY doc_id),
bands AS (
  {" UNION ALL ".join(
      f"SELECT doc_id, {b} AS band, {_band_sig('', b)} AS sig FROM mh"
      for b in range(N_BANDS)
  )}
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL SELECT doc_b, doc_a FROM pairs
),
members AS (SELECT DISTINCT src AS doc_id FROM edges),
reach(doc_id, lbl) AS (
  SELECT doc_id, doc_id FROM members
  UNION
  SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.doc_id
)
SELECT doc_id, cluster_id, doc_id = cluster_id AS is_keeper
FROM (SELECT doc_id, min(lbl) AS cluster_id FROM reach GROUP BY doc_id)
"""


@register(
    "dedup_keep_list",
    oracle=_KEEP_LIST_ORACLE,
    tags=("dedup", "iterative", "graph", "llm-pipeline"),
    doc=(
        "The dedup DECISION table — what a pipeline actually applies: one "
        "row per document in any near-dup component with its cluster id "
        "and keep/drop verdict (keeper = the component's minimum doc_id, "
        "the survivorship rule). Anti-joining the drop rows against the "
        "corpus IS the dedup. Same star-contraction core as "
        "dedup_clusters (shuffle story there); emitting doc-level rows "
        "adds no extra exchange."
    ),
)
def dedup_keep_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    labels = _cluster_labels(spark, sf_dir)
    return labels.select(
        "doc_id",
        F.col("lbl").alias("cluster_id"),
        (F.col("doc_id") == F.col("lbl")).alias("is_keeper"),
    )


@register(
    "dedup_apply",
    oracle=f"""
WITH RECURSIVE {_DUCK_SHINGLES.strip().lstrip()},
mh AS (SELECT doc_id, {_duck_minhash_cols()} FROM hs GROUP BY doc_id),
bands AS (
  {" UNION ALL ".join(
      f"SELECT doc_id, {b} AS band, {_band_sig('', b)} AS sig FROM mh"
      for b in range(N_BANDS)
  )}
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL SELECT doc_b, doc_a FROM pairs
),
members AS (SELECT DISTINCT src AS doc_id FROM edges),
reach(doc_id, lbl) AS (
  SELECT doc_id, doc_id FROM members
  UNION
  SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.doc_id
),
drops AS (
  SELECT doc_id FROM (SELECT doc_id, min(lbl) AS cluster_id FROM reach GROUP BY doc_id)
  WHERE doc_id <> cluster_id
)
SELECT d.doc_id, d.lang, d.n_chars
FROM documents d LEFT JOIN drops k ON d.doc_id = k.doc_id
WHERE k.doc_id IS NULL
""",
    tags=("dedup", "anti-join", "llm-pipeline"),
    doc=(
        "The APPLIED dedup: corpus minus near-dup losers — documents "
        "anti-joined against dedup_keep_list's drop rows, keeping every "
        "cluster's minimum doc_id plus all unclustered docs. This is the "
        "pipeline's actual output table. Shuffle story: the drop list is "
        "a few % of doc_ids and BROADCASTS into the anti-join — the "
        "corpus rows never shuffle; at extreme drop-list sizes fall back "
        "to a keyed left-anti (one exchange each side)."
    ),
)
def dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    drops = (
        _cluster_labels(spark, sf_dir)
        .filter(F.col("doc_id") != F.col("lbl"))
        .select("doc_id")
    )
    d = load_table(spark, sf_dir, "documents")
    return d.join(F.broadcast(drops), "doc_id", "left_anti").select(
        "doc_id", "lang", "n_chars"
    )


# ---------------------------------------------------------------------------
# exact substring-level duplication (shared token spans)
# ---------------------------------------------------------------------------

SUB_L = 8  # gram length in tokens (the match seed)
SUB_MIN_SPAN = 12  # report doc pairs sharing a span of at least this many tokens
SUB_DF_CUTOFF = 20  # drop grams appearing in more docs than this (boilerplate)


@register(
    "dedup_substring",
    oracle=f"""
WITH toks AS (SELECT doc_id, {duck_tokens('text')} AS toks FROM documents),
gr AS (
  SELECT doc_id, t.i AS pos,
         {duck_md5_long60(f"array_to_string(toks[t.i:t.i+{SUB_L}-1], ' ')")} AS g
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(toks) - {SUB_L} + 1)) AS i) t
  WHERE len(toks) >= {SUB_L}
),
rare AS (
  SELECT g FROM (SELECT g, count(DISTINCT doc_id) AS df FROM gr GROUP BY g)
  WHERE df BETWEEN 2 AND {SUB_DF_CUTOFF}
),
p AS (
  SELECT a.doc_id AS da, b.doc_id AS db, a.pos AS pa, b.pos AS pb
  FROM gr a JOIN gr b ON a.g = b.g AND a.doc_id < b.doc_id
  JOIN rare r ON a.g = r.g
),
i AS (
  SELECT da, db, pa - pb AS diag, pa,
         pa - row_number() OVER (PARTITION BY da, db, pa - pb ORDER BY pa) AS isl
  FROM p
),
runs AS (
  SELECT da, db, count(*) + {SUB_L} - 1 AS span
  FROM i GROUP BY da, db, diag, isl
)
SELECT da AS doc_a, db AS doc_b,
       max(span) AS max_shared_tokens,
       count(*) AS n_spans
FROM runs WHERE span >= {SUB_MIN_SPAN}
GROUP BY 1, 2
""",
    tags=("dedup", "substring", "llm-pipeline"),
    doc=(
        "EXACT substring-level duplication (the 'deduplicating training "
        "data' span-match): for every doc pair, the length of the longest "
        f"shared token span of at least {SUB_MIN_SPAN} tokens, plus how "
        "many such spans they share. A shared span of length s is exactly "
        f"a maximal run of consecutive matching {SUB_L}-token-gram seeds "
        "on one alignment diagonal (pos_a - pos_b), so the operator is: "
        "positional gram hashes (60-bit md5, narrow explode) -> "
        "document-frequency cutoff (grams in >"
        f"{SUB_DF_CUTOFF} docs are boilerplate and are dropped BEFORE the "
        "pair join, capping per-gram fanout at df^2 — the same bound "
        "contamination_check rides) -> equi-join on the gram hash -> "
        "per-(pair, diagonal) run stitching via the islands trick (pos - "
        "row_number), a window on keys the join already shuffled by -> "
        "span length = run + L - 1. Shuffle story: gram-hash exchange "
        "for df + the pair equi-join exchange + one window exchange on "
        "(da, db) — full text never shuffles, only (doc_id, pos, hash) "
        "triples; no all-pairs anything at any stage."
    ),
)
def dedup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = rebalance_scan(load_table(spark, sf_dir, "documents"), spark)
    toks = d.select("doc_id", tokens("text").alias("toks"))
    gr = (
        toks.filter(F.size("toks") >= SUB_L)
        .select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), F.size("toks") - SUB_L + 1),
                    lambda i: md5_long60(
                        F.array_join(F.slice("toks", i, SUB_L), " ")
                    ),
                )
            ).alias("pos0", "g"),
        )
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "g")
    )
    rare = (
        gr.groupBy("g")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter((F.col("df") >= 2) & (F.col("df") <= SUB_DF_CUTOFF))
        .select(F.col("g").alias("rg"))
    )
    a = gr.alias("a")
    b = gr.alias("b")
    p = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .join(rare, F.col("a.g") == F.col("rg"))
        .select(
            F.col("a.doc_id").alias("da"),
            F.col("b.doc_id").alias("db"),
            F.col("a.pos").alias("pa"),
            F.col("b.pos").alias("pb"),
        )
    )
    from pyspark.sql import Window as W

    diag = (F.col("pa") - F.col("pb")).alias("diag")
    win = W.partitionBy("da", "db", "diag").orderBy("pa")
    i = p.select("da", "db", diag, "pa").withColumn(
        "isl", F.col("pa") - F.row_number().over(win)
    )
    runs = i.groupBy("da", "db", "diag", "isl").agg(
        (F.count("*") + SUB_L - 1).alias("span")
    )
    return (
        runs.filter(F.col("span") >= SUB_MIN_SPAN)
        .groupBy(F.col("da").alias("doc_a"), F.col("db").alias("doc_b"))
        .agg(
            F.max("span").alias("max_shared_tokens"),
            F.count("*").alias("n_spans"),
        )
    )


# ---------------------------------------------------------------------------
# incremental MinHash dedup: new batch vs existing-corpus index
# ---------------------------------------------------------------------------

INC_SPLIT_MOD = 5  # doc_id hash bucket 0 of 5 => the arriving batch (~20%)
INC_MIN_MATCHES = 4  # signature agreement (>= 4/16 ~ est Jaccard 0.25) => dup

_INC_BATCH_COND = f"(({duck_md5_long60('CAST(doc_id AS VARCHAR)')} % {MOD_P}) % {INC_SPLIT_MOD} = 0)"


@register(
    "dedup_minhash_incremental",
    oracle=f"""
WITH {_DUCK_SHINGLES},
mh AS (SELECT doc_id, {_duck_minhash_cols()} FROM hs GROUP BY doc_id),
bands AS (
  {" UNION ALL ".join(
      f"SELECT doc_id, {b} AS band, {_band_sig('', b)} AS sig FROM mh"
      for b in range(N_BANDS)
  )}
),
cand AS (
  SELECT DISTINCT n.doc_id AS nd, o.doc_id AS od
  FROM bands n JOIN bands o ON n.band = o.band AND n.sig = o.sig
  WHERE ({_INC_BATCH_COND.replace('doc_id', 'n.doc_id')})
    AND NOT ({_INC_BATCH_COND.replace('doc_id', 'o.doc_id')})
),
scored AS (
  SELECT c.nd, c.od,
         ({" + ".join(f"(x.mh{i} = y.mh{i})::INT" for i in range(N_HASHES))}) AS matches
  FROM cand c JOIN mh x ON x.doc_id = c.nd JOIN mh y ON y.doc_id = c.od
),
dec AS (
  SELECT nd, count(*) AS n_candidates,
         min(CASE WHEN matches >= {INC_MIN_MATCHES} THEN od END) AS dup_raw
  FROM scored GROUP BY nd
)
SELECT d.doc_id,
       CAST(coalesce(dec.n_candidates, 0) AS BIGINT) AS n_candidates,
       (dec.dup_raw IS NOT NULL) AS is_dup,
       CAST(coalesce(dec.dup_raw, -1) AS BIGINT) AS dup_of
FROM (SELECT doc_id FROM documents WHERE {_INC_BATCH_COND}) d
LEFT JOIN dec ON d.doc_id = dec.nd
""",
    tags=("dedup", "minhash", "lsh", "incremental", "llm-pipeline"),
    doc=(
        "Incremental MinHash-LSH dedup — the arriving-batch ingestion gate "
        "a production corpus runs instead of re-deduping 100 TB per batch: "
        "the corpus is hash-split into the existing index (~80%) and the "
        "arriving batch (~20%, doc_id md5 bucket 0 of "
        f"{INC_SPLIT_MOD}); band signatures of the BATCH probe the "
        "EXISTING index only (batch x index equi-join on (band, sig) — "
        "never index x index, never batch x batch re-pairing), and each "
        "batch doc gets an admission decision: candidate count, is_dup "
        f"(any candidate agreeing on >= {INC_MIN_MATCHES}/{N_HASHES} "
        "signature components — an integer compare, no float threshold), "
        "and the smallest qualifying corpus doc as dup_of (-1 = admit). "
        "Shares the shingle/minhash/banding machinery and constants with "
        "dedup_minhash verbatim. Shuffle story: one shingle explode + "
        "partial-min signature agg (as dedup_minhash), one (band, sig) "
        "equi-join whose LEFT side is only the batch's bands, one keyed "
        "decision agg, one left join back to the batch docs. At 100 TB "
        "the index side's signatures are precomputed and stored "
        "band-partitioned, so an arriving batch touches only its own "
        "shingles plus the matching band buckets — work scales with the "
        "BATCH, not the corpus."
    ),
)
def dedup_minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    is_batch = F.pmod(
        h31(F.col("doc_id").cast("string")), F.lit(INC_SPLIT_MOD)
    ) == 0
    hs = _shingles_df(spark, sf_dir, distinct=False)
    mh = hs.groupBy("doc_id").agg(*_minhash_agg_cols())

    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws(
                "-", *[F.col(f"mh{b * ROWS_PER_BAND + j}") for j in range(ROWS_PER_BAND)]
            ).alias("sig"),
        )
        for b in range(N_BANDS)
    ]
    sig_arr = F.array(*[F.col(f"mh{i}") for i in range(N_HASHES)])
    bands = mh.select(
        "doc_id", sig_arr.alias("sig_arr"), F.explode(F.array(*band_structs)).alias("bs")
    ).select(
        "doc_id", "sig_arr", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig")
    )
    new_bands = bands.filter(is_batch).alias("n")
    old_bands = bands.filter(~is_batch).alias("o")
    matches = F.expr(
        "aggregate(zip_with(n.sig_arr, o.sig_arr, (x, y) -> IF(x = y, 1, 0)),"
        " 0, (acc, x) -> acc + x)"
    )
    scored = (
        new_bands.join(
            old_bands,
            (F.col("n.band") == F.col("o.band")) & (F.col("n.sig") == F.col("o.sig")),
        )
        .select(
            F.col("n.doc_id").alias("nd"),
            F.col("o.doc_id").alias("od"),
            matches.alias("matches"),
        )
        .distinct()
    )
    dec = scored.groupBy("nd").agg(
        F.count("*").cast("long").alias("n_candidates"),
        F.min(F.when(F.col("matches") >= INC_MIN_MATCHES, F.col("od"))).alias("dup_raw"),
    )
    batch_docs = load_table(spark, sf_dir, "documents").filter(is_batch).select("doc_id")
    return batch_docs.join(dec, batch_docs.doc_id == dec.nd, "left").select(
        "doc_id",
        F.coalesce(F.col("n_candidates"), F.lit(0)).cast("long").alias("n_candidates"),
        F.col("dup_raw").isNotNull().alias("is_dup"),
        F.coalesce(F.col("dup_raw"), F.lit(-1)).cast("long").alias("dup_of"),
    )
