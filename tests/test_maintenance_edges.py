"""Tiny-fixture edge tests for the round-11 operators (the r10 ADVICE
pattern: termination paths the sf fixtures never reach must be pinned
against the oracle on synthetic fixtures, not verified ad hoc).

compact_apply: all-keep, all-compact, and empty-table layouts;
dedup_semantic_incremental: corpus smaller than K_CELLS, empty corpus;
bpe_train: empty table, pairless vocab, pairs exhausted mid-loop."""

from __future__ import annotations

import hashlib

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

from multithreaded_mapreduce_library_spark.functions import MOD_P
from multithreaded_mapreduce_library_spark.registry import load_all

SPECS = load_all()


def _duck_rows(oracle: str, sf_dir: str, tables):
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    rows = con.execute(oracle).fetchall()
    con.close()
    return sorted(rows)


def _spark_rows(spark, name, sf_dir):
    return sorted(tuple(r) for r in SPECS[name].builder(spark, str(sf_dir)).collect())


def _write_orders(out_dir, rows):
    """rows: list of (o_orderkey, o_custkey, o_orderstatus, o_totalprice) —
    the four columns the compaction family touches."""
    ks, cs, ss, ps = (
        [r[0] for r in rows], [r[1] for r in rows],
        [r[2] for r in rows], [r[3] for r in rows],
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(ks, type=pa.int64()),
                "o_custkey": pa.array(cs, type=pa.int64()),
                "o_orderstatus": pa.array(ss, type=pa.string()),
                "o_totalprice": pa.array(ps, type=pa.float64()),
            }
        ),
        str(out_dir / "orders.parquet"),
    )


def _compare(spark, name, sf_dir, tables):
    got = _spark_rows(spark, name, sf_dir)
    want = _duck_rows(SPECS[name].oracle, str(sf_dir), tables)
    assert got == want
    return got


def test_compact_apply_empty_orders(spark, tmp_path):
    """OPTIMIZE of an empty table is a no-op: the oracle's join over zero
    rows is empty, and the Spark side must return empty instead of
    failing schema inference on a zero-partition read-back."""
    _write_orders(tmp_path, [])
    assert _compare(spark, "compact_apply", tmp_path, ["orders"]) == []


def test_compact_apply_all_keeps(spark, tmp_path):
    """Every file at/over target: no bins, every row passes through under
    its own file name — the pure keep branch no sf fixture isolates."""
    # custkey 1 (%10=1 < 3 -> compacted/0) and 7 (%10=7 -> ingest/1), one
    # order each at $25M => 2.5e9 cents >= COMPACT_TARGET: both files keep
    _write_orders(tmp_path, [(1, 1, "O", 25_000_000.0), (2, 7, "F", 25_000_000.0)])
    got = _compare(spark, "compact_apply", tmp_path, ["orders"])
    assert {r[0] for r in got} == {"compacted/0", "ingest/1"}


def test_compact_apply_all_compact(spark, tmp_path):
    """Every file under target: the whole inventory packs into bins (here
    one bin), the pure compact branch."""
    _write_orders(
        tmp_path,
        [(1, 1, "O", 10.0), (2, 7, "F", 20.0), (3, 11, "O", 30.0), (4, 17, "F", 40.0)],
    )
    got = _compare(spark, "compact_apply", tmp_path, ["orders"])
    assert {r[0] for r in got} == {"bin-0"}
    assert got[0][1] == 4  # all four rows landed in the one bin


def test_compact_rewrite_target_is_process_scoped(spark, tmp_path):
    """compact_rewrite's scratch target is keyed by (pid, fixture digest)
    and overwritten in place: repeated same-process runs reuse ONE dir,
    two concurrent processes over the same fixture never share a target
    (one's overwrite can't interleave with the other's read-back), and
    dirs abandoned by dead processes are reaped while dirs that don't
    parse as pids are left alone."""
    import os
    import subprocess
    import tempfile

    from multithreaded_mapreduce_library_spark.operators.maintenance import (
        compact_rewrite,
    )

    _write_orders(tmp_path, [(1, 1, "O", 10.0), (2, 7, "F", 20.0)])
    _applied, target = compact_rewrite(spark, str(tmp_path))
    assert f"pid-{os.getpid()}" in target
    # same process + same fixture => the SAME deterministic target
    _applied2, target2 = compact_rewrite(spark, str(tmp_path))
    assert target2 == target

    root = os.path.join(tempfile.gettempdir(), "spark_graft_compact")
    # a dir owned by a genuinely dead pid must be reaped on the next run,
    # an unparseable one must survive (it isn't ours to judge). Derive
    # the dead pid by fork+waitpid (r13 ADVICE de-flake): the child is
    # fully reaped before we use its pid, and unlike the old
    # `sh -c 'echo $$'` shell-out there is no window in which a system
    # under pid churn recycles it before the next compact_rewrite call —
    # pids allocate monotonically until the whole space wraps.
    child = os.fork()
    if child == 0:
        os._exit(0)  # pragma: no cover - child exits immediately
    os.waitpid(child, 0)
    dead_dir = os.path.join(root, f"pid-{child}")
    odd_dir = os.path.join(root, "pid-not-a-number")
    os.makedirs(dead_dir, exist_ok=True)
    os.makedirs(odd_dir, exist_ok=True)
    _applied3, _t = compact_rewrite(spark, str(tmp_path))
    assert not os.path.exists(dead_dir), "dead-process scratch not reaped"
    assert os.path.exists(odd_dir), "non-pid dir must be left alone"
    os.rmdir(odd_dir)


def test_compact_scratch_owner_markers(spark, tmp_path):
    """The /proc start-time owner markers (r12/r13 ADVICE): a LIVE pid's
    dir carrying a MISMATCHED marker is reaped (the recorded owner died
    and the kernel recycled its pid for the current squatter), a
    marker-less live pid's dir is kept (conservative pre-marker layout),
    and _stamp_scratch_owner ADOPTS an inherited stale marker — if this
    process's pid recycles a crashed owner's dir, the marker is
    re-stamped to OUR start time so a concurrent reaper never sees
    recorded != live for an alive process (the r13 ADVICE hazard:
    deleting a live run's scratch mid-run)."""
    import os
    import subprocess
    import tempfile

    from multithreaded_mapreduce_library_spark.operators.maintenance import (
        _SCRATCH_OWNER_MARKER,
        _proc_starttime,
        _stamp_scratch_owner,
        compact_rewrite,
    )

    if _proc_starttime(os.getpid()) is None:
        import pytest

        pytest.skip("/proc unavailable: marker layer is inert here")

    _write_orders(tmp_path, [(1, 1, "O", 10.0), (2, 7, "F", 20.0)])
    root = os.path.join(tempfile.gettempdir(), "spark_graft_compact")

    # a live-but-not-ours pid to impersonate dir ownership with
    squatter = subprocess.Popen(["sleep", "60"])
    try:
        mismarked = os.path.join(root, f"pid-{squatter.pid}")
        os.makedirs(mismarked, exist_ok=True)
        with open(os.path.join(mismarked, _SCRATCH_OWNER_MARKER), "w") as f:
            f.write("0")  # boot-time start tick: provably not the sleeper's
        compact_rewrite(spark, str(tmp_path))
        assert not os.path.exists(mismarked), (
            "live pid with mismatched owner marker must be reaped"
        )

        markerless = os.path.join(root, f"pid-{squatter.pid}")
        os.makedirs(markerless, exist_ok=True)
        compact_rewrite(spark, str(tmp_path))
        assert os.path.exists(markerless), (
            "marker-less live pid dir must be kept (conservative)"
        )
        os.rmdir(markerless)
    finally:
        squatter.kill()
        squatter.wait()

    # adoption: OUR dir carrying a dead predecessor's marker gets
    # re-stamped to our live start time on the next stamp call
    ours = os.path.join(root, f"pid-{os.getpid()}")
    os.makedirs(ours, exist_ok=True)
    marker = os.path.join(ours, _SCRATCH_OWNER_MARKER)
    with open(marker, "w") as f:
        f.write("0")
    _stamp_scratch_owner(ours)
    with open(marker) as f:
        assert f.read().strip() == _proc_starttime(os.getpid()), (
            "inherited stale marker must be adopted (re-stamped)"
        )


def test_reap_recycled_scratch_double_check_aborts_on_adoption(tmp_path):
    """The r14 ADVICE residual-TOCTOU closure: the reaper's delete path
    (_reap_recycled_scratch) re-reads the owner marker IMMEDIATELY before
    rmtree, so an adoption that landed between the reaper's first
    recycled-owner read and the delete aborts the reap. Simulated
    exactly at that seam: (a) a dir whose marker has been re-stamped to
    the live pid's start time by the time the delete path runs — i.e.
    the concurrent adoption won the race — must survive and return
    False; (b) a dir whose marker is still provably stale must be reaped
    and return True; (c) a marker-less dir stays (conservative)."""
    import os

    from multithreaded_mapreduce_library_spark.operators.maintenance import (
        _SCRATCH_OWNER_MARKER,
        _proc_starttime,
        _reap_recycled_scratch,
    )

    if _proc_starttime(os.getpid()) is None:
        import pytest

        pytest.skip("/proc unavailable: marker layer is inert here")

    # (a) adoption won: marker matches OUR live start time (we play the
    # recycled-pid adopter); the double-check must abort the reap even
    # though a first read moments earlier saw a stale marker.
    adopted = tmp_path / "pid-adopted"
    adopted.mkdir()
    (adopted / _SCRATCH_OWNER_MARKER).write_text(_proc_starttime(os.getpid()))
    assert _reap_recycled_scratch(str(adopted), os.getpid()) is False
    assert adopted.exists(), "adopted live dir must survive the reap"

    # (b) still stale on the second read: reap proceeds.
    stale = tmp_path / "pid-stale"
    stale.mkdir()
    (stale / _SCRATCH_OWNER_MARKER).write_text("0")
    assert _reap_recycled_scratch(str(stale), os.getpid()) is True
    assert not stale.exists(), "provably-recycled dir must be reaped"

    # (c) marker vanished between the reads (e.g. adopter mid-rewrite):
    # conservative keep.
    bare = tmp_path / "pid-bare"
    bare.mkdir()
    assert _reap_recycled_scratch(str(bare), os.getpid()) is False
    assert bare.exists(), "marker-less dir must be kept"


def _batch_split_ids(want_batch, want_corpus):
    """First `want_batch` ids whose md5 bucket is 0 of INC_SPLIT_MOD and
    first `want_corpus` whose bucket is nonzero — the same split the
    operator derives, precomputed so the fixture controls membership."""
    from multithreaded_mapreduce_library_spark.operators.dedup import INC_SPLIT_MOD

    batch, corpus = [], []
    i = 0
    while len(batch) < want_batch or len(corpus) < want_corpus:
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) % MOD_P
        (batch if h % INC_SPLIT_MOD == 0 else corpus).append(i)
        i += 1
    return batch[:want_batch], corpus[:want_corpus]


def _write_embeddings(out_dir, vec_ids, dim):
    import numpy as np

    rng = np.random.default_rng(23)
    emb = rng.uniform(-0.5, 0.5, (len(vec_ids), dim)).astype("float32")
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(vec_ids, type=pa.int64()),
                "embedding": pa.array(emb.tolist(), type=pa.list_(pa.float32())),
                "label": pa.array([0] * len(vec_ids), type=pa.int32()),
            }
        ),
        str(out_dir / "embeddings.parquet"),
    )


def test_dedup_semantic_incremental_corpus_smaller_than_k(spark, tmp_path):
    """Corpus with fewer vectors than K_CELLS: the seed LIMIT takes them
    all, every cell is a single corpus vector, and the admission decision
    must still match the oracle bit-for-bit."""
    from multithreaded_mapreduce_library_spark.operators.similarity import (
        DIM,
        K_CELLS,
    )

    n_corpus = K_CELLS - 3
    batch, corpus = _batch_split_ids(3, n_corpus)
    _write_embeddings(tmp_path, sorted(batch + corpus), DIM)
    got = _compare(spark, "dedup_semantic_incremental", tmp_path, ["embeddings"])
    assert {r[0] for r in got} == set(batch)
    assert all(r[2] >= 1 for r in got)  # every cell holds >= 1 corpus vec


def test_dedup_semantic_incremental_empty_corpus(spark, tmp_path):
    """Degenerate all-batch corpus: with nothing to train on, both engines
    agree on the empty result (no trained cells => no assignments — the
    documented contract, pinned so the engines can never diverge on it)."""
    from multithreaded_mapreduce_library_spark.operators.similarity import DIM

    batch, _ = _batch_split_ids(4, 0)
    _write_embeddings(tmp_path, sorted(batch), DIM)
    assert _compare(spark, "dedup_semantic_incremental", tmp_path, ["embeddings"]) == []


# ---------------------------------------------------------------------------
# bpe_train edges: the sf fixtures always fill all BPE_ROUNDS rules, so the
# early-termination paths (no pairs at all / pairs exhausted mid-loop) are
# pinned here against the same oracle.
# ---------------------------------------------------------------------------


def _write_documents(out_dir, texts):
    rows = list(enumerate(texts))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([i for i, _ in rows], type=pa.int64()),
                "text": pa.array([t for _, t in rows], type=pa.string()),
                "lang": pa.array(["en"] * len(rows), type=pa.string()),
                "source": pa.array(["edge"] * len(rows), type=pa.string()),
                "n_chars": pa.array([len(t) for _, t in rows], type=pa.int64()),
            }
        ),
        str(out_dir / "documents.parquet"),
    )


def test_bpe_contract_corpora_are_ascii(sf_dir):
    """bpe_train's cross-engine bit-identity contract is ASCII corpora
    (see its doc): on ASCII, Spark's and DuckDB's string comparison
    (tiebreak collation), indexing and length coincide symbol-for-
    symbol; beyond it they can diverge (UTF-16 vs UTF-8 order for
    supplementary-plane code points, code-point vs grapheme slicing).
    Pin that every corpus the oracle differential runs on — the driver
    fixtures and the second-seed generator's vocabulary — satisfies the
    precondition, so a non-ASCII fixture regression surfaces here
    instead of as an inscrutable hash mismatch."""
    import os

    t = pq.read_table(os.path.join(str(sf_dir), "documents.parquet"))
    for chunk in t.column("text").chunks:
        for s in chunk.to_pylist():
            assert s is None or s.isascii(), f"non-ASCII document: {s[:80]!r}"

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "gen_fixture",
        os.path.join(os.path.dirname(__file__), "..", "scripts", "gen_fixture.py"),
    )
    gen = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gen)
    assert all(w.isascii() for w in gen.VOCAB)


def test_bpe_train_empty_table(spark, tmp_path):
    d = tmp_path / "bpe_empty"
    d.mkdir()
    _write_documents(d, [])
    _compare(spark, "bpe_train", d, ["documents"])
    assert _spark_rows(spark, "bpe_train", d) == []


def test_bpe_train_no_pairs_ever(spark, tmp_path):
    """Single-character vocabulary: no adjacent pair exists, round 1's
    argmax is empty on both engines and the loop terminates at zero
    rules."""
    d = tmp_path / "bpe_singles"
    d.mkdir()
    _write_documents(d, ["a b a", "b a", "a"])
    _compare(spark, "bpe_train", d, ["documents"])
    assert _spark_rows(spark, "bpe_train", d) == []


def test_bpe_train_pairs_exhaust_mid_loop(spark, tmp_path):
    """One two-char word: round 1 merges it to a single symbol, rounds
    2..BPE_ROUNDS find no pairs — the Spark loop breaks early and the
    oracle's later-round CTEs settle empty, so both emit exactly one
    rule."""
    d = tmp_path / "bpe_exhaust"
    d.mkdir()
    _write_documents(d, ["ab ab", "ab"])
    _compare(spark, "bpe_train", d, ["documents"])
    got = _spark_rows(spark, "bpe_train", d)
    assert got == [(1, "a", "b", "ab", 3)]


def test_bpe_train_later_rule_merges_earlier_merged_symbol(spark, tmp_path):
    """True iteration, pinned data-independently: with corpus 'abc' x3,
    round 1 merges (a,b) — the (count DESC, lhs, rhs) tiebreak over the
    tied (a,b)/(b,c) pairs — and round 2's best pair is ('ab', c), whose
    lhs EXISTS only because round 1 rewrote the vocab. Six independent
    top-pairs (the bug this pins against) could never emit an 'ab' lhs."""
    d = tmp_path / "bpe_iter"
    d.mkdir()
    _write_documents(d, ["abc abc", "abc"])
    _compare(spark, "bpe_train", d, ["documents"])
    got = _spark_rows(spark, "bpe_train", d)
    assert got == [(1, "a", "b", "ab", 3), (2, "ab", "c", "abc", 3)]


def test_bpe_recheckpoint_cadence(spark, monkeypatch):
    """r14: the mid-loop re-checkpoint (O(k^2)->O(k) fold-layer fix)
    fires exactly every BPE_CHECKPOINT_EVERY merge rounds. Counted by
    wrapping DataFrame.localCheckpoint: a 6-round run at cadence 3 must
    checkpoint 3 times — the initial post-wordcount vocab plus rounds 3
    and 6 — so no round ever replays more than 2 live fold layers."""
    try:
        # pyspark>=4: concrete class (pyspark.sql.DataFrame is the ABC)
        from pyspark.sql.classic.dataframe import DataFrame as _DF
    except ImportError:  # pragma: no cover - pyspark 3.x layout
        from pyspark.sql import DataFrame as _DF

    from multithreaded_mapreduce_library_spark.operators.text import (
        BPE_CHECKPOINT_EVERY,
        BPE_ROUNDS,
        _bpe_train_rules,
    )

    assert BPE_CHECKPOINT_EVERY == 3 and BPE_ROUNDS == 6  # cadence arithmetic below
    calls = []
    orig = _DF.localCheckpoint

    def counting(self, eager=True):
        calls.append(eager)
        return orig(self, eager=eager)

    monkeypatch.setattr(_DF, "localCheckpoint", counting)
    docs = spark.createDataFrame([("abcdefg",)] * 3, "text string")
    rules = _bpe_train_rules(spark, docs)
    assert len(rules) == BPE_ROUNDS  # single 7-char word: 6 full merges
    assert len(calls) == 1 + BPE_ROUNDS // BPE_CHECKPOINT_EVERY
    assert all(e is False for e in calls)  # lazy: materialize in the next job


def test_bpe_recheckpoint_cadence_is_semantics_free(spark):
    """The checkpoint cadence is an execution detail only: every cadence
    (each round / every 2 / effectively never) must learn the identical
    rule sequence — including through an early pair-exhaustion break."""
    from multithreaded_mapreduce_library_spark.operators.text import _bpe_train_rules

    docs = spark.createDataFrame([("abc ab de",), ("abc de",)], "text string")
    want = _bpe_train_rules(spark, docs, checkpoint_every=10**9)
    assert len(want) >= 3  # exercises at least one mid-loop checkpoint at 1 and 2
    for every in (1, 2):
        assert _bpe_train_rules(spark, docs, checkpoint_every=every) == want


# ---------------------------------------------------------------------------
# bpe_apply edges (r13): the serving half must agree with the oracle on the
# same termination paths the trainer pins above, plus the apply-only edge —
# a document whose text tokenizes to nothing (fold-over-empty semantics).
# ---------------------------------------------------------------------------


def test_bpe_oracle_string_stable():
    """_duck_bpe_ctes was factored out of _duck_bpe_oracle in r13 by pure
    code motion so bpe_apply's oracle could extend the identical training
    chain; bpe_train's GENERATED oracle string must stay byte-identical
    (its gate bookkeeping treats it as unchanged). A deliberate future
    rewrite updates this hash AND re-gates bpe_train as changed."""
    from multithreaded_mapreduce_library_spark.operators.text import _duck_bpe_oracle

    digest = hashlib.md5(_duck_bpe_oracle().encode()).hexdigest()
    assert digest == "8415ff0400677672f0747b436b6a0d23"


def test_bpe_apply_empty_table(spark, tmp_path):
    d = tmp_path / "bpea_empty"
    d.mkdir()
    _write_documents(d, [])
    _compare(spark, "bpe_apply", d, ["documents"])
    assert _spark_rows(spark, "bpe_apply", d) == []


def test_bpe_apply_tokenless_doc_and_exhausted_rules(spark, tmp_path):
    """Mixed fixture: the trainer exhausts after one rule (a,b) — see
    test_bpe_train_pairs_exhaust_mid_loop — and doc 1 is whitespace-only,
    so its token list is EMPTY: Spark's aggregate-over-empty yields the
    0-count row with an empty preview, and the oracle's LEFT JOIN back to
    documents + COALESCE must produce the identical row (a doc with no
    tokens never reaches the per-token CTE chain)."""
    d = tmp_path / "bpea_edge"
    d.mkdir()
    _write_documents(d, ["ab ab", " \t\n ", "ab"])
    _compare(spark, "bpe_apply", d, ["documents"])
    got = _spark_rows(spark, "bpe_apply", d)
    assert got == [
        (0, 2, 4, 2, "ab ab"),
        (1, 0, 0, 0, ""),
        (2, 1, 2, 1, "ab"),
    ]


def test_bpe_apply_replays_iterative_rules(spark, tmp_path):
    """On the 'abc' corpus the trainer learns (a,b) then (ab,c) — rule 2's
    lhs exists only because rule 1 rewrote the vocab. Application must
    replay the rules IN ORDER: fold 1 turns [a,b,c] into [ab,c], fold 2
    into [abc]. Six independent single-pair rewrites (the bug this pins
    against) could never produce the single 'abc' symbol."""
    d = tmp_path / "bpea_iter"
    d.mkdir()
    _write_documents(d, ["abc abc", "abc"])
    _compare(spark, "bpe_apply", d, ["documents"])
    got = _spark_rows(spark, "bpe_apply", d)
    assert got == [
        (0, 2, 6, 2, "abc abc"),
        (1, 1, 3, 1, "abc"),
    ]


def test_fixture_vec_ids_dense_from_zero(sf_dir):
    """INFORMATIONAL fixture-shape pin (demoted from correctness
    precondition in r15): since the Lloyd seeds-CTE alignment, BOTH
    engines seed with the K_CELLS smallest vec_ids present (orderBy/limit
    vs ORDER BY ... LIMIT), so neither depends on vec_ids being dense
    from 0 — test_lloyd_seeds_agree_on_nondense_fixture proves agreement
    on a sparse-id fixture. This pin stays only to document the shape
    scripts/gen_fixture.py and the driver fixtures actually emit
    (vec_id = range(N)); if a future generator changes that, update this
    docstring rather than treating it as a correctness failure."""
    import os

    ids = sorted(
        pq.read_table(
            os.path.join(str(sf_dir), "embeddings.parquet"), columns=["vec_id"]
        )
        .column("vec_id")
        .to_pylist()
    )
    assert ids == list(range(len(ids))), f"sparse vec_ids in {sf_dir}"


def test_lloyd_seeds_agree_on_nondense_fixture(spark, tmp_path):
    """The r15 Lloyd seeds-CTE alignment's proof (formerly the forcing-
    function divergence pin; docs/lloyd_seeds_alignment_r15.md item 6):
    both engines now seed with the K_CELLS smallest vec_ids PRESENT —
    Spark via orderBy/limit, the oracle via `ORDER BY vec_id LIMIT K` in
    _DUCK_LLOYD_CTES — so on a deliberately non-dense fixture (ids
    1000..1031, where the old `WHERE vec_id < K` filter collapsed the
    oracle to zero rows) the full differential must AGREE, for ALL FIVE
    oracles built on the shared CTE chain (each reads only the
    embeddings table). This is the direct evidence that the dense-from-0
    fixture shape is documentation, not a correctness precondition."""
    from multithreaded_mapreduce_library_spark.operators.similarity import DIM

    _write_embeddings(tmp_path, list(range(1000, 1032)), DIM)
    got = _spark_rows(spark, "ivf_train_centroids", tmp_path)
    want = _duck_rows(
        SPECS["ivf_train_centroids"].oracle, str(tmp_path), ["embeddings"]
    )
    assert len(got) == 32, "Spark side must train on any id range"
    assert got == want
    for name in (
        "sim_topk_ivf_trained",
        "sim_topk_ivf_quantized",
        "dedup_semantic",
    ):
        got = _spark_rows(spark, name, tmp_path)
        want = _duck_rows(SPECS[name].oracle, str(tmp_path), ["embeddings"])
        assert got, f"{name}: empty result on the non-dense fixture"
        assert got == want, f"{name}: engines disagree on non-dense ids"
    # sim_topk_ivfpq additionally trains a PQ codebook whose seed rule is
    # vec_id < PQ_K on BOTH engines by construction (pq.py pqseeds — an
    # intentional filter, not a divergence; see the staging doc), so an
    # all-ids>=1000 fixture degenerates it to an empty-vs-empty
    # agreement. Exercise it on a GAPPED fixture instead: {0..3} keeps
    # the PQ codebook non-empty while the gap means the 8 smallest
    # present vec_ids ({0..3, 1000..1003}) differ from the old
    # `vec_id < 8` seed set ({0..3}) — pre-alignment this mismatched,
    # post-alignment both engines pick the same seeds.
    gapped = tmp_path / "gapped"
    gapped.mkdir()
    _write_embeddings(gapped, [0, 1, 2, 3, *range(1000, 1028)], DIM)
    got = _spark_rows(spark, "sim_topk_ivfpq", gapped)
    want = _duck_rows(SPECS["sim_topk_ivfpq"].oracle, str(gapped), ["embeddings"])
    assert got, "sim_topk_ivfpq: empty result on the gapped fixture"
    assert got == want, "sim_topk_ivfpq: engines disagree on gapped ids"


def test_bpe_recheckpoint_truncates_lineage(spark):
    """The mechanism behind the flat-per-round claim, pinned at the PLAN
    level (the cadence test above only counts localCheckpoint calls): a
    materialized mid-loop checkpoint must make the next round's plan
    scan the checkpointed RDD directly — no replayed fold layers, no
    Exchange — so per-round fold cost cannot grow with rounds elapsed."""
    from pyspark.sql import functions as F

    from multithreaded_mapreduce_library_spark.functions import tokens
    from multithreaded_mapreduce_library_spark.operators.text import _bpe_merge_col

    docs = spark.createDataFrame([("abcdefg",)] * 3, "text string")
    vocab = (
        docs.select(F.explode(tokens("text")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("f"))
        .withColumn(
            "syms",
            F.expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))"),
        )
        .select("f", "syms")
        .localCheckpoint(eager=False)
    )
    for pair in [("a", "b"), ("ab", "c"), ("abc", "d")]:
        vocab = vocab.withColumn("syms", _bpe_merge_col(F.col("syms"), *pair))
    # each _bpe_merge_col fold contributes exactly one aggregate() to the
    # Project expression; before the re-checkpoint all three layers are
    # live in the replayed lineage
    pre = vocab._jdf.queryExecution().executedPlan().toString()
    assert pre.count("aggregate(") == 3
    vocab = vocab.localCheckpoint(eager=False)
    vocab.count()  # materialize the lazy checkpoint
    post_round = vocab.withColumn(
        "syms", _bpe_merge_col(F.col("syms"), "abcd", "e")
    )
    plan = post_round._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in plan, "post-checkpoint round must scan the checkpoint"
    assert "Exchange" not in plan, "post-checkpoint fold round must stay narrow"
    # the three pre-checkpoint fold layers are GONE from the lineage;
    # only the one new fold's aggregate() remains
    assert plan.count("aggregate(") == 1
