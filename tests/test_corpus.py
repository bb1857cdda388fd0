"""Corpus-level operators (operators/corpus.py)."""

from kafka_dbsync_spark.operators.corpus import (
    contaminated_docs,
    pack_sequences,
    tfidf_top_terms,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_tfidf_ranks_distinctive_terms_first(spark):
    docs = _docs(
        spark,
        [
            (1, "common word apple apple apple"),
            (2, "common word banana"),
            (3, "common word cherry"),
        ],
    )
    top = {
        r["doc_id"]: r["term"]
        for r in tfidf_top_terms(docs, k=1).collect()
    }
    # the doc-unique term beats terms appearing in every doc
    assert top == {1: "apple", 2: "banana", 3: "cherry"}


def test_tfidf_rank_is_dense_per_doc(spark):
    docs = _docs(spark, [(1, "a b c d e")])
    ranks = sorted(
        r["rank"] for r in tfidf_top_terms(docs, k=3).collect()
    )
    assert ranks == [1, 2, 3]


def test_contaminated_docs_flags_shingle_overlap(spark):
    text = "one two three four five six seven eight nine ten"
    corpus = _docs(
        spark,
        [
            (1, text),  # contains the benchmark 8-gram
            (2, "totally different words with no overlap at all here"),
        ],
    )
    bench = _docs(spark, [(100, text + " extra tail words")])
    out = {r["doc_id"]: r["n_shared"] for r in
           contaminated_docs(corpus, bench, k=8).collect()}
    assert 1 in out and out[1] >= 1
    assert 2 not in out


def test_pack_sequences_spans_and_spill(spark):
    # single bucket (buckets=1): docs pack head-to-tail in id order
    docs = _docs(
        spark,
        [
            (1, " ".join(["w"] * 100)),  # tokens 0..99    -> bin 0
            (2, " ".join(["w"] * 100)),  # tokens 100..199 -> bin 0
            (3, " ".join(["w"] * 100)),  # tokens 200..299 -> bins 0-1 (spill)
        ],
    )
    out = {r["doc_id"]: r for r in
           pack_sequences(docs, ctx_len=256, buckets=1).collect()}
    assert (out[1]["start_bin"], out[1]["end_bin"]) == (0, 0)
    assert (out[2]["start_bin"], out[2]["end_bin"]) == (0, 0)
    assert (out[3]["start_bin"], out[3]["end_bin"]) == (0, 1)
    assert out[3]["start_off"] == 200


def test_pack_sequences_empty_doc_zero_span(spark):
    docs = _docs(spark, [(1, " ".join(["w"] * 10)), (2, "")])
    out = {r["doc_id"]: r for r in
           pack_sequences(docs, ctx_len=8, buckets=1).collect()}
    assert out[2]["n_tokens"] == 0
    assert out[2]["start_bin"] == out[2]["end_bin"]


def test_bm25_matches_brute_force(spark):
    import math

    import pytest

    from kafka_dbsync_spark.operators.corpus import bm25_topk

    rows = [
        (1, "spark shuffle join join join"),
        (2, "join once in a longer document about many other things entirely"),
        (3, "nothing relevant here at all"),
        (4, "shuffle shuffle"),
        (5, ""),
    ]
    docs = _docs(spark, rows)
    terms = ["join", "shuffle"]
    got = [(r["rank"], r["doc_id"], r["score_r"]) for r in
           bm25_topk(docs, terms, k=3).collect()]

    # brute force over the same tokenizer
    toks = {i: t.split() if t else [] for i, t in rows}
    n = len(rows)
    sumdl = sum(len(v) for v in toks.values())
    avgdl = sumdl / n
    k1, b = 1.2, 0.75

    def score(doc):
        s = 0.0
        for t in terms:
            tf = toks[doc].count(t)
            df = sum(1 for v in toks.values() if t in v)
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            s += idf * (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * (len(toks[doc]) / avgdl)))
        return round(s, 4)

    want = sorted(
        ((score(i), i) for i, t in rows if any(w in toks[i] for w in terms)),
        key=lambda p: (-p[0], p[1]),
    )[:3]
    assert got == [(r + 1, i, s) for r, (s, i) in enumerate(want)]
    assert all(i != 3 and i != 5 for _, i, _s in got)  # no-match docs excluded

    with pytest.raises(ValueError, match="query_terms"):
        bm25_topk(docs, [])


def test_bm25_plan_has_no_corpus_shuffle(spark):
    """The whole ranking is narrow + one scalar-stats agg + TakeOrdered:
    no hash-partitioned exchange over per-token or per-doc keys."""
    import re

    from kafka_dbsync_spark.operators.corpus import bm25_topk

    docs = _docs(spark, [(i, "join shuffle data") for i in range(100)])
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = docs.sparkSession._jvm.PythonSQLUtils.explainString(
            bm25_topk(docs, ["join", "shuffle"], k=5)._jdf.queryExecution(),
            "formatted",
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    hash_exchanges = re.findall(r"Exchange hashpartitioning", plan)
    assert not hash_exchanges, plan


def test_bloom_decontaminate_superset_of_exact(spark):
    """The Bloom flag set must contain every truly-contaminated doc
    (no false negatives), and each doc's flagged-shingle count must be
    >= its true shared count (false positives only add)."""
    from kafka_dbsync_spark.queries import QUERIES

    exact = {
        r["doc_id"]: r["n_shared"]
        for r in QUERIES["decontaminate"](spark, "/root/testdata/sf0.001").collect()
    }
    bloom = {
        r["doc_id"]: r["n_flagged"]
        for r in QUERIES["bloom_decontaminate"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert set(exact) <= set(bloom)
    for d, n in exact.items():
        assert bloom[d] >= n


def test_countmin_never_undercounts(spark):
    """CMS property: the min-over-rows estimate is >= the exact count
    for every probed token (collisions only add)."""
    from kafka_dbsync_spark.queries import QUERIES

    rows = QUERIES["countmin_counts"](spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert r["n_est"] >= r["n_exact"], r


def test_bpe_merge_fold_greedy_left(spark):
    """_merge_pair_expr pins leftmost-first non-overlapping BPE merge
    semantics, including the self-pair overlap case (a,a) on odd runs."""
    from pyspark.sql import functions as F

    from kafka_dbsync_spark.operators.corpus import _merge_pair_expr

    df = spark.createDataFrame(
        [(["h", "e", "r", "d", "e", "r"],),
         (["a", "a", "a"],),
         (["a", "a", "a", "a"],),
         (["x"],),
         (["e", "r"],)],
        "syms array<string>",
    )
    er = [r[0] for r in
          df.select(_merge_pair_expr(F.col("syms"), "e", "r")).collect()]
    assert er[0] == ["h", "er", "d", "er"]
    assert er[4] == ["er"]
    aa = [r[0] for r in
          df.select(_merge_pair_expr(F.col("syms"), "a", "a")).collect()]
    assert aa[1] == ["aa", "a"]          # greedy-left on the odd run
    assert aa[2] == ["aa", "aa"]
    assert aa[3] == ["x"]                # untouched word


def test_bpe_merges_trains_k_rounds(spark):
    """bpe_merges on a tiny corpus: deterministic trace, monotone vocab
    compression, round-1 pair equals the corpus argmax."""
    from kafka_dbsync_spark.operators.corpus import bpe_merges

    docs = spark.createDataFrame(
        [(1, "the theme thesis"), (2, "the theme"), (3, "then the")],
        "doc_id long, text string",
    )
    rows = bpe_merges(docs, k=3).collect()
    assert [r["step"] for r in rows] == [1, 2, 3]
    # all 7 words start 'the', so (t,h) and (h,e) both count 7 — the
    # lexicographic tie-break picks (h,e)
    assert (rows[0]["left"], rows[0]["right"], rows[0]["n"]) == ("h", "e", 7)
    assert rows[0]["merged"] == "he"
    # round 2 must count pairs over the MERGED vocab: (t,he) now adjacent
    assert (rows[1]["left"], rows[1]["right"], rows[1]["n"]) == ("t", "he", 7)
    # round 3: (m,e) and (the,m) tie at 2; 'm' < 'the' lexicographically
    assert (rows[2]["left"], rows[2]["right"], rows[2]["n"]) == ("m", "e", 2)


def test_bpe_empty_and_degenerate_corpus(spark):
    """BPE trainer edges: an all-single-char vocab has pairs only when
    words have >=2 chars; an effectively empty corpus yields an empty
    trace (no crash, no NULL rows)."""
    from kafka_dbsync_spark.operators.corpus import bpe_merges, bpe_token_counts

    empty = spark.createDataFrame(
        [(1, "  "), (2, None), (3, "!!!")], "doc_id long, text string"
    )
    assert bpe_merges(empty, k=3).collect() == []
    assert bpe_token_counts(empty, k=3).collect() == []
    singles = spark.createDataFrame(
        [(1, "a b c a b")], "doc_id long, text string"
    )
    assert bpe_merges(singles, k=2).collect() == []  # no adjacent pairs
    toks = {r["token"]: r["n_occ"]
            for r in bpe_token_counts(singles, k=2).collect()}
    assert toks == {"a": 2, "b": 2, "c": 1}  # untouched char vocab


def test_histogram_cut_bins_matches_exact_quantile_semantics(spark):
    """histogram_cut_bins (VERDICT r5 #2): cut_i is the smallest bin
    whose cumulative count reaches num/den of the total — checked
    against a driver-side recomputation, with ties sharing a bin and
    the derived bucketing non-decreasing in score."""
    from kafka_dbsync_spark.operators.corpus import (
        histogram_cut_bins,
        score_bin,
    )
    from pyspark.sql import functions as F

    vals = [1.01, 1.01, 1.02, 2.5, 2.5, 2.5, 3.0, 7.77, 7.78, 9.99]
    df = spark.createDataFrame([(float(v),) for v in vals], "s double")
    row = histogram_cut_bins(df, "s").head()
    # driver-side truth over integer bins (x100)
    bins = sorted(round(v * 100) for v in vals)
    n = len(bins)

    def cut(num, den):
        seen = 0
        for b in sorted(set(bins)):
            seen += bins.count(b)
            if seen * den >= num * n:
                return b
        raise AssertionError("unreachable")

    assert (row["cut_0"], row["cut_1"], row["n"]) == (cut(1, 3), cut(2, 3), n)
    # bucketing by the cuts is monotone and covers every row
    binned = df.select("s", score_bin("s").alias("bin")).crossJoin(
        F.broadcast(histogram_cut_bins(df, "s"))
    )
    buckets = [
        (r["s"], 0 if r["bin"] <= r["cut_0"] else 1 if r["bin"] <= r["cut_1"] else 2)
        for r in binned.orderBy("s").collect()
    ]
    assert [b for _, b in buckets] == sorted(b for _, b in buckets)
    # equal scores always share a bucket (value cuts, not count cuts)
    assert len({b for s, b in buckets if s == 2.5}) == 1


def test_histogram_cut_bins_plan_has_no_window(spark):
    """The operator exists to remove the single-partition global rank:
    its physical plan (and a consumer's) must contain no Window at all."""
    from kafka_dbsync_spark.operators.corpus import histogram_cut_bins

    df = spark.range(1000).selectExpr("cast(id % 37 as double) / 7 as s")
    plan = (
        histogram_cut_bins(df, "s")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan


def test_histogram_cut_values_matches_dataframe_face(spark):
    """histogram_cut_values (VERDICT r6 #1 + the O(B^2) advice): the
    driver-side linear cumsum returns the same exact cut points the
    1-row DataFrame face exposes, with custom fractions honored and
    None cuts on empty input."""
    from kafka_dbsync_spark.operators.corpus import (
        histogram_cut_bins,
        histogram_cut_values,
    )

    df = spark.range(1, 101).selectExpr("cast(id as double) / 10 as s")
    vals, n = histogram_cut_values(df, "s", cuts=((1, 4), (1, 2), (3, 4)))
    assert n == 100
    # bins are s*100 as ints: 10..1000 step 10; quartile cuts land on
    # the 25th/50th/75th values exactly
    assert vals == [250, 500, 750]
    row = histogram_cut_bins(df, "s", cuts=((1, 4), (1, 2), (3, 4))).head()
    assert (row["cut_0"], row["cut_1"], row["cut_2"], row["n"]) == (
        250, 500, 750, 100,
    )
    empty = df.filter("s < 0")
    assert histogram_cut_values(empty, "s") == ([None, None], 0)


def test_ppl_buckets_materializes_lineage_once(spark):
    """VERDICT r6 #1: the returned ppl_buckets plan must read the
    checkpointed score table (one Exchange for the bucket agg), not
    re-derive the bigram-LM train+score subtree — previously the
    lineage appeared ~4x (12 exchanges vs a budget of 7)."""
    from kafka_dbsync_spark.queries import QUERIES

    df = QUERIES["ppl_buckets"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2  # bucket agg (+AQE wrapper noise)
    assert "ExistingRDD" in plan  # the localCheckpoint scan
    # and the result is still the three CCNet buckets
    assert {r["bucket"] for r in df.collect()} <= {"head", "middle", "tail"}


def test_grouped_budget_cut_values_semantics(spark):
    """grouped_budget_cut_values: per group, cut = largest bin whose
    top-down cumulative weight reaches the budget; None when the group
    total is under budget; boundary bin kept whole (value cuts)."""
    from kafka_dbsync_spark.operators.corpus import grouped_budget_cut_values

    rows = [
        # group a: bins 9(w=5), 7(w=4), 5(w=10) — budget 8 -> cut 7 (5+4=9)
        ("a", 9, 5), ("a", 7, 4), ("a", 5, 10),
        # group b: total 6 < budget -> None (keep all)
        ("b", 3, 6),
        # group c: first bin alone covers it -> cut 8
        ("c", 8, 12), ("c", 2, 1),
    ]
    df = spark.createDataFrame(rows, "g string, bin long, w long")
    cuts = grouped_budget_cut_values(df, "g", "bin", "w", budget=8)
    assert cuts == {"a": 7, "b": None, "c": 8}
    # max_rows guard raises rather than degrading
    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_rows"):
        grouped_budget_cut_values(df, "g", "bin", "w", budget=8, max_rows=2)


def test_token_budget_selection_respects_budget(spark):
    """The registry query: every source's selection reaches the budget
    unless the source's whole corpus is smaller, and never drops a doc
    above the cut."""
    from kafka_dbsync_spark.queries import QUERIES

    rows = QUERIES["token_budget_selection"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        if r["cut_bp"] is not None:
            assert r["tok_sum"] >= 800      # budget met
        assert r["n_docs"] >= 1
        if r["cut_bp"] is not None:
            assert r["min_quality_bp"] >= r["cut_bp"]


def test_grouped_histogram_cut_values_per_group_thirds(spark):
    """grouped_histogram_cut_values: cuts computed independently per
    group with the same smallest-bin-reaching-fraction semantics as the
    ungrouped operator."""
    from kafka_dbsync_spark.operators.corpus import (
        grouped_histogram_cut_values,
        histogram_cut_values,
    )

    rows = [("x", float(v)) for v in range(1, 10)] + [
        ("y", 5.0), ("y", 5.0), ("y", 9.0),
    ]
    df = spark.createDataFrame(rows, "g string, s double")
    got = grouped_histogram_cut_values(df, "g", "s")
    # each group's cuts equal the ungrouped operator run on that group
    for g in ("x", "y"):
        solo, _ = histogram_cut_values(df.filter(f"g = '{g}'"), "s")
        assert got[g] == solo, g
    assert got["y"] == [500, 500]  # two of three rows share bin 500


def test_grouped_lm_isolates_groups(spark):
    """bigram_lm_perplexity(group_col=...): each group's model trains
    only on that group — a group's scores are identical to running the
    ungrouped operator on that group alone, and unseen-in-group tokens
    are penalized even when another group saw them."""
    from kafka_dbsync_spark.operators.corpus import bigram_lm_perplexity

    a = [(1, "the cat sat on the mat"), (2, "the cat sat on the rug")]
    b = [(3, "completely different language entirely"),
         (4, "the cat sat on the mat")]  # same text as doc 1, other group
    df = spark.createDataFrame(
        [(i, t, "A") for i, t in a] + [(i, t, "B") for i, t in b],
        "doc_id long, text string, lang string",
    )
    grouped = {
        r["doc_id"]: r["ppl"]
        for r in bigram_lm_perplexity(df, group_col="lang").collect()
    }
    solo_a = {
        r["doc_id"]: r["ppl"]
        for r in bigram_lm_perplexity(
            spark.createDataFrame(a, "doc_id long, text string")
        ).collect()
    }
    assert grouped[1] == solo_a[1] and grouped[2] == solo_a[2]
    # doc 4's text is fluent under A's model but its group is B, where
    # those bigrams are rare relative to B's model — scores must differ
    assert grouped[4] != grouped[1]


def test_trigram_backoff_arms_by_hand(spark):
    """trigram_backoff_perplexity: each CASE arm checked against a
    hand-computed score. Train corpus 'a b c a b d': trigram (a,b,c)
    count 1 with context (a,b) count 2 -> p=0.5; unseen trigram
    (x,b,c) backs off to 0.4 * n(b,c)/n(b) = 0.4 * 1/2 = 0.2; unseen
    bigram (c,x) bottoms out at 0.16 * (0+1)/(N=6 + V=4) = 0.016."""
    from kafka_dbsync_spark.operators.corpus import trigram_backoff_perplexity

    train = spark.createDataFrame(
        [(0, "a b c a b d")], "doc_id long, text string"
    )
    score = spark.createDataFrame(
        [(10, "a b c"), (11, "x b c"), (12, "b c x")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_trigrams"], r["ppl"])
        for r in trigram_backoff_perplexity(train, score).collect()
    }
    assert got == {10: (1, 2.0), 11: (1, 5.0), 12: (1, 62.5)}


def test_trigram_backoff_short_docs_absent(spark):
    """Score docs with fewer than 3 tokens have no trigrams and emit no
    row (matching the oracle's len(t) >= 3 guard)."""
    from kafka_dbsync_spark.operators.corpus import trigram_backoff_perplexity

    train = spark.createDataFrame(
        [(0, "a b c a b d")], "doc_id long, text string"
    )
    score = spark.createDataFrame(
        [(10, "a b"), (11, "c"), (12, "a b c d")],
        "doc_id long, text string",
    )
    ids = {
        r["doc_id"]
        for r in trigram_backoff_perplexity(train, score).collect()
    }
    assert ids == {12}


def test_moore_lewis_prefers_seed_like_docs(spark):
    """A pool doc built from the seed's bigrams must score a lower
    (more in-domain) cross-entropy difference than a pool doc the seed
    has never seen; OOV-heavy docs still score (add-one smoothing) and
    sub-bigram docs are excluded."""
    from kafka_dbsync_spark.operators.corpus import moore_lewis_scores

    seed = spark.createDataFrame(
        [
            (101, "the model reads the data and the model learns"),
            (102, "the model learns and the data grows"),
        ],
        "doc_id long, text string",
    )
    pool = spark.createDataFrame(
        [
            (1, "the model reads the data"),       # seed-like
            (2, "purple walrus sings jazz loudly"),  # nothing shared
            (3, "onetoken"),                        # < 2 tokens: excluded
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in moore_lewis_scores(seed, pool).collect()}
    assert set(got) == {1, 2}
    assert got[1]["n_bigrams"] == 4 and got[2]["n_bigrams"] == 4
    assert got[1]["ced"] < got[2]["ced"]


def test_moore_lewis_matches_hand_computation(spark):
    """One-bigram pool doc, tiny models: verify the exact arithmetic
    (add-one ratios under both models, 6-dp decimal logs, 4-dp ced)."""
    import math

    from kafka_dbsync_spark.operators.corpus import moore_lewis_scores

    seed = spark.createDataFrame(
        [(10, "a b a b")], "doc_id long, text string"
    )
    pool = spark.createDataFrame(
        [(1, "a b"), (2, "c d")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["ced"] for r in moore_lewis_scores(seed, pool).collect()}
    # seed grams: (a,b)x2, (b,a)x1 ; c1_in: a->2, b->1 ; V_in = 2
    # pool grams: (a,b)x1, (c,d)x1 ; c1_out: a->1, c->1 ; V_out = 4
    def ced(n12i, n1i, n12o, n1o):
        lp_in = round(math.log((n12i + 1) / (n1i + 2)), 6)
        lp_out = round(math.log((n12o + 1) / (n1o + 4)), 6)
        return round(lp_out - lp_in, 4)

    assert got == {1: ced(2, 2, 1, 1), 2: ced(0, 0, 1, 1)}


def test_nb_domain_classify_separable_and_tie_break(spark):
    """Clearly separable classes classify correctly; an all-OOV doc with
    symmetric models lands on the lexicographically first class (exact
    decimal scores make the tie deterministic, not float luck)."""
    from kafka_dbsync_spark.operators.corpus import nb_domain_classify

    train = spark.createDataFrame(
        [
            (1, "a", "apple banana apple banana"),
            (2, "b", "zebra yak zebra yak"),
        ],
        "doc_id long, source string, text string",
    )
    score = spark.createDataFrame(
        [
            (11, "apple banana"),      # -> a
            (12, "yak zebra yak"),     # -> b
            (13, "qqq rrr"),           # all-OOV, symmetric -> tie -> a
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["pred"] for r in nb_domain_classify(train, score).collect()
    }
    assert got == {11: "a", 12: "b", 13: "a"}


def test_cut_value_folds_reject_null_bins_and_groups(spark):
    """The driver-side cut-value folds fail CLEANLY on NULL bin/group
    values (e.g. a NULL-text doc whose score bin is NULL) instead of
    crashing with a bare TypeError ordering None against int."""
    import pytest as _pytest

    from kafka_dbsync_spark.operators.corpus import (
        grouped_budget_cut_values,
        grouped_histogram_cut_values,
        histogram_cut_values,
    )

    null_score = spark.createDataFrame(
        [("x", 1.0), ("x", None)], "g string, s double"
    )
    with _pytest.raises(ValueError, match="NULL score bin"):
        histogram_cut_values(null_score, "s")
    with _pytest.raises(ValueError, match="NULL g or score bin"):
        grouped_histogram_cut_values(null_score, "g", "s")
    null_group = spark.createDataFrame(
        [("x", 1.0), (None, 2.0)], "g string, s double"
    )
    with _pytest.raises(ValueError, match="NULL g or score bin"):
        grouped_histogram_cut_values(null_group, "g", "s")
    wdf = spark.createDataFrame(
        [("x", 5, 3), ("x", None, 2)], "g string, bin long, w long"
    )
    with _pytest.raises(ValueError, match="NULL g or bin"):
        grouped_budget_cut_values(wdf, "g", "bin", "w", budget=4)


def test_gopher_rules_report_structure(spark):
    """Six rows (5 rules + all_pass); every count in [0, n_docs]; a doc
    failing any rule cannot be in all_pass (counts are consistent)."""
    from kafka_dbsync_spark.queries import QUERIES

    n = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
    rows = {
        r["rule"]: r["n_docs"]
        for r in QUERIES["gopher_rules_report"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert set(rows) == {
        "word_count", "mean_word_length", "alpha_words", "stopwords",
        "repetition", "all_pass",
    }
    assert all(0 <= v <= n for v in rows.values())
    # all_pass <= n - max(single-rule violations)
    worst = max(v for k, v in rows.items() if k != "all_pass")
    assert rows["all_pass"] <= n - worst + max(0, 0)


def test_ccnet_pipeline_buckets_partition_deduped_corpus(spark):
    """Pipeline output is (lang_pred, bucket) groups over head/middle/
    tail only, and within each language the bucket ppl ranges are
    ordered head <= middle <= tail (value cuts)."""
    from kafka_dbsync_spark.queries import QUERIES

    rows = QUERIES["ccnet_pipeline"](spark, "/root/testdata/sf0.001").collect()
    assert rows
    assert {r["bucket"] for r in rows} <= {"head", "middle", "tail"}
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang_pred"], {})[r["bucket"]] = r
    order = ["head", "middle", "tail"]
    for lang, b in by_lang.items():
        present = [x for x in order if x in b]
        for a, c in zip(present, present[1:]):
            assert b[a]["max_ppl"] <= b[c]["min_ppl"] or b[a]["max_ppl"] <= b[c]["max_ppl"], lang


def test_k_anonymity_and_mixture_plan_invariants(spark):
    from kafka_dbsync_spark.queries import QUERIES

    n = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
    ka = QUERIES["k_anonymity_report"](spark, "/root/testdata/sf0.001").collect()
    assert sum(r["n_docs"] for r in ka) == n          # partition of corpus
    assert all(r["suppressed"] == (r["n_docs"] < 5) for r in ka)
    plan = QUERIES["mixture_epochs_plan"](spark, "/root/testdata/sf0.001").collect()
    assert len(plan) == 5
    for r in plan:
        assert r["epochs"] >= 1
        assert r["upsampled_tokens"] == r["epochs"] * r["n_tokens"]
        assert r["upsampled_tokens"] >= r["target_tokens"]   # ceil covers
        assert (r["epochs"] - 1) * r["n_tokens"] < r["target_tokens"]  # minimal


def test_curation_pipeline_v4_invariants(spark):
    """Flagship composition sanity: the plan covers only surviving
    sources, every epoch count is a positive integer, and the
    upsampled tokens are the smallest integer-epoch overshoot of the
    target (ceil semantics)."""
    from kafka_dbsync_spark.queries import QUERIES

    rows = QUERIES["curation_pipeline_v4"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        assert r["n_tokens"] > 0
        assert r["epochs"] >= 1
        assert r["upsampled_tokens"] == r["epochs"] * r["n_tokens"]
        assert r["upsampled_tokens"] >= r["target_tokens"]
        # one fewer epoch would undershoot the target (minimality)
        assert (r["epochs"] - 1) * r["n_tokens"] < r["target_tokens"]


def test_contamination_stats_counts_and_fraction(spark):
    """A doc fully contained in the benchmark is dirty (10000 bp), a
    half-overlapping doc reports the exact floor-bp fraction, and a
    disjoint doc is clean with zero hits."""
    from pyspark.sql import functions as F

    from kafka_dbsync_spark.operators.corpus import contamination_stats

    w = [f"w{i}" for i in range(12)]
    bench_text = " ".join(w)                       # grams w0..w4 (k=8)
    docs = spark.createDataFrame(
        [
            (1, bench_text),                        # identical: 10000 bp
            (2, " ".join(w[:8] + ["zz"] * 8)),      # 1 of 9 grams hits
            (3, " ".join(f"q{i}" for i in range(12))),  # disjoint
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(9, bench_text)], "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_grams"], r["n_hit"], r["overlap_bp"])
        for r in contamination_stats(docs, bench).collect()
    }
    assert got[1] == (5, 5, 10000)
    assert got[2] == (9, 1, 1111)                   # floor(1*10000/9)
    assert got[3][1] == 0 and got[3][2] == 0


def test_tf_per_doc_phrase_counts_overlapping(spark):
    """The shared BM25 tf kernel (r13 opt) counts OVERLAPPING
    adjacent-phrase occurrences (the positional-filter semantics) and
    matches the term filters exactly, with dl = 0 for NULL/empty
    text."""
    from kafka_dbsync_spark.operators.corpus import _tf_per_doc

    rows = [
        (1, "a b a b a"),  # phrase (a, b) occurs at positions 1 and 3
        (2, "a a a"),      # phrase (a, a) overlaps: positions 1 and 2
        (3, ""),
        (4, None),
        (5, "b a"),
    ]
    docs = _docs(spark, rows)
    out = {
        r["doc_id"]: (r["dl"], r["__tf0"], r["__tf1"], r["__tf2"])
        for r in _tf_per_doc(
            docs, "doc_id", "text", [("a", "b"), ("a", "a"), "a"]
        ).collect()
    }
    assert out[1] == (5, 2, 0, 3)
    assert out[2] == (3, 0, 2, 3)
    assert out[3] == (0, 0, 0, 0)
    assert out[4] == (0, 0, 0, 0)
    assert out[5] == (2, 0, 0, 1)


def test_chunk_breaks_matches_transform_tree(spark):
    """The r13 regex chunker equals the transform/sequence/slice tree
    it replaced: split on " " and join back round-trips losslessly, so
    grouping 8 tokens and rejoining with newlines IS replacing every
    8th space — including NULL/empty text, consecutive-space empty
    tokens and exact 8-token boundaries."""
    from pyspark.sql import functions as F

    from kafka_dbsync_spark.functions.text import chunk_breaks_every_nth_space

    rows = [
        (1, ""),
        (2, None),
        (3, "one"),
        (4, "a b c d e f g h"),
        (5, "a b c d e f g h i"),
        (6, "x  y   z"),
        (7, "a\nb c d e f g h i j"),
        (8, " ".join(f"t{i}" for i in range(25))),
    ]
    docs = _docs(spark, rows)
    tk = F.split(F.col("text"), " ")
    paras = F.transform(
        F.sequence(F.lit(0), F.ceil(F.size(tk) / 8.0).cast("int") - 1),
        lambda i: F.array_join(F.slice(tk, i * 8 + 1, 8), " "),
    )
    old = docs.select("doc_id", F.array_join(paras, "\n").alias("t"))
    new = docs.select(
        "doc_id", chunk_breaks_every_nth_space("text", 8).alias("t")
    )
    assert old.exceptAll(new).count() == 0
    assert new.exceptAll(old).count() == 0
