"""Dedup operator behavior on planted duplicates."""

from __future__ import annotations

import pyspark.sql.functions as F

from kafka_dbsync_spark.operators.dedup import (
    dedup_exact,
    dedup_normalized,
    jaccard_pairs,
    minhash_lsh_candidates,
    with_minhash_signatures,
    simhash16,
    with_shingles,
)


def docs_df(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    return spark.createDataFrame(
        [
            (1, base),
            (2, base),  # exact dup of 1
            (3, base.upper() + "!!!"),  # dup after normalization
            (4, base + " extra"),  # near-dup (one extra token)
            (5, "completely different content about spark query engines here"),
        ],
        "doc_id long, text string",
    )


def test_dedup_exact(spark):
    out = dedup_exact(docs_df(spark), "text", ["doc_id"])
    assert {r["doc_id"] for r in out.collect()} == {1, 3, 4, 5}


def test_dedup_exact_preserves_null_rows(spark):
    """NULL content is missing data, not a duplicate: every NULL row
    survives — including byte-identical ones, whose multiplicity is
    restored from the group count (the group key is a deterministic
    full-row hash, safe under stage retry)."""
    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, None), (4, None), (5, None)],
        "doc_id long, text string",
    ) . union(
        spark.createDataFrame([(3, None)], "doc_id long, text string")
    )  # doc_id 3 appears twice with identical bytes
    out = dedup_exact(df, "text", ["doc_id"]).collect()
    ids = sorted(r["doc_id"] for r in out)
    assert ids == [1, 3, 3, 4, 5]
    assert all(r["dedup_hash"] is None for r in out if r["text"] is None)


def test_dedup_normalized(spark):
    out = dedup_normalized(docs_df(spark), "text", ["doc_id"])
    assert {r["doc_id"] for r in out.collect()} == {1, 4, 5}


def test_minhash_identical_signatures(spark):
    sig = with_minhash_signatures(docs_df(spark), "text", 8).select(
        "doc_id", *[f"sig_{i}" for i in range(8)]
    )
    rows = {r["doc_id"]: tuple(r[f"sig_{i}"] for i in range(8)) for r in sig.collect()}
    assert rows[1] == rows[2] == rows[3]
    # near-dup shares most (not necessarily all) minima
    shared = sum(a == b for a, b in zip(rows[1], rows[4]))
    assert shared >= 5
    assert rows[1] != rows[5]


def test_lsh_finds_near_dups(spark):
    pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidates(docs_df(spark), "doc_id", "text").collect()
    }
    assert (1, 2) in pairs and (1, 3) in pairs and (1, 4) in pairs
    assert not any(5 in p for p in pairs)


def test_lsh_hot_bucket_star_pairs(spark):
    """Adversarial duplicate-heavy corpus: every copy of identical
    content shares ALL bands, so one bucket holds the whole corpus.
    Above max_bucket_size the operator must emit O(n) star pairs to the
    min-id representative — not O(n²) all-pairs — keeping every member
    transitively connected."""
    n = 500
    docs = spark.range(1, n + 1).select(
        F.col("id").alias("doc_id"),
        F.lit("the same document body repeated verbatim across the corpus").alias("text"),
    )
    pairs = minhash_lsh_candidates(
        docs, "doc_id", "text", max_bucket_size=32
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    # exactly n-1 star pairs, all anchored at the min id
    assert got == {(1, b) for b in range(2, n + 1)}


def test_lsh_small_buckets_unchanged_by_cap(spark):
    """Buckets under the cap produce identical all-pairs output for any
    cap value (the hybrid only changes behavior above the threshold)."""
    base = minhash_lsh_candidates(docs_df(spark), "doc_id", "text", max_bucket_size=32)
    hi = minhash_lsh_candidates(docs_df(spark), "doc_id", "text", max_bucket_size=1000)
    assert sorted(map(tuple, base.collect())) == sorted(map(tuple, hi.collect()))


def test_jaccard_verification(spark):
    docs = docs_df(spark)
    cand = minhash_lsh_candidates(docs, "doc_id", "text")
    verified = jaccard_pairs(docs, cand, "doc_id", "text", threshold=0.5)
    got = {(r["id_a"], r["id_b"]): r["jaccard_bp"] for r in verified.collect()}
    assert got[(1, 2)] == 10000  # identical → jaccard 1.0
    assert got[(1, 3)] == 10000  # identical after normalization
    assert 5000 <= got[(1, 4)] < 10000  # near-dup


def test_simhash_proximity(spark):
    out = {r["doc_id"]: r["simhash"] for r in simhash16(docs_df(spark), "doc_id", "text").collect()}
    assert out[1] == out[2] == out[3]

    def hamming(a, b):
        return bin(a ^ b).count("1")

    assert hamming(out[1], out[4]) <= 4
    assert hamming(out[1], out[5]) >= 4
    assert all(0 <= v < 2**16 for v in out.values())


def test_connected_components(spark):
    from kafka_dbsync_spark.operators.graph import connected_components

    # two components: {1,2,3,4} (chain + cross edge) and {7,9}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 4), (7, 9)], "id_a long, id_b long"
    )
    got = {
        (r["node"], r["component"])
        for r in connected_components(pairs).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (7, 7), (9, 7)}


def test_connected_components_path_graph(spark):
    """A path graph needs O(diameter) rounds - verify a 12-node chain
    converges and labels everything with the min node."""
    from kafka_dbsync_spark.operators.graph import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 12)], "id_a long, id_b long"
    )
    rows = connected_components(pairs).collect()
    assert len(rows) == 12
    assert {r["component"] for r in rows} == {1}


def test_simhash_bits_and_neardup_pairs(spark):
    from kafka_dbsync_spark.operators.dedup import simhash_bits, simhash_neardup_pairs

    sims = {
        r["doc_id"]: r["simhash"]
        for r in simhash_bits(docs_df(spark), "doc_id", "text").collect()
    }
    assert sims[1] == sims[2]  # identical docs, identical hash
    assert all(0 <= v < 2**60 for v in sims.values())
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_neardup_pairs(docs_df(spark), "doc_id", "text").collect()
    }
    assert pairs[(1, 2)] == 0 and pairs[(1, 3)] == 0  # normalization-equal
    # one extra token on a 13-token doc flips 7 of 60 bits - correctly
    # OUTSIDE the default hamming<=3 near-dup radius (short docs drift
    # fast; the sf corpora's ~200-token docs stay within it)
    assert (1, 4) not in pairs
    assert not any(5 in p for p in pairs)


def test_hash_fraction_sample_deterministic(spark):
    from kafka_dbsync_spark.operators.sampling import hash_fraction_sample

    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"] for r in hash_fraction_sample(df, "doc_id", 0.25).collect()}
    b = {r["doc_id"] for r in hash_fraction_sample(df, "doc_id", 0.25).collect()}
    assert a == b  # reproducible across runs
    assert 0.18 < len(a) / 2000 < 0.32
    c = {r["doc_id"] for r in hash_fraction_sample(df, "doc_id", 0.25, salt="v2").collect()}
    assert c != a  # different salt, different (independent) sample


def test_balanced_sample_equalizes_strata(spark):
    import pyspark.sql.functions as F

    from kafka_dbsync_spark.operators.sampling import balanced_sample

    df = (
        spark.range(0, 3000)
        .withColumnRenamed("id", "doc_id")
        .withColumn(
            "grp",
            F.when(F.col("doc_id") < 2400, "big")
            .when(F.col("doc_id") < 2900, "mid")
            .otherwise("small"),
        )
    )
    out = balanced_sample(df, "grp", "doc_id")
    sizes = {r["grp"]: r["n"] for r in out.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    # every stratum lands near the smallest stratum's size (100)
    assert all(60 <= n <= 140 for n in sizes.values()), sizes
    assert set(sizes) == {"big", "mid", "small"}
    # no helper columns leak
    assert out.columns == ["doc_id", "grp"]


def test_pagerank_fixedpoint_matches_brute_force(spark):
    """Integer fixed-point PageRank equals a sequential Python fold of
    the same arithmetic, and the star center outranks leaves."""
    import pyspark.sql.functions as F  # noqa: F811

    from kafka_dbsync_spark.operators.graph import pagerank_fixedpoint

    # star: 0 hub with leaves 1..4, plus an off-cluster edge 5-6,
    # a self-loop (dropped) and a duplicate edge (deduped)
    edges = [(0, 1), (0, 2), (0, 3), (0, 4), (5, 6), (2, 2), (1, 0)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["pr"] for r in pagerank_fixedpoint(df, iters=3).collect()}

    und = set()
    for s, d in edges:
        if s != d:
            und.add((s, d))
            und.add((d, s))
    deg = {}
    for s, _ in und:
        deg[s] = deg.get(s, 0) + 1
    pr = {n: 10**12 for n in deg}
    for _ in range(3):
        contrib = {}
        for s, d in und:
            contrib[d] = contrib.get(d, 0) + pr[s] // deg[s]
        pr = {
            n: 150_000_000_000 + (85 * contrib.get(n, 0)) // 100 for n in deg
        }
    assert got == pr
    assert got[0] > got[1]  # hub outranks leaf
    assert got[1] == got[2] == got[3] == got[4]  # symmetric leaves tie

    import pytest as _pytest

    with _pytest.raises(ValueError, match="iters"):
        pagerank_fixedpoint(df, iters=0)


def test_winnowing_guarantee_and_shape(spark):
    """Winnowing guarantee: two documents sharing a token run of length
    >= w+k-1 (= 6 here) share at least one fingerprint; and the picks
    are ~2/(w+1) of grams, deduped, in-range."""
    from kafka_dbsync_spark.operators.dedup import winnowing_fingerprints

    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens
    df = spark.createDataFrame(
        [
            (1, f"one two {shared} three four"),
            (2, f"{shared} nine ten eleven twelve"),
            (3, "completely different words here entirely now"),
        ],
        "doc_id long, text string",
    )
    fps = winnowing_fingerprints(df).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[1] & by_doc[2], "shared 6-token run must share a fingerprint"
    # density: selected grams are a strict subset (doc 1 has 8 grams)
    assert 1 <= len(by_doc[1]) < 8
    # positions are valid gram indexes (1-based)
    for r in fps:
        assert r["pos"] >= 1
    # no duplicate (doc, pos) picks
    keys = [(r["doc_id"], r["pos"]) for r in fps]
    assert len(keys) == len(set(keys))


def test_winnowing_null_text_contributes_nothing(spark):
    """NULL text must yield NO fingerprints — the fold sentinel ('~',
    pos=-1) must never leak (it would false-cluster every NULL doc)."""
    from kafka_dbsync_spark.operators.dedup import winnowing_fingerprints

    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "some real words here")],
        "doc_id long, text string",
    )
    rows = winnowing_fingerprints(df).collect()
    assert all(r["doc_id"] == 3 for r in rows)
    assert all(r["pos"] >= 1 and r["fp"] != "~" for r in rows)


def test_remove_duplicate_spans_edits_covered_positions(spark):
    """Two docs sharing an 8-token span both lose exactly that span;
    a doc with no shared span is absent from the output."""
    from kafka_dbsync_spark.operators.dedup import remove_duplicate_spans

    shared = "one two three four five six seven eight"
    docs = spark.createDataFrame(
        [
            (1, f"alpha {shared} beta"),
            (2, f"{shared} gamma delta"),
            (3, "totally different words with no overlap at all here"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["cleaned_text"])
        for r in remove_duplicate_spans(docs, k=8).collect()
    }
    assert set(got) == {1, 2}
    assert got[1] == (10, 8, "alpha beta")
    assert got[2] == (10, 8, "gamma delta")


def test_remove_duplicate_spans_full_doc_duplicate(spark):
    """A doc that is entirely a duplicated span cleans to the empty
    string with n_removed == n_tokens; overlapping spans coalesce
    (coverage, not per-span subtraction)."""
    from kafka_dbsync_spark.operators.dedup import remove_duplicate_spans

    nine = "w1 w2 w3 w4 w5 w6 w7 w8 w9"
    docs = spark.createDataFrame(
        [(1, nine), (2, nine)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["cleaned_text"])
        for r in remove_duplicate_spans(docs, k=8).collect()
    }
    # both 8-gram spans (positions 1-8 and 2-9) are duplicated; their
    # union covers all 9 tokens exactly once
    assert got == {1: (9, 9, ""), 2: (9, 9, "")}


def test_setsim_prefix_join_complete_vs_bruteforce(spark):
    """The prefix-filtered join must return EXACTLY the brute-force
    all-pairs result — completeness is the operator's whole claim."""
    from kafka_dbsync_spark.operators.dedup import (
        jaccard_pairs,
        setsim_prefix_join,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon eta"),   # near-dup of 1
            (3, "alpha beta gamma delta epsilon zeta"),  # exact dup of 1
            (4, "one two three four five six seven"),
            (5, "totally different words here now ok"),
            (6, "one two three four five six eight"),    # near-dup of 4
        ],
        "doc_id long, text string",
    )
    got = sorted(
        map(tuple, setsim_prefix_join(docs, "doc_id", "text", 3, 0.5).collect())
    )
    ids = [r.doc_id for r in docs.collect()]
    all_pairs = spark.createDataFrame(
        [(a, b) for a in ids for b in ids if a < b], "id_a long, id_b long"
    )
    want = sorted(
        map(tuple, jaccard_pairs(docs, all_pairs, "doc_id", "text", 3, 0.5).collect())
    )
    assert got == want
    assert (1, 3, 10000) in got       # the exact dup
    assert any(p[:2] == (1, 2) for p in got)
    assert not any(5 in p[:2] for p in got)


def test_setsim_prefix_join_bp_boundary_threshold(spark):
    """A pair EXACTLY at the basis-point boundary under a threshold
    whose double rounds UP (0.34 -> 0.34000000000000002) must survive:
    |A|=17 subset of |B|=50 has J = 17/50 = 0.34 = 3400bp precisely.
    Float filters would prune it (17 < 0.34000...2 * 50 = 17.000...4)
    while the bp verifier accepts it; the filters now share the exact
    integer tbp contract, so the pair comes back."""
    from kafka_dbsync_spark.operators.dedup import setsim_prefix_join

    words = [f"w{i:02d}" for i in range(50)]
    docs = spark.createDataFrame(
        [(1, " ".join(words[:17])), (2, " ".join(words))],
        "doc_id long, text string",
    )
    got = sorted(
        map(tuple, setsim_prefix_join(docs, "doc_id", "text", 1, 0.34).collect())
    )
    assert got == [(1, 2, 3400)]


def test_setsim_prefix_join_threshold_validation(spark):
    import pytest

    from kafka_dbsync_spark.operators.dedup import setsim_prefix_join

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="threshold"):
        setsim_prefix_join(docs, threshold=0.0)


def test_setsim_prefix_join_short_docs_whole_text_shingle(spark):
    """Docs shorter than k tokens dedup on their whole text (the
    shared single-shingle convention) — and never crash the slice."""
    from kafka_dbsync_spark.operators.dedup import setsim_prefix_join

    docs = spark.createDataFrame(
        [(1, "hi there"), (2, "hi there"), (3, "bye now")],
        "doc_id long, text string",
    )
    got = sorted(
        map(tuple, setsim_prefix_join(docs, "doc_id", "text", 3, 0.9).collect())
    )
    assert got == [(1, 2, 10000)]


def test_setsim_prefix_join_null_vs_empty_text(spark):
    """NULL-text docs pair with NOTHING (their only shingle is a NULL
    join key — and the clone collapse must not group them with
    empty-text docs just because concat_ws skips nulls); EMPTY-text
    docs are genuinely identical sets and pair at Jaccard 1."""
    from kafka_dbsync_spark.operators.dedup import setsim_prefix_join

    docs = spark.createDataFrame(
        [(1, None), (2, None), (3, ""), (4, ""), (5, "real words here now")],
        "doc_id long, text string",
    )
    got = sorted(
        map(tuple, setsim_prefix_join(docs, "doc_id", "text", 3, 0.5).collect())
    )
    assert got == [(3, 4, 10000)]


def test_paragraph_dedup_keep_first_vs_drop_all(spark):
    """CCNet paragraph-hash dedup: keep_first leaves exactly the
    globally-first (doc, position) instance of each duplicated
    paragraph; drop_all removes every instance. Unaffected docs are
    absent (inner-join semantics, like remove_duplicate_spans)."""
    from kafka_dbsync_spark.operators.dedup import paragraph_dedup

    docs = spark.createDataFrame(
        [
            (1, "shared para\nunique to one"),
            (2, "also original\nshared para\nmore text"),
            (3, "completely standalone document"),
        ],
        "doc_id long, text string",
    )
    kf = {
        r["doc_id"]: (r["n_paras"], r["n_removed"], r["cleaned_text"])
        for r in paragraph_dedup(docs, mode="keep_first").collect()
    }
    # doc 1 holds the first instance -> doc 2 loses its copy; doc 1 and
    # doc 3 are untouched and therefore absent
    assert kf == {2: (3, 1, "also original\nmore text")}
    da = {
        r["doc_id"]: (r["n_paras"], r["n_removed"], r["cleaned_text"])
        for r in paragraph_dedup(docs, mode="drop_all").collect()
    }
    assert da == {
        1: (2, 1, "unique to one"),
        2: (3, 1, "also original\nmore text"),
    }
    import pytest as _pytest

    with _pytest.raises(ValueError, match="mode"):
        paragraph_dedup(docs, mode="bogus")


def test_paragraph_dedup_within_doc_and_normalization(spark):
    """A doc repeating its own paragraph loses the repeat (keep_first)
    or both copies (drop_all) — CCNet hashes corpus-wide; matching is
    on the NORMALIZED form (case / internal whitespace folded); empty
    paragraphs (blank lines) are formatting, kept verbatim and never
    dedup'd."""
    from kafka_dbsync_spark.operators.dedup import paragraph_dedup

    docs = spark.createDataFrame(
        [
            (1, "repeat me\nrepeat me\nkeep this"),
            (2, "  REPEAT   me \nother text"),
            (3, "a\n\n\nb"),   # blank paragraphs, no duplicates
            (4, "c\n\n\nd"),   # blank paragraphs in another doc too
        ],
        "doc_id long, text string",
    )
    kf = {
        r["doc_id"]: (r["n_removed"], r["cleaned_text"])
        for r in paragraph_dedup(docs, mode="keep_first").collect()
    }
    # doc 1 pos 1 is the global first; doc 1 pos 2 and doc 2 pos 1 go.
    # docs 3/4 share only EMPTY paragraphs -> untouched, absent.
    assert kf == {
        1: (1, "repeat me\nkeep this"),
        2: (1, "other text"),
    }
    da = {
        r["doc_id"]: (r["n_removed"], r["cleaned_text"])
        for r in paragraph_dedup(docs, mode="drop_all").collect()
    }
    assert da == {1: (2, "keep this"), 2: (1, "other text")}


def test_paragraph_dedup_whole_doc_removed_empties_text(spark):
    from kafka_dbsync_spark.operators.dedup import paragraph_dedup

    docs = spark.createDataFrame(
        [(1, "only para"), (2, "only para")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_paras"], r["n_removed"], r["cleaned_text"])
        for r in paragraph_dedup(docs, mode="drop_all").collect()
    }
    assert got == {1: (1, 1, ""), 2: (1, 1, "")}


def test_lsh_recall_curve_monotone_in_bands(spark):
    """More, looser bands can only ADD candidate pairs (a pair collides
    if ANY band matches), and verification is exact — so recall is
    non-increasing in rows_per_band and the 8-band point dominates."""
    from kafka_dbsync_spark.queries import QUERIES

    rows = {
        r["rows_per_band"]: r
        for r in QUERIES["lsh_recall_curve"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert set(rows) == {1, 2, 4, 8}
    assert all(r["n_true"] == rows[1]["n_true"] for r in rows.values())
    for a, b in ((1, 2), (2, 4), (4, 8)):
        assert rows[a]["recall_bp"] >= rows[b]["recall_bp"]
    assert all(r["n_found"] <= r["n_true"] for r in rows.values())


def test_video_neardup_frame_voting(spark):
    """Frame-vote semantics: a twin sharing 3 of 4 frames (one within a
    small edit) dedups at min_matches=3; one frame matching MANY frames
    of the other video still counts as ONE anchor vote; unrelated
    videos never pair; the composite-key stride guard raises."""
    import hashlib

    import pytest as _pt

    from kafka_dbsync_spark.operators.dedup import video_neardup_pairs

    def fr(tag):  # one deterministic 64-byte ascii frame
        m = hashlib.md5(tag.encode()).hexdigest()
        return (m + m).encode()

    def edit(frame, pos):  # one-character edit: <= 2 dHash bits
        b = bytearray(frame)
        b[pos] = ord("0")
        return bytes(b)

    a = fr("a0") + fr("a1") + fr("a2") + fr("a3")
    twin = fr("a0") + edit(fr("a1"), 7) + fr("a2") + fr("zz")
    other = fr("b0") + fr("b1") + fr("b2") + fr("b3")
    rep = fr("a0") * 4  # every frame = a's frame 0
    df = spark.createDataFrame(
        [(1, a), (2, twin), (3, other), (4, rep)],
        "doc_id long, blob binary",
    )
    got = {
        (r["id_a"], r["id_b"]): r["n_matched_frames"]
        for r in video_neardup_pairs(
            df, frame_bytes=64, every_n=1, max_frames=4, min_matches=3
        ).collect()
    }
    assert got == {(1, 2): 3}  # rep (4) matches only 1 anchor -> below bar
    votes_all = {
        (r["id_a"], r["id_b"]): r["n_matched_frames"]
        for r in video_neardup_pairs(
            df, frame_bytes=64, every_n=1, max_frames=4, min_matches=1
        ).collect()
    }
    assert votes_all[(1, 4)] == 1 and votes_all[(2, 4)] == 1
    assert (1, 3) not in votes_all and (2, 3) not in votes_all
    with _pt.raises(ValueError, match="must be <"):
        video_neardup_pairs(df, max_frames=2000, every_n=1)


def test_host_boilerplate_strip_scoped_threshold(spark):
    """RefinedWeb-style host-scoped line dedup: a paragraph in >= 25%
    of a host's docs (min 2) vanishes from EVERY doc of that host —
    first instance included — while the same text on ANOTHER host
    below its own threshold survives (scoping is per host, not
    corpus-global)."""
    from kafka_dbsync_spark.operators.dedup import host_boilerplate_strip

    docs = spark.createDataFrame(
        [
            # host a: 4 docs, "footer a" in 3 of them (75% >= 25%)
            (1, "a", "footer a\nbody one"),
            (2, "a", "body two\nfooter a"),
            (3, "a", "body three\nfooter a"),
            (4, "a", "body four only"),
            # host b: 4 docs, "footer a" text appears in just 1 (25%
            # but below the 2-doc floor) -> survives on b
            (5, "b", "footer a\nbody five"),
            (6, "b", "body six"),
            (7, "b", "body seven"),
            (8, "b", "body eight"),
        ],
        "doc_id long, source string, text string",
    )
    out = {
        r["doc_id"]: (r["source"], r["n_paras"], r["n_removed"], r["cleaned_text"])
        for r in host_boilerplate_strip(docs).collect()
    }
    assert out == {
        1: ("a", 2, 1, "body one"),
        2: ("a", 2, 1, "body two"),
        3: ("a", 2, 1, "body three"),
    }


def test_host_boilerplate_within_doc_repeat_counts_once(spark):
    """A doc repeating its host's banner contributes ONE unit of
    document frequency — two docs each repeating it twice is df=2 of 4
    (50%), not an instance count; and the strip removes BOTH in-doc
    copies once flagged."""
    from kafka_dbsync_spark.operators.dedup import host_boilerplate_strip

    docs = spark.createDataFrame(
        [
            (1, "h", "banner\nreal text\nbanner"),
            (2, "h", "banner\nbanner\nother text"),
            (3, "h", "just content"),
            (4, "h", "more content"),
        ],
        "doc_id long, source string, text string",
    )
    out = {
        r["doc_id"]: (r["n_paras"], r["n_removed"], r["cleaned_text"])
        for r in host_boilerplate_strip(docs, min_frac_pct=50).collect()
    }
    assert out == {1: (3, 2, "real text"), 2: (3, 2, "other text")}
    # at 75% the 2-of-4 banner is under threshold: nothing is affected
    assert host_boilerplate_strip(docs, min_frac_pct=75).count() == 0


def test_host_boilerplate_fully_boilerplate_doc_empties(spark):
    """A doc that is nothing but its host's boilerplate strips to ''
    (kept as a row, n_removed == n_paras); normalized-empty paragraphs
    are formatting and never flagged even when every doc shares them."""
    from kafka_dbsync_spark.operators.dedup import host_boilerplate_strip
    import pytest as _pt

    docs = spark.createDataFrame(
        [
            (1, "h", "legal line\n\nlegal line"),
            (2, "h", "legal line\n\ncontent here"),
        ],
        "doc_id long, source string, text string",
    )
    out = {
        r["doc_id"]: (r["n_paras"], r["n_removed"], r["cleaned_text"])
        for r in host_boilerplate_strip(docs, min_frac_pct=100).collect()
    }
    # the empty middle paragraph survives in both docs
    assert out == {1: (3, 2, ""), 2: (3, 1, "\ncontent here")}
    with _pt.raises(ValueError, match="min_frac_pct"):
        host_boilerplate_strip(docs, min_frac_pct=0)
