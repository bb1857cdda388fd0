"""Property-based invariants (hypothesis): the algebraic contracts the
scale tricks rely on. Each property is the statement that an
optimization is SAFE — salting must not change join results, state
merging must equal recomputation, replay must be idempotent — checked
over randomized inputs instead of hand-picked fixtures."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
import pyspark.sql.functions as F

from kafka_dbsync_spark.operators.incremental import merge_agg_state
from kafka_dbsync_spark.operators.joins import salted_join
from kafka_dbsync_spark.operators.layout import zvalue
from kafka_dbsync_spark.operators.merge import apply_changes

SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

keys = st.integers(min_value=0, max_value=6)  # few keys → collisions likely
vals = st.integers(min_value=-100, max_value=100)


@given(
    left=st.lists(st.tuples(keys, vals), min_size=1, max_size=25),
    right=st.lists(st.tuples(keys, vals), min_size=1, max_size=10),
    salt=st.sampled_from([1, 2, 5]),
    how=st.sampled_from(["inner", "left"]),
)
@SETTINGS
def test_salting_never_changes_join_results(spark, left, right, salt, how):
    ldf = spark.createDataFrame(left, "k long, v long")
    rdf = spark.createDataFrame(right, "k long, w long")
    plain = sorted(
        (r["k"], r["v"], r["w"]) for r in ldf.join(rdf, "k", how).collect()
    )
    salted = sorted(
        (r["k"], r["v"], r["w"])
        for r in salted_join(ldf, rdf, ["k"], salt=salt, how=how).collect()
    )
    assert salted == plain


@given(
    rows=st.lists(st.tuples(keys, vals), min_size=1, max_size=30),
    cut=st.integers(min_value=0, max_value=30),
)
@SETTINGS
def test_state_merge_equals_recompute(spark, rows, cut):
    cut = min(cut, len(rows))
    df = spark.createDataFrame(rows, "k long, x long")

    def agg(d):
        return d.groupBy("k").agg(
            F.count("*").alias("n"),
            F.sum("x").alias("sx"),
            F.min("x").alias("mn"),
            F.max("x").alias("mx"),
        )

    a = spark.createDataFrame(rows[:cut] or [], "k long, x long")
    b = spark.createDataFrame(rows[cut:] or [], "k long, x long")
    merged = merge_agg_state(
        agg(a), agg(b), ["k"], sum_cols=["n", "sx"], min_cols=["mn"], max_cols=["mx"]
    )
    want = sorted(map(tuple, agg(df).collect()))
    got = sorted(map(tuple, merged.collect()))
    assert got == want


@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=255),
            st.integers(min_value=0, max_value=255),
        ),
        min_size=1,
        max_size=40,
        unique=True,
    )
)
@SETTINGS
def test_zvalue_matches_brute_interleave_and_is_injective(spark, pts):
    bits = 8
    df = spark.createDataFrame(pts, "x long, y long")
    out = df.select(
        "x", "y",
        zvalue(
            [(F.col("x"), 0.0, 255.0), (F.col("y"), 0.0, 255.0)], bits
        ).alias("z"),
    ).collect()

    def brute(x, y):
        z = 0
        for b in range(bits):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        return z

    zs = set()
    for r in out:
        assert r["z"] == brute(r["x"], r["y"])
        zs.add(r["z"])
    assert len(zs) == len(pts)  # injective on the grid


ops = st.sampled_from(["upsert", "delete"])


@given(
    changes=st.lists(st.tuples(keys, ops, vals), min_size=1, max_size=30),
)
@SETTINGS
def test_apply_changes_matches_sequential_fold(spark, changes):
    """Distributed last-write-wins == applying the log one row at a time
    in sequence order (the reference's single-threaded sink semantics)."""
    rows = [(k, op, v, i) for i, (k, op, v) in enumerate(changes)]
    df = spark.createDataFrame(rows, "k long, op string, v long, seq long")
    got = {
        r["k"]: r["v"]
        for r in apply_changes(df, ["k"], ["seq"]).select("k", "v").collect()
    }
    state: dict[int, int] = {}
    for k, op, v in changes:
        if op == "delete":
            state.pop(k, None)
        else:
            state[k] = v
    assert got == state


@given(
    base=st.dictionaries(
        st.integers(min_value=0, max_value=20),
        st.tuples(st.integers(min_value=0, max_value=3), vals),
        min_size=1,
        max_size=15,
    ),
    removed=st.sets(st.integers(min_value=0, max_value=20), max_size=5),
    changed=st.sets(st.integers(min_value=0, max_value=20), max_size=5),
    added=st.sets(st.integers(min_value=21, max_value=30), max_size=5),
)
@SETTINGS
def test_snapshot_diff_reports_exactly_the_drift(
    spark, base, removed, changed, added
):
    source = [(k, s, float(v)) for k, (s, v) in base.items()]
    replica = [
        (k, s, float(v + 1) if k in changed else float(v))
        for k, (s, v) in base.items()
        if k not in removed
    ] + [(k, 0, 0.0) for k in added]
    sdf = spark.createDataFrame(source, "k long, s long, v double")
    rdf = spark.createDataFrame(replica, "k long, s long, v double")

    from kafka_dbsync_spark.operators.reconcile import snapshot_diff

    got = {
        r["k"]: (r["status"], list(r["changed_cols"]))
        for r in snapshot_diff(sdf, rdf, ["k"]).collect()
    }
    want = {}
    for k in base:
        if k in removed:
            want[k] = ("removed", [])
        elif k in changed:
            want[k] = ("changed", ["v"])
    for k in added:
        want[k] = ("added", [])
    assert got == want


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=500),
            st.sampled_from(["a", "b", "c"]),
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[0],
    ),
    target=st.integers(min_value=1, max_value=50),
)
@SETTINGS
def test_mixture_sample_matches_exact_threshold_math(spark, rows, target):
    """The engine's sampled id set equals a from-scratch Python
    evaluation of the same md5-threshold arithmetic — determinism and
    exactness in one assertion."""
    import hashlib

    from kafka_dbsync_spark.operators.sampling import mixture_sample

    weights = {"a": 0.5, "b": 0.5}  # stratum c carries no weight
    df = spark.createDataFrame(rows, "id long, src string")
    got = sorted(
        r["id"] for r in mixture_sample(df, "src", "id", weights, target).collect()
    )

    wbp = {s: round(w * 1_000_000) for s, w in weights.items()}
    wsum = sum(wbp.values())
    counts: dict[str, int] = {}
    for _, s in rows:
        counts[s] = counts.get(s, 0) + 1
    want = []
    for i, s in rows:
        if s not in wbp:
            continue
        thr = min((wbp[s] * target * (1 << 32)) // (wsum * counts[s]), 1 << 32)
        hv = int(hashlib.md5(f":{i}".encode()).hexdigest()[:8], 16)
        if hv < thr:
            want.append(i)
    assert got == sorted(want)


words = st.sampled_from("alpha beta gamma delta eps zeta eta theta".split())


@given(
    docs=st.lists(
        st.lists(words, min_size=1, max_size=20), min_size=2, max_size=6
    ),
)
@SETTINGS
def test_winnowing_guarantee_property(spark, docs):
    """For every pair of docs sharing a contiguous token run of length
    >= w+k-1 (=6), winnowing must select a common fingerprint."""
    from kafka_dbsync_spark.operators.dedup import winnowing_fingerprints

    rows = [(i, " ".join(d)) for i, d in enumerate(docs)]
    fps = winnowing_fingerprints(
        spark.createDataFrame(rows, "doc_id long, text string")
    ).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])

    def runs(d, n=6):
        return {tuple(d[i : i + n]) for i in range(len(d) - n + 1)}

    for a in range(len(docs)):
        for b in range(a + 1, len(docs)):
            if runs(docs[a]) & runs(docs[b]):
                assert by_doc.get(a, set()) & by_doc.get(b, set()), (
                    docs[a],
                    docs[b],
                )


@given(
    corpus=st.lists(
        st.lists(words, min_size=8, max_size=16), min_size=1, max_size=4
    ),
    bench=st.lists(
        st.lists(words, min_size=8, max_size=16), min_size=1, max_size=3
    ),
)
@SETTINGS
def test_bloom_superset_property(spark, corpus, bench):
    """Bloom decontamination never misses a truly-contaminated doc."""
    from kafka_dbsync_spark.operators.corpus import (
        bloom_contaminated,
        contaminated_docs,
    )

    cdf = spark.createDataFrame(
        [(i, " ".join(d)) for i, d in enumerate(corpus)],
        "doc_id long, text string",
    )
    bdf = spark.createDataFrame(
        [(1000 + i, " ".join(d)) for i, d in enumerate(bench)],
        "doc_id long, text string",
    )
    exact = {r["doc_id"] for r in contaminated_docs(cdf, bdf, k=8).collect()}
    flagged = {r["doc_id"] for r in bloom_contaminated(cdf, bdf, k=8).collect()}
    assert exact <= flagged


def _py_bpe_merge(syms: list[str], a: str, b: str) -> list[str]:
    """Reference greedy-left non-overlapping BPE merge (the classic
    tokenizer-training scan)."""
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


@given(
    words=st.lists(
        st.lists(st.sampled_from(["a", "b", "ab", "c"]), min_size=1, max_size=8),
        min_size=1,
        max_size=12,
    ),
    pair=st.sampled_from([("a", "b"), ("a", "a"), ("ab", "c"), ("c", "c")]),
)
@SETTINGS
def test_bpe_merge_fold_matches_python_reference(spark, words, pair):
    """The JVM aggregate fold (_merge_pair_expr) must equal the classic
    sequential greedy-left merge on arbitrary symbol sequences —
    including self-pairs on odd runs and merged-symbol collisions
    ('ab' as an atomic symbol vs an (a,b) merge)."""
    from kafka_dbsync_spark.operators.corpus import _merge_pair_expr

    a, b = pair
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "i long, syms array<string>"
    )
    got = {
        r["i"]: r["m"]
        for r in df.select(
            "i", _merge_pair_expr(F.col("syms"), a, b).alias("m")
        ).collect()
    }
    assert got == {i: _py_bpe_merge(w, a, b) for i, w in enumerate(words)}


@given(
    edges=st.sets(
        st.tuples(
            st.integers(min_value=0, max_value=8),
            st.integers(min_value=0, max_value=8),
        ).map(lambda p: (min(p), max(p))).filter(lambda p: p[0] != p[1]),
        max_size=20,
    ),
)
@SETTINGS
def test_triangle_join_matches_python_reference(spark, edges):
    """The two-hop triangle join (id-oriented edges, each triangle
    counted once from its lowest vertex) must match brute-force
    enumeration on arbitrary small graphs — per-vertex counts included."""
    if not edges:
        return
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    import itertools

    want = {}
    for x, y, z in itertools.combinations(sorted(adj), 3):
        if y in adj[x] and z in adj[x] and z in adj[y]:
            for v in (x, y, z):
                want[v] = want.get(v, 0) + 1

    capped = spark.createDataFrame(sorted(edges), "pa long, pb long")
    e1 = capped.select(F.col("pa").alias("x"), F.col("pb").alias("y"))
    e2 = capped.select(F.col("pa").alias("x2"), F.col("pb").alias("z"))
    e3 = capped.select(F.col("pa").alias("y3"), F.col("pb").alias("z3"))
    tri = (
        e1.join(e2, (F.col("x") == F.col("x2")) & (F.col("y") < F.col("z")))
        .join(e3, (F.col("y") == F.col("y3")) & (F.col("z") == F.col("z3")))
        .select("x", "y", "z")
    )
    got = {
        r["part"]: r["n"]
        for r in tri.select(F.explode(F.array("x", "y", "z")).alias("part"))
        .groupBy("part").agg(F.count("*").alias("n")).collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# Round-5 phase-2 operator contracts
# ---------------------------------------------------------------------------
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 400)), min_size=1, max_size=60
    ),
    mask=st.integers(min_value=0, max_value=2**60 - 1),
)
@SETTINGS
def test_hll_merge_equals_oneshot_for_any_sharding(spark, rows, mask):
    # the sharding/streaming claim: however rows are split into two
    # shards, merging the shards' registers gives EXACTLY the one-shot
    # sketch of the union
    from kafka_dbsync_spark.functions.sketches import (
        hll_distinct,
        hll_estimate_from_registers,
        hll_merge_registers,
        hll_registers,
    )

    df = spark.createDataFrame(
        [(g, str(v)) for g, v in rows], "grp long, v string"
    )
    a = [(g, str(v)) for i, (g, v) in enumerate(rows) if (mask >> (i % 60)) & 1]
    b = [(g, str(v)) for i, (g, v) in enumerate(rows) if not (mask >> (i % 60)) & 1]
    schema = "grp long, v string"
    one_shot = sorted(map(tuple, hll_distinct(df, ["grp"], "v", p=6).collect()))
    ra = hll_registers(spark.createDataFrame(a, schema), ["grp"], "v", p=6)
    rb = hll_registers(spark.createDataFrame(b, schema), ["grp"], "v", p=6)
    merged = hll_estimate_from_registers(
        hll_merge_registers(ra, rb, ["grp"]), ["grp"], p=6
    )
    assert sorted(map(tuple, merged.collect())) == one_shot


@given(
    names=st.lists(
        st.sampled_from(["ab", "abc", "abd", "xyz", "xy", "wxyz"]),
        min_size=2,
        max_size=12,
    ),
    max_dist=st.integers(min_value=0, max_value=3),
)
@SETTINGS
def test_blocked_fuzzy_pairs_match_bruteforce_when_uncapped(spark, names, max_dist):
    # with the cap above every block size, the blocked operator must
    # produce exactly the brute-force within-block pair set
    import itertools

    from kafka_dbsync_spark.operators.linkage import blocked_fuzzy_pairs

    def lev(s, t):
        if not s:
            return len(t)
        if not t:
            return len(s)
        prev = list(range(len(t) + 1))
        for i, cs in enumerate(s, 1):
            cur = [i]
            for j, ct in enumerate(t, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (cs != ct)))
            prev = cur
        return prev[-1]

    rows = [(i, nm, nm[0]) for i, nm in enumerate(names)]
    df = spark.createDataFrame(rows, "id long, name string, blk string")
    got = sorted(
        (r["id_a"], r["id_b"], r["dist"])
        for r in blocked_fuzzy_pairs(
            df, "id", "name", F.col("blk"), max_dist=max_dist, block_cap=1000
        ).collect()
    )
    want = sorted(
        (a, b, lev(na, nb))
        for (a, na, ba), (b, nb, bb) in itertools.combinations(rows, 2)
        if ba == bb and lev(na, nb) <= max_dist
    )
    assert got == want


@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=3, max_size=20), min_size=2, max_size=8
    ),
    parts=st.integers(min_value=1, max_value=8),
)
@SETTINGS
def test_perplexity_invariant_to_partitioning(spark, texts, parts):
    # the decimal log-sum contract: per-doc perplexity must not depend
    # on physical row order or partition count (order-independent sums)
    from kafka_dbsync_spark.operators.corpus import bigram_lm_perplexity

    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    base = sorted(map(tuple, bigram_lm_perplexity(docs).collect()))
    shuffled = sorted(
        map(tuple, bigram_lm_perplexity(docs.repartition(parts)).collect())
    )
    assert base == shuffled


def test_weighted_sample_topk_matches_direct_recomputation(spark):
    """The ES selection must equal a driver-side recomputation of
    ln(u)/w from the same md5-derived uniforms (exactness), k > n keeps
    every positive-weight row, non-positive weights never qualify."""
    import hashlib
    import math

    from kafka_dbsync_spark.operators.sampling import weighted_sample_topk

    rows = [(i, (i * 37) % 11 + 1) for i in range(40)] + [(100, 0), (101, -5)]
    df = spark.createDataFrame(rows, "id long, w long")

    def key(i, w):
        hv = int(hashlib.md5(f":{i}".encode()).hexdigest()[:8], 16)
        return math.log((hv + 1) / 2**32) / w

    want = sorted(
        ((i, w) for i, w in rows if w > 0), key=lambda r: (-key(*r), r[0])
    )[:10]
    got = weighted_sample_topk(df, "id", "w", k=10).collect()
    assert [(r["id"], r["w"]) for r in got] == want
    for r in got:
        assert r["es_key"] == round(key(r["id"], r["w"]), 6)
    # k > n: every positive-weight row, none of the non-positive ones
    all_got = {r["id"] for r in weighted_sample_topk(df, "id", "w", k=999).collect()}
    assert all_got == {i for i, w in rows if w > 0}


def test_weighted_sample_topk_k_validation(spark):
    import pytest

    from kafka_dbsync_spark.operators.sampling import weighted_sample_topk

    df = spark.createDataFrame([(1, 2)], "id long, w long")
    with pytest.raises(ValueError, match="k must be positive"):
        weighted_sample_topk(df, "id", "w", k=0)


def test_weighted_sample_per_group_matches_direct_recomputation(spark):
    """Per-group ES sample: exactly the k largest keys within each
    group, ranks correct, zero-weight rows never qualify."""
    import hashlib
    import math

    from kafka_dbsync_spark.operators.sampling import weighted_sample_per_group

    rows = [(i, "g" + str(i % 3), (i * 17) % 7 + 1) for i in range(30)]
    rows += [(100, "g0", 0)]
    df = spark.createDataFrame(rows, "id long, grp string, w long")

    def key(i, w):
        hv = int(hashlib.md5(f":{i}".encode()).hexdigest()[:8], 16)
        return math.log((hv + 1) / 2**32) / w

    want = {}
    for g in ("g0", "g1", "g2"):
        members = sorted(
            ((i, w) for i, g2, w in rows if g2 == g and w > 0),
            key=lambda r: (-key(*r), r[0]),
        )[:4]
        want[g] = [(i, rk + 1) for rk, (i, _) in enumerate(members)]
    got = weighted_sample_per_group(df, "grp", "id", "w", k=4).collect()
    by_group = {}
    for r in got:
        by_group.setdefault(r["grp"], []).append((r["id"], r["rk"]))
    assert {g: sorted(v, key=lambda x: x[1]) for g, v in by_group.items()} == want
    import pytest

    with pytest.raises(ValueError, match="k must be positive"):
        weighted_sample_per_group(df, "grp", "id", "w", k=-1)


@given(
    docs=st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=1, max_size=7),
        min_size=2,
        max_size=10,
    ),
    threshold=st.sampled_from([0.34, 0.5, 0.75, 1.0]),
)
@SETTINGS
def test_setsim_prefix_join_complete_on_random_corpora(spark, docs, threshold):
    """Randomized completeness: on tiny-vocab corpora (maximal shingle
    collisions, verbatim clones likely) the prefix-filtered join must
    equal brute-force all-pairs Jaccard at every threshold — the
    prefix, positional, length, and clone-collapse optimizations may
    only prune work, never pairs."""
    from kafka_dbsync_spark.operators.dedup import (
        jaccard_pairs,
        setsim_prefix_join,
    )

    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        map(
            tuple,
            setsim_prefix_join(df, "doc_id", "text", 3, threshold).collect(),
        )
    )
    all_pairs = spark.createDataFrame(
        [(a, b) for a, _ in rows for b, _ in rows if a < b],
        "id_a long, id_b long",
    )
    want = sorted(
        map(
            tuple,
            jaccard_pairs(df, all_pairs, "doc_id", "text", 3, threshold).collect(),
        )
    )
    assert got == want


_BM25_WORDS = ["hash", "join", "merge", "scan", "sort", "agg"]


@given(
    texts=st.lists(
        st.lists(st.sampled_from(_BM25_WORDS), min_size=0, max_size=12).map(
            " ".join
        ),
        min_size=1,
        max_size=15,
    ),
    terms=st.lists(
        st.sampled_from(_BM25_WORDS + ["zzz_absent"]),
        min_size=1,
        max_size=3,
        unique=True,
    ),
)
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_bm25_index_serve_equals_corpus_rescan(spark, texts, terms):
    """THE invariant of the persisted text index: for ANY corpus and
    ANY term bag, answering from the frozen postings must be
    bit-identical to rescanning the corpus — stats from the marker,
    df from the index, the same literal Okapi tree."""
    import shutil
    import tempfile

    from kafka_dbsync_spark.operators.bm25_index import (
        bm25_search_served,
        build_bm25_index,
    )
    from kafka_dbsync_spark.operators.corpus import bm25_topk

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    path = tempfile.mkdtemp(prefix="kds_prop_bm25_")
    try:
        build_bm25_index(spark, docs, path)
        inline = [
            tuple(r) for r in bm25_topk(docs, terms, k=10).collect()
        ]
        served = [
            tuple(r)
            for r in bm25_search_served(spark, path, terms, k=10).collect()
        ]
        assert served == inline
    finally:
        shutil.rmtree(path, ignore_errors=True)
