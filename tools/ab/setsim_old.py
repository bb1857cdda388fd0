"""Frozen r13 (string-verifier) setsim_prefix_join for interleaved A/B.
Not part of the package: imported only by tools/ab scripts."""
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from kafka_dbsync_spark.operators.dedup import with_shingles

def setsim_prefix_join_OLD(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """EXACT set-similarity self-join via prefix filtering (the
    SSJoin/PPJoin family: Chaudhuri et al. 2006, Xiao et al. 2011):
    every pair of documents whose k-gram shingle sets have Jaccard >=
    ``threshold`` — with a COMPLETENESS guarantee the MinHash-LSH path
    deliberately trades away (LSH misses pairs with band-collision
    probability < 1).

    Prefix filter: order the shingle universe by (document frequency
    asc, shingle asc) — a total order that puts the rarest shingles
    first — and keep each document's first ``|s| - ceil(t*|s|) + 1``
    shingles under that order. Completeness: J >= t gives
    |A inter B| >= ceil(t*max(|A|,|B|)) = a; if the prefixes were
    disjoint then (taking x = max of A's prefix <= y = max of B's
    prefix) any intersection element <= x would sit in both prefixes,
    so the whole intersection lies in A's (a-1)-element suffix — a
    contradiction. So the candidate equi-join on prefix shingles
    finds every qualifying pair; a length filter
    (t*|b| <= |a| for |a| <= |b|) prunes further, and the exact
    verifier keeps only true pairs.

    Scale: the shingle stream shuffles twice (df counts, per-doc prefix
    assembly); candidates join on PREFIX shingles only — the rarest per
    doc, so bucket sizes stay near 1 even when the corpus shares a head
    vocabulary (joining on ALL shingles would square the head bucket).
    PPJoin's POSITIONAL filter then prunes near-threshold non-pairs
    before verification: a shared prefix element at sorted position
    (pa, pb) bounds the overlap by 1 + min(|A|-pa, |B|-pb), and
    J >= t needs overlap >= t/(1+t)*(|A|+|B|); rows under the bound
    are dropped. Complete, because a qualifying pair's FIRST shared
    prefix element has no shared elements before it, so the bound is
    tight there and that row always survives. Every filter (length,
    prefix slice, positional) runs in EXACT integer basis-point
    arithmetic against the same ``tbp = int(threshold * 10000)``
    contract the verifier enforces — no float threshold ever touches
    a pruning comparison, so a pair exactly at the bp boundary can
    never be pruned by a filter yet accepted by the verifier (the
    double for e.g. 0.34 rounds UP, so ``t * s`` float arithmetic
    would over-prune). The per-doc prefix sort is a narrow
    ``sort_array`` over that document's own shingles; verification is
    one vectorized Arrow pass over pair-scoped shingle arrays
    (``_pair_jaccard_batches`` — exact, batch-local dictionary
    encoding, no row-at-a-time Python).

    CLONE COLLAPSE — the clone-heavy-corpus guard: documents with
    IDENTICAL shingle sets first collapse to one representative
    (md5-of-sorted-set groupBy, the same digest-equality contract as
    dedup_exact), the pairwise machinery runs on representatives only,
    and member pairs expand back through flat joins at the end (every
    intra-clone pair has Jaccard exactly 1; every cross-clone pair
    shares its representatives' score). Web crawls ARE clone-heavy —
    boilerplate and mirrored pages form clone groups of thousands, and
    without the collapse each group of size m inflates every candidate
    bucket m-fold (m² pair rows before verification). Measured: the
    10x-replicated bench corpus (every doc 10 verbatim copies) went
    203 s -> seconds at sf1 with identical output.

    Honest bound: an EXACT join is still output-bound — k mutual
    near-dups have k(k-1)/2 TRUE pairs and every complete algorithm
    must emit them. When only cluster membership is needed downstream,
    feed these pairs to connected_components instead of materializing
    the full pair list.
    """
    if not 0 < threshold <= 1:
        raise ValueError(f"threshold must be in (0, 1] (got {threshold})")
    # the ONE threshold contract, shared by every filter and the
    # verifier: Jaccard qualifies iff floor(inter*1e4/union) >= tbp
    tbp = int(threshold * 10000)
    # the per-doc shingle-set table feeds everything downstream —
    # materialize it once (eager localCheckpoint, the in-session
    # stand-in for the shingle table a 100 TB deployment writes once)
    # and let each consumer re-derive its explode narrowly from it
    # NULL-text docs shingle to [NULL]: a NULL join key can never
    # match, so they pair with nothing — but concat_ws SKIPS nulls,
    # which would clone-group them with EMPTY-text docs ([''])
    # under md5(""). Drop them at the SOURCE (pushes to the scan; an
    # exists() filter on the shingle array instead gets pushed below
    # the projection and re-evaluates the whole shingle transform
    # per row — measured 9x the cost).
    all_sh = (
        with_shingles(df.filter(F.col(text_col).isNotNull()), text_col, k)
        .select(
            F.col(id_col),
            F.array_distinct("shingles").alias("sh"),
        )
        .withColumn("sk", F.md5(F.concat_ws("\x1f", F.sort_array("sh"))))
        .localCheckpoint(eager=True)
    )
    members = all_sh.select(id_col, "sk")
    # adaptive: one cheap aggregate over the checkpointed table decides
    # whether any clones exist at all — a clone-free corpus (the common
    # case once upstream exact-dedup ran) skips the representative
    # shuffle, the second checkpoint, AND the member-expansion joins
    stats = all_sh.agg(
        F.count("*").alias("n"), F.countDistinct("sk").alias("ns")
    ).collect()[0]
    has_clones = stats["n"] != stats["ns"]
    if has_clones:
        # one representative per identical-set group (any member's sh
        # IS the set); checkpointed too — four downstream consumers
        sh = (
            all_sh.groupBy("sk")
            .agg(F.min(id_col).alias(id_col), F.first("sh").alias("sh"))
            .localCheckpoint(eager=True)
        )
    else:
        sh = all_sh  # every doc is its own representative
    # The candidate machinery never needs the shingle STRINGS — only a
    # consistent total order and an equality key (verification is exact
    # on the full arrays below). Run it on a 128-bit hash of g (two
    # independently-seeded xxhash64 halves): 16-byte keys through every
    # exchange/sort/join instead of ~25-byte strings (guide §2.3
    # "shuffle keys and metadata instead of payloads"; measured
    # candidate stage 2.08 → 1.38 s at sf0.1). Completeness: df-counts
    # and the order are keyed by the SAME deterministic function of g
    # for every doc, so (df(h), h) is a consistent total order, and
    # equal g ⇒ equal h always holds — the prefix pigeonhole argument
    # is unchanged. Distinct shingles sharing h would merge a key;
    # 128 bits puts that in the same collision class as the md5
    # digest-equality contract the clone collapse above already
    # rests on (and anywhere it mattered, the exact verifier still
    # bounds the damage to candidate-set noise, never to a wrong
    # jaccard_bp).
    exploded = sh.select(
        id_col, F.size("sh").alias("s"), F.explode("sh").alias("g0")
    ).select(
        id_col,
        "s",
        F.struct(
            F.xxhash64("g0").alias("h1"),
            F.xxhash64(F.lit(1), "g0").alias("h2"),
        ).alias("g"),
    )
    dfreq = exploded.groupBy("g").agg(F.count("*").alias("df"))
    # per-doc prefix under the global (df, g) order: attach df, fold the
    # doc's shingles back together sorted, slice the prefix
    pref = (
        exploded.join(dfreq, "g")
        .groupBy(id_col, "s")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("df"), F.col("g")))
            ).alias("ordered")
        )
        .select(
            id_col,
            "s",
            F.posexplode(
                F.slice(
                    F.col("ordered.g"),
                    1,
                    # |s| - ceil(tbp*|s|/1e4) + 1, exact integer ceil:
                    # a qualifying pair has inter*1e4 >= tbp*union and
                    # union >= |s|, so inter >= ceil(tbp*|s|/1e4)
                    (
                        F.col("s")
                        - F.floor(
                            (F.col("s") * F.lit(tbp) + F.lit(9999))
                            / F.lit(10000)
                        )
                        + 1
                    ).cast("int"),
                )
            ).alias("p", "g"),
        )
        # 1-based position of the shingle in the doc's full sorted set
        .select(id_col, "s", (F.col("p") + 1).alias("p"), "g")
    )
    a = pref.select(
        F.col(id_col).alias("id_a"), F.col("s").alias("sa"), F.col("p").alias("pa"), "g"
    )
    b = pref.select(
        F.col(id_col).alias("id_b"), F.col("s").alias("sb"), F.col("p").alias("pb"), "g"
    )
    ubound = F.lit(1) + F.least(
        F.col("sa") - F.col("pa"), F.col("sb") - F.col("pb")
    )
    cand = (
        a.join(b, "g")
        .filter(F.col("id_a") < F.col("id_b"))
        # length filter in exact bp: qualifying forces
        # floor(min*1e4/max) >= tbp, i.e. min*1e4 >= tbp*max
        .filter(
            F.least("sa", "sb") * F.lit(10000)
            >= F.lit(tbp) * F.greatest("sa", "sb")
        )
        # positional filter in exact bp: inter*1e4 >= tbp*union with
        # union = sa+sb-inter gives inter*(1e4+tbp) >= tbp*(sa+sb);
        # a surviving pair needs the overlap upper bound to allow it
        .filter(
            ubound * F.lit(10000 + tbp)
            >= F.lit(tbp) * (F.col("sa") + F.col("sb"))
        )
        .select("id_a", "id_b")
        .distinct()
    )
    # exact verification on PAIR-SCOPED payloads (r13 opt, guide §8):
    # attach the two docs' full shingle arrays to each candidate pair
    # (two joins against the ≤corpus-sized set table) and count the
    # intersection in one Arrow pass (_pair_jaccard_batches). The old
    # equi-join verifier re-shuffled the exploded shingle stream twice
    # — Σ|A| rows PER candidate pair (34M rows at sf0.1) through an
    # exchange + hash aggregate; the arrays now ride the candidate
    # rows once and never explode.
    sh_sets = sh.select(F.col(id_col).alias("__sid"), "sh")
    pairs_in = (
        cand.join(
            sh_sets.select(
                F.col("__sid").alias("id_a"), F.col("sh").alias("sh_a")
            ),
            "id_a",
        )
        .join(
            sh_sets.select(
                F.col("__sid").alias("id_b"), F.col("sh").alias("sh_b")
            ),
            "id_b",
        )
        .select("id_a", "id_b", "sh_a", "sh_b")
    )
    id_type = dict(df.dtypes)[id_col]
    rep_pairs = pairs_in.mapInArrow(
        _pair_jaccard_batches(tbp),
        f"id_a {id_type}, id_b {id_type}, jaccard_bp bigint",
    )
    if not has_clones:
        return rep_pairs  # expansion would be the identity
    # expand representative pairs back to members, all flat joins:
    # (a) cross-clone pairs inherit their representatives' score;
    # (b) intra-clone pairs are identical sets -> Jaccard exactly 1,
    #     qualifying at any threshold <= 1
    rk = sh.select(F.col(id_col).alias("__rid"), "sk")
    cross = (
        rep_pairs.join(
            rk.select(F.col("__rid").alias("id_a"), F.col("sk").alias("sk_a")),
            "id_a",
        )
        .join(
            rk.select(F.col("__rid").alias("id_b"), F.col("sk").alias("sk_b")),
            "id_b",
        )
        .join(
            members.select(F.col("sk").alias("sk_a"), F.col(id_col).alias("ma")),
            "sk_a",
        )
        .join(
            members.select(F.col("sk").alias("sk_b"), F.col(id_col).alias("mb")),
            "sk_b",
        )
        .select(
            F.least("ma", "mb").alias("id_a"),
            F.greatest("ma", "mb").alias("id_b"),
            "jaccard_bp",
        )
    )
    m_a = members.select("sk", F.col(id_col).alias("id_a"))
    m_b = members.select("sk", F.col(id_col).alias("id_b"))
    intra = (
        m_a.join(m_b, "sk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.lit(10000).cast("bigint").alias("jaccard_bp"))
    )
    return cross.unionByName(intra)


def _pair_jaccard_batches(tbp: int):
    """mapInArrow kernel: exact Jaccard basis points per candidate pair
    from the two docs' full shingle arrays (r13 opt, guide §8: verify
    on pair-scoped payloads instead of re-shuffling the exploded
    shingle stream twice — the old equi-join verifier materialized
    Σ|A| rows per candidate pair and hash-aggregated them).

    Exactness: the batch's two flattened string columns are
    dictionary-encoded TOGETHER in one Arrow pass, so equal shingles
    share an int32 code and distinct shingles never collide — the same
    string-equality contract as the JVM join, no hashing across the
    boundary. Intersection counts come from one ``np.intersect1d``
    over (pair, code) composite keys; both sides are genuine sets
    (``array_distinct`` upstream), so ``assume_unique`` holds.
    ``jaccard_bp = floor(inter·1e4 / union)`` in int64 — the exact
    integer arithmetic of the JVM expression it replaces."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    def fn(batches):
        for b in batches:
            n = b.num_rows
            if n == 0:
                continue
            sa, sb = b.column("sh_a"), b.column("sh_b")
            la = np.asarray(pc.list_value_length(sa).fill_null(0))
            lb = np.asarray(pc.list_value_length(sb).fill_null(0))
            flat_a, flat_b = sa.flatten(), sb.flatten()
            enc = pa.concat_arrays([flat_a, flat_b]).dictionary_encode()
            codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            ca, cb = codes[: len(flat_a)], codes[len(flat_a):]
            pidx_a = np.repeat(np.arange(n, dtype=np.int64), la)
            pidx_b = np.repeat(np.arange(n, dtype=np.int64), lb)
            m = np.int64(len(enc.dictionary)) + 1
            # composite (pair, code) key fits int64: n ≤ Arrow batch
            # rows (10k default) and m ≤ the batch's flat lengths
            common = np.intersect1d(
                pidx_a * m + ca, pidx_b * m + cb, assume_unique=True
            )
            inter = np.bincount(common // m, minlength=n).astype(np.int64)
            union = la.astype(np.int64) + lb.astype(np.int64) - inter
            ok = union > 0
            jac = np.zeros(n, dtype=np.int64)
            np.floor_divide(inter * 10000, union, out=jac, where=ok)
            keep = pa.array(ok & (jac >= tbp))
            yield pa.RecordBatch.from_arrays(
                [
                    b.column("id_a").filter(keep),
                    b.column("id_b").filter(keep),
                    pa.array(jac, type=pa.int64()).filter(keep),
                ],
                names=["id_a", "id_b", "jaccard_bp"],
            )

    return fn
