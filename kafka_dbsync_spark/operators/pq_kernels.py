"""Vectorized Arrow/numpy kernels for the IVF/PQ family (r13 opt).

The IVF assignment, PQ encode, and ADC scoring expressions were JVM
higher-order functions (``aggregate``/``zip_with``/``transform``).
HOFs are CodegenFallback in Spark 4 — every per-element lambda step
runs interpreted, so assigning a row costs B·D interpreted ops and
encoding costs n_sub·k·d_sub (guide §4.2: hand whole batches to
vectorized native code instead). These kernels compute the same values
in numpy over Arrow batches, with the arithmetic contract preserved
bit-for-bit:

- squared-L2 folds accumulate LEFT-TO-RIGHT over dims (``acc + t_i``
  in index order) exactly like the JVM ``F.aggregate`` fold — numpy
  vectorizes across ROWS while looping dims sequentially, so each
  row's IEEE-754 op order is unchanged;
- ``F.round(double, s)`` is Spark's
  ``BigDecimal.valueOf(x).setScale(s, HALF_UP).toDouble()``:
  replicated by :func:`spark_round` — a vectorized half-up on
  ``|x|·10^s`` with an exact ``Decimal(repr(x))`` re-check inside a
  suspect band around the .5 boundary (the binary product can disagree
  with the decimal digits only there; verified against Spark on 160k
  adversarial values, 0 mismatches — and the exact path is the same
  Decimal(repr) rule ``select_probe_cells`` already relies on);
- argmin ties break to the LOWEST code/cell: entries arrive sorted
  ascending and ``np.argmin`` returns the first minimum, matching the
  JVM ``array_min`` over ``struct(dist, id)``;
- ADC scoring uses the FAISS precomputed-table trick: the per-subspace
  term depends only on (query, m, code), never on the row, so the
  n_sub×k table is computed ONCE driver-side in plain Python floats
  (same IEEE ops, Decimal half-up round) and each row is a table
  gather + a sequential n_sub-term sum. The JVM expression computed
  the identical value per row from scratch.

Degenerate rows (NULL vector, length ≠ the expected dim) reproduce the
JVM null semantics: ``zip_with`` pads the shorter side with nulls, so
the fold yields a NULL distance and ``array_min`` ties every entry on
(NULL, id) — i.e. the LOWEST cell/code wins with a NULL distance.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import numpy as np

__all__ = [
    "spark_round",
    "round_half_up_py",
    "collect_books",
    "collect_cents",
    "adc_lut",
    "seq_sq_l2",
]


def round_half_up_py(v: float, nd: int) -> float:
    """Exact Spark Round(double, nd): Decimal(shortest-repr) half-up.
    ``repr(float)`` and JVM ``Double.toString`` both emit the shortest
    decimal that round-trips, so they denote the same decimal value."""
    if v != v or v in (float("inf"), float("-inf")):
        return v
    return float(
        Decimal(repr(v)).quantize(Decimal(1).scaleb(-nd), rounding=ROUND_HALF_UP)
    )


def spark_round(xs: np.ndarray, scale: int) -> np.ndarray:
    """Vectorized Spark-compatible Round over a float64 array. NaN/inf
    pass through (Spark's Round on non-finite doubles is identity)."""
    p = float(10**scale)
    ax = np.abs(xs)
    r = ax * p
    f = np.floor(r)
    frac = r - f
    n = np.where(frac >= 0.5, f + 1.0, f)
    out = np.where(np.signbit(xs), -(n / p), n / p)
    finite = np.isfinite(xs)
    # suspect band: binary r may disagree with the decimal digits about
    # the .5 comparison only within the product's rounding error
    tol = np.maximum(np.abs(r) * 1e-12, 1e-9)
    suspect = finite & (np.abs(frac - 0.5) <= tol)
    for i in np.flatnonzero(suspect):
        out[i] = round_half_up_py(float(xs[i]), scale)
    out[~finite] = xs[~finite]
    return out


def seq_sq_l2(x: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Σ (x_i - c_i)² accumulated sequentially over dims (axis 1 of
    ``x``), vectorized over rows — the JVM left fold's op order."""
    acc = np.zeros(x.shape[0], dtype=np.float64)
    for i in range(c.shape[0]):
        d = x[:, i] - c[i]
        acc = acc + d * d
    return acc


def collect_books(codebooks_long) -> list[tuple[int, list[tuple[int, list[float]]]]]:
    """Collect long-format codebooks (m, code, dim, cw) into
    ``[(m, [(code, cvec)])]``, m and codes ascending, cvec in dim
    order. Codebooks are index metadata (n_sub×k×d_sub doubles), the
    same object ``codebooks_as_array`` collapsed to one broadcast row."""
    books: dict[int, dict[int, dict[int, float]]] = {}
    for r in codebooks_long.select("m", "code", "dim", "cw").collect():
        books.setdefault(int(r["m"]), {}).setdefault(int(r["code"]), {})[
            int(r["dim"])
        ] = float(r["cw"])
    return [
        (
            m,
            [
                (code, [entries[code][d] for d in sorted(entries[code])])
                for code in sorted(entries)
            ],
        )
        for m, entries in sorted(books.items())
    ]


def collect_cents(centroids_long, cell_col="label", dim_col="dim", val_col="centroid"):
    """Driver-side (cell, cvec) pairs, cells/dims ascending — delegates
    to similarity.centroid_arrays (one collect of B×dim metadata)."""
    from kafka_dbsync_spark.operators.similarity import centroid_arrays

    return centroid_arrays(centroids_long, cell_col, dim_col, val_col)


def adc_lut(
    books: list[tuple[int, list[tuple[int, list[float]]]]],
    query: list[float],
    d_sub: int,
    dist_decimals: int,
) -> tuple[list[np.ndarray], list[np.ndarray]]:
    """FAISS-style precomputed ADC table for one query vector: per
    subspace m an array indexed BY CODE holding
    ``round(Σ_seq (q_sub_i − cw_i)², dist_decimals)`` — plain Python
    floats (identical IEEE op order to the JVM per-row fold) with the
    exact Decimal half-up round. Returns (tables, valid-masks): a hole
    (untrained code, or a codeword whose length ≠ the query slice — the
    JVM ``zip_with`` pad) is invalid, and the JVM's NULL term nulls the
    whole row sum; a genuine NaN from NaN inputs stays a VALUE and
    propagates like the JVM NaN."""
    luts: list[np.ndarray] = []
    valids: list[np.ndarray] = []
    for m, entries in books:
        qsub = query[m * d_sub : m * d_sub + d_sub]
        size = (max(code for code, _ in entries) + 1) if entries else 0
        arr = np.zeros(size, dtype=np.float64)
        ok = np.zeros(size, dtype=bool)
        for code, cvec in entries:
            if len(qsub) != len(cvec):
                continue  # JVM zip_with pads → NULL term (stays a hole)
            acc = 0.0
            for qi, ci in zip(qsub, cvec):
                d = qi - ci
                acc = acc + d * d
            arr[code] = round_half_up_py(acc, dist_decimals)
            ok[code] = True
        luts.append(arr)
        valids.append(ok)
    return luts, valids


def list_column_matrix(col, n_rows: int):
    """An Arrow list column → (values float64 matrix padded to the max
    length, per-row lengths, null mask). Rows are regular in practice
    (the embedding tables are fixed-dim); the pad only feeds rows whose
    degenerate (length-mismatch) results are overridden afterwards."""
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    nulls = np.asarray(col.is_null())
    lengths = np.zeros(n_rows, dtype=np.int64)
    valid = ~nulls
    if valid.any():
        ll = np.asarray(col.value_lengths().fill_null(0), dtype=np.int64)
        lengths = ll
    flat = col.flatten()  # nulls contribute nothing; offsets align below
    vals = np.asarray(flat, dtype=np.float64)
    maxlen = int(lengths.max()) if n_rows else 0
    mat = np.zeros((n_rows, maxlen), dtype=np.float64)
    starts = np.cumsum(lengths) - lengths
    # scatter each row's slice; vectorized via a flat index map
    if maxlen and len(vals):
        row_idx = np.repeat(np.arange(n_rows), lengths)
        col_idx = np.arange(len(vals)) - np.repeat(starts, lengths)
        mat[row_idx, col_idx] = vals
    return mat, lengths, nulls


def assign_cells(
    mat: np.ndarray,
    lengths: np.ndarray,
    nulls: np.ndarray,
    cents: list[tuple[int, list[float]]],
    dist_decimals: int,
):
    """Nearest-centroid assignment over a batch: returns (cell int64,
    dist float64 with NaN for the JVM-NULL degenerate rows). The dim
    loop is OUTER with cells broadcast, so the work is D numpy ops over
    a (B, n) matrix — per (cell, row) the accumulation order is still
    the sequential left fold."""
    n = mat.shape[0]
    cell_ids = np.asarray([c for c, _ in cents], dtype=np.int64)
    dims = {len(v) for _, v in cents}
    if len(dims) != 1:
        raise ValueError(f"centroid vectors must share one dim (got {sorted(dims)})")
    d = dims.pop()
    cmat = np.asarray([v for _, v in cents], dtype=np.float64)  # (B, d)
    if mat.shape[1] >= d:
        x = mat[:, :d]
    else:
        x = np.zeros((n, d), dtype=np.float64)
        x[:, : mat.shape[1]] = mat
    acc = np.zeros((len(cents), n), dtype=np.float64)
    for i in range(d):
        diff = x[:, i][None, :] - cmat[:, i][:, None]
        acc += diff * diff
    dists = spark_round(acc.ravel(), dist_decimals).reshape(acc.shape)
    # NaN distances: JVM NaN sorts GREATER than any double, so a NaN
    # entry never beats a finite one; all-NaN ties to the lowest cell.
    order_key = np.where(np.isnan(dists), np.inf, dists)
    win = np.argmin(order_key, axis=0)
    cell = cell_ids[win]
    dist = dists[win, np.arange(n)]
    bad = nulls | (lengths != d)
    if bad.any():
        # zip_with pads → NULL dist for every entry → min ties on
        # (NULL, cell) → lowest cell wins, NULL dist
        cell[bad] = cell_ids.min() if len(cell_ids) else 0
        dist[bad] = np.nan
    return cell, dist


def encode_codes(
    mat: np.ndarray,
    lengths: np.ndarray,
    nulls: np.ndarray,
    books: list[tuple[int, list[tuple[int, list[float]]]]],
    d_sub: int,
    dist_decimals: int,
) -> np.ndarray:
    """PQ encode over a batch: per subspace the rounded seq-fold
    squared-L2 argmin (ties to the lowest code). Returns an int32
    matrix (n, n_sub). Degenerate rows/subspaces (vector too short or
    NULL) take the lowest code — the JVM (NULL, code) array_min tie."""
    n = mat.shape[0]
    out = np.empty((n, len(books)), dtype=np.int32)
    for mi, (m, entries) in enumerate(books):
        off = m * d_sub
        need = off + d_sub
        if mat.shape[1] < need:
            sub = np.zeros((n, d_sub), dtype=np.float64)
            sub[:, : max(0, mat.shape[1] - off)] = mat[:, off : mat.shape[1]]
        else:
            sub = mat[:, off:need]
        dists = np.empty((len(entries), n), dtype=np.float64)
        for j, (_, cvec) in enumerate(entries):
            dists[j] = spark_round(
                seq_sq_l2(sub, np.asarray(cvec, dtype=np.float64)), dist_decimals
            )
        key = np.where(np.isnan(dists), np.inf, dists)
        win = np.argmin(key, axis=0)
        codes = np.asarray([c for c, _ in entries], dtype=np.int32)
        col = codes[win]
        bad = nulls | (lengths < need)
        if bad.any():
            col[bad] = codes.min() if len(codes) else 0
        out[:, mi] = col
    return out


def adc_scores(
    codes_mat: np.ndarray,
    code_nulls: np.ndarray,
    luts: list[np.ndarray],
    valids: list[np.ndarray],
    out_decimals: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Row ADC totals from a precomputed table: sequential sum over
    subspaces of ``lut[m][code_m]`` then the outer Spark round. Returns
    (scores, null-mask): a row is NULL when any of its codes misses the
    table (the JVM's NULL term → NULL sum), or the codes array itself
    is NULL/misshapen; genuine NaN values propagate as NaN."""
    n = codes_mat.shape[0]
    acc = np.zeros(n, dtype=np.float64)
    is_null = code_nulls.copy()
    for m, lut in enumerate(luts):
        cm = np.clip(codes_mat[:, m], 0, max(len(lut) - 1, 0))
        in_range = (codes_mat[:, m] >= 0) & (codes_mat[:, m] < len(lut))
        if len(lut):
            term = lut[cm]
            is_null |= ~in_range | ~valids[m][cm]
        else:
            term = np.zeros(n, dtype=np.float64)
            is_null |= True
        acc = acc + term
    return spark_round(acc, out_decimals), is_null


def adc_score_frame(
    df,
    id_col: str,
    keep_cols: tuple,
    out_decimals: int,
    *,
    luts=None,
    cell_luts=None,
    cell_queries=None,
    cell_col: str = "centroid_id",
):
    """ADC-score a codes-carrying DataFrame in one ``mapInArrow`` pass.

    Exactly one of:
    - ``luts=(tables, valids)`` — one query over every row
      (output: id, keeps, adc_dist);
    - ``cell_luts={cell: (tables, valids)}`` — one query, per-cell
      residual tables chosen by ``cell_col``
      (output: id, keeps, centroid_id bigint, adc_dist);
    - ``cell_queries={cell: [(query_id, (tables, valids))]}`` — batched
      queries: each row is emitted once per query probing its cell,
      replacing the broadcast (query, cell)-residual join
      (output: query_id bigint, id, keeps, centroid_id bigint,
      adc_dist).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    in_cols = [id_col, *keep_cols, "codes"]
    if cell_luts is not None or cell_queries is not None:
        in_cols.append(cell_col)
    src = df.select(*[F.col(c) for c in in_cols])
    pass_names = [id_col, *keep_cols]
    n_sub = len(
        luts[0]
        if luts is not None
        else next(iter((cell_luts or cell_queries).values()))[0]
        if cell_luts is not None
        else next(iter(cell_queries.values()))[0][1][0]
    )
    fields = [src.schema[c] for c in pass_names]
    out_names = list(pass_names)
    if cell_queries is not None:
        fields = [StructField("query_id", LongType())] + fields
        out_names = ["query_id"] + out_names
    if cell_luts is not None or cell_queries is not None:
        fields.append(StructField(cell_col, LongType()))
        out_names.append(cell_col)
    fields.append(StructField("adc_dist", DoubleType()))
    out_names.append("adc_dist")
    schema = StructType(fields)

    def _fn(it):
        import pyarrow as pa

        for batch in it:
            n = batch.num_rows
            if not n:
                continue
            codes_mat, bad = codes_column_matrix(batch.column("codes"), n, n_sub)
            passthrough = [batch.column(c) for c in pass_names]
            if luts is not None:
                scores, nulls = adc_scores(codes_mat, bad, luts[0], luts[1], out_decimals)
                yield pa.RecordBatch.from_arrays(
                    passthrough + [pa.array(scores, type=pa.float64(), mask=nulls)],
                    names=out_names,
                )
                continue
            cells = np.asarray(batch.column(cell_col).cast(pa.int64()))
            if cell_luts is not None:
                scores = np.zeros(n, dtype=np.float64)
                nulls = np.ones(n, dtype=bool)
                for cid in np.unique(cells):
                    lv = cell_luts.get(int(cid))
                    sel = cells == cid
                    if lv is None:
                        continue  # unprobed cell: filtered upstream
                    s, nl = adc_scores(codes_mat[sel], bad[sel], lv[0], lv[1], out_decimals)
                    scores[sel] = s
                    nulls[sel] = nl
                yield pa.RecordBatch.from_arrays(
                    passthrough
                    + [
                        pa.array(cells, type=pa.int64()),
                        pa.array(scores, type=pa.float64(), mask=nulls),
                    ],
                    names=out_names,
                )
                continue
            # multi-query: one output chunk per (cell, query)
            for cid in np.unique(cells):
                qlist = cell_queries.get(int(cid), [])
                sel = np.flatnonzero(cells == cid)
                if not len(sel) or not qlist:
                    continue
                take = pa.array(sel, type=pa.int64())
                sub_codes = codes_mat[sel]
                sub_bad = bad[sel]
                for qid, lv in qlist:
                    s, nl = adc_scores(sub_codes, sub_bad, lv[0], lv[1], out_decimals)
                    yield pa.RecordBatch.from_arrays(
                        [pa.array(np.full(len(sel), qid), type=pa.int64())]
                        + [c.take(take) for c in passthrough]
                        + [
                            pa.array(cells[sel], type=pa.int64()),
                            pa.array(s, type=pa.float64(), mask=nl),
                        ],
                        names=out_names,
                    )

    return src.mapInArrow(_fn, schema)


def codes_column_matrix(col, n_rows: int, n_sub: int):
    """Arrow list<int> codes column → (int64 matrix (n, n_sub), null
    mask for rows that are NULL or not exactly n_sub long)."""
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    nulls = np.asarray(col.is_null())
    lengths = np.asarray(col.value_lengths().fill_null(0), dtype=np.int64)
    vals = np.asarray(col.flatten(), dtype=np.int64)
    bad = nulls | (lengths != n_sub)
    mat = np.zeros((n_rows, n_sub), dtype=np.int64)
    good = ~bad
    if good.any():
        starts = np.cumsum(lengths) - lengths
        idx = starts[good][:, None] + np.arange(n_sub)[None, :]
        mat[good] = vals[idx]
    return mat, bad
