"""The Spark extraction pipeline: documents -> ordered out_spans.

Stage plan (explicit shuffle boundaries, SURVEY.md §3.1 lifecycle):

  scan (nested documents table; column-pruned: media payloads never read)
    -> wide-keyspace repartition on xxhash64(doc_id); heavy-tail salting
       is OPT-IN (r6: on a shared-bandwidth box spreading the
       bandwidth-bound heavy kernels costs more than it saves — see
       salted_repartition; AQE skew handling does not apply to UDF
       stages either way)
    -> flatten (posexplode, narrow — preserves partitioning)
    -> sortWithinPartitions(doc_id, offset)  (no shuffle; canonical
       order -> bitwise-deterministic output)
    -> mapInArrow(layout kernel)             (docs are contiguous runs
       within a partition; incomplete tail docs carry over between
       batches — no per-group overhead the way applyInPandas would
       impose at 10^12 docs; numerics reach numpy zero-copy, payload
       strings are permuted C++-side and never materialize in Python)
    -> sink (nested or flat rows; strategy='join' keeps payload out of
       the kernel stage entirely and joins it back JVM-side)

The kernel itself is eynollah_spark.kernels.layout.layout_document —
see that module for reference-semantics citations.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from eynollah_spark.kernels.layout import DocSpans, layout_document, layout_permutation
from eynollah_spark.schemas import FLAT_OUT_SCHEMA, OUT_SCHEMA

HEAVY_QUANTILE = 0.99
#: Static heavy-doc span-count threshold for OPT-IN salting (r6: the
#: default is no salting, see salted_repartition). A full
#: ``approx_percentile`` pre-scan costs an extra pass over the input at
#: every invocation — at 100 TB that is an extra table read, so the
#: opt-in static cutoff is preferred over the sampled 'auto' path.
DEFAULT_HEAVY_THRESHOLD = 4096
_HEAVY_SAMPLE_FRACTION = 0.02


def salted_repartition(df: DataFrame, partitions: int, heavy_quantile: float = HEAVY_QUANTILE,
                       heavy_threshold: int | str | None = None) -> DataFrame:
    """Repartition documents by xxhash64(doc_id) over a wide bucket
    keyspace; OPTIONALLY route the media-heavy tail (span count above
    heavy_threshold) through an independent hash space (SURVEY.md §4
    'salted repartition'; replaces the reference's fork-pool page
    scheduling, eynollah.py:1994-2032).

    heavy_threshold: None = salting OFF (r6 DEFAULT, VERDICT r5 item 2):
    on the recorded skew bench the salted variant consistently burned
    ~20% more executor CPU than unsalted at identical per-partition
    balance — the heavy docs' kernel is memory-bandwidth-bound, and
    SPREADING them raises the number of heavy kernels running
    concurrently on one box, so every one of them slows down (the same
    shared-bandwidth ceiling the e2e control hits). The r5 chunked-CC
    kernel fix removed the superlinear pathology salting was defending
    against, so the dense-tail default is plain wide-keyspace hashing.
    int = static cutoff, opt in for sparse CLUMPED tails on multi-node
    clusters where each node brings its own bandwidth; 'auto' = estimate
    the p-`heavy_quantile` cutoff from a small TABLESAMPLE (reads a
    fraction of the input, never a full extra pass)."""
    if heavy_threshold is None:
        width = 64 * partitions
        return df.repartition(
            2 * partitions,
            F.pmod(F.xxhash64("doc_id"), F.lit(width)).cast("int"))
    df = df.withColumn("_n", F.size("spans"))
    if heavy_threshold == "auto":
        thr = (
            df.sample(fraction=_HEAVY_SAMPLE_FRACTION, seed=7)
            .selectExpr(f"approx_percentile(_n, {heavy_quantile}) AS t")
            .first()["t"]
        )
        heavy_threshold = int(thr if thr is not None else 1 << 30)
    # ONE scan, ONE exchange (r5; was two filter branches + union, which
    # scanned the input twice). r6 (ADVICE r5 / guide §2.5): bucket ids
    # span a keyspace 64x wider than the partition count — the r5 form
    # hashed `partitions` distinct ids into 2*partitions partitions, so
    # by balls-in-bins ~1/e of partitions stayed EMPTY and colliding ids
    # stacked (measured on the 1%-heavy-tail bench corpus: 100/256
    # partitions non-empty, max/mean span load 11.6 unsalted / 8.1
    # salted — the salted default LOST to unsalted in wall clock, r5
    # skew artifact). With 64x ids every partition fills and max/mean
    # drops to 6.7 unsalted / 4.6 salted. Heavy docs still draw from an
    # independent hash (seed 1) in their own id range, so a clump of
    # heavy docs that collides under the light hash cannot also collide
    # under the heavy one; partitions are mixed heavy+light, and the
    # balance comes from the id spread, not from heavy isolation.
    width = 64 * partitions
    bucket = F.when(
        F.col("_n") > heavy_threshold,
        F.lit(width) + F.pmod(F.xxhash64("doc_id", F.lit(1)), F.lit(width)),
    ).otherwise(F.pmod(F.xxhash64("doc_id"), F.lit(width))).cast("int")
    return (df.withColumn("_b", bucket)
            .repartition(2 * partitions, F.col("_b"))
            .drop("_n", "_b"))


def filter_printspace(flat: DataFrame, frame=None,
                      margin_frac: float = 0.02,
                      keep_null_spans: bool = False) -> DataFrame:
    """B9 page-frame / printspace filter (extract_text_regions page-frame
    model + crop, eynollah.py:318-401): drop spans whose center falls
    outside the printspace box. `frame` is (x0, x1, y0, y1) absolute, or
    None to derive it per page from the page dims shrunk by margin_frac
    (the model-free default). Pure column predicates — evaluated inside
    the scan stage's codegen filter, no shuffle, no Python."""
    cx = (F.col("x0") + F.col("x1")) / 2
    cy = (F.col("y0") + F.col("y1")) / 2
    if frame is not None:
        fx0, fx1, fy0, fy1 = (F.lit(float(v)) for v in frame)
    else:
        fx0 = margin_frac * F.col("width")
        fx1 = (1 - margin_frac) * F.col("width")
        fy0 = margin_frac * F.col("height")
        fy1 = (1 - margin_frac) * F.col("height")
    keep = (cx >= fx0) & (cx <= fx1) & (cy >= fy0) & (cy <= fy1)
    if not keep_null_spans:
        return flat.filter(keep)
    # posexplode_outer null-span rows (empty documents) must survive so
    # nested mode still emits their empty out_spans row — and (ADVICE r4)
    # a document whose EVERY span fell outside the printspace must not
    # vanish either: it re-enters as one synthetic null-span row,
    # preserving the one-row-per-doc contract resume/count logic relies
    # on. The re-emit costs one per-doc distinct + anti-join on doc_id —
    # keyed shuffles only, and only on the keep_null_spans path.
    kept = flat.filter(F.col("kind").isNull() | keep)
    span_cols = {"kind", "text", "media_ref", "offset", "x0", "x1", "y0", "y1"}
    lost = (flat.join(kept.select("doc_id").distinct(), "doc_id", "left_anti")
            .dropDuplicates(["doc_id"])
            .select(*[
                F.lit(None).cast(flat.schema[c].dataType).alias(c)
                if c in span_cols else F.col(c)
                for c in flat.columns
            ]))
    return kept.unionByName(lost)


def flatten(df: DataFrame) -> DataFrame:
    """Nested documents -> one row per span (narrow op). Keeps doc meta on
    every row; empty documents keep a single null-span row
    (posexplode_outer) so they still emit an empty out_spans row."""
    return df.select(
        "doc_id",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.coalesce(F.col("meta.rtl"), F.lit(False)).alias("rtl"),
        F.posexplode_outer(F.arrays_zip("spans", "geom")).alias("_i", "z"),
    ).select(
        "doc_id", "width", "height", "rtl",
        F.col("z.spans.kind").alias("kind"),
        F.col("z.spans.text").alias("text"),
        F.col("z.spans.media_ref").alias("media_ref"),
        F.col("z.spans.offset").alias("offset"),
        F.col("z.geom.x0").alias("x0"),
        F.col("z.geom.x1").alias("x1"),
        F.col("z.geom.y0").alias("y0"),
        F.col("z.geom.y1").alias("y1"),
    )


def _batch_cols(pdf: pd.DataFrame) -> dict[str, np.ndarray]:
    """One column->numpy extraction per Arrow batch (the per-doc loop then
    slices views — no pandas in the hot path)."""
    out = {}
    for c in ("doc_id", "kind", "text", "media_ref"):
        out[c] = pdf[c].to_numpy(dtype=object)
    for c in ("offset", "x0", "x1", "y0", "y1", "width", "height"):
        out[c] = pdf[c].to_numpy(dtype=np.float64, na_value=np.nan)
    out["rtl"] = pdf["rtl"].to_numpy()
    out["_valid"] = pdf["kind"].notna().to_numpy()
    return out


def _doc_spans(cols, s: int, e: int, ncl: int = 0, ncu: int = 0) -> DocSpans | None:
    valid = cols["_valid"][s:e]
    if not valid.all():
        if not valid.any():
            return None
        sl = np.flatnonzero(valid) + s
    else:
        sl = slice(s, e)
    return DocSpans(
        kind=cols["kind"][sl], text=cols["text"][sl], media_ref=cols["media_ref"][sl],
        offset=cols["offset"][sl].astype(np.int64),
        x0=cols["x0"][sl], x1=cols["x1"][sl], y0=cols["y0"][sl], y1=cols["y1"][sl],
        width=int(cols["width"][s]), height=int(cols["height"][s]),
        rtl=bool(cols["rtl"][s]), num_col_lower=ncl, num_col_upper=ncu,
    )


def make_kernel(nested: bool, fail_fast: bool = True,
                num_col_lower: int = 0, num_col_upper: int = 0):
    """Arrow-batch kernel: processes contiguous doc runs, carries the
    incomplete tail run to the next batch, emits ONE output frame per
    batch (never per doc). fail_fast=False quarantines per-document
    kernel failures (same degrade-and-continue as the arrow path)."""

    def _process(pdf: pd.DataFrame, acc_flat, acc_nested):
        cols = _batch_cols(pdf)
        ids = cols["doc_id"]
        change = np.flatnonzero(ids[1:] != ids[:-1]) + 1
        starts = np.concatenate(([0], change))
        for k in range(len(starts)):
            s = starts[k]
            e = starts[k + 1] if k + 1 < len(starts) else len(ids)
            d = _doc_spans(cols, s, e, num_col_lower, num_col_upper)
            if d is None:
                if nested:
                    acc_nested.append((ids[s], []))
                continue
            perm, out_kind = _safe_document(d, fail_fast)
            if nested:
                acc_nested.append((ids[s], [
                    {"kind": out_kind[p], "text": d.text[i],
                     "media_ref": d.media_ref[i], "offset": int(d.offset[i])}
                    for p, i in enumerate(perm)
                ]))
            else:
                n = len(perm)
                acc_flat.append((
                    np.full(n, ids[s], dtype=object),
                    np.arange(n, dtype=np.int32), out_kind,
                    d.text[perm], d.media_ref[perm],
                    d.offset[perm].astype(np.int32),
                ))

    def _flush(acc_flat, acc_nested):
        if nested:
            if not acc_nested:
                return None
            df = pd.DataFrame({
                "doc_id": [a[0] for a in acc_nested],
                "out_spans": [a[1] for a in acc_nested],
            })
            acc_nested.clear()
            return df
        if not acc_flat:
            return None
        df = pd.DataFrame({
            "doc_id": np.concatenate([a[0] for a in acc_flat]),
            "ord": np.concatenate([a[1] for a in acc_flat]),
            "kind": np.concatenate([a[2] for a in acc_flat]),
            "text": np.concatenate([a[3] for a in acc_flat]),
            "media_ref": np.concatenate([a[4] for a in acc_flat]),
            "offset": np.concatenate([a[5] for a in acc_flat]),
        })
        acc_flat.clear()
        return df

    def kernel(iterator):
        carry: pd.DataFrame | None = None
        acc_flat: list = []
        acc_nested: list = []
        for pdf in iterator:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            carry = None
            if len(pdf) == 0:
                continue
            ids = pdf["doc_id"].to_numpy(dtype=object)
            neq_last = ids != ids[-1]
            if neq_last.any():
                # rows of the final doc run = trailing rows equal to ids[-1]
                trailing = int(neq_last[::-1].argmax())
                first_of_last = len(ids) - trailing
            else:
                first_of_last = 0  # whole batch is one doc: carry it all
            carry = pdf.iloc[first_of_last:]
            head = pdf.iloc[:first_of_last]
            if len(head):
                _process(head, acc_flat, acc_nested)
                out = _flush(acc_flat, acc_nested)
                if out is not None:
                    yield out
        if carry is not None and len(carry):
            _process(carry, acc_flat, acc_nested)
            out = _flush(acc_flat, acc_nested)
            if out is not None:
                yield out

    return kernel


def _safe_document(d: DocSpans, fail_fast: bool):
    """layout_document with the same per-document quarantine as
    _safe_permutation (fallback: input-offset order, kinds unchanged)."""
    try:
        return layout_document(d)
    except Exception:
        if fail_fast:
            raise
        perm = np.argsort(d.offset, kind="stable").astype(np.int64)
        return perm, d.kind[perm].copy()


def _safe_permutation(d: DocSpans, fail_fast: bool):
    """Per-document failure quarantine: at 10^12 docs a single pathological
    page must not kill the job (the reference's halt_fail global abort,
    eynollah.py:2023-2028, is replaced by degrade-and-continue). On kernel
    failure the document falls back to input-offset order (total, kinds
    unchanged). fail_fast=True (tests/CI) re-raises instead."""
    try:
        return layout_permutation(d)
    except Exception:
        if fail_fast:
            raise
        perm = np.argsort(d.offset, kind="stable").astype(np.int64)
        return perm, np.zeros(len(perm), dtype=bool)


def make_arrow_kernel(include_payload: bool = True, fail_fast: bool = True,
                      num_col_lower: int = 0, num_col_upper: int = 0):
    """Arrow-native flat-output kernel (the 100TB hot path).

    mapInArrow instead of mapInPandas: numeric columns reach numpy
    zero-copy, doc/kind ids become dictionary codes, and the text /
    media_ref payload strings are NEVER materialized as Python objects —
    the kernel computes a permutation and the output columns are built
    with C++ pc.take / pc.if_else. This is what keeps throughput
    kernel-bound instead of serialization-bound.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    names_out = (["doc_id", "ord", "kind", "text", "media_ref", "offset"]
                 if include_payload else ["doc_id", "ord", "kind", "offset"])

    def _concat(a: "pa.RecordBatch", b: "pa.RecordBatch") -> "pa.RecordBatch":
        t = pa.Table.from_batches([a, b]).combine_chunks()
        batches = t.to_batches()
        return batches[0] if len(batches) == 1 else pa.Table.from_batches(batches).combine_chunks().to_batches()[0]

    def _np(col, fill=0, dtype=np.float64):
        return pc.fill_null(col, fill).to_numpy(zero_copy_only=False).astype(dtype)

    def _process(batch, out):
        n = batch.num_rows
        if n == 0:
            return
        col = {name: batch.column(i) for i, name in enumerate(batch.schema.names)}
        id_codes = pc.dictionary_encode(col["doc_id"]).indices.to_numpy(zero_copy_only=False)
        kd = pc.dictionary_encode(col["kind"])
        kind_vals = np.asarray(kd.dictionary.to_pylist() or [""], dtype=object)
        kcodes = _np(kd.indices, 0, np.int64)
        kind_obj = kind_vals[np.clip(kcodes, 0, len(kind_vals) - 1)]
        valid = pc.is_valid(col["kind"]).to_numpy(zero_copy_only=False)
        offs = _np(col["offset"], -1, np.int64)
        x0 = _np(col["x0"]); x1 = _np(col["x1"]); y0 = _np(col["y0"]); y1 = _np(col["y1"])
        W = _np(col["width"], 1, np.int64)
        H = _np(col["height"], 1, np.int64)
        RT = _np(col["rtl"], False, np.bool_)
        change = np.flatnonzero(id_codes[1:] != id_codes[:-1]) + 1
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [n]))
        take_l, ord_l, marg_l = [], [], []
        for s, e in zip(starts, ends):
            v = valid[s:e]
            if not v.any():
                continue  # empty document: no flat output rows
            idx = np.arange(s, e) if v.all() else s + np.flatnonzero(v)
            d = DocSpans(
                kind=kind_obj[idx], text=None, media_ref=None,
                offset=offs[idx], x0=x0[idx], x1=x1[idx], y0=y0[idx], y1=y1[idx],
                width=int(W[s]), height=int(H[s]), rtl=bool(RT[s]),
                num_col_lower=num_col_lower, num_col_upper=num_col_upper,
            )
            perm, marg = _safe_permutation(d, fail_fast)
            take_l.append(idx[perm])
            ord_l.append(np.arange(len(perm), dtype=np.int32))
            marg_l.append(marg)
        if not take_l:
            return
        take = pa.array(np.concatenate(take_l), type=pa.int64())
        marg = pa.array(np.concatenate(marg_l))
        arrays = [
            pc.take(col["doc_id"], take),
            pa.array(np.concatenate(ord_l), type=pa.int32()),
            pc.if_else(marg, pa.scalar("marginalia"),
                       pc.cast(pc.take(col["kind"], take), pa.string())),
        ]
        if include_payload:
            arrays += [pc.take(col["text"], take), pc.take(col["media_ref"], take)]
        arrays.append(pc.cast(pc.take(col["offset"], take), pa.int32()))
        out.append(pa.RecordBatch.from_arrays(arrays, names=names_out))

    def kernel(batches):
        carry = None
        for batch in batches:
            if carry is not None and carry.num_rows:
                batch = _concat(carry, batch)
            carry = None
            n = batch.num_rows
            if n == 0:
                continue
            ids = pc.dictionary_encode(batch.column(0)).indices.to_numpy(zero_copy_only=False)
            neq_last = ids != ids[-1]
            if not neq_last.any():
                carry = batch  # whole batch is one doc: keep accumulating
                continue
            first_of_last = n - int(neq_last[::-1].argmax())
            carry = batch.slice(first_of_last)
            out: list = []
            _process(batch.slice(0, first_of_last), out)
            yield from out
        if carry is not None and carry.num_rows:
            out = []
            _process(carry, out)
            yield from out

    return kernel


def make_partition_arrow_kernel(include_payload: bool = True, fail_fast: bool = True,
                                num_col_lower: int = 0, num_col_upper: int = 0):
    """Whole-partition Arrow kernel: accumulate the partition, establish
    the canonical (doc_id, offset) row order with ONE Arrow C++ sort, then
    run the same per-doc-run kernel over the sorted table.

    This replaces the upstream `sortWithinPartitions` stage entirely: a
    Tungsten per-partition sort of 10^7 UnsafeRows costs seconds per level
    and scales poorly on one box (profiled r3), while pc.sort_indices +
    pc.take on the Arrow table costs ~0.1 s per 300k-row partition inside
    the Python worker that already holds the data. It also DROPS the
    sorted-files requirement from the bucketed fast path: files must only
    be doc-complete (never split a doc), not pre-sorted.

    Memory: one partition resident per task — bounded by the salted
    repartition (shuffled path) or spark.sql.files.maxPartitionBytes
    (bucketed scan path), same bound the carry logic already implied."""
    import pyarrow as pa

    base = make_arrow_kernel(include_payload=include_payload, fail_fast=fail_fast,
                             num_col_lower=num_col_lower, num_col_upper=num_col_upper)

    def kernel(batches):
        import pyarrow.compute as pc

        tabs = list(batches)
        if not tabs:
            return
        t = pa.Table.from_batches(tabs).combine_chunks()
        del tabs
        idx = pc.sort_indices(
            t, sort_keys=[("doc_id", "ascending"), ("offset", "ascending")])
        t = pc.take(t, idx)
        # route through the carry-aware base kernel: take() can return
        # multiple chunks (2 GB string-array cap) and a doc must never be
        # processed across an unhandled batch boundary
        yield from base(iter(t.to_batches()))

    return kernel


def make_expected_check_kernel(fail_fast: bool = True,
                               num_col_lower: int = 0, num_col_upper: int = 0):
    """Self-check kernel for the extract_reading_order oracle query:
    per document, count the spans whose extracted (ord, kind) disagrees
    with the generator's by-construction (expected_rank, expected_kind).

    This is the in-kernel equivalent of the r5 full-outer join on
    (doc_id, offset) — provably the same count: the valid-span sets on
    both sides coincide (kind IS NULL <=> the offset = -1 empty-doc
    marker rows, which the kernel skips and the expected side filters),
    offsets are unique per doc, and the kernel's output is always a
    permutation of the valid spans, so neither side can have a row the
    other lacks; the join's per-row `bad` predicate reduces to the
    per-span (ord != expected_rank) | (kind != expected_kind) test.
    Computing it where the document already lives removes two of the
    three corpus generations and both join shuffles from the r5 plan
    (guide §2.4 / §8: decide with the data you already hold).

    Expects the columns _SCAN_COLS_NARROW + expected_kind/expected_rank;
    like make_partition_arrow_kernel it sorts the resident partition by
    (doc_id, offset) itself, so the input only needs doc-complete
    partitions, not sorted rows."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def kernel(batches):
        tabs = list(batches)
        if not tabs:
            return
        t = pa.Table.from_batches(tabs).combine_chunks()
        del tabs
        if t.num_rows == 0:
            return
        t = pc.take(t, pc.sort_indices(
            t, sort_keys=[("doc_id", "ascending"), ("offset", "ascending")]))
        col = {name: t.column(i) for i, name in enumerate(t.schema.names)}

        def _np(c, fill, dtype):
            return pc.fill_null(c, fill).to_numpy(zero_copy_only=False).astype(dtype)

        ids = col["doc_id"].to_numpy(zero_copy_only=False)
        kind = col["kind"].to_numpy(zero_copy_only=False)
        ekind = col["expected_kind"].to_numpy(zero_copy_only=False)
        erank = _np(col["expected_rank"], -1, np.int64)
        valid = pc.is_valid(col["kind"]).to_numpy(zero_copy_only=False)
        offs = _np(col["offset"], -1, np.int64)
        x0 = _np(col["x0"], 0, np.float64); x1 = _np(col["x1"], 0, np.float64)
        y0 = _np(col["y0"], 0, np.float64); y1 = _np(col["y1"], 0, np.float64)
        W = _np(col["width"], 1, np.int64); H = _np(col["height"], 1, np.int64)
        RT = _np(col["rtl"], False, np.bool_)
        change = np.flatnonzero(ids[1:] != ids[:-1]) + 1
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [len(ids)]))
        out_ids, out_bad = [], []
        for s, e in zip(starts, ends):
            v = valid[s:e]
            if not v.any():
                continue  # empty document: no rows on either join side
            idx = np.arange(s, e) if v.all() else s + np.flatnonzero(v)
            d = DocSpans(
                kind=kind[idx], text=None, media_ref=None,
                offset=offs[idx], x0=x0[idx], x1=x1[idx], y0=y0[idx], y1=y1[idx],
                width=int(W[s]), height=int(H[s]), rtl=bool(RT[s]),
                num_col_lower=num_col_lower, num_col_upper=num_col_upper,
            )
            perm, marg = _safe_permutation(d, fail_fast)
            m = len(perm)
            ord_in = np.empty(m, dtype=np.int64)
            ord_in[perm] = np.arange(m)
            marg_in = np.empty(m, dtype=bool)
            marg_in[perm] = marg
            gkind = np.where(marg_in, "marginalia", kind[idx])
            bad = int(np.count_nonzero(
                (ord_in != erank[idx]) | (gkind != ekind[idx])))
            out_ids.append(ids[s])
            out_bad.append(bad)
        if out_ids:
            yield pa.RecordBatch.from_arrays(
                [pa.array(out_ids, type=pa.string()),
                 pa.array(out_bad, type=pa.int64())],
                names=["doc_id", "n_bad"])

    return kernel


def extract(df: DataFrame, partitions: int | None = None, nested: bool = True,
            heavy_threshold: int | None = None, fail_fast: bool = True,
            num_col_lower: int = 0, num_col_upper: int = 0,
            printspace_margin: float = 0.0) -> DataFrame:
    """documents (nested) -> ordered out_spans.

    ``nested=True`` returns FIXTURES.md §2 rows (doc_id, out_spans);
    ``nested=False`` returns the flat sink shape (doc_id, ord, kind,
    text, media_ref, offset) — preferable at scale.
    """
    from eynollah_spark.packaging import ensure_distributed

    spark = df.sparkSession
    ensure_distributed(spark)
    if partitions is None:
        partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    df = salted_repartition(df, partitions, heavy_threshold=heavy_threshold)
    flat = flatten(df)
    if printspace_margin > 0:
        # B9 page-frame filter as a pre-kernel codegen predicate (the
        # CLI's page-extraction step; --ignore-page-extraction skips it)
        flat = filter_printspace(flat, margin_frac=printspace_margin,
                                 keep_null_spans=True)
    flat = flat.sortWithinPartitions("doc_id", "offset")  # canonical per-doc row order -> bitwise-deterministic output
    if nested:
        return flat.mapInPandas(
            make_kernel(True, fail_fast=fail_fast, num_col_lower=num_col_lower,
                        num_col_upper=num_col_upper), schema=OUT_SCHEMA)
    return flat.mapInArrow(
        make_arrow_kernel(fail_fast=fail_fast, num_col_lower=num_col_lower,
                          num_col_upper=num_col_upper), schema=FLAT_OUT_SCHEMA)


def extract_flat_input(flat: DataFrame, partitions: int | None = None,
                       nested: bool = False, strategy: str = "join",
                       assume_doc_partitioned: bool = False,
                       fail_fast: bool = True,
                       num_col_lower: int = 0, num_col_upper: int = 0) -> DataFrame:
    """Same pipeline for already-flat span rows (doc_id, width, height,
    rtl, kind, text, media_ref, offset, x0..y1) — used when the corpus is
    generated distributed, skipping the nest/flatten round-trip.

    strategy='join' (permutation join, THE DEFAULT since r2): the kernel
    sees only the narrow numeric projection and emits (doc_id, ord,
    kind, offset); the text / media_ref payload joins back JVM-side
    (shuffled hash join — both sides hash-shuffle on the keys, no sort)
    on (doc_id, offset) and never crosses into Python at all — the
    wide-payload plan for 100 TB inputs.
    strategy='inline': payload strings ride through the kernel stage
    (permuted C++-side, but they still cross the JVM<->python socket).
    With a bucketed input (assume_doc_partitioned) inline is the
    ZERO-shuffle plan: scan -> kernel -> sink, nothing else.

    Since r3 the canonical (doc_id, offset) row order is established
    INSIDE the kernel (make_partition_arrow_kernel: one Arrow C++ sort
    of the resident partition) instead of a `sortWithinPartitions`
    stage — a Tungsten sort of 10^7 UnsafeRows per level was the single
    largest non-kernel cost and scales poorly on one box.

    assume_doc_partitioned: the input is already doc-complete per file
    (an Iceberg table bucketed by doc_id — the recommended deployment
    shape) -> skip the repartition shuffle entirely. The caller must
    guarantee one file never splits a document AND files are smaller
    than spark.sql.files.maxPartitionBytes (otherwise a file split could
    separate a document's rows). Files do NOT need to be sorted — the
    in-kernel sort canonicalizes.
    """
    from eynollah_spark.packaging import ensure_distributed

    spark = flat.sparkSession
    ensure_distributed(spark)
    if partitions is None:
        partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if nested:
        f = flat.select("doc_id", "width", "height", "rtl", "kind", "text",
                        "media_ref", "offset", "x0", "x1", "y0", "y1")
        f = f.repartition(partitions, F.xxhash64("doc_id"))
        f = f.sortWithinPartitions("doc_id", "offset")
        return f.mapInPandas(
            make_kernel(True, fail_fast=fail_fast, num_col_lower=num_col_lower,
                        num_col_upper=num_col_upper), schema=OUT_SCHEMA)
    if strategy == "join":
        narrow = flat.select("doc_id", "width", "height", "rtl", "kind",
                             "offset", "x0", "x1", "y0", "y1")
        if not assume_doc_partitioned:
            narrow = narrow.repartition(partitions, F.xxhash64("doc_id"))
        perm = narrow.mapInArrow(
            make_partition_arrow_kernel(include_payload=False, fail_fast=fail_fast,
                                        num_col_lower=num_col_lower,
                                        num_col_upper=num_col_upper),
            schema="doc_id string, ord int, kind string, offset int")
        payload = flat.select("doc_id", "offset", "text", "media_ref")
        # shuffle_hash: build a hash map per partition instead of sorting
        # BOTH 10^9-row sides (sort-merge); measured ~20% faster here and
        # strictly less work at scale. Spark >=3.1 hash joins can spill.
        return perm.join(payload.hint("shuffle_hash"),
                         ["doc_id", "offset"], "left").select(
            "doc_id", "ord", "kind", "text", "media_ref", "offset")
    f = flat.select("doc_id", "width", "height", "rtl", "kind", "text",
                    "media_ref", "offset", "x0", "x1", "y0", "y1")
    if not assume_doc_partitioned:
        f = f.repartition(partitions, F.xxhash64("doc_id"))
    return f.mapInArrow(make_partition_arrow_kernel(fail_fast=fail_fast,
                                                    num_col_lower=num_col_lower,
                                                    num_col_upper=num_col_upper),
                        schema=FLAT_OUT_SCHEMA)


#: input columns the kernel needs (column projection for the task-side scan)
_SCAN_COLS_NARROW = ["doc_id", "width", "height", "rtl", "kind",
                     "offset", "x0", "x1", "y0", "y1"]


def extract_from_parquet_files(spark, paths: list[str], partitions: int | None = None,
                               include_payload: bool = True,
                               write_dir: str | None = None,
                               stats_only: bool = False,
                               fail_fast: bool = True) -> DataFrame:
    """Task-side columnar scan extraction — the bucketed-table fast path
    taken to its logical end (zero JVM row conversion on the input side).

    The input is the bucketed table's FILE MANIFEST (an Iceberg snapshot's
    data-file list): Spark schedules one task per file slice; each task
    opens its doc-complete parquet files with pyarrow (column-projected to
    the kernel's needs) and streams them through the whole-partition
    kernel. Input bytes go parquet -> Arrow -> numpy with no
    InternalRow/ArrowEvalPython re-encode hop, which profiling shows is
    the bulk of the JVM-scan path's fixed cost; only the (narrow) OUTPUT
    crosses the JVM boundary.

    Distribution story at 100 TB: identical to the DataFrame path — tasks
    read their files from the object store (pyarrow reads s3://... the
    same way the JVM scan would), locality and retries come from the
    Spark scheduler, resume anti-joins the output manifest per file. The
    caller guarantees what the bucketed contract already required: every
    file is doc-complete. Files need not be sorted (in-kernel sort).

    Correctness equivalence with extract_flat_input(assume_doc_partitioned)
    is pinned by the bench checksum and tests/test_pipeline_spark.py."""
    from eynollah_spark.packaging import ensure_distributed

    ensure_distributed(spark)
    paths = sorted(paths)
    if partitions is None:
        partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    ntasks = min(len(paths), max(partitions, 1))
    full = include_payload or write_dir is not None
    cols = _SCAN_COLS_NARROW + (["text", "media_ref"] if full else [])
    narrow_names = ["doc_id", "ord", "kind", "offset"]

    def gen(batches):
        import os
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        kern = make_partition_arrow_kernel(include_payload=full,
                                           fail_fast=fail_fast)
        for b in batches:
            for tid in b.column(0).to_pylist():
                n_task = 0
                for k, fp in enumerate(paths[int(tid)::ntasks]):
                    t = pq.read_table(fp, columns=cols)
                    outs = list(kern(iter(t.to_batches())))
                    if write_dir is not None and outs:
                        # task-side columnar WRITE (the sink mirror of the
                        # task-side scan): the full ordered output lands
                        # as one doc-complete file per input file. At
                        # 100 TB this is the object-store write the job
                        # actually ships, with a manifest row per file
                        # for resume. Commit protocol (ADVICE r3): write
                        # under an attempt-unique temp name, then
                        # os.replace — atomic on POSIX, so a killed or
                        # speculative duplicate attempt can never leave a
                        # truncated file at the final path (a loser's
                        # replace rewrites identical doc-complete bytes).
                        # On an object store, PUT is already atomic; the
                        # analogue is PUT-to-temp-key + manifest commit,
                        # and verify_written checks the manifest either
                        # way. Disable speculation for belt-and-braces
                        # (spark.speculation=false is the default).
                        final = f"{write_dir}/part-{int(tid)}-{k}.parquet"
                        tmp = f"{final}.tmp-{os.getpid()}-{uuid.uuid4().hex[:8]}"
                        pq.write_table(pa.Table.from_batches(outs), tmp)
                        os.replace(tmp, final)
                    if stats_only:
                        n_task += sum(ob.num_rows for ob in outs)
                    elif write_dir is not None and not include_payload:
                        for ob in outs:
                            yield ob.select(narrow_names)
                    else:
                        yield from outs
                if stats_only:
                    yield pa.RecordBatch.from_arrays(
                        [pa.array([n_task], type=pa.int64())], names=["n_rows"])

    if stats_only:
        out_schema = "n_rows long"
    elif include_payload:
        out_schema = FLAT_OUT_SCHEMA
    else:
        out_schema = "doc_id string, ord int, kind string, offset int"
    if ntasks == 0:
        # empty file list (wrong glob, or a fully-resumed manifest):
        # an empty result, not spark.range(...)'s opaque JVM error
        return spark.createDataFrame([], schema=out_schema)
    ids = spark.range(0, ntasks, 1, ntasks)
    return ids.mapInArrow(gen, schema=out_schema)


def extract_full_layout(flat: DataFrame, partitions: int | None = None,
                        scorer=None, fail_fast: bool = True,
                        headers_off: bool = False,
                        num_col_lower: int = 0, num_col_upper: int = 0) -> DataFrame:
    """F1 `--full-layout` mode parity: the complete post-kernel chain —
    XY-cut extraction -> geometry re-attach -> scorer kind refinement
    (headings, drop capitals; B12/C12/C13) -> C14 drop-capital adhesion.
    C15 table splitting (tables.split_wide_tables) runs BEFORE extraction
    since it rewrites input spans.

    Returns ordered flat rows WITH geometry (ready for the PAGE-XML
    writer). Every stage is a relational plan or an Arrow-batched kernel;
    shuffles stay on doc_id-derived keys throughout."""
    from eynollah_spark.pagexml import attach_geometry
    from eynollah_spark.scorer import adhere_drop_capitals, refine_kinds
    from eynollah_spark.tables import split_wide_tables

    flat = split_wide_tables(flat)
    out = extract_flat_input(flat, partitions=partitions, fail_fast=fail_fast,
                             num_col_lower=num_col_lower, num_col_upper=num_col_upper)
    rows = attach_geometry(out, flat)
    # headers_off (cli_layout.py:111-115): ignore the headers role only —
    # refine_kinds still runs so drop-capital reclassification (and the
    # C14 adhesion below, which needs it) is unaffected, matching the
    # reference where headers_off merely drops headers from reading-order
    # treatment (eynollah.py:2420-2446)
    refined = refine_kinds(rows, scorer=scorer, headers_off=headers_off)
    return adhere_drop_capitals(refined)
