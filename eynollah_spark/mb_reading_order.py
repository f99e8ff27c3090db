"""B14: machine-based reading order (optional ML ordering path).

Port of the reference's pairwise reading-order machinery
(do_order_of_regions_with_model, eynollah.py:1634-1818; standalone CLI
mb_ro_on_layout.py:502-725): a model scores P(region j reads after
region i) for region pairs; a quicksort-like partition loop turns the
pairwise relation into a total order (eynollah.py:1763-1800 — pop the
first multi-element group, partition around its head, insert
[ante, pivot, post], repeat until all groups are singletons).

The CNN pair model is a pluggable `PairScorer`; the default
HeuristicPairScorer is a deterministic geometric comparator (row-major
with a column-bonus), so the default build needs no TF — mirroring the
reference where machine-RO is opt-in (`--reading-order-machine-based`)
and the XY-cut (kernels.layout) is the default path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from eynollah_spark.kernels.layout import (
    cluster_lines_into_regions,
    order_lines_in_region,
)


class HeuristicPairScorer:
    """P(j after i) from region geometry, vectorized over pairs.

    Row-major comparator: a region reads later when its center is lower;
    at similar heights, when it is further along the x reading
    direction. (Stands in for the reading_order CNN of
    model_zoo/default_specs.py; batch interface identical.)
    """

    def score(self, geom: np.ndarray, i: np.ndarray, j: np.ndarray, rtl: bool = False):
        # geom: N x 4 array of region (cx, cy, w, h)
        cy_d = geom[j, 1] - geom[i, 1]
        cx_d = geom[j, 0] - geom[i, 0]
        if rtl:
            cx_d = -cx_d
        h = np.maximum((geom[i, 3] + geom[j, 3]) / 2.0, 1.0)
        z = cy_d / h + 0.25 * np.sign(cx_d) * (np.abs(cy_d) < 0.5 * h)
        return 1.0 / (1.0 + np.exp(-4.0 * z))


def order_regions_pairwise(geom: np.ndarray, scorer=None, rtl: bool = False) -> list[int]:
    """The reference's insertion/partition loop (eynollah.py:1763-1800),
    with the pair model applied as one vectorized batch per pivot."""
    scorer = scorer or HeuristicPairScorer()
    n = len(geom)
    if n <= 1:
        return list(range(n))
    ordered: list[list[int]] = [list(range(n))]
    idx = 0
    while idx >= 0:
        group = ordered.pop(idx)
        pivot = group.pop(0)
        if group:
            js = np.array(group)
            p = scorer.score(geom, np.full(len(js), pivot), js, rtl=rtl)
            ante = [int(j) for j, pj in zip(js, p) if pj < 0.5]
            post = [int(j) for j, pj in zip(js, p) if pj >= 0.5]
        else:
            ante, post = [], []
        if ante:
            ordered.insert(idx, ante)
            idx += 1
        ordered.insert(idx, [pivot])
        if post:
            ordered.insert(idx + 1, post)
        idx = -1
        for k, g in enumerate(ordered):
            if len(g) > 1:
                idx = k
                break
    return [g[0] for g in ordered]


def machine_reading_order(flat: DataFrame, scorer=None,
                          buckets: int | None = None) -> DataFrame:
    """Alternative ordering path over flat span rows: cluster lines into
    regions, order regions with the pairwise model, lines via D1.
    Output: (doc_id, ord, offset) — text spans only (the machine-RO CLI
    reorders TextRegions, mb_ro_on_layout.py:726-805).

    Grouping is by doc-id HASH BUCKET, not per doc: applyInPandas pays
    per-group scheduling/serialization overhead, and at 10^8+ docs one
    group per document is the same per-page overhead the main kernel's
    mapInArrow carry-over design exists to avoid. Each pandas call
    processes every document in its bucket."""
    from eynollah_spark.packaging import ensure_distributed
    from pyspark.sql import functions as F

    spark = flat.sparkSession
    ensure_distributed(spark)
    if buckets is None:
        buckets = int(spark.conf.get("spark.sql.shuffle.partitions")) * 4
    txt = flat.filter(F.col("kind") == "text").select(
        "doc_id", "offset", "x0", "x1", "y0", "y1", "rtl",
        F.pmod(F.xxhash64("doc_id"), F.lit(buckets)).alias("_bucket"))

    def _one_doc(g: pd.DataFrame, sc) -> pd.DataFrame:
        x0 = g["x0"].to_numpy(float)
        x1 = g["x1"].to_numpy(float)
        y0 = g["y0"].to_numpy(float)
        y1 = g["y1"].to_numpy(float)
        rtl = bool(g["rtl"].iloc[0])
        labels = cluster_lines_into_regions(x0, x1, y0, y1, rtl=rtl)
        uniq = np.unique(labels)
        geom = np.empty((len(uniq), 4))
        members = []
        for k, u in enumerate(uniq):
            m = np.flatnonzero(labels == u)
            members.append(m)
            geom[k] = ((x0[m].min() + x1[m].max()) / 2.0,
                       (y0[m].min() + y1[m].max()) / 2.0,
                       x1[m].max() - x0[m].min(),
                       y1[m].max() - y0[m].min())
        region_order = order_regions_pairwise(geom, sc, rtl=rtl)
        off = g["offset"].to_numpy(np.int64)
        out = []
        for r in region_order:
            m = members[r]
            cx = (x0[m] + x1[m]) / 2.0
            cy = (y0[m] + y1[m]) / 2.0
            out.extend(m[order_lines_in_region(cx, cy, rtl, off[m])].tolist())
        return pd.DataFrame({
            "doc_id": g["doc_id"].iloc[0],
            "ord": np.arange(len(out), dtype=np.int32),
            "offset": g["offset"].to_numpy()[out].astype(np.int32),
        })

    def fn(bucket: pd.DataFrame) -> pd.DataFrame:
        sc = scorer or HeuristicPairScorer()
        return pd.concat(
            [_one_doc(g, sc) for _, g in bucket.groupby("doc_id", sort=True)],
            ignore_index=True)

    return txt.groupBy("_bucket").applyInPandas(
        fn, schema="doc_id string, ord int, offset int")
