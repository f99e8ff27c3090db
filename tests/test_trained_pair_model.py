"""The shipped B14 pair-model artifact: weights load from disk, drive
MLPPairScorer through the full pairwise ordering loop, and reproduce the
full-information comparator's region orders on held-out docs — the
runnable stand-in for the reference's reading-order CNN
(eynollah.py:1634-1818, model_zoo/default_specs.py)."""

import os

import numpy as np
import pytest

from eynollah_spark.mb_reading_order import (
    HeuristicPairScorer,
    MLPPairScorer,
    order_regions_pairwise,
)

WEIGHTS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "eynollah_spark", "models", "pair_order_mlp.npz")


@pytest.fixture(scope="module")
def weights():
    if not os.path.exists(WEIGHTS):
        pytest.skip("pair_order_mlp.npz not trained yet")
    return dict(np.load(WEIGHTS))


def test_pair_weights_shape(weights):
    assert weights["W1"].shape[0] == 6 and weights["W2"].shape[1] == 1
    assert all(np.isfinite(weights[k]).all() for k in ("W1", "b1", "W2", "b2"))


def test_pair_model_full_order_agreement_held_out(weights):
    """Full region-order equality vs the comparator on held-out region
    geometries (clustered from generated docs never seen in training)."""
    from tools.train_pair_model import doc_region_geoms

    geoms = doc_region_geoms(200, start=20_000)
    assert len(geoms) >= 100  # docs with >= 2 regions
    sc = MLPPairScorer(weights=weights)
    hsc = HeuristicPairScorer()
    same = sum(order_regions_pairwise(g, sc) == order_regions_pairwise(g, hsc)
               for g in geoms)
    assert same / len(geoms) >= 0.98, (same, len(geoms))


def test_pair_model_in_distributed_path(spark, weights):
    """machine_reading_order with the broadcast trained scorer matches
    the heuristic default row for row on a small corpus (agreement can
    be exact here because the held-out order equality is ~1.0)."""
    from eynollah_spark.corpus import corpus_flat_spark
    from eynollah_spark.mb_reading_order import machine_reading_order

    flat = (corpus_flat_spark(spark, 60, partitions=4)
            .drop("expected_kind", "expected_rank"))
    bc = spark.sparkContext.broadcast(weights)
    got = machine_reading_order(flat, scorer=MLPPairScorer(weights_broadcast=bc))
    want = machine_reading_order(flat)
    cols = ["doc_id", "ord", "offset"]
    a = sorted(map(tuple, got.select(cols).collect()))
    b = sorted(map(tuple, want.select(cols).collect()))
    mism = sum(x != y for x, y in zip(a, b))
    assert len(a) == len(b)
    assert mism / max(len(a), 1) <= 0.02, mism
