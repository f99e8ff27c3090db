"""C18-analogue kernel: sub-line segmentation by vertical-profile runs
(kernels/sublines.py). Pure numpy — no Spark. The geometry here is
deliberately NON-uniform so the kernel can't pass by pitch arithmetic."""

import numpy as np

from eynollah_spark.kernels.sublines import split_tall_spans, subline_cuts


def test_cuts_at_covered_run_starts_irregular():
    # lines at [10,22), [30,47), [55,70) — irregular pitch and heights
    y0 = np.array([10, 30, 55])
    y1 = np.array([22, 47, 70])
    cuts = subline_cuts(y0, y1, 5, 75)
    # runs inside [5,75): [10,22),[30,47),[55,70): starts after gaps at 30, 55
    # (10 is the first run but has a gap 5..10 before it -> also a start)
    assert cuts.tolist() == [10, 30, 55]


def test_cuts_respect_min_gap():
    # two lines separated by a 2-px slit: min_gap=4 must NOT cut there
    y0 = np.array([10, 32])
    y1 = np.array([30, 50])
    assert subline_cuts(y0, y1, 10, 50).tolist() == [32]
    assert subline_cuts(y0, y1, 10, 50, min_gap=4).tolist() == []


def test_cuts_empty_and_degenerate():
    assert subline_cuts(np.array([]), np.array([]), 0, 100).tolist() == []
    assert subline_cuts(np.array([10]), np.array([20]), 50, 50).tolist() == []


def test_split_tall_spans_irregular_grid():
    # 5 normal lines (h=20) + 1 tall span overlapping three of them,
    # with jittered line starts: 100, 131, 159, 192, 221
    n_y0 = np.array([100, 131, 159, 192, 221])
    n_y1 = n_y0 + 20
    t_y0, t_y1 = 131, 212  # covers lines 1-3
    y0 = np.concatenate((n_y0, [t_y0]))
    y1 = np.concatenate((n_y1, [t_y1]))
    idx, sub, s0, s1 = split_tall_spans(y0, y1)
    assert (idx == 5).all()
    # cuts at run starts strictly inside (131, 212): 159 and 192
    assert s0.tolist() == [131, 159, 192]
    assert s1.tolist() == [159, 192, 212]
    assert sub.tolist() == [0, 1, 2]


def test_split_short_spans_pass_through_whole():
    y0 = np.array([0, 30, 60])
    y1 = np.array([20, 50, 80])
    idx, sub, s0, s1 = split_tall_spans(y0, y1)
    assert len(idx) == 0  # nothing tall -> nothing emitted


def test_tall_span_with_no_interior_runs_stays_whole():
    # a tall span in an empty area: no other-line coverage inside it
    y0 = np.array([0, 30, 500])
    y1 = np.array([20, 50, 620])
    idx, sub, s0, s1 = split_tall_spans(y0, y1)
    assert idx.tolist() == [2] and sub.tolist() == [0]
    assert s0.tolist() == [500] and s1.tolist() == [620]
