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


def test_subline_cuts_match_bruteforce_property():
    """Property test: on random irregular interval sets, subline_cuts
    must equal a brute-force per-pixel coverage walk."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        ivs=st.lists(
            st.tuples(st.integers(0, 300), st.integers(1, 60)),
            min_size=0, max_size=12),
        ty0=st.integers(0, 150),
        span=st.integers(1, 200),
        min_gap=st.integers(1, 8),
    )
    def check(ivs, ty0, span, min_gap):
        y0 = np.array([a for a, _ in ivs], dtype=np.int64)
        y1 = np.array([a + b for a, b in ivs], dtype=np.int64)
        ty1 = ty0 + span
        got = subline_cuts(y0, y1, ty0, ty1, min_gap=min_gap).tolist()
        # brute force: coverage per pixel of [ty0, ty1), then run starts
        # whose preceding zero-gap (within the window) is >= min_gap
        cov = np.zeros(span, dtype=bool)
        for a, b in zip(y0, y1):
            lo, hi = max(a, ty0), min(b, ty1)
            if hi > lo:
                cov[lo - ty0:hi - ty0] = True
        want = []
        for i in range(1, span):
            if cov[i] and not cov[i - 1]:
                gap = 0
                j = i - 1
                while j >= 0 and not cov[j]:
                    gap += 1
                    j -= 1
                if gap >= min_gap:
                    want.append(i + ty0)
        assert got == want, (got, want, ivs, ty0, ty1, min_gap)

    check()
