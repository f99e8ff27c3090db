"""C18 analogue: sub-line segmentation of tall (multi-line) spans.

The reference splits a curved/merged textline patch by projection-profile
valley analysis (separate_lines.py:33-140: gaussian-smoothed row profile,
find_peaks on the inverted profile, cut at negative peaks). Symbolic spans
carry no interior ink, so the profile here is built from the document's
OTHER lines — the line grid: a tall span is cut wherever a covered run of
that vertical profile starts after a zero gap (the reference's
negative-peak boundary). Integer box geometry makes runs exact, so no
gaussian smoothing is needed (that step exists to suppress pixel noise,
a raster-domain concern); `min_gap` stands in for the reference's
peak-prominence filter.

Pure numpy — runs inside Arrow batches on the Spark side, and as the
sequential oracle reference on the driver side.
"""

from __future__ import annotations

import numpy as np


def subline_cuts(line_y0: np.ndarray, line_y1: np.ndarray,
                 ty0: int, ty1: int, min_gap: int = 1) -> np.ndarray:
    """Cut positions strictly inside [ty0, ty1): the starts of covered
    runs of the union profile of [line_y0, line_y1) intervals, provided
    the zero gap before the run is >= min_gap px. The tall span itself
    must be excluded from line_y0/line_y1 by the caller."""
    n = int(ty1 - ty0)
    if n <= 0 or len(line_y0) == 0:
        return np.array([], dtype=np.int64)
    lo = np.clip(np.asarray(line_y0, dtype=np.int64) - ty0, 0, n)
    hi = np.clip(np.asarray(line_y1, dtype=np.int64) - ty0, 0, n)
    m = hi > lo
    if not m.any():
        return np.array([], dtype=np.int64)
    d = np.bincount(lo[m], minlength=n + 1)
    d -= np.bincount(hi[m], minlength=n + 1)
    cov = np.cumsum(d)[:n] > 0
    starts = np.flatnonzero(cov[1:] & ~cov[:-1]) + 1
    if min_gap > 1 and len(starts):
        # gap length before each run start (distance to previous cover)
        ends = np.flatnonzero(cov[:-1] & ~cov[1:]) + 1  # run ends (exclusive)
        keep = []
        for s in starts:
            prev_end = ends[ends <= s]
            gap = s - (prev_end[-1] if len(prev_end) else 0)
            if gap >= min_gap:
                keep.append(s)
        starts = np.asarray(keep, dtype=np.int64)
    return starts + ty0


def split_tall_spans(y0: np.ndarray, y1: np.ndarray,
                     tall_ratio: float = 1.8, min_gap: int = 1):
    """Per-document sub-line segmentation: spans taller than
    `tall_ratio` x the document's median span height split at the
    covered-run starts of the remaining lines' vertical profile.

    Returns (idx, sub_idx, sy0, sy1): one row per emitted sub-line,
    `idx` pointing at the input span it came from. Spans with no
    interior cuts are returned whole (sub_idx 0).
    """
    y0 = np.asarray(y0, dtype=np.int64)
    y1 = np.asarray(y1, dtype=np.int64)
    h = y1 - y0
    med = float(np.median(h)) if len(h) else 0.0
    tall = h >= tall_ratio * max(med, 1.0)
    idx_l, sub_l, s0_l, s1_l = [], [], [], []
    rest_y0, rest_y1 = y0[~tall], y1[~tall]
    for i in np.flatnonzero(tall):
        cuts = subline_cuts(rest_y0, rest_y1, int(y0[i]), int(y1[i]),
                            min_gap=min_gap)
        bounds = np.concatenate(([y0[i]], cuts, [y1[i]]))
        for j in range(len(bounds) - 1):
            idx_l.append(i)
            sub_l.append(j)
            s0_l.append(int(bounds[j]))
            s1_l.append(int(bounds[j + 1]))
    return (np.asarray(idx_l, dtype=np.int64),
            np.asarray(sub_l, dtype=np.int32),
            np.asarray(s0_l, dtype=np.int64),
            np.asarray(s1_l, dtype=np.int64))
