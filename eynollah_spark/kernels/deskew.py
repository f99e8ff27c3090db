"""C6 deskew-angle estimation (symbolic port).

Reference: return_deskew_slop / get_smallest_skew
(utils/separate_lines.py:1423-1470,1472-1489) — rotate the textline mask
over a grid of candidate angles and score the sharpness of the row
projection (variance of the gaussian-smoothed column sum); coarse->fine
two-stage argmax; driver run_deskew at eynollah.py:1522-1533.

Symbolically the "mask" is the set of line boxes: for every candidate
angle we rotate the line centers (vectorized over the full angle grid at
once), histogram the rotated y with width-weighted counts, and score
sharpness. A perfectly deskewed page stacks each text row into few bins
-> maximal variance.
"""

from __future__ import annotations

import numpy as np


def _score_angles(cx, cy, w, h, angles_rad, bin_w, ox, oy):
    """Column-edge alignment score per angle, vectorized (A x N).

    On box geometry the reliable skew signal is that the left (and
    right) edges of the lines of a column become collinear at the
    correct deskew angle — the x-projection of the edges sharpens (the
    box-domain analogue of the reference's projection-variance score,
    utils/separate_lines.py:1434-1460).
    """
    s = np.sin(angles_rad)[:, None]
    c = np.cos(angles_rad)[:, None]
    xr = c * (cx - ox)[None, :] + s * (cy - oy)[None, :]  # rotated cx, A x N
    score = np.zeros(len(angles_rad))
    for edge in (xr - (w / 2.0)[None, :], xr + (w / 2.0)[None, :]):
        e0 = edge - edge.min()
        bins = (e0 / bin_w).astype(np.int64)
        n_bins = int(bins.max()) + 1
        flat = bins + np.arange(len(angles_rad))[:, None] * n_bins
        counts = np.bincount(
            flat.ravel(), weights=np.broadcast_to(h, bins.shape).ravel(),
            minlength=len(angles_rad) * n_bins,
        ).reshape(len(angles_rad), n_bins)
        score += (counts ** 2).sum(axis=1)
    return score


def estimate_skew(cx, cy, w, h, width, height, max_angle_deg: float = 6.0) -> float:
    """Deskew angle in degrees, to be applied via rotate_boxes(angle).

    Two-stage search like the reference (coarse 0.5 deg over +-max, fine
    0.1 deg around the coarse argmax, separate_lines.py:1472-1489).
    """
    n = len(cx)
    if n < 8:
        return 0.0
    from eynollah_spark.kernels.layout import _med
    bin_w = max(3.0, _med(h) * 0.4)
    ox, oy = width / 2.0, height / 2.0

    def _best(angles):
        sc = _score_angles(cx, cy, w, h, angles, bin_w, ox, oy)
        # ties break toward the smallest |angle| (flat scores on sparse
        # pages must not invent a skew)
        order = np.lexsort((np.abs(angles), -sc))
        return angles[order[0]], sc[order[0]]

    coarse = np.deg2rad(np.arange(-max_angle_deg, max_angle_deg + 1e-9, 0.5))
    best, sb = _best(coarse)
    # early exit: straight page (the common case) — no fine pass, and the
    # zero-angle reference score is never consulted, so compute it lazily
    if abs(best) < 1e-9:
        return 0.0
    s0 = _score_angles(cx, cy, w, h, np.array([0.0]), bin_w, ox, oy)[0]
    if sb <= 1.05 * s0:
        return 0.0
    fine = best + np.deg2rad(np.arange(-0.5, 0.5 + 1e-9, 0.1))
    bf, sf = _best(fine)
    # only claim a skew when it clearly beats the unrotated projection
    if sf <= 1.05 * s0:
        return 0.0
    return float(np.rad2deg(bf))


def rotate_boxes(x0, x1, y0, y1, angle_deg, ox, oy):
    """C8 page rotation (utils/rotate.py:9-13) on symbolic boxes: rotate
    centers around (ox, oy), keep box extents."""
    a = np.deg2rad(angle_deg)
    s, c = np.sin(a), np.cos(a)
    cx = (x0 + x1) / 2.0 - ox
    cy = (y0 + y1) / 2.0 - oy
    ncx = c * cx + s * cy + ox
    ncy = -s * cx + c * cy + oy
    w2 = (x1 - x0) / 2.0
    h2 = (y1 - y0) / 2.0
    return ncx - w2, ncx + w2, ncy - h2, ncy + h2
