"""C6 deskew kernel tests (estimate via column-edge alignment sharpness)."""

import numpy as np

from eynollah_spark.kernels.deskew import estimate_skew, rotate_boxes


def _column(n=30, x0=300.0, w=800.0, lh=28.0, pitch=40.0, y_start=150.0):
    y0 = y_start + np.arange(n) * pitch
    widths = np.full(n, w)
    widths[::7] = w * 0.6  # paragraph-final short lines
    return x0 * np.ones(n), x0 + widths, y0, y0 + lh


def test_straight_page_estimates_zero():
    x0, x1, y0, y1 = _column()
    cx, cy = (x0 + x1) / 2, (y0 + y1) / 2
    a = estimate_skew(cx, cy, x1 - x0, y1 - y0, 1400, 2000)
    assert a == 0.0


def test_skewed_page_recovered_and_inverse():
    x0, x1, y0, y1 = _column()
    for theta in (-3.2, -1.1, 1.4, 2.8):
        rx0, rx1, ry0, ry1 = rotate_boxes(x0, x1, y0, y1, theta, 700, 1000)
        cx, cy = (rx0 + rx1) / 2, (ry0 + ry1) / 2
        a = estimate_skew(cx, cy, rx1 - rx0, ry1 - ry0, 1400, 2000)
        # applying rotate_boxes(a) must restore edge alignment
        bx0, _, _, _ = rotate_boxes(rx0, rx1, ry0, ry1, a, 700, 1000)
        long = (x1 - x0) > 700
        assert np.ptp(bx0[long]) <= 4.0, (theta, a)


def test_sparse_page_never_invents_skew():
    # few identical lines: flat score surface -> stay at zero
    x0, x1, y0, y1 = _column(n=8)
    cx, cy = (x0 + x1) / 2, (y0 + y1) / 2
    assert estimate_skew(cx, cy, x1 - x0, y1 - y0, 1400, 2000) == 0.0
