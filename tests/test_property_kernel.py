"""Property-based kernel tests (hypothesis): structural invariants that
must hold for ANY geometry, mirroring the reference's own assertion that
every region is indexed exactly once (utils/__init__.py:1139-1143)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from eynollah_spark.kernels.layout import DocSpans, layout_document

KINDS = ["text", "image", "separator", "table"]


@st.composite
def random_doc(draw):
    n = draw(st.integers(0, 60))
    W = draw(st.integers(400, 2400))
    H = draw(st.integers(400, 3000))
    rtl = draw(st.booleans())
    kinds, x0, x1, y0, y1 = [], [], [], [], []
    for _ in range(n):
        kinds.append(draw(st.sampled_from(KINDS)))
        a = draw(st.integers(0, W - 2))
        b = draw(st.integers(a + 1, W))
        c = draw(st.integers(0, H - 2))
        d = draw(st.integers(c + 1, H))
        x0.append(a), x1.append(b), y0.append(c), y1.append(d)
    return DocSpans(
        kind=np.array(kinds, dtype=object),
        text=np.array([f"t{i}" for i in range(n)], dtype=object),
        media_ref=np.array([None] * n, dtype=object),
        offset=np.arange(n, dtype=np.int64),
        x0=np.array(x0, float), x1=np.array(x1, float),
        y0=np.array(y0, float), y1=np.array(y1, float),
        width=W, height=H, rtl=rtl,
    )


@settings(max_examples=120, deadline=None)
@given(random_doc())
def test_permutation_total_and_kinds_sane(doc):
    perm, kinds = layout_document(doc)
    # every span emitted exactly once
    assert sorted(perm.tolist()) == list(range(doc.n))
    # kinds only refine text -> marginalia; media kinds pass through
    for p, i in enumerate(perm):
        if doc.kind[i] != "text":
            assert kinds[p] == doc.kind[i]
        else:
            assert kinds[p] in ("text", "marginalia")
    # D8: all non-text tail kinds come after all text/marginalia
    tail = [kinds[p] for p in range(doc.n) if kinds[p] in ("image", "separator", "table")]
    head_end = doc.n - len(tail)
    assert all(k in ("text", "marginalia") for k in kinds[:head_end])


@settings(max_examples=60, deadline=None)
@given(random_doc(), st.randoms(use_true_random=False))
def test_input_order_invariance(doc, rnd):
    """The kernel must depend on geometry only: shuffling the input spans
    yields the same output sequence (keyed by offset provenance)."""
    perm1, kinds1 = layout_document(doc)
    seq1 = [(kinds1[p], int(doc.offset[i])) for p, i in enumerate(perm1)]
    idx = list(range(doc.n))
    rnd.shuffle(idx)
    idx = np.array(idx, dtype=np.int64)
    shuffled = DocSpans(
        kind=doc.kind[idx], text=doc.text[idx], media_ref=doc.media_ref[idx],
        offset=doc.offset[idx], x0=doc.x0[idx], x1=doc.x1[idx],
        y0=doc.y0[idx], y1=doc.y1[idx],
        width=doc.width, height=doc.height, rtl=doc.rtl,
    )
    perm2, kinds2 = layout_document(shuffled)
    seq2 = [(kinds2[p], int(shuffled.offset[i])) for p, i in enumerate(perm2)]
    assert seq1 == seq2
