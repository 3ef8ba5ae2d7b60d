"""Range interval math vs a literal transcription of range.cpp semantics."""

import numpy as np

from uncalled_tpu import ranges as R


def _ref_intersects(a, b):
    (as_, ae), (bs, be) = a, b
    return as_ <= ae and bs <= be and not (as_ > be or ae < bs)


def _ref_intersect(a, b):
    if not _ref_intersects(a, b):
        return (1, 0)
    return (max(a[0], b[0]), min(a[1], b[1]))


def _ref_merge(a, b):
    if not _ref_intersects(a, b):
        return (1, 0)
    return (min(a[0], b[0]), max(a[1], b[1]))


def _ref_recp(a, b):
    if not _ref_intersects(a, b):
        return 0.0
    i = _ref_intersect(a, b)
    m = _ref_merge(a, b)
    return float(i[1] - i[0] + 1) / float(m[1] - m[0] + 1)


def _ref_split(a, b):
    # range.cpp:53-69: returns left part, mutates self to right part
    left = (1, 0)
    st, en = a
    if st < b[0]:
        left = (st, b[0] - 1)
    if st <= b[1]:
        if en > b[1]:
            st = b[1] + 1
        else:
            st, en = 1, 0
    return left, (st, en)


def test_vector_ops_match_reference_semantics():
    rng = np.random.default_rng(7)
    n = 4000
    ast = rng.integers(0, 50, n)
    aen = ast + rng.integers(-3, 30, n)  # some invalid
    bst = rng.integers(0, 50, n)
    ben = bst + rng.integers(-3, 30, n)

    ok = R.intersects(ast, aen, bst, ben)
    ist, ien = R.intersect(ast, aen, bst, ben)
    mst, men = R.merge(ast, aen, bst, ben)
    ov = R.recp_overlap(ast, aen, bst, ben)
    (lst, len_), (rst, ren) = R.split(ast, aen, bst, ben)

    for i in range(n):
        a, b = (int(ast[i]), int(aen[i])), (int(bst[i]), int(ben[i]))
        assert bool(ok[i]) == _ref_intersects(a, b)
        assert (int(ist[i]), int(ien[i])) == _ref_intersect(a, b)
        assert (int(mst[i]), int(men[i])) == _ref_merge(a, b)
        assert abs(float(ov[i]) - _ref_recp(a, b)) < 1e-6
        el, er = _ref_split(a, b)
        assert (int(lst[i]), int(len_[i])) == el
        assert (int(rst[i]), int(ren[i])) == er


def test_scalar_wrapper():
    a = R.Range(10, 20)
    b = R.Range(15, 30)
    assert a.intersects(b)
    assert a.intersect(b) == R.Range(15, 20)
    assert a.merge(b) == R.Range(10, 30)
    assert abs(a.recp_overlap(b) - 6 / 21) < 1e-6
    assert not R.Range().is_valid()  # default is the invalid (1, 0)
    assert R.Range(5, 5).length() == 1
    assert R.Range(1, 2) < R.Range(1, 3) < R.Range(2, 2)
    d = R.Range(10, 20)
    assert not d.intersects(R.Range(21, 25))
    assert d.intersect(R.Range(21, 25)) == R.Range()
