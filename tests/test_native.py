"""Native C++ host ops vs their Python/scipy references."""

import numpy as np
import pytest

from vbt_tpu import native


@pytest.fixture(scope="module")
def hostops():
    if native.hostops is None and not native.build():
        pytest.skip("no C++ toolchain available")
    return native.hostops


def test_jv_assign_matches_scipy(hostops):
    import scipy.optimize

    rng = np.random.default_rng(0)
    for _ in range(100):
        n = int(rng.integers(1, 12))
        m = int(rng.integers(n, 15))
        c = rng.uniform(0, 1, (n, m))
        cols = hostops.jv_assign(c)
        rows_s, cols_s = scipy.optimize.linear_sum_assignment(c)
        got = c[np.arange(n), cols].sum()
        want = c[rows_s, cols_s].sum()
        assert got == pytest.approx(want, abs=1e-9)
        assert len(set(cols.tolist())) == n


def test_iou_matrix_matches_python(hostops):
    rng = np.random.default_rng(1)
    a = np.sort(rng.uniform(0, 100, (7, 2, 2)), axis=1).reshape(7, 4)[:, [0, 2, 1, 3]]
    b = np.sort(rng.uniform(0, 100, (5, 2, 2)), axis=1).reshape(5, 4)[:, [0, 2, 1, 3]]
    got = hostops.iou_matrix(a, b)
    from vbt_tpu.tracking.association import iou_batch

    want = iou_batch(a, b)  # (N, M) dets x trks with same box convention
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_linear_assignment_wrapper_rectangular():
    from vbt_tpu.tracking.assignment import linear_assignment

    rng = np.random.default_rng(2)
    for shape in [(3, 5), (5, 3), (4, 4), (1, 1)]:
        c = rng.uniform(0, 1, shape)
        pairs = linear_assignment(c)
        import scipy.optimize

        rows_s, cols_s = scipy.optimize.linear_sum_assignment(c)
        assert c[pairs[:, 0], pairs[:, 1]].sum() == pytest.approx(
            c[rows_s, cols_s].sum(), abs=1e-9
        )
        assert list(pairs[:, 0]) == sorted(pairs[:, 0])
