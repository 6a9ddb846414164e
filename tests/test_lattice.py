import numpy as np
import pytest

from openlbmpm_tpu.lattice import D2Q5, D2Q9, D3Q7, D3Q19, ISO_STENCILS


@pytest.mark.parametrize("lat", [D2Q9, D2Q5, D3Q19, D3Q7])
def test_basic_invariants(lat):
    assert abs(lat.w.sum() - 1.0) < 1e-14
    assert np.all(lat.e[lat.opp] == -lat.e)
    # first moment vanishes
    assert np.allclose(lat.w @ lat.e.astype(float), 0.0)


@pytest.mark.parametrize("lat", [D2Q9, D3Q19])
def test_second_moment_isotropy(lat):
    e = lat.e.astype(float)
    second = np.einsum("q,qa,qb->ab", lat.w, e, e)
    assert np.allclose(second, lat.cs2 * np.eye(lat.dim), atol=1e-14)
    # third moment vanishes, fourth is isotropic
    third = np.einsum("q,qa,qb,qc->abc", lat.w, e, e, e)
    assert np.allclose(third, 0.0, atol=1e-14)


def test_d2q9_reference_ordering():
    # ordering from SimpleD2Q9.py:83-88
    expected = [(0, 0), (1, 0), (0, 1), (-1, 0), (0, -1),
                (1, 1), (-1, 1), (-1, -1), (1, -1)]
    assert [tuple(v) for v in D2Q9.e] == expected
    assert np.allclose(D2Q9.w, [4 / 9] + [1 / 9] * 4 + [1 / 36] * 4)


@pytest.mark.parametrize("lat", [D2Q9, D2Q5])
def test_mrt_matrix_invertible(lat):
    ident = lat.M @ lat.M_inv
    assert np.allclose(ident, np.eye(lat.q), atol=1e-12)


def test_d2q9_mrt_rows_match_velocities():
    # row 3 = e_x, row 5 = e_y per Lallemand-Luo ordering
    assert np.allclose(D2Q9.M[3], D2Q9.e[:, 0])
    assert np.allclose(D2Q9.M[5], D2Q9.e[:, 1])


@pytest.mark.parametrize("order,n", [(4, 8), (8, 24), (10, 36)])
def test_iso_stencil_counts(order, n):
    st = ISO_STENCILS[order]
    assert st.offsets.shape[0] == n
    # zeroth/first moments: sum w c = 0 by symmetry
    c = st.offsets.astype(float)
    assert np.allclose(np.einsum("q,qa->a", st.weights, c), 0.0)
    # isotropic second moment: sum w cx^2 == sum w cy^2, sum w cx cy == 0
    second = np.einsum("q,qa,qb->ab", st.weights, c, c)
    assert abs(second[0, 0] - second[1, 1]) < 1e-13
    assert abs(second[0, 1]) < 1e-13


def test_iso_stencil_second_moment_normalization():
    # E4/E8/E10 stencils: sum w c_a c_b = delta_ab (unit normalization, so
    # sum_c w (psi(x+c) - psi(x)) c is a 2nd-order-accurate gradient)
    for order in (4, 8, 10):
        st = ISO_STENCILS[order]
        c = st.offsets.astype(float)
        second = np.einsum("q,qa,qb->ab", st.weights, c, c)
        assert np.allclose(second, np.eye(2), atol=1e-12), order
