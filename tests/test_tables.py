"""Spec-table sanity: matrix shapes/symmetries, scan order, CABAC data."""
import numpy as np

from wrenc_tpu.core import tables


def test_dct2_shapes_and_symmetry():
    for n in (4, 8, 16, 32, 64):
        m = tables.dct2_matrix(n)
        assert m.shape == (n, n)
        assert (m[0] == 64).all()
        # even rows symmetric, odd rows antisymmetric
        for k in range(n):
            sign = 1 if k % 2 == 0 else -1
            assert (m[k] == sign * m[k][::-1]).all()


def test_dct2_known_values():
    m4 = tables.dct2_matrix(4)
    assert m4.tolist() == [[64, 64, 64, 64], [83, 36, -36, -83],
                           [64, -64, -64, 64], [36, -83, 83, -36]]


def test_dst7_dct8_shapes():
    for n in (4, 8, 16):
        assert tables.dst7_matrix(n).shape == (n, n)
        assert tables.dct8_matrix(n).shape == (n, n)
    assert tables.dst7_matrix(32).shape == (16, 32)
    assert tables.dct8_matrix(32).shape == (16, 32)
    assert tables.dst7_matrix(4)[0].tolist() == [29, 55, 74, 84]


def test_dct2_near_orthogonal():
    for n in (4, 8, 16, 32):
        m = tables.dct2_matrix(n).astype(np.int64)
        g = m @ m.T
        scale = g[0, 0]
        off = g - np.diag(np.diag(g))
        assert abs(off).max() < scale * 0.02


def test_diag_scan():
    s = tables.diag_scan(2, 2)  # 4x4
    assert s.shape == (16, 2)
    assert s[0].tolist() == [0, 0]
    assert s[1].tolist() == [0, 1]   # up-right diagonal: (x=0,y=1) then (1,0)
    assert s[2].tolist() == [1, 0]
    assert s[-1].tolist() == [3, 3]
    assert len({(x, y) for x, y in s.tolist()}) == 16


def test_cabac_ctx_entries():
    inits, shifts = tables.cabac_ctx_entry(tables.SE.SplitCuFlag)
    assert inits.shape == (3, 9)
    assert shifts.shape == (3, 9)
    inits, _ = tables.cabac_ctx_entry(tables.SE.SigCoeffFlag)
    assert inits.shape[1] == 63
    offsets, flat_i, flat_s = tables.cabac_ctx_layout()
    assert flat_i.shape == flat_s.shape
    assert flat_i.shape[0] == 3
    assert tables.SE.SigCoeffFlag in offsets


def test_intra_angle_table():
    assert tables.INTRA_ANGLE_TABLE[14 + 34] == -32
    assert tables.INTRA_ANGLE_TABLE[14 + 2] == 32
    assert tables.INTRA_ANGLE_TABLE[14 + 66] == 32
    assert tables.INTRA_ANGLE_TABLE[14 + 18] == 0
    assert tables.INTRA_ANGLE_TABLE[14 + 50] == 0


def test_filters():
    assert tables.F_C.shape == (32, 4)
    assert tables.F_G.shape == (32, 4)
    assert tables.F_C[0].tolist() == [0, 64, 0, 0]
    assert tables.F_C[16].tolist() == [-4, 36, 36, -4]
    assert tables.F_C[31].tolist() == [0, 2, 63, -1]
    assert (tables.F_C.sum(axis=1) == 64).all()
    assert (tables.F_G.sum(axis=1) == 64).all()
