"""Table generation checks against normative HEVC values."""

import numpy as np

from hm16_2_tpu.common import tables as T


def test_dct4_values():
    np.testing.assert_array_equal(
        T.DCT4,
        [[64, 64, 64, 64], [83, 36, -36, -83], [64, -64, -64, 64],
         [36, -83, 83, -36]])


def test_dct8_values():
    np.testing.assert_array_equal(
        T.DCT8[1], [89, 75, 50, 18, -18, -50, -75, -89])
    np.testing.assert_array_equal(
        T.DCT8[7], [18, -50, 75, -89, 89, -75, 50, -18])


def test_dct32_first_column():
    np.testing.assert_array_equal(
        T.DCT32[:, 0],
        [64, 90, 90, 90, 89, 88, 87, 85, 83, 82, 80, 78, 75, 73, 70, 67,
         64, 61, 57, 54, 50, 46, 43, 38, 36, 31, 25, 22, 18, 13, 9, 4])


def test_dct_subsampling_property():
    # T_N[k] == T_32[k * 32/N][:N-pattern]: verify 16 vs 32 rows
    for k in range(16):
        np.testing.assert_array_equal(T.DCT16[k], T.dct_matrix(32)[2 * k][:16])


def test_dst4_values():
    np.testing.assert_array_equal(
        T.DST4, [[29, 55, 74, 84], [74, 74, 0, -74], [84, -29, -74, 55],
                 [55, -84, 74, -29]])


def test_near_orthogonality():
    for n, tol in [(4, 0), (8, 50), (16, 188), (32, 400)]:
        m = T.DCT[n]
        g = m @ m.T
        off = g - np.diag(np.diag(g))
        assert abs(off).max() <= tol


def test_scan_4x4_diag():
    np.testing.assert_array_equal(
        T.get_scan(4, 4, T.SCAN_DIAG),
        [0, 4, 1, 8, 5, 2, 12, 9, 6, 3, 13, 10, 7, 14, 11, 15])


def test_scan_grouped_8x8():
    s = T.get_scan(8, 8, T.SCAN_DIAG)
    assert len(set(s.tolist())) == 64
    # first group is the top-left 4x4 sub-block in diag order
    np.testing.assert_array_equal(
        s[:16], [0, 8, 1, 16, 9, 2, 24, 17, 10, 3, 25, 18, 11, 26, 19, 27])


def test_zscan_roundtrip():
    z2r = T.ZSCAN_TO_RASTER_16
    r2z = T.RASTER_TO_ZSCAN_16
    np.testing.assert_array_equal(r2z[z2r], np.arange(256))
    np.testing.assert_array_equal(z2r[:8], [0, 1, 16, 17, 2, 3, 18, 19])


def test_chroma_qp_420():
    t = T.CHROMA_QP_SCALE[1]
    assert t[29] == 29 and t[30] == 29 and t[33] == 32 and t[43] == 37
    assert t[44] == 38 and t[57] == 51


def test_intra_angles():
    assert T.intra_mode_to_angle(26) == (0, 0)       # pure vertical
    assert T.intra_mode_to_angle(10) == (0, 0)       # pure horizontal
    assert T.intra_mode_to_angle(2) == (32, 256)
    assert T.intra_mode_to_angle(34) == (32, 256)
    assert T.intra_mode_to_angle(18) == (-32, -256)
