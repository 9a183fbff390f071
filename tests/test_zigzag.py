import numpy as np

from imageencoder_tpu.ops.zigzag import zigzag_inverse, zigzag_order


def test_zigzag_4x4_matches_reference_doc():
    # Reference algo.cpp:53-54: "Zigzag sequence: 0 1 4 8 5 2 3 6 9 12 13 10 7 11 14 15"
    assert zigzag_order(4).tolist() == \
        [0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15]


def test_zigzag_8x8_is_classic_jpeg():
    expect = [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
              12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
              35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
              58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63]
    assert zigzag_order(8).tolist() == expect


def test_inverse_permutation():
    for n in (2, 4, 8, 16):
        order = zigzag_order(n)
        inv = zigzag_inverse(n)
        assert np.array_equal(order[inv], np.arange(n * n))
