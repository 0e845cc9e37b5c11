"""Structural validation of the H.264 normative tables
(amatsukaze_tpu/video/h264_tables.py, ISO/IEC 14496-10)."""

import numpy as np

from amatsukaze_tpu.video import h264_tables as T


class TestCavlcTables:
    def test_coeff_token_kraft(self):
        # Table 9-5: each nC class is a prefix code over the valid
        # (TotalCoeff, TrailingOnes) pairs; class 3 is the 6-bit FLC
        # with exactly 62 of 64 codes used.
        for cls in range(4):
            s = 0.0
            for tc in range(17):
                for t1 in range(min(tc, 3) + 1):
                    ln = T.COEFF_TOKEN_LEN[cls * 68 + 4 * tc + t1]
                    if ln:
                        s += 2.0 ** -ln
            if cls == 3:
                assert s == 62 / 64
            else:
                assert 0.99 < s <= 1.0

    def test_chroma_dc_coeff_token_kraft(self):
        s = sum(2.0 ** -T.CHROMA_DC_COEFF_TOKEN_LEN[4 * tc + t1]
                for tc in range(5) for t1 in range(min(tc, 3) + 1)
                if T.CHROMA_DC_COEFF_TOKEN_LEN[4 * tc + t1])
        assert s == 1.0  # Table 9-5 nC == -1: complete code

    def test_total_zeros_complete(self):
        # Table 9-7/9-8: for each TotalCoeff 1..15 a complete prefix code
        # over total_zeros 0..16-TotalCoeff
        for tc in range(1, 16):  # row index is TotalCoeff - 1
            s = sum(2.0 ** -T.TOTAL_ZEROS_LEN[(tc - 1) * 16 + z]
                    for z in range(17 - tc)
                    if T.TOTAL_ZEROS_LEN[(tc - 1) * 16 + z])
            # TotalCoeff == 1 leaves one 9-bit code unused in Table 9-7
            assert s == (1.0 - 2.0 ** -9 if tc == 1 else 1.0), tc

    def test_run_before_complete(self):
        # Table 9-10: zerosLeft classes 1..6 complete; class 7+ covers
        # runs 0..14 (run 7..14 via 11-bit-max codes), still complete
        for zl in range(1, 7):
            s = sum(2.0 ** -T.RUN_BEFORE_LEN[(zl - 1) * 16 + r]
                    for r in range(zl + 1))
            assert s == 1.0, zl
        # zerosLeft > 6: runs 7..14 use the unary-ish 4..11-bit tail;
        # the all-zeros 11-bit string is unused, so Kraft = 1 - 2^-11
        s = sum(2.0 ** -T.RUN_BEFORE_LEN[6 * 16 + r] for r in range(15)
                if T.RUN_BEFORE_LEN[6 * 16 + r])
        assert s == 1.0 - 2.0 ** -11

    def test_cbp_mappings_are_permutations(self):
        assert sorted(T.GOLOMB_TO_INTRA4X4_CBP) == list(range(48))
        assert sorted(T.GOLOMB_TO_INTER_CBP) == list(range(48))


class TestCabacTables:
    def test_range_lps_shape_and_decay(self):
        r = np.asarray(T.RANGE_LPS).reshape(64, 4)
        assert list(r[0]) == [128, 176, 208, 240]
        assert (np.diff(r, axis=0) <= 0).all()  # pLPS decays with state
        assert (r[:, :-1] <= r[:, 1:]).all()    # grows with range quartile
        assert list(r[63]) == [2, 2, 2, 2]

    def test_transition_tables(self):
        mps = list(T.TRANS_IDX_MPS)
        lps = list(T.TRANS_IDX_LPS)
        assert mps[:62] == list(range(1, 63)) and mps[62:] == [62, 63]
        assert all(lps[i] <= i for i in range(63))  # LPS never increases
        assert lps[63] == 63  # state 63 is the fixed end state

    def test_init_tables_dimensions(self):
        assert len(T.CABAC_INIT_I) == 1024 * 2
        assert len(T.CABAC_INIT_PB) == 3 * 1024 * 2
        # init values must produce states in [1, 126] after clipping for
        # every QP — spot-check the clip formula domain is sane
        m, n = T.CABAC_INIT_I[0], T.CABAC_INIT_I[1]
        st = min(max(((m * 26) >> 4) + n, 1), 126)
        assert 1 <= st <= 126

    def test_chroma_qp_table(self):
        # Table 8-15 anchors: identity below 30, 51 -> 39
        cq = T.CHROMA_QP_TABLE
        assert cq[29] == 29 and cq[30] == 29 and cq[51] == 39
        assert list(cq[:30]) == list(range(30))
