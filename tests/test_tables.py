"""Table-generation tests: formulas vs the compiled reference oracle."""
import numpy as np
import pytest

import ac3acm_tpu.tables as T
from tests.refbuild import get_ref


def test_exp_tables():
    # code -> three deltas, each in {-2..2}; grouped base-5 digits
    assert T.EXP_1[0] == -2 and T.EXP_2[0] == -2 and T.EXP_3[0] == -2
    assert T.EXP_1[124] == 2 and T.EXP_3[124] == 2
    assert T.EXP_1[125] == 25 and T.EXP_2[127] == 25
    c = 87  # 87 = 3*25 + 2*5 + 2 -> deltas (1, 0, 0)
    assert (T.EXP_1[c], T.EXP_2[c], T.EXP_3[c]) == (1, 0, 0)


def test_quantizer_tables():
    assert T.Q_1_0[0] == float(int(32768 * -2 / 3 - 0.5))
    assert T.Q_1_0[9] == 0.0 and T.Q_1_0[18] == -T.Q_1_0[0]
    assert T.Q_1_0[27] == 0.0  # invalid codes decode to 0
    assert T.Q_3[3] == 0.0 and T.Q_3[7] == 0.0
    assert T.Q_5[7] == 0.0 and T.Q_5[15] == 0.0
    assert T.Q_4_0[120] == -T.Q_4_0[0] and T.Q_4_0[121] == 0.0
    # spot: Q(2/7) = round(32768*2/7) = 9362
    assert T.Q_3[4] == 9362.0
    assert T.SCALE_FACTOR[0] == 2.0 ** -15


def test_lfsr():
    lut = T.dither_lut()
    # values checked against the generating polynomial identity:
    # table[a^b] == table[a]^table[b] (linearity) and step structure
    assert lut[0] == 0
    assert lut[3] == lut[1] ^ lut[2]
    assert lut[255] == np.bitwise_xor.reduce(lut[[1, 2, 4, 8, 16, 32, 64, 128]])
    states, pos = T.lfsr_cycle()
    assert len(states) == 65535  # maximal-length 16-bit LFSR
    assert pos[0] == -1
    # byte-step composition consistency
    s = 0x1234
    expect = int(lut[s >> 8] ^ ((s << 8) & 0xFFFF))
    assert int(lut[(s >> 8)]) ^ ((s << 8) & 0xFFFF) == expect


def test_band_structure():
    assert T.BNDTAB[50] == 253
    assert T.MASKTAB[0] == 0 and T.MASKTAB[27] == 27
    assert T.MASKTAB[28] == 28 and T.MASKTAB[30] == 28
    assert T.MASKTAB[252] == 49
    assert list(T.CPL_BNDTAB) == [31, 35, 37, 39, 41, 42, 43, 44,
                                  45, 45, 46, 46, 47, 47, 48, 48]


def test_latab():
    assert T.LATAB[0] == 64 and T.LATAB[1] == 63 and T.LATAB[2] == 62
    assert T.LATAB[64] == 20
    assert T.LATAB[255] == 0 and T.LATAB[259] == 0
    assert np.all(np.diff(T.LATAB) <= 0)


def test_windows():
    w = T.kbd_window()
    assert w.shape == (256,)
    assert np.all(np.diff(w) > 0) and 0 < w[0] < 0.01 and w[255] < 1.0
    wi = T.enc_window_int16()
    assert wi[0] == 4 and wi[255] == 32767  # spec Table values


@pytest.mark.parametrize("short", [False, True])
def test_imdct_matrices_vs_reference(short):
    ref = get_ref()
    Z, D = (T.imdct256_matrices() if short else T.imdct512_matrices())
    w = T.kbd_window()
    rng = np.random.default_rng(0)
    for bias in (0.0, 384.0):
        data = rng.standard_normal(256).astype(np.float32)
        delay = np.zeros(256, np.float32)
        delay[:128] = rng.standard_normal(128).astype(np.float32)
        out_ref, dl_ref = ref.imdct(data, delay, bias=bias, short_block=short)
        z = data.astype(np.float64) @ Z
        d = data.astype(np.float64) @ D
        dfold = np.concatenate([delay[:128], delay[:128][::-1]])
        out = z * w + dfold * w[::-1] + bias
        np.testing.assert_allclose(out, out_ref, atol=2e-5)
        np.testing.assert_allclose(d, dl_ref[:128], atol=2e-5)


def test_frame_size():
    # 48 kHz, 384 kbps -> frmsizecod 28 -> 1536 bytes
    assert T.frame_size_bytes(0, 28) == 4 * 384
    # 44.1 kHz odd/even parity frames differ by 2 bytes
    assert T.frame_size_bytes(1, 29) - T.frame_size_bytes(1, 28) == 2
    assert T.frame_size_bytes(2, 0) == 6 * 32
