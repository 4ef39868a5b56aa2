"""Native CPU decoder: bit-exact output vs the reference decoder."""
import numpy as np
import pytest

import ac3acm_tpu.tables as T
from ac3acm_tpu.host.native import NativeDecoder
from tests.refbuild import get_ref
from tests.streamgen import gen_stream

CASES = [
    ("stereo_cpl", 11, 2, False, dict(want_cpl=True), T.A52_STEREO),
    ("3f2r_to_stereo", 13, 7, False, dict(want_cpl=True), T.A52_STEREO),
    ("51_full", 14, 7, True, dict(want_cpl=True), T.A52_3F2R | T.A52_LFE),
    ("blksw", 15, 7, False, dict(want_blksw=True), T.A52_STEREO),
    ("mono", 19, 1, False, dict(), T.A52_MONO),
    ("51_to_mono", 23, 7, True, dict(want_cpl=True), T.A52_MONO),
    ("deltba", 17, 3, False, dict(want_deltba=True), T.A52_3F),
    ("blksw_cpl", 24, 7, False, dict(want_cpl=True, want_blksw=True),
     T.A52_STEREO),
    ("dolby", 21, 4, False, dict(), T.A52_DOLBY),
    ("zero_snr", 18, 2, False, dict(zero_snr=True), T.A52_STEREO),
]


@pytest.mark.parametrize("name,seed,acmod,lfeon,kw,outf", CASES,
                         ids=[c[0] for c in CASES])
def test_native_decoder_bit_exact(name, seed, acmod, lfeon, kw, outf):
    ref = get_ref()
    es = gen_stream(seed, acmod, lfeon, nframes=4, **kw)
    rflags, rb = ref.decode_stream(es, outf)
    assert rb.shape[0] == 24
    out = NativeDecoder().decode_stream(es, outf | T.A52_ADJUST_LEVEL,
                                        level=1.0, bias=0.0)
    mine = out.reshape(out.shape[0], -1)
    assert mine.shape == rb.shape
    np.testing.assert_array_equal(mine, rb)


def test_native_decoder_golden_bit_exact():
    import os
    ref = get_ref()
    golden = os.path.join(os.path.dirname(__file__), "golden",
                          "bench_51_448.ac3")
    es = open(golden, "rb").read()
    _, rb = ref.decode_stream(es, T.A52_STEREO)
    out = NativeDecoder().decode_stream(es, T.A52_STEREO | T.A52_ADJUST_LEVEL)
    np.testing.assert_array_equal(out.reshape(out.shape[0], -1), rb)


def test_downmix_negotiation_exhaustive():
    """Every (acmod, request, clev, slev) combo matches liba52's
    a52_downmix_init/a52_downmix_coeff float-for-float."""
    import ctypes as C
    import itertools
    from ac3acm_tpu.host import parse as P
    ref = get_ref()
    L = ref.lib
    L.a52_downmix_init.restype = C.c_int
    L.a52_downmix_init.argtypes = [C.c_int, C.c_int, C.POINTER(C.c_float),
                                   C.c_float, C.c_float]
    L.a52_downmix_coeff.restype = C.c_int
    L.a52_downmix_coeff.argtypes = [C.POINTER(C.c_float), C.c_int, C.c_int,
                                    C.c_float, C.c_float, C.c_float]
    CLEV = [T.LEVEL_3DB, T.LEVEL_45DB, 0.5, T.LEVEL_45DB]
    SLEV = [T.LEVEL_3DB, 0.5, 0.0, 0.5]
    for acmod in range(8):
        for outreq in range(11):
            for ci, si in itertools.product(range(4), range(4)):
                clev = np.float32(CLEV[ci])
                slev = np.float32(SLEV[si])
                lv = C.c_float(1.0)
                out_ref = L.a52_downmix_init(acmod, outreq | 32,
                                             C.byref(lv), clev, slev)
                my_out, my_lvl = P.downmix_init(acmod, outreq | 32, 1.0,
                                                clev, slev)
                assert out_ref == my_out
                assert np.float32(lv.value) == np.float32(my_lvl)
                lvl2 = np.float32(np.float64(np.float32(lv.value)) * 2.0)
                cr = (C.c_float * 5)()
                cb = L.a52_downmix_coeff(cr, acmod, out_ref, lvl2, clev, slev)
                mc, mcb = P.downmix_coeff(acmod, out_ref, lvl2, clev, slev)
                assert cb == mcb
                assert all(np.float32(cr[k]) == mc[k] for k in range(5))


def test_corruption_rejection_parity():
    """Malformed frames are accepted/rejected exactly like the reference
    (byte-corruption fuzz; found the uint8 exponent-accumulator wrap,
    parse.c:218-231)."""
    import numpy as np
    import ac3acm_tpu.tables as T
    from ac3acm_tpu.host.native import NativeDecoder
    from tests.refbuild import get_ref
    import os
    golden = os.path.join(os.path.dirname(__file__), "golden",
                          "bench_51_448.ac3")
    es = open(golden, "rb").read()
    frame = es[:1792]
    ref = get_ref()
    rng = np.random.default_rng(0)
    for _ in range(150):
        b = bytearray(frame)
        for _ in range(rng.integers(1, 5)):
            b[int(rng.integers(5, len(b)))] ^= int(rng.integers(1, 256))
        data = bytes(b)
        _, rb = ref.decode_stream(data, T.A52_STEREO)
        _, rb2 = ref.decode_stream(data, T.A52_STEREO)
        if rb.shape[0] != rb2.shape[0]:
            # corrupt input hit liba52 uninitialized-state UB: its own
            # accept/reject is heap-dependent -- nothing to match
            continue
        mine = NativeDecoder().decode_stream(
            data, T.A52_STEREO | T.A52_ADJUST_LEVEL, 1.0, 0.0)
        assert (rb.shape[0] == 6) == (mine.shape[0] == 6), data.hex()[:60]


def test_compact_h2d():
    """Block-float H2D form (int16 mantissa + per-(block,plane) scale)
    drifts the decode output by at most 1 int16 LSB vs shipping the f32
    premixed planes, on committed golden content (no refbuild needed).
    The compact form is the e2e transfer-volume option (VERDICT r2 #3):
    ~2x fewer bytes over the host->device link."""
    import os
    from ac3acm_tpu.parallel.pipeline import BatchedDecoder
    golden = os.path.join(os.path.dirname(__file__), "golden",
                          "bench_51_448.ac3")
    es = open(golden, "rb").read()
    flags = T.A52_STEREO | T.A52_ADJUST_LEVEL
    B = 4
    outs = {}
    for compact in (False, True):
        dec = BatchedDecoder(B, flags, bias=384.0, emit_int16=True,
                             parser="native", compact_h2d=compact)
        for i in range(B):
            # rotated frame starts: distinct lane phases
            dec.feed(i, es[i * 1792:] + es[:i * 1792])
        chunks = []
        for _ in range(2):
            r = dec.decode_available(max_frames=4)
            assert r is not None
            pcm, valid = r
            assert valid.all()
            chunks.append(np.asarray(pcm, np.int64))
        outs[compact] = np.concatenate(chunks, axis=1)
    d = np.abs(outs[True] - outs[False])
    assert d.max() <= 1, f"compact H2D drifted {d.max()} LSB"
    # sanity on the error scale: quantization noise sits well below the
    # rounding boundary for most samples (~0.3 LSB rms -> a minority of
    # near-boundary samples flip by exactly 1)
    assert (d != 0).mean() < 0.25


def test_passthrough_premix_native():
    """Identity-mix passthrough (stereo->stereo, the reference's most
    common decode): the native parser emits rematrix-only premixed planes
    (premix_ok) and the batched pipeline output equals the python-parser
    path bitwise -- the fast path changes the layout, never the samples."""
    import os
    from ac3acm_tpu.host.native import DenseBatchParser
    from ac3acm_tpu.parallel.pipeline import BatchedDecoder
    golden = os.path.join(os.path.dirname(__file__), "golden",
                          "stereo_192.ac3")
    es = open(golden, "rb").read()
    flags = T.A52_STEREO | T.A52_ADJUST_LEVEL
    B = 4

    # the parser must actually premix (2 planes instead of 6 over the link)
    d = DenseBatchParser(B)
    r = d.parse([es] * B, 4, flags, 1.0, 384.0, pre_planes=2)
    assert (r["nframes"] == 4).all()
    assert r["premix_ok"][:, :4].all(), "stereo passthrough must premix"

    outs = {}
    for parser in ("native", "python"):
        dec = BatchedDecoder(B, flags, bias=384.0, emit_int16=True,
                             parser=parser)
        for i in range(B):
            dec.feed(i, es)
        if parser == "native":
            assert dec._expected_pre_planes() == 2
        pcm, valid = dec.decode_available(max_frames=4)
        assert valid.all()
        outs[parser] = np.asarray(pcm)
    np.testing.assert_array_equal(outs["native"], outs["python"])


def test_passthrough_premix_compact():
    """Compact block-float H2D on the passthrough premix path: <=1 LSB
    drift vs the f32 planes (same contract as the reducing-mix case)."""
    import os
    from ac3acm_tpu.parallel.pipeline import BatchedDecoder
    golden = os.path.join(os.path.dirname(__file__), "golden",
                          "stereo_192.ac3")
    es = open(golden, "rb").read()
    flags = T.A52_STEREO | T.A52_ADJUST_LEVEL
    B = 3
    outs = {}
    for compact in (False, True):
        dec = BatchedDecoder(B, flags, bias=384.0, emit_int16=True,
                             parser="native", compact_h2d=compact)
        for i in range(B):
            dec.feed(i, es)
        pcm, valid = dec.decode_available(max_frames=4)
        assert valid.all()
        outs[compact] = np.asarray(pcm, np.int64)
    d = np.abs(outs[True] - outs[False])
    assert d.max() <= 1, f"compact passthrough drifted {d.max()} LSB"


def test_compact_h2d_uneven_lanes():
    """Compact form through the pending/frame-slice path (uneven lane
    feeds force per-frame reassembly instead of the dense fast path)."""
    import os
    from ac3acm_tpu.parallel.pipeline import BatchedDecoder
    golden = os.path.join(os.path.dirname(__file__), "golden",
                          "bench_51_448.ac3")
    es = open(golden, "rb").read()
    flags = T.A52_STEREO | T.A52_ADJUST_LEVEL
    B = 3
    outs = {}
    for compact in (False, True):
        dec = BatchedDecoder(B, flags, bias=384.0, emit_int16=True,
                             parser="native", compact_h2d=compact)
        dec.feed(0, es)
        dec.feed(1, es[:3 * 1792])        # short lane: 3 frames only
        dec.feed(2, es)
        r = dec.decode_available(max_frames=4)
        assert r is not None
        pcm, valid = r
        assert valid.all()
        dec.feed(1, es[3 * 1792:])        # top up; pending path drains
        r2 = dec.decode_available(max_frames=4)
        assert r2 is not None
        outs[compact] = (np.asarray(pcm, np.int64),
                         np.asarray(r2[0], np.int64))
    for a, b in zip(outs[True], outs[False]):
        assert np.abs(a - b).max() <= 1
