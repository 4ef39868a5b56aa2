"""a52_* public API parity test (the globals/namespace test analogue)."""
import numpy as np

import ac3acm_tpu.a52 as a52
import ac3acm_tpu.tables as T
from tests.refbuild import get_ref
from tests.test_decode import make_pcm


def test_a52_api_roundtrip():
    enc = a52.AC3_encode_init(48000, 192000, 2)
    pcm = make_pcm(2, 2, seed=42)
    es = b""
    for i in range(2):
        es += a52.AC3_encode_frame(enc, pcm[i * 1536:(i + 1) * 1536])
    size, flags, srate, brate = a52.a52_syncinfo(es)
    assert size == 768 and srate == 48000 and brate == 192000
    assert (flags & a52.A52_CHANNEL_MASK) == a52.A52_STEREO

    st = a52.a52_init(0)
    pos = 0
    blocks = []
    while pos + 7 <= len(es):
        size, _, _, _ = a52.a52_syncinfo(es[pos:pos + 7])
        assert size
        assert a52.a52_frame(st, es[pos:pos + size],
                             a52.A52_STEREO | a52.A52_ADJUST_LEVEL) == 0
        for _ in range(6):
            assert a52.a52_block(st) == 0
            s = a52.a52_samples(st)
            assert s.shape == (2, 256)
            blocks.append(s.reshape(-1).copy())
        pos += size
    a52.a52_free(st)
    mine = np.stack(blocks)

    ref = get_ref()
    _, rb = ref.decode_stream(es, T.A52_STEREO)
    np.testing.assert_array_equal(mine, rb)     # native backend: bit-exact


def test_public_namespace():
    """The `globals` test analogue: every public name in the a52 module is
    a52_*/AC3_*/A52_*/MM_* (namespace hygiene, test/globals parity)."""
    import ac3acm_tpu.a52 as m
    pub = [n for n in dir(m) if not n.startswith("_")
           and n not in ("annotations", "np", "T")]
    for n in pub:
        assert n.startswith(("a52_", "AC3_", "A52_", "MM_")), n


def test_a52_dynrng_callback():
    """a52_dynrng(state, fn, data) remaps the decoded range inside the
    native backend (liba52 parse.c:207-216,593-595 parity)."""
    from tests.streamgen import gen_stream
    es = gen_stream(7, 2, False, nframes=3, want_cpl=False,
                    want_deltba=False, want_dynrng=True)

    def decode(callback=None, data=None, disable=False):
        st = a52.a52_init()
        if disable:
            a52.a52_dynrng(st)
        elif callback is not None:
            a52.a52_dynrng(st, callback, data)
        out, pos = [], 0
        while pos + 7 <= len(es):
            size, _, _, _ = a52.a52_syncinfo(es[pos:pos + 7])
            a52.a52_frame(st, es[pos:pos + size], a52.A52_STEREO)
            for _ in range(6):
                assert a52.a52_block(st) == 0
                out.append(a52.a52_samples(st).copy())
            pos += size
        a52.a52_free(st)
        return np.stack(out)

    seen = []
    def half(r, data):
        seen.append((r, data))
        return r * 0.5

    base = decode()
    halved = decode(half, "userdata")
    disabled = decode(disable=True)
    assert seen and all(d == "userdata" for _, d in seen)
    # identity callback reproduces the default exactly
    ident = decode(lambda r, d: r)
    np.testing.assert_array_equal(ident, base)
    # the stream carries dynrng gains, so remap/disable change the output
    assert not np.array_equal(halved, base)
    assert not np.array_equal(disabled, base)


def test_a52_flags_negotiated():
    """a52_flags returns the negotiated output mode (what a52_samples will
    contain), matching the flags a52_frame writes back in the reference
    (liba52 parse.c:131-205) -- not the raw stream mode."""
    golden = __file__.rsplit("/", 1)[0] + "/golden/bench_51_448.ac3"
    es = open(golden, "rb").read()
    size, stream_flags, _, _ = a52.a52_syncinfo(es[:7])
    assert (stream_flags & a52.A52_CHANNEL_MASK) == a52.A52_3F2R
    st = a52.a52_init(0)
    assert a52.a52_frame(st, es[:size], a52.A52_STEREO) == 0
    assert a52.a52_flags(st) == a52.A52_STEREO
    # requesting more channels than coded: negotiation clamps to the source
    assert a52.a52_frame(st, es[:size], a52.A52_3F2R | a52.A52_LFE) == 0
    assert a52.a52_flags(st) == (a52.A52_3F2R | a52.A52_LFE)
    a52.a52_free(st)
