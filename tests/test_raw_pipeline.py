"""Raw-H2D production path: ship frame bytes + side-info meta, unpack and
decode on device (parallel.pipeline.raw_batched_pipeline).

The contract: BatchedDecoder(parser="raw") must emit bitwise-identical
PCM to the standard python-parser path on the same feeds -- across chunk
boundaries (exponent-reuse / coupling-coordinate / dither-LFSR carries),
for corrupt lanes (masked, resynced) and for int16 emission.
"""
import os

import numpy as np
import pytest

import ac3acm_tpu.tables as T
from ac3acm_tpu.parallel.pipeline import BatchedDecoder

GOLD = os.path.join(os.path.dirname(__file__), "golden")


def _es(name):
    return open(os.path.join(GOLD, name), "rb").read()


def _drain(d, max_frames):
    out, valids = [], []
    while True:
        r = d.decode_available(max_frames=max_frames)
        if r is None:
            break
        pcm, valid = r
        out.append(np.asarray(pcm))
        valids.append(valid)
    return np.concatenate(out, axis=1), np.concatenate(valids, axis=1)


@pytest.mark.parametrize("name,flags", [
    ("bench_51_448.ac3", T.A52_STEREO | T.A52_ADJUST_LEVEL),   # 5.1 -> 2.0
    ("stereo_192.ac3", T.A52_STEREO),                        # passthrough
    ("cpl51_hazard.ac3", T.A52_STEREO | T.A52_ADJUST_LEVEL),   # coupling
], ids=["51_downmix", "stereo_pass", "cpl51"])
@pytest.mark.parametrize("chunk", [3, 8], ids=["chunk3", "chunk8"])
def test_raw_matches_python(name, flags, chunk):
    """Both raw host parsers (pure-python and the native side-info pool)
    must emit PCM bitwise identical to the standard python path."""
    es = _es(name)
    ref = None
    for kind in ("python", "raw_py", "raw"):
        d = BatchedDecoder(2, flags, bias=384.0, parser=kind)
        d.feed(0, es)
        d.feed(1, es)
        pcm, valid = _drain(d, chunk)
        assert valid.all()
        if ref is None:
            ref = pcm
        else:
            assert pcm.shape == ref.shape, kind
            np.testing.assert_array_equal(pcm, ref, err_msg=kind)


def test_raw_int16_and_corrupt_lane():
    """int16 emission; one lane corrupted mid-stream is masked per frame
    and resyncs, the clean lanes stay bitwise identical."""
    es = _es("bench_51_448.ac3")
    flags = T.A52_STEREO | T.A52_ADJUST_LEVEL
    bad = bytearray(es)
    # wreck the 3rd frame's side-info: syncinfo stays valid so the frame
    # is not skipped by resync; the block parse fails -> masked lane-frame
    from ac3acm_tpu.host.parse import syncinfo
    pos = 0
    for _ in range(2):
        size, _, _, _ = syncinfo(bytes(bad[pos:pos + 7]))
        pos += size
    bad[pos + 8: pos + 40] = b"\xff" * 32

    outs = {}
    for kind in ("python", "raw_py", "raw"):
        d = BatchedDecoder(3, flags, bias=384.0, emit_int16=True,
                           parser=kind)
        d.feed(0, es)
        d.feed(1, bytes(bad))
        d.feed(2, es)
        pcm, valid = _drain(d, 4)
        assert valid[0].all() and valid[2].all()
        assert not valid[1].all()
        outs[kind] = (pcm, valid)
    pp, vp = outs["python"]
    for kind in ("raw_py", "raw"):
        pr, vr = outs[kind]
        np.testing.assert_array_equal(vr, vp, err_msg=kind)
        np.testing.assert_array_equal(pr[0], pp[0], err_msg=kind)
        np.testing.assert_array_equal(pr[2], pp[2], err_msg=kind)
        # corrupted lane: valid frames bitwise equal, masked frames silent
        for f in range(vr.shape[1]):
            if vr[1, f]:
                np.testing.assert_array_equal(pr[1, 6 * f: 6 * f + 6],
                                              pp[1, 6 * f: 6 * f + 6],
                                              err_msg=kind)


def test_raw_deltba_and_dither():
    """Synthetic streams with delta bit allocation + dither: raw path
    equals the python path bitwise (device LFSR orbit, eff-deltba meta)."""
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from streamgen import gen_stream
    for seed in (17, 23):
        try:
            es = gen_stream(seed, 3, False, nframes=6, want_deltba=True)
        except OverflowError:
            continue
        flags = T.A52_STEREO
        ref = None
        for kind in ("python", "raw_py", "raw"):
            d = BatchedDecoder(1, flags, parser=kind)
            d.feed(0, es)
            pcm, valid = _drain(d, 2)      # chunked: carries cross chunks
            assert valid.all()
            if ref is None:
                ref = pcm
            else:
                np.testing.assert_array_equal(pcm, ref, err_msg=kind)


def test_raw_plan_flip_across_chunks():
    """Coupling appearing mid-stream: the first chunks dispatch the
    pruned no-coupling program, later chunks the coupling one; the
    carry (exp rows, cplco, dither position) must hand over.

    Tolerance, not bitwise: the python and raw paths compile different
    XLA programs, and XLA:CPU's dot partitioning differs between them
    by up to ~2e-4 on this content (observed to depend on the platform
    env).  A carry bug shows up orders of magnitude larger (wrong
    exponents scale bins by 2^k).  The bit-level proof of the same
    handover lives in test_unpack_device.test_plan_flip_chunked_carry."""
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from streamgen import gen_stream
    plain = gen_stream(31, 2, False, nframes=4)
    cpl = gen_stream(11, 2, False, nframes=4, want_cpl=True)
    es = plain + cpl + plain
    flags = T.A52_STEREO
    ref = None
    for kind in ("python", "raw_py", "raw"):
        d = BatchedDecoder(1, flags, parser=kind)
        d.feed(0, es)
        pcm, valid = _drain(d, 2)          # 2-frame chunks: plan flips
        assert valid.all()
        if ref is None:
            ref = pcm
        else:
            assert pcm.shape == ref.shape, kind
            err = np.abs(pcm - ref).max()
            assert err < 1e-3, (kind, err)


def test_raw_rejects_mixed_formats():
    es_a = _es("bench_51_448.ac3")
    es_b = _es("stereo_192.ac3")
    d = BatchedDecoder(2, T.A52_STEREO | T.A52_ADJUST_LEVEL, parser="raw")
    d.feed(0, es_a)
    d.feed(1, es_b)
    with pytest.raises(ValueError, match="homogeneous"):
        d.decode_available(max_frames=2)
