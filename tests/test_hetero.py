"""Heterogeneous-lane batching (SURVEY hard-part 4).

The reference runs one decoder state per ACM stream instance
(AC3ACM.cpp:92-102), so any mix of stream formats trivially works.  The
batched pool must match that: lanes with different acmods (and lanes whose
acmod changes mid-stream) decode exactly like per-lane single-stream
decodes, with per-lane carries surviving re-bucketing.
"""
import os

import numpy as np
import pytest

import ac3acm_tpu.tables as T

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
STREAMS = ["bench_51_448.ac3", "stereo_192.ac3", "mono_96.ac3"]


def _es(name, nframes):
    from ac3acm_tpu.host.parse import syncinfo
    es = open(os.path.join(GOLDEN, name), "rb").read()
    out, pos = [], 0
    while len(out) < nframes:
        size, _, _, _ = syncinfo(es[pos:pos + 7])
        assert size
        out.append(es[pos:pos + size])
        pos += size
    return b"".join(out)


def _single_lane_decode(data, flags, nframes, parser="python"):
    from ac3acm_tpu.parallel.pipeline import BatchedDecoder
    d = BatchedDecoder(1, flags, parser=parser)
    d.feed(0, data)
    chunks = []
    while True:
        r = d.decode_available(max_frames=nframes)
        if r is None:
            break
        chunks.append(np.asarray(r[0])[0])
    return np.concatenate(chunks, axis=0)


def _pcm_close(got, ref, nch):
    got = got[:, :nch]
    ref = ref[:, :nch]
    assert got.shape == ref.shape
    # cross-batch-shape decodes of the same bytes: XLA:CPU matmul blocking
    # differs per shape (see test_batched_decoder._assert_pcm_equal)
    np.testing.assert_allclose(got, ref, rtol=0, atol=2e-6)


@pytest.mark.parametrize("parser", ["python", "native"])
def test_mixed_format_lanes(parser):
    """5.1 / 2.0 / 1.0 lanes in one pool, each bit-matching (up to the
    documented cross-shape tolerance) its single-stream decode."""
    from ac3acm_tpu.parallel.pipeline import BatchedDecoder
    flags = T.A52_STEREO | T.A52_ADJUST_LEVEL
    nfr = 4
    feeds = [_es(s, nfr) for s in STREAMS]
    refs = [_single_lane_decode(f, flags, nfr, parser) for f in feeds]

    d = BatchedDecoder(3, flags, parser=parser)
    for i, f in enumerate(feeds):
        d.feed(i, f)
    pcm, valid = d.decode_available(max_frames=nfr)
    assert valid.all()
    pcm = np.asarray(pcm)
    assert pcm.shape[1] == nfr * 6
    for i, ref in enumerate(refs):
        _pcm_close(pcm[i], ref, ref.shape[1])


@pytest.mark.parametrize("parser", ["python", "native"])
def test_mid_stream_format_change(parser):
    """One lane switches 5.1 -> 2.0 mid-stream while another stays 5.1;
    the changing lane matches its own single-stream decode (the OLA carry
    survives the re-bucketing).  parser='native' exercises the per-frame
    meta emitted by ac3h_parse_dense: all frames of one call must carry
    their own format, not the first frame's."""
    flags = T.A52_STEREO | T.A52_ADJUST_LEVEL
    nfr = 2
    switch = _es("bench_51_448.ac3", nfr) + _es("stereo_192.ac3", nfr)
    steady = _es("bench_51_448.ac3", 2 * nfr)
    # reference is always the python host pass: the native batch must
    # match an independent oracle, not merely itself at batch 1
    ref_switch = _single_lane_decode(switch, flags, 2 * nfr)
    ref_steady = _single_lane_decode(steady, flags, 2 * nfr)

    from ac3acm_tpu.parallel.pipeline import BatchedDecoder
    d = BatchedDecoder(2, flags, parser=parser)
    d.feed(0, switch)
    d.feed(1, steady)
    out = []
    while True:
        r = d.decode_available(max_frames=2 * nfr)
        if r is None:
            break
        assert r[1].all()
        out.append(np.asarray(r[0]))
    pcm = np.concatenate(out, axis=1)
    _pcm_close(pcm[0], ref_switch, 2)
    _pcm_close(pcm[1], ref_steady, 2)


def test_hetero_native_matches_python():
    """The native dense-parse path routes heterogeneous batches through
    the same bucketed device calls as the python host pass -- identical
    batch shapes, so the outputs must agree bitwise."""
    from ac3acm_tpu.parallel.pipeline import BatchedDecoder
    flags = T.A52_STEREO | T.A52_ADJUST_LEVEL
    nfr = 3
    feeds = [_es(s, nfr) for s in STREAMS]
    outs = {}
    for parser in ("python", "native"):
        d = BatchedDecoder(3, flags, parser=parser)
        for i, f in enumerate(feeds):
            d.feed(i, f)
        pcm, valid = d.decode_available(max_frames=nfr)
        assert valid.all()
        outs[parser] = np.asarray(pcm)
    np.testing.assert_array_equal(outs["python"], outs["native"])
