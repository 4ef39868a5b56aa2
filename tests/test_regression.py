"""Golden-output regression (test/regression + test/compare.c parity):
decode each committed corpus stream, compare float stereo output against
the stored reference-decoder output with the compare-oracle thresholds."""
import os

import numpy as np
import pytest

import ac3acm_tpu.tables as T
from ac3acm_tpu.models.decoder import Decoder
from tests.test_decode import compare_oracle

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
STREAMS = [f for f in sorted(os.listdir(GOLDEN)) if f.endswith(".ac3")]


@pytest.mark.parametrize("name", STREAMS)
def test_golden_regression(name):
    """Decode the golden corpus with the order-exact IMDCT path and hold
    the reference's own compare.c thresholds (test/compare.c:70-72).

    The exact path replays the reference's operation order, so its only
    error source is FMA rounding (<= ~2 f32 ulps, machine-independent);
    the default matmul path's 256-term reassociation error varies with
    the XLA:CPU vectorization width and straddles the 0.01 threshold on
    some hosts -- it gets the looser differential bound in
    test_decode.py instead.
    """
    es = open(os.path.join(GOLDEN, name), "rb").read()
    ref = np.load(os.path.join(GOLDEN, name + ".stereo_float.npy"))
    dec = Decoder(exact=True)
    out, fmt = dec.decode_stream(es, T.A52_STEREO | T.A52_ADJUST_LEVEL,
                                 level=1.0, bias=0.0)
    assert fmt.nch_out == 2
    mine = out.reshape(out.shape[0], -1)
    maxe, mean, std = compare_oracle(mine, ref)
    # several hazard streams are deliberately overdriven (peaks far above
    # full scale: synthetic side-info, the zorro-analogue downmix), and
    # the exact path's only error source -- FMA rounding, ~2 f32 ulps --
    # scales with the peak.  Within full scale this reduces to the plain
    # compare.c thresholds (test/compare.c:70-72).
    peak_units = max(np.abs(ref).max(), 1.0) * 32768
    tol = max(0.01, 1e-6 * peak_units)
    assert maxe <= tol and mean <= tol / 10 and std <= tol / 5, \
        (maxe, mean, std, tol)


def test_cli_roundtrip(tmp_path):
    from ac3acm_tpu.cli import main
    src = os.path.join(GOLDEN, "stereo_192.ac3")
    wav = tmp_path / "out.wav"
    re_ac3 = tmp_path / "re.ac3"
    assert main(["decode", src, "-o", str(wav), "--output", "wav", "-q"]) == 0
    assert wav.stat().st_size > 30000
    assert main(["encode", str(wav), "-o", str(re_ac3), "-b", "192", "-q"]) == 0
    data = re_ac3.read_bytes()
    assert data[:2] == b"\x0b\x77"
    assert main(["info", str(re_ac3)]) == 0


def test_demux_ts_ps():
    from ac3acm_tpu.io import demux
    es = open(os.path.join(GOLDEN, "mono_96.ac3"), "rb").read()

    # wrap the ES into a minimal transport stream, PID 0x42
    pid = 0x42
    ts = bytearray()
    pos = 0
    first = True
    while pos < len(es):
        chunk = es[pos:pos + 184]
        pos += 184
        hdr = bytes([0x47, (0x40 if first else 0) | (pid >> 8), pid & 0xFF, 0x10])
        if first:
            pes = b"\x00\x00\x01\xbd" + b"\x00\x00" + b"\x80\x00\x00"
            body = pes + chunk[: 184 - len(pes)]
            pos = len(body) - len(pes)
            first = False
        else:
            body = chunk
        body = body + b"\xff" * (184 - len(body))
        ts += hdr + body
    out = demux.extract_es(bytes(ts), "ts", pid=pid)
    assert out.startswith(b"\x0b\x77")
    frames = list(demux.es_frames(out))
    assert len(frames) >= 3

    # wrap into a program stream: PES private stream 1, header-data 1 byte,
    # substream id 0x80, 3 substream header bytes, then the ES
    pes_len = 3 + 1 + 1 + 3 + len(es)
    ps = (b"\x00\x00\x01\xba" + bytes([0x44, 0, 4, 0, 4, 1, 0, 1, 0x89, 0xc8])
          + b"\x00\x00\x01\xbd" + bytes([pes_len >> 8, pes_len & 0xFF])
          + b"\x80\x80\x01" + b"\xff" + b"\x80" + b"\x01\x00\x01" + es
          + b"\x00\x00\x01\xb9")
    out2 = demux.extract_es(ps, "ps", track=0)
    assert out2.startswith(b"\x0b\x77") and len(out2) == len(es)


def test_sink_channel_orders():
    from ac3acm_tpu.io.sinks import convert_s16, WAV_ORDER
    planes = np.full((6, 256), 384.0, np.float32)
    for ch in range(6):
        planes[ch] += (ch + 1) / 32768.0
    out = convert_s16(planes, T.A52_3F2R | T.A52_LFE)
    # 3F2R+LFE wav order: L=plane1, R=plane3, C=plane2, LFE=plane0, SL=4, SR=5
    assert list(out[:6]) == [2, 4, 3, 1, 5, 6]
    out2 = convert_s16(planes, T.A52_STEREO)
    assert list(out2[:2]) == [1, 2]


def test_demux_resumable_chunked():
    """PsDemux/TsDemux fed odd-sized chunks reproduce the one-shot demux
    (a52dec.c NEEDBYTES/DONEBYTES resumability)."""
    from ac3acm_tpu.io import demux
    es = open(os.path.join(GOLDEN, "mono_96.ac3"), "rb").read()

    # build the same TS as test_demux_ts_ps
    pid = 0x42
    ts = bytearray()
    pos = 0
    first = True
    while pos < len(es):
        chunk = es[pos:pos + 184]
        pos += 184
        hdr = bytes([0x47, (0x40 if first else 0) | (pid >> 8), pid & 0xFF, 0x10])
        if first:
            pes = b"\x00\x00\x01\xbd" + b"\x00\x00" + b"\x80\x00\x00"
            body = pes + chunk[: 184 - len(pes)]
            pos = len(body) - len(pes)
            first = False
        else:
            body = chunk
        body = body + b"\xff" * (184 - len(body))
        ts += hdr + body
    ts = bytes(ts)
    one_shot = demux.extract_es(ts, "ts", pid=pid)
    for csz in (61, 188, 517):
        d = demux.TsDemux(pid)
        out = b"".join(d.feed(ts[i:i + csz]) for i in range(0, len(ts), csz))
        assert out == one_shot, csz

    # program stream with several PES packets so boundaries split
    ps = bytearray(b"\x00\x00\x01\xba"
                   + bytes([0x44, 0, 4, 0, 4, 1, 0, 1, 0x89, 0xc8]))
    for off in range(0, len(es), 1000):
        seg = es[off:off + 1000]
        pes_len = 3 + 1 + 1 + 3 + len(seg)
        ps += (b"\x00\x00\x01\xbd" + bytes([pes_len >> 8, pes_len & 0xFF])
               + b"\x80\x80\x01" + b"\xff" + b"\x80" + b"\x01\x00\x01" + seg)
    ps += b"\x00\x00\x01\xb9"
    ps = bytes(ps)
    one_shot = demux.extract_es(ps, "ps", track=0)
    assert one_shot == es
    for csz in (61, 517, 4096):
        d = demux.PsDemux(track=0)
        out = b"".join(d.feed(ps[i:i + csz]) for i in range(0, len(ps), csz))
        assert out == es, csz
        assert d.ended


def test_stream_copy():
    from ac3acm_tpu.io.stream import stream_copy
    assert stream_copy(b"abc") == b"abc"
    assert stream_copy(b"abcdef", dst_capacity=4) == b"abcd"
