"""Aux subsystems: stream_size math, checkpoint/resume, config, meter."""
import numpy as np

import ac3acm_tpu.tables as T
from ac3acm_tpu.io.stream import Ac3Format, PcmFormat, stream_size
from ac3acm_tpu.utils.config import CodecConfig
from ac3acm_tpu.utils.meter import FpsMeter
from ac3acm_tpu.utils.state import (load_decode_state, load_encode_state,
                                    save_decode_state, save_encode_state)


def test_stream_size():
    ac3 = Ac3Format(2, 48000, 192)          # 768-byte frames
    pcm = PcmFormat(2, 48000)
    # 3 frames of AC-3 -> 3*1536 samples * 4 bytes
    assert stream_size(True, 3 * 768, ac3, pcm) == 3 * 1536 * 4
    # PCM -> AC-3: nfr+1 frames of slack
    assert stream_size(False, 2 * 1536 * 4, ac3, pcm) == 3 * 768
    # destination queries
    assert stream_size(True, 1536 * 4, ac3, pcm, query_source=False) == 768
    assert stream_size(False, 768, ac3, pcm, query_source=False) == 1536 * 4


def test_checkpoint_resume(tmp_path):
    """Resuming a decode from a saved carry continues identically."""
    from ac3acm_tpu.models.decoder import (StreamFormat, block_pipeline,
                                           init_carry)
    rng = np.random.default_rng(5)
    fmt = StreamFormat(acmod=T.A52_3F2R, output=T.A52_STEREO,
                       slev_zero=False, chanbias=31)
    blocks = {
        "freq": (rng.standard_normal((6, 6, 256)).astype(np.float32) * 100
                 * np.float32(2.0 ** -15)),
        "blksw": np.zeros((6, 5), bool),
        "coeff": np.ones((6, 5), np.float32),
        "remat": np.zeros((6, 256), bool),
        "bias": np.zeros(6, np.float32),
    }
    fn = block_pipeline(fmt)
    c0 = init_carry()
    c1, p1 = fn(c0, blocks)
    path = str(tmp_path / "state.npz")
    save_decode_state(path, c1)
    c1b, _ = load_decode_state(path)
    _, p2a = fn(c1, blocks)
    _, p2b = fn(c1b, blocks)
    np.testing.assert_array_equal(np.asarray(p2a), np.asarray(p2b))

    save_encode_state(str(tmp_path / "enc.npz"),
                      np.zeros((1, 2, 256), np.int32), np.array([40]))
    last, csnr = load_encode_state(str(tmp_path / "enc.npz"))
    assert last.shape == (1, 2, 256) and csnr[0] == 40


def test_checkpoint_parser_state_no_pickle(tmp_path):
    """Parser side-info state round-trips via plain arrays (the npz holds
    no pickled objects, so untrusted checkpoints cannot execute code)."""
    import os
    import zipfile
    from ac3acm_tpu.host.parse import A52Parser
    from ac3acm_tpu.models.decoder import init_carry
    golden = os.path.join(os.path.dirname(__file__), "golden",
                          "bench_51_448.ac3")
    es = open(golden, "rb").read()
    p = A52Parser()
    from ac3acm_tpu.host.parse import syncinfo
    size, _, _, _ = syncinfo(es[:7])
    fd1 = p.decode_frame(es[:size], T.A52_STEREO, 1.0, 0.0)
    path = str(tmp_path / "state.npz")
    save_decode_state(path, init_carry(), parser=p)
    _, s2 = load_decode_state(path)
    # resumed parser decodes the next frame identically to the original
    p2 = A52Parser()
    p2.s = s2
    size2, _, _, _ = syncinfo(es[size:size + 7])
    fa = p.decode_frame(es[size:size + size2], T.A52_STEREO, 1.0, 0.0)
    fb = p2.decode_frame(es[size:size + size2], T.A52_STEREO, 1.0, 0.0)
    for ba, bb in zip(fa.blocks, fb.blocks):
        np.testing.assert_array_equal(ba.q, bb.q)
        np.testing.assert_array_equal(ba.a, bb.a)
        np.testing.assert_array_equal(ba.b, bb.b)
    # and the file itself contains no pickled payloads
    with zipfile.ZipFile(path) as zf:
        for name in zf.namelist():
            head = zf.read(name)[:160]
            assert head[:6] == b"\x93NUMPY"
            assert b"'descr': '|O'" not in head


def test_config_roundtrip(tmp_path):
    cfg = CodecConfig(multichannel=False, dolby_surround=True)
    p = str(tmp_path / "cfg.json")
    cfg.save(p)
    cfg2 = CodecConfig.load(p)
    assert cfg2 == cfg
    assert cfg2.output_flags(T.A52_3F2R) == T.A52_DOLBY
    assert CodecConfig().default_bitrate(2) == 128000
    assert CodecConfig().default_bitrate(6) == 576000


def test_meter(capsys):
    m = FpsMeter(48000, period=0.0, enabled=True)
    m.tick(10, streams=4)
    m.close()
    err = capsys.readouterr().err
    assert "frames" in err and "realtime" in err


def test_negotiation_and_resync_logging(tmp_path):
    """AC3ACM_LOGFILE parity: format negotiation and resync events land in
    the structured log (utils/trace.py wired into io/stream.py)."""
    import logging
    import os
    from ac3acm_tpu.io.stream import (Ac3ToPcmStream, suggest_ac3,
                                      suggest_pcm)
    from ac3acm_tpu.utils.trace import log, setup_logging
    path = str(tmp_path / "ac3acm.log")
    handler_count = len(log.handlers)
    setup_logging(path, level=logging.DEBUG)
    try:
        suggest_pcm(Ac3Format(6, 48000, 448))
        suggest_ac3(PcmFormat(2, 48000))
        # resync: garbage before a real frame
        es = open(os.path.join(os.path.dirname(__file__), "golden",
                               "bench_51_448.ac3"), "rb").read()
        s = Ac3ToPcmStream(dst_channels=2)
        pcm = s.convert(b"\x00" * 37 + es[:8192])
        assert pcm.shape[0] > 0
    finally:
        for h in log.handlers[handler_count:]:
            h.close()
            log.removeHandler(h)
    text = open(path).read()
    assert "format_suggest ac3->pcm" in text
    assert "format_suggest pcm->ac3" in text
    assert "resync: skipped 37 bytes" in text
    assert "decode stream: coded_flags=" in text


def test_profile_trace(tmp_path):
    """jax.profiler trace context produces an XPlane dump (gprof analogue)."""
    import jax.numpy as jnp
    from ac3acm_tpu.utils.trace import profile
    d = str(tmp_path / "trace")
    with profile(d) as out:
        _ = jnp.square(jnp.arange(8.0)).sum().block_until_ready()
    assert out == d
    dumped = [f for _, _, fs in __import__("os").walk(d) for f in fs]
    assert any(f.endswith(".xplane.pb") for f in dumped), dumped
