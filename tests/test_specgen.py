"""Cross-checks for the INDEPENDENT spec synthesizer (tests/specgen.py).

Closes the corpus self-confirmation loop (VERDICT r4 next-round #6):
streams produced with zero shared lines (own packer, spec-transcribed
syntax, the compiled reference's own allocator) must decode identically
through the compiled reference and through this framework's default
(order-exact) paths -- coupling, phase flags, short blocks, LFE.
"""
import os

import numpy as np
import pytest

import ac3acm_tpu.tables as T
from ac3acm_tpu.models.decoder import Decoder
from tests.refbuild import get_ref
from tests.specgen import gen_stream
from tests.test_decode import compare_oracle

GOLD = os.path.join(os.path.dirname(__file__), "golden")

CASES = [
    ("spec_3f2r_cpl", 7, 7, False, dict(want_cpl=True)),
    ("spec_stereo_cpl_phs", 9, 2, False, dict(want_cpl=True)),
    ("spec_3f2r_lfe_cpl_blksw", 11, 7, True,
     dict(want_cpl=True, want_blksw=True)),
    ("spec_2f2r_blksw", 13, 6, False,
     dict(want_cpl=False, want_blksw=True)),
    ("spec_3f1r_32k", 15, 5, False, dict(want_cpl=True, fscod=2)),
]


@pytest.mark.parametrize("name,seed,acmod,lfeon,kw", CASES,
                         ids=[c[0] for c in CASES])
def test_spec_stream_decodes_bit_exact(name, seed, acmod, lfeon, kw):
    ref = get_ref()
    es = gen_stream(ref, seed, acmod, lfeon, nframes=3, **kw)
    flags = T.A52_STEREO | T.A52_ADJUST_LEVEL
    _, ref_blocks = ref.decode_stream(es, T.A52_STEREO)
    assert ref_blocks.shape[0] == 18, ref_blocks.shape

    out, fmt = Decoder().decode_stream(es, flags, level=1.0, bias=0.0)
    m = out.reshape(out.shape[0], -1)
    n = min(m.shape[0], ref_blocks.shape[0])
    maxe, mean, std = compare_oracle(m[:n], ref_blocks[:n])
    assert maxe == 0.0 and mean == 0.0 and std == 0.0, (maxe, mean, std)


def test_spec_stream_exercises_hazards():
    """The generated content must actually contain the hazard features
    (introspected with the host parser -- inspection only, generation
    shares nothing with it)."""
    from ac3acm_tpu.host.parse import A52Parser, syncinfo
    ref = get_ref()
    es = gen_stream(ref, 11, 7, True, nframes=3, want_cpl=True,
                    want_blksw=True)
    p = A52Parser()
    saw_cpl = saw_blksw = saw_grouped = saw_big = False
    pos = 0
    while pos + 7 <= len(es):
        size, _, _, _ = syncinfo(es[pos:pos + 7])
        if size == 0 or pos + size > len(es):
            break
        f = p.decode_frame(es[pos:pos + size],
                           T.A52_STEREO | T.A52_ADJUST_LEVEL, 1.0, 0.0)
        for b in f.blocks:
            saw_blksw = saw_blksw or bool(np.asarray(b.blksw).any())
        s = p.s
        saw_cpl = saw_cpl or bool(s.chincpl)
        saw_grouped = saw_grouped or bool(
            ((s.fbw_bap > 0) & (s.fbw_bap <= 2)).any())
        saw_big = saw_big or bool((s.fbw_bap >= 6).any())
        pos += size
    assert saw_cpl and saw_blksw, (saw_cpl, saw_blksw)
    assert saw_grouped and saw_big, (saw_grouped, saw_big)


def test_spec_golden_committed_stream():
    """The committed independent-producer golden must keep decoding
    bit-exactly through both the compiled reference and this framework
    (raw-H2D batched path included)."""
    path = os.path.join(GOLD, "spec_cpl51_hazard.ac3")
    if not os.path.exists(path):
        pytest.skip("golden not yet generated")
    es = open(path, "rb").read()
    ref = get_ref()
    flags = T.A52_STEREO | T.A52_ADJUST_LEVEL
    _, ref_blocks = ref.decode_stream(es, T.A52_STEREO)

    from ac3acm_tpu.parallel.pipeline import BatchedDecoder
    d = BatchedDecoder(1, flags, bias=0.0, parser="raw_py")
    d.feed(0, es)
    outs = []
    while True:
        r = d.decode_available(max_frames=4)
        if r is None:
            break
        pcm, valid = r
        assert valid.all()
        outs.append(np.asarray(pcm))
    got = np.concatenate(outs, axis=1)[0]
    g = got.reshape(got.shape[0], -1)
    n = min(g.shape[0], ref_blocks.shape[0])
    maxe, mean, std = compare_oracle(g[:n], ref_blocks[:n])
    assert maxe == 0.0 and mean == 0.0 and std == 0.0, (maxe, mean, std)
