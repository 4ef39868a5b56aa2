"""Regenerate the committed golden corpus: hazard-annotated streams plus
the reference decoder's float stereo output as the oracle (.npy, committed
so the regression runs without compiling /root/reference).

Mirrors the reference's own regression corpus structure
(a52dec-0.7.5-cvs/test/tests:1-9 -- 8 streams annotated with the hazard
each exercises, e.g. "thx chord - that one never uses split imdct",
"zorro - likely to overdrive output if not properly downmixed").  The
reference encoder cannot emit coupling or short blocks, so those hazards
come from tests/streamgen (syntactically valid frames with arbitrary
side-info); the sample-rate/bsid hazards come from the reference encoder
at the relevant rates.

Run: python tests/make_golden.py
"""
import numpy as np

from tests.refbuild import get_ref
from tests.test_decode import make_pcm

# (name, annotation): the committed corpus contract.  Every stream decodes
# through test_regression.py::test_golden_regression against its stored
# float oracle at the compare.c thresholds.
ANNOTATIONS = {
    "bench_51_448.ac3":
        "dense 5.1 @ 48 kHz 448 kbps -- the benchmark content",
    "stereo_192.ac3": "2.0 @ 48 kHz 192 kbps, rematrixing-eligible",
    "mono_96.ac3": "1.0 @ 48 kHz 96 kbps, mono upmix negotiation",
    "stereo441_128.ac3":
        "44.1 kHz reference-encoder stream (fixed even parity -- the "
        "reference encoder pins frame_size_min, ac3enc.cpp:1077)",
    "odd441_hazard.ac3":
        "44.1 kHz with ALTERNATING odd/even frame parity "
        "(320*bitrate/147 + frmsizecod&1, parse.c:122)",
    "s51_441_384.ac3": "5.1 @ 44.1 kHz 384 kbps, odd-size frames + downmix",
    "stereo32_96.ac3": "32 kHz (fscod 2): 6*bitrate frame size",
    "halfrate24_64.ac3":
        "bsid 9 (halfratecod 1): 24 kHz stereo, halved sample rate "
        "shifts the bit-allocation hearing-threshold row",
    "quarterrate12_32.ac3": "bsid 10 (halfratecod 2): 12 kHz mono",
    "cpl51_hazard.ac3":
        "coupling-heavy 3F2R+LFE with phase flags and band structure "
        "churn -- the reference encoder never emits coupling",
    "blksw20_hazard.ac3":
        "short-block-heavy stereo: split imdct (256-pt) constantly "
        "(inverse of 'thx chord - never uses split imdct')",
    "overdrive_51_448.ac3":
        "near-full-scale correlated 5.1: 'likely to overdrive output "
        "if not properly downmixed' (zorro analogue)",
}

# reference-encoder streams: (name, nch, kbps, freq, nframes, seed, loud)
ENC_SPECS = [
    ("bench_51_448.ac3", 6, 448, 48000, 8, 77, False),
    ("stereo_192.ac3", 2, 192, 48000, 6, 42, False),
    ("mono_96.ac3", 1, 96, 48000, 4, 11, False),
    ("stereo441_128.ac3", 2, 128, 44100, 9, 123, False),
    ("s51_441_384.ac3", 6, 384, 44100, 6, 124, False),
    ("stereo32_96.ac3", 2, 96, 32000, 6, 125, False),
    ("halfrate24_64.ac3", 2, 64, 24000, 6, 126, False),
    ("quarterrate12_32.ac3", 1, 32, 12000, 5, 127, False),
    ("overdrive_51_448.ac3", 6, 448, 48000, 6, 128, True),
]

# synthetic streams: (name, gen_stream kwargs)
GEN_SPECS = [
    ("cpl51_hazard.ac3", dict(seed=501, acmod=7, lfeon=True, nframes=6,
                              want_cpl=True)),
    ("blksw20_hazard.ac3", dict(seed=502, acmod=2, lfeon=False, nframes=6,
                                want_blksw=True)),
]


def loud_pcm(nch, nframes, seed):
    """Near-full-scale, channel-correlated content: a 2.0 downmix of these
    planes sums coherently and exceeds full scale without level adjust."""
    rng = np.random.default_rng(seed)
    n = nframes * 1536
    t = np.arange(n, dtype=np.float64)
    f0 = rng.uniform(80, 400)
    sig = (0.75 * np.sin(2 * np.pi * f0 * t / 48000)
           + 0.25 * np.sin(2 * np.pi * f0 * 2.97 * t / 48000))
    chans = [sig * (1.0 - 0.02 * i) for i in range(nch)]
    pcm = np.stack(chans, -1) * 31500.0
    return np.clip(pcm, -32767, 32767).astype(np.int16)


if __name__ == "__main__":
    ref = get_ref()
    for name, nch, kbps, freq, nfr, seed, loud in ENC_SPECS:
        pcm = loud_pcm(nch, nfr, seed) if loud else make_pcm(nch, nfr,
                                                             seed=seed)
        es = ref.encode(pcm, freq, kbps)
        open(f"tests/golden/{name}", "wb").write(es)
        _, blocks = ref.decode_stream(es, 2)
        np.save(f"tests/golden/{name}.stereo_float.npy",
                blocks.astype(np.float32))
        print(name, len(es), blocks.shape, ANNOTATIONS[name])

    from tests.streamgen import gen_frame, gen_stream

    def gen_odd441(seed=503, nframes=6):
        """44.1 kHz frames with alternating frmsizecod parity bit."""
        for cap in (34, 20, 12, 8):
            rng = np.random.default_rng(seed)
            st, out = None, b""
            try:
                for i in range(nframes):
                    frame, st = gen_frame(
                        rng, st, acmod=2, lfeon=False, fscod=1,
                        frmsizecod=36 + (i & 1), csnr_cap=cap)
                    out += frame
                return out
            except OverflowError:
                continue
        raise OverflowError("odd441 stream does not fit")

    es = gen_odd441()
    open("tests/golden/odd441_hazard.ac3", "wb").write(es)
    _, blocks = ref.decode_stream(es, 2)
    assert blocks.size, "odd441: reference rejected the stream"
    np.save("tests/golden/odd441_hazard.ac3.stereo_float.npy",
            blocks.astype(np.float32))
    print("odd441_hazard.ac3", len(es), blocks.shape,
          ANNOTATIONS["odd441_hazard.ac3"])

    for name, kw in GEN_SPECS:
        es = gen_stream(**kw)
        open(f"tests/golden/{name}", "wb").write(es)
        _, blocks = ref.decode_stream(es, 2)
        assert blocks.size, f"{name}: reference rejected the stream"
        np.save(f"tests/golden/{name}.stereo_float.npy",
                blocks.astype(np.float32))
        print(name, len(es), blocks.shape, ANNOTATIONS[name])

    with open("tests/golden/CORPUS.md", "w") as f:
        f.write("# Golden corpus (hazard annotations)\n\n"
                "Regenerate with `python tests/make_golden.py` "
                "(needs /root/reference for the oracle build; the "
                "committed .npy oracles make the regression self-"
                "contained).\n\n")
        for k, v in ANNOTATIONS.items():
            f.write(f"- `{k}` — {v}\n")
