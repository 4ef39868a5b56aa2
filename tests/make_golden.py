"""Regenerate the committed golden corpus (reference-encoder streams plus
the reference decoder's float stereo output as the oracle).

Run: python tests/make_golden.py
"""
import numpy as np

from tests.refbuild import get_ref
from tests.test_decode import make_pcm

SPECS = [
    ("bench_51_448.ac3", 6, 448, 8, 77),
    ("stereo_192.ac3", 2, 192, 6, 42),
    ("mono_96.ac3", 1, 96, 4, 11),
]

if __name__ == "__main__":
    ref = get_ref()
    for name, nch, kbps, nfr, seed in SPECS:
        pcm = make_pcm(nch, nfr, seed=seed)
        es = ref.encode(pcm, 48000, kbps)
        open(f"tests/golden/{name}", "wb").write(es)
        _, blocks = ref.decode_stream(es, 2)
        np.save(f"tests/golden/{name}.stereo_float.npy", blocks.astype(np.float32))
        print(name, len(es), blocks.shape)
