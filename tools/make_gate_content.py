"""Generate ac3acm_tpu/data/gate_golden.npz: full-scale golden-derived
content for the fused-kernel dispatch gate (parallel.pipeline._gate_once).

VERDICT r3 weak 2: the gate ran on synthetic content scaled x0.01, ~100x
below the signal magnitude of real golden content, so the HILO kernel's
scale-proportional absolute error was under-tested at dispatch time.
This script decodes the committed golden 5.1 stream (tests/golden/
bench_51_448.ac3) with the native parser and stores:

  * freq  [4, 12, 6, 256] f32 -- four 12-block lanes of real coefficient
    planes at natural decode scale (5 fbw channels + LFE).  The gate
    slices the first P planes as the premixed planes for any format
    under test: the fused kernel's per-plane math is identical for every
    plane, so plane *content* needn't match that format's mixer output,
    only its numeric scale and spectral shape -- which these are.
  * delay [4, 6, 128] f32 -- real OLA delay carries (the passthrough
    steady pipeline's carry after each lane's first block), so the
    carry-accuracy bar is exercised at signal scale too.

Run from the repo root; commits as package data (~300 KB)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def main():
    import ac3acm_tpu.tables as T
    from ac3acm_tpu.host.native import NativeParser

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    es = open(os.path.join(here, "tests", "golden",
                           "bench_51_448.ac3"), "rb").read()
    p = NativeParser()
    flags = T.A52_STEREO | T.A52_ADJUST_LEVEL
    blocks, meta = p.decode_frames(es * 2, 8, flags, 1.0, 384.0)
    freq = np.asarray(blocks["freq"], np.float32)        # [48, 6, 256]
    assert freq.shape == (48, 6, 256)
    lanes = freq.reshape(4, 12, 6, 256)

    # real OLA delay planes: one long-block matmul per lane's first block
    from ac3acm_tpu.ops.filterbank import _mats
    w_long, _, _ = _mats()
    zd = lanes[:, 0] @ np.asarray(w_long, np.float32)    # [4, 6, 384]
    delay = np.ascontiguousarray(zd[:, :, 256:])         # [4, 6, 128]

    scale = float(np.abs(lanes).max())
    print(f"freq max |coeff| = {scale:.4f}, delay max = "
          f"{np.abs(delay).max():.4f}")
    assert scale > 0.05, "golden content unexpectedly quiet"

    out = os.path.join(here, "ac3acm_tpu", "data", "gate_golden.npz")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(out, freq=lanes, delay=delay)
    print(f"wrote {out} ({os.path.getsize(out)} bytes)")


if __name__ == "__main__":
    main()
