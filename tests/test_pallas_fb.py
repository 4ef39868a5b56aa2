"""Pallas fused filterbank kernel vs the XLA reference path."""
import jax
import numpy as np
import pytest

from ac3acm_tpu.ops.filterbank import _mats as xla_mats
from ac3acm_tpu.ops.pallas_fb import fused_filterbank


@pytest.mark.parametrize("n", [256, 300, 1024])
def test_fused_filterbank_matches_xla(n):
    rng = np.random.default_rng(0)
    q = (rng.standard_normal((n, 256)) * 1000).astype(np.float32)
    a = np.full((n, 256), 2.0 ** -15, np.float32)
    b = rng.uniform(0.5, 1.5, (n, 256)).astype(np.float32)
    blksw = rng.integers(0, 2, n).astype(bool)

    w_long, w_short, win = xla_mats()
    freq = (q * a) * b
    zd = np.where(blksw[:, None], 0, freq) @ w_long \
        + np.where(blksw[:, None], freq, 0) @ w_short
    z_ref = zd[:, :256] * win
    d_ref = zd[:, 256:]

    interpret = jax.default_backend() == "cpu"
    if interpret:
        import jax.experimental.pallas as pl  # noqa: F401
        # interpret mode exercises the kernel logic without Mosaic
        import ac3acm_tpu.ops.pallas_fb as PF
        orig = PF.pl.pallas_call
        def patched(*args, **kw):
            kw["interpret"] = True
            return orig(*args, **kw)
        PF.pl.pallas_call = patched
        try:
            z, d = jax.jit(fused_filterbank)(q, a, b, blksw)
        finally:
            PF.pl.pallas_call = orig
    else:
        z, d = jax.jit(fused_filterbank)(q, a, b, blksw)

    np.testing.assert_allclose(np.asarray(z), z_ref, rtol=0,
                               atol=4e-6 * max(abs(z_ref).max(), 1))
    np.testing.assert_allclose(np.asarray(d), d_ref, rtol=0,
                               atol=4e-6 * max(abs(d_ref).max(), 1))
