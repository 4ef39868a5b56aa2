"""Ablation timing for unpack_mantissas: which sub-stage owns the cost.

Times the mant stage with pieces knocked out (values change, cost
doesn't lie):
  full        as shipped
  nodith      plan.has_dith=False (drops draws cumsum + orbit gather)
  hashgather  ops.bitgather.extract_fields* replaced by an integer hash
              of the offsets (keeps downstream live, removes the Pallas
              gather cost)
  noleader    leader cummaxes replaced by the raw codes
  xlacumsum   _cumsum forced to jnp.cumsum (undo the matmul form)

Usage: python tools/ablate_mant.py [batch] [nframes]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np  # noqa: E402

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN = os.path.join(HERE, "tests", "golden")


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    nframes = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    import jax
    import jax.numpy as jnp
    import ac3acm_tpu.tables as T
    from ac3acm_tpu.host.native import SideinfoBatchParser
    from ac3acm_tpu.models.decoder import StreamFormat
    from ac3acm_tpu.ops import unpack_device as U

    with open(os.path.join(GOLDEN, "bench_51_448.ac3"), "rb") as f:
        es = f.read()
    flags = T.A52_STEREO | T.A52_ADJUST_LEVEL
    sp = SideinfoBatchParser(1, nthreads=1)
    r = sp.parse([es * ((nframes // 8) + 1)], nframes, flags, 1.0, 384.0)
    mb = max(-(-int(r["fsizes"][0].max()) // 128) * 128, 128)
    fu8_1 = r["frames"][0, :, :mb]
    recs = r["recs"][0]
    meta1 = U.prune_raw_meta(
        {k: np.ascontiguousarray(recs[k]) for k in recs.dtype.names})
    fmt = StreamFormat(acmod=int(r["fmt"][0, 0, 0]),
                       output=int(r["fmt"][0, 0, 1]),
                       slev_zero=bool(r["fmt"][0, 0, 2]),
                       chanbias=int(recs[0]["chanbias"]))
    cpl_fc = U.static_cpl_fc(meta1)
    plan = U.plan_from_meta(meta1, fmt.nfchans, cpl_fc)
    print(f"plan: {plan} seg={plan.seg}", flush=True)

    def bcast(x):
        x = jnp.asarray(x)
        return jax.jit(lambda a: jnp.broadcast_to(
            a[None], (batch,) + a.shape).copy())(x)

    fu8 = bcast(fu8_1)
    meta_h = {k: bcast(v) for k, v in meta1.items()}
    wm = jax.jit(U.widen_meta)(meta_h)
    carry = U.init_unpack_carry(batch)
    exp, _ = jax.jit(
        lambda f, m, c: U.unpack_exponents(f, m, c, plan))(
            fu8, wm, carry["exp"])
    bap = jax.jit(lambda e, m: U.allocate_rows(e, m, plan))(exp, wm)
    cplco = None
    if plan.has_cpl:
        cplco, _ = jax.jit(lambda f, m, c: U.unpack_cplco(f, m, c))(
            fu8, wm, carry["cplco"])

    chk = jax.jit(lambda x: jnp.sum(
        jnp.asarray(jax.tree.leaves(x)[0]).astype(jnp.float32)))

    def timed(name, fn, *args, reps=4):
        f = jax.jit(fn)
        out = f(*args)
        _ = float(chk(out))
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            out = f(*args)
            _ = float(chk(out))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:12s} {best * 1000:8.2f} ms", flush=True)

    def mant(p):
        return lambda f, e, b, c, m, d: \
            U.unpack_mantissas(f, e, b, c, m, d, p)[0]

    timed("full", mant(plan), fu8, exp, bap, cplco, wm, carry["dpos"])

    if plan.has_dith:
        p2 = plan._replace(has_dith=False)
        m2 = {k: v for k, v in meta1.items() if k != "dith"}
        wm2 = jax.jit(U.widen_meta)({k: bcast(v) for k, v in m2.items()})
        timed("nodith", mant(p2), fu8, exp, bap, cplco, wm2, carry["dpos"])

    import ac3acm_tpu.ops.bitgather as BG

    def hash_fields(data, offsets, widths):
        return ((offsets * np.int32(-1640531527)) >> 16) \
            & ((jnp.int32(1) << widths) - 1)

    old_ef, old_efs = BG.extract_fields, BG.extract_fields_shared
    BG.extract_fields = hash_fields
    BG.extract_fields_shared = \
        lambda t, o, w=None, span_rows=14: ((o * np.int32(-1640531527))
                                            >> 16) & 0xFFFF
    Uef, Uefs = U.extract_fields, U.extract_fields_shared
    U.extract_fields, U.extract_fields_shared = \
        BG.extract_fields, BG.extract_fields_shared
    try:
        timed("hashgather", mant(plan), fu8, exp, bap, cplco, wm,
              carry["dpos"])
    finally:
        BG.extract_fields, BG.extract_fields_shared = old_ef, old_efs
        U.extract_fields, U.extract_fields_shared = Uef, Uefs

    old_cummax = jax.lax.cummax
    jax.lax.cummax = lambda x, axis: x  # leaders become raw codes
    try:
        timed("noleader", mant(plan), fu8, exp, bap, cplco, wm,
              carry["dpos"])
    finally:
        jax.lax.cummax = old_cummax

    old_cs = U._cumsum
    U._cumsum = lambda x, axis=-1, exclusive=False, block=128: (
        jnp.cumsum(x, axis=axis) - x if exclusive
        else jnp.cumsum(x, axis=axis))
    try:
        timed("xlacumsum", mant(plan), fu8, exp, bap, cplco, wm,
              carry["dpos"])
    finally:
        U._cumsum = old_cs


if __name__ == "__main__":
    main()
