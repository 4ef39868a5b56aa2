"""Sub-stage timing for unpack_mantissas (the raw-path hot stage).

ROUND3 profiling put the mantissa lattice at 71% of raw-unpack device
cost; this tool splits that stage into its physical phases, each timed
as its own jitted program over HBM-staged inputs:

  prep     lattices (act/bap/b) + dither draw lattice
  counts   the stacked exclusive-cumsum pass + widths/offsets
  gather   extract_fields of the mantissa codes
  qv       leader cummax + grouped decode + level chains
  dither   ordinal -> orbit gather -> dither values
  assemble (q, a, b) assembly incl. the coupling band scatter
  mant     the whole stage in one program (the production form)

Per-phase sums over-count shared intermediates (each phase re-reads its
inputs from HBM); the weights are what matters.

Usage: python tools/profile_mant.py [batch] [nframes] [stream]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

import numpy as np  # noqa: E402

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN = os.path.join(HERE, "tests", "golden")


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    nframes = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    stream = sys.argv[3] if len(sys.argv) > 3 else "bench_51_448.ac3"
    import jax
    import jax.numpy as jnp
    import ac3acm_tpu.tables as T
    from ac3acm_tpu.host.native import SideinfoBatchParser
    from ac3acm_tpu.models.decoder import StreamFormat
    from ac3acm_tpu.ops import unpack_device as U
    from ac3acm_tpu.ops.bitgather import extract_fields

    with open(os.path.join(GOLDEN, stream), "rb") as f:
        es = f.read()
    flags = T.A52_STEREO | T.A52_ADJUST_LEVEL
    sp = SideinfoBatchParser(1, nthreads=1)
    r = sp.parse([es * ((nframes // 8) + 1)], nframes, flags, 1.0, 384.0)
    assert int(r["nframes"][0]) == nframes
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
    plan = U.plan_from_meta(meta1, fmt.nfchans, cpl_fc,
                            U.static_exp_pts(meta1),
                            U.static_alloc_pts(meta1))
    print(f"plan: {plan}, seg={plan.seg}, MB={mb}")

    def bcast(x):
        x = jnp.asarray(x)
        return jax.jit(lambda a: jnp.broadcast_to(
            a[None], (batch,) + a.shape).copy())(x)

    fu8 = bcast(fu8_1)
    meta_h = {k: bcast(v) for k, v in meta1.items()}
    wm = jax.jit(U.widen_meta)(meta_h)
    carry = U.init_unpack_carry(batch)

    exp, _ = jax.jit(lambda f, m, c: U.unpack_exponents(f, m, c, plan))(
        fu8, wm, carry["exp"])
    bap = jax.jit(lambda e, m: U.allocate_rows(e, m, plan))(exp, wm)
    if plan.has_cpl:
        cplco = jax.jit(lambda f, m, c: U.unpack_cplco(f, m, c)[0])(
            fu8, wm, carry["cplco"])
    else:
        cplco = None

    chk = jax.jit(lambda x: jnp.sum(
        jnp.asarray(jax.tree.leaves(x)[0]).astype(jnp.float32)))

    def timed(name, f, *args, reps=5):
        f = jax.jit(f)
        out = f(*args)
        _ = float(chk(out))
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            out = f(*args)
            _ = float(chk(out))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:9s} {best * 1000:8.2f} ms")
        return out

    L, F, MB = fu8.shape
    S = 6 * F
    nfch = plan.nfch
    seg = plan.seg

    # ---- phase bodies mirror unpack_mantissas (kept in sync by eye;
    # byte-identity of the production path is what tests gate) ----------
    def prep(exp, bap, meta):
        bins = jnp.arange(256, dtype=jnp.int32)
        bap = bap.astype(jnp.int32)
        endm = meta["endmant"][..., :nfch]
        fbw_act = bins < endm[..., None]
        chN = jnp.arange(nfch, dtype=jnp.int32)
        if plan.has_cpl:
            fc = U._first_cpl(meta["chincpl"], nfch)
            has_cpl = meta["chincpl"] != 0
            cpl_base = has_cpl[..., None] \
                & (bins >= meta["cplstrt"][..., None]) \
                & (bins < meta["cplend"][..., None])
            cpl_act = cpl_base if plan.compact else \
                cpl_base[..., None, :] & (chN[:, None] == fc[..., None, None])
            bap_cpl = bap[..., plan.cpl, :]
        else:
            cpl_act = None
            bap_cpl = None
        if plan.has_lfe:
            lfe_act = (meta["lfeon"][..., None] != 0) & (jnp.arange(128) < 7)
            bap_lfe = bap[..., plan.lfe, :128]
        else:
            lfe_act = bap_lfe = None
        act = U._lattice(fbw_act, cpl_act, lfe_act, plan)
        bap_s = U._lattice(bap[..., :nfch, :], bap_cpl, bap_lfe, plan)
        b = jnp.where(act, bap_s, 0)
        if plan.has_dith:
            dith = meta["dith"][..., :nfch]
            dith_fbw = (dith != 0)[..., None] & fbw_act & \
                (bap[..., :nfch, :] == 0)
            draws_fbw = dith_fbw.astype(jnp.int32)
            if plan.has_cpl:
                cpl_dmask = jnp.sum(
                    jnp.where((dith != 0)
                              & (((meta["chincpl"][..., None] >> chN) & 1)
                                 != 0),
                              jnp.int32(1) << chN, 0), axis=-1)
                ndith = jnp.zeros(cpl_dmask.shape, jnp.int32)
                for i in range(nfch):
                    ndith += (cpl_dmask >> i) & 1
                if plan.compact:
                    draws_cpl = jnp.where(cpl_act & (bap_cpl == 0),
                                          ndith[..., None], 0)
                else:
                    draws_cpl = jnp.where(
                        cpl_act & (bap_cpl[..., None, :] == 0),
                        ndith[..., None, None], 0)
                draws = U._lattice(draws_fbw, draws_cpl,
                                   jnp.zeros((L, S, 128), jnp.int32)
                                   if plan.has_lfe else None, plan)
            else:
                draws = U._lattice(draws_fbw, None,
                                   jnp.zeros((L, S, 128), jnp.int32)
                                   if plan.has_lfe else None, plan)
        else:
            draws = jnp.zeros((L, S, seg), jnp.int32)
        return b, draws

    b, draws = timed("prep", prep, exp, bap, wm)

    def counts(b, draws, meta):
        is1 = b == 1
        is2 = b == 2
        is4 = b == 4
        w6 = jnp.where(b == 15, 16, jnp.where(b == 14, 14, b - 1))
        w_simple = (jnp.where(b == 3, 3, 0) + jnp.where(b == 5, 4, 0)
                    + jnp.where(b >= 6, w6, 0))
        series = [is1.astype(jnp.int32), is2.astype(jnp.int32),
                  is4.astype(jnp.int32), w_simple, draws]
        cs = U._cumsum(jnp.stack(series, axis=-2), exclusive=True)
        cnt1, cnt2, cnt4 = cs[..., 0, :], cs[..., 1, :], cs[..., 2, :]
        reads1 = is1 & (cnt1 % 3 == 0)
        reads2 = is2 & (cnt2 % 3 == 0)
        reads4 = is4 & (cnt4 % 2 == 0)
        w = (jnp.where(reads1, 5, 0) + jnp.where(reads2, 7, 0)
             + jnp.where(reads4, 7, 0) + w_simple)
        offsets = (meta["man_off"][..., None]
                   + 5 * ((cnt1 + 2) // 3) + 7 * ((cnt2 + 2) // 3)
                   + 7 * ((cnt4 + 1) // 2) + cs[..., 3, :])
        return w, offsets, cs

    w, offsets, cs = timed("counts", counts, b, draws, wm)

    def gather(fu8, offsets, w):
        return extract_fields(
            fu8.reshape(L * F, MB),
            offsets.reshape(L * F, 6 * seg),
            w.reshape(L * F, 6 * seg)).reshape(L, S, seg)

    codes = timed("gather", gather, fu8, offsets, w)

    def qv_phase(codes, b, cs):
        cnt1, cnt2, cnt4 = cs[..., 0, :], cs[..., 1, :], cs[..., 2, :]
        is1 = b == 1
        is2 = b == 2
        is4 = b == 4
        reads1 = is1 & (cnt1 % 3 == 0)
        reads2 = is2 & (cnt2 % 3 == 0)
        reads4 = is4 & (cnt4 % 2 == 0)
        w6 = jnp.where(b == 15, 16, jnp.where(b == 14, 14, b - 1))
        slot_no = jnp.arange(seg, dtype=jnp.int32)
        pk = jnp.stack(
            [jnp.where(r, (slot_no << 7) | codes, -1)
             for r in (reads1, reads2, reads4)], axis=-2)
        led = jax.lax.cummax(pk, axis=pk.ndim - 1) & 127
        c1, c2, c4 = led[..., 0, :], led[..., 1, :], led[..., 2, :]
        m1 = cnt1 % 3
        d1 = jnp.where(m1 == 0, c1 // 9,
                       jnp.where(m1 == 1, (c1 % 9) // 3, c1 % 3))
        m2 = cnt2 % 3
        d2 = jnp.where(m2 == 0, c2 // 25,
                       jnp.where(m2 == 1, (c2 % 25) // 5, c2 % 5))
        m4 = cnt4 % 2
        d4 = jnp.where(m4 == 0, c4 // 11, c4 % 11)
        sv = codes - ((codes >> (jnp.maximum(w6, 1) - 1))
                      << jnp.maximum(w6, 1))
        v6 = (sv << (16 - jnp.maximum(w6, 1))).astype(jnp.float32)
        qv = jnp.where(is1 & (c1 < 27), U._chain(d1, U._LVL3),
             jnp.where(is2 & (c2 < 125), U._chain(d2, U._LVL5),
             jnp.where(b == 3, U._chain(codes, U._LVL7),
             jnp.where(is4 & (c4 < 121), U._chain(d4, U._LVL11),
             jnp.where(b == 5, U._chain(codes, U._LVL15),
                       jnp.where(b >= 6, v6, 0.0))))))
        return qv

    qv = timed("qv", qv_phase, codes, b, cs)

    def mant_full(fu8, exp, bap, cplco, meta, dp):
        return U.unpack_mantissas(fu8, exp, bap, cplco, meta, dp, plan)[0]

    timed("mant", mant_full, fu8, exp, bap, cplco, wm, carry["dpos"])


if __name__ == "__main__":
    main()
