"""Hardware ablation probe for the fused MXU kernel (4K->8K a=3).

Reproduces the docs/KERNEL.md §6.1 bf16 ceiling table AND the fp32
split-merge measurements on the real chip:

    PYTHONPATH=/root/.axon_site:. python tools/ablate_mxu.py \
        128:full 128:notrunc 128:stackh 128:manout 128:band3 \
        128:rollband 96:full 64:full 240:full \
        128:f32full 128:f32mstack 128:f32nstack \
        128:f32novertlo 128:f32nomidlo 128:f32nowhlo 128:swpipe

Each spec is ``tile:variant``; variants delete or restructure one stage
of an exact replica of ops/resample_pallas.py's MXU kernel so the
exposed cost of that stage is measurable.  ``full`` is the bf16
production structure; ``f32full`` is the round-3 fp32 hi+lo split (two
vertical + three horizontal dependent dots) and ``f32mstack`` the
round-4 production M-merged form.  Outputs are asserted equal to the
first variant run where semantics are unchanged ("matches full") —
the f32no* variants intentionally drop correction terms.  TPU-only."""
import functools, sys, time
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lanczos_tpu.core.config import Profile, ResampleConfig, Precision
from lanczos_tpu.ops.resample_pallas import _mxu_plan, _split_bf16, _round_up
from lanczos_tpu.utils.profiling import readback_cost, steady_time

cfg = ResampleConfig.from_profile(
    Profile.PRECISE, (2160, 3840), out_shape=(4320, 7680), a=3,
    precision=Precision.BF16,
)
OH, OW = cfg.out_shape
IH, W = 2160, 3840


def make_kernel(mx, variant):
    def kernel(img_ref, wv, wh, out_ref, band, sems, stk):
        n_i = mx.num_tiles
        c = pl.program_id(0)
        i = pl.program_id(1)
        band_lin = c * n_i + i
        bands_total = pl.num_programs(0) * n_i

        def dma_for(band_idx, slot):
            cc = band_idx // n_i
            ii = band_idx % n_i
            lo = ii * mx.tile_out
            raw = (2 * lo * mx.dv + mx.off_v) // (2 * mx.nv) - mx.back_v
            raw = jnp.clip(raw, 0, mx.ih_eff - mx.kv)
            start = pl.multiple_of((raw // 8) * 8, 8)
            return pltpu.make_async_copy(
                img_ref.at[cc, pl.ds(start, mx.kv), :],
                band.at[pl.ds(slot * mx.kv, mx.kv)],
                sems.at[slot],
            )

        nslots = 3 if variant == "band3" else 2
        slot = band_lin % nslots

        if variant == "rollband":
            # only DMA the rows the previous band does not already hold:
            # copy the overlap from the resident slot, fetch the rest.
            def start_of(ii):
                lo = ii * mx.tile_out
                raw = (2 * lo * mx.dv + mx.off_v) // (2 * mx.nv) - mx.back_v
                raw = jnp.clip(raw, 0, mx.ih_eff - mx.kv)
                return pl.multiple_of((raw // 8) * 8, 8)

            def dma_part(band_idx, slot_idx, keep):
                cc = band_idx // n_i
                ii = band_idx % n_i
                st = start_of(ii)
                return pltpu.make_async_copy(
                    img_ref.at[cc, pl.ds(st + keep, mx.kv - keep), :],
                    band.at[pl.ds(slot_idx * mx.kv + keep, mx.kv - keep)],
                    sems.at[slot_idx],
                )

            ii_c = band_lin % n_i
            # deltas alternate 64/56 (60 % 8 != 0; starts floor to 8)
            PARS = ((1, mx.kv - 64), (0, mx.kv - 56))

            @pl.when(band_lin == 0)
            def _():
                dma_for(0, 0).start()

            # wait with the SAME byte count the issuing step used
            @pl.when(ii_c == 0)
            def _():
                dma_for(band_lin, slot).wait()

            for par, keep in PARS:
                @pl.when((ii_c != 0) & (ii_c % 2 == par))
                def _(keep=keep):
                    dma_part(band_lin, slot, keep).wait()

            nxt = band_lin + 1
            ii_n = nxt % n_i
            nslot = nxt % 2

            @pl.when((nxt < bands_total) & (ii_n == 0))
            def _():
                dma_for(nxt, nslot).start()

            for par, keep in PARS:
                @pl.when((nxt < bands_total) & (ii_n != 0) & (ii_n % 2 == par))
                def _(keep=keep):
                    src = pl.ds(slot * mx.kv + mx.kv - keep, keep)
                    dst = pl.ds(nslot * mx.kv, keep)
                    band[dst] = band[src]
                    dma_part(nxt, nslot, keep).start()

            xb = band[pl.ds(pl.multiple_of(slot * mx.kv, 8), mx.kv)]
            xb = xb.astype(jnp.int32).astype(jnp.bfloat16)
            mid = jnp.dot(wv[0], xb, preferred_element_type=jnp.float32)
            m_hi = mid.astype(jnp.bfloat16)
            t = mx.tile_out
            cb = mx.cb
            for b in range(mx.n_cb):
                st = mx.starts_h[b]
                acc = jnp.dot(m_hi[:, st : st + mx.kh], wh[mx.uniq_h[b]],
                              preferred_element_type=jnp.float32)
                qv = jnp.trunc(jnp.clip(acc, 0.0, 255.0)).astype(jnp.int32)
                out_ref[0, :, b * cb : (b + 1) * cb] = qv.astype(jnp.uint8)
            return

        @pl.when(band_lin == 0)
        def _():
            dma_for(0, 0).start()
            if nslots == 3:
                dma_for(1, 1).start()
                dma_for(2, 2).start()

        if nslots == 3:
            @pl.when((band_lin + 2 < bands_total) & (band_lin > 0))
            def _():
                dma_for(band_lin + 2, (band_lin + 2) % 3).start()
        else:
            @pl.when(band_lin + 1 < bands_total)
            def _():
                dma_for(band_lin + 1, (band_lin + 1) % 2).start()

        dma_for(band_lin, slot).wait()

        def dot(a, b):
            return jnp.dot(a, b, preferred_element_type=jnp.float32)

        xb = band[pl.ds(pl.multiple_of(slot * mx.kv, 8), mx.kv)]
        xb = xb.astype(jnp.int32).astype(jnp.bfloat16)
        if variant == "f32nstack":
            # one dot per block: LHS [m_hi; m_lo] (2t, kh), RHS
            # [Wh_hi | Wh_lo] (kh, 2cb); the m_lo x Wh_lo quadrant is
            # wasted MACs (~2^-32 relative, discarded) but the merged
            # (2t, kh, 2cb) shape keeps the MXU busier than three
            # dependent small dots
            t = mx.tile_out
            mid2 = dot(wv[0], xb)
            mid = mid2[:t] + mid2[t:]
            m_hi = mid.astype(jnp.bfloat16)
            m_lo = (mid - m_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            M2 = jnp.concatenate([m_hi, m_lo], axis=0)
            cbw = mx.cb
            for b in range(mx.n_cb):
                st = mx.starts_h[b]
                u = mx.uniq_h[b]
                PR = dot(M2[:, st : st + mx.kh], wh[u])  # (2t, 2cb)
                acc = PR[:t, :cbw] + PR[t:, :cbw] + PR[:t, cbw:]
                qv = jnp.trunc(jnp.clip(acc, 0.0, 255.0)).astype(jnp.int32)
                out_ref[0, :, b * cbw : (b + 1) * cbw] = qv.astype(jnp.uint8)
            return
        if variant == "f32mstack":
            # hi+lo merged along M: vertical 2 dots -> 1 (wv prestacked
            # (1, 2t, kv)), horizontal 3 dots -> 2 per block (concat
            # [m_hi; m_lo] once per tile along sublanes)
            t = mx.tile_out
            mid2 = dot(wv[0], xb)  # (2t, W)
            mid = mid2[:t] + mid2[t:]
            m_hi = mid.astype(jnp.bfloat16)
            m_lo = (mid - m_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            M2 = jnp.concatenate([m_hi, m_lo], axis=0)  # (2t, W)
            for b in range(mx.n_cb):
                st = mx.starts_h[b]
                u = mx.uniq_h[b]
                m2s = M2[:, st : st + mx.kh]
                P = dot(m2s, wh[2 * u])  # (2t, cb)
                acc = P[:t] + P[t:] + dot(m2s[:t], wh[2 * u + 1])
                qv = jnp.trunc(jnp.clip(acc, 0.0, 255.0)).astype(jnp.int32)
                out_ref[0, :, b * mx.cb : (b + 1) * mx.cb] = qv.astype(
                    jnp.uint8
                )
            return
        if variant.startswith("f32"):
            # production fp32 path: hi+lo weight splits (wv block is
            # (1, 2, t, kv); wh rows interleave hi/lo per unique id)
            mid = dot(wv[0, 0], xb)
            if variant != "f32novertlo":
                mid = mid + dot(wv[0, 1], xb)
            m_hi = mid.astype(jnp.bfloat16)
            m_lo = (mid - m_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            for b in range(mx.n_cb):
                st = mx.starts_h[b]
                u = mx.uniq_h[b]
                xh = m_hi[:, st : st + mx.kh]
                acc = dot(xh, wh[2 * u])
                if variant != "f32nomidlo":
                    acc = acc + dot(m_lo[:, st : st + mx.kh], wh[2 * u])
                if variant != "f32nowhlo":
                    acc = acc + dot(xh, wh[2 * u + 1])
                qv = jnp.trunc(jnp.clip(acc, 0.0, 255.0)).astype(jnp.int32)
                out_ref[0, :, b * mx.cb : (b + 1) * mx.cb] = qv.astype(jnp.uint8)
            return
        if variant == "bfmid":
            m_hi = jnp.dot(wv[0], xb, preferred_element_type=jnp.bfloat16)
        else:
            mid = dot(wv[0], xb)
            m_hi = mid.astype(jnp.bfloat16)
        t = mx.tile_out
        cb = mx.cb

        def q(acc):
            if variant == "notrunc":
                return jnp.clip(acc, 0.0, 255.0).astype(jnp.int32).astype(
                    jnp.uint8
                )
            return jnp.trunc(jnp.clip(acc, 0.0, 255.0)).astype(
                jnp.int32
            ).astype(jnp.uint8)

        if variant == "stackh":
            groups = {}
            for b in range(mx.n_cb):
                groups.setdefault(mx.uniq_h[b], []).append(b)
            for u, bs in groups.items():
                if len(bs) == 1:
                    b = bs[0]
                    st = mx.starts_h[b]
                    acc = dot(m_hi[:, st : st + mx.kh], wh[u])
                    out_ref[0, :, b * cb : (b + 1) * cb] = q(acc)
                    continue
                for j, b in enumerate(bs):
                    st = mx.starts_h[b]
                    stk[pl.ds(j * t, t)] = m_hi[:, st : st + mx.kh]
                xs = stk[pl.ds(0, len(bs) * t)]
                acc = dot(xs, wh[u])
                qa = q(acc)
                for j, b in enumerate(bs):
                    out_ref[0, :, b * cb : (b + 1) * cb] = qa[
                        j * t : (j + 1) * t
                    ]
            return

        if variant == "manout":
            oslot = band_lin % 2

            def ocopy(step):
                cc = step // n_i
                ii = step % n_i
                return pltpu.make_async_copy(
                    stk.at[step % 2],
                    out_ref.at[cc, pl.ds(ii * t, t), :],
                    sems.at[2 + step % 2],
                )

            @pl.when(band_lin >= 2)
            def _():
                ocopy(band_lin - 2).wait()

            for b in range(mx.n_cb):
                st = mx.starts_h[b]
                acc = dot(m_hi[:, st : st + mx.kh], wh[mx.uniq_h[b]])
                stk[oslot, :, b * cb : (b + 1) * cb] = q(acc)
            ocopy(band_lin).start()

            @pl.when(band_lin == bands_total - 1)
            def _():
                ocopy(band_lin - 1).wait()
                ocopy(band_lin).wait()
            return

        for b in range(mx.n_cb):
            st = mx.starts_h[b]
            acc = dot(m_hi[:, st : st + mx.kh], wh[mx.uniq_h[b]])
            out_ref[0, :, b * cb : (b + 1) * cb] = q(acc)

    return kernel


def make_swpipe_kernel(mx, bands_total):
    """Software-pipelined COMPUTE across grid steps (round-4 verdict #2a):
    a flat grid where step s runs band s's VERTICAL dot into a
    double-buffered bf16 mid scratch and band s-1's HORIZONTAL dots out
    of the other slot — the horizontal work carries no dependency on
    step s's DMA or vertical result, and is issued BEFORE the DMA wait,
    so it can hide under the in-flight band fetch (the compute analog of
    the DMA prefetch; all measured dead ends were DMA-side)."""
    t = mx.tile_out
    cb = mx.cb
    n_i = mx.num_tiles

    def kernel(img_ref, wv, wh, out_ref, band, sems, midbuf):
        s = pl.program_id(0)

        def dma_for(band_idx, slot):
            cc = band_idx // n_i
            ii = band_idx % n_i
            lo = ii * mx.tile_out
            raw = (2 * lo * mx.dv + mx.off_v) // (2 * mx.nv) - mx.back_v
            raw = jnp.clip(raw, 0, mx.ih_eff - mx.kv)
            start = pl.multiple_of((raw // 8) * 8, 8)
            return pltpu.make_async_copy(
                img_ref.at[cc, pl.ds(start, mx.kv), :],
                band.at[pl.ds(slot * mx.kv, mx.kv)],
                sems.at[slot],
            )

        slot = s % 2

        @pl.when(s == 0)
        def _():
            dma_for(0, 0).start()

        @pl.when(s + 1 < bands_total)
        def _():
            dma_for(s + 1, (s + 1) % 2).start()

        def dot(a, b):
            return jnp.dot(a, b, preferred_element_type=jnp.float32)

        # horizontal pass for band s-1: reads only the OTHER mid slot —
        # no data dependency on this step's DMA or vertical dot
        @pl.when(s > 0)
        def _():
            m_hi = midbuf[pl.ds(pl.multiple_of((1 - slot) * t, 8), t)]
            for b in range(mx.n_cb):
                st = mx.starts_h[b]
                acc = dot(m_hi[:, st : st + mx.kh], wh[mx.uniq_h[b]])
                qv = jnp.trunc(jnp.clip(acc, 0.0, 255.0)).astype(jnp.int32)
                out_ref[0, :, b * cb : (b + 1) * cb] = qv.astype(jnp.uint8)

        # vertical pass for band s into this step's mid slot
        @pl.when(s < bands_total)
        def _():
            dma_for(s, slot).wait()
            xb = band[pl.ds(pl.multiple_of(slot * mx.kv, 8), mx.kv)]
            xb = xb.astype(jnp.int32).astype(jnp.bfloat16)
            mid = dot(wv[0], xb)
            midbuf[pl.ds(pl.multiple_of(slot * t, 8), t)] = mid.astype(
                jnp.bfloat16
            )

    return kernel


def build_swpipe(tile):
    mx = _mxu_plan(cfg, tile)
    if mx is None:
        print(f"tile {tile}: plan infeasible", flush=True)
        return None, None
    wv_hi, _ = _split_bf16(mx.wv)
    wh_hi, _ = _split_bf16(mx.wh)
    nu = wh_hi.shape[0]
    w_eff = _round_up(W, 128)
    n_i = mx.num_tiles
    bands_total = 12 * n_i
    fn = pl.pallas_call(
        make_swpipe_kernel(mx, bands_total),
        grid=(bands_total + 1,),  # one extra step drains the last band
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [
            pl.BlockSpec(
                (1, wv_hi.shape[1], mx.kv),
                lambda s: (s % n_i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (nu, mx.kh, wh_hi.shape[2]),
                lambda s: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, mx.tile_out, mx.n_cb * mx.cb),
            lambda s: (
                jnp.maximum(s - 1, 0) // n_i,
                jnp.maximum(s - 1, 0) % n_i,
                0,
            ),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((12, OH, OW), jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((2 * mx.kv, w_eff), jnp.uint8),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.VMEM((2 * mx.tile_out, w_eff), jnp.bfloat16),
        ],
    )
    return jax.jit(lambda x: fn(x, wv_hi, wh_hi)), mx


def build(tile, variant):
    if variant == "swpipe":
        return build_swpipe(tile)
    mx = _mxu_plan(cfg, tile)
    if mx is None:
        print(f"tile {tile}: plan infeasible", flush=True)
        return None, None
    wv_hi, wv_lo = _split_bf16(mx.wv)
    wh_hi, wh_lo = _split_bf16(mx.wh)
    if variant == "f32nstack":
        import numpy as _np

        wv_hi = _np.concatenate([wv_hi, wv_lo], axis=1)  # (nt, 2t, kv)
        wh_hi = _np.concatenate([wh_hi, wh_lo], axis=2)  # (nu, kh, 2cb)
    elif variant == "f32mstack":
        import numpy as _np

        wv_hi = _np.concatenate([wv_hi, wv_lo], axis=1)  # (nt, 2t, kv)
        wh_hi = _np.stack([wh_hi, wh_lo], axis=1).reshape(
            -1, *wh_hi.shape[1:]
        )
    elif variant.startswith("f32"):
        import numpy as _np

        wv_hi = _np.stack([wv_hi, wv_lo], axis=1)  # (nt, 2, t, kv)
        wh_hi = _np.stack([wh_hi, wh_lo], axis=1).reshape(
            -1, *wh_hi.shape[1:]
        )  # (2nu, kh, cb) interleaved hi/lo
    nu = wh_hi.shape[0]
    w_eff = _round_up(W, 128)
    nstack = max(
        sum(1 for u in mx.uniq_h if u == uu) for uu in set(mx.uniq_h)
    )
    fn = pl.pallas_call(
        make_kernel(mx, variant),
        grid=(12, mx.num_tiles),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [
            (
                pl.BlockSpec(
                    (1, 2, wv_hi.shape[2], mx.kv),
                    lambda c, i: (i, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                )
                if variant.startswith("f32") and variant not in ("f32mstack", "f32nstack")
                else pl.BlockSpec(
                    (1, wv_hi.shape[1], mx.kv), lambda c, i: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            )
        ]
        + [
            pl.BlockSpec(
                (nu, mx.kh, wh_hi.shape[2]), lambda c, i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY)
            if variant == "manout"
            else pl.BlockSpec(
                (1, mx.tile_out, mx.n_cb * mx.cb), lambda c, i: (c, i, 0),
                memory_space=pltpu.VMEM,
            )
        ),
        out_shape=jax.ShapeDtypeStruct((12, OH, OW), jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM(((3 if variant == "band3" else 2) * mx.kv, w_eff), jnp.uint8),
            pltpu.SemaphoreType.DMA((4,)),
            (
                pltpu.VMEM((2, mx.tile_out, mx.n_cb * mx.cb), jnp.uint8)
                if variant == "manout"
                else pltpu.VMEM((nstack * mx.tile_out, mx.kh), jnp.bfloat16)
            ),
        ],
    )
    return jax.jit(lambda x: fn(x, wv_hi, wh_hi)), mx


rng = np.random.default_rng(0)
img = jnp.asarray(rng.integers(0, 256, (12, IH, W), np.uint8))
rb = readback_cost()
print(f"rb {rb*1e3:.0f} ms", flush=True)
ref_out = None
EXPECT_DIFF = {"f32novertlo", "f32nomidlo", "f32nowhlo", "rollband"}
mismatches = []
KNOWN = {
    "full", "notrunc", "stackh", "manout", "band3", "rollband", "bfmid",
    "f32full", "f32mstack", "f32nstack", "f32novertlo", "f32nomidlo",
    "f32nowhlo", "swpipe",
}
for spec in sys.argv[1:] or ["128:full"]:
    tile_s, variant = spec.split(":")
    if variant not in KNOWN:
        sys.exit(f"unknown variant {variant!r}; known: {sorted(KNOWN)}")
    if variant == "rollband" and int(tile_s) != 128:
        sys.exit("rollband's partial-DMA deltas are hardcoded for the "
                 "tile-128 4K->8K plan (tile_out=120, kv=80)")
    fn, mx = build(int(tile_s), variant)
    if fn is None:
        continue
    t0 = time.time()
    out = fn(img)
    out.block_until_ready()
    print(f"{spec}: tile_out={mx.tile_out} ntiles={mx.num_tiles} "
          f"compiled {time.time()-t0:.0f}s", flush=True)
    if ref_out is None:
        ref_out = np.asarray(out[0])
    else:
        same = np.array_equal(np.asarray(out[0]), ref_out)
        print(f"{spec}: matches full: {same}", flush=True)
        # variants that drop correction terms (f32no*) or are known-wrong
        # dead ends (rollband) legitimately differ; everything else must
        # be bit-identical to the first spec run
        if not same and variant not in EXPECT_DIFF:
            mismatches.append(spec)
    dt = steady_time(fn, img, iters=24, rb_cost=rb) / 4
    print(f"{spec}: {dt*1e3:.3f} ms/frame", flush=True)

if mismatches:
    sys.exit(f"output mismatch vs the first spec: {mismatches}")
