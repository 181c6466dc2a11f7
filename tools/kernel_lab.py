"""Kernel lab: compare pooled-lookup implementations on real hardware.

All timing is IN-GRAPH (lax.fori_loop with per-iteration index rotation and
full-output consumption): this environment's remote-execution tunnel dedups
repeated identical dispatches, so host-side timing loops report fantasy
numbers (measured: 26us/iter host-loop vs 27.7ms/iter in-graph for the same
lookup).  Run on the TPU:  python tools/kernel_lab.py
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def igtimer(lookup_fn, table, idx0, rotate_fn, iters):
    """In-graph timed loop: acc += sum(lookup(table, idx_i)); idx rotates.

    ``table`` (any pytree of device arrays) is a jit ARGUMENT — closing over
    a big device array turns it into a program constant shipped through the
    remote compiler (2.16GB constant -> 10+ min compiles; CLAUDE.md rule 3).
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(tbl, idx, n):
        # n traced -> single compile for warmup + timed run
        def body(i, carry):
            acc, idx_i = carry
            out = lookup_fn(tbl, idx_i)
            return acc + jnp.sum(out), rotate_fn(idx_i)

        acc, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(0), idx))
        return acc

    jax.block_until_ready(loop(table, idx0, 2))  # compile + warm
    t0 = time.perf_counter()
    jax.block_until_ready(loop(table, idx0, iters))
    return (time.perf_counter() - t0) / iters


def chaintimer(lookup_fn, table, idx0, rotate_fn, chain, reps):
    """Unrolled-chain timer for ops that cannot live inside lax.fori_loop
    (pallas_call inside fori_loop fails to compile through the remote Mosaic
    helper — CLAUDE.md rule 4).  One jitted program contains ``chain``
    sequential calls with per-call index rotation and sum-consumption (the
    same dedup defenses as igtimer); host timing brackets ``reps`` dispatches
    of that program and divides by chain*reps.  Identical kernel instances
    share one Mosaic compile, so the chain costs one ~5min compile total.
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(tbl, idx):
        acc = jnp.float32(0)
        for _ in range(chain):
            out = lookup_fn(tbl, idx)
            acc = acc + jnp.sum(out)
            idx = rotate_fn(idx)
        return acc

    rot = jax.jit(rotate_fn)
    jax.block_until_ready(chained(table, idx0))  # compile + warm
    # every dispatch gets a DISTINCT rotated index operand, so the tunnel
    # cannot dedup repeated executions; dispatches pipeline asynchronously
    idx_r = rot(idx0)
    t0 = time.perf_counter()
    accs = []
    for _ in range(reps):
        accs.append(chained(table, idx_r))
        idx_r = rot(idx_r)
    jax.block_until_ready(accs)
    return (time.perf_counter() - t0) / (chain * reps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=33_762_584)
    ap.add_argument("--dim", type=int, default=16)
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--tables", type=int, default=26)
    ap.add_argument("--pooling", type=int, default=1)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--only", type=str, default="")
    ap.add_argument("--zipf", type=float, default=0.0,
                    help="draw zipf(a) ids instead of uniform — the skewed "
                         "dup-rate regime for the dedup experiments "
                         "(VERDICT r3 item 5)")
    ap.add_argument("--nbuf", type=int, default=0, help="pallas nbuf override")
    ap.add_argument("--chain", type=int, default=8,
                    help="unrolled calls per dispatch for chain-timed ops")
    ap.add_argument("--reps", type=int, default=4,
                    help="dispatches of the chained program")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    n, d = args.rows, args.dim
    c = args.batch * args.tables * args.pooling  # total gathered rows
    print(f"rows={n} dim={d} gathers/iter={c}", file=sys.stderr)

    key = jax.random.PRNGKey(0)
    table = jax.jit(
        lambda k: jax.random.uniform(k, (n, d), jnp.float32, -0.1, 0.1)
    )(key)
    jax.block_until_ready(table)

    rng = np.random.default_rng(0)
    if args.zipf > 1.0:
        flat_np = np.minimum(rng.zipf(args.zipf, size=c) - 1, n - 1).astype(
            np.int32
        )
    else:
        flat_np = rng.integers(0, n, size=c).astype(np.int32)
    uniq = len(np.unique(flat_np))
    print(
        f"ids: {'zipf %.2f' % args.zipf if args.zipf > 1 else 'uniform'} "
        f"unique {uniq}/{c} ({uniq/c:.1%})",
        file=sys.stderr,
    )
    flat_idx = jnp.asarray(flat_np)
    # NOTE: the per-iteration rotation is a bijection (i+stride mod n), so
    # the DUPLICATE structure (and thus the dedup win/loss) is invariant
    # across iterations even though the hot ids move.
    stride = jnp.int32(n // 7 + 1)

    def rotate(i):
        return (i + stride) % n

    useful_mb = c * d * 4 / 1e6
    results = {}

    def report(name, dt):
        rate = c / dt
        gbps = useful_mb / dt / 1e3
        # speed-of-light check: a v5e chip has ~819 GB/s of HBM bandwidth;
        # any "useful GB/s" beyond ~1.5x that is a tunnel dedup/elision
        # artifact (observed: a pallas chain read 16µs = 16TB/s after the
        # remote executor deduped the repeated calls) — flag, don't trust.
        suspect = gbps > 1200
        if not suspect:
            results[name] = dt  # suspect points never become "BEST"
        print(
            f"{name:28s} {dt*1e6:9.1f} us  {rate/1e6:8.2f}M rows/s  "
            f"{gbps:6.2f} GB/s useful"
            f"{'  [SUSPECT: > HBM speed of light]' if suspect else ''}",
            file=sys.stderr,
        )

    def want(name):
        return not args.only or args.only in name

    if want("take"):
        report("take+pool", igtimer(
            lambda t, i: jnp.take(t, i, axis=0), table,
            flat_idx, rotate, args.iters))

    if want("csrseg"):
        # CSR bag pooling engines (r4): the CSR surface measured ~5x over
        # fixed-L at the capacity shape (capacity_bench: 7.1 vs 1.35 ms) —
        # where does it go?  Candidates for the [c, d] rows -> [B, d]
        # ragged reduce, same gather feeding all three:
        #   segseq  jax.ops.segment_sum (sorted ids)    — production today
        #   cumsum  prefix-sum rows, pooled = csum[off[b+1]] - csum[off[b]]
        #           (two tiny gathers; f32 cumsum error ~sqrt(L)*eps)
        #   fixedl  reshape+sum at the same shapes      — the dense floor
        bags = max(1, c // max(1, args.pooling))
        lfix = c // bags
        offs = jnp.arange(bags + 1, dtype=jnp.int32) * lfix

        def gather_rows(t, i):
            return jnp.take(t, i, axis=0)  # [c, d] f32

        def seg_pool(t, i):
            rows = gather_rows(t, i)
            seg = jnp.searchsorted(offs[1:], jnp.arange(c, dtype=jnp.int32),
                                   side="right")
            return jax.ops.segment_sum(
                rows, seg, num_segments=bags, indices_are_sorted=True
            )

        report("csrseg segsum searchsorted", igtimer(
            seg_pool, table, flat_idx, rotate, args.iters))

        def seg_pool_marks(t, i):
            # production formulation (ops/ragged.py r4): boundary scatter +
            # cumsum replaces the per-entry searchsorted while-loop
            from pim_embedding_lookup_tpu.ops.ragged import (
                segment_ids_from_offsets,
            )

            rows = gather_rows(t, i)
            seg = segment_ids_from_offsets(offs, c)
            return jax.ops.segment_sum(
                rows, seg, num_segments=bags + 1, indices_are_sorted=True
            )[:bags]

        report("csrseg segsum scatter-marks", igtimer(
            seg_pool_marks, table, flat_idx, rotate, args.iters))

        def cumsum_pool(t, i):
            rows = gather_rows(t, i)
            csum = jnp.concatenate(
                [jnp.zeros((1, rows.shape[1]), rows.dtype),
                 jnp.cumsum(rows, axis=0)]
            )
            return jnp.take(csum, offs[1:], axis=0) - jnp.take(
                csum, offs[:-1], axis=0
            )

        report("csrseg cumsum-diff", igtimer(
            cumsum_pool, table, flat_idx, rotate, args.iters))

        def fixedl_pool(t, i):
            rows = gather_rows(t, i)
            return rows.reshape(bags, lfix, -1).sum(axis=1)

        report("csrseg fixed-L reshape", igtimer(
            fixedl_pool, table, flat_idx, rotate, args.iters))

    if want("csrnarrow") and 128 % d == 0 and d < 128:
        # Narrow-dim CSR reduce (r4): at dim 16 the CSR path costs 2.2x over
        # dense (bench --wire csr) while dim-64 costs 1.16x.  Candidates for
        # the packed-storage [S, 128] ragged pool at single-hot:
        #   narrow  (prod)  one-hot lane-select einsum -> [c, d] segsum
        #   wide            lane-mask multiply -> [c, 128] segsum -> fold
        #                   (scatter rows pad to 128 lanes internally, so
        #                   the wide reduce moves the same physical bytes
        #                   but does useful work in every lane)
        pack_n = 128 // d
        S_n = ((n + pack_n - 1) // pack_n * pack_n) // pack_n
        tpn = jax.jit(
            lambda k: jax.random.uniform(k, (S_n, 128), jnp.float32, -0.1, 0.1)
        )(key)
        jax.block_until_ready(tpn)
        bags_n = c  # single-hot
        from pim_embedding_lookup_tpu.ops.ragged import (
            segment_ids_from_offsets as _sio,
        )

        offs_n = jnp.arange(bags_n + 1, dtype=jnp.int32)

        def narrow(t, i):
            wide = jnp.take(t, i // pack_n, axis=0)  # [c, 128]
            g = jax.nn.one_hot(i % pack_n, pack_n, dtype=wide.dtype)
            rows = jnp.einsum(
                "cpd,cp->cd", wide.reshape(c, pack_n, d), g,
                preferred_element_type=jnp.float32,
            )
            seg = _sio(offs_n, c)
            return jax.ops.segment_sum(
                rows, seg, num_segments=bags_n + 1, indices_are_sorted=True
            )[:bags_n]

        report("csrnarrow einsum+narrow-seg", igtimer(
            narrow, tpn, flat_idx, rotate, args.iters))

        def wide_fold(t, i):
            wide = jnp.take(t, i // pack_n, axis=0)  # [c, 128]
            lane = jax.lax.broadcasted_iota(jnp.int32, (c, 128), 1)
            mask = (lane // d) == (i % pack_n)[:, None]
            masked = wide * mask.astype(wide.dtype)
            seg = _sio(offs_n, c)
            pooled = jax.ops.segment_sum(
                masked, seg, num_segments=bags_n + 1, indices_are_sorted=True
            )[:bags_n]
            return pooled.reshape(bags_n, pack_n, d).sum(axis=1)

        report("csrnarrow mask+wide-seg+fold", igtimer(
            wide_fold, tpn, flat_idx, rotate, args.iters))

        def dense_floor(t, i):
            wide = jnp.take(t, i // pack_n, axis=0)
            g = jax.nn.one_hot(i % pack_n, pack_n, dtype=wide.dtype)
            return jnp.einsum(
                "cpd,cp->cd", wide.reshape(c, pack_n, d), g,
                preferred_element_type=jnp.float32,
            )  # single-hot dense: pooled == rows

        report("csrnarrow dense single-hot", igtimer(
            dense_floor, tpn, flat_idx, rotate, args.iters))

    if want("dedupk"):
        # Gather-side K-capacity sorted-unique dedup (VERDICT r3 item 5):
        # sort the c ids, rank each entry by its unique id, compress the
        # first occurrences into a K-slot id buffer (ranks >= K clamp to
        # slot K-1 — a TIMING harness, not an exact kernel; the unique
        # fraction above says how large K must be for exactness), gather
        # only K rows from HBM, then reconstruct per-entry rows with two
        # SMALL-operand gathers ([K,d] rank-select + [c,d] unsort).  Wins
        # iff sort + 2 small gathers < (c-K) HBM gather issues.
        for kfrac in (2, 4):
            kcap = c // kfrac

            def dedup_gather(t, i, kcap=kcap):
                order = jnp.argsort(i)
                si = jnp.take(i, order)
                newu = jnp.concatenate(
                    [jnp.ones((1,), jnp.int32),
                     (si[1:] != si[:-1]).astype(jnp.int32)]
                )
                rank = jnp.cumsum(newu) - 1  # [c] unique rank (sorted order)
                uidbuf = jnp.zeros((kcap,), jnp.int32).at[
                    jnp.where(rank < kcap, rank, kcap)
                ].set(si, mode="drop")
                rows_u = jnp.take(t, uidbuf, axis=0)  # K HBM gathers
                vals_sorted = jnp.take(
                    rows_u, jnp.minimum(rank, kcap - 1), axis=0
                )  # c gathers from a K-row operand
                inv = jnp.zeros((c,), jnp.int32).at[order].set(
                    jnp.arange(c, dtype=jnp.int32)
                )
                return jnp.take(vals_sorted, inv, axis=0)  # entry order

            report(f"dedup-gather K=c/{kfrac}", igtimer(
                dedup_gather, table, flat_idx, rotate, args.iters))

        # issue-rate probe: the SAME c gather issues against a c/2-row
        # operand — if this is not much faster than the 33M-row take, the
        # gather wall is ISSUE RATE, not operand locality, and no dedup
        # reconstruction can win
        small = jax.jit(
            lambda k: jax.random.uniform(k, (c // 2, d), jnp.float32)
        )(key)
        jax.block_until_ready(small)
        report("take from c/2-row operand", igtimer(
            lambda t, i: jnp.take(t, i % (c // 2), axis=0), small,
            flat_idx, rotate, args.iters))

    if want("sorted"):
        report("sort+take", igtimer(
            lambda t, i: jnp.take(t, jnp.sort(i), axis=0), table,
            flat_idx, rotate, args.iters))

    if want("pallas"):
        from pim_embedding_lookup_tpu.ops.pallas_lookup import (
            pallas_embedding_bag_csr,
        )

        bsz = args.batch * args.tables  # bags
        offsets = jnp.arange(bsz + 1, dtype=jnp.int32) * args.pooling
        variants = [(8, args.nbuf)] if args.nbuf else [(8, 8), (8, 16), (8, 32)]
        for tile_b, nbuf in variants:
            try:
                dt = igtimer(
                    lambda t, i: pallas_embedding_bag_csr(
                        t, i, offsets, batch_size=bsz,
                        tile_b=tile_b, nbuf=nbuf,
                    ),
                    table, flat_idx, rotate, args.iters,
                )
                report(f"pallas tb={tile_b} nbuf={nbuf}", dt)
            except Exception as e:
                print(f"pallas tb={tile_b} nbuf={nbuf} FAILED: "
                      f"{type(e).__name__}: {str(e)[:200]}", file=sys.stderr)

    if want("pallaschain"):
        # Honest pallas device timing (VERDICT r1 item 2): pallas_call inside
        # lax.fori_loop fails to compile remotely, so time an unrolled CHAIN
        # of calls vs the identically-harnessed XLA path.  dim<128 uses the
        # lane-packed kernel over persistent [S,128] storage; dim%128==0 uses
        # the row-DMA kernel.
        from pim_embedding_lookup_tpu.ops.pallas_lookup import (
            pallas_embedding_bag_fixedl,
        )

        bsz = args.batch * args.tables  # bags
        L = args.pooling
        offsets = jnp.arange(bsz + 1, dtype=jnp.int32) * L
        if d < 128 and 128 % d == 0:
            pack = 128 // d
            S = (n + pack - 1) // pack
            storage = jax.jit(
                lambda k: jax.random.uniform(k, (S, 128), jnp.float32, -0.1, 0.1)
            )(key)

            def xla_ref(t, i):
                rows = jnp.take(t, i // pack, axis=0)  # [c, 128]
                g = jax.nn.one_hot(i % pack, pack, dtype=jnp.float32)
                picked = jnp.einsum(
                    "cpd,cp->cd", rows.reshape(-1, pack, d), g,
                    preferred_element_type=jnp.float32,
                )
                return picked.reshape(bsz, L, d).sum(axis=1)
        else:
            storage = table

            def xla_ref(t, i):
                return jnp.take(t, i, axis=0).reshape(bsz, L, d).sum(axis=1)
        jax.block_until_ready(storage)

        report("chain xla ref", chaintimer(
            xla_ref, storage, flat_idx, rotate, args.chain, args.reps))
        variants = ([(64, args.nbuf), (256, args.nbuf)] if args.nbuf
                    else [(8, 8), (8, 16), (64, 32)])
        for tile_b, nbuf in variants:
            try:
                dt = chaintimer(
                    lambda t, i, tb=tile_b, nb=nbuf:
                    pallas_embedding_bag_fixedl(
                        t, d, i, pooling=L, batch_size=bsz, tile_b=tb,
                        nbuf=nb,
                    ),
                    storage, flat_idx, rotate, args.chain, args.reps,
                )
                report(f"chain pallas tb={tile_b} nbuf={nbuf}", dt)
            except Exception as e:
                print(f"chain pallas tb={tile_b} nbuf={nbuf} FAILED: "
                      f"{type(e).__name__}: {str(e)[:300]}", file=sys.stderr)

    if want("packed") and 128 % d == 0 and d < 128:
        # Lane-packed gather: store pack=128//d consecutive rows side-by-side
        # in one 128-lane storage row; gather id//pack, then select the
        # d-lane group id%pack on the VPU.  Gathers are issue-rate bound
        # (~21-26ns/row at dim 16 AND dim 128), so this cuts issues by 8x.
        pack = 128 // d
        npad = (n + pack - 1) // pack * pack
        # Build the packed table directly at [npad/pack, 128]: reshaping the
        # [N, 16] original on-device OOMs (the padded copy gets a T(8,128)
        # tiled layout, 8x inflation).  Contents don't matter for timing.
        tp = jax.jit(
            lambda k: jax.random.uniform(
                k, (npad // pack, pack * d), jnp.float32, -0.1, 0.1
            )
        )(key)
        jax.block_until_ready(tp)

        def packed_einsum(t, i):
            rows = jnp.take(t, i // pack, axis=0)  # [c, 128]
            g = jax.nn.one_hot(i % pack, pack, dtype=jnp.float32)  # [c, pack]
            return jnp.einsum(
                "cpd,cp->cd", rows.reshape(-1, pack, d), g,
                preferred_element_type=jnp.float32,
            )

        report("packed einsum", igtimer(packed_einsum, tp, flat_idx, rotate,
                                        args.iters))

        def packed_take(t, i):
            rows = jnp.take(t, i // pack, axis=0).reshape(-1, pack, d)
            return jnp.take_along_axis(
                rows, (i % pack)[:, None, None], axis=1
            )[:, 0, :]

        report("packed take_along", igtimer(packed_take, tp, flat_idx, rotate,
                                            args.iters))

        tpb = jax.jit(lambda t: t.astype(jnp.bfloat16))(tp)
        jax.block_until_ready(tpb)

        def packed_bf16(t, i):
            rows = jnp.take(t, i // pack, axis=0)
            g = jax.nn.one_hot(i % pack, pack, dtype=jnp.bfloat16)
            return jnp.einsum(
                "cpd,cp->cd", rows.reshape(-1, pack, d), g,
                preferred_element_type=jnp.float32,
            )

        report("packed bf16 einsum", igtimer(packed_bf16, tpb, flat_idx,
                                             rotate, args.iters))

    if want("sdk") and 128 % d == 0 and d < 128:
        # Scatter-side dedup at the CURRENT id distribution (pair with
        # --zipf for the skewed regime; VERDICT r3 item 5) — the minimal
        # raw-vs-sort-vs-sort+dedup triple without the full scatter grid.
        pack_ = 128 // d
        S_ = ((n + pack_ - 1) // pack_ * pack_) // pack_
        tp_ = jax.jit(
            lambda k: jax.random.uniform(k, (S_, 128), jnp.float32, -0.1, 0.1)
        )(key)
        jax.block_until_ready(tp_)
        u128_ = jnp.asarray(
            rng.standard_normal((c, 128)).astype(np.float32) * 1e-4
        )

        def sdk_timer(step_fn):
            @jax.jit
            def loop(tbl, idx, u128, nn):
                def body(i, carry):
                    tbl, idx_i = carry
                    return step_fn(tbl, idx_i, u128), rotate(idx_i)

                tbl, _ = jax.lax.fori_loop(0, nn, body, (tbl, idx))
                return jnp.sum(tbl[:8])

            jax.block_until_ready(loop(tp_, flat_idx, u128_, 2))
            t0 = time.perf_counter()
            jax.block_until_ready(loop(tp_, flat_idx, u128_, args.iters))
            return (time.perf_counter() - t0) / args.iters

        report("sdk scatter raw128", sdk_timer(
            lambda tbl, i, u: tbl.at[i // pack_].add(u, mode="drop")))
        report("sdk scatter sorted", sdk_timer(
            lambda tbl, i, u: tbl.at[jnp.sort(i) // pack_].add(
                u, mode="drop", indices_are_sorted=True)))

        def sdk_dedup(tbl, i, u):
            order = jnp.argsort(i)
            sid = jnp.take(i, order) // pack_
            su = jnp.take(u, order, axis=0)
            newseg = jnp.concatenate(
                [jnp.zeros((1,), jnp.int32),
                 (sid[1:] != sid[:-1]).astype(jnp.int32)]
            )
            seg = jnp.cumsum(newseg)
            rows = jax.ops.segment_sum(su, seg, num_segments=c)
            uid = jax.ops.segment_max(sid, seg, num_segments=c)
            # segment_max identity for int32 is iinfo.min — `uid < 0`
            # keeps valid storage row 0 (a prior `<= 0` dropped the hottest
            # zipf row's updates, biasing the dedup comparison)
            uid = jnp.where(uid < 0, S_, uid)
            return tbl.at[uid].add(
                rows, mode="drop", indices_are_sorted=True,
                unique_indices=True,
            )

        report("sdk scatter sort+dedup", sdk_timer(sdk_dedup))

    if want("scatter") and 128 % d == 0 and d < 128:
        # Scatter-add experiments on packed storage [S, 128]: the training
        # bottleneck (measured ~120ns/entry vs ~16ns/entry gathers).
        pack = 128 // d
        npad = (n + pack - 1) // pack * pack
        S = npad // pack
        tp = jax.jit(
            lambda k: jax.random.uniform(k, (S, 128), jnp.float32, -0.1, 0.1)
        )(key)
        jax.block_until_ready(tp)
        upd128 = jnp.asarray(
            rng.standard_normal((c, 128)).astype(np.float32) * 1e-4
        )
        upd_d = jnp.asarray(
            rng.standard_normal((c, d)).astype(np.float32) * 1e-4
        )

        def sctimer(step_fn, iters):
            # updates passed as jit ARGS (a 109MB closed-over constant would
            # ship through the remote compiler)
            @jax.jit
            def loop(tbl, idx, u128, ud, nn):
                def body(i, carry):
                    tbl, idx_i = carry
                    return step_fn(tbl, idx_i, u128, ud), rotate(idx_i)

                tbl, _ = jax.lax.fori_loop(0, nn, body, (tbl, idx))
                return jnp.sum(tbl[:8])

            jax.block_until_ready(loop(tp, flat_idx, upd128, upd_d, 2))
            t0 = time.perf_counter()
            jax.block_until_ready(loop(tp, flat_idx, upd128, upd_d, iters))
            return (time.perf_counter() - t0) / iters

        def raw_scatter(tbl, i, u128, ud):
            return tbl.at[i // pack].add(u128, mode="drop")

        report("scatter raw128", sctimer(raw_scatter, args.iters))

        def expand_scatter(tbl, i, u128, ud):
            goh = jax.nn.one_hot(i % pack, pack, dtype=jnp.float32)
            u = jnp.einsum("cp,cd->cpd", goh, ud).reshape(c, 128)
            return tbl.at[i // pack].add(u, mode="drop")

        report("scatter onehot-expand", sctimer(expand_scatter, args.iters))

        def sorted_scatter(tbl, i, u128, ud):
            si = jnp.sort(i)
            return tbl.at[si // pack].add(
                u128, mode="drop", indices_are_sorted=True
            )

        report("scatter sorted", sctimer(sorted_scatter, args.iters))

        def dedup_scatter(tbl, i, u128, ud):
            order = jnp.argsort(i)
            sid = jnp.take(i, order) // pack
            su = jnp.take(u128, order, axis=0)
            newseg = jnp.concatenate(
                [jnp.zeros((1,), jnp.int32),
                 (sid[1:] != sid[:-1]).astype(jnp.int32)]
            )
            seg = jnp.cumsum(newseg)
            rows = jax.ops.segment_sum(su, seg, num_segments=c)
            uid = jax.ops.segment_max(sid, seg, num_segments=c)
            uid = jnp.where(uid < 0, S, uid)  # empty segs (int32 min) -> drop
            return tbl.at[uid].add(
                rows, mode="drop", indices_are_sorted=True, unique_indices=True
            )

        report("scatter sort+dedup", sctimer(dedup_scatter, args.iters))

        def adagrad_like(tbl, i, u128, ud):
            # emulate the 3-random-op adagrad step: acc scatter + acc gather
            # + emb scatter (acc kept f32 1-D [npad])
            accv = jnp.zeros((npad,), jnp.float32)
            sq = jnp.sum(ud * ud, axis=-1)
            accv = accv.at[i].add(sq, mode="drop")
            rows_acc = jnp.take(accv, i)
            goh = jax.nn.one_hot(i % pack, pack, dtype=jnp.float32)
            u = jnp.einsum(
                "cp,cd->cpd", goh, ud * jax.lax.rsqrt(rows_acc + 1e-8)[:, None]
            ).reshape(c, 128)
            return tbl.at[i // pack].add(u, mode="drop")

        report("scatter adagrad-like", sctimer(adagrad_like, args.iters))

        def sgd_sorted_real(tbl, i, u128, ud):
            # realistic sorted SGD: argsort + permute the d-wide updates +
            # expand + sorted scatter
            order = jnp.argsort(i)
            si = jnp.take(i, order)
            sud = jnp.take(ud, order, axis=0)
            goh = jax.nn.one_hot(si % pack, pack, dtype=jnp.float32)
            u = jnp.einsum("cp,cd->cpd", goh, sud).reshape(c, 128)
            return tbl.at[si // pack].add(
                u, mode="drop", indices_are_sorted=True
            )

        report("scatter sgd-sorted-real", sctimer(sgd_sorted_real, args.iters))

        def adagrad_sorted_real(tbl, i, u128, ud):
            order = jnp.argsort(i)
            si = jnp.take(i, order)
            sud = jnp.take(ud, order, axis=0)
            accv = jnp.zeros((npad,), jnp.float32)
            sq = jnp.sum(sud * sud, axis=-1)
            accv = accv.at[si].add(sq, mode="drop", indices_are_sorted=True)
            rows_acc = jnp.take(accv, si)
            goh = jax.nn.one_hot(si % pack, pack, dtype=jnp.float32)
            u = jnp.einsum(
                "cp,cd->cpd", goh,
                sud * jax.lax.rsqrt(rows_acc + 1e-8)[:, None],
            ).reshape(c, 128)
            return tbl.at[si // pack].add(
                u, mode="drop", indices_are_sorted=True
            )

        report("scatter adagrad-sorted-real",
               sctimer(adagrad_sorted_real, args.iters))

        def unique_scatter(tbl, i, u128, ud):
            # ids at 33M rows are ~unique per batch; telling XLA so lets it
            # skip collision serialization (dup rows get undefined sums --
            # measure first, decide semantics later)
            return tbl.at[i // pack].add(
                u128, mode="drop", unique_indices=True
            )

        report("scatter unique-unsafe", sctimer(unique_scatter, args.iters))

        def sorted_unique_scatter(tbl, i, u128, ud):
            si = jnp.sort(i)
            return tbl.at[si // pack].add(
                u128, mode="drop", indices_are_sorted=True,
                unique_indices=True,
            )

        report("scatter sort+uniq-unsafe",
               sctimer(sorted_unique_scatter, args.iters))

        tpb2 = jax.jit(lambda t: t.astype(jnp.bfloat16))(tp)
        jax.block_until_ready(tpb2)
        u128b = jax.jit(lambda u: u.astype(jnp.bfloat16))(upd128)
        jax.block_until_ready(u128b)

        def bf16_scatter(tbl, i, u128, ud):
            del tbl
            return tpb2.at[i // pack].add(u128b, mode="drop")

        @jax.jit
        def bf16_loop(tbl, idx, nn):
            def body(i, carry):
                tbl, idx_i = carry
                return tbl.at[idx_i // pack].add(u128b, mode="drop"), rotate(idx_i)

            tbl, _ = jax.lax.fori_loop(0, nn, body, (tbl, idx))
            return jnp.sum(tbl[:8].astype(jnp.float32))

        jax.block_until_ready(bf16_loop(tpb2, flat_idx, 2))
        t0 = time.perf_counter()
        jax.block_until_ready(bf16_loop(tpb2, flat_idx, args.iters))
        report("scatter bf16", (time.perf_counter() - t0) / args.iters)

    if want("drophot") and 128 % d == 0 and d < 128:
        # Frequency-hybrid feasibility probes (training wall is the big-set
        # random scatter, ~81ns/entry — docs/PERF.md):
        #   drop  — scatter where a fraction of entries are oob-DROPPED.  If
        #           dropped entries are ~free, hot-row updates can move to an
        #           MXU dense-block path and be dropped from the scatter.
        #   zipf  — scatter/gather with power-law ids (real Criteo traffic):
        #           hot-id collisions serialize scatter-adds; uniform-id
        #           benches may understate the real cost.
        #   hotg  — gather where a fraction of ids clamp into a tiny hot
        #           range (cache locality on the forward path).
        pack = 128 // d
        npad = (n + pack - 1) // pack * pack
        S = npad // pack
        tp = jax.jit(
            lambda k: jax.random.uniform(k, (S, 128), jnp.float32, -0.1, 0.1)
        )(key)
        jax.block_until_ready(tp)
        upd128 = jnp.asarray(
            rng.standard_normal((c, 128)).astype(np.float32) * 1e-4
        )

        def sctimer2(step_fn, idx0, iters):
            @jax.jit
            def loop(tbl, idx, u128, nn):
                def body(i, carry):
                    tbl, idx_i = carry
                    return step_fn(tbl, idx_i, u128), rotate(idx_i)

                tbl, _ = jax.lax.fori_loop(0, nn, body, (tbl, idx))
                return jnp.sum(tbl[:8])

            jax.block_until_ready(loop(tp, idx0, upd128, 2))
            t0 = time.perf_counter()
            jax.block_until_ready(loop(tp, idx0, upd128, iters))
            return (time.perf_counter() - t0) / iters

        for frac in (0.0, 0.5, 0.9):
            kdrop = int(c * frac)

            def drop_scatter(tbl, i, u128, kdrop=kdrop):
                ii = jnp.where(jnp.arange(c) < kdrop, S, i // pack)
                return tbl.at[ii].add(u128, mode="drop")

            report(f"scatter dropfrac={frac}",
                   sctimer2(drop_scatter, flat_idx, args.iters))

        # zipf ids (alpha~1.05 truncated to n) — realistic hot-row collisions
        zraw = rng.zipf(1.05, size=4 * c)
        zraw = zraw[zraw <= n][:c]
        zipf_idx = jnp.asarray((zraw - 1).astype(np.int32))

        def raw_scatter2(tbl, i, u128):
            return tbl.at[i // pack].add(u128, mode="drop")

        report("scatter zipf-ids", sctimer2(raw_scatter2, zipf_idx, args.iters))
        report("scatter uniform-ids",
               sctimer2(raw_scatter2, flat_idx, args.iters))

        for frac in (0.5, 0.9):
            khot = int(c * frac)

            def hot_gather(t_, i, khot=khot):
                ids = jnp.where(jnp.arange(c) < khot, i % 4096, i)
                return jnp.take(t_, ids // pack, axis=0)

            report(f"gather hotfrac={frac}",
                   igtimer(hot_gather, tp, flat_idx, rotate, args.iters))
        report("gather uniform",
               igtimer(lambda t_, i: jnp.take(t_, i // pack, axis=0), tp,
                       flat_idx, rotate, args.iters))
        del tp

    if want("wide") and d < 128 and 128 % d == 0:
        # Does gather cost stay flat as storage rows widen past 128 lanes?
        # If yes, pack=width/d rows per issue cuts issue count further.
        for width in (128, 256, 512, 1024):
            pk = width // d
            S = (n + pk - 1) // pk
            tw = jax.jit(
                lambda k, S=S, width=width: jax.random.uniform(
                    k, (S, width), jnp.float32, -0.1, 0.1
                )
            )(key)
            jax.block_until_ready(tw)

            def wide_lookup(t_, i, pk=pk, S=S):
                rows = jnp.take(t_, (i // pk) % S, axis=0)  # [c, width]
                g = jax.nn.one_hot(i % pk, pk, dtype=jnp.float32)
                return jnp.einsum(
                    "cpd,cp->cd", rows.reshape(c, pk, d), g,
                    preferred_element_type=jnp.float32,
                )

            report(f"wide w={width} pack={pk}",
                   igtimer(wide_lookup, tw, flat_idx, rotate, args.iters))
            del tw

    if want("dwide") and d < 128 and 128 % d == 0:
        # Is the wide-row gather penalty lane-driven or byte-driven?  The f32
        # 'wide' probe showed cost/issue growing with width (128->256 lanes =
        # 1.34x); if the growth tracks BYTES, then bf16@256 / int8@512 move
        # the same bytes per issue as f32@128 while packing 2x/4x more rows —
        # a direct issue-count cut on the big-table path.
        for dt_name, dt, dequant in (
            ("f32", jnp.float32, False),
            ("bf16", jnp.bfloat16, False),
            ("int8", jnp.int8, True),
        ):
            for width in (128, 256, 512):
                pk = width // d
                S = (n + pk - 1) // pk
                tw = jax.jit(
                    lambda k, S=S, width=width, dt=dt: (
                        jax.random.uniform(
                            k, (S, width), jnp.float32, -0.1, 0.1
                        ) * 127
                    ).astype(dt)
                )(key)
                jax.block_until_ready(tw)

                def wlookup(t_, i, pk=pk, S=S, dq=dequant):
                    rows = jnp.take(t_, (i // pk) % S, axis=0)  # [c, width]
                    if dq:
                        rows = rows.astype(jnp.float32)
                    g = jax.nn.one_hot(i % pk, pk, dtype=rows.dtype)
                    return jnp.einsum(
                        "cpd,cp->cd", rows.reshape(c, pk, d), g,
                        preferred_element_type=jnp.float32,
                    )

                report(
                    f"dwide {dt_name} w={width} pack={pk} "
                    f"({jnp.dtype(dt).itemsize*width}B/row)",
                    igtimer(wlookup, tw, flat_idx, rotate, args.iters))
                del tw

    if want("onehot"):
        # one-hot matmul feasibility for a small table (2048 rows)
        small_n = 2048
        small = table[:small_n]

        def onehot_lookup(t, i):
            ids = i % small_n
            oh = jax.nn.one_hot(ids, small_n, dtype=jnp.float32)
            return jnp.dot(oh, t, preferred_element_type=jnp.float32)

        report("onehot 2048-row", igtimer(onehot_lookup, small, flat_idx,
                                          rotate, max(2, args.iters // 4)))

    if want("hotcost"):
        # Per-HIT cost of the hot-row cache probe vs a plain gather
        # (VERDICT r4 weak #2: the dedup ledger claimed cache hits cost
        # "zero per-entry issues"; hot_cache_select actually pays a
        # searchsorted + a take from the replica per entry — measure it).
        # All E entries probe the cache; hit rate ~K/n is near zero for
        # uniform ids, so this times the PROBE itself (the cost every
        # entry pays whether it hits or not).
        from pim_embedding_lookup_tpu.parallel.hotcache import (
            hot_cache_select,
        )

        for k_hot in (1024, 4096):
            hot_ids_np = np.sort(
                rng.choice(n, size=k_hot, replace=False).astype(np.int32)
            )
            hot_ids = jnp.asarray(hot_ids_np)
            hot_rows = jnp.asarray(
                rng.standard_normal((k_hot, d)).astype(np.float32)
            )

            def select_fn(tbl, i):
                # cache operands ride the tbl pytree slot: closing over
                # device arrays would embed them as program constants
                # (igtimer docstring / CLAUDE.md rule 3)
                _hi, _hr = tbl
                hit, rows = hot_cache_select(
                    _hi, _hr, i, jnp.ones_like(i, dtype=bool)
                )
                return rows
            report(f"hotcache select K={k_hot}", igtimer(
                select_fn, (hot_ids, hot_rows), flat_idx, rotate,
                args.iters))

    if results:
        best = min(results, key=results.get)
        print(f"BEST: {best} {results[best]*1e6:.1f} us", file=sys.stderr)


if __name__ == "__main__":
    main()
