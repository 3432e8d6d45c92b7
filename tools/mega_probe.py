"""Mosaic feasibility probes for the mega-fused MCL step (round 5).

Each probe isolates ONE capability the single-program design needs
(PERF.md:96-106 names the risks). Run on the real TPU:

    python tools/mega_probe.py [probe ...]

Probes:
  smem   — VMEM->SMEM async copy of an int32 vector, then use the SMEM
           values as dynamic DMA offsets (the window-address hand-off).
  rng    — pltpu.prng_seed + prng_random_bits under a >1 grid with
           pl.when(i==0), Box-Muller normals.
  cumsum — jnp.cumsum of a (32, 128) f32 block inside the kernel.
  scratch— dynamic leading-index VMEM scratch writes (scratch[i] = vec).

Prints PASS/FAIL + timing per probe; failures print the Mosaic error.
"""

from __future__ import annotations

import os
import sys
import time
import traceback

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = os.environ.get("MEGA_PROBE_INTERPRET") == "1"


def probe_smem():
    """y0 values computed in VMEM -> SMEM scratch -> DMA offsets."""
    rows, lanes = 64, 128
    n = 16  # particles
    hbm = np.arange(rows * lanes, dtype=np.float32).reshape(rows, lanes)
    y0_host = np.array([3, 7, 0, 61, 5, 5, 9, 33, 2, 40, 1, 0, 8, 21, 13, 60],
                       np.int32)

    def kernel(y0v_ref, hbm_ref, out_ref, y0s, copy_sem, dma_sems, scratch):
        # VMEM (1, n) int32 -> SMEM (n,)
        pltpu.make_async_copy(y0v_ref, y0s, copy_sem).start()
        pltpu.make_async_copy(y0v_ref, y0s, copy_sem).wait()
        for s in range(n):
            pltpu.make_async_copy(
                hbm_ref.at[pl.ds(y0s[0, s], 1)], scratch.at[s], dma_sems.at[s]
            ).start()
        for s in range(n):
            pltpu.make_async_copy(
                hbm_ref.at[pl.ds(y0s[0, s], 1)], scratch.at[s], dma_sems.at[s]
            ).wait()
        out_ref[:] = scratch[:, 0]

    call = pl.pallas_call(
        kernel,
        interpret=INTERPRET,
        out_shape=jax.ShapeDtypeStruct((n, lanes), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((1, n), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((n,)),
            pltpu.VMEM((n, 1, lanes), jnp.float32),
        ],
    )
    out = np.asarray(call(jnp.asarray(y0_host)[None, :], jnp.asarray(hbm)))
    want = hbm[y0_host]
    np.testing.assert_array_equal(out, want)


def probe_rng():
    """prng under a 4-step grid; normals via Box-Muller; mean/var sane."""
    n_sub, lanes = 32, 128

    def kernel(seed_ref, out_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            pltpu.prng_seed(seed_ref[0], seed_ref[1])

        bits1 = pltpu.prng_random_bits((n_sub, lanes))
        bits2 = pltpu.prng_random_bits((n_sub, lanes))
        u1 = (bits1 >> 8).astype(jnp.float32) * (1.0 / (1 << 24))
        u2 = (bits2 >> 8).astype(jnp.float32) * (1.0 / (1 << 24))
        r = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(u1, 1e-12)))
        out_ref[0] = r * jnp.cos(2.0 * np.pi * u2)

    call = pl.pallas_call(
        kernel,
        interpret=INTERPRET,
        grid=(4,),
        out_shape=jax.ShapeDtypeStruct((4, n_sub, lanes), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, n_sub, lanes), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    out = np.asarray(call(jnp.asarray([12345, 678], np.int32)))
    # the four grid steps must produce DIFFERENT draws (stream continues)
    assert not np.allclose(out[0], out[1])
    m, s = float(out.mean()), float(out.std())
    assert abs(m) < 0.05 and abs(s - 1.0) < 0.05, (m, s)


def probe_cumsum():
    """jnp.cumsum along lanes + two-level combine inside a kernel."""
    n_sub, lanes = 32, 128

    def kernel(x_ref, out_ref):
        x = x_ref[:]
        lane_cs = jnp.cumsum(x, axis=1)  # within-row prefix
        row_tot = lane_cs[:, -1:]  # (32, 1)
        row_prefix = jnp.cumsum(row_tot, axis=0) - row_tot  # exclusive
        out_ref[:] = lane_cs + row_prefix

    call = pl.pallas_call(
        kernel,
        interpret=INTERPRET,
        out_shape=jax.ShapeDtypeStruct((n_sub, lanes), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    x = np.random.default_rng(0).uniform(size=(n_sub, lanes)).astype(np.float32)
    out = np.asarray(call(jnp.asarray(x)))
    want = np.cumsum(x.reshape(-1)).reshape(n_sub, lanes)
    np.testing.assert_allclose(out, want, rtol=2e-5)


def probe_scratch():
    """Dynamic leading-index scratch writes: scratch[i] = per-step vector,
    then read the whole scratch back at the last step."""
    steps, lanes = 8, 128

    def kernel(out_ref, scratch):
        i = pl.program_id(0)
        scratch[i] = (
            jnp.full((lanes,), 1.0, jnp.float32) * (i + 1).astype(jnp.float32)
        )

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            out_ref[:] = scratch[:]

    call = pl.pallas_call(
        kernel,
        interpret=INTERPRET,
        grid=(steps,),
        out_shape=jax.ShapeDtypeStruct((steps, lanes), jnp.float32),
        out_specs=pl.BlockSpec(
            (steps, lanes), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((steps, lanes), jnp.float32)],
    )
    out = np.asarray(call())
    want = np.tile(np.arange(1, steps + 1, dtype=np.float32)[:, None],
                   (1, lanes))
    np.testing.assert_array_equal(out, want)


def probe_mega_ops():
    """The mega-step prologue's exact op sequence at real shape (N=4096):
    matmul-cumsum (U128 + strict-L32), flatten relayout (32,128)->(1,NP),
    onehot-difference tiles, (128,NP)@(NP,3) HIGHEST gather matmul,
    (NP,1) column math, and the (NP,1)->(32,128) reshape."""
    nps, lane = 32, 128
    np_total = nps * lane  # 4096
    rng = np.random.default_rng(1)
    w_host = rng.uniform(0.1, 1.0, (nps, lane)).astype(np.float32)
    parts_host = rng.normal(size=(np_total, 3)).astype(np.float32) * 10.0
    u0_host = np.float32(0.37)
    n_real = np_total

    u128 = np.triu(np.ones((lane, lane), np.float32))
    l32s = np.tril(np.ones((nps, nps), np.float32), k=-1)

    def kernel(w_ref, parts_ref, consts_u, consts_l, out_parts, out_chk):
        w = w_ref[:]
        # two-level cumsum entirely on the MXU (no cumsum primitive)
        lane_cs = jax.lax.dot_general(
            w, consts_u[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        row_tot = lane_cs[:, lane - 1 : lane]  # (32, 1)
        s = jax.lax.dot_general(
            consts_l[:], row_tot, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        cs = lane_cs + s  # inclusive flat cumsum, id = sub*128 + lane
        # normalize by the TRUE SCALAR total (a rank-0 reduction splats
        # fine; a (1,1) vector slice cannot broadcast to (32,128) in one
        # Mosaic op — "Broadcast in both sublanes and lanes")
        z = jnp.sum(w)
        cdf = cs / z
        g = n_real * cdf - u0_host  # (32, 128)
        g_flat = g.reshape(1, np_total)  # relayout #1
        # g_prev: lane j holds g[j-1]; j=0 -> -u0
        gp = pltpu.roll(g_flat, 1, 1)
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, g_flat.shape, 1)
        gp = jnp.where(lane_iota == 0, -u0_host, gp)

        parts = parts_ref[:]
        rows = []
        for t in range(nps):
            slot0 = t * lane
            slots = slot0 + jax.lax.broadcasted_iota(
                jnp.int32, (lane, np_total), 0
            ).astype(jnp.float32)  # slot id down sublanes, full lanes
            g_b = jnp.broadcast_to(g_flat, (lane, np_total))
            gp_b = jnp.broadcast_to(gp, (lane, np_total))
            a = (g_b >= slots).astype(jnp.float32)  # (128, NP)
            ap = (gp_b >= slots).astype(jnp.float32)
            onehot = a - ap
            rows.append(jax.lax.dot_general(
                onehot, parts, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            ))  # (128, 3)
        prop = jnp.concatenate(rows, axis=0)  # (NP, 3)
        out_parts[:] = prop
        # column math + the (NP,1)->(32,128) reshape (relayout #2)
        th = prop[:, 2:3]
        col = jnp.sin(th) + th * 0.5
        out_chk[:] = col.reshape(nps, lane)

    call = pl.pallas_call(
        kernel,
        interpret=INTERPRET,
        out_shape=(
            jax.ShapeDtypeStruct((np_total, 3), jnp.float32),
            jax.ShapeDtypeStruct((nps, lane), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
    )
    t0 = time.perf_counter()
    prop, chk = call(
        jnp.asarray(w_host), jnp.asarray(parts_host),
        jnp.asarray(u128), jnp.asarray(l32s),
    )
    prop, chk = np.asarray(prop), np.asarray(chk)
    t1 = time.perf_counter()
    # repeat timing (compile excluded)
    for _ in range(20):
        o = call(
            jnp.asarray(w_host), jnp.asarray(parts_host),
            jnp.asarray(u128), jnp.asarray(l32s),
        )
    jax.block_until_ready(o)
    t2 = time.perf_counter()
    print(f"  mega_ops: compile+1 {t1 - t0:.1f}s, "
          f"{(t2 - t1) / 20 * 1e3:.3f} ms/call")

    # reference systematic resample on the same flat order
    w_flat = w_host.reshape(-1)
    cdf = np.cumsum(w_flat) / w_flat.sum()
    gg = n_real * cdf - float(u0_host)
    idx = np.clip(
        np.searchsorted(gg, np.arange(np_total), side="left"),
        0, np_total - 1,
    )
    want = parts_host[idx]
    assert (np.abs(prop - want) > 0).mean() < 0.01, (
        "resample gather mismatch beyond knife-edge ulps"
    )
    th = prop[:, 2:3]
    np.testing.assert_allclose(
        chk.reshape(-1), (np.sin(th) + th * 0.5).reshape(-1), rtol=1e-5,
        atol=1e-5,
    )


def probe_smem_roundtrip():
    """(NP,1) SMEM scalar write + SMEM->VMEM DMA back (the logp path)."""
    n = 256

    def kernel(out_ref, smem, vmem, sem):
        i = pl.program_id(0)
        for s in range(8):
            smem[i * 8 + s, 0] = (i * 8 + s) * 2.0

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            pltpu.make_async_copy(smem, vmem, sem).start()
            pltpu.make_async_copy(smem, vmem, sem).wait()
            out_ref[:] = vmem[:].reshape(2, 128) + 1.0

    call = pl.pallas_call(
        kernel,
        interpret=INTERPRET,
        grid=(n // 8,),
        out_shape=jax.ShapeDtypeStruct((2, 128), jnp.float32),
        out_specs=pl.BlockSpec((2, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((n, 1), jnp.float32),
            pltpu.VMEM((n, 1), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = np.asarray(call()).reshape(-1)
    np.testing.assert_array_equal(out, np.arange(n) * 2.0 + 1.0)


PROBES = dict(smem=probe_smem, rng=probe_rng, cumsum=probe_cumsum,
              scratch=probe_scratch, mega_ops=probe_mega_ops,
              smem_roundtrip=probe_smem_roundtrip)


def main(argv):
    names = argv or list(PROBES)
    failed = []
    for name in names:
        t0 = time.perf_counter()
        try:
            PROBES[name]()
        except Exception:
            print(f"FAIL {name} ({time.perf_counter() - t0:.1f}s)")
            traceback.print_exc()
            failed.append(name)
        else:
            print(f"PASS {name} ({time.perf_counter() - t0:.1f}s)")
    return 1 if failed else 0





def probe_mega_parts():
    """Time the mega prologue's sub-ops separately to find the slow one."""
    nps, lane = 32, 128
    np_total = nps * lane
    rng = np.random.default_rng(1)
    w_host = rng.uniform(0.1, 1.0, (nps, lane)).astype(np.float32)
    parts_host = rng.normal(size=(np_total, 3)).astype(np.float32)
    u128 = np.triu(np.ones((lane, lane), np.float32))

    def time_call(name, call, *a):
        o = call(*a); jax.block_until_ready(o)
        t0 = time.perf_counter()
        for _ in range(50):
            o = call(*a)
        jax.block_until_ready(o)
        print(f"  {name:24s} {(time.perf_counter() - t0) / 50 * 1e3:8.3f} ms")

    def k_cumsum(w_ref, u_ref, out_ref):
        w = w_ref[:]
        lane_cs = jax.lax.dot_general(
            w, u_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        out_ref[:] = lane_cs / jnp.sum(w)

    c1 = pl.pallas_call(
        k_cumsum, interpret=INTERPRET,
        out_shape=jax.ShapeDtypeStruct((nps, lane), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    time_call("cumsum-matmul", c1, jnp.asarray(w_host), jnp.asarray(u128))

    def k_flatten(w_ref, out_ref):
        g = w_ref[:].reshape(1, np_total)
        out_ref[:] = pltpu.roll(g, 1, 1)

    c2 = pl.pallas_call(
        k_flatten, interpret=INTERPRET,
        out_shape=jax.ShapeDtypeStruct((1, np_total), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    time_call("flatten+roll", c2, jnp.asarray(w_host))

    def k_onehot(g_ref, parts_ref, out_ref):
        g = g_ref[:]
        tiles = []
        for t in range(nps):
            slots = t * lane + jax.lax.broadcasted_iota(
                jnp.int32, (lane, np_total), 0).astype(jnp.float32)
            gb = jnp.broadcast_to(g, (lane, np_total))
            a = (gb >= slots).astype(jnp.float32)
            tiles.append(jax.lax.dot_general(
                a, parts_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST))
        out_ref[:] = jnp.concatenate(tiles, axis=0)

    c3 = pl.pallas_call(
        k_onehot, interpret=INTERPRET,
        out_shape=jax.ShapeDtypeStruct((np_total, 3), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    g_host = np.sort(rng.uniform(0, np_total, (1, np_total))).astype(np.float32)
    time_call("onehot32+mm-HIGHEST", c3, jnp.asarray(g_host),
              jnp.asarray(parts_host))

    def k_onehot_def(g_ref, parts_ref, out_ref):
        g = g_ref[:]
        tiles = []
        for t in range(nps):
            slots = t * lane + jax.lax.broadcasted_iota(
                jnp.int32, (lane, np_total), 0).astype(jnp.float32)
            gb = jnp.broadcast_to(g, (lane, np_total))
            a = (gb >= slots).astype(jnp.float32)
            tiles.append(jax.lax.dot_general(
                a, parts_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
        out_ref[:] = jnp.concatenate(tiles, axis=0)

    c3d = pl.pallas_call(
        k_onehot_def, interpret=INTERPRET,
        out_shape=jax.ShapeDtypeStruct((np_total, 3), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    time_call("onehot32+mm-DEFAULT", c3d, jnp.asarray(g_host),
              jnp.asarray(parts_host))

    def k_col(p_ref, out_ref):
        th = p_ref[:, 2:3]
        col = jnp.sin(th) + th * 0.5
        out_ref[:] = col.reshape(nps, lane)

    c4 = pl.pallas_call(
        k_col, interpret=INTERPRET,
        out_shape=jax.ShapeDtypeStruct((nps, lane), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    time_call("colmath+reshape", c4, jnp.asarray(parts_host))


PROBES["mega_parts"] = probe_mega_parts




def probe_mega_bisect():
    """Bisect the full-prologue slowdown (parts sum ~0.25 ms, full 5.2 ms)."""
    nps, lane = 32, 128
    np_total = nps * lane
    rng = np.random.default_rng(1)
    w_host = rng.uniform(0.1, 1.0, (nps, lane)).astype(np.float32)
    parts_host = rng.normal(size=(np_total, 3)).astype(np.float32)
    u128 = np.triu(np.ones((lane, lane), np.float32))
    l32s = np.tril(np.ones((nps, nps), np.float32), k=-1)
    g_host = np.sort(rng.uniform(0, np_total, (1, np_total))).astype(np.float32)

    def time_call(name, call, *a):
        o = call(*a); jax.block_until_ready(o)
        t0 = time.perf_counter()
        for _ in range(50):
            o = call(*a)
        jax.block_until_ready(o)
        print(f"  {name:28s} {(time.perf_counter() - t0) / 50 * 1e3:8.3f} ms")

    def k_onehot_diff(g_ref, parts_ref, out_ref):
        g = g_ref[:]
        gp = pltpu.roll(g, 1, 1)
        lane_i = jax.lax.broadcasted_iota(jnp.int32, g.shape, 1)
        gp = jnp.where(lane_i == 0, -0.37, gp)
        tiles = []
        for t in range(nps):
            slots = t * lane + jax.lax.broadcasted_iota(
                jnp.int32, (lane, np_total), 0).astype(jnp.float32)
            gb = jnp.broadcast_to(g, (lane, np_total))
            gpb = jnp.broadcast_to(gp, (lane, np_total))
            a = (gb >= slots).astype(jnp.float32)
            ap = (gpb >= slots).astype(jnp.float32)
            tiles.append(jax.lax.dot_general(
                a - ap, parts_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST))
        out_ref[:] = jnp.concatenate(tiles, axis=0)

    c = pl.pallas_call(
        k_onehot_diff, interpret=INTERPRET,
        out_shape=jax.ShapeDtypeStruct((np_total, 3), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    time_call("onehot-diff+mm", c, jnp.asarray(g_host),
              jnp.asarray(parts_host))

    def k_front(w_ref, u_ref, l_ref, parts_ref, out_ref):
        w = w_ref[:]
        lane_cs = jax.lax.dot_general(
            w, u_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        row_tot = lane_cs[:, lane - 1:lane]
        pre = jax.lax.dot_general(
            l_ref[:], row_tot, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        cs = lane_cs + pre
        z = jnp.sum(w)
        g = (np_total * (cs / z) - 0.37).reshape(1, np_total)
        gp = pltpu.roll(g, 1, 1)
        lane_i = jax.lax.broadcasted_iota(jnp.int32, g.shape, 1)
        gp = jnp.where(lane_i == 0, -0.37, gp)
        tiles = []
        for t in range(nps):
            slots = t * lane + jax.lax.broadcasted_iota(
                jnp.int32, (lane, np_total), 0).astype(jnp.float32)
            gb = jnp.broadcast_to(g, (lane, np_total))
            gpb = jnp.broadcast_to(gp, (lane, np_total))
            a = (gb >= slots).astype(jnp.float32)
            ap = (gpb >= slots).astype(jnp.float32)
            tiles.append(jax.lax.dot_general(
                a - ap, parts_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST))
        out_ref[:] = jnp.concatenate(tiles, axis=0)

    c2 = pl.pallas_call(
        k_front, interpret=INTERPRET,
        out_shape=jax.ShapeDtypeStruct((np_total, 3), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    time_call("cumsum->onehot-diff+mm", c2, jnp.asarray(w_host),
              jnp.asarray(u128), jnp.asarray(l32s), jnp.asarray(parts_host))

    def k_full2(w_ref, u_ref, l_ref, parts_ref, out_parts, out_chk):
        w = w_ref[:]
        lane_cs = jax.lax.dot_general(
            w, u_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        row_tot = lane_cs[:, lane - 1:lane]
        pre = jax.lax.dot_general(
            l_ref[:], row_tot, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        cs = lane_cs + pre
        g = (np_total * (cs / jnp.sum(w)) - 0.37).reshape(1, np_total)
        gp = pltpu.roll(g, 1, 1)
        lane_i = jax.lax.broadcasted_iota(jnp.int32, g.shape, 1)
        gp = jnp.where(lane_i == 0, -0.37, gp)
        tiles = []
        for t in range(nps):
            slots = t * lane + jax.lax.broadcasted_iota(
                jnp.int32, (lane, np_total), 0).astype(jnp.float32)
            gb = jnp.broadcast_to(g, (lane, np_total))
            gpb = jnp.broadcast_to(gp, (lane, np_total))
            a = (gb >= slots).astype(jnp.float32)
            ap = (gpb >= slots).astype(jnp.float32)
            tiles.append(jax.lax.dot_general(
                a - ap, parts_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST))
        prop = jnp.concatenate(tiles, axis=0)
        out_parts[:] = prop
        th = prop[:, 2:3]
        out_chk[:] = (jnp.sin(th) + th * 0.5).reshape(nps, lane)

    c3 = pl.pallas_call(
        k_full2, interpret=INTERPRET,
        out_shape=(jax.ShapeDtypeStruct((np_total, 3), jnp.float32),
                   jax.ShapeDtypeStruct((nps, lane), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)))
    time_call("full(+colmath+2outs)", c3, jnp.asarray(w_host),
              jnp.asarray(u128), jnp.asarray(l32s), jnp.asarray(parts_host))


PROBES["mega_bisect"] = probe_mega_bisect


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
