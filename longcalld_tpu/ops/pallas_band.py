"""Pallas TPU kernel for the banded gap-affine-2p DP forward pass.

Drop-in replacement for ops/wfa.py:_banded_dp's lax.scan row loop (the
WFA2-lib replacement's device hot loop, /root/reference/src/align.c:374-460):
ROWS_PER_STEP DP rows per grid step (amortizing the Mosaic per-step
transition cost that bound the single-row version to ~4% of the VPU peak),
the five state planes live in VMEM scratch across the whole sweep, each
step's text+pattern windows stream HBM->VMEM through double-buffered async
DMAs, and the step's traceback byte planes stream back to HBM through a
grid-mapped (R, batch, B) output block.  Bit-identical to the lax
formulation (same saturation, same PERM tie-breaks, same band-edge metric
with the |b_final - b_edge|*min(e1,e2) suffix bound) — asserted by
tests/test_pallas_band.py over randomized batches.

Layout notes (see /opt/skills/guides/pallas_guide.md):
* batch rides the sublane dimension, the band rides the lanes, so every
  recurrence op is a plain (batch, B) VPU op; B is a multiple of 128.
* the insertion prefix-min is a log2(B) shift-and-min doubling ladder —
  cummin along lanes is not a native TPU op.

int16 state packing — attempted and REFUTED on this backend (round-5
review item 5; probed 2026-08-20 on v5e-1 with minimal Pallas kernels).
Scores at B=2048/Lp<=2048 fit int16 (max meaningful score < 2^15 with a
27000 saturation cap), and 2x lane density would directly attack the
~120-issue-slot/row bound — but Mosaic on this backend has NO non-32-bit
lowering for any of the three op families the recurrence is built from:
  * jnp.minimum on int16 vectors  -> "Mosaic failed to compile TPU
    kernel: failed to legalize operation 'arith.minsi'"
  * int16 compare (<, ==)         -> "Target does not support this
    comparison"
  * pltpu.roll on int16           -> "not implemented: Rotate with
    non-32-bit data"
Only pure data movement (concat shifts) lowers at 16 bits.  A min-free /
compare-free reformulation would have to synthesize min from subtract +
arithmetic shift + mask at >=4 extra ops per min — the recurrence has
~30 mins/compares per row, so the rewrite costs more slots than the 2x
density would recover.  (The int8 roll variant fails identically:
rotate is 32-bit-only.)
* row i's text window Tband[:, i-1 : i-1+B] overlaps row i-1's by B-1
  columns; it is still fetched as one (batch, B) DMA per row because the
  copy is bandwidth-trivial and double-buffering hides the latency behind
  the row compute.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1 << 28


def _shift_left(x, fill):
    return jnp.concatenate([x[:, 1:], jnp.full_like(x[:, :1], fill)], axis=1)


def _shift_right(x, fill, s=1):
    return jnp.concatenate(
        [jnp.full_like(x[:, :s], fill), x[:, :-s]], axis=1)


def _prefix_min(x, B):
    """Inclusive running minimum along lanes via the doubling ladder."""
    r = x
    s = 1
    while s < B:
        r = jnp.minimum(r, _shift_right(r, BIG, s))
        s *= 2
    return r


def _dp_rows_kernel(x, o1, e1, o2, e2, R,     # static scoring params + unroll
                    plen_ref, tlen_ref, dlo_ref,  # VMEM (batch, 1) int32
                    P_hbm,                    # ANY/HBM (batch, >=Lp128+256) i32
                    Tband_hbm,                # ANY/HBM (batch, padded) int8
                    tb_out_ref,               # VMEM (R, batch, B) u8 (mapped)
                    finals_ref, edge_ref,     # VMEM (batch, 8) / (batch, 1)
                    M, I1, I2, D1, D2,        # VMEM (batch, B) int32 scratch
                    twin,                     # VMEM (2, batch, B+256) int8
                    pwin,                     # VMEM (2, batch, 256) int32
                    sems):                    # DMA semaphores (2, 2)
    """R DP rows per grid step: the per-step Mosaic transition cost (block
    remap + revisiting + output DMA) was ~10x one row's VPU compute at
    B=2048, so single-row stepping left the kernel at ~4% of the VPU bound.
    The R rows run under one lax.fori_loop (NOT a Python unroll: Mosaic
    stack-allocates each unrolled row's temporaries separately, tripping
    the 16M scoped-vmem cap at R=8 already) — the rows' data dependence
    is through the VMEM-resident state planes, so amortizing the grid
    overhead costs nothing extra in bandwidth."""
    k = pl.program_id(0)
    n_steps = pl.num_programs(0)
    B = M.shape[1]
    batch = M.shape[0]
    W = B + 256                       # text window: 128-aligned base + R<=128
    bb = jax.lax.broadcasted_iota(jnp.int32, (batch, B), 1)
    lane8 = jax.lax.broadcasted_iota(jnp.int32, (batch, 8), 1)
    laneW = jax.lax.broadcasted_iota(jnp.int32, (batch, 256), 1)
    plen = plen_ref[:]
    tlen = tlen_ref[:]
    dlo = dlo_ref[:]
    b_final = tlen - plen - dlo
    min_e = min(e1, e2)
    bl = jnp.abs(b_final) * min_e
    br = jnp.abs((B - 1) - b_final) * min_e
    # loop-invariant lane products (hoisted out of the row loop: two
    # full-width multiplies per row otherwise)
    bbe1 = bb * e1
    bbe2 = bb * e2
    # scalar row range where ANY pair can capture finals: outside it the
    # whole masked-min block is provably inert and skipped per row
    minp = jnp.min(plen)
    maxp = jnp.max(plen)

    def albase_of(step):
        # 128-aligned window base covering rows [step*R .. step*R+R-1]
        # (row i reads text/pattern column i-1; max(.,0) keeps step 0 legal)
        return jax.lax.mul(
            jax.lax.div(jnp.maximum(step * R - 1, 0), 128), 128)

    def win_dma(slot, step):
        base = albase_of(step)
        return (pltpu.make_async_copy(Tband_hbm.at[:, pl.ds(base, W)],
                                      twin.at[slot], sems.at[slot, 0]),
                pltpu.make_async_copy(P_hbm.at[:, pl.ds(base, 256)],
                                      pwin.at[slot], sems.at[slot, 1]))

    @pl.when(k == 0)
    def _start():
        for dma in win_dma(0, 0):
            dma.start()

    slot = jax.lax.rem(k, 2)
    for dma in win_dma(slot, k):
        dma.wait()

    @pl.when(k < n_steps - 1)
    def _prefetch():
        for dma in win_dma(jax.lax.rem(k + 1, 2), k + 1):
            dma.start()

    # one rotate aligns the whole step's window: element for column
    # (k*R - 1 + r) sits at A[:, base_off + r]; rolling by W - base_off
    # brings it to lane r (for k == 0, base_off is -1 and lane 0 wraps
    # garbage — read only by the init row, which uses no text)
    base_off = jnp.maximum(k * R - 1, 0) - albase_of(k) \
        + jnp.where(k == 0, -1, 0)
    # int32 through the roll: an int8 roll + int8 compare tripped the
    # Mosaic compiler on this backend (HTTP 500 from the remote compile
    # helper), so the 4x data saving through the shift network is not
    # available here
    A = pltpu.roll(twin[slot].astype(jnp.int32),
                   jax.lax.rem(W - base_off, W), axis=1)
    pw = pwin[slot]
    pat_off = base_off                # pattern column i-1 in the 256 window

    @pl.when(k == 0)
    def _init():                                    # row 0
        j0 = dlo + bb                               # (batch, B)
        m0 = jnp.where(j0 == 0, 0, BIG)
        i1_0 = jnp.where(j0 > 0, o1 + e1 * j0, BIG)
        i2_0 = jnp.where(j0 > 0, o2 + e2 * j0, BIG)
        M[:] = m0
        I1[:] = i1_0
        I2[:] = i2_0
        D1[:] = jnp.full((batch, B), BIG, jnp.int32)
        D2[:] = jnp.full((batch, B), BIG, jnp.int32)
        ext0 = jnp.where(j0 > 1, 24, 0)      # (1<<3)|(1<<4) int32 mask
        tb_out_ref[0] = ext0.astype(jnp.uint8)
        e_row0 = jnp.minimum(
            jnp.minimum(jnp.minimum(m0[:, :1], i1_0[:, :1]),
                        i2_0[:, :1]) + bl,
            jnp.minimum(jnp.minimum(m0[:, -1:], i1_0[:, -1:]),
                        i2_0[:, -1:]) + br)
        # plen == 0 pairs finish on row 0 (ops/wfa.py:163-170);
        # column writes go through lane-iota masks: .at[].set
        # lowers to scatter, which Mosaic does not implement
        at0 = (bb == (tlen - dlo)) & (plen == 0)
        f = jnp.full((batch, 8), BIG, jnp.int32)
        for col, v in ((0, i1_0), (1, i2_0), (4, m0)):
            mv = jnp.min(jnp.where(at0, v, BIG), axis=1,
                         keepdims=True)
            f = jnp.where(lane8 == col, mv, f)
        finals_ref[:] = f
        edge_ref[:] = e_row0

    def _row(r, _carry):
        i = k * R + r
        # lane j of the re-roll holds A-lane r+j = text column i-1+j
        txt = pltpu.roll(A, jax.lax.rem(W - r, W), axis=1)[:, :B]
        jv = i + dlo + bb
        pat = jnp.sum(jnp.where(laneW == pat_off + r, pw, 0),
                      axis=1, keepdims=True)   # (batch, 1) int32
        valid = (jv >= 1) & (jv <= tlen) & (i <= plen)
        sub = jnp.where(valid & (pat == txt), 0, x)
        sub = jnp.where(valid, sub, BIG)

        mM, mI1, mI2, mD1, mD2 = M[:], I1[:], I2[:], D1[:], D2[:]
        # diagonal argmin in order [I1, I2, D1, D2, M], first min wins
        # (canonical state ids via affine_align._PERM = [1,2,3,4,0])
        best = mI1
        src = jnp.full((batch, B), 1, jnp.int32)
        for v, s in ((mI2, 2), (mD1, 3), (mD2, 4), (mM, 0)):
            src = jnp.where(v < best, s, src)
            best = jnp.minimum(best, v)
        nM = jnp.minimum(best + sub, BIG)

        mMs = _shift_left(mM, BIG)
        d1s = _shift_left(mD1, BIG)
        d2s = _shift_left(mD2, BIG)
        open1 = jnp.minimum(mMs + o1 + e1, BIG)
        ext1 = jnp.minimum(d1s + e1, BIG)
        nD1 = jnp.minimum(open1, ext1)
        d1_ext = ext1 < open1
        open2 = jnp.minimum(mMs + o2 + e2, BIG)
        ext2 = jnp.minimum(d2s + e2, BIG)
        nD2 = jnp.minimum(open2, ext2)
        d2_ext = ext2 < open2

        base1 = nM - bbe1
        cand1 = _shift_right(_prefix_min(base1, B), BIG)
        nI1 = jnp.minimum(cand1 + bbe1 + o1, BIG)
        base2 = nM - bbe2
        cand2 = _shift_right(_prefix_min(base2, B), BIG)
        nI2 = jnp.minimum(cand2 + bbe2 + o2, BIG)
        adj1 = _shift_right(jnp.minimum(nM + o1 + e1, BIG), BIG)
        adj2 = _shift_right(jnp.minimum(nM + o2 + e2, BIG), BIG)
        i1_ext = nI1 < adj1
        i2_ext = nI2 < adj2

        tb = (src
              | jnp.where(i1_ext, 1 << 3, 0)
              | jnp.where(i2_ext, 1 << 4, 0)
              | jnp.where(d1_ext, 1 << 5, 0)
              | jnp.where(d2_ext, 1 << 6, 0))
        tb_out_ref[r] = tb.astype(jnp.uint8)

        @pl.when((i >= minp) & (i <= maxp))
        def _capture_finals():
            at_final = (i == plen) & (bb == b_final)
            f = finals_ref[:]
            for col, v in ((0, nI1), (1, nI2), (2, nD1), (3, nD2),
                           (4, nM)):
                mv = jnp.min(jnp.where(at_final, v, BIG), axis=1,
                             keepdims=True)
                f = jnp.where(lane8 == col, jnp.minimum(f, mv), f)
            finals_ref[:] = f

        def edge_col(col):
            return jnp.minimum(
                jnp.minimum(jnp.minimum(nM[:, col:col + 1],
                                        nI1[:, col:col + 1]),
                            jnp.minimum(nI2[:, col:col + 1],
                                        nD1[:, col:col + 1])),
                nD2[:, col:col + 1])

        act0 = jnp.where(i <= plen, 0, BIG)
        edge_row = jnp.minimum(
            jnp.minimum(edge_col(0) + bl, edge_col(B - 1) + br)
            + act0, BIG)
        edge_ref[:] = jnp.minimum(edge_ref[:], edge_row)

        M[:] = nM
        I1[:] = nI1
        I2[:] = nI2
        D1[:] = nD1
        D2[:] = nD2
        return 0

    # step 0 starts at row 1 (row 0 is the init branch above)
    jax.lax.fori_loop(jnp.where(k == 0, 1, 0), R, _row, 0)


# chained-dependency timing at (batch=64, B=2048, Lp=2048) on v5e-1:
# R=1 (the old one-row grid) 53 ms, R=8 20.7 ms, R=16 18.1 ms
ROWS_PER_STEP = 16


@functools.partial(jax.jit, static_argnames=("B", "Lp", "x", "o1", "e1",
                                             "o2", "e2", "interpret",
                                             "rows_per_step"))
def banded_dp_pallas(P, Tband, plen, tlen, dlo, B: int, Lp: int, x: int,
                     o1: int, e1: int, o2: int, e2: int,
                     interpret: bool = False,
                     rows_per_step: int = ROWS_PER_STEP):
    """Same contract as ops/wfa.py:_banded_dp: returns
    (tbs (Lp+1, batch, B) uint8, finals (batch, 5) int32 in PERM order
    [I1, I2, D1, D2, M], edge_min (batch,) int32)."""
    batch = P.shape[0]
    R = min(rows_per_step, 128)
    n_steps = (Lp + R) // R            # covers rows 0..Lp (+ inert padding)
    # pad so the widest 128-aligned DMA windows stay in bounds
    max_base = (max(n_steps * R - 1 - 1, 0) // 128) * 128
    Lp128 = max_base + 256
    P32 = jnp.pad(P.astype(jnp.int32),
                  ((0, 0), (0, max(0, Lp128 - P.shape[1]))))
    need = max_base + B + 256
    Tband8 = jnp.pad(Tband.astype(jnp.int8),
                     ((0, 0), (0, max(0, need - Tband.shape[1]))))

    kern = functools.partial(_dp_rows_kernel, x, o1, e1, o2, e2, R)
    out_shapes = (
        jax.ShapeDtypeStruct((n_steps * R, batch, B), jnp.uint8),
        jax.ShapeDtypeStruct((batch, 8), jnp.int32),
        jax.ShapeDtypeStruct((batch, 1), jnp.int32),
    )
    tbs, finals8, edge = pl.pallas_call(
        kern,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((batch, 1), lambda k: (0, 0)),       # plen
            pl.BlockSpec((batch, 1), lambda k: (0, 0)),       # tlen
            pl.BlockSpec((batch, 1), lambda k: (0, 0)),       # dlo
            pl.BlockSpec(memory_space=pl.ANY),                # P32 (HBM)
            pl.BlockSpec(memory_space=pl.ANY),                # Tband (HBM)
        ],
        out_specs=(
            pl.BlockSpec((R, batch, B), lambda k: (k, 0, 0)),
            pl.BlockSpec((batch, 8), lambda k: (0, 0)),
            pl.BlockSpec((batch, 1), lambda k: (0, 0)),
        ),
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((batch, B), jnp.int32),   # M
            pltpu.VMEM((batch, B), jnp.int32),   # I1
            pltpu.VMEM((batch, B), jnp.int32),   # I2
            pltpu.VMEM((batch, B), jnp.int32),   # D1
            pltpu.VMEM((batch, B), jnp.int32),   # D2
            pltpu.VMEM((2, batch, B + 256), jnp.int8),   # 2x text windows
            pltpu.VMEM((2, batch, 256), jnp.int32),      # 2x pattern windows
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )(plen.reshape(batch, 1).astype(jnp.int32),
      tlen.reshape(batch, 1).astype(jnp.int32),
      dlo.reshape(batch, 1).astype(jnp.int32),
      P32, Tband8)
    return tbs[:Lp + 1], finals8[:, :5], edge[:, 0]


def _suffix_or(x, B):
    """Reverse inclusive cummax over a 0/1 plane via the doubling ladder."""
    r = x
    s = 1
    while s < B:
        r = jnp.maximum(r, jnp.concatenate(
            [r[:, s:], jnp.zeros_like(r[:, :s])], axis=1))
        s *= 2
    return r


def _bwd_rows_kernel(R, Lp,                        # static
                     plen_ref, tlen_ref, dlo_ref,  # VMEM (batch, 1) int32
                     finals_ref,                   # VMEM (batch, 8) int32
                     tb_ref,                       # VMEM (R, batch, B) uint8
                     out_ref,                      # VMEM (R, batch, 8) int32
                     b0_ref,                       # VMEM (batch, 8) int32
                     u, s):                        # VMEM scratch planes
    """R traceback rows per grid step under one lax.fori_loop (same
    amortization as the forward kernel), walking rows Lp..1 (step k,
    local q handles row Lp - k*R - q; rows <1 in the final step's tail
    are inert).  Mirrors ops/wfa.py:_backward_resolve bit for bit: the
    band position is a one-hot plane, I-chains collapse via suffix-or +
    lowest non-extension, and each row emits packed = op<<14 |
    min(n_ins, 16383) into lane 0 of out row q."""
    k = pl.program_id(0)
    B = u.shape[1]
    batch = u.shape[0]
    bb = jax.lax.broadcasted_iota(jnp.int32, (batch, B), 1)
    lane8 = jax.lax.broadcasted_iota(jnp.int32, (batch, 8), 1)
    plen = plen_ref[:]
    b_final = tlen_ref[:] - plen - dlo_ref[:]

    # first column achieving the finals min, in canonical state order
    # (finals columns are PERM order I1,I2,D1,D2,M -> canonical 1,2,3,4,0)
    f = finals_ref[:]
    fmin = jnp.min(f, axis=1, keepdims=True)
    is_min = jnp.where((f == fmin) & (lane8 < 5), lane8, 8)
    first = jnp.min(is_min, axis=1, keepdims=True)    # PERM index 0..4
    canon = jax.lax.rem(first + 1, 5)                 # PERM -> canonical id
    s_final = jnp.where(lane8 == canon, 1, 0)

    @pl.when(k == 0)
    def _init():
        u[:] = jnp.zeros((batch, B), jnp.int32)
        s[:] = jnp.zeros((batch, 8), jnp.int32)

    def _row(q, _carry):
        i = Lp - k * R - q
        act = (i <= plen) & (i >= 1)              # (batch, 1)
        init_here = i == plen

        uu = jnp.where(init_here, jnp.where(bb == b_final, 1, 0), u[:])
        ss = jnp.where(init_here, s_final, s[:])

        tb32 = tb_ref[R - 1 - q].astype(jnp.int32)
        is_I = (ss[:, 1:2] | ss[:, 2:3]) > 0
        is_D = (ss[:, 3:4] | ss[:, 4:5]) > 0
        ext_plane = jnp.where(ss[:, 1:2] > 0, (tb32 >> 3) & 1,
                              (tb32 >> 4) & 1)
        reach = _suffix_or(uu, B)
        c = reach * (1 - ext_plane)
        so_next = jnp.concatenate(
            [_suffix_or(c, B)[:, 1:], jnp.zeros((batch, 1), jnp.int32)],
            axis=1)
        h = c * (1 - so_next)
        entry_b = jnp.sum(bb * uu, axis=1, keepdims=True)
        stop_b = jnp.sum(bb * h, axis=1, keepdims=True)
        n_ins_I = entry_b - stop_b + 1
        u_after_I = jnp.concatenate(
            [h[:, 1:], jnp.zeros((batch, 1), jnp.int32)], axis=1)

        u1 = jnp.where(is_I, u_after_I, uu)
        n_ins = jnp.where(is_I & act & ~is_D, n_ins_I, 0)

        src_val = jnp.sum(u1 * (tb32 & 7), axis=1, keepdims=True)
        new_s_M = jnp.where(lane8 == src_val, 1, 0)
        extD = jnp.where(ss[:, 3:4] > 0,
                         jnp.sum(uu * ((tb32 >> 5) & 1), axis=1,
                                 keepdims=True),
                         jnp.sum(uu * ((tb32 >> 6) & 1), axis=1,
                                 keepdims=True))
        stay_D = extD > 0
        m_onehot = jnp.where(lane8 == 0, 1, 0)
        new_s_D = jnp.where(stay_D, ss, m_onehot)
        u_D = jnp.concatenate(
            [jnp.zeros((batch, 1), jnp.int32), uu[:, :-1]], axis=1)

        op = jnp.where(act, jnp.where(is_D, 2, 1), 0)     # (batch, 1)
        u_next = jnp.where(is_D, u_D, u1)
        s_next = jnp.where(is_D, new_s_D, new_s_M)
        u_next = jnp.where(act, u_next, uu)
        s_next = jnp.where(act, s_next, ss)
        u[:] = u_next
        s[:] = s_next

        packed = (op << 14) | jnp.minimum(n_ins, (1 << 14) - 1)
        out_ref[q] = jnp.where(lane8 == 0, packed, 0)
        return 0

    jax.lax.fori_loop(0, R, _row, 0)
    b0_ref[:] = jnp.where(lane8 == 0,
                          jnp.sum(bb * u[:], axis=1, keepdims=True), 0)


@functools.partial(jax.jit, static_argnames=("B", "Lp", "interpret",
                                             "rows_per_step"))
def backward_resolve_pallas(tbs, plen, tlen, dlo, finals, B: int, Lp: int,
                            interpret: bool = False,
                            rows_per_step: int = ROWS_PER_STEP):
    """Same walk as ops/wfa.py:_backward_resolve but R Pallas grid rows
    per step.  Takes the (batch, 5) PERM-order finals; returns
    (packed (Lp, batch) int32 with op<<14|n_ins in step order row Lp..1,
    b0 (batch,) int32)."""
    batch = tbs.shape[1]
    R = min(rows_per_step, 128)
    n_steps = (Lp + R - 1) // R
    finals8 = jnp.pad(finals, ((0, 0), (0, 3)), constant_values=BIG)
    # rows 1..Lp of tbs, front-padded so row i sits at padded index
    # i + pad0 - 1 and step k's (R, batch, B) block is blocks[n_steps-1-k]
    pad0 = n_steps * R - Lp
    tb_rows = jnp.pad(tbs[1:Lp + 1], ((pad0, 0), (0, 0), (0, 0)))
    kern = functools.partial(_bwd_rows_kernel, R, Lp)
    out, b0 = pl.pallas_call(
        kern,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((batch, 1), lambda k: (0, 0)),
            pl.BlockSpec((batch, 1), lambda k: (0, 0)),
            pl.BlockSpec((batch, 1), lambda k: (0, 0)),
            pl.BlockSpec((batch, 8), lambda k: (0, 0)),
            pl.BlockSpec((R, batch, B), lambda k, n=n_steps: (n - 1 - k,
                                                              0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((R, batch, 8), lambda k: (k, 0, 0)),
            pl.BlockSpec((batch, 8), lambda k: (0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_steps * R, batch, 8), jnp.int32),
            jax.ShapeDtypeStruct((batch, 8), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((batch, B), jnp.int32),   # u (one-hot band position)
            pltpu.VMEM((batch, 8), jnp.int32),   # s (one-hot state)
        ],
        interpret=interpret,
    )(plen.reshape(batch, 1).astype(jnp.int32),
      tlen.reshape(batch, 1).astype(jnp.int32),
      dlo.reshape(batch, 1).astype(jnp.int32),
      finals8, tb_rows)
    return out[:Lp, :, 0], b0[:, 0]


def vmem_fits(batch: int, B: int, Lp: int) -> bool:
    """Empirical scoped-VMEM fit on v5e: every probed (batch, B) with
    batch*B <= 2^17 compiles; every larger one tripped the 16M scoped-vmem
    limit (the compiler's stack accounting is non-monotonic in the shapes,
    so the cap is calibrated, not modeled).  Callers chunk larger batches."""
    return batch % 8 == 0 and B % 128 == 0 and batch * B <= 131072
