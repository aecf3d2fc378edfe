"""Pallas TPU kernel for the banded gap-affine-2p DP forward pass.

Drop-in replacement for ops/wfa.py:_banded_dp's lax.scan row loop (the
WFA2-lib replacement's device hot loop, /root/reference/src/align.c:374-460):
one grid step per DP row, the five state planes live in VMEM scratch across
the whole sweep, the per-row text window streams HBM->VMEM through a
double-buffered async DMA, and the row's traceback byte plane streams back
to HBM through a grid-mapped output block.  Bit-identical to the lax
formulation (same saturation, same PERM tie-breaks, same band-edge metric
with the |b_final - b_edge|*min(e1,e2) suffix bound) — asserted by
tests/test_pallas_band.py over randomized batches.

Layout notes (see /opt/skills/guides/pallas_guide.md):
* batch rides the sublane dimension, the band rides the lanes, so every
  recurrence op is a plain (batch, B) VPU op; B is a multiple of 128.
* the insertion prefix-min is a log2(B) shift-and-min doubling ladder —
  cummin along lanes is not a native TPU op.
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


def _dp_row_kernel(x, o1, e1, o2, e2,         # static scoring params
                   plen_ref, tlen_ref, dlo_ref,   # VMEM (batch, 1) int32
                   P_blk_ref,                 # VMEM (batch, 128) int32 (grid-mapped)
                   Tband_hbm,                 # ANY/HBM (batch, >=Lp-1+B) int32
                   tb_out_ref,                # VMEM (1, batch, B) uint8 (grid-mapped)
                   finals_ref, edge_ref,      # VMEM (batch, 8) / (batch, 1) int32
                   M, I1, I2, D1, D2,         # VMEM (batch, B) int32 scratch
                   twin,                      # VMEM (2, batch, B) int32 scratch
                   sems):                     # DMA semaphores (2,)
    i = pl.program_id(0)
    n_rows = pl.num_programs(0)
    B = M.shape[1]
    batch = M.shape[0]
    bb = jax.lax.broadcasted_iota(jnp.int32, (batch, B), 1)
    plen = plen_ref[:]
    tlen = tlen_ref[:]
    dlo = dlo_ref[:]
    b_final = tlen - plen - dlo
    min_e = min(e1, e2)
    bl = jnp.abs(b_final) * min_e
    br = jnp.abs((B - 1) - b_final) * min_e

    # Mosaic requires dynamic lane offsets into tiled memrefs to be provably
    # 128-divisible, so the DMA fetches a 128-aligned window of width B+128
    # covering [row-1, row-1+B); the kernel rotates the residue off in
    # registers with pltpu.roll.
    W = B + 128

    def win_dma(slot, row):
        albase = jax.lax.mul(jax.lax.div(row - 1, 128), 128)
        return pltpu.make_async_copy(
            Tband_hbm.at[:, pl.ds(albase, W)], twin.at[slot], sems.at[slot])

    @pl.when(i == 0)
    def _init():
        j0 = dlo + bb                       # (batch, B)
        m0 = jnp.where(j0 == 0, 0, BIG)
        i1_0 = jnp.where(j0 > 0, o1 + e1 * j0, BIG)
        i2_0 = jnp.where(j0 > 0, o2 + e2 * j0, BIG)
        M[:] = m0
        I1[:] = i1_0
        I2[:] = i2_0
        D1[:] = jnp.full((batch, B), BIG, jnp.int32)
        D2[:] = jnp.full((batch, B), BIG, jnp.int32)
        ext0 = jnp.where(j0 > 1, 24, 0)     # (1<<3)|(1<<4), int32 mask
        tb_out_ref[0] = ext0.astype(jnp.uint8)
        e_row0 = jnp.minimum(
            jnp.minimum(jnp.minimum(m0[:, :1], i1_0[:, :1]),
                        i2_0[:, :1]) + bl,
            jnp.minimum(jnp.minimum(m0[:, -1:], i1_0[:, -1:]),
                        i2_0[:, -1:]) + br)
        # plen == 0 pairs finish on row 0 (finals0 path, ops/wfa.py:163-170)
        # column writes go through lane-iota masks: .at[...].set lowers to
        # scatter, which Mosaic does not implement
        at0 = (bb == (tlen - dlo)) & (plen == 0)
        lane8 = jax.lax.broadcasted_iota(jnp.int32, (batch, 8), 1)
        f = jnp.full((batch, 8), BIG, jnp.int32)
        for col, v in ((0, i1_0), (1, i2_0), (4, m0)):
            mv = jnp.min(jnp.where(at0, v, BIG), axis=1, keepdims=True)
            f = jnp.where(lane8 == col, mv, f)
        finals_ref[:] = f
        edge_ref[:] = e_row0
        # prefetch row 1's text window
        win_dma(0, 1).start()

    @pl.when(i > 0)
    def _row():
        slot = jax.lax.rem(i - 1, 2)
        nslot = jax.lax.rem(i, 2)
        win_dma(slot, i).wait()

        @pl.when(i < n_rows - 1)
        def _prefetch():
            win_dma(nslot, i + 1).start()

        r = jax.lax.rem(i - 1, 128)
        # widen the int8 window before the rotate: i32 roll is the
        # known-good Mosaic path, and VMEM/DMA stay 4x smaller in int8
        txt = pltpu.roll(twin[slot].astype(jnp.int32), W - r, axis=1)[:, :B]

        jv = i + dlo + bb
        # pattern char for row i: column (i-1) % 128 of the 128-wide
        # grid-mapped P block (a lone (batch, 1) block is not a legal TPU
        # tile, so the column is extracted with a masked one-hot sum)
        lane = jax.lax.broadcasted_iota(jnp.int32, (batch, 128), 1)
        col = jax.lax.rem(i - 1, 128)
        pat = jnp.sum(jnp.where(lane == col, P_blk_ref[:], 0),
                      axis=1, keepdims=True)   # (batch, 1) int32
        valid = (jv >= 1) & (jv <= tlen) & (i <= plen)
        sub = jnp.where(valid & (pat == txt), 0, x)
        sub = jnp.where(valid, sub, BIG)

        mM, mI1, mI2, mD1, mD2 = M[:], I1[:], I2[:], D1[:], D2[:]
        # diagonal argmin in order [I1, I2, D1, D2, M], first minimum wins
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

        base1 = nM - bb * e1
        cand1 = _shift_right(_prefix_min(base1, B), BIG)
        nI1 = jnp.minimum(cand1 + bb * e1 + o1, BIG)
        base2 = nM - bb * e2
        cand2 = _shift_right(_prefix_min(base2, B), BIG)
        nI2 = jnp.minimum(cand2 + bb * e2 + o2, BIG)
        adj1 = _shift_right(jnp.minimum(nM + o1 + e1, BIG), BIG)
        adj2 = _shift_right(jnp.minimum(nM + o2 + e2, BIG), BIG)
        i1_ext = nI1 < adj1
        i2_ext = nI2 < adj2

        tb = (src
              | jnp.where(i1_ext, 1 << 3, 0)
              | jnp.where(i2_ext, 1 << 4, 0)
              | jnp.where(d1_ext, 1 << 5, 0)
              | jnp.where(d2_ext, 1 << 6, 0))
        tb_out_ref[0] = tb.astype(jnp.uint8)

        at_final = (i == plen) & (bb == b_final)
        lane8 = jax.lax.broadcasted_iota(jnp.int32, (batch, 8), 1)
        f = finals_ref[:]
        for col, v in ((0, nI1), (1, nI2), (2, nD1), (3, nD2), (4, nM)):
            mv = jnp.min(jnp.where(at_final, v, BIG), axis=1, keepdims=True)
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
            jnp.minimum(edge_col(0) + bl, edge_col(B - 1) + br) + act0, BIG)
        edge_ref[:] = jnp.minimum(edge_ref[:], edge_row)

        M[:] = nM
        I1[:] = nI1
        I2[:] = nI2
        D1[:] = nD1
        D2[:] = nD2


@functools.partial(jax.jit, static_argnames=("B", "Lp", "x", "o1", "e1",
                                             "o2", "e2", "interpret"))
def banded_dp_pallas(P, Tband, plen, tlen, dlo, B: int, Lp: int, x: int,
                     o1: int, e1: int, o2: int, e2: int,
                     interpret: bool = False):
    """Same contract as ops/wfa.py:_banded_dp: returns
    (tbs (Lp+1, batch, B) uint8, finals (batch, 5) int32 in PERM order
    [I1, I2, D1, D2, M], edge_min (batch,) int32)."""
    batch = P.shape[0]
    Lp128 = ((Lp + 127) // 128) * 128
    P32 = jnp.pad(P.astype(jnp.int32), ((0, 0), (0, Lp128 - Lp)))
    # pad Tband so the widest aligned DMA window stays in bounds:
    # max albase = ((Lp-1)//128)*128, window width B+128
    need = ((max(Lp - 1, 0)) // 128) * 128 + B + 128
    Tband8 = jnp.pad(Tband.astype(jnp.int8),
                     ((0, 0), (0, max(0, need - Tband.shape[1]))))
    grid = Lp + 1

    kern = functools.partial(_dp_row_kernel, x, o1, e1, o2, e2)
    out_shapes = (
        jax.ShapeDtypeStruct((Lp + 1, batch, B), jnp.uint8),
        jax.ShapeDtypeStruct((batch, 8), jnp.int32),
        jax.ShapeDtypeStruct((batch, 1), jnp.int32),
    )
    tbs, finals8, edge = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((batch, 1), lambda i: (0, 0)),       # plen
            pl.BlockSpec((batch, 1), lambda i: (0, 0)),       # tlen
            pl.BlockSpec((batch, 1), lambda i: (0, 0)),       # dlo
            # row i consumes pattern column i-1 (row 0 reads block 0, unused)
            pl.BlockSpec((batch, 128),
                         lambda i: (0, jnp.maximum(i - 1, 0) // 128)),
            pl.BlockSpec(memory_space=pl.ANY),                # Tband (int8, HBM)
        ],
        out_specs=(
            pl.BlockSpec((1, batch, B), lambda i: (i, 0, 0)),
            pl.BlockSpec((batch, 8), lambda i: (0, 0)),
            pl.BlockSpec((batch, 1), lambda i: (0, 0)),
        ),
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((batch, B), jnp.int32),   # M
            pltpu.VMEM((batch, B), jnp.int32),   # I1
            pltpu.VMEM((batch, B), jnp.int32),   # I2
            pltpu.VMEM((batch, B), jnp.int32),   # D1
            pltpu.VMEM((batch, B), jnp.int32),   # D2
            pltpu.VMEM((2, batch, B + 128), jnp.int8),   # 2x text windows
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(plen.reshape(batch, 1).astype(jnp.int32),
      tlen.reshape(batch, 1).astype(jnp.int32),
      dlo.reshape(batch, 1).astype(jnp.int32),
      P32, Tband8)
    return tbs, finals8[:, :5], edge[:, 0]


def _suffix_or(x, B):
    """Reverse inclusive cummax over a 0/1 plane via the doubling ladder."""
    r = x
    s = 1
    while s < B:
        r = jnp.maximum(r, jnp.concatenate(
            [r[:, s:], jnp.zeros_like(r[:, :s])], axis=1))
        s *= 2
    return r


def _bwd_row_kernel(plen_ref, tlen_ref, dlo_ref,   # VMEM (batch, 1) int32
                    finals_ref,                    # VMEM (batch, 8) int32
                    tb_ref,                        # VMEM (1, batch, B) uint8
                    out_ref,                       # VMEM (1, batch, 8) int32
                    b0_ref,                        # VMEM (batch, 8) int32
                    u, s):                         # VMEM scratch planes
    """One grid step per traceback row, walking rows Lp..1 (step k handles
    row Lp-k).  Mirrors ops/wfa.py:_backward_resolve bit for bit: the band
    position is a one-hot plane, I-chains collapse via suffix-or + lowest
    non-extension, and each step emits packed = op<<14 | min(n_ins, 16383)
    into lane 0 of its output row."""
    k = pl.program_id(0)
    n_rows = pl.num_programs(0)
    B = u.shape[1]
    batch = u.shape[0]
    i = n_rows - k                                # row Lp - k
    bb = jax.lax.broadcasted_iota(jnp.int32, (batch, B), 1)
    lane8 = jax.lax.broadcasted_iota(jnp.int32, (batch, 8), 1)
    plen = plen_ref[:]
    b_final = tlen_ref[:] - plen - dlo_ref[:]

    @pl.when(k == 0)
    def _init():
        u[:] = jnp.zeros((batch, B), jnp.int32)
        s[:] = jnp.zeros((batch, 8), jnp.int32)

    act = i <= plen                               # (batch, 1)
    init_here = i == plen
    # first column achieving the finals min, in canonical state order
    # (finals columns are PERM order I1,I2,D1,D2,M -> canonical 1,2,3,4,0)
    f = finals_ref[:]
    fmin = jnp.min(f, axis=1, keepdims=True)
    is_min = jnp.where((f == fmin) & (lane8 < 5), lane8, 8)
    first = jnp.min(is_min, axis=1, keepdims=True)    # PERM index 0..4
    canon = jax.lax.rem(first + 1, 5)                 # PERM -> canonical id
    s_final = jnp.where(lane8 == canon, 1, 0)

    uu = jnp.where(init_here, jnp.where(bb == b_final, 1, 0), u[:])
    ss = jnp.where(init_here, s_final, s[:])

    tb32 = tb_ref[0].astype(jnp.int32)
    is_I = (ss[:, 1:2] | ss[:, 2:3]) > 0
    is_D = (ss[:, 3:4] | ss[:, 4:5]) > 0
    ext_plane = jnp.where(ss[:, 1:2] > 0, (tb32 >> 3) & 1, (tb32 >> 4) & 1)
    reach = _suffix_or(uu, B)
    c = reach * (1 - ext_plane)
    so_next = jnp.concatenate(
        [_suffix_or(c, B)[:, 1:], jnp.zeros((batch, 1), jnp.int32)], axis=1)
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
                     jnp.sum(uu * ((tb32 >> 5) & 1), axis=1, keepdims=True),
                     jnp.sum(uu * ((tb32 >> 6) & 1), axis=1, keepdims=True))
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
    out_ref[0] = jnp.where(lane8 == 0, packed, 0)
    b0_ref[:] = jnp.where(lane8 == 0,
                          jnp.sum(bb * u_next, axis=1, keepdims=True), 0)


@functools.partial(jax.jit, static_argnames=("B", "Lp", "interpret"))
def backward_resolve_pallas(tbs, plen, tlen, dlo, finals, B: int, Lp: int,
                            interpret: bool = False):
    """Same walk as ops/wfa.py:_backward_resolve but one Pallas grid step
    per row.  Takes the (batch, 5) PERM-order finals; returns
    (packed (Lp, batch) int32 with op<<14|n_ins in step order row Lp..1,
    b0 (batch,) int32)."""
    batch = tbs.shape[1]
    finals8 = jnp.pad(finals, ((0, 0), (0, 3)), constant_values=BIG)
    out, b0 = pl.pallas_call(
        _bwd_row_kernel,
        grid=(Lp,),
        in_specs=[
            pl.BlockSpec((batch, 1), lambda k: (0, 0)),
            pl.BlockSpec((batch, 1), lambda k: (0, 0)),
            pl.BlockSpec((batch, 1), lambda k: (0, 0)),
            pl.BlockSpec((batch, 8), lambda k: (0, 0)),
            pl.BlockSpec((1, batch, B), lambda k: (Lp - k, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, batch, 8), lambda k: (k, 0, 0)),
            pl.BlockSpec((batch, 8), lambda k: (0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Lp, batch, 8), jnp.int32),
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
      finals8, tbs)
    return out[:, :, 0], b0[:, 0]


def vmem_fits(batch: int, B: int, Lp: int) -> bool:
    """Empirical scoped-VMEM fit on v5e: every probed (batch, B) with
    batch*B <= 2^17 compiles; every larger one tripped the 16M scoped-vmem
    limit (the compiler's stack accounting is non-monotonic in the shapes,
    so the cap is calibrated, not modeled).  Callers chunk larger batches."""
    return batch % 8 == 0 and B % 128 == 0 and batch * B <= 131072
