"""Pallas TPU kernels for the SGM hot path.

XLA's ``lax.scan`` formulation of the semi-global recurrence
(:func:`pcmi_tpu.ops.stereo.matching._sgm_scan`) runs ~10x off HBM
speed-of-light: each scan step is a tiny (D, span) elementwise op chained
by a sequential dependency, and the 4 directions each pay transposes and
stack copies of the full volume.

Kernel design (one direction per ``pallas_call``):

* Volume layout ``(H, W, D)`` with D padded to the 128-lane width — the
  recurrence state for a band of 128 rows is a ``(128, 128)`` register
  tile: min-over-disparities is a lane reduction, the d±1 terms are lane
  rolls, every step is full-width VPU work.
* The volume stays in HBM (``memory_space=ANY``); the kernel streams
  ``(BAND, CHUNK, 128)`` blocks through VMEM with double-buffered async
  DMA in scan order (forward or reverse), computes CHUNK recurrence steps
  per block, and streams the aggregated block back out. Per direction the
  traffic is exactly read-volume + write-volume.
* The four directional outputs are combined by one fused XLA add.

Recurrence (Hirschmüller 2008, parity with ``matching._sgm_scan``):
    L(p, d) = C(p, d) + min(L', L'[d-1]+P1, L'[d+1]+P1, min_d L' + P2) - min_d L'

Spatial padding is zero-valued so the recurrence washes in exactly like
the XLA scan's zero init (BIG spatial padding would destroy the cost in
f32: c + 1e9 - 1e9 rounds c away). Disparity lane padding uses BIG to act
as the no-neighbour edge.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# plain float: a jnp scalar would be a captured constant inside the kernel
BIG = 1e9


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _step(prev, c, p1, p2):
    """One SGM update on a (rows, 128) tile; lanes = disparities."""
    lanes = jax.lax.broadcasted_iota(jnp.int32, prev.shape, prev.ndim - 1)
    n = prev.shape[-1]
    m = jnp.min(prev, axis=-1, keepdims=True)
    up = jnp.where(lanes == 0, BIG, pltpu.roll(prev, 1, axis=prev.ndim - 1))
    # pltpu.roll requires a non-negative shift: -1 == n-1 circularly
    dn = jnp.where(lanes == n - 1, BIG, pltpu.roll(prev, n - 1, axis=prev.ndim - 1))
    best = jnp.minimum(jnp.minimum(prev, m + p2),
                       jnp.minimum(up + p1, dn + p1))
    return c + best - m


def _step_sub(prev, c, p1, p2):
    """SGM update with disparities on SUBLANES (axis -2), band on lanes.

    Sublane shifts and reductions are cheaper than lane crossbars on the
    VPU, so this layout beats the lane-disparity variant for the per-step
    recurrence math."""
    subl = jax.lax.broadcasted_iota(jnp.int32, prev.shape, prev.ndim - 2)
    n = prev.shape[-2]
    m = jnp.min(prev, axis=-2, keepdims=True)
    up = jnp.where(subl == 0, BIG, pltpu.roll(prev, 1, axis=prev.ndim - 2))
    dn = jnp.where(subl == n - 1, BIG,
                   pltpu.roll(prev, n - 1, axis=prev.ndim - 2))
    best = jnp.minimum(jnp.minimum(prev, m + p2),
                       jnp.minimum(up + p1, dn + p1))
    return c + best - m


def _make_dir_kernel_sub(reverse: bool, span: int, chunk: int,
                         band: int, p1: float, p2: float):
    """One-direction kernel over an (S, D, B) volume scanning axis 0.

    ``S`` = scan extent, ``D`` = padded disparities (sublanes), ``B`` =
    total band extent (lanes). Grid over B/band."""
    nchunks = span // chunk

    def kernel(vol_hbm, out_hbm, inbuf, outbuf, insem, outsem):
        b = pl.program_id(0)

        def chunk_start(k):
            c = k if not reverse else nchunks - 1 - k
            return c * chunk

        def hbm_block(ref, k):
            return ref.at[pl.ds(chunk_start(k), chunk), :,
                          pl.ds(b * band, band)]

        def start_in(k, slot):
            pltpu.make_async_copy(hbm_block(vol_hbm, k), inbuf.at[slot],
                                  insem.at[slot]).start()

        def wait_in(k, slot):
            pltpu.make_async_copy(hbm_block(vol_hbm, k), inbuf.at[slot],
                                  insem.at[slot]).wait()

        def start_out(k, slot):
            pltpu.make_async_copy(outbuf.at[slot], hbm_block(out_hbm, k),
                                  outsem.at[slot]).start()

        def wait_out(k, slot):
            pltpu.make_async_copy(outbuf.at[slot], hbm_block(out_hbm, k),
                                  outsem.at[slot]).wait()

        start_in(0, 0)
        if nchunks > 1:
            start_in(1, 1)
        state0 = jnp.zeros((inbuf.shape[2], band), jnp.float32)

        def chunk_body(k, state):
            slot = k % 2
            wait_in(k, slot)

            @pl.when(k >= 2)
            def _():
                wait_out(k - 2, slot)

            UNROLL = 4  # amortise per-iteration loop overhead (chunk % 4 == 0)

            def pos_body(jj, st):
                for u in range(UNROLL):
                    j = jj * UNROLL + u
                    x = j if not reverse else chunk - 1 - j
                    # volumes may be stored bf16; the recurrence state and
                    # arithmetic stay f32 (jnp promotion), stores downcast
                    st = _step_sub(st, inbuf[slot, x].astype(jnp.float32),
                                   p1, p2)
                    outbuf[slot, x] = st.astype(outbuf.dtype)
                return st

            state = jax.lax.fori_loop(0, chunk // UNROLL, pos_body, state)
            start_out(k, slot)

            @pl.when(k + 2 < nchunks)
            def _():
                start_in(k + 2, slot)

            return state

        jax.lax.fori_loop(0, nchunks, chunk_body, state0)
        wait_out(nchunks - 1, (nchunks - 1) % 2)
        if nchunks > 1:
            wait_out(nchunks - 2, (nchunks - 2) % 2)

    return kernel


def _dir_call_sub(vol_sdb, reverse, band, chunk, p1, p2):
    s, dp, bt = vol_sdb.shape
    dt = vol_sdb.dtype  # bf16 volumes halve the DMA traffic (cost_dtype)
    kernel = _make_dir_kernel_sub(reverse, s, chunk, band, p1, p2)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((s, dp, bt), dt),
        grid=(bt // band,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, chunk, dp, band), dt),
            pltpu.VMEM((2, chunk, dp, band), dt),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=_interpret(),
    )(vol_sdb)


def _make_blocked_kernel(reverse: bool, with_prev: bool, nchunks: int,
                         p1: float, p2: float):
    """Blocked-layout SGM kernel: grid (bands, chunks), block (1, C, D, 128).

    The band is the CONTIGUOUS minor axis of the blocked volume, so every
    pallas-managed block DMA moves full-width rows — the strided-sliver DMA
    of the manual variant ran at ~2% of HBM bandwidth and dominated wall
    time regardless of the recurrence. State lives in VMEM scratch, which
    persists across the sequential TPU grid; it resets at chunk index 0.
    ``with_prev`` adds a second input accumulated into the output (the
    forward pass result), so both directions cost three volume passes.
    """

    def kernel(*refs):
        if with_prev:
            cost_ref, prev_ref, out_ref, state = refs
        else:
            cost_ref, out_ref, state = refs
            prev_ref = None
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            state[...] = jnp.zeros_like(state)

        chunk = cost_ref.shape[1]

        def pos(j, st):
            x = j if not reverse else chunk - 1 - j
            st = _step_sub(st, cost_ref[0, x].astype(jnp.float32), p1, p2)
            if prev_ref is not None:
                out_ref[0, x] = (st + prev_ref[0, x]).astype(out_ref.dtype)
            else:
                out_ref[0, x] = st.astype(out_ref.dtype)
            return st

        state[...] = jax.lax.fori_loop(0, chunk, pos, state[...])

    return kernel


def _blocked_dir_sum(vol_b, nchunks, chunk, p1, p2):
    """fwd then bwd+accumulate over a (nb, S, D, 128) blocked volume."""
    nb, s, dp, lanes = vol_b.shape

    def call(reverse, with_prev, args):
        idx = (lambda b, k: (b, nchunks - 1 - k, 0, 0)) if reverse else \
            (lambda b, k: (b, k, 0, 0))
        spec = pl.BlockSpec((1, chunk, dp, lanes), idx,
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            _make_blocked_kernel(reverse, with_prev, nchunks, p1, p2),
            out_shape=jax.ShapeDtypeStruct((nb, s, dp, lanes), vol_b.dtype),
            grid=(nb, nchunks),
            in_specs=[spec] * len(args),
            out_specs=spec,
            scratch_shapes=[pltpu.VMEM((dp, lanes), jnp.float32)],
            interpret=_interpret(),
        )(*args)

    fwd = call(False, False, (vol_b,))
    return call(True, True, (vol_b, fwd))


@partial(jax.jit, static_argnames=("p1", "p2", "chunk"))
def sgm_aggregate_pallas_blocked(
    vol_dhw: jnp.ndarray,
    p1: float,
    p2: float,
    chunk: int = 32,
) -> jnp.ndarray:
    """4-path SGM via contiguous-band blocked kernels (the fast TPU path)."""
    d, h, w = vol_dhw.shape
    sub = 16 if vol_dhw.dtype == jnp.bfloat16 else 8
    dp = int(np.ceil(d / sub) * sub)
    hp = int(np.ceil(h / max(128, chunk)) * max(128, chunk))
    wp = int(np.ceil(w / max(128, chunk)) * max(128, chunk))
    vol = jnp.pad(vol_dhw, ((0, dp - d), (0, 0), (0, 0)), constant_values=BIG)
    vol = jnp.pad(vol, ((0, 0), (0, hp - h), (0, wp - w)))

    # vertical: scan H; bands = W/128 contiguous lanes
    vb = jnp.transpose(vol, (1, 0, 2)).reshape(hp, dp, wp // 128, 128)
    vb = jnp.transpose(vb, (2, 0, 1, 3))                  # (nb, H, D, 128)
    vert = _blocked_dir_sum(vb, hp // chunk, chunk, p1, p2)
    vert = jnp.transpose(vert, (1, 2, 0, 3)).reshape(hp, dp, wp)
    vert = jnp.transpose(vert, (1, 0, 2))                 # (D, H, W)

    # horizontal: scan W; bands = H/128
    hb = jnp.transpose(vol, (2, 0, 1)).reshape(wp, dp, hp // 128, 128)
    hb = jnp.transpose(hb, (2, 0, 1, 3))                  # (mb, W, D, 128)
    horiz = _blocked_dir_sum(hb, wp // chunk, chunk, p1, p2)
    horiz = jnp.transpose(horiz, (1, 2, 0, 3)).reshape(wp, dp, hp)
    horiz = jnp.transpose(horiz, (1, 2, 0))               # (D, H, W)

    out = (vert + horiz) * 0.25
    return out[:d, :h, :w]


@partial(jax.jit, static_argnames=("p1", "p2", "band", "chunk", "dirs"))
def sgm_aggregate_pallas_sub(
    vol_dhw: jnp.ndarray,
    p1: float,
    p2: float,
    band: int = 128,
    chunk: int | None = None,
    dirs: str = "4",
) -> jnp.ndarray:
    """SGM on a (D, H, W) volume, disparity-on-sublanes kernels.

    Returns the (D, H, W) mean of the directional aggregations —
    ``dirs="4"`` all four paths, ``dirs="h"`` the two horizontal paths,
    ``dirs="v"`` the two vertical paths (each two-path form is half the
    kernel work; see :func:`matching.sgm_aggregate`).

    ``chunk`` (scan positions per double-buffered DMA block) defaults to
    the largest power of two whose four in/out buffers fit a ~12 MB VMEM
    budget, capped at 64: on the flagship D=80 volume chunk 16 → 64 cut
    the 4-path kernel 4.65 → 3.53 ms (longer DMA bursts amortise the
    per-transfer latency; past 64 the return vanishes while padding and
    VMEM pressure grow)."""
    d, h, w = vol_dhw.shape
    # sublane granularity is dtype-dependent: (8, 128) f32 tiles, (16, 128)
    # bf16 tiles
    sub = 16 if vol_dhw.dtype == jnp.bfloat16 else 8
    dp = int(np.ceil(d / sub) * sub)
    if chunk is None:
        # scratch = 2 buffers x 2 slots x (chunk, dp, band) x esize
        esize = 2 if vol_dhw.dtype == jnp.bfloat16 else 4
        chunk = 8
        while chunk < 64 and 4 * (2 * chunk) * dp * band * esize <= 12e6:
            chunk *= 2
    gran = int(np.lcm(band, chunk))  # band divides the grid, chunk the span
    hp = int(np.ceil(h / gran) * gran)
    wp = int(np.ceil(w / gran) * gran)
    vol = jnp.pad(vol_dhw, ((0, dp - d), (0, 0), (0, 0)), constant_values=BIG)
    vol = jnp.pad(vol, ((0, 0), (0, hp - h), (0, wp - w)))

    horiz = None
    if dirs in ("4", "h"):
        vol_h = jnp.transpose(vol, (2, 0, 1))  # (W, D, H): scan cols
        lr = _dir_call_sub(vol_h, False, band, chunk, p1, p2)
        rl = _dir_call_sub(vol_h, True, band, chunk, p1, p2)
        horiz = jnp.transpose(lr + rl, (1, 2, 0))
        if dirs == "h":
            return (horiz * 0.5)[:d, :h, :w]
    vol_v = jnp.swapaxes(vol, 0, 1)            # (H, D, W): scan rows
    tb = _dir_call_sub(vol_v, False, band, chunk, p1, p2)
    bt = _dir_call_sub(vol_v, True, band, chunk, p1, p2)
    vert = jnp.swapaxes(tb + bt, 0, 1)
    if dirs == "v":
        return (vert * 0.5)[:d, :h, :w]
    return ((vert + horiz) * 0.25)[:d, :h, :w]


def _make_dir_kernel(scan_axis: int, reverse: bool, span: int, chunk: int,
                     band: int, p1: float, p2: float):
    """One-direction SGM kernel over HBM-resident (H, W, 128k) volume.

    ``scan_axis``: 1 = horizontal (band = rows), 0 = vertical (band = cols).
    Streams ``chunk`` scan positions per DMA block, double-buffered.
    """
    nchunks = span // chunk

    def kernel(vol_hbm, out_hbm, inbuf, outbuf, insem, outsem):
        b = pl.program_id(0)
        lanes = inbuf.shape[-1]

        def chunk_start(k):
            c = k if not reverse else nchunks - 1 - k
            return c * chunk

        def hbm_block(ref, k):
            s = chunk_start(k)
            if scan_axis == 1:
                return ref.at[pl.ds(b * band, band), pl.ds(s, chunk), :]
            return ref.at[pl.ds(s, chunk), pl.ds(b * band, band), :]

        def start_in(k, slot):
            pltpu.make_async_copy(hbm_block(vol_hbm, k), inbuf.at[slot],
                                  insem.at[slot]).start()

        def wait_in(k, slot):
            pltpu.make_async_copy(hbm_block(vol_hbm, k), inbuf.at[slot],
                                  insem.at[slot]).wait()

        def start_out(k, slot):
            pltpu.make_async_copy(outbuf.at[slot], hbm_block(out_hbm, k),
                                  outsem.at[slot]).start()

        def wait_out(k, slot):
            pltpu.make_async_copy(outbuf.at[slot], hbm_block(out_hbm, k),
                                  outsem.at[slot]).wait()

        start_in(0, 0)
        if nchunks > 1:
            start_in(1, 1)

        state0 = jnp.zeros((band, lanes), jnp.float32)

        def chunk_body(k, state):
            slot = k % 2
            wait_in(k, slot)

            # previous use of this out slot must have drained
            @pl.when(k >= 2)
            def _():
                wait_out(k - 2, slot)

            def pos_body(j, st):
                # scan position inside the chunk, honouring direction
                x = j if not reverse else chunk - 1 - j
                if scan_axis == 1:
                    c = inbuf[slot, :, x, :]
                else:
                    c = inbuf[slot, x, :, :]
                st = _step(st, c, p1, p2)
                if scan_axis == 1:
                    outbuf[slot, :, x, :] = st
                else:
                    outbuf[slot, x, :, :] = st
                return st

            state = jax.lax.fori_loop(0, chunk, pos_body, state)
            start_out(k, slot)

            @pl.when(k + 2 < nchunks)
            def _():
                start_in(k + 2, slot)

            return state

        jax.lax.fori_loop(0, nchunks, chunk_body, state0)
        wait_out(nchunks - 1, (nchunks - 1) % 2)
        if nchunks > 1:
            wait_out(nchunks - 2, (nchunks - 2) % 2)

    return kernel


def _dir_call(vol, scan_axis, reverse, band, chunk, p1, p2):
    hp, wp, dp = vol.shape
    span = wp if scan_axis == 1 else hp
    nbands = (hp if scan_axis == 1 else wp) // band
    if scan_axis == 1:
        buf_shape = (2, band, chunk, dp)
    else:
        buf_shape = (2, chunk, band, dp)
    kernel = _make_dir_kernel(scan_axis, reverse, span, chunk, band, p1, p2)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((hp, wp, dp), jnp.float32),
        grid=(nbands,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM(buf_shape, jnp.float32),
            pltpu.VMEM(buf_shape, jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=_interpret(),
    )(vol)


@partial(jax.jit, static_argnames=("p1", "p2", "band", "chunk"))
def sgm_aggregate_pallas(
    vol_hwd: jnp.ndarray,
    p1: float,
    p2: float,
    band: int = 128,
    chunk: int = 32,
) -> jnp.ndarray:
    """4-path SGM over an (H, W, D) volume; D padded to 128 lanes.

    Returns the (H, W, D) mean of the four directional aggregations
    (parity with :func:`matching.sgm_aggregate`).
    """
    h, w, d = vol_hwd.shape
    dp = int(np.ceil(d / 128) * 128)
    gran = max(band, chunk)
    hp = int(np.ceil(h / gran) * gran)
    wp = int(np.ceil(w / gran) * gran)
    vol = jnp.pad(vol_hwd, ((0, 0), (0, 0), (0, dp - d)), constant_values=BIG)
    vol = jnp.pad(vol, ((0, hp - h), (0, wp - w), (0, 0)))

    # All four passes scan the MAJOR axis of their volume: the in-kernel
    # dynamic index then selects a contiguous (band, 128) tile. The
    # horizontal passes run on the (W, H, D) transpose (one XLA copy each
    # way — far cheaper than strided mid-axis VMEM reads every step).
    tb = _dir_call(vol, 0, False, band, chunk, p1, p2)
    bt = _dir_call(vol, 0, True, band, chunk, p1, p2)
    vol_t = jnp.swapaxes(vol, 0, 1)
    lr = _dir_call(vol_t, 0, False, band, chunk, p1, p2)
    rl = _dir_call(vol_t, 0, True, band, chunk, p1, p2)
    out = (tb + bt + jnp.swapaxes(lr + rl, 0, 1)) * 0.25
    return out[:h, :w, :d]


# ---------------------------------------------------------------------------
# Fused single-pass WTA (argmin + subpixel neighbours + uniqueness margin)
# ---------------------------------------------------------------------------


def _make_wta_kernel(nk: int, dc: int, hc: int, d_min: float, stride: float,
                     subpixel: bool):
    """One streaming read of a (D, H, W) volume -> (disp, best, margin).

    The XLA WTA costs four full-volume passes (argmin, two neighbour
    takes, the away-margin reduction); at the flagship canvas that is
    the single largest non-SGM stage. Here per-(hc, 128) tile state
    tracks the FOUR smallest costs with their disparity indices (the
    best's two neighbours can occupy at most two of the top-4 slots, so
    the first non-neighbour slot is exactly the >1-px-away margin the
    XLA form computes) plus the best's d±1 values for the parabola —
    one pass, exact.
    """

    def kernel(vol_ref, disp_hbm, best_hbm, marg_hbm,
               st, disp_s, best_s, marg_s, sem):
        i = pl.program_id(0)
        j = pl.program_id(1)
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            st[...] = jnp.full_like(st, BIG)
            # index slots (4..7) start at impossible positions
            st[4] = jnp.full_like(st[4], -8.0)
            st[5] = jnp.full_like(st[5], -8.0)
            st[6] = jnp.full_like(st[6], -8.0)
            st[7] = jnp.full_like(st[7], -8.0)

        def slice_body(di, _):
            dd = (k * dc + di).astype(jnp.float32)
            val = vol_ref[di].astype(jnp.float32)
            v1, v2, v3, v4 = st[0], st[1], st[2], st[3]
            i1, i2, i3, i4 = st[4], st[5], st[6], st[7]
            prevv, nextv, last = st[8], st[9], st[10]

            b1 = val < v1
            b2 = val < v2
            b3 = val < v3
            b4 = val < v4
            # sorted top-4 insertion (indices ride along)
            st[3] = jnp.where(b3, v3, jnp.where(b4, val, v4))
            st[7] = jnp.where(b3, i3, jnp.where(b4, dd, i4))
            st[2] = jnp.where(b2, v2, jnp.where(b3, val, v3))
            st[6] = jnp.where(b2, i2, jnp.where(b3, dd, i3))
            st[1] = jnp.where(b1, v1, jnp.where(b2, val, v2))
            st[5] = jnp.where(b1, i1, jnp.where(b2, dd, i2))
            st[0] = jnp.where(b1, val, v1)
            st[4] = jnp.where(b1, dd, i1)
            # subpixel neighbours of the running best: on a new best the
            # left neighbour is the previous slice and the right one is
            # pending (filled on the next slice)
            st[8] = jnp.where(b1, last, prevv)
            st[9] = jnp.where(b1, BIG, jnp.where(dd == i1 + 1.0, val, nextv))
            st[10] = val
            return 0

        jax.lax.fori_loop(0, dc, slice_body, 0)

        @pl.when(k == nk - 1)
        def _():
            v1, v2, v3, v4 = st[0], st[1], st[2], st[3]
            i1, i2, i3, i4 = st[4], st[5], st[6], st[7]
            prevv, nextv = st[8], st[9]
            if subpixel:
                denom = prevv + nextv - 2.0 * v1
                ok = (prevv < 0.5 * BIG) & (nextv < 0.5 * BIG) & (denom > 1e-9)
                off = jnp.where(
                    ok, 0.5 * (prevv - nextv) / jnp.maximum(denom, 1e-9), 0.0)
                off = jnp.clip(off, -1.0, 1.0)
            else:
                off = 0.0
            disp_s[...] = d_min + stride * (i1 + off)
            best_s[...] = v1
            a2 = jnp.abs(i2 - i1) > 1.0
            a3 = jnp.abs(i3 - i1) > 1.0
            marg_s[...] = jnp.where(a2, v2, jnp.where(a3, v3, v4)) - v1
            hs = disp_s.shape[0]
            for n, (s, hbm) in enumerate(((disp_s, disp_hbm),
                                          (best_s, best_hbm),
                                          (marg_s, marg_hbm))):
                cp = pltpu.make_async_copy(
                    s, hbm.at[pl.ds(i * hs, hs), pl.ds(j * 128, 128)],
                    sem.at[n])
                cp.start()
                cp.wait()

    return kernel


@partial(jax.jit, static_argnames=("d_min", "stride", "subpixel",
                                   "hc", "dc"))
def wta_fused_pallas(vol_dhw: jnp.ndarray, d_min: int, stride: int = 1,
                     subpixel: bool = True, hc: int = 64, dc: int = 16):
    """(disp, best, margin) from a (D, H, W) volume in one streaming read.

    Parity with ``matching.wta_disparity(..., with_margin=True)`` up to
    f32 arithmetic order. Disparity-axis padding is BIG (never wins);
    spatial padding is cropped from the outputs.
    """
    d, h, w = vol_dhw.shape
    dp = int(np.ceil(d / dc) * dc)
    hp = int(np.ceil(h / hc) * hc)
    wp = int(np.ceil(w / 128) * 128)
    vol = jnp.pad(vol_dhw, ((0, dp - d), (0, 0), (0, 0)),
                  constant_values=BIG)
    vol = jnp.pad(vol, ((0, 0), (0, hp - h), (0, wp - w)))
    nk = dp // dc

    kernel = _make_wta_kernel(nk, dc, hc, float(d_min), float(stride),
                              bool(subpixel))
    out_shape = [jax.ShapeDtypeStruct((hp, wp), jnp.float32)] * 3
    disp, best, marg = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(hp // hc, wp // 128, nk),
        in_specs=[pl.BlockSpec((dc, hc, 128), lambda i, j, k: (k, i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        scratch_shapes=[
            pltpu.VMEM((11, hc, 128), jnp.float32),
            pltpu.VMEM((hc, 128), jnp.float32),
            pltpu.VMEM((hc, 128), jnp.float32),
            pltpu.VMEM((hc, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=_interpret(),
    )(vol)
    return disp[:h, :w], best[:h, :w], marg[:h, :w]


# ---------------------------------------------------------------------------
# Right-view volume derivation: a pure double-buffered DMA pipe
# ---------------------------------------------------------------------------


def _make_derive_kernel(D: int, hc: int, w: int, d_min: int, stride: int):
    """out[d, band, :] = volp[d, band, pad + d_min + d*stride : ... + w].

    The XLA scan form of the per-disparity shift runs at ~half HBM
    bandwidth (measured); this kernel is a double-buffered HBM->VMEM->HBM
    copy pipe whose input offset walks the disparity shift. Mosaic
    requires DMA lane offsets divisible by 128, so each step copies a
    128-aligned superset window and takes the residual shift as a STATIC
    lane slice in VMEM (the d-loop is Python-unrolled; every offset is a
    compile-time constant).
    """
    pad = max(abs(d_min), abs(d_min + (D - 1) * stride)) + 1
    w128 = w + 128

    def off(d):
        return pad + d_min + d * stride

    def a_of(d):
        return (off(d) // 128) * 128

    def kernel(volp_hbm, out_hbm, inbuf, outbuf, insem, outsem):
        b = pl.program_id(0)

        def start_in(d, slot):
            pltpu.make_async_copy(
                volp_hbm.at[d, pl.ds(b * hc, hc), pl.ds(a_of(d), w128)],
                inbuf.at[slot], insem.at[slot]).start()

        def wait_in(d, slot):
            pltpu.make_async_copy(
                volp_hbm.at[d, pl.ds(b * hc, hc), pl.ds(a_of(d), w128)],
                inbuf.at[slot], insem.at[slot]).wait()

        def start_out(d, slot):
            pltpu.make_async_copy(outbuf.at[slot],
                                  out_hbm.at[d, pl.ds(b * hc, hc), :],
                                  outsem.at[slot]).start()

        def wait_out(d, slot):
            pltpu.make_async_copy(outbuf.at[slot],
                                  out_hbm.at[d, pl.ds(b * hc, hc), :],
                                  outsem.at[slot]).wait()

        start_in(0, 0)
        if D > 1:
            start_in(1, 1)
        for d in range(D):
            slot = d % 2
            wait_in(d, slot)
            if d >= 2:
                wait_out(d - 2, slot)
            r = off(d) - a_of(d)
            outbuf[slot] = inbuf[slot, :, r:r + w]
            start_out(d, slot)
            if d + 2 < D:
                start_in(d + 2, slot)
        wait_out(D - 1, (D - 1) % 2)
        if D > 1:
            wait_out(D - 2, (D - 2) % 2)

    return kernel


@partial(jax.jit, static_argnames=("d_min", "fill", "stride", "hc"))
def derive_right_pallas(vol: jnp.ndarray, d_min: int, fill: float = 1.0,
                        stride: int = 1, hc: int = 128) -> jnp.ndarray:
    """Pallas twin of :func:`matching.derive_right_volume` (bit-identical)."""
    D, h, w = vol.shape
    pad = max(abs(d_min), abs(d_min + (D - 1) * stride)) + 1
    hp = int(np.ceil(h / hc) * hc)
    # right pad extended so every 128-aligned superset window fits
    volp = jnp.pad(vol, ((0, 0), (0, hp - h), (pad, pad + 128)),
                   constant_values=jnp.asarray(fill, vol.dtype))
    out = pl.pallas_call(
        _make_derive_kernel(D, hc, w, d_min, stride),
        out_shape=jax.ShapeDtypeStruct((D, hp, w), vol.dtype),
        grid=(hp // hc,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, hc, w + 128), vol.dtype),
            pltpu.VMEM((2, hc, w), vol.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=_interpret(),
    )(volp)
    return out[:, :h, :]


def _make_derive_wdh_kernel(dp_total: int, d_real: int, w: int, wp: int,
                            d_min: int, stride: int, fill: float, hc: int,
                            seg: int):
    """Derive the right-view volume IN the (W, Dp, H) scan layout.

    ``out[x, d, :] = vol_h[x + off(d), d, :]`` with ``off(d) = d_min +
    d*stride`` — the shift rides the MAJOR axis, so each d slice is one
    strided HBM->VMEM->HBM copy with no per-element work; only the
    out-of-image tails are patched on the VPU:

    * ``x + off`` outside ``[0, w)`` (and ``x < w``) -> ``fill`` (the
      invalid-cost ceiling, matching ``derive_right_volume``'s pad),
    * ``x in [w, wp)`` -> 0 (the spatial pad the old chain applied after
      deriving),
    * ``d >= d_real`` (disparity lane padding) -> BIG.

    Grid over H lane-bands (DMA lane offsets must be 128-aligned; the
    major-axis offsets are unconstrained). The d loop is Python-unrolled
    so every DMA extent is static. Replaces the old chain's derive +
    spatial pad + (W, Dp, H) relayout — and its input is the SAME padded
    transposed volume the fused left path builds, which XLA CSE dedupes
    when both are jitted together: ~4 fewer full-volume passes.
    """

    def off(d):
        return d_min + d * stride

    # d slices are processed in 8-groups: HBM refs are (8, 128)-tiled on
    # their trailing dims, so a DMA may only slice the D axis at 8-aligned
    # offsets/extents (``pl.multiple_of`` carries the alignment proof for
    # the loop-carried group index). The per-d residual shift within a
    # group is applied as value-level VMEM reads (dynamic starts are
    # unconstrained there) and the out-of-image / spatial-pad / BIG
    # regions as where-masks — everything dynamic in the group index, so
    # each segment's derive is ONE fori_loop body for Mosaic to compile
    # (a Python-unrolled variant cost minutes of compile per shape).
    #
    # ``seg`` splits the W axis so the VMEM pipeline (in rows must extend
    # by the full shift range off_max) fits the ~16 MB core budget at the
    # MAX_DISP=288 envelope; segments are a STATIC Python loop (their DMA
    # extents differ) around the dynamic group loop.
    ngroups = dp_total // 8
    assert dp_total % 8 == 0, dp_total
    pad_lo = -min(d_min, 0)  # value-read base offset for negative shifts
    off_max = max(d_min + (dp_total - 1) * stride, 0)
    segments = []
    s0 = 0
    while s0 < wp:
        si = min(seg, wp - s0)
        in_start = max(s0 - pad_lo, 0)
        in_rows = min(s0 + si + off_max, wp) - in_start
        lead = max(pad_lo - s0, 0)
        segments.append((s0, si, in_start, in_rows, lead))
        s0 += si

    def kernel(vol_hbm, out_hbm, inbuf, outbuf, insem, outsem):
        b = pl.program_id(0)
        lanes = pl.ds(b * hc, hc)
        big = jnp.asarray(BIG, outbuf.dtype)
        f = jnp.asarray(fill, outbuf.dtype)

        for (s0, si, in_start, in_rows, lead) in segments:
            xw = s0 + jax.lax.broadcasted_iota(jnp.int32, (si, hc), 0)

            def in_copy(g, slot):
                dg = pl.multiple_of(g * 8, 8)
                return pltpu.make_async_copy(
                    vol_hbm.at[pl.ds(in_start, in_rows), pl.ds(dg, 8),
                               lanes],
                    inbuf.at[slot, pl.ds(lead, in_rows)], insem.at[slot])

            def out_copy(g, slot):
                dg = pl.multiple_of(g * 8, 8)
                return pltpu.make_async_copy(
                    outbuf.at[slot, pl.ds(0, si)],
                    out_hbm.at[pl.ds(s0, si), pl.ds(dg, 8), lanes],
                    outsem.at[slot])

            in_copy(0, 0).start()
            if ngroups > 1:
                in_copy(1, 1).start()

            def body(g, _):
                slot = g % 2
                in_copy(g, slot).wait()

                @pl.when(g >= 2)
                def _():
                    out_copy(g - 2, slot).wait()

                for k in range(8):
                    d = g * 8 + k
                    o = d_min + d * stride
                    val = inbuf[slot, pl.ds(pad_lo + o, si), k]
                    src = xw + o
                    val = jnp.where((src < 0) | (src >= w), f, val)
                    val = jnp.where(d >= d_real, big, val)
                    # spatial pad columns: the old chain's 0-pad applied
                    # AFTER its D pad, so x >= w is 0 for padded d too
                    # (bit parity)
                    val = jnp.where(xw >= w, jnp.zeros((), outbuf.dtype),
                                    val)
                    outbuf[slot, pl.ds(0, si), k] = val
                out_copy(g, slot).start()

                @pl.when(g + 2 < ngroups)
                def _():
                    in_copy(g + 2, slot).start()

                return 0

            jax.lax.fori_loop(0, ngroups, body, 0)
            out_copy(ngroups - 1, (ngroups - 1) % 2).wait()
            if ngroups > 1:
                out_copy(ngroups - 2, (ngroups - 2) % 2).wait()

    return kernel


def derive_right_wdh_pallas(vol_h: jnp.ndarray, d_real: int, w: int,
                            d_min: int, stride: int = 1, fill: float = 1.0,
                            hc: int = 128) -> jnp.ndarray:
    """(W, Dp, H)-layout twin of :func:`derive_right_pallas` (see
    :func:`_make_derive_wdh_kernel`). ``vol_h`` is the padded transposed
    volume the fused left path builds; ``d_real``/``w`` are the real
    (unpadded) disparity count and image width."""
    wp, dp, hp = vol_h.shape
    if hp % hc != 0:
        # non-128-granular H extents (small parity-test volumes): one
        # full-width band — lane offset 0 is trivially aligned
        hc = hp
    # in-buffer rows cover the full dynamic shift range: a leading
    # ``pad_lo`` for negative d_min plus the largest positive shift (tail
    # rows beyond the DMA extent are garbage, always where-masked). The W
    # segment shrinks until the double-buffered pipeline fits the VMEM
    # budget (deep D=288 volumes need ~2 segments).
    pad_lo = -min(d_min, 0)
    off_max = max(d_min + (dp - 1) * stride, 0)
    esize = 2 if vol_h.dtype == jnp.bfloat16 else 4
    seg = wp
    while seg > 64 and \
            (2 * (pad_lo + seg + off_max) + 2 * seg) * 8 * hc * esize > 8e6:
        seg = (seg + 1) // 2
        seg += (-seg) % 8
    rows_buf = pad_lo + seg + off_max
    return pl.pallas_call(
        _make_derive_wdh_kernel(dp, d_real, w, wp, d_min, stride, fill, hc,
                                seg),
        out_shape=jax.ShapeDtypeStruct((wp, dp, hp), vol_h.dtype),
        grid=(hp // hc,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, rows_buf, 8, hc), vol_h.dtype),
            pltpu.VMEM((2, seg, 8, hc), vol_h.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=_interpret(),
    )(vol_h)


# ---------------------------------------------------------------------------
# Fused right-view disparity: derive -> 2-path horizontal SGM -> argmin,
# without materializing the summed aggregate or paying a separate WTA pass
# ---------------------------------------------------------------------------


def _make_wta2_kernel(d_min: float, stride: float):
    """Sum two directional aggregates and argmin over D in one stream.

    Blocks are (chunk, Dp, band) slices of the (S, Dp, B) scan-layout
    volumes; the bf16 add matches the XLA ``lr + rl`` exactly (the
    ``* 0.5`` the two-path mean applies is an exponent shift — argmin
    invariant — so it is skipped). Tie-break: lowest disparity index,
    identical to ``jnp.argmin``.
    """

    def kernel(a_ref, b_ref, o_ref):
        s = (a_ref[...] + b_ref[...]).astype(jnp.float32)  # (chunk, Dp, band)
        m = jnp.min(s, axis=1)
        iota = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        idx = jnp.min(jnp.where(s == m[:, None, :], iota, 2 ** 30), axis=1)
        o_ref[...] = d_min + stride * idx.astype(jnp.float32)

    return kernel


@partial(jax.jit, static_argnames=("p1", "p2", "d_min", "stride", "fill",
                                   "band", "chunk", "use_wdh_derive"))
def right_disparity_fused_pallas(
    vol_dhw: jnp.ndarray,
    p1: float,
    p2: float,
    d_min: int,
    stride: int = 1,
    fill: float = 1.0,
    band: int = 128,
    chunk: int | None = None,
    use_wdh_derive: bool = False,
) -> jnp.ndarray:
    """Right-view integer disparity straight from the LEFT cost volume.

    Fuses the ``right_sgm="horizontal"`` chain (``matching.compute_disparity``):
    ``derive_right_volume`` -> 2-path horizontal SGM -> integer WTA. The
    separate chain pays: the volume add (read lr + read rl + write), the
    (S, D, B) -> (D, H, W) relayout of the sum, and a full-volume WTA read.
    Here the two directional aggregates feed a streaming sum+argmin kernel
    in their native scan layout, so those five full-volume passes collapse
    into one double-read emitting only the (H, W) disparity plane.

    Bit-parity with the unfused chain (same derive kernel, same direction
    kernels, bf16 add order preserved, argmin tie-break = lowest index).

    A (W, Dp, H)-layout derive that skips this chain's pad + relayout
    exists (:func:`derive_right_wdh_pallas`, ``use_wdh_derive=True``) and
    is bit-parity tested, but stays OFF by default: its fast
    (Python-unrolled) form multiplies Mosaic compile time enough to bust
    a cold-start bench deadline (observed: watchdog at 840 s before the
    headline), and its compile-cheap (fori_loop) form executes ~1.7x
    slower than this chain (dynamic-start vector loads). Cold-compile
    latency is part of the production contract here, so the default
    optimises for it.
    """
    if use_wdh_derive:
        d, h, w = vol_dhw.shape
        sub = 16 if vol_dhw.dtype == jnp.bfloat16 else 8
        dp = int(np.ceil(d / sub) * sub)
        if chunk is None:
            esize = 2 if vol_dhw.dtype == jnp.bfloat16 else 4
            chunk = 8
            while chunk < 64 and 4 * (2 * chunk) * dp * band * esize <= 12e6:
                chunk *= 2
        gran = int(np.lcm(band, chunk))
        hp = int(np.ceil(h / gran) * gran)
        wp = int(np.ceil(w / gran) * gran)
        vol = jnp.pad(vol_dhw, ((0, dp - d), (0, 0), (0, 0)),
                      constant_values=BIG)
        vol = jnp.pad(vol, ((0, 0), (0, hp - h), (0, wp - w)))
        vol_h = jnp.transpose(vol, (2, 0, 1))  # (W, D, H): scan cols
        volr = None
        volr_h = derive_right_wdh_pallas(vol_h, d, w, d_min, stride=stride,
                                         fill=fill)
    else:
        volr = derive_right_pallas(vol_dhw, d_min, fill=fill, stride=stride)
        d, h, w = volr.shape
        sub = 16 if volr.dtype == jnp.bfloat16 else 8
        dp = int(np.ceil(d / sub) * sub)
        if chunk is None:
            esize = 2 if volr.dtype == jnp.bfloat16 else 4
            chunk = 8
            while chunk < 64 and 4 * (2 * chunk) * dp * band * esize <= 12e6:
                chunk *= 2
        gran = int(np.lcm(band, chunk))
        hp = int(np.ceil(h / gran) * gran)
        wp = int(np.ceil(w / gran) * gran)
        vol = jnp.pad(volr, ((0, dp - d), (0, 0), (0, 0)),
                      constant_values=BIG)
        vol = jnp.pad(vol, ((0, 0), (0, hp - h), (0, wp - w)))
        volr_h = jnp.transpose(vol, (2, 0, 1))  # (W, D, H): scan cols
    lr = _dir_call_sub(volr_h, False, band, chunk, p1, p2)
    rl = _dir_call_sub(volr_h, True, band, chunk, p1, p2)

    # WTA stream blocking under the Pallas TPU block rule (trailing block
    # dims 8/128-divisible or equal to the array's): W-chunk of 8 keeps
    # the (wc, hb) OUT block legal; the H-block is the largest divisor of
    # Hp that is 128-aligned (or all of Hp) and fits the VMEM pipeline
    # budget — 2 input streams x 2 slots per block, the out block is tiny
    esize = 2 if vol_dhw.dtype == jnp.bfloat16 else 4
    wc = 8
    hb = hp
    for cand in (hp // k for k in range(1, hp // 128 + 1)):
        if hp % cand == 0 and cand % 128 == 0 \
                and 4 * wc * dp * cand * esize <= 12e6:
            hb = cand
            break
    disp = pl.pallas_call(
        _make_wta2_kernel(float(d_min), float(stride)),
        out_shape=jax.ShapeDtypeStruct((wp, hp), jnp.float32),
        grid=(wp // wc, hp // hb),
        in_specs=[
            pl.BlockSpec((wc, dp, hb), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wc, dp, hb), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((wc, hb), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(lr, rl)
    return disp[:w, :h].T


# ---------------------------------------------------------------------------
# Fused LEFT view: 4-path SGM -> (disp, best, margin) without materializing
# the combined aggregate
# ---------------------------------------------------------------------------


def _make_wta3_kernel(d_min: float, stride: float, subpixel: bool,
                      with_aggregate: bool = False):
    """Three-stream sum + full WTA (disp/best/margin/parabola) per block.

    Inputs are the two horizontal directional aggregates in their native
    (S=W, Dp, B=H) scan layout plus the pre-summed vertical aggregate
    relayouted to match; the bf16 grouping ``(vert + (lr + rl)) * 0.25``
    reproduces ``sgm_aggregate``'s combine exactly, and the reduction
    semantics (ties -> lowest d, boundary parabola gating, >1-px-away
    margin) match ``wta_fused_pallas`` / the XLA ``wta_disparity``.

    ``with_aggregate`` additionally writes the combined aggregate S back
    out (in the same (W, Dp, H) layout, input dtype) — the one extra
    volume pass that lets the right view become a diagonal argmin over S
    instead of its own derive + 2-path SGM + WTA chain (``right_sgm=
    "diagonal"``; OpenCV SGBM's disp2 does exactly this from its single
    aggregated cost, ``reference: cv2.StereoSGBM`` semantics).
    """

    def kernel(a_ref, b_ref, v_ref, disp_ref, best_ref, marg_ref,
               *maybe_s):
        wc = a_ref.shape[0]

        def one(x, _):
            hsum = a_ref[x] + b_ref[x]            # bf16 add, parity
            s = ((v_ref[x] + hsum) * 0.25).astype(jnp.float32)  # (Dp, B)
            if with_aggregate:
                maybe_s[0][x] = s.astype(maybe_s[0].dtype)
            m = jnp.min(s, axis=0)
            iota = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            idx = jnp.min(jnp.where(s == m[None, :], iota, 2 ** 30), axis=0)
            idxf = idx.astype(jnp.float32)
            if subpixel:
                n = s.shape[0]
                lanes = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
                up = jnp.where(lanes == 0, BIG, pltpu.roll(s, 1, axis=0))
                dn = jnp.where(lanes == n - 1, BIG,
                               pltpu.roll(s, n - 1, axis=0))
                sel = iota == idx[None, :]
                prevv = jnp.min(jnp.where(sel, up, BIG), axis=0)
                nextv = jnp.min(jnp.where(sel, dn, BIG), axis=0)
                denom = prevv + nextv - 2.0 * m
                ok = (prevv < 0.5 * BIG) & (nextv < 0.5 * BIG) & (denom > 1e-9)
                off = jnp.where(
                    ok, 0.5 * (prevv - nextv) / jnp.maximum(denom, 1e-9), 0.0)
                off = jnp.clip(off, -1.0, 1.0)
            else:
                off = 0.0
            disp_ref[x] = d_min + stride * (idxf + off)
            best_ref[x] = m
            away = jnp.abs(iota - idx[None, :]) > 1
            marg_ref[x] = jnp.min(jnp.where(away, s, BIG), axis=0) - m
            return 0

        jax.lax.fori_loop(0, wc, one, 0, unroll=True)

    return kernel


@partial(jax.jit, static_argnames=("p1", "p2", "d_min", "stride", "subpixel",
                                   "band", "chunk", "with_aggregate"))
def sgm4_wta_fused_pallas(
    vol_dhw: jnp.ndarray,
    p1: float,
    p2: float,
    d_min: int,
    stride: int = 1,
    subpixel: bool = True,
    band: int = 128,
    chunk: int | None = None,
    with_aggregate: bool = False,
):
    """(disp, best, margin) from a raw (D, H, W) cost volume: 4-path SGM
    plus WTA with the combine fused away.

    The separate chain (``sgm_aggregate`` + ``wta_disparity``) pays, after
    the four directional kernels: two directional adds, two full-volume
    relayouts back to (D, H, W), the 4-way mean, and the WTA's streaming
    read — ~7 extra full-volume passes. Here the vertical pair is summed
    and relayouted in ONE XLA op (2 reads + 1 transposed write) and a
    three-stream Pallas kernel performs the remaining combine + WTA in
    registers, emitting only the (H, W) planes.

    Bit-parity with the unfused chain: same direction kernels, bf16 add
    grouping ``(vert + horiz) * 0.25`` preserved, tie-break and margin
    semantics identical to ``wta_fused_pallas``.
    """
    d, h, w = vol_dhw.shape
    sub = 16 if vol_dhw.dtype == jnp.bfloat16 else 8
    dp = int(np.ceil(d / sub) * sub)
    if chunk is None:
        esize = 2 if vol_dhw.dtype == jnp.bfloat16 else 4
        chunk = 8
        while chunk < 64 and 4 * (2 * chunk) * dp * band * esize <= 12e6:
            chunk *= 2
    gran = int(np.lcm(band, chunk))
    hp = int(np.ceil(h / gran) * gran)
    wp = int(np.ceil(w / gran) * gran)
    vol = jnp.pad(vol_dhw, ((0, dp - d), (0, 0), (0, 0)), constant_values=BIG)
    vol = jnp.pad(vol, ((0, 0), (0, hp - h), (0, wp - w)))

    vol_h = jnp.transpose(vol, (2, 0, 1))      # (W, D, H): scan cols
    lr = _dir_call_sub(vol_h, False, band, chunk, p1, p2)
    rl = _dir_call_sub(vol_h, True, band, chunk, p1, p2)
    vol_v = jnp.swapaxes(vol, 0, 1)            # (H, D, W): scan rows
    tb = _dir_call_sub(vol_v, False, band, chunk, p1, p2)
    bt = _dir_call_sub(vol_v, True, band, chunk, p1, p2)
    vert = jnp.transpose(tb + bt, (2, 1, 0))   # one add + one relayout

    esize = 2 if vol_dhw.dtype == jnp.bfloat16 else 4
    wc = 8
    hb = hp
    # pipeline budget: 3 input streams (+1 S output stream when
    # with_aggregate) x 2 slots each
    nstreams = 8 if with_aggregate else 6
    for cand in (hp // k for k in range(1, hp // 128 + 1)):
        if hp % cand == 0 and cand % 128 == 0 \
                and nstreams * wc * dp * cand * esize <= 12e6:
            hb = cand
            break
    kernel = _make_wta3_kernel(float(d_min), float(stride), bool(subpixel),
                               with_aggregate=with_aggregate)
    spec = pl.BlockSpec((wc, dp, hb), lambda i, j: (i, 0, j),
                        memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((wc, hb), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((wp, hp), jnp.float32)] * 3
    out_specs = [ospec] * 3
    if with_aggregate:
        out_shape.append(jax.ShapeDtypeStruct((wp, dp, hp), vol_dhw.dtype))
        out_specs.append(spec)
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(wp // wc, hp // hb),
        in_specs=[spec, spec, spec],
        out_specs=out_specs,
        interpret=_interpret(),
    )(lr, rl, vert)
    disp, best, marg = outs[:3]
    if with_aggregate:
        # S stays in the (W, Dp, H) kernel layout and PADDED extents —
        # diag_right_wta_wdh consumes it as-is (crop there, not here:
        # a crop would materialize a second full volume)
        return disp[:w, :h].T, best[:w, :h].T, marg[:w, :h].T, outs[3]
    return disp[:w, :h].T, best[:w, :h].T, marg[:w, :h].T
