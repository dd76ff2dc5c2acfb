r"""Pallas TPU kernel for the banded Smith-Waterman-Gotoh band fill.

This is the hand-scheduled TPU version of :func:`kaptive_tpu.ops.swg.banded_swg`
(the JAX/XLA row-parallel formulation of the reference's per-cell Numba kernel
``_batched_banded_gotoh``, ``/root/reference/src/kaptive/core/pairwise.py:395-584``).
It reproduces the lax path bit-for-bit — same band geometry, masking, local
reset, tie rules and packed traceback bits — so scores, counts and coordinates
stay identical to the reference; only the schedule changes.

Kernel design (why this beats the XLA scan):

- **Grid = (pair blocks, row tiles).** ``PAIRS`` pairs ride the 8 VPU sublanes
  so every band vector is a full ``(8, 128k)`` tile; the row-tile axis streams
  the traceback output so VMEM stays bounded no matter how long the query is.
- **Band state lives in VMEM scratch** (``M``/``D`` bands, running best) and
  persists across the sequential row-tile grid — zero HBM traffic for carried
  state.
- **Statically unrolled row tiles.** Each grid step unrolls ``ROW_TILE`` DP
  rows as straight-line vector code, so every slice (the sliding target
  window, the per-row substitution profile, the traceback-row store) is a
  *static* slice — no dynamic lane addressing anywhere in the hot loop.
- **Compressed alphabet scoring.** The 256x256 byte substitution matrix is
  factored (exactly) into row/column class LUTs and a tiny class matrix on the
  host; the kernel rebuilds per-cell scores with ``n_col_classes`` masked adds
  (5 for DNA, ~25 for BLOSUM62) instead of a 256-wide gather.
- **Horizontal gaps via Hillis-Steele prefix max** (the same lazy-F max-plus
  scan as the lax path, ``log2(w)`` shifted maxima).

The full traceback (short, data-dependent walk) stays in the shared lax
``_traceback`` — it is a tiny fraction of the work and keeps the two paths'
outputs trivially comparable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF_I32 = -1_000_000_000
PAIRS = 8  # minimum pairs per block (one full 8-sublane vreg)
ROW_TILE = 64  # DP rows unrolled per grid step
MAX_T_CLASSES = 32  # masked-add budget for score reconstruction
MAX_Q_CLASSES = 64  # one-hot matmul budget for the query profile


def compress_matrix(matrix: np.ndarray):
    r"""Factor a (256, 256) byte matrix into (row LUT, col LUT, class matrix).

    Exact: ``matrix[a, b] == small[row_lut[a], col_lut[b]]`` for all bytes.
    Returns None when the matrix has too many distinct row/column classes for
    the kernel budget (caller falls back to the lax path).
    """
    if matrix.shape != (256, 256):
        return None
    rows_u, row_inv = np.unique(matrix, axis=0, return_inverse=True)
    cols_u, col_inv = np.unique(rows_u.T, axis=0, return_inverse=True)
    n_row, n_col = rows_u.shape[0], cols_u.shape[0]
    if n_row > MAX_Q_CLASSES or n_col > MAX_T_CLASSES:
        return None
    # First byte of each column class (reversed assignment -> first wins).
    first_b = np.zeros(n_col, dtype=np.int64)
    for b in reversed(range(256)):
        first_b[col_inv[b]] = b
    small = rows_u[:, first_b].astype(np.int32)  # (n_row, n_col)
    return (
        row_inv.astype(np.int32),
        col_inv.astype(np.int32),
        small,
    )


_COMPRESS_CACHE: dict = {}


def compress_matrix_cached(matrix: np.ndarray):
    # Key on the exact bytes (plus shape/dtype), never a hash of them: a hash
    # collision between two substitution matrices would silently corrupt every
    # alignment score.  The few-hundred-KB keys exist once per distinct matrix.
    arr = np.asarray(matrix, dtype=np.int32)
    key = (arr.shape, arr.tobytes())
    if key not in _COMPRESS_CACHE:
        _COMPRESS_CACHE[key] = compress_matrix(arr)
    return _COMPRESS_CACHE[key]


def _swg_fill_kernel(
    l1_ref,  # (P, 1) int32 query lengths
    l2_ref,  # (P, 1) int32 target lengths
    off_ref,  # (P, 1) int32 diagonal offsets
    kl_ref,  # (P, 1) int32 per-pair half band widths
    qm_ref,  # (P, ROW_TILE, n_col) int32 per-row substitution profiles
    tt_ref,  # (1, P, ROW_TILE + W) int32 aligned target window codes
    tb_ref,  # out (P, ROW_TILE, W) int8 packed traceback bits
    best_ref,  # out (P, 1) int32
    bi_ref,  # out (P, 1) int32
    bj_ref,  # out (P, 1) int32
    m_scr,  # (P, W) int32 M band carry
    d_scr,  # (P, W) int32 D band carry
    best_scr,  # (P, 1) int32
    bi_scr,  # (P, 1) int32
    bj_scr,  # (P, 1) int32
    tbrow_scr,  # (P, ROW_TILE, W) int32 row staging (whole-block int8 store at end)
    *,
    w_pad: int,
    row_tile: int,
    gap_open: int,
    gap_extend: int,
    n_col: int,
    pairs: int,
):
    r_blk = pl.program_id(1)
    k_pad = (w_pad - 3) // 2
    neg = jnp.int32(NEG_INF_I32)
    goe = jnp.int32(gap_open + gap_extend)
    ge = jnp.int32(gap_extend)
    dm = jax.lax.broadcasted_iota(jnp.int32, (pairs, w_pad), 1)

    l1 = l1_ref[...]
    l2 = l2_ref[...]
    off = off_ref[...]
    kl = kl_ref[...]
    cols = l2 + 1

    neg_band = jnp.full((pairs, w_pad), NEG_INF_I32, dtype=jnp.int32)

    def shift_left1(x):  # x[dm] <- x[dm+1], last lane -> NEG_INF
        return jnp.where(dm <= w_pad - 2, jnp.roll(x, -1, axis=1), neg)

    def shift_right(x, s):  # x[dm] <- x[dm-s], first s lanes -> NEG_INF
        return jnp.where(dm >= s, jnp.roll(x, s, axis=1), neg)

    @pl.when(r_blk == 0)
    def _init():
        # Row 0: padded-band border cells get M=0 (ref pairwise.py:465-479).
        j0 = 0 - off + dm - k_pad - 1
        in_pad0 = (jnp.abs(dm - (k_pad + 1)) <= kl + 1) & (j0 >= 0) & (j0 < cols)
        m_scr[...] = jnp.where(in_pad0, 0, neg)
        d_scr[...] = neg_band
        best_scr[...] = jnp.zeros((pairs, 1), jnp.int32)
        bi_scr[...] = jnp.zeros((pairs, 1), jnp.int32)
        bj_scr[...] = jnp.zeros((pairs, 1), jnp.int32)

    m_prev = m_scr[...]
    d_prev = d_scr[...]
    best = best_scr[...]
    bi = bi_scr[...]
    bj = bj_scr[...]
    tcat = tt_ref[0, :, :]  # (P, row_tile + w_pad)

    for rr in range(row_tile):
        i = r_blk * row_tile + (rr + 1)  # 1-based DP row
        active = i <= l1
        j = i - off + dm - k_pad - 1
        filled = active & (jnp.abs(dm - (k_pad + 1)) <= kl) & (j >= 1) & (j < cols)
        in_pad = active & (jnp.abs(dm - (k_pad + 1)) <= kl + 1) & (j >= 0) & (j < cols)

        # Vertical gap state D from previous row's dm+1 slots.
        m_up = shift_left1(m_prev)
        d_up = shift_left1(d_prev)
        d_open = m_up - goe
        d_ext = d_up - ge
        d_cur = jnp.maximum(d_open, d_ext)
        tb_d_ext = d_open < d_ext  # open wins ties (ref :498-506)

        # Substitution scores: masked adds over the compressed target alphabet.
        twin = tcat[:, rr : rr + w_pad]
        qm_row = qm_ref[:, rr, :]  # (P, n_col)
        sval = jnp.zeros((pairs, w_pad), jnp.int32)
        for c in range(n_col):
            sval = sval + jnp.where(twin == c, qm_row[:, c : c + 1], 0)
        diag = m_prev + sval

        h_ng = jnp.where(filled, jnp.maximum(diag, d_cur), neg)
        h_c = jnp.where(filled, jnp.maximum(h_ng, 0), jnp.where(in_pad, 0, neg))

        # Horizontal gaps: exclusive max-plus prefix scan (lazy-F), log2(w) steps.
        keyed = h_c + dm * ge
        run = keyed
        step = 1
        while step < w_pad:
            run = jnp.maximum(run, shift_right(run, step))
            step *= 2
        run_excl = shift_right(run, 1)
        i_cur = run_excl - jnp.int32(gap_open) - dm * ge
        i_cur = jnp.where(filled, i_cur, neg)

        m_cur = jnp.where(
            filled,
            jnp.maximum(jnp.maximum(h_c, i_cur), 0),
            jnp.where(in_pad, 0, neg),
        )

        # Traceback bits, reference comparison order (:519-531).
        best_v = diag
        tb_m = jnp.zeros((pairs, w_pad), jnp.int32)
        tb_m = jnp.where(d_cur > best_v, 1, tb_m)
        best_v = jnp.maximum(best_v, d_cur)
        tb_m = jnp.where(i_cur > best_v, 2, tb_m)
        best_v = jnp.maximum(best_v, i_cur)
        tb_m = jnp.where(best_v <= 0, 3, tb_m)
        tb_m = jnp.where(filled, tb_m, 3)

        m_left = shift_right(m_cur, 1)
        i_open = m_left - goe
        i_ext = shift_right(i_cur, 1) - ge
        tb_i_ext = i_open < i_ext

        packed = (
            tb_m
            | (tb_d_ext.astype(jnp.int32) << 2)
            | (tb_i_ext.astype(jnp.int32) << 3)
        )
        tbrow_scr[:, rr, :] = packed

        # Max tracking: strictly-greater update, first cell in scan order wins.
        masked_m = jnp.where(filled, m_cur, neg)
        row_best = jnp.max(masked_m, axis=1, keepdims=True)
        first_dm = jnp.min(
            jnp.where(filled & (masked_m == row_best), dm, w_pad), axis=1, keepdims=True
        )
        row_j = i - off + first_dm - k_pad - 1
        upd = row_best > best
        best = jnp.where(upd, row_best, best)
        bi = jnp.where(upd, i, bi)
        bj = jnp.where(upd, row_j, bj)

        m_prev, d_prev = m_cur, d_cur

    m_scr[...] = m_prev
    d_scr[...] = d_prev
    best_scr[...] = best
    bi_scr[...] = bi
    bj_scr[...] = bj

    tb_ref[...] = tbrow_scr[...].astype(jnp.int8)
    best_ref[...] = best
    bi_ref[...] = bi
    bj_ref[...] = bj


def pairs_for(b: int, w_pad: int) -> int:
    r"""Pairs per kernel block: as wide as VMEM allows, never below 8.

    Each vector op in the row loop touches a ``(pairs, w_pad)`` tile; at the
    minimum 8 pairs every op is a single vreg and Mosaic's per-op issue
    overhead (~50 cycles measured) dominates the fill.  Widening the block
    amortises that overhead linearly until the per-step working set — the
    int32 traceback staging + int8 output block + carried bands, ~5 bytes per
    (pair, ROW_TILE, w_pad) cell — presses on VMEM (~16 MB/core).
    """
    # Empirical VMEM model: Mosaic's scoped-stack allocation measured 23.3 MB
    # at pairs*w_pad = 8192 (64 pairs, w 128) — the unrolled row temporaries
    # dominate and scale with the (pairs, w_pad) tile.  4096 units keeps the
    # stack near 12 MB of the 16 MB/core budget.
    pairs = 64
    while pairs > 8 and (pairs * w_pad > 4096 or b % pairs):
        pairs //= 2
    return pairs


@functools.partial(
    jax.jit,
    static_argnames=(
        "gap_open",
        "gap_extend",
        "rows_max",
        "w_pad",
        "t_pad",
        "n_row",
        "n_col",
        "interpret",
    ),
)
def _swg_pallas_fill(
    q_codes,  # (B, rows_max) uint8 query byte codes
    t_codes,  # (B, T) uint8 padded target byte codes
    q_lens,  # (B,) int32
    t_lens,  # (B,) int32
    offsets,  # (B,) int32
    k_locals,  # (B,) int32
    row_lut,  # (256,) int32
    col_lut,  # (256,) int32
    small,  # (n_row, n_col) int32
    *,
    gap_open: int,
    gap_extend: int,
    rows_max: int,
    w_pad: int,
    t_pad: int,
    n_row: int,
    n_col: int,
    interpret: bool,
):
    assert t_pad == w_pad + 2, "banded SWG requires t_pad == w_pad + 2"
    del t_pad  # band geometry derives the window base itself (pad = w_pad + 2)
    B = q_codes.shape[0]
    T = t_codes.shape[1]
    k_pad = (w_pad - 3) // 2
    nr = rows_max // ROW_TILE

    q32 = q_codes.astype(jnp.int32)
    t32 = t_codes.astype(jnp.int32)
    q_small = jnp.take(row_lut, q32)  # (B, rows_max)
    t_small = jnp.take(col_lut, t32)  # (B, T)

    # Per-row substitution profile via one-hot matmul (MXU; exact for ints).
    q1h = (q_small[..., None] == jnp.arange(n_row, dtype=jnp.int32)).astype(jnp.float32)
    qm = jnp.einsum(
        "bri,ic->brc", q1h, small.astype(jnp.float32), preferred_element_type=jnp.float32
    ).astype(jnp.int32)  # (B, rows_max, n_col)

    # Diagonal-aligned target stream: element (i, dm) of the band reads
    # t_padded[(i-1) + dm + base] with base = w_pad + 1 - k_pad - offset
    # (the lax path's dynamic_slice start, clamped; clamp distortion only
    # lands on masked lanes — see swg.py _fill_band).
    base = jnp.int32(w_pad + 1 - k_pad) - offsets  # (B,)
    x = jnp.arange(rows_max + w_pad, dtype=jnp.int32)
    idx = jnp.clip(x[None, :] + base[:, None], 0, T - 1)
    t_al = jnp.take_along_axis(t_small, idx, axis=1)  # (B, rows_max + w_pad)
    t_tiles = jnp.stack(
        [
            jax.lax.slice_in_dim(t_al, r * ROW_TILE, r * ROW_TILE + ROW_TILE + w_pad, axis=1)
            for r in range(nr)
        ],
        axis=0,
    )  # (nr, B, ROW_TILE + w_pad) — row-tile leads so the block's trailing
    # two dims (PAIRS, ROW_TILE + w_pad) satisfy Mosaic's (8, full) tiling rule

    pairs = pairs_for(B, w_pad)
    kernel = functools.partial(
        _swg_fill_kernel,
        w_pad=w_pad,
        row_tile=ROW_TILE,
        gap_open=gap_open,
        gap_extend=gap_extend,
        n_col=n_col,
        pairs=pairs,
    )
    grid = (B // pairs, nr)
    tb, best, bi, bj = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((pairs, 1), lambda b, r: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((pairs, 1), lambda b, r: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((pairs, 1), lambda b, r: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((pairs, 1), lambda b, r: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (pairs, ROW_TILE, n_col), lambda b, r: (b, r, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, pairs, ROW_TILE + w_pad), lambda b, r: (r, b, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (pairs, ROW_TILE, w_pad), lambda b, r: (b, r, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((pairs, 1), lambda b, r: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((pairs, 1), lambda b, r: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((pairs, 1), lambda b, r: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, rows_max, w_pad), jnp.int8),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((pairs, w_pad), jnp.int32),
            pltpu.VMEM((pairs, w_pad), jnp.int32),
            pltpu.VMEM((pairs, 1), jnp.int32),
            pltpu.VMEM((pairs, 1), jnp.int32),
            pltpu.VMEM((pairs, 1), jnp.int32),
            pltpu.VMEM((pairs, ROW_TILE, w_pad), jnp.int32),
        ],
        interpret=interpret,
    )(
        q_lens[:, None].astype(jnp.int32),
        t_lens[:, None].astype(jnp.int32),
        offsets[:, None].astype(jnp.int32),
        k_locals[:, None].astype(jnp.int32),
        qm,
        t_tiles,
    )
    return tb, best[:, 0], bi[:, 0], bj[:, 0], q32, t32


@functools.partial(
    jax.jit,
    static_argnames=(
        "gap_open",
        "gap_extend",
        "rows_max",
        "w_pad",
        "t_pad",
        "n_row",
        "n_col",
        "interpret",
    ),
)
def banded_swg_pallas(
    q_codes,
    q_lens,
    t_codes,
    t_lens,
    offsets,
    k_locals,
    row_lut,
    col_lut,
    small,
    *,
    gap_open: int,
    gap_extend: int,
    rows_max: int,
    w_pad: int,
    t_pad: int,
    n_row: int,
    n_col: int,
    interpret: bool = False,
):
    r"""Pallas band fill + shared lax traceback; same result as the lax path."""
    from kaptive_tpu.ops.swg import SwgResult, _traceback

    tb, best, bi, bj, q32, t32 = _swg_pallas_fill(
        q_codes,
        t_codes,
        q_lens,
        t_lens,
        offsets,
        k_locals,
        row_lut,
        col_lut,
        small,
        gap_open=gap_open,
        gap_extend=gap_extend,
        rows_max=rows_max,
        w_pad=w_pad,
        t_pad=t_pad,
        n_row=n_row,
        n_col=n_col,
        interpret=interpret,
    )

    def one(tb_p, q_p, t_p, b, i, j, off):
        matches, mism, gaps, si, sj = _traceback(
            tb_p, q_p, t_p, b, i, j, off, w_pad, rows_max, t_pad
        )
        return SwgResult(b, matches, mism, gaps, si, i, sj, j)

    return jax.vmap(one)(tb, q32, t32, best, bi, bj, offsets.astype(jnp.int32))


# VMEM ceiling for the kernel's per-step working set: the int8 traceback block
# plus scratch scale as PAIRS * ROW_TILE * w_pad; beyond ~2048 band lanes the
# block approaches Mosaic's VMEM budget and the lax path is safer.
MAX_W_PAD = 2048


def pallas_compatible(b: int, rows_max: int, w_pad: int, compressed) -> bool:
    r"""True when the bucket shape and matrix fit the Pallas kernel contract
    (tile alignment and the VMEM bound on the band width)."""
    if compressed is None:
        return False
    return (
        b % PAIRS == 0
        and rows_max % ROW_TILE == 0
        and w_pad % 128 == 0
        and 128 <= w_pad <= MAX_W_PAD
    )
