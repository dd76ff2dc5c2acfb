"""Pallas band-fill kernel (interpret mode) must match the lax path bit-for-bit.

The lax path is itself validated against a sequential oracle in
``tests/test_swg.py``; here we check the hand-scheduled TPU kernel
(:mod:`kaptive_tpu.ops.swg_pallas`) produces identical scores, counts,
coordinates — and identical packed traceback bits — on the CPU interpreter.
"""

import numpy as np
import pytest

from kaptive_tpu.core.pairwise import blosum62_matrix
from kaptive_tpu.ops.swg import banded_swg, pad_ragged_to_matrix
from kaptive_tpu.ops.swg_pallas import compress_matrix

AA = b"ARNDCQEGHILKMFPSTWYV"
NT = b"ACGT"


def _nt_matrix():
    m = np.full((256, 256), -4, dtype=np.int32)
    for b in NT:
        m[b, b] = 2
    return m


def test_compress_matrix_exact():
    for matrix in (blosum62_matrix().astype(np.int32), _nt_matrix()):
        out = compress_matrix(matrix)
        assert out is not None
        row_lut, col_lut, small = out
        a = np.arange(256)
        assert np.array_equal(matrix, small[np.ix_(row_lut[a], col_lut[a])])


def _random_batch(rng, alphabet, n_pairs, max_len, seeded):
    qs, ts, offs, kls = [], [], [], []
    for _ in range(n_pairs):
        n = int(rng.integers(3, max_len))
        q = bytes(alphabet[i] for i in rng.integers(0, len(alphabet), n))
        if rng.random() < 0.6:
            t = bytearray(q)
            for _ in range(int(rng.integers(0, max(1, n // 4)))):
                t[int(rng.integers(0, len(t)))] = alphabet[rng.integers(0, len(alphabet))]
            t = bytes(t)
        else:
            t = bytes(alphabet[i] for i in rng.integers(0, len(alphabet), int(rng.integers(3, max_len))))
        qs.append(q)
        ts.append(t)
        offs.append(int(rng.integers(-8, 8)) if seeded else 0)
        kls.append(20 if seeded else max(20, abs(len(q) - len(t)) // 2 + 1))
    return qs, ts, np.asarray(offs, np.int32), np.asarray(kls, np.int32)


def _pack(seqs, width):
    data = np.frombuffer(b"".join(seqs), np.uint8)
    lens = np.asarray([len(s) for s in seqs], np.int64)
    offsets = np.concatenate([[0], np.cumsum(lens)[:-1]])
    return pad_ragged_to_matrix(data, offsets, lens, width), lens.astype(np.int32)


@pytest.mark.parametrize("alphabet,matrix_fn,seeded", [
    (AA, lambda: blosum62_matrix().astype(np.int32), False),
    (AA, lambda: blosum62_matrix().astype(np.int32), True),
    (NT, _nt_matrix, False),
])
def test_pallas_matches_lax(alphabet, matrix_fn, seeded):
    rng = np.random.default_rng(hash((bytes(alphabet), seeded)) % 2**31)
    matrix = matrix_fn()
    qs, ts, offs, kls = _random_batch(rng, alphabet, n_pairs=8, max_len=100, seeded=seeded)

    rows_max, w_pad = 128, 128
    t_pad = w_pad + 2
    q_mat, q_lens = _pack(qs, rows_max)
    t_inner, t_lens = _pack(ts, 128)
    t_mat = np.zeros((8, 128 + 2 * t_pad), dtype=np.uint8)
    t_mat[:, t_pad : t_pad + 128] = t_inner

    kwargs = dict(gap_open=11, gap_extend=1, rows_max=rows_max, w_pad=w_pad, t_pad=t_pad)
    lax_res = banded_swg(q_mat, q_lens, t_mat, t_lens, offs, kls, matrix, impl="lax", **kwargs)
    pl_res = banded_swg(q_mat, q_lens, t_mat, t_lens, offs, kls, matrix, impl="pallas", **kwargs)

    for f in lax_res._fields:
        got = np.asarray(getattr(pl_res, f))
        want = np.asarray(getattr(lax_res, f))
        assert np.array_equal(got, want), f"{f}: {got} != {want}"
