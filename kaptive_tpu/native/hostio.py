r"""ctypes binding for the native host-IO library (``native/hostio.cpp``).

Compiles the shared object on first use (g++ -O3, cached beside the package or
in a temp dir); raises ImportError if no compiler is available so callers fall
back to the pure-Python paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from pathlib import Path

import numpy as np

_SRC = Path(__file__).resolve().parent.parent.parent / "native" / "hostio.cpp"


def _build() -> Path:
    candidates = [
        Path(__file__).resolve().parent / "_hostio.so",
        Path(tempfile.gettempdir()) / f"kaptive_tpu_hostio_{os.getuid()}.so",
    ]
    for so in candidates:
        if so.exists() and so.stat().st_mtime >= _SRC.stat().st_mtime:
            return so
    err: Exception | None = None
    for so in candidates:
        try:
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC", str(_SRC), "-o", str(so)],
                check=True,
                capture_output=True,
                timeout=120,
            )
            return so
        except Exception as e:  # no compiler / no write permission: try next
            err = e
    raise ImportError(f"Cannot build native hostio: {err}")


if not _SRC.exists():
    raise ImportError(f"native source missing: {_SRC}")

_lib = ctypes.CDLL(str(_build()))
_lib.fasta_scan.argtypes = [
    ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
]
_lib.fasta_parse.restype = ctypes.c_int
_lib.fasta_parse.argtypes = [
    ctypes.c_char_p, ctypes.c_size_t,
    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
]
_lib.encode_dna_2bit.argtypes = [ctypes.c_char_p, ctypes.c_size_t, ctypes.c_void_p]
_lib.seed_anchors.restype = ctypes.c_int64
_lib.seed_anchors.argtypes = [
    ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
    ctypes.c_void_p, ctypes.c_int64,
    ctypes.c_void_p, ctypes.c_int32,
    ctypes.c_void_p, ctypes.c_int32,
    ctypes.c_int32, ctypes.c_int64,
    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
]
_lib.build_contig_stream.restype = ctypes.c_int64
_lib.build_contig_stream.argtypes = [
    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
    ctypes.c_int64, ctypes.c_int64,
    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
]


def parse_fasta_bytes(data: bytes) -> list[tuple[str, bytes]]:
    r"""Parse FASTA bytes natively -> list of (name, sequence)."""
    if not data:
        return []
    n_records = ctypes.c_int64(0)
    total_seq = ctypes.c_int64(0)
    _lib.fasta_scan(data, len(data), ctypes.byref(n_records), ctypes.byref(total_seq))
    nr = n_records.value
    if nr == 0:
        return []
    seq_buf = np.empty(total_seq.value, dtype=np.uint8)
    name_cap = len(data)  # headers can't exceed the input size
    name_buf = np.empty(name_cap, dtype=np.uint8)
    seq_off = np.empty(nr, dtype=np.int64)
    seq_len = np.empty(nr, dtype=np.int64)
    name_off = np.empty(nr, dtype=np.int64)
    name_len = np.empty(nr, dtype=np.int64)
    rc = _lib.fasta_parse(
        data, len(data),
        seq_buf.ctypes.data_as(ctypes.c_void_p),
        name_buf.ctypes.data_as(ctypes.c_void_p),
        name_cap,
        seq_off.ctypes.data_as(ctypes.c_void_p),
        seq_len.ctypes.data_as(ctypes.c_void_p),
        name_off.ctypes.data_as(ctypes.c_void_p),
        name_len.ctypes.data_as(ctypes.c_void_p),
    )
    if rc != 0:
        raise ValueError("native FASTA parse failed")
    out = []
    name_bytes = name_buf.tobytes()
    seq_bytes = seq_buf.tobytes()
    for i in range(nr):
        name = name_bytes[name_off[i] : name_off[i] + name_len[i]].decode()
        seq = seq_bytes[seq_off[i] : seq_off[i] + seq_len[i]]
        out.append((name, seq))
    return out


def encode_dna(seqs: np.ndarray) -> np.ndarray:
    r"""Native byte -> 2-bit code encoding."""
    data = np.ascontiguousarray(seqs, dtype=np.uint8)
    out = np.empty(len(data), dtype=np.uint8)
    _lib.encode_dna_2bit(
        data.tobytes(), len(data), out.ctypes.data_as(ctypes.c_void_p)
    )
    return out


def build_contig_stream(
    seqs: np.ndarray, offsets: np.ndarray, lengths: np.ndarray,
    gap: int, alloc: int, exc_cap: int,
):
    r"""Fused encode + sentinel-concat + 2-bit pack + exception scan (one C pass).

    Returns ``(flat_codes[alloc], packed[(real+3)//4], exceptions, real_len,
    n_exc)`` with ``real_len = sum(lengths) + gap * (n_seqs - 1)``; ``n_exc``
    may exceed ``exc_cap`` (only the first ``exc_cap`` positions are
    recorded — callers fall back to the dense upload form then).
    """
    seq_c = np.ascontiguousarray(seqs, dtype=np.uint8)
    off_c = np.ascontiguousarray(offsets, dtype=np.int64)
    len_c = np.ascontiguousarray(lengths, dtype=np.int64)
    n = len(off_c)
    real = int(len_c.sum()) + gap * max(n - 1, 0)
    if alloc < real:
        raise ValueError(f"alloc ({alloc}) must cover the sentinel-gapped stream ({real})")
    flat = np.full(alloc, 4, dtype=np.uint8)
    packed = np.zeros((real + 3) // 4, dtype=np.uint8)
    exc = np.empty(max(exc_cap, 1), dtype=np.int32)
    n_exc = _lib.build_contig_stream(
        seq_c.ctypes.data_as(ctypes.c_void_p),
        off_c.ctypes.data_as(ctypes.c_void_p),
        len_c.ctypes.data_as(ctypes.c_void_p),
        n, gap,
        flat.ctypes.data_as(ctypes.c_void_p),
        packed.ctypes.data_as(ctypes.c_void_p),
        exc.ctypes.data_as(ctypes.c_void_p),
        exc_cap,
    )
    return flat, packed, exc[: min(n_exc, exc_cap)], real, int(n_exc)


def seed_anchors(
    codes: np.ndarray, k: int, w: int, table_hashes: np.ndarray,
    max_occ: int, cap_out: int = 1 << 17,
    bloom_words: np.ndarray | None = None, bloom_bits: int = 0,
    bucket_starts: np.ndarray | None = None, bucket_shift: int = 0,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, int, int]:
    r"""Native minimizer scan + sorted-table match over a contig code stream.

    Mirrors ``minimizer_scan_host`` + the anchor expansion of
    ``ops.mapper.find_anchors`` in one C pass.  Returns
    ``(table_rows, flat_positions, contig_strands, n_minimizers,
    n_candidates)`` — anchor rows in ascending flat-position order.  Grows the
    output buffers and retries if ``cap_out`` is exceeded (the C call returns
    the exact total either way).  ``bucket_starts``/``bucket_shift``
    optionally bound each table search to one hash-prefix bucket (the same
    index the device match uses).
    """
    codes_c = np.ascontiguousarray(codes, dtype=np.uint8)
    table_c = np.ascontiguousarray(table_hashes, dtype=np.uint32)
    bloom_c = (
        np.ascontiguousarray(bloom_words, dtype=np.uint32)
        if bloom_words is not None else None
    )
    bloom_p = bloom_c.ctypes.data_as(ctypes.c_void_p) if bloom_c is not None else None
    buckets_c = (
        np.ascontiguousarray(bucket_starts, dtype=np.int32)
        if bucket_starts is not None else None
    )
    buckets_p = (
        buckets_c.ctypes.data_as(ctypes.c_void_p) if buckets_c is not None else None
    )
    while True:
        ti = np.empty(cap_out, dtype=np.int32)
        cpos = np.empty(cap_out, dtype=np.int32)
        cstrand = np.empty(cap_out, dtype=np.uint8)
        counts = np.zeros(2, dtype=np.int64)
        n = _lib.seed_anchors(
            codes_c.ctypes.data_as(ctypes.c_void_p), len(codes_c),
            int(k), int(w),
            table_c.ctypes.data_as(ctypes.c_void_p), len(table_c),
            bloom_p, int(bloom_bits),
            buckets_p, int(bucket_shift),
            int(max_occ), cap_out,
            ti.ctypes.data_as(ctypes.c_void_p),
            cpos.ctypes.data_as(ctypes.c_void_p),
            cstrand.ctypes.data_as(ctypes.c_void_p),
            counts.ctypes.data_as(ctypes.c_void_p),
        )
        if n <= cap_out:
            return ti[:n], cpos[:n], cstrand[:n], int(counts[0]), int(counts[1])
        cap_out = int(n)
