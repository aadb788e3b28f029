"""ctypes bindings for the native host runtime (bsmap_native.cpp).

The shared library is compiled on demand with g++ (the toolchain the
reference itself requires, makefile:1-30) and cached next to the source,
keyed by source mtime.  When no compiler is available every entry point
returns None and callers fall back to the pure-Python paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "bsmap_native.cpp")
_SO = os.path.join(_DIR, "_bsmap_native.so")
_LOCK = threading.Lock()
_LIB: ctypes.CDLL | None = None
_TRIED = False

_i64 = ctypes.c_int64
_i32 = ctypes.c_int32
_u8 = ctypes.c_uint8
_p_u8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
_p_i64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_p_i32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           "-o", _SO + ".tmp", _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except (OSError, subprocess.CalledProcessError):
        return False
    os.replace(_SO + ".tmp", _SO)
    return True


def get_lib() -> ctypes.CDLL | None:
    """Compile (if stale) and load the native library; None on failure."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        try:
            fresh = (os.path.exists(_SO)
                     and os.path.getmtime(_SO) >= os.path.getmtime(_SRC))
            if not fresh and not _build():
                return None
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.bsmap_parse_reads.restype = _i64
        lib.bsmap_parse_reads.argtypes = [
            ctypes.c_char_p, _i64, _i32, _i32, _i64, _i64, _p_i64,
            ctypes.POINTER(_i64)]
        lib.bsmap_encode_block.restype = None
        lib.bsmap_encode_block.argtypes = [
            ctypes.c_char_p, _p_i64, _i64, _p_u8, _p_u8, _i64,
            _p_u8, _p_u8, _p_i32, _p_i32]
        lib.bsmap_encode_block_words.restype = None
        lib.bsmap_encode_block_words.argtypes = [
            ctypes.c_char_p, _p_i64, _i64, _p_u8, _p_u8, _i64, _p_i32]
        lib.bsmap_index_pass.restype = None
        lib.bsmap_index_pass.argtypes = [
            np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS"),
            _p_i64, _p_i64, _p_i64, _i64, _i64, _i64, _i32,
            np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS"),
            _p_i64, _p_i64,
            np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")]
        lib.bsmap_format_sam_block.restype = _i64
        lib.bsmap_format_sam_block.argtypes = [
            ctypes.c_char_p, _p_i64, _i64, _p_i32, _p_i32,
            _p_u8, _p_i64, _p_u8, _i32, _i32, _i32, _u8, _p_u8, _i64,
            _p_i64, ctypes.POINTER(_i64)]
        _p_u32 = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
        lib.bsmap_format_sam_block_xr.restype = _i64
        lib.bsmap_format_sam_block_xr.argtypes = [
            ctypes.c_char_p, _p_i64, _i64, _p_i32, _p_i32,
            _p_u8, _p_i64, _p_u8, _i32, _i32, _i32, _u8,
            _i32, _p_u32, _i64, _p_i64, ctypes.c_char_p, _p_u8,
            _p_u8, _i64, _p_i64, ctypes.POINTER(_i64)]
        lib.bsmap_format_bsp_block.restype = _i64
        lib.bsmap_format_bsp_block.argtypes = [
            ctypes.c_char_p, _p_i64, _i64, _p_i32, _p_i32, _i64, _i64,
            _p_u8, _p_i64, _p_u8, _i32, _i32, _i32, _i32, _u8,
            _p_u32, _i64, _p_i64, ctypes.c_char_p, _p_u8,
            _p_u8, _i64, _p_i64, ctypes.POINTER(_i64)]
        _LIB = lib
        return _LIB


def parse_reads(lib, buf: bytes, is_final: bool, is_fasta: bool,
                max_readlen: int, cap: int):
    """Parse up to cap reads out of buf; returns (rec[n,6], consumed)."""
    rec = np.empty((cap, 6), dtype=np.int64)
    consumed = _i64(0)
    n = lib.bsmap_parse_reads(buf, len(buf), int(is_final), int(is_fasta),
                              max_readlen, cap, rec.reshape(-1),
                              ctypes.byref(consumed))
    return rec[:n], int(consumed.value)


def encode_block(lib, buf: bytes, rec: np.ndarray, alphabet: np.ndarray,
                 reg_alphabet: np.ndarray, fixsize: int):
    """(codes, regs, lens, n_counts) for a parsed block."""
    n = len(rec)
    codes = np.zeros((n, fixsize), dtype=np.uint8)
    regs = np.zeros((n, fixsize), dtype=np.uint8)
    lens = np.zeros(n, dtype=np.int32)
    ncnt = np.zeros(n, dtype=np.int32)
    lib.bsmap_encode_block(buf, np.ascontiguousarray(rec).reshape(-1), n,
                           np.ascontiguousarray(alphabet),
                           np.ascontiguousarray(reg_alphabet), fixsize,
                           codes.reshape(-1), regs.reshape(-1), lens, ncnt)
    return codes, regs, lens, ncnt


def encode_block_words(lib, buf: bytes, rec: np.ndarray, alphabet: np.ndarray,
                       reg_alphabet: np.ndarray, nwords: int):
    """Device dispatch rows (n, 2*nwords+4) int32 for a parsed block:
    [qwords | rwords | len | 0 | 0 | ncnt]; see bsmap_encode_block_words."""
    n = len(rec)
    rows = np.zeros((n, 2 * nwords + 4), dtype=np.int32)
    lib.bsmap_encode_block_words(buf, np.ascontiguousarray(rec).reshape(-1),
                                 n, np.ascontiguousarray(alphabet),
                                 np.ascontiguousarray(reg_alphabet), nwords,
                                 rows.reshape(-1))
    return rows


def format_sam_block_xr(lib, buf: bytes, rec: np.ndarray, status: np.ndarray,
                        rows: np.ndarray, chrnames: np.ndarray,
                        chrname_off: np.ndarray, revc: np.ndarray,
                        flag_base: int, out_unmap: bool, rrhits: int,
                        synth_qual: int, refcat: np.ndarray,
                        total_codes: int, anchors: np.ndarray,
                        useful_nt: bytes, mapseq: np.ndarray):
    """SAM block with XR:Z: context tags (-R); mapseq is the caller-held
    persistent 256-byte context buffer (stale-slot quirk)."""
    n = len(rec)
    rows = np.ascontiguousarray(rows, dtype=np.int32)
    cap = int(rec[:, 1].sum() + 3 * rec[:, 3].sum() + rec[:, 5].sum()
              + 128 * n + 4096)
    line_off = np.zeros(n + 1, dtype=np.int64)
    na = _i64(0)
    while True:
        out = np.empty(cap, dtype=np.uint8)
        w = lib.bsmap_format_sam_block_xr(
            buf, np.ascontiguousarray(rec).reshape(-1), n,
            np.ascontiguousarray(status, dtype=np.int32),
            rows.reshape(-1), chrnames, chrname_off, revc, flag_base,
            int(out_unmap), rrhits, synth_qual, 1,
            np.ascontiguousarray(refcat, dtype=np.uint32), total_codes,
            np.ascontiguousarray(anchors, dtype=np.int64), useful_nt,
            mapseq, out, cap, line_off, ctypes.byref(na))
        if w >= 0:
            return out[:w].data, line_off, int(na.value)
        cap *= 2


def format_bsp_block(lib, buf: bytes, rec: np.ndarray, status: np.ndarray,
                     rows: np.ndarray, maxseg: int, chrnames: np.ndarray,
                     chrname_off: np.ndarray, revc: np.ndarray,
                     out_unmap: bool, rrhits: int, max_snp_num: int,
                     max_num_hits: int, synth_qual: int, refcat: np.ndarray,
                     total_codes: int, anchors: np.ndarray,
                     useful_nt: bytes, mapseq: np.ndarray):
    """BSP block (align.cpp:723-760); rows are FULL kernel result rows
    including synthesized rows for replayed reads."""
    n = len(rec)
    rows = np.ascontiguousarray(rows, dtype=np.int32)
    cap = int(rec[:, 1].sum() + 3 * rec[:, 3].sum() + rec[:, 5].sum()
              + 256 * n + 4096)
    line_off = np.zeros(n + 1, dtype=np.int64)
    na = _i64(0)
    while True:
        out = np.empty(cap, dtype=np.uint8)
        w = lib.bsmap_format_bsp_block(
            buf, np.ascontiguousarray(rec).reshape(-1), n,
            np.ascontiguousarray(status, dtype=np.int32),
            rows.reshape(-1), rows.shape[1], maxseg,
            chrnames, chrname_off, revc, int(out_unmap), rrhits,
            max_snp_num, max_num_hits, synth_qual,
            np.ascontiguousarray(refcat, dtype=np.uint32), total_codes,
            np.ascontiguousarray(anchors, dtype=np.int64), useful_nt,
            mapseq, out, cap, line_off, ctypes.byref(na))
        if w >= 0:
            return out[:w].data, line_off, int(na.value)
        cap *= 2


def format_sam_block(lib, buf: bytes, rec: np.ndarray, status: np.ndarray,
                     rows: np.ndarray, chrnames: np.ndarray,
                     chrname_off: np.ndarray, revc: np.ndarray,
                     flag_base: int, out_unmap: bool, rrhits: int,
                     synth_qual: int):
    """Returns (bytes, line_off[n+1], n_aligned); rows are (n, 2) lean."""
    n = len(rec)
    rows = np.ascontiguousarray(rows, dtype=np.int32)
    cap = int(rec[:, 1].sum() + 2 * rec[:, 3].sum() + rec[:, 5].sum()
              + 96 * n + 4096)
    line_off = np.zeros(n + 1, dtype=np.int64)
    na = _i64(0)
    while True:
        out = np.empty(cap, dtype=np.uint8)
        w = lib.bsmap_format_sam_block(
            buf, np.ascontiguousarray(rec).reshape(-1), n,
            np.ascontiguousarray(status, dtype=np.int32),
            rows.reshape(-1), chrnames, chrname_off,
            revc, flag_base, int(out_unmap), rrhits, synth_qual,
            out, cap, line_off, ctypes.byref(na))
        if w >= 0:
            # zero-copy view: callers write it or b"".join it directly
            return out[:w].data, line_off, int(na.value)
        cap *= 2
