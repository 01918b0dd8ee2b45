"""ctypes loader for the *reference* alignment kernels, compiled verbatim
from /root/reference/software/Processor.cpp with hand-written stand-ins for
the generated bond headers (native/refkernel/).  This is the ground-truth
side of the bit-identity fuzz in test_ref_parity.py.

Build is on demand and cached in native/build/libdarwin_ref.so; callers
should skip when build() returns None (no g++ / no AVX2 host).
"""

from __future__ import annotations

import ctypes
import os
import shutil
import subprocess

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_SW = "/root/reference/software"
SO_PATH = os.path.join(REPO, "native", "build", "libdarwin_ref.so")
_SOURCES = [
    os.path.join(REF_SW, "Processor.cpp"),
    os.path.join(REPO, "native", "refkernel", "ref_wrap.cpp"),
    os.path.join(REPO, "native", "refkernel", "include",
                 "Darwin_reflection.h"),
]


def _host_has_avx2():
    try:
        with open("/proc/cpuinfo") as f:
            return "avx2" in f.read()
    except OSError:
        return False


def build():
    """Compile (if stale) and load the reference kernel .so.

    Returns a ctypes CDLL or None when the host can't build/run it.
    """
    if not (_host_has_avx2() and shutil.which("g++")
            and os.path.exists(_SOURCES[0])):
        return None
    stale = (not os.path.exists(SO_PATH)
             or any(os.path.getmtime(s) > os.path.getmtime(SO_PATH)
                    for s in _SOURCES))
    if stale:
        os.makedirs(os.path.dirname(SO_PATH), exist_ok=True)
        cmd = [
            # -ftrivial-auto-var-init=zero pins down the reference kernel's
            # uninitialized vF_La/vF_La_ext (Processor.cpp lazy-F loop; the
            # short-gap twins are seeded at :385-386, the long-gap ones
            # never) so the ground truth is deterministic — see the UB note
            # in darwin_tpu/ops/oracle.py::striped_align.  -O0 because GCC
            # still elides some of the zero-stores at -O1/-O2 (measured:
            # trace matrices differ between -O0/-O1/-O2 zero-init builds;
            # only -O0 matches the defined zero-init semantics).
            "g++", "-O0", "-g", "-ftrivial-auto-var-init=zero",
            "-mavx2", "-msse4.2", "-mbmi2", "-fPIC", "-shared",
            "-I", os.path.join(REPO, "native", "refkernel", "include"),
            "-I", REF_SW,
            _SOURCES[0], _SOURCES[1],
            "-o", SO_PATH,
        ]
        subprocess.run(cmd, check=True, capture_output=True)
    lib = ctypes.CDLL(SO_PATH)
    lib.ref_set_scoring.argtypes = [ctypes.POINTER(ctypes.c_int32)]
    lib.ref_set_scoring.restype = None
    lib.ref_batch.restype = None
    return lib


# align_fields bits (Darwin.bond:97)
AF_START_END = 1
AF_COMP_QUERY = 2
AF_REV_QUERY = 4
AF_COMP_REF = 8
AF_REV_REF = 16
AF_TRACEBACK = 32  # unused by the software kernel (do_traceback is batchwide)

_NT = {ord('A'): 0, ord('a'): 0, ord('C'): 1, ord('c'): 1,
       ord('G'): 2, ord('g'): 2, ord('T'): 3, ord('t'): 3}
_COMP = np.array([3, 2, 1, 0, 4], np.int32)


def sub_matrix(p15):
    """5x5 substitution matrix from the 11 scoring params, identical to
    InitializeScoringParams' sub_mat fill (Processor.cpp:48-80)."""
    (AA, AC, AG, AT, CC, CG, CT, GG, GT, TT, N) = p15[:11]
    return np.array([
        [AA, AC, AG, AT, N],
        [AC, CC, CG, CT, N],
        [AG, CG, GG, GT, N],
        [AT, CT, GT, TT, N],
        [N, N, N, N, N],
    ], np.int32)


def window_codes(dram: bytes, addr: int, size: int, reverse: bool,
                 complement: bool) -> np.ndarray:
    """5-letter codes for a dram window exactly as the kernel reads it:
    Nt2Int(dram[addr + j] , complement) with the index order reversed when
    the reverse flag is set (CreateVProfile / ref access,
    Processor.cpp:105-107, 276-277)."""
    codes = np.array([_NT.get(b, 4) for b in dram[addr:addr + size]],
                     np.int32)
    if complement:
        codes = _COMP[codes]
    if reverse:
        codes = codes[::-1].copy()
    return codes


def set_scoring(lib, p15):
    arr = (ctypes.c_int32 * 15)(*[int(x) for x in p15])
    lib.ref_set_scoring(arr)


def decode_tb(words: np.ndarray, n: int):
    """Unpack n 2-bit traceback pointers (LSB-first, 32/word,
    AddToTracebackPointers, Processor.cpp:568-582)."""
    ops = []
    for t in range(n):
        w = int(words[t // 32])
        ops.append((w >> (2 * (t % 32))) & 3)
    return ops


def batch(lib, dram: bytes, requests, do_traceback: bool, simd: bool = True):
    """Run one BatchAlignment(SIMD) call.

    requests: list of dicts with keys align_fields, ref_addr, query_addr,
    ref_size, query_size, max_tb_steps.  Returns list of result dicts with
    decoded ops.
    """
    n = len(requests)
    af = np.array([r["align_fields"] for r in requests], np.uint8)
    ra = np.array([r["ref_addr"] for r in requests], np.uint64)
    qa = np.array([r["query_addr"] for r in requests], np.uint64)
    rs = np.array([r["ref_size"] for r in requests], np.uint16)
    qs = np.array([r["query_size"] for r in requests], np.uint16)
    mt = np.array([r["max_tb_steps"] for r in requests], np.uint16)
    tb_cap = int((2 * mt.max() + 31) // 32 + 2)
    score = np.zeros(n, np.int32)
    roff = np.zeros(n, np.int32)
    qoff = np.zeros(n, np.int32)
    rmax = np.zeros(n, np.int32)
    qmax = np.zeros(n, np.int32)
    ntb = np.zeros(n, np.int32)
    tb = np.zeros((n, tb_cap), np.uint64)
    c = ctypes.c_void_p
    p = lambda a: a.ctypes.data_as(c)  # noqa: E731
    buf = ctypes.create_string_buffer(dram, len(dram))
    lib.ref_batch(
        ctypes.c_int(1 if simd else 0), ctypes.c_int(1 if do_traceback else 0),
        buf, ctypes.c_int(n), p(af), p(ra), p(qa), p(rs), p(qs), p(mt),
        p(score), p(roff), p(qoff), p(rmax), p(qmax), p(ntb), p(tb),
        ctypes.c_int(tb_cap))
    out = []
    for r in range(n):
        out.append({
            "score": int(score[r]),
            "ref_offset": int(roff[r]),
            "query_offset": int(qoff[r]),
            "ref_max_pos": int(rmax[r]),
            "query_max_pos": int(qmax[r]),
            "n_ops": int(ntb[r]),
            "ops": decode_tb(tb[r], int(ntb[r])) if do_traceback else [],
        })
    return out
