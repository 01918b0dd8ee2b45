"""Builder for the COMPLETE reference binary (all of software/*.cpp),
compiled verbatim against the shim headers in native/refbin/ (a
single-threaded TBB flow-graph emulation, a kseq-compatible reader, and
the bond stubs shared with the kernel fuzz).  See
native/refbin/include/tbb/flow_graph.h for the serial scheduling model —
it makes the binary's output deterministic and read-ordered, matching
this project's output normalization.

The binary is built with AddressSanitizer: the reference crashes under
plain -O0/-O2 builds on this toolchain (latent memory bug — it also reads
uninitialized SIMD registers in its lazy-F loop, see oracle.py), and
ASan's allocator is the configuration where it runs to completion.  Leak
checking is disabled at run time (the reference frees almost nothing by
design).
"""

from __future__ import annotations

import os
import shutil
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_SW = "/root/reference/software"
BIN_PATH = os.path.join(REPO, "native", "build", "darwin_ref_asan")
_TUS = ["main", "ConfigFile", "Chameleon", "DRAM", "Index", "ntcoding",
        "seed_pos_table", "seeder", "filter", "extender", "printer",
        "sender", "Processor"]
_SHIM_DIRS = [os.path.join(REPO, "native", "refbin", "include"),
              os.path.join(REPO, "native", "refkernel", "include")]


def _host_has_avx2():
    try:
        with open("/proc/cpuinfo") as f:
            return "avx2" in f.read()
    except OSError:
        return False


def build() -> str | None:
    """Compile (if stale) the full reference binary; returns its path or
    None when the host can't build it."""
    if not (_host_has_avx2() and shutil.which("g++")
            and os.path.exists(os.path.join(REF_SW, "main.cpp"))):
        return None
    deps = [os.path.join(REF_SW, f"{t}.cpp") for t in _TUS]
    for d in _SHIM_DIRS:
        for root, _, files in os.walk(d):
            deps += [os.path.join(root, f) for f in files]
    if (os.path.exists(BIN_PATH)
            and all(os.path.getmtime(s) <= os.path.getmtime(BIN_PATH)
                    for s in deps)):
        return BIN_PATH
    objdir = os.path.join(REPO, "native", "build", "refbin_asan")
    os.makedirs(objdir, exist_ok=True)
    inc = []
    for d in _SHIM_DIRS:
        inc += ["-I", d]
    inc += ["-I", REF_SW]
    objs = []
    for t in _TUS:
        obj = os.path.join(objdir, f"{t}.o")
        cmd = ["g++", "-O1", "-g", "-fsanitize=address",
               "-ftrivial-auto-var-init=zero",
               "-mavx2", "-msse4.2", "-mbmi2", "-std=c++17", *inc,
               "-c", os.path.join(REF_SW, f"{t}.cpp"), "-o", obj]
        subprocess.run(cmd, check=True, capture_output=True)
        objs.append(obj)
    subprocess.run(["g++", "-fsanitize=address", *objs, "-lz",
                    "-o", BIN_PATH], check=True, capture_output=True)
    return BIN_PATH


def run(ref_path: str, reads_path: str, overlap: bool, cwd: str,
        timeout: int = 600) -> str:
    """Run the reference binary (params.cfg is read from cwd) and return
    its stdout."""
    env = dict(os.environ, ASAN_OPTIONS="detect_leaks=0")
    res = subprocess.run(
        [BIN_PATH, ref_path, reads_path, "1" if overlap else "0"],
        cwd=cwd, env=env, capture_output=True, timeout=timeout)
    if res.returncode != 0:
        raise RuntimeError(
            f"reference binary rc={res.returncode}\n"
            f"{res.stderr.decode(errors='replace')[-2000:]}")
    return res.stdout.decode()
