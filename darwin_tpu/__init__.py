"""darwin_tpu — a TPU-native long-read aligner.

A from-scratch JAX/XLA/Pallas implementation of the full D-SOFT -> GACT
alignment pipeline pioneered by Darwin (ASPLOS'18; reference C++/AVX2
implementation surveyed in SURVEY.md).  The compute path (minimizer
extraction, seed-table build, D-SOFT bin-count seeding, batched GACT tile
dynamic programming and traceback) runs as batched, statically-shaped XLA
programs on TPU; the orchestration (extension state machine, output
assembly) runs on the host over *large* device batches.

Layout:
  config    — params.cfg-compatible configuration
  genome    — sequence store + chromosome registry (replaces DRAM/Index)
  io        — FASTA reading, SAM/MHAP output
  index     — minimizer extraction + seed position table (device build)
  seeding   — D-SOFT seeding / anchor selection / chaining
  ops       — GACT tile DP kernels (lax + Pallas) + traceback + oracles
  pipeline  — filter / extender / printer stages and the end-to-end driver
  parallel  — device-mesh sharding of the batched kernels
"""

__version__ = "0.1.0"

from darwin_tpu.config import Config, load_config  # noqa: F401
