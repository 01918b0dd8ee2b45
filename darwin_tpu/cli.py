"""CLI matching the reference binary's interface
(software/main.cpp:168-171):

    python -m darwin_tpu.cli <REFERENCE>.fasta <READS>.fasta <OVERLAP 0|1>

Reads ``params.cfg`` from the current directory when present (same INI
schema as the reference); results on stdout, progress/counters on stderr.
"""

from __future__ import annotations

import os
import sys

from darwin_tpu.config import Config, load_config
from darwin_tpu.pipeline.align import run


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 3:
        print("Usage: python -m darwin_tpu.cli <REFERENCE>.fasta "
              "<READS>.fasta OVERLAP(0/1)", file=sys.stderr)
        return 1
    ref_path, reads_path, overlap = argv[0], argv[1], bool(int(argv[2]))
    if os.path.exists("params.cfg"):
        print("Reading configuration ...", file=sys.stderr)
        cfg = load_config("params.cfg", do_overlap=overlap)
    else:
        cfg = Config()
        cfg.do_overlap = overlap
    run(ref_path, reads_path, overlap, cfg=cfg)
    return 0


if __name__ == "__main__":
    sys.exit(main())
