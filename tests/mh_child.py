"""Child process entry for the multi-host smoke test: one rank of a
2-process jax.distributed CPU run of run_multihost.

argv: pid nproc coordinator ref_path reads_path out_path overlap
"""

import sys


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    coord = sys.argv[3]
    ref, reads, out = sys.argv[4], sys.argv[5], sys.argv[6]
    overlap = bool(int(sys.argv[7]))
    import jax
    jax.config.update("jax_platforms", "cpu")
    from darwin_tpu.parallel.multihost import run_multihost
    run_multihost(ref, reads, overlap, out, coordinator_address=coord,
                  num_processes=nproc, process_id=pid)


if __name__ == "__main__":
    main()
