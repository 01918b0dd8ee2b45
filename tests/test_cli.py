"""CLI + config-file + index-cache coverage: load_config must parse the
reference's params.cfg INI schema (ConfigFile.cpp:19-70, consumed at
main.cpp:183-230), and the --index-cache flag must save, reload, and
rebuild-on-staleness."""

import io
import os

import numpy as np
import pytest

from darwin_tpu.config import Config, load_config

REF = "/root/reference/software/data/sample_ref.fa"


def test_load_config_parses_reference_schema(tmp_path):
    p = tmp_path / "params.cfg"
    p.write_text("""
# comment line
[GACT_scoring]
sub_AA = 3
gap_open = -5
gap_extend = -3

[DSOFT_params]
seed_size = 12
bin_size = 32
threshold = 20   ; trailing comment? no - the reference keeps the line

[GACT_first_tile]
first_tile_score_threshold = 50

[GACT_extend]
tile_size = 256
tile_overlap = 32
""".replace("threshold = 20   ; trailing comment? no - the reference keeps"
            " the line", "threshold = 20"))
    cfg = load_config(str(p))
    assert cfg.gact_sub_mat[0] == 3
    assert cfg.gap_open == -5 and cfg.gap_extend == -3
    assert cfg.seed_size == 12 and cfg.bin_size == 32
    assert cfg.dsoft_threshold == 20
    assert cfg.first_tile_score_threshold == 50
    assert cfg.tile_size == 256 and cfg.tile_overlap == 32
    # untouched keys keep the reference defaults
    assert cfg.long_gap_open == -25 and cfg.minimizer_window == 3


def test_reference_bundled_params_cfg_roundtrip():
    """The reference's own bundled params.cfg must parse to our defaults."""
    cfg = load_config("/root/reference/software/params.cfg")
    d = Config()
    for field in ("gact_sub_mat", "gap_open", "gap_extend", "long_gap_open",
                  "long_gap_extend", "seed_size", "minimizer_window",
                  "bin_size", "dsoft_threshold", "num_seeds", "max_stride",
                  "first_tile_size", "first_tile_score_threshold",
                  "slope_threshold", "min_overlap", "tile_size",
                  "tile_overlap"):
        assert getattr(cfg, field) == getattr(d, field), field


@pytest.mark.slow
def test_cli_index_cache(tmp_path, capsys, monkeypatch):
    from darwin_tpu import cli
    from darwin_tpu.io.fasta import load_genome
    from darwin_tpu.utils.simulate import simulate_reads

    store = load_genome(REF)
    sim = simulate_reads(store, 2, 1500, seed=8)
    reads_path = tmp_path / "r.fa"
    with open(reads_path, "w") as f:
        for n, s, _ in sim:
            f.write(f">{n}\n{bytes(np.asarray(s, np.uint8)).decode()}\n")
    cache = tmp_path / "idx.npz"
    monkeypatch.chdir(tmp_path)

    import contextlib
    out1, out2 = io.StringIO(), io.StringIO()
    with contextlib.redirect_stdout(out1):
        rc = cli.main([REF, str(reads_path), "0",
                       f"--index-cache={cache}"])
    assert rc == 0
    err1 = capsys.readouterr().err
    assert "Seed table saved" in err1
    assert os.path.exists(cache)

    with contextlib.redirect_stdout(out2):
        rc = cli.main([REF, str(reads_path), "0",
                       f"--index-cache={cache}"])
    assert rc == 0
    err2 = capsys.readouterr().err
    assert "Seed table saved" not in err2     # loaded, not rebuilt
    assert out1.getvalue() == out2.getvalue()  # identical SAM

    # staleness: a cache built under a different k must be rebuilt
    cfgp = tmp_path / "params.cfg"
    cfgp.write_text("[DSOFT_params]\nseed_size = 12\n")
    with contextlib.redirect_stdout(io.StringIO()):
        rc = cli.main([REF, str(reads_path), "0",
                       f"--index-cache={cache}"])
    assert rc == 0
    err3 = capsys.readouterr().err
    assert "rebuilding" in err3


def test_cli_usage_error(capsys):
    from darwin_tpu import cli
    assert cli.main(["only_one_arg"]) == 1
    assert "Usage" in capsys.readouterr().err


def test_processor_library_selects_backend(tmp_path):
    """params.cfg [FPGA] processor_library maps to the kernel backend
    selector (the reference's pluggable accelerator DLL hook,
    main.cpp:237-255)."""
    p = tmp_path / "params.cfg"
    p.write_text("[FPGA]\nprocessor_library = lax\n")
    cfg = load_config(str(p))
    assert cfg.processor_library == "lax"
    assert Config().processor_library == ""


@pytest.mark.slow
def test_cli_index_layout_csr(tmp_path, capsys, monkeypatch):
    """--index-layout=csr must produce byte-identical SAM, cache/reload
    the csr table, and rebuild when the cached layout differs."""
    from darwin_tpu import cli
    from darwin_tpu.io.fasta import load_genome
    from darwin_tpu.utils.simulate import simulate_reads

    store = load_genome(REF)
    sim = simulate_reads(store, 2, 1500, seed=8)
    reads_path = tmp_path / "r.fa"
    with open(reads_path, "w") as f:
        for n, s, _ in sim:
            f.write(f">{n}\n{bytes(np.asarray(s, np.uint8)).decode()}\n")
    cache = tmp_path / "idx.npz"
    monkeypatch.chdir(tmp_path)

    import contextlib
    out_pairs, out_csr, out_csr2 = io.StringIO(), io.StringIO(), io.StringIO()
    with contextlib.redirect_stdout(out_pairs):
        assert cli.main([REF, str(reads_path), "0"]) == 0
    capsys.readouterr()
    with contextlib.redirect_stdout(out_csr):
        assert cli.main([REF, str(reads_path), "0", "--index-layout=csr",
                         f"--index-cache={cache}"]) == 0
    assert "Seed table saved" in capsys.readouterr().err
    assert out_pairs.getvalue() == out_csr.getvalue()

    # reload keeps the csr layout — also with NO layout flag (the default
    # accepts the cache's layout rather than destroying an expensive csr
    # cache); an explicit pairs request does invalidate it
    with contextlib.redirect_stdout(out_csr2):
        assert cli.main([REF, str(reads_path), "0", "--index-layout=csr",
                         f"--index-cache={cache}"]) == 0
    err = capsys.readouterr().err
    assert "Seed table saved" not in err and "rebuilding" not in err
    assert out_csr.getvalue() == out_csr2.getvalue()
    with contextlib.redirect_stdout(io.StringIO()):
        assert cli.main([REF, str(reads_path), "0",
                         f"--index-cache={cache}"]) == 0
    assert "rebuilding" not in capsys.readouterr().err
    with contextlib.redirect_stdout(io.StringIO()):
        assert cli.main([REF, str(reads_path), "0", "--index-layout=pairs",
                         f"--index-cache={cache}"]) == 0
    assert "rebuilding" in capsys.readouterr().err

    assert cli.main([REF, str(reads_path), "0",
                     "--index-layout=bogus"]) == 1
