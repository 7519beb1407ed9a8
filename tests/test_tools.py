"""Benchmark-table and zram-sim harness tests."""
import pathlib

from csnappy_tpu.tools import benchtable, zramsim

DATA = pathlib.Path(__file__).parent / "data"


def test_benchtable_native(capsys):
    assert benchtable.main(["-b", "native", str(DATA / "urls.10K")]) == 0
    out = capsys.readouterr().out
    assert "urls.10K" in out and "MB/s" in out


def test_zramsim_roundtrip(tmp_path, urls10k):
    (tmp_path / "a.bin").write_bytes(urls10k[:50000])
    (tmp_path / "sub").mkdir()
    (tmp_path / "sub" / "b.bin").write_bytes(urls10k[50000:120000])
    r = zramsim.run(str(tmp_path), page_size=4096)
    assert r["nr_files"] == 2
    assert r["orig_data_size"] == 120000
    assert 0 < r["compr_data_size"] < r["orig_data_size"]


def test_corpus_deterministic_and_diverse():
    from csnappy_tpu.tools.corpus import corpus

    c1 = corpus()
    c2 = corpus()
    assert set(c1) == set(c2) and all(c1[k] == c2[k] for k in c1)
    assert len(c1) >= 8
    import zlib

    ratios = {k: len(zlib.compress(v[:65536], 1)) / min(len(v), 65536) for k, v in c1.items()}
    assert min(ratios.values()) < 0.35      # highly compressible member
    assert max(ratios.values()) > 0.95      # incompressible member


def test_benchtable_py_backend(tmp_path, capsys):
    from csnappy_tpu.tools import benchtable

    p = tmp_path / "x"
    p.write_bytes(b"hello world " * 400)
    assert benchtable.main(["-b", "py", str(p)]) == 0
    out = capsys.readouterr().out
    assert "MB/s" in out and "ratio" in out


def test_movebench_runs(capsys):
    from csnappy_tpu.tools import movebench

    assert movebench.main(["2048"]) == 0
    out = capsys.readouterr().out
    assert out.count("elem_per_s") == 5


def test_phaseprof_smoke(urls10k):
    # interpret-mode smoke of the committed profiler (single phase each to
    # keep CI fast: full pipelines only)
    from csnappy_tpu.tools import phaseprof

    rows = phaseprof.profile_decode.__wrapped__ if False else None
    # restrict to the "full" prefix by monkeypatching the phase dicts
    import csnappy_tpu.tools.phaseprof as pp

    old_d, old_e = pp.DEC_PHASES, pp.ENC_PHASES
    pp.DEC_PHASES = {99: "full"}
    pp.ENC_PHASES = {99: "full"}
    try:
        out_d = pp.profile_decode(urls10k[:65536])
        out_e = pp.profile_encode(urls10k[:65536])
    finally:
        pp.DEC_PHASES, pp.ENC_PHASES = old_d, old_e
    assert any("GBps_full" in r for r in out_d)
    assert any("MBps_full" in r for r in out_e)
