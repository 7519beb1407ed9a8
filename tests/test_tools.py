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
