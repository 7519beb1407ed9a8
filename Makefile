# Build/test harness — reference Makefile parity (C11).

PY ?= python

.PHONY: test hwtest native cl_test selftest bench block_test clean

test:
	$(PY) -m pytest tests/ -q

# conformance smoke on the REAL chip, non-interpret (<2 min warm): catches
# bf16/int8 limb regressions that interpreter-mode CI cannot see
hwtest:
	$(PY) tools/hwtest.py

native:
	$(MAKE) -C csrc

# round-trip check on the golden corpus through the CLI, like the
# reference's cl_test target (Makefile:21-26)
cl_test: native
	$(PY) -m csnappy_tpu.cli file -c -b native tests/data/urls.10K /tmp/u.sz
	$(PY) -m csnappy_tpu.cli file -d -b native /tmp/u.sz /tmp/u.out
	cmp /tmp/u.out tests/data/urls.10K && echo "cl_test passed"

selftest:
	$(PY) -m csnappy_tpu.cli file -S c -b native
	$(PY) -m csnappy_tpu.cli file -S d -b native

block_test: native
	$(PY) -m csnappy_tpu.cli block -c -m snappy tests/data/urls.10K /tmp/u.blk
	$(PY) -m csnappy_tpu.cli block -d -m snappy /tmp/u.blk /tmp/u.blk.out
	cmp /tmp/u.blk.out tests/data/urls.10K && echo "block_test passed"

bench:
	$(PY) bench.py

# committed benchmark records (C16/C17 duty): corpus table, phase
# profiles, zram-sim tree run — regenerate on the chip each round
records:
	$(PY) -m csnappy_tpu.tools.benchtable --corpus | tee records/benchtable_r4.txt
	$(PY) -m csnappy_tpu.tools.phaseprof decode > records/phaseprof_r4_end_decode.jsonl
	$(PY) -m csnappy_tpu.tools.phaseprof encode > records/phaseprof_r4_end_encode.jsonl
	$(PY) -m csnappy_tpu.tools.zramsim csnappy_tpu | tee records/zramsim_r4.json

clean:
	$(MAKE) -C csrc clean
	rm -rf .pytest_cache
