# Top-level build/test driver (the reference used CMake + ctest;
# here the Python package needs no build and the native library is one
# translation unit).

.PHONY: all native test test-tpu bench check check-chip clean

all: native

native:
	$(MAKE) -C native

test: native
	python -m pytest tests/ -q

test-tpu: native
	WARPDB_TEST_TPU=1 python -m pytest tests/ -q

bench: native
	python bench.py

# Pre-snapshot gate (VERDICT r3 #9): the FULL suite, the TPC-H oracle
# run, and a bench smoke that fails on any *_error key.  CI runs this;
# no snapshot commit may be taken with it red.
check: native
	python -m pytest tests/ -q
	python scripts/check_gate.py

# Chip leg of the gate (VERDICT r4 #1c): the full bench on the REAL
# TPU must be green — no *_error keys, no roofline violations — before
# any end-of-round snapshot.  `make check` alone cannot see chip-only
# failures (it forces the CPU backend).
check-chip: native
	python scripts/check_bench_chip.py

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
