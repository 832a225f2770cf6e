# Top-level build/test driver (the reference used CMake + ctest;
# here the Python package needs no build and the native library is one
# translation unit).

.PHONY: all native test test-tpu bench clean

all: native

native:
	$(MAKE) -C native

test: native
	python -m pytest tests/ -q

test-tpu: native
	WARPDB_TEST_TPU=1 python -m pytest tests/ -q

bench: native
	python bench.py

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
