# Build / test targets (reference: Makefile — inplace build, test,
# coverage). No Cython here: the compute path is JAX/XLA; the only
# native piece is the host-side input-pipeline library.

PYTHON ?= python

.PHONY: all native test test-fast coverage bench clean

all: native

native: modl_tpu/native/_csr_pack.so

modl_tpu/native/_csr_pack.so: modl_tpu/native/csr_pack.cpp
	g++ -O3 -march=native -shared -fPIC $< -o $@

test: native
	$(PYTHON) -m pytest tests/ -q

test-fast: native
	$(PYTHON) -m pytest tests/ -q -x -k "not reconstruction"

coverage: native
	$(PYTHON) -m pytest tests/ -q --cov=modl_tpu --cov-report=term

bench:
	$(PYTHON) bench.py

clean:
	rm -f modl_tpu/native/_csr_pack.so
	find . -name __pycache__ -type d -exec rm -rf {} +
