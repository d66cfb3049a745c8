# Developer workflow, mirroring the reference's Makefile targets
# (install / test / benchmark) plus the native library build.

.PHONY: install native test test-fast benchmark bench clean

install:
	pip install -e .

native:
	$(MAKE) -C polars_ols_tpu/engine/native

test: native
	python -m pytest tests/ -q

test-fast: native
	python -m pytest tests/ -q -x -k "not wide and not multi_collinear"

benchmark:
	python benchmarks/suite.py --config all

bench:
	python bench.py

clean:
	$(MAKE) -C polars_ols_tpu/engine/native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
