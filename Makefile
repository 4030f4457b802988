# Development targets (reference Makefile:1-12 parity: lint + test).

.PHONY: lint test test-fast bench native clean

lint:
	python -m flake8 viabel_tpu tests --max-line-length=100 || true

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x -k "not MC_SAMPLES and not families"

bench:
	python bench.py

native:
	python -c "from viabel_tpu.external import build_native_library as b; print(b(force=True))"

clean:
	rm -rf build dist *.egg-info $(shell find . -name __pycache__)
