# Development targets (reference Makefile:1-12 parity: lint + test).

.PHONY: lint test test-fast bench native notebooks clean

# enforced (non-zero exit on findings) — unlike the reference's advisory gate
lint:
	python tools/lint.py

notebooks:
	python tools/run_notebooks.py

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
