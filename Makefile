# Development targets (reference Makefile:1-12 parity: lint + test).

.PHONY: lint test test-fast bench native notebooks examples docs clean

# enforced (non-zero exit on findings) — unlike the reference's advisory gate.
# check_docs.py is the sphinx-free docs gate: RST structure + import-resolved
# autodoc targets + markdown link/anchor checks (the image has no sphinx).
lint:
	python tools/lint.py
	python tools/check_docs.py

notebooks:
	python tools/run_notebooks.py

# execution receipts for examples/*.py: each script RUNS in a subprocess at
# a smoke budget (VIABEL_EXAMPLES_SCALE, examples/_smoke.py); also in the
# slow test tier (tests/test_examples.py)
examples:
	python tools/run_examples.py

# Sphinx docs (reference docs/source + RTD parity).  sphinx is not in the
# dev image; install docs/requirements.txt first.
docs:
	@python -c "import sphinx" 2>/dev/null || \
		{ echo "sphinx not installed: pip install -r docs/requirements.txt"; exit 1; }
	sphinx-build -W -b html docs/source docs/_build/html

test:
	python -m pytest tests/ -q

# curated fast tier (measured ~8.5 min on the idle 1-core dev host,
# round 4): everything not marked slow — the slow set
# (statistical 1e6-sample checks, end-to-end convergence runs, bit-exact
# resume comparisons) is maintained centrally in tests/conftest.py
test-fast:
	python -m pytest tests/ -q -x -m "not slow"

bench:
	python bench.py

native:
	python -c "from viabel_tpu.external import build_native_library as b; print(b(force=True))"

clean:
	rm -rf build dist *.egg-info $(shell find . -name __pycache__)
