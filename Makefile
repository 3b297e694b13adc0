# Round-boundary self-check: exactly what the driver runs, one-line
# PASS/FAIL, non-zero exit on any failure. ~20 min (contract drive at
# sf0.01 + bench + full pytest). `make gate-fast` skips pytest when the
# suite was just run.
.PHONY: gate gate-fast test bench

gate:
	python gate.py

gate-fast:
	python gate.py --skip-pytest

test:
	python -m pytest tests/ -q

bench:
	python bench.py
