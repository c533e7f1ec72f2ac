# Round-close verification: every registry query vs its DuckDB oracle at
# sf0.01 plus the physical-plan red-flag audit, one committed artifact
# (BENCH/VERIFY_$(TAG).md). Non-zero exit if either stage fails.
TAG ?= r05

.PHONY: verify test bench

verify:
	python scripts/verify_all.py $(TAG)

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py
