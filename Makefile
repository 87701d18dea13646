# Local CI entry points (mirrors .github/workflows/test.yml).

.PHONY: test asan ci bench

test:
	python -m pytest tests/ -x -q

asan:
	tools/run_asan.sh

ci: test asan

bench:
	python bench.py
