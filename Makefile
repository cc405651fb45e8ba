.PHONY: test test-fast native bench bench-decode bench-8b clean

test: native
	python -m pytest tests/ -q

test-fast: native
	python -m pytest tests/ -q -m "not slow" -n auto --dist loadfile

native:
	$(MAKE) -C native

bench:
	python bench.py

bench-decode:
	python bench_decode.py

bench-8b:
	python bench_8b_int8.py

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
