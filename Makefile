.PHONY: test test-fast native bench bench-decode bench-8b clean

test: native
	python -m pytest tests/ -q

test-fast: native
	python -m pytest tests/ -q -m "not slow" -n auto --dist loadfile

# Smoke tier (test-smoke): templates/preprocess/fusion/generation/speculative/
# eval/checkpoint/serving/memory-plan correctness (~245 tests, ~3.5 min warm
# on a 1-core box). Next tier: pytest -m "not slow" (509 tests, ~12 min warm
# on 1 CPU — measured r5; the suite is compile-dominated, multi-core boxes use
# test-fast) — heavy compile-bound exactness tests are marked slow and run in
# `make test` (611 collected).
SMOKE = tests/test_conversation.py tests/test_anyres.py \
        tests/test_preprocess_parity.py tests/test_data_pipeline.py \
        tests/test_fusion.py tests/test_generate.py tests/test_speculative.py \
        tests/test_eval.py tests/test_benchmarks.py tests/test_load_modes.py \
        tests/test_serve.py tests/test_checkpoint_8b_keys.py \
        tests/test_memory_plan.py tests/test_full_pipeline_golden.py \
        tests/test_loss.py tests/test_lora_train.py tests/test_tp_inference.py \
        tests/test_dpo.py

test-smoke: native
	python -m pytest $(SMOKE) -q -m "not slow"

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
