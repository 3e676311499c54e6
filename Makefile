.PHONY: test-fast test-slow test-tpu bench

# Default (fast) tier: correctness + one canonical test per kernel path.
# Budget: < 8 min cold with 4 workers, < 3 min warm (persistent JIT cache).
test-fast:
	@start=$$(date +%s); \
	python -m pytest tests -q -n $${PYTEST_WORKERS:-4} -p no:cacheprovider; \
	rc=$$?; end=$$(date +%s); \
	echo "test-fast wall time: $$((end - start)) s (budget: 480 s cold)"; \
	exit $$rc

# Opt-in tiers. slow = every test ≤ ~120 s on the 1-core box; stress =
# bigger horizons / humanoid-scale interpret runs. Both run with FULL XLA
# optimization (unlike the compile-bound fast tier) so the CPU numerics
# production users get are exercised somewhere.
# Both tiers run chunked (one pytest process per test file): long single-
# process full-opt compile sequences can crash XLA:CPU's LLVM pipeline
# (see scripts/run_tier_chunked.py).
test-slow:
	JAXSIM_TEST_FAST_COMPILE=0 python scripts/run_tier_chunked.py slow

test-stress:
	JAXSIM_TEST_FAST_COMPILE=0 python scripts/run_tier_chunked.py stress

test-tpu:
	JAXSIM_TEST_TPU=1 python -m pytest tests -q -m tpu

bench:
	python bench.py
