.PHONY: test-fast test-slow test-tpu bench

# Default (fast) tier: correctness + one canonical test per kernel path.
# Budget: < 8 min cold with 4 workers, < 3 min warm (persistent JIT cache).
test-fast:
	@start=$$(date +%s); \
	python -m pytest tests -q -n $${PYTEST_WORKERS:-4} -p no:cacheprovider; \
	rc=$$?; end=$$(date +%s); \
	echo "test-fast wall time: $$((end - start)) s (budget: 480 s cold)"; \
	exit $$rc

# Opt-in tiers.
test-slow:
	python -m pytest tests -q -m slow

test-tpu:
	JAXSIM_TEST_TPU=1 python -m pytest tests -q -m tpu

bench:
	python bench.py
