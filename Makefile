# Build / test / bench entry points.

.PHONY: native test test-fast test-all bench clean

native:
	g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread \
	  ampnet_tpu/data/csrc/sampler.cc -o ampnet_tpu/data/csrc/libampnet_sampler.so

# Deterministic gate: per-file subprocesses + one retry each, so the
# environmental XLA:CPU segfault (ROADMAP "Environment notes") kills at
# most one chunk instead of the whole run. Real aggregate exit code.
test:
	python scripts/run_tests.py

# Habitual tier (<3 min): the quick files only.
test-fast:
	python scripts/run_tests.py --fast

test-all:
	python scripts/run_tests.py --all

bench:
	python bench.py

clean:
	rm -f ampnet_tpu/data/csrc/*.so
	find . -name __pycache__ -type d -exec rm -rf {} +
