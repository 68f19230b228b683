# Build / test / bench entry points.

.PHONY: native test test-all bench clean

native:
	g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread \
	  ampnet_tpu/data/csrc/sampler.cc -o ampnet_tpu/data/csrc/libampnet_sampler.so

test:
	python -m pytest tests/ -q -m "not slow"

test-all:
	python -m pytest tests/ -q

bench:
	python bench.py

clean:
	rm -f ampnet_tpu/data/csrc/*.so
	find . -name __pycache__ -type d -exec rm -rf {} +
