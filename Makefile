# Common tasks (the reference's justfile analogue)

.PHONY: test test-fast native bench bench-suite clean lint release

# version bump + tag (the reference's `just release X.Y.Z`)
release:
	python tools/release.py $(VERSION) --tag

test:
	python -m pytest tests/ -x -q

# CPU fast tier: 8 virtual devices, tpu_only/slow tests skipped.
# Parallel across files (xdist): XLA:CPU compiles of the big derive
# programs are the wall-clock cost and they parallelize per worker.
# (The default TPU tier must stay serial — single shared chip.)
test-fast:
	VUKE_TEST_PLATFORM=cpu python -m pytest tests/ -q -m "not slow" \
	  -n auto --dist loadfile

native:
	$(MAKE) -C native

bench:
	python bench.py

bench-suite:
	python -c "from vuke_tpu.benchmark import bench_suite; import json; \
	  [print(json.dumps(r)) for r in bench_suite()]"

clean:
	rm -rf vuke_tpu/data/libvuke_native.so .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} +
