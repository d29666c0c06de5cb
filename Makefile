# Common tasks (the reference's justfile analogue)

.PHONY: test native bench clean lint

test:
	python -m pytest tests/ -x -q

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
