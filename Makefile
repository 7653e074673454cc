# Development / CI entry points.  The suite runs on the virtual 8-device
# CPU mesh (tests/conftest.py forces JAX_PLATFORMS=cpu); bench targets use
# the ambient backend (the real TPU chip when present).

PY ?= python

.PHONY: test test-fast native bench-smoke bench verify ci

test:
	$(PY) -m pytest tests/ -q

test-fast:
	$(PY) -m pytest tests/ -q -x -m "not slow"

native:
	$(MAKE) -C native

bench-smoke:
	JAX_PLATFORMS=cpu $(PY) bench.py --smoke

bench:
	$(PY) bench.py --all

verify:
	$(PY) bench.py --verify

# the CI gate: native oracle builds, full suite green, bench smoke emits
ci: native test bench-smoke
