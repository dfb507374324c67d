# Developer entry points.
.PHONY: test test-mid test-all bench native clean

test:           ## fast gate (measured 299 s r5 re-tier; fake 8-device CPU mesh)
	python -m pytest tests/ -q

test-mid:       ## the >10s tier: full-size-net compiles, CLI e2e
	python -m pytest tests/ -q -m "mid"

test-all:       ## everything (fast + mid + slow)
	python -m pytest tests/ -q -m ""

bench:          ## headline benchmark on the attached TPU
	python bench.py

native:         ## build the C++ FaceShard loader
	$(MAKE) -C native/faceshard

clean:
	$(MAKE) -C native/faceshard clean
	rm -rf .pytest_cache
