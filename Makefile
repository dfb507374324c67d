# Developer entry points.
.PHONY: test test-all bench native clean

test:           ## fast suite (fake 8-device CPU mesh)
	python -m pytest tests/ -q

test-all:       ## including slow tests (deep nets, CLI e2e, learning)
	python -m pytest tests/ -q -m "slow or not slow"

bench:          ## headline benchmark on the attached TPU
	python bench.py

native:         ## build the C++ FaceShard loader
	$(MAKE) -C native/faceshard

clean:
	$(MAKE) -C native/faceshard clean
	rm -rf .pytest_cache
