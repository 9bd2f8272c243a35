# CPU test/dev commands must neutralize the TPU tunnel sitecustomize
# (PYTHONPATH=) or every python process opens a remote session.
TEST_ENV := PYTHONPATH= JAX_PLATFORMS=cpu

test:
	$(TEST_ENV) python -m pytest tests/ -q

test-fast:
	$(TEST_ENV) python -m pytest tests/ -q -m fast

bench:
	python bench.py

native:
	g++ -O3 -shared -fPIC -o native/libkinpoly_native.so native/kinpoly_native.cpp

graft-check:
	$(TEST_ENV) XLA_FLAGS=--xla_force_host_platform_device_count=8 N_DEVICES=8 python __graft_entry__.py
