PY ?= python

.PHONY: all native test bench dryrun multiproc clean

all: native

native: csrc/libdlm_runtime.so

csrc/libdlm_runtime.so: csrc/dlm_runtime.cpp
	g++ -O3 -shared -fPIC -std=c++17 -o $@ $<

test: native
	$(PY) -m pytest tests/ -q

bench: native
	$(PY) bench.py

dryrun:
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
		$(PY) __graft_entry__.py 8

# true multi-PROCESS GSPMD: 2 OS processes x 4 CPU devices, Gloo collectives
multiproc:
	$(PY) scripts/multiprocess_check.py

clean:
	rm -f csrc/libdlm_runtime.so
	find . -name __pycache__ -type d -exec rm -rf {} +
