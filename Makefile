# Operator entry points. Parity: the reference's ci/test.sh + ci/lint.sh
# + static-analysis scripts (reference: ci/test.sh:41-60, ci/lint.sh).

PY ?= python

.PHONY: check lint test smoke native bench e2e graft

check: lint native test graft   ## the full pre-merge net

lint:
	$(PY) -m compileall -q trackiellm_tpu tools examples tests bench.py __graft_entry__.py
	$(PY) tools/lint.py

test:
	$(PY) -m pytest tests/ -q

# Fast tier for tight loops: excludes the `slow`-marked modules
# (model-zoo oracles, the 8-device parallel suite, heavy converts)
# and the real-model e2e; `make test` stays the full net. Round 5:
# tests/conftest.py points the JAX persistent compile cache at
# .jax_test_cache/ (9 MB), so repeat runs reuse every unchanged
# XLA:CPU program — measured on this SINGLE-CORE host: cold 7m35,
# WARM 3m47 (under the round-3 <5 min target). The cache is opt-in
# (this target sets TRACKIE_TEST_COMPILE_CACHE=1): warm-cache entries
# for some slow-tier GSPMD train steps SIGABRT at execution on this
# jax version, so `make test` (the full suite) runs uncached. Delete
# .jax_test_cache/ for a cold smoke. On a multi-core host add
# `-n auto` (pytest-xdist ships in the image) for a roughly
# core-count speedup on top.
smoke:
	TRACKIE_TEST_COMPILE_CACHE=1 $(PY) -m pytest tests/ -q -x \
	    -m "not slow" --deselect tests/test_e2e_real.py

native:
	g++ -O2 -shared -fPIC -std=c++17 -pthread \
	    -o trackiellm_tpu/ffi/native/libtrackie_runtime.so \
	    trackiellm_tpu/ffi/native/trackie_runtime.cpp \
	    trackiellm_tpu/ffi/native/trackie_ffi.cpp
	gcc -O2 -o /tmp/trackie_embed_demo examples/embed_demo.c \
	    -Itrackiellm_tpu/ffi/native -Ltrackiellm_tpu/ffi/native \
	    -ltrackie_runtime -Wl,-rpath,$(PWD)/trackiellm_tpu/ffi/native
	/tmp/trackie_embed_demo
	g++ -O2 -std=c++17 -o /tmp/trackie_embed_demo_cpp \
	    examples/embed_demo.cpp \
	    -Itrackiellm_tpu/ffi/native -Ltrackiellm_tpu/ffi/native \
	    -ltrackie_runtime -Wl,-rpath,$(PWD)/trackiellm_tpu/ffi/native
	/tmp/trackie_embed_demo_cpp

graft:
	$(PY) -c "import os; \
	os.environ['XLA_FLAGS'] = os.environ.get('XLA_FLAGS','') + ' --xla_force_host_platform_device_count=8'; \
	import jax; jax.config.update('jax_platforms', 'cpu'); \
	import __graft_entry__ as ge; \
	fn, args = ge.entry(); jax.jit(fn)(*args); \
	ge.dryrun_multichip(8); print('graft hooks OK')"

# Real-chip runs (need the TPU attached):
bench:
	$(PY) bench.py

e2e:
	$(PY) tools/measure_e2e.py
