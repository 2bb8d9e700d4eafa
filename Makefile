# qubism-tpu developer entry points

.PHONY: test test-fast test-all tpu-test tpu-test-full bench native clean

# default CI lane: everything except the @slow tail (~5-7 min on 1 CPU)
test:
	python -m pytest tests/ -q -m "not slow"

# quick smoke (~1.5-2 min): core parity surface (DSL, parser, interpreter,
# CLI, fusion goldens, compiler, samplers, models); the engine-heavy files
# (noisy/mps/sharded/kernels/variational/graft) run in `test`/`test-all`
test-fast:
	python -m pytest tests/ -q -x -m "not slow" \
	  --ignore=tests/test_noisy.py --ignore=tests/test_mps.py \
	  --ignore=tests/test_sharded.py --ignore=tests/test_kernels.py \
	  --ignore=tests/test_variational.py --ignore=tests/test_graft.py

# the whole suite including the slow tail (~11+ min)
test-all:
	python -m pytest tests/ -q

# device-gated: compiled-kernel equivalence + Born checks on the live TPU
# (skips cleanly off-TPU; never run alongside another TPU process)
tpu-test:
	python -m pytest tests_tpu/ -q -m "not slow"

# + the n=30 HBM/donation proof (several extra minutes of remote compiles)
tpu-test-full:
	python -m pytest tests_tpu/ -q

bench:
	python bench.py

# build the native C++ tokenizer eagerly (otherwise built on demand)
native:
	python -c "from qubism_tpu.native import ensure_built; print(ensure_built())"

clean:
	rm -rf .jax_cache qubism_tpu/native/_qasm_lexer*.so
	find . -name __pycache__ -type d -exec rm -rf {} +
