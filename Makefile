# qubism-tpu developer entry points

.PHONY: test test-fast tpu-test tpu-test-full bench native clean

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x -m "not slow"

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
