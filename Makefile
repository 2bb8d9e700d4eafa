# qubism-tpu developer entry points

.PHONY: test test-fast bench native clean

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x -m "not slow"

bench:
	python bench.py

# build the native C++ tokenizer eagerly (otherwise built on demand)
native:
	python -c "from qubism_tpu.native import ensure_built; print(ensure_built())"

clean:
	rm -rf .jax_cache qubism_tpu/native/_qasm_lexer*.so
	find . -name __pycache__ -type d -exec rm -rf {} +
