# Convenience targets (the reference ships a Makefile; ours is thin since
# the package is pure Python + lazily-built C++ natives).

.PHONY: test bench native clean lint

test:
	python -m pytest tests/ -q

bench:
	python bench.py

native:
	g++ -O3 -march=native -std=c++17 -shared -fPIC \
	  flex_tpu/reorder/_native/reorder.cc \
	  -o flex_tpu/reorder/_native/libflexreorder.so

clean:
	rm -f flex_tpu/reorder/_native/libflexreorder.so
	find . -name __pycache__ -type d -exec rm -rf {} +
