.PHONY: native test test-fast clean bench

native: native/liboneprot_host.so

native/liboneprot_host.so: native/oneprot_host.cc
	g++ -O3 -shared -fPIC -std=c++17 $< -o $@

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -m "not slow"

bench:
	python bench.py

clean:
	rm -f native/liboneprot_host.so
	find . -name __pycache__ -type d -exec rm -rf {} +
