.PHONY: native test test-fast test-quick clean bench

native: native/liboneprot_host.so

native/liboneprot_host.so: native/oneprot_host.cc
	g++ -O3 -shared -fPIC -std=c++17 $< -o $@

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -m "not slow"

# ~2-minute inner-loop smoke tier (warm .jit_cache): config compose, loss
# parity, tokenizers, one train step per modality family, cached-vs-uncached
# parity, driver-entry compile. The full fast suite stays the merge gate.
# (explicit file list: collecting the whole tests/ tree imports every test
# module — torch, transformers, h5py — and costs ~60s of the budget alone)
test-quick:
	python -m pytest tests/test_config.py tests/test_losses.py \
	  tests/test_tokenizers.py tests/test_all_modalities.py \
	  tests/test_feature_cache.py tests/test_driver_entries.py \
	  -q -m tier0

bench:
	python bench.py

clean:
	rm -f native/liboneprot_host.so
	find . -name __pycache__ -type d -exec rm -rf {} +
