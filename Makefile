# Development shortcuts (reference analog: Makefile:22-33)

PYTEST ?= python -m pytest

.PHONY: test test-core test-records test-stw test-kernels bench bench-io \
        docs docs-check perf-baseline perf-check schema-check fuzz-native \
        fuzz-chain clean

test:
	$(PYTEST) tests/ -q

test-core:
	$(PYTEST) tests/ -q -k "not records and not hit_suite and not event_layer"

test-records:
	$(PYTEST) tests/test_records.py -q

test-stw:
	$(PYTEST) tests/test_formats.py tests/test_basic_features.py -q

test-kernels:
	$(PYTEST) tests/test_peaks.py tests/test_filtering.py tests/test_hit_suite.py -q

bench:
	python bench.py

bench-io:
	python scripts/benchmark_io.py --n-files 50 --n-channels 2 --n-rows 200 --reps 2

docs:
	python -m waveformanalysis_tpu.utils.cli_docs --out-dir docs/plugins generate

docs-check:
	python -m waveformanalysis_tpu.utils.cli_docs --out-dir docs/plugins check

doc-sync:
	JAX_PLATFORMS=cpu python scripts/check_doc_sync.py

perf-baseline:
	python scripts/performance_regression_check.py --save-baseline docs/perf_baseline.json

perf-check:
	python scripts/performance_regression_check.py --baseline docs/perf_baseline.json

schema-check:
	python scripts/schema_compat_check.py

fuzz-native:
	g++ -O1 -g -march=native -fsanitize=address,undefined \
	    waveformanalysis_tpu/native/csv_decode.cpp scripts/fuzz_native.cpp \
	    -o /tmp/wfa_fuzz && /tmp/wfa_fuzz

fuzz-chain:
	JAX_PLATFORMS=cpu python scripts/fuzz_chain_configs.py

clean:
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
	rm -rf .pytest_cache
