# Release / CI procedure (ADVICE r4: the default quick tier alone must
# not be the only regression guard — the heavy tier carries the CLI,
# committed-golden/fidelity and multihost tests).
#
#   make test        both tiers, the full certification run
#   make test-quick  default tier (pyproject addopts: -m 'not heavy')
#   make test-heavy  heavy tier only
#   make bench       the driver's perf bench on the attached accelerator
#   make tpu-check   compiled-kernel vs CPU-golden consistency on hardware

.PHONY: test test-quick test-heavy bench tpu-check

test: test-quick test-heavy

test-quick:
	python -m pytest tests/ -q

test-heavy:
	python -m pytest tests/ -q -m heavy

bench:
	python bench.py

tpu-check:
	python scripts/tpu_check.py
