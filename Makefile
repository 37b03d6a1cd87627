# Local CI gate (same steps as .github/workflows/tests.yml).
#   make ci      - tests + multichip dryrun + CLI golden block
#   make test    - test suite only
#   make bench   - headline benchmark on the current backend
#   make docs    - executable-docs check (docs snippets run as tests)
#   make docs-html - static HTML documentation build (docs/_build)

PY ?= python

.PHONY: ci test dryrun cli-golden bench docs docs-html

test:
	$(PY) -m pytest tests/ -q

dryrun:
	JAX_PLATFORMS=cpu $(PY) __graft_entry__.py dryrun 8

cli-golden:
	rm -f /tmp/muse_psfr_ci_run.log
	JAX_PLATFORMS=cpu $(PY) -m muse_psfr_tpu --no-color \
	    --values 1,0.7,25 --logfile /tmp/muse_psfr_ci_run.log
	grep -q "FWHM 0.85 0.73 0.62" /tmp/muse_psfr_ci_run.log
	grep -q "BETA 2.73 2.55 2.23" /tmp/muse_psfr_ci_run.log

docs:
	$(PY) -m pytest tests/test_docs_examples.py -q

docs-html:
	$(PY) docs/build.py

ci: test dryrun cli-golden
	@echo "CI gate passed"

bench:
	$(PY) bench.py
