# Gate for any snapshot/end-of-round commit: the FULL suite must be
# green at HEAD (VERDICT r3 weak #1 — round 3 shipped a red suite).
# Run `make check` before the final commit of a session; never skip
# the pytest tier because "only one test changed".

.PHONY: check lint test typecheck

check: lint typecheck test

lint:
	python tests/lint_run.py

typecheck:
	python tests/typecheck_run.py

# ~15 min idle, ~30 under host load — do not add a shorter timeout.
test:
	python -m pytest tests/ -x -q
