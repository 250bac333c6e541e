"""Test-dir conftest. Backend pinning (CPU + 8 virtual devices) lives in the
repo-root conftest.py, which runs before any test import regardless of how
pytest is invoked from the repo root."""
