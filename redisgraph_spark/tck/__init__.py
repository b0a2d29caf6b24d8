"""openCypher TCK conformance harness (see runner.py)."""
from .runner import load_scenarios, run_all, run_scenario  # noqa: F401
